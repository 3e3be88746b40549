package graft.http

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types.StructType

/** Prompt-to-SQL helper (reference `src/handlers/http/llm.rs`): builds a
  * schema-aware prompt for a chat-completions endpoint and extracts the
  * generated SQL from the response. The endpoint URL is configurable
  * (the reference hardcodes OpenAI's; a library points it at whatever
  * OpenAI-compatible server the deployment runs) — this module never
  * phones anywhere on its own.
  */
object Llm {

  /** `url` is the chat-completions endpoint; requests carry
    * `Authorization: Bearer apiKey` (reference `make_llm_request`).
    */
  final case class Config(url: String, apiKey: String,
                          model: String = "gpt-3.5-turbo")

  private val mapper = new ObjectMapper()

  /** Reference `Field { name, data_type }` list, JSON-encoded. */
  def schemaJson(schema: StructType): String = {
    val arr = mapper.createArrayNode()
    schema.fields.foreach { f =>
      arr.addObject().put("name", f.name)
        .put("data_type", f.dataType.simpleString)
    }
    mapper.writeValueAsString(arr)
  }

  /** Reference `build_prompt` — same instruction text, so the model
    * contract (SQL-only output with SQL comments) carries over.
    */
  def buildPrompt(stream: String, prompt: String, schemaJson: String): String =
    s"""I have a table called $stream.
       |It has the columns:\\n$schemaJson
       |Based on this schema, generate valid SQL for the query: "$prompt"
       |Generate only simple SQL as output. Also add comments in SQL syntax to explain your actions. Don't output anything else. If it is not possible to generate valid SQL, output an SQL comment saying so.""".stripMargin

  /** Reference `build_request_body`. */
  def requestBody(model: String, aiPrompt: String): String = {
    val o = mapper.createObjectNode()
    o.put("model", model)
    o.putArray("messages").addObject()
      .put("role", "user").put("content", aiPrompt)
    o.put("temperature", 0.7)
    mapper.writeValueAsString(o)
  }

  /** `choices[0].message.content` on success; the provider's
    * `error.message` otherwise (reference response handling).
    */
  def extractContent(json: String): Either[String, String] =
    try {
      val node = mapper.readTree(json)
      val content = node.path("choices").path(0).path("message")
        .path("content")
      if (content.isTextual) Right(content.asText())
      else {
        val msg = node.path("error").path("message")
        Left(if (msg.isTextual) msg.asText() else "Error from LLM provider")
      }
    } catch { case _: Exception => Left("unparseable LLM provider response") }
}
