package graft.ingest

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}

/** Kinesis Firehose envelope → events (reference
  * `src/handlers/http/kinesis.rs:62-105` `flatten_kinesis_logs`).
  *
  * The envelope is `{requestId, timestamp, records:[{data: base64}]}`; each
  * record's payload is base64 JSON. Payloads within depth bounds flatten
  * (cartesian `generic_flattening`), deeper ones pass through as-is; every
  * event carries `requestId` and `timestamp` (stringified) from the
  * envelope.
  */
object KinesisSource {

  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  def unwrap(envelopeJson: String): Either[String, Seq[ObjectNode]] = {
    val root = mapper.readTree(envelopeJson)
    val requestId = Option(root.get("requestId")).map(_.asText).getOrElse("")
    val timestamp = Option(root.get("timestamp")).map(_.asLong).getOrElse(0L)
    val records = Option(root.get("records"))
      .map(_.elements().asScala.toSeq).getOrElse(Nil)
    val out = Seq.newBuilder[ObjectNode]
    var err: Option[String] = None
    records.foreach { rec =>
      if (err.isEmpty) {
        val b64 = Option(rec.get("data")).map(_.asText).getOrElse("")
        val decoded =
          try Right(new String(java.util.Base64.getDecoder.decode(b64),
            java.nio.charset.StandardCharsets.UTF_8))
          catch {
            case e: IllegalArgumentException =>
              Left(s"base64 decode failed for requestId $requestId: ${e.getMessage}")
          }
        decoded match {
          case Left(e) => err = Some(e)
          case Right(text) =>
            mapper.readTree(text) match {
              case o: ObjectNode =>
                JsonFlattener.flattenEvent(o, JsonFlattener.DefaultSeparator) match {
                  case Left(e) => err = Some(e)
                  case Right(rows) =>
                    rows.foreach { r =>
                      r.put("requestId", requestId)
                      r.put("timestamp", timestamp.toString)
                      out += r
                    }
                }
              case other =>
                val wrap = nf.objectNode()
                wrap.set[com.fasterxml.jackson.databind.JsonNode]("data", other)
                wrap.put("requestId", requestId)
                wrap.put("timestamp", timestamp.toString)
                out += wrap
            }
        }
      }
    }
    err.toLeft(out.result())
  }
}
