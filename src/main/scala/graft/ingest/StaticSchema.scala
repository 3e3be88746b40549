package graft.ingest

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._

/** Static-schema stream support: parse the reference's fixed-schema request
  * body (reference `src/static_schema.rs` — `StaticSchema{fields:[{name,
  * data_type}]}` → engine schema, `convert_static_schema_to_arrow_schema`
  * at static_schema.rs:59) into a Spark [[StructType]].
  *
  * A stream created with `X-P-Static-Schema-Flag: true` validates every
  * ingested batch against this schema instead of growing it by inference:
  * unknown fields are rejected with 400 at the HTTP boundary
  * ([[IngestPipeline.ingest]]'s `staticSchema` check), and type conflicts
  * surface as conflict-renamed fields that then fail the same membership
  * check.
  */
object StaticSchema {

  private val mapper = new ObjectMapper()

  /** Reference data-type names → Spark types (static_schema.rs:104-127).
    * `datetime` maps to TIMESTAMP_NTZ — the engine-wide output convention
    * (naive timestamps compare engine-portably).
    */
  private val typeMap: Map[String, DataType] = Map(
    "int" -> LongType,
    "double" -> DoubleType,
    "float" -> DoubleType,
    "boolean" -> BooleanType,
    "string" -> StringType,
    "datetime" -> TimestampNTZType,
    "date" -> DateType,
    "string_list" -> ArrayType(StringType),
    "int_list" -> ArrayType(LongType),
    "double_list" -> ArrayType(DoubleType),
    "float_list" -> ArrayType(DoubleType),
    "boolean_list" -> ArrayType(BooleanType))

  /** Names the ingest pipeline owns; a static schema may not claim them
    * (reference `ReservedKey` on DEFAULT_TIMESTAMP_KEY, static_schema.rs:177).
    */
  private val reserved = Set("p_timestamp", "p_user_agent", "p_src_ip", "p_format")

  /** Parse + validate a static-schema body. Mirrors the reference checks:
    * empty/duplicate field names, unrecognized data types, reserved keys,
    * every custom-partition column present, and the time-partition column
    * (when configured) forced to `datetime`
    * (static_schema.rs:70-101,186-199).
    */
  def parse(body: String, customPartitions: Seq[String] = Nil,
            timePartition: Option[String] = None): Either[String, StructType] = {
    val root =
      try mapper.readTree(body)
      catch { case e: com.fasterxml.jackson.core.JacksonException =>
        return Left(s"malformed static schema body: ${e.getOriginalMessage}") }
    val fieldsNode = root.get("fields")
    if (fieldsNode == null || !fieldsNode.isArray)
      return Left("static schema body must carry a 'fields' array")
    var seen = Set.empty[String]
    val fields = Seq.newBuilder[StructField]
    for (f <- fieldsNode.elements().asScala) {
      val name = Option(f.get("name")).map(_.asText("")).getOrElse("")
      val dt = Option(f.get("data_type")).map(_.asText("")).getOrElse("")
      if (name.isEmpty) return Left("field name cannot be empty")
      if (seen.contains(name)) return Left(s"duplicate field name: $name")
      if (reserved.contains(name))
        return Left(s"field name $name is a reserved key")
      seen += name
      // the time-partition column is a datetime regardless of declared type
      val effective = if (timePartition.contains(name)) "datetime" else dt
      typeMap.get(effective) match {
        case Some(t) => fields += StructField(name, t, nullable = true)
        case None => return Left(s"unrecognized data type: $dt")
      }
    }
    val schema = StructType(fields.result())
    customPartitions.find(p => !seen.contains(p)) match {
      case Some(p) =>
        Left(s"custom partition field $p does not exist in the schema")
      case None if timePartition.exists(t => !seen.contains(t)) =>
        Left(s"time partition field ${timePartition.get} does not exist in the schema")
      case None if schema.isEmpty =>
        Left("static schema must declare at least one field")
      case None => Right(schema)
    }
  }
}
