package graft.ingest

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.types._

/** Schema inference with the reference's V1 rules + type-conflict renaming.
  *
  * Mirrors parseable `src/event/format/{mod.rs,json.rs}`:
  *   - V1 coercion: every JSON number → Double (`mod.rs:356-411`
  *     `override_data_type`); strings in time-named fields that parse as
  *     RFC3339/RFC2822 → Timestamp (`mod.rs:47-59` TIME_FIELD_NAME_PARTS).
  *   - Conflict renaming: an incoming field whose type conflicts with the
  *     stream's stored column type is renamed to a typed sibling
  *     `name_<suffix>` (`mod.rs:495-584`; suffixes `mod.rs:415-443`).
  *   - Field normalization: leading '@' → '_' (`mod.rs:63-70`), with
  *     collision rejection (`json.rs:331-374`).
  *   - Reserved column: events containing `p_timestamp` are rejected
  *     (`mod.rs:186-191`).
  */
object SchemaInference {

  val TimestampKey = "p_timestamp"

  /** Field-name fragments that trigger timestamp promotion in V1. */
  val TimeFieldNameParts: Seq[String] =
    Seq("time", "date", "timestamp", "created", "received", "_at")

  def isTimeFieldName(name: String): Boolean = {
    val lower = name.toLowerCase
    TimeFieldNameParts.exists(lower.contains)
  }

  private val Rfc3339 = java.time.format.DateTimeFormatter.ISO_DATE_TIME
  private val Rfc2822 = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME

  def parsesAsTimestamp(s: String): Boolean =
    try { Rfc3339.parse(s); true }
    catch {
      case _: Exception =>
        try { Rfc2822.parse(s); true }
        catch { case _: Exception => false }
    }

  /** Infer the V1 type of a single flattened JSON value. Numbers all map to
    * Double; time-named string fields that parse as timestamps map to
    * TimestampType. Arrays map to ArrayType of the merged element type.
    */
  def inferType(name: String, v: JsonNode): DataType = v match {
    case n if n.isNull    => NullType
    case n if n.isBoolean => BooleanType
    case n if n.isNumber  => DoubleType
    case n if n.isTextual =>
      if (isTimeFieldName(name) && parsesAsTimestamp(n.asText)) TimestampType
      else StringType
    case n if n.isArray =>
      val elemTypes = n.elements().asScala.map(e => inferType(name, e)).toSeq
        .filterNot(_ == NullType).distinct
      ArrayType(elemTypes match {
        case Seq(one) => one
        case Seq()    => StringType
        case _        => StringType // mixed element types degrade to string
      })
    case _ => StringType
  }

  /** Typed-sibling suffix for a conflicting type (reference
    * `get_datatype_suffix`, mod.rs:415-443).
    */
  def suffixFor(dt: DataType): String = dt match {
    case BooleanType      => "bool"
    case DoubleType       => "float64"
    case LongType         => "int64"
    case TimestampType    => "date"
    case StringType       => "utf8"
    case ArrayType(e, _)  => s"list_${suffixFor(e)}"
    case _                => "utf8"
  }

  /** Normalize field names: leading '@' → '_'. Returns Left on collision
    * (both `@x` and `_x` present) or reserved-name violation.
    */
  def normalizeFieldNames(obj: ObjectNode): Either[String, ObjectNode] = {
    val names = obj.properties().asScala.map(_.getKey).toSeq
    if (names.contains(TimestampKey))
      return Left(s"field $TimestampKey is reserved")
    val renames = names.filter(_.startsWith("@")).map(n => n -> ("_" + n.drop(1)))
    val collision = renames.find { case (_, to) => names.contains(to) }
    collision match {
      case Some((from, to)) => Left(s"renaming $from collides with existing $to")
      case None =>
        renames.foreach { case (from, to) =>
          val v = obj.remove(from)
          obj.set[JsonNode](to, v)
        }
        Right(obj)
    }
  }

  /** Detect conflicts of a flattened event against the stream schema and
    * rename conflicting fields to typed siblings, per record (reference
    * `rename_per_record_type_mismatches`, mod.rs:607-696).
    */
  def renameConflicts(obj: ObjectNode, streamSchema: StructType): ObjectNode = {
    val byName = streamSchema.fields.map(f => f.name -> f.dataType).toMap
    val conflicting = obj.properties().asScala.toSeq.flatMap { e =>
      byName.get(e.getKey) match {
        case Some(stored) =>
          val incoming = inferType(e.getKey, e.getValue)
          if (incoming == NullType || compatible(incoming, stored)) None
          else Some(e.getKey -> s"${e.getKey}_${suffixFor(incoming)}")
        case None => None
      }
    }
    conflicting.foreach { case (from, to) =>
      val v = obj.remove(from)
      obj.set[JsonNode](to, v)
    }
    obj
  }

  /** Whether a value of `incoming` type can live in a column of `stored`
    * type (reference `value_compatible_with_type`, mod.rs:449-489).
    */
  def compatible(incoming: DataType, stored: DataType): Boolean =
    (incoming, stored) match {
      case (a, b) if a == b                 => true
      case (NullType, _)                    => true
      case (DoubleType, LongType)           => false
      case (LongType, DoubleType)           => true
      case (StringType, TimestampType)      => false
      case (TimestampType, StringType)      => false
      case (ArrayType(a, _), ArrayType(b, _)) => compatible(a, b)
      case _                                => false
    }

  /** Infer the merged schema of one flattened event. */
  def inferSchema(obj: ObjectNode): StructType = {
    val fields = obj.properties().asScala.toSeq.map { e =>
      val dt = inferType(e.getKey, e.getValue) match {
        case NullType => StringType
        case other    => other
      }
      StructField(e.getKey, dt, nullable = true)
    }
    StructType(fields.sortBy(_.name))
  }

  /** Merge an incoming schema into the stream's cumulative schema — the
    * stream schema only grows (reference `commit_schema`,
    * `src/event/mod.rs:158-180`, Arrow `Schema::try_merge` semantics).
    * Conflicting same-name/different-type fields must have been renamed
    * before this point; a residual conflict is an error.
    */
  def tryMerge(stream: StructType, incoming: StructType): Either[String, StructType] = {
    val byName = scala.collection.mutable.LinkedHashMap.from(
      stream.fields.map(f => f.name -> f))
    incoming.fields.foreach { f =>
      byName.get(f.name) match {
        case None => byName += f.name -> f
        case Some(existing) if existing.dataType == f.dataType => ()
        case Some(existing) if compatible(f.dataType, existing.dataType) => ()
        case Some(existing) =>
          return Left(
            s"schema conflict on ${f.name}: ${existing.dataType} vs ${f.dataType}")
      }
    }
    Right(StructType(byName.values.toSeq))
  }
}
