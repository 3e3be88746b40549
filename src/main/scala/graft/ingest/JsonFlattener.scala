package graft.ingest

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, NullNode, ObjectNode}

/** JSON flattening with the reference's semantics.
  *
  * Re-expresses parseable `src/utils/json/flatten.rs`:
  *   - [[flatten]] (`:67-103`): nested object keys joined with a separator;
  *     arrays of objects become parallel null-padded list columns
  *     (`:252-296` `flatten_array_objects`).
  *   - [[genericFlatten]] (`:310-369`): cartesian explosion of nested
  *     arrays-of-objects into multiple rows — the Spark-plan analog is
  *     `explode()` + struct star-expansion; this Scala form runs pre-schema
  *     (before any DataFrame exists) exactly like the reference.
  *   - [[exceedsDepthLimit]] (`:376-389`): depth guard.
  *
  * All methods are pure and called per event on the ingest path, so they must
  * stay allocation-light: this runs inside executors via mapPartitions when
  * ingesting at scale, never on the driver for bulk data.
  */
object JsonFlattener {

  val DefaultSeparator = "."
  val MaxFlattenLevel = 10

  private val nf = JsonNodeFactory.instance

  /** Nesting depth of a JSON value (scalars = 1, {"a":{"b":1}} = 2...). */
  def depth(node: JsonNode): Int = {
    if (node.isObject)
      1 + node.properties().asScala.map(e => depth(e.getValue)).maxOption.getOrElse(0)
    else if (node.isArray)
      node.elements().asScala.map(depth).maxOption.getOrElse(1)
    else 1
  }

  def exceedsDepthLimit(node: JsonNode, max: Int = MaxFlattenLevel): Boolean =
    depth(node) > max

  /** Flatten one object: nested keys joined with `sep`; arrays of objects
    * become parallel null-padded arrays per child key; arrays of scalars are
    * kept as-is.
    */
  def flatten(node: ObjectNode, sep: String = DefaultSeparator): ObjectNode = {
    val out = nf.objectNode()
    def walk(prefix: String, n: JsonNode): Unit = n match {
      case o: ObjectNode =>
        o.properties().asScala.foreach { e =>
          val key = if (prefix.isEmpty) e.getKey else s"$prefix$sep${e.getKey}"
          walk(key, e.getValue)
        }
      case a: ArrayNode if a.elements().asScala.exists(_.isObject) =>
        flattenArrayOfObjects(prefix, a, sep, out)
      case other =>
        out.set[JsonNode](prefix, other)
    }
    walk("", node)
    out
  }

  /** Arrays of objects → one list column per distinct child key, null-padded
    * so every list has the array's length (reference `flatten_array_objects`).
    */
  private def flattenArrayOfObjects(
      prefix: String, arr: ArrayNode, sep: String, out: ObjectNode): Unit = {
    val elems = arr.elements().asScala.toSeq
    // each element flattened (recursively) to a flat object or null
    val flat: Seq[Option[ObjectNode]] = elems.map {
      case o: ObjectNode => Some(flatten(o, sep))
      case _: NullNode   => None
      case other =>
        val wrap = nf.objectNode(); wrap.set[JsonNode]("", other); Some(wrap)
    }
    val keys = flat.flatten.flatMap(_.properties().asScala.map(_.getKey)).distinct
    keys.foreach { k =>
      val col = nf.arrayNode()
      flat.foreach {
        case Some(o) if o.has(k) => col.add(o.get(k))
        case _                   => col.add(NullNode.getInstance())
      }
      val name = if (k.isEmpty) prefix else s"$prefix$sep$k"
      out.set[JsonNode](name, col)
    }
  }

  /** Cartesian explosion of top-level arrays-of-objects: each combination of
    * array elements yields one output row, merged with the scalar fields
    * (reference `generic_flattening`, example at flatten.rs:304-309).
    */
  /** Custom-partition value validation (reference `flatten.rs:107-152`):
    * each partition field must be present, scalar, non-null/non-empty, and
    * must not contain a `.` (floats count — they'd corrupt the Hive
    * `key=value` directory name).
    */
  def validateCustomPartitions(ev: ObjectNode,
                               partitions: Seq[String]): Either[String, Unit] = {
    partitions.map(_.trim).foldLeft(Right(()): Either[String, Unit]) { (acc, f) =>
      acc.flatMap { _ =>
        Option(ev.get(f)) match {
          case None => Left(s"custom partition field $f not part of the log")
          case Some(v) if v.isNull => Left(s"custom partition field $f is null")
          case Some(v) if v.isTextual && v.asText.isEmpty =>
            Left(s"custom partition field $f is empty")
          case Some(v) if v.isObject => Left(s"custom partition field $f is an object")
          case Some(v) if v.isArray => Left(s"custom partition field $f is an array")
          case Some(v) if v.isTextual && v.asText.contains(".") =>
            Left(s"custom partition field $f contains a period")
          case Some(v) if v.isFloatingPointNumber =>
            Left(s"custom partition field $f contains a period")
          case _ => Right(())
        }
      }
    }
  }

  /** Time-partition value validation (reference `flatten.rs:155-220`): the
    * field must exist, parse as a datetime, and be no older than
    * `limitDays` before `now` (default 30).
    */
  def validateTimePartition(ev: ObjectNode, timePartition: String,
                            now: java.time.Instant,
                            limitDays: Long = 30L): Either[String, Unit] =
    Option(ev.get(timePartition)) match {
      case None => Left(s"time partition field $timePartition not part of the log")
      case Some(v) =>
        val parsed = scala.util.Try(
          java.time.OffsetDateTime
            .parse(v.asText, java.time.format.DateTimeFormatter.ISO_DATE_TIME)
            .toInstant).toOption
        parsed match {
          case None => Left(s"field $timePartition is not a valid datetime: ${v.asText}")
          case Some(ts) if ts.isBefore(now.minus(java.time.Duration.ofDays(limitDays))) =>
            Left(s"field $timePartition is older than the $limitDays-day limit")
          case _ => Right(())
        }
    }

  def genericFlatten(node: ObjectNode): Seq[ObjectNode] = {
    val fields = node.properties().asScala.toSeq
    val arrayFields = fields.filter { e =>
      e.getValue.isArray && e.getValue.elements().asScala.exists(_.isObject)
    }
    if (arrayFields.isEmpty) Seq(node)
    else {
      // cartesian product over the object-bearing arrays
      val choices: Seq[Seq[(String, JsonNode)]] = arrayFields.map { e =>
        e.getValue.elements().asScala.toSeq.map(v => e.getKey -> v)
      }
      val combos = choices.foldLeft(Seq(Seq.empty[(String, JsonNode)])) {
        (acc, options) => acc.flatMap(c => options.map(c :+ _))
      }
      combos.flatMap { combo =>
        val row = nf.objectNode()
        fields.foreach { e =>
          if (!arrayFields.exists(_.getKey == e.getKey))
            row.set[JsonNode](e.getKey, e.getValue)
        }
        combo.foreach { case (k, v) => row.set[JsonNode](k, v) }
        // nested arrays-of-objects inside the chosen element explode too
        if (row.properties().asScala.exists(e =>
            e.getValue.isArray && e.getValue.elements().asScala.exists(_.isObject)))
          genericFlatten(row)
        else Seq(row)
      }
    }
  }

  /** Full ingest-path transform: optional cartesian explosion, then flatten,
    * with the depth guard applied first.
    */
  def flattenEvent(
      node: ObjectNode,
      sep: String = DefaultSeparator,
      explodeArrays: Boolean = true,
      maxLevel: Int = MaxFlattenLevel): Either[String, Seq[ObjectNode]] = {
    if (exceedsDepthLimit(node, maxLevel))
      Left(s"event exceeds max flatten depth $maxLevel")
    else if (explodeArrays)
      Right(genericFlatten(node).map(flatten(_, sep)))
    else Right(Seq(flatten(node, sep)))
  }
}
