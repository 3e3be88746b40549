package graft.ingest

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's inference/conflict tests (parseable
  * src/event/format/mod.rs:713-1322) — see FIXTURES.md B2.
  */
class SchemaInferenceSpec extends AnyFunSuite {
  import SchemaInference._

  private val mapper = new ObjectMapper()
  private def obj(s: String): ObjectNode = mapper.readTree(s).asInstanceOf[ObjectNode]

  test("V1: all numbers infer as Double") {
    assert(inferType("n", obj("""{"n":30}""").get("n")) == DoubleType)
    assert(inferType("n", obj("""{"n":3.5}""").get("n")) == DoubleType)
    assert(inferType("n", obj("""{"n":-9999999999}""").get("n")) == DoubleType)
  }

  test("V1: time-named string fields parsing as RFC3339 promote to Timestamp") {
    val ts = obj("""{"created_at":"2024-01-01T10:00:00Z"}""").get("created_at")
    assert(inferType("created_at", ts) == TimestampType)
    assert(inferType("note", ts) == StringType) // not a time-named field
    val notTs = obj("""{"body_timestamp":"not a timestamp"}""").get("body_timestamp")
    assert(inferType("body_timestamp", notTs) == StringType)
  }

  test("typed-sibling suffixes") {
    assert(suffixFor(StringType) == "utf8")
    assert(suffixFor(DoubleType) == "float64")
    assert(suffixFor(BooleanType) == "bool")
    assert(suffixFor(ArrayType(StringType)) == "list_utf8")
  }

  test("conflict rename: number arriving in a string column") {
    val schema = StructType(Seq(StructField("level", StringType)))
    val ev = renameConflicts(obj("""{"level":30}"""), schema)
    assert(ev.has("level_float64") && !ev.has("level"))
  }

  test("conflict rename: string arriving in a double column") {
    val schema = StructType(Seq(StructField("level", DoubleType)))
    val ev = renameConflicts(obj("""{"level":"info"}"""), schema)
    assert(ev.has("level_utf8") && !ev.has("level"))
  }

  test("conflict rename: bool vs string, both directions") {
    val s1 = StructType(Seq(StructField("escaped", StringType)))
    assert(renameConflicts(obj("""{"escaped":true}"""), s1).has("escaped_bool"))
    val s2 = StructType(Seq(StructField("escaped", BooleanType)))
    assert(renameConflicts(obj("""{"escaped":"true"}"""), s2).has("escaped_utf8"))
  }

  test("no rename when compatible") {
    val schema = StructType(Seq(StructField("v", DoubleType)))
    val ev = renameConflicts(obj("""{"v":1.5}"""), schema)
    assert(ev.has("v") && !ev.has("v_float64"))
  }

  test("@-prefix normalization with collision rejection") {
    val ok = normalizeFieldNames(obj("""{"@timestamp":"x","@level":"y"}"""))
    assert(ok.isRight)
    val o = ok.toOption.get
    assert(o.has("_timestamp") && o.has("_level") && !o.has("@timestamp"))
    assert(normalizeFieldNames(obj("""{"@x":"a","_x":"b"}""")).isLeft)
  }

  test("p_timestamp is reserved") {
    assert(normalizeFieldNames(obj("""{"p_timestamp":"x"}""")).isLeft)
  }

  test("tryMerge grows monotonically and rejects residual conflicts") {
    val s1 = StructType(Seq(StructField("a", DoubleType)))
    val s2 = StructType(Seq(StructField("b", StringType)))
    val Right(m) = tryMerge(s1, s2)
    assert(m.fieldNames.toSeq == Seq("a", "b"))
    val s3 = StructType(Seq(StructField("a", StringType)))
    assert(tryMerge(m, s3).isLeft)
  }

  test("inferSchema on a flattened event") {
    val s = inferSchema(obj("""{"b":true,"n":1,"s":"x","arr":[1,2]}"""))
    assert(s("b").dataType == BooleanType)
    assert(s("n").dataType == DoubleType)
    assert(s("s").dataType == StringType)
    assert(s("arr").dataType == ArrayType(DoubleType))
  }
}
