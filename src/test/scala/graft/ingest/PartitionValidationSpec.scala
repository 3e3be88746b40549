package graft.ingest

import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.scalatest.funsuite.AnyFunSuite

class PartitionValidationSpec extends AnyFunSuite {

  private val nf = JsonNodeFactory.instance

  private def obj(pairs: (String, Any)*) = {
    val o = nf.objectNode()
    pairs.foreach {
      case (k, v: String)  => o.put(k, v)
      case (k, v: Long)    => o.put(k, v)
      case (k, v: Double)  => o.put(k, v)
      case (k, v: Boolean) => o.put(k, v)
      case (k, null)       => o.putNull(k)
      case (k, v)          => o.put(k, v.toString)
    }
    o
  }

  test("custom partition values: scalar non-null without periods") {
    import JsonFlattener.validateCustomPartitions
    assert(validateCustomPartitions(obj("tenant" -> "acme"), Seq("tenant")).isRight)
    assert(validateCustomPartitions(obj("tenant" -> 5L), Seq("tenant")).isRight)
    assert(validateCustomPartitions(obj("x" -> "y"), Seq("tenant")).isLeft) // absent
    assert(validateCustomPartitions(obj("tenant" -> null), Seq("tenant")).isLeft)
    assert(validateCustomPartitions(obj("tenant" -> ""), Seq("tenant")).isLeft)
    assert(validateCustomPartitions(obj("tenant" -> "a.b"), Seq("tenant")).isLeft)
    assert(validateCustomPartitions(obj("tenant" -> 1.5), Seq("tenant")).isLeft) // float = period
  }

  test("time partition values: datetime within staleness bound") {
    import JsonFlattener.validateTimePartition
    val now = java.time.Instant.parse("2024-06-15T00:00:00Z")
    assert(validateTimePartition(
      obj("ts" -> "2024-06-14T10:00:00Z"), "ts", now).isRight)
    assert(validateTimePartition(
      obj("ts" -> "2024-04-01T10:00:00Z"), "ts", now).isLeft) // > 30 days old
    assert(validateTimePartition(
      obj("ts" -> "2024-04-01T10:00:00Z"), "ts", now, limitDays = 365).isRight)
    assert(validateTimePartition(obj("ts" -> "nope"), "ts", now).isLeft)
    assert(validateTimePartition(obj("x" -> "y"), "ts", now).isLeft)
  }

  test("ingest rejects events violating partition constraints") {
    import IngestPipeline._
    val cfg = StreamConfig("t", customPartitions = Seq("tenant"))
    assert(prepare("""{"tenant":"acme","msg":"ok"}""", cfg).isRight)
    assert(prepare("""{"msg":"missing tenant"}""", cfg).isLeft)
    assert(prepare("""{"tenant":"a.b","msg":"period"}""", cfg).isLeft)
  }
}
