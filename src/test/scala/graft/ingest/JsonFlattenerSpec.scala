package graft.ingest

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's flatten tests (parseable
  * src/utils/json/flatten.rs:400-1000, examples at :304-309) — see
  * FIXTURES.md B1.
  */
class JsonFlattenerSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def obj(s: String): ObjectNode = mapper.readTree(s).asInstanceOf[ObjectNode]
  private def keys(o: ObjectNode): Set[String] =
    o.properties().asScala.map(_.getKey).toSet

  test("flat object unchanged") {
    val out = JsonFlattener.flatten(obj("""{"key":"value","n":1}"""))
    assert(keys(out) == Set("key", "n"))
    assert(out.get("key").asText == "value")
  }

  test("nested object keys joined with separator") {
    val out = JsonFlattener.flatten(obj("""{"a":{"b":{"c":1}}}"""))
    assert(keys(out) == Set("a.b.c"))
    assert(out.get("a.b.c").asInt == 1)
    val us = JsonFlattener.flatten(obj("""{"a":{"b":{"c":1}}}"""), sep = "_")
    assert(keys(us) == Set("a_b_c"))
  }

  test("array of objects becomes null-padded parallel lists") {
    val out = JsonFlattener.flatten(obj("""{"a":[{"b":1},null,{"b":2,"x":9}]}"""))
    assert(keys(out) == Set("a.b", "a.x"))
    val b = out.get("a.b")
    assert(b.isArray && b.size() == 3)
    assert(b.get(0).asInt == 1 && b.get(1).isNull && b.get(2).asInt == 2)
    val x = out.get("a.x")
    assert(x.get(0).isNull && x.get(1).isNull && x.get(2).asInt == 9)
  }

  test("scalar arrays kept as-is") {
    val out = JsonFlattener.flatten(obj("""{"tags":["x","y"]}"""))
    assert(out.get("tags").isArray && out.get("tags").size() == 2)
  }

  test("generic flattening: cartesian explosion of arrays of objects") {
    // reference flatten.rs:304-309 example 4
    val rows = JsonFlattener.genericFlatten(
      obj("""{"a":[{"b":1},{"c":2}],"d":{"e":4}}"""))
    assert(rows.size == 2)
    assert(rows(0).get("a").get("b").asInt == 1)
    assert(rows(1).get("a").get("c").asInt == 2)
    assert(rows.forall(_.get("d").get("e").asInt == 4))
  }

  test("generic flattening: two arrays multiply") {
    val rows = JsonFlattener.genericFlatten(
      obj("""{"a":[{"x":1},{"x":2}],"b":[{"y":1},{"y":2},{"y":3}],"k":0}"""))
    assert(rows.size == 6)
    assert(rows.forall(_.get("k").asInt == 0))
  }

  test("depth guard rejects deeply nested payloads") {
    // object nesting levels: root,a,b,c,d (=5) + leaf array (=1) -> depth 6
    val deep = obj("""{"a":{"b":{"c":{"d":{"e":["a","b"]}}}}}""")
    assert(JsonFlattener.exceedsDepthLimit(deep, max = 5))
    assert(!JsonFlattener.exceedsDepthLimit(deep, max = 6))
    assert(JsonFlattener.flattenEvent(deep, maxLevel = 5).isLeft)
  }

  test("flattenEvent explodes then flattens") {
    val Right(rows) = JsonFlattener.flattenEvent(
      obj("""{"a":[{"b":{"c":1}},{"b":{"c":2}}],"s":"v"}"""))
    assert(rows.size == 2)
    assert(keys(rows(0)) == Set("a.b.c", "s"))
    assert(rows.map(_.get("a.b.c").asInt).toSet == Set(1, 2))
  }
}
