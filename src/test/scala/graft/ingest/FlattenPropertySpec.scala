package graft.ingest

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the flatten pipeline (SURVEY §5: add property-based
  * coverage the reference lacks): on arbitrary nested JSON within depth
  * bounds, flattening produces flat objects that preserve every scalar
  * leaf value.
  */
class FlattenPropertySpec extends AnyFunSuite {

  /** Deterministic stand-in for forAll (scalatest/scalacheck bridge is not
    * in the offline cache): sample the generator at 100 fixed seeds.
    */
  private def forAll[T](gen: Gen[T])(check: T => Unit): Unit =
    (0 until 100).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(check)
    }

  private val nf = JsonNodeFactory.instance

  private val genScalar: Gen[JsonNode] = Gen.oneOf(
    Gen.alphaNumStr.map(nf.textNode),
    Gen.chooseNum(-1000000L, 1000000L).map(nf.numberNode),
    Gen.chooseNum(-1000.0, 1000.0).map(nf.numberNode),
    Gen.oneOf(true, false).map(nf.booleanNode),
    Gen.const(nf.nullNode()))

  private val genKey: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(8))

  private def genObject(depth: Int): Gen[ObjectNode] =
    for {
      n <- Gen.chooseNum(1, 4)
      keys <- Gen.listOfN(n, genKey).map(_.distinct)
      vals <- Gen.listOfN(keys.size,
        if (depth <= 1) genScalar
        else Gen.frequency(3 -> genScalar, 1 -> genObject(depth - 1)
          .map(_.asInstanceOf[JsonNode])))
    } yield {
      val o = nf.objectNode()
      keys.zip(vals).foreach { case (k, v) => o.set[JsonNode](k, v) }
      o
    }

  private def scalarLeafValues(n: JsonNode): Seq[String] =
    if (n.isObject)
      n.properties().asScala.toSeq.flatMap(e => scalarLeafValues(e.getValue))
    else if (n.isArray) n.elements().asScala.toSeq.flatMap(scalarLeafValues)
    else Seq(n.toString)

  test("flatten preserves every scalar leaf and leaves no nested objects") {
    forAll(genObject(3)) { obj =>
      val before = scalarLeafValues(obj).sorted
      val flat = JsonFlattener.flatten(obj.deepCopy())
      val after = flat.properties().asScala.toSeq.map(_.getValue)
      assert(after.forall(v => !v.isObject))
      assert(after.flatMap(scalarLeafValues).sorted == before)
    }
  }

  test("flattened keys join path segments with the separator") {
    forAll(genObject(3)) { obj =>
      val flat = JsonFlattener.flatten(obj.deepCopy(), ".")
      flat.properties().asScala.foreach { e =>
        assert(!e.getKey.isEmpty)
      }
    }
  }

  test("inference on flattened objects always succeeds and covers all keys") {
    forAll(genObject(3)) { obj =>
      val flat = JsonFlattener.flatten(obj.deepCopy())
      val schema = SchemaInference.inferSchema(flat)
      val keys = flat.properties().asScala.map(_.getKey).toSet
      // null-valued fields carry no type yet (schema grows when a value
      // arrives) — every other key must be typed
      val nonNull = keys.filter(k => !flat.get(k).isNull)
      assert(nonNull.subsetOf(schema.fieldNames.toSet))
    }
  }
}
