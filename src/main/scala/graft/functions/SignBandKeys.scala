package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All banded sign-random-projection LSH keys of a vector in ONE pass:
  * key `t`'s bit `j` is set iff `dot(vec, planes(t*bandBits+j)) >= 0`,
  * with the dot the same sequential left-to-right double fold as
  * [[ArrayDotProduct]] — bit-for-bit the result of the Column
  * formulation (`when(graft_dot(vec, lit(plane)) >= 0, 1L<<j)` summed),
  * which the DuckDB oracles replicate.
  *
  * Why a fused kernel: the Column form evaluates `bands × bandBits`
  * separate dot expressions per row (128 at the defaults), each walking
  * the vector through its own expression node. One kernel walks the
  * vector once per plane in a tight loop — measured ~2× on the
  * decontamination screen, whose per-row cost is exactly these keys.
  *
  * Null/mismatch contract (mirrors the Column form EXACTLY, including on
  * a NULL input): a null vector, wrong-length vector, or null element
  * makes every `dot` null, every `when` falls to 0 — so ALL keys are 0
  * and the result is never null. This matters beyond documentation: a
  * posexplode over these keys emits `bands` rows either way, so
  * bucket-size accounting under `maxBucketSize` stays identical between
  * the kernel and Column formulations.
  */
case class SignBandKeys(child: Expression, planes: Seq[Seq[Double]],
                        bandBits: Int)
    extends UnaryExpression {
  require(planes.nonEmpty && planes.size % bandBits == 0,
    s"planes (${planes.size}) must be a multiple of bandBits=$bandBits")

  private val bands: Int = planes.size / bandBits
  @transient private lazy val planeMatrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    // NOT nullSafeEval: a null vector must yield the all-zero key array
    // (the Column form's `when` falls through to 0), not null
    val v = child.eval(input)
    SignBandKeys.bandKeys(
      if (v == null) null else v.asInstanceOf[ArrayData],
      planeMatrix, bandBits, bands, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val planesRef = ctx.addReferenceObj("planes", planeMatrix, "double[][]")
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.functions.SignBandKeys.bandKeys(
        |    ${childGen.isNull} ? null : ${childGen.value},
        |    $planesRef, $bandBits, $bands, $isFloat);
        |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBandKeys {
  /** Static kernel body (called from generated code as a static forwarder —
    * MUST NOT be named `eval`: the case class inherits Expression.eval, and a
    * name clash makes scalac suppress the forwarder, failing Janino and
    * silently dropping the whole projection to interpreted mode; see
    * KernelCodegenSpec). `vec` may be null —
    * the result is then the all-zero key array (see null contract above).
    */
  def bandKeys(vec: ArrayData, planes: Array[Array[Double]], bandBits: Int,
           bands: Int, isFloat: Boolean): ArrayData = {
    val keys = new Array[Long](bands)
    if (vec == null) return new GenericArrayData(keys)
    val dim = planes(0).length
    val n = vec.numElements()
    // mismatched length or null elements → null dots → every key 0
    var malformed = n != dim
    var i = 0
    while (!malformed && i < n) {
      if (vec.isNullAt(i)) malformed = true
      i += 1
    }
    if (!malformed) {
      // hoist the vector into a primitive array: one materialization for
      // the whole plane sweep instead of bands×bandBits ArrayData walks
      val v = new Array[Double](dim)
      var e = 0
      while (e < dim) {
        v(e) = if (isFloat) vec.getFloat(e).toDouble else vec.getDouble(e)
        e += 1
      }
      var t = 0
      while (t < bands) {
        var key = 0L
        var j = 0
        while (j < bandBits) {
          val p = planes(t * bandBits + j)
          var sum = 0.0
          var k = 0
          while (k < dim) { sum += v(k) * p(k); k += 1 }
          if (sum >= 0d) key |= (1L << j)
          j += 1
        }
        keys(t) = key
        t += 1
      }
    }
    new GenericArrayData(keys)
  }
}
