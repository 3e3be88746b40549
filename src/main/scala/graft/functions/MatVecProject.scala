package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense matrix × vector in ONE native pass: output element `r` is the
  * sequential left-to-right double fold `Σ vec(i) · rows(r)(i)` — exactly
  * [[ArrayDotProduct]] per row, so results are bit-identical to the
  * `array(rows.map(row => graft_dot(vec, lit(row))))` Column formulation
  * the projection oracles replicate. The Column form evaluates `outDim`
  * separate dot expressions per input row, each re-walking the vector;
  * the kernel hoists the vector once and sweeps the matrix.
  *
  * Null contract: null vector → null; wrong length or null element →
  * null result (the Column form yields per-element nulls there; callers
  * require fixed-dim well-formed vectors).
  */
case class MatVecProject(child: Expression, rows: Seq[Seq[Double]])
    extends UnaryExpression {
  require(rows.nonEmpty && rows.forall(_.size == rows.head.size))

  @transient private lazy val matrix: Array[Array[Double]] =
    rows.map(_.toArray).toArray

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    MatVecProject.project(input.asInstanceOf[ArrayData], matrix, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MatVecProject.project($c, $mRef, $isFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVecProject {
  /** Static kernel body (called from generated code as a static forwarder —
    * MUST NOT be named `eval`: the case class inherits Expression.eval, and a
    * name clash makes scalac suppress the forwarder, failing Janino and
    * silently dropping the whole projection to interpreted mode; see
    * KernelCodegenSpec); null on malformed. */
  def project(vec: ArrayData, m: Array[Array[Double]],
           isFloat: Boolean): ArrayData = {
    val dim = m(0).length
    if (vec.numElements() != dim) return null
    val v = new Array[Double](dim)
    var e = 0
    while (e < dim) {
      if (vec.isNullAt(e)) return null
      v(e) = if (isFloat) vec.getFloat(e).toDouble else vec.getDouble(e)
      e += 1
    }
    val out = new Array[Double](m.length)
    var r = 0
    while (r < m.length) {
      val row = m(r)
      var sum = 0.0
      var i = 0
      while (i < dim) { sum += v(i) * row(i); i += 1 }
      out(r) = sum
      r += 1
    }
    new GenericArrayData(out)
  }
}
