package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 vector quantization in ONE native pass: each element
  * maps to `floor(x · 127 / amax + 0.5)` with `amax = max |x|` (all-zero
  * vectors stay zero) — element-for-element the
  * `array_max(transform(vec, abs))` + `transform(vec, floor(...))`
  * Column formulation the quantized-ANN oracle replicates (half-up floor
  * onto the [-127, 127] grid; every step is a correctly-rounded IEEE op,
  * so results are engine-portable). The Column form runs two interpreted
  * higher-order lambdas over the vector per row; the kernel is one loop.
  *
  * Null contract: null vector → null; null element → null result.
  */
case class QuantizeInt8Vec(child: Expression) extends UnaryExpression {

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
    QuantizeInt8Vec.quantize(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.QuantizeInt8Vec.quantize($c, $isFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8Vec {
  /** Static kernel body (called from generated code as a static forwarder —
    * MUST NOT be named `eval`: the case class inherits Expression.eval, and a
    * name clash makes scalac suppress the forwarder, failing Janino and
    * silently dropping the whole projection to interpreted mode; see
    * KernelCodegenSpec); null on null elems. */
  def quantize(vec: ArrayData, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    var amax = 0.0
    i = 0
    while (i < n) {
      val a = math.abs(v(i))
      if (a > amax) amax = a
      i += 1
    }
    val out = new Array[Double](n)
    if (amax != 0.0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(v(i) * 127.0 / amax + 0.5)
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}
