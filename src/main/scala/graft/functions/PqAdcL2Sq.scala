package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused PQ asymmetric distance (ADC) in ONE native pass: the sequential
  * L2² between `query` and the PQ reconstruction of `codes` — bit-for-bit
  * `graft_l2sq(query, flatten(array(element_at(element_at(centLit, j+1),
  * codes[j]+1) ...)))`, the Column formulation the DuckDB oracles
  * replicate (reconstruct in subspace order, then fold left-to-right
  * across the full dim).
  *
  * Why fused: the Column form materializes the codebook as a literal tree
  * (numSubspaces × numCentroids × sd `lit` nodes — 8,000 at a 125-centroid
  * corpus-size-scaled codebook) and allocates a reconstruction array per
  * scored PAIR. The kernel holds the codebook once as a reference object
  * and streams the fold with zero per-pair allocation — which is what
  * makes corpus-size-scaled codebooks ([[graft.ml.Similarity.autoPqCentroids]])
  * searchable at the same cost order as the fixed 16-centroid ones.
  *
  * Null contract: null query or codes → null; query length ≠ dim, a null
  * element, or an out-of-range code → null (the Column form's element_at
  * on a bad index raises or nulls depending on ANSI mode; callers encode
  * with [[PqEncodeCodes]] whose output is always in range).
  */
case class PqAdcL2Sq(left: Expression, right: Expression,
                     codebooks: Seq[Seq[Seq[Double]]])
    extends BinaryExpression {
  require(codebooks.nonEmpty && codebooks.head.nonEmpty)

  @transient private lazy val cbMatrix: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val qOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    val cOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    }
    if (qOk && cOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "arguments must be (array<float|double>, array<int>), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(q: Any, c: Any): Any =
    PqAdcL2Sq.adc(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      cbMatrix, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", cbMatrix, "double[][][]")
    nullSafeCodeGen(ctx, ev, (q, c) => {
      // freshName: two instances of this expression in one projection
      // land in the same generated-method scope — a bare name would
      // collide and silently fall the whole stage back to interpreted
      val r = ctx.freshName("adcRes")
      s"""
         |Object $r = graft.functions.PqAdcL2Sq.adc($q, $c, $cbRef, $isFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcL2Sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_pq_adc"
}

object PqAdcL2Sq {
  /** Static kernel body (called from generated code as a static forwarder —
    * MUST NOT be named `eval`: the case class inherits Expression.eval, and a
    * name clash makes scalac suppress the forwarder, failing Janino and
    * silently dropping the whole projection to interpreted mode; see
    * KernelCodegenSpec). Returns null
    * (boxed) for malformed input; Double otherwise.
    */
  def adc(q: ArrayData, codes: ArrayData, cb: Array[Array[Array[Double]]],
           isFloat: Boolean): java.lang.Double = {
    val numSubspaces = cb.length
    val sd = cb(0)(0).length
    if (q.numElements() != numSubspaces * sd) return null
    if (codes.numElements() != numSubspaces) return null
    var sum = 0.0
    var j = 0
    while (j < numSubspaces) {
      if (codes.isNullAt(j)) return null
      val code = codes.getInt(j)
      if (code < 0 || code >= cb(j).length) return null
      val cent = cb(j)(code)
      val base = j * sd
      var i = 0
      while (i < sd) {
        if (q.isNullAt(base + i)) return null
        val qv = if (isFloat) q.getFloat(base + i).toDouble
                 else q.getDouble(base + i)
        val d = qv - cent(i)
        sum += d * d
        i += 1
      }
      j += 1
    }
    sum
  }
}
