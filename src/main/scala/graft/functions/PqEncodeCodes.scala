package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encode in ONE native pass: for each subspace `j`,
  * the index of the codebook centroid minimizing the sequential L2²
  * distance to the row's subvector (first index on ties) — bit-for-bit
  * the `transform(centLit(j), cent => graft_l2sq(slice(vec,...), cent))`
  * + `array_position(dists, array_min(dists)) - 1` Column formulation the
  * DuckDB oracle replicates.
  *
  * Why fused: the Column form runs a higher-order `transform` lambda —
  * interpreted per element — over numSubspaces × numCentroids centroids
  * per row (128 interpreted L2² evaluations at the defaults, each
  * re-slicing the vector). The kernel hoists the vector once and sweeps
  * the codebooks in a tight primitive loop.
  *
  * Null contract: null vector → null; wrong length or null element →
  * null (the Column form degrades to null codes elementwise in that case;
  * encode callers require well-formed fixed-dim vectors either way).
  */
case class PqEncodeCodes(child: Expression,
                         codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.head.nonEmpty)

  private val numSubspaces = codebooks.size
  private val sd = codebooks.head.head.size
  @transient private lazy val cbMatrix: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    PqEncodeCodes.encode(input.asInstanceOf[ArrayData], cbMatrix, sd, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", cbMatrix, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.PqEncodeCodes.encode($c, $cbRef, $sd, $isFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeCodes {
  /** Static kernel body (called from generated code as a static forwarder —
    * MUST NOT be named `eval`: the case class inherits Expression.eval, and a
    * name clash makes scalac suppress the forwarder, failing Janino and
    * silently dropping the whole projection to interpreted mode; see
    * KernelCodegenSpec). Returns null for a
    * malformed (wrong-length / null-element) vector.
    */
  def encode(vec: ArrayData, cb: Array[Array[Array[Double]]], sd: Int,
           isFloat: Boolean): ArrayData = {
    val numSubspaces = cb.length
    val dim = numSubspaces * sd
    val n = vec.numElements()
    if (n != dim) return null
    val v = new Array[Double](dim)
    var e = 0
    while (e < dim) {
      if (vec.isNullAt(e)) return null
      v(e) = if (isFloat) vec.getFloat(e).toDouble else vec.getDouble(e)
      e += 1
    }
    val codes = new Array[Int](numSubspaces)
    var j = 0
    while (j < numSubspaces) {
      val base = j * sd
      val cents = cb(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var sum = 0.0
        var i = 0
        while (i < sd) {
          val d = v(base + i) - cent(i)
          sum += d * d
          i += 1
        }
        // strict < keeps the FIRST minimum — array_position semantics
        if (sum < bestD) { bestD = sum; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }
}
