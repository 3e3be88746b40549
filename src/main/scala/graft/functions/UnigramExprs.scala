package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernels for the unigram-LM (SentencePiece-style) tokenizer
  * ([[graft.ml.UnigramLm]]): candidate-substring enumeration for vocab
  * seeding and the per-word Viterbi segmentation under a piece log-prob
  * table. Both follow the fused-kernel house rules: distinctly-named
  * statics (never `eval` — the suppressed-forwarder gotcha,
  * KernelCodegenSpec), codegen via `defineCodeGen`, model held once as a
  * reference object.
  */
object UnigramExprs {

  /** All code-point substrings of `w` with length 1..maxLen, in
    * (start asc, length asc) order — the deterministic candidate
    * enumeration the vocab seeding counts.
    */
  def substrings(w: UTF8String, maxLen: Int): ArrayData = {
    val s = w.toString
    // code-point start offsets (+ end)
    val offs = cpOffsets(s)
    val n = offs.length - 1
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      var len = 1
      while (len <= maxLen && i + len <= n) {
        out.add(UTF8String.fromString(s.substring(offs(i), offs(i + len))))
        len += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private[functions] def cpOffsets(s: String): Array[Int] = {
    val b = new scala.collection.mutable.ArrayBuffer[Int](s.length + 1)
    var i = 0
    while (i < s.length) { b += i; i += Character.charCount(s.codePointAt(i)) }
    b += s.length
    b.toArray
  }
}

/** Candidate substrings (code-point based, length ≤ maxLen) of a word. */
case class AllSubstrings(child: Expression, maxLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(maxLen >= 1, "maxLen must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    UnigramExprs.substrings(input.asInstanceOf[UTF8String], maxLen)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnigramExprs.substrings($c, $maxLen)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The unigram model: piece → natural-log probability, plus the UNK
  * piece/log-prob for characters outside the vocabulary. Held as ONE
  * reference object per plan (the LangModel / PQ-codebook pattern).
  *
  * Viterbi contract (mirrored verbatim by the pure-Scala reference in
  * `UnigramLmSpec`): DP over code points, candidates at position i are
  * the vocab pieces ending there with length ≤ maxPieceLen, plus — for
  * single characters NOT in the vocab — the UNK piece at `unkLogp`;
  * a candidate wins only on STRICTLY greater score (ties keep the
  * earliest candidate in ascending-length order), so the segmentation
  * is deterministic.
  */
class UnigramModel(val piecesSeq: Seq[(String, Double)], val unk: String,
                   val unkLogp: Double) extends Serializable {
  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](
      piecesSeq.size * 2)
    piecesSeq.foreach { case (p, lp) => m.put(p, lp) }
    m
  }
  @transient private lazy val maxPieceLen: Int =
    if (piecesSeq.isEmpty) 1
    else piecesSeq.map(p => p._1.codePointCount(0, p._1.length)).max
  @transient private lazy val unkU = UTF8String.fromString(unk)

  /** Viterbi pieces of one word (never empty for a non-empty word). */
  def segment(word: String): Array[UTF8String] = {
    val offs = UnigramExprs.cpOffsets(word)
    val n = offs.length - 1
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val backJ = new Array[Int](n + 1)
    val backP = new Array[UTF8String](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var len = 1
      while (len <= maxPieceLen && len <= i) {
        val j = i - len
        if (best(j) != Double.NegativeInfinity) {
          val sub = word.substring(offs(j), offs(i))
          val lp = table.get(sub)
          if (lp != null) {
            val sc = best(j) + lp.doubleValue()
            if (sc > best(i)) {
              best(i) = sc; backJ(i) = j
              backP(i) = UTF8String.fromString(sub)
            }
          } else if (len == 1) {
            val sc = best(j) + unkLogp
            if (sc > best(i)) {
              best(i) = sc; backJ(i) = j; backP(i) = unkU
            }
          }
        }
        len += 1
      }
      i += 1
    }
    // backtrack
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var pos = n
    while (pos > 0) { out += backP(pos); pos = backJ(pos) }
    out.reverseIterator.toArray
  }

  /** Pieces of a whole token array, concatenated in token order. */
  def segmentAll(toks: ArrayData): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < toks.numElements()) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        val ps = segment(t.toString)
        var j = 0
        while (j < ps.length) { out.add(ps(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Viterbi unigram pieces of a token array under a fixed model. */
case class UnigramPieces(child: Expression, model: UnigramModel)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    model.segmentAll(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c => s"$modelRef.segmentAll($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
