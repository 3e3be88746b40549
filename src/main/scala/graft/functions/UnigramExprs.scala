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

  /** Order-pinned log-add-exp (`m + log1p(exp(min − m))`) — the one
    * accumulation formula every lattice pass (and the spec reference)
    * shares, so float results are bit-identical given the same visit
    * order.
    */
  private[graft] def ladd(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else {
      val m = math.max(a, b)
      m + math.log1p(math.exp(math.min(a, b) - m))
    }

  /** splitmix64 finalizer — the deterministic per-(word, seed, position)
    * uniform for sampled segmentation. Pure integer ops + one exact
    * power-of-two division, so kernel and reference are bit-identical.
    */
  private[graft] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform in [0, 1) from (word hash, seed, lattice position) — the
    * top 53 bits of [[mix64]] over the XOR-mix; `String.hashCode` is
    * JVM-specified (31-polynomial), so the stream is platform-stable.
    */
  private[graft] def unitUniform(wordHash: Long, seed: Long,
                                 pos: Long): Double =
    (mix64(wordHash ^ (seed * 0xc2b2ae3d27d4eb4fL) ^
      (pos * 0x5851f42d4c957f2dL)) >>> 11).toDouble / (1L << 53).toDouble
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

  /** Forward-backward EXPECTED piece counts of one word under the model
    * (the soft-EM E-step, Kudo 2018 §3.2), gridded to the 10⁻⁶ grid:
    * returns an array of (piece, e_micro) structs, pieces ascending,
    * entries with `floor(e·10⁶) == 0` omitted.
    *
    * Lattice contract (mirrored verbatim by the pure-Scala reference in
    * `UnigramLmSpec`): edges are vocab pieces plus — for single
    * characters NOT in the vocab — the UNK piece at `unkLogp`;
    * α forward / β backward over code points with log-sum-exp
    * accumulated in ASCENDING length order at each position;
    * an edge's posterior is `exp(α(i) + lp + β(j) − Z)`, per-piece
    * sums accumulate in (start asc, length asc) edge-scan order. The
    * fixed orders pin every float operation, so the kernel and the
    * reference produce bit-identical doubles and the gridded outputs
    * are exact — the cross-word aggregation then sums BIGINTs,
    * order-independently.
    */
  def expectedMicro(word: String): ArrayData = {
    val offs = UnigramExprs.cpOffsets(word)
    val n = offs.length - 1
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    def ladd(a: Double, b: Double): Double = UnigramExprs.ladd(a, b)
    // edge log-prob at (start j, end i), or NaN when no edge exists
    def edgeLp(j: Int, i: Int): Double = {
      val sub = word.substring(offs(j), offs(i))
      val lp = table.get(sub)
      if (lp != null) lp.doubleValue()
      else if (i - j == 1) unkLogp
      else Double.NaN
    }
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    java.util.Arrays.fill(alpha, Double.NegativeInfinity)
    java.util.Arrays.fill(beta, Double.NegativeInfinity)
    alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var len = 1
      while (len <= maxPieceLen && len <= i) {
        val j = i - len
        if (alpha(j) != Double.NegativeInfinity) {
          val lp = edgeLp(j, i)
          if (!lp.isNaN) alpha(i) = ladd(alpha(i), alpha(j) + lp)
        }
        len += 1
      }
      i += 1
    }
    beta(n) = 0.0
    var s = n - 1
    while (s >= 0) {
      var len = 1
      while (len <= maxPieceLen && s + len <= n) {
        val e = s + len
        if (beta(e) != Double.NegativeInfinity) {
          val lp = edgeLp(s, e)
          if (!lp.isNaN) beta(s) = ladd(beta(s), lp + beta(e))
        }
        len += 1
      }
      s -= 1
    }
    val z = alpha(n)
    if (z == Double.NegativeInfinity)
      return new GenericArrayData(Array.empty[Any])
    // per-piece expectations, accumulated in (start asc, length asc)
    // edge order so the float sums are order-pinned
    val acc = new java.util.LinkedHashMap[String, java.lang.Double]()
    var st = 0
    while (st < n) {
      var len = 1
      while (len <= maxPieceLen && st + len <= n) {
        val en = st + len
        if (alpha(st) != Double.NegativeInfinity &&
            beta(en) != Double.NegativeInfinity) {
          val lp = edgeLp(st, en)
          if (!lp.isNaN) {
            val sub = word.substring(offs(st), offs(en))
            val label = if (table.get(sub) != null) sub else unk
            val e = math.exp(alpha(st) + lp + beta(en) - z)
            val prev = acc.get(label)
            acc.put(label, if (prev == null) e else prev.doubleValue() + e)
          }
        }
        len += 1
      }
      st += 1
    }
    // deterministic output order: piece ascending; zero-micro entries drop
    val keys = new java.util.ArrayList[String](acc.keySet())
    java.util.Collections.sort(keys)
    val rows = new java.util.ArrayList[Any](keys.size())
    var ki = 0
    while (ki < keys.size()) {
      val p = keys.get(ki)
      val eMicro = math.floor(acc.get(p).doubleValue() * 1e6).toLong
      if (eMicro > 0L) {
        rows.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(p), eMicro)))
      }
      ki += 1
    }
    new GenericArrayData(rows.toArray)
  }

  /** SAMPLED segmentation (subword regularization, Kudo 2018 §3.1):
    * draw one segmentation from `P(x|w)^α` (normalized) via
    * forward-filtering backward-sampling — the training-time
    * augmentation that exposes the model to runner-up tokenizations.
    * α=0 samples segmentations uniformly; larger α sharpens toward
    * Viterbi. DETERMINISTIC: the per-step uniform is
    * [[UnigramExprs.unitUniform]] over (word hash, seed, lattice
    * position) — same word + seed ⇒ same pieces on every executor, any
    * partitioning, any engine (pure integer mixing; the lattice floats
    * follow the same pinned orders as [[expectedMicro]], mirrored by
    * the spec reference).
    *
    * Contract details: edges are vocab pieces plus UNK for
    * out-of-vocab single characters; the backward walk scans
    * candidates in ascending length order accumulating normalized
    * posteriors until the cumulative mass exceeds the uniform; float
    * shortfall (Σ = 1−ε < u) falls to the LAST candidate.
    */
  def segmentSampled(word: String, alpha: Double,
                     seed: Long): Array[UTF8String] = {
    val offs = UnigramExprs.cpOffsets(word)
    val n = offs.length - 1
    if (n == 0) return Array.empty
    // forward alphas under the α-scaled log-probs
    val a = new Array[Double](n + 1)
    java.util.Arrays.fill(a, Double.NegativeInfinity)
    a(0) = 0.0
    def scaledLp(j: Int, i: Int): Double = {
      val sub = word.substring(offs(j), offs(i))
      val lp = table.get(sub)
      if (lp != null) alpha * lp.doubleValue()
      else if (i - j == 1) alpha * unkLogp
      else Double.NaN
    }
    var i = 1
    while (i <= n) {
      var len = 1
      while (len <= maxPieceLen && len <= i) {
        val j = i - len
        if (a(j) != Double.NegativeInfinity) {
          val lp = scaledLp(j, i)
          if (!lp.isNaN) a(i) = UnigramExprs.ladd(a(i), a(j) + lp)
        }
        len += 1
      }
      i += 1
    }
    if (a(n) == Double.NegativeInfinity) return Array.empty // unreachable
    val wh = word.hashCode.toLong
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var pos = n
    while (pos > 0) {
      val u = UnigramExprs.unitUniform(wh, seed, pos.toLong)
      var cum = 0.0
      var chosenJ = -1
      var chosenP: UTF8String = null
      var len = 1
      while (len <= maxPieceLen && len <= pos) {
        val j = pos - len
        if (a(j) != Double.NegativeInfinity) {
          val lp = scaledLp(j, pos)
          if (!lp.isNaN) {
            val sub = word.substring(offs(j), offs(pos))
            val piece =
              if (table.get(sub) != null) UTF8String.fromString(sub)
              else unkU
            // first candidate always latches (float-shortfall fallback
            // is the LAST candidate, so keep overwriting until cum > u)
            if (chosenJ < 0 || cum <= u) { chosenJ = j; chosenP = piece }
            cum += math.exp(a(j) + lp - a(pos))
          }
        }
        len += 1
      }
      out += chosenP
      pos = chosenJ
    }
    out.reverseIterator.toArray
  }

  /** Sampled pieces of a whole token array, token order preserved. */
  def segmentAllSampled(toks: ArrayData, alpha: Double,
                        seed: Long): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < toks.numElements()) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        val ps = segmentSampled(t.toString, alpha, seed)
        var j = 0
        while (j < ps.length) { out.add(ps(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
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

/** Forward-backward expected piece counts (micro-gridded) of one word
  * under a fixed model — the soft-EM E-step kernel.
  */
case class UnigramExpected(child: Expression, model: UnigramModel)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("piece", StringType,
        nullable = false),
      org.apache.spark.sql.types.StructField("e_micro",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(input: Any): Any =
    model.expectedMicro(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c => s"$modelRef.expectedMicro($c.toString())")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sampled unigram pieces (subword regularization) of a token array
  * under a fixed model — deterministic per (word, seed).
  */
case class UnigramPiecesSampled(child: Expression, model: UnigramModel,
                                alpha: Double, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    model.segmentAllSampled(input.asInstanceOf[ArrayData], alpha, seed)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    // render alpha via its raw bits — every double (including the
    // non-finite ones a direct constructor call could smuggle past
    // encodePiecesSampled's require) is a valid Java literal this way
    val alphaSrc =
      s"java.lang.Double.longBitsToDouble(" +
        s"${java.lang.Double.doubleToLongBits(alpha)}L)"
    defineCodeGen(ctx, ev,
      c => s"$modelRef.segmentAllSampled($c, $alphaSrc, ${seed}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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
