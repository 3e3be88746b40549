package graft.functions

import java.util.{ArrayList => JArrayList, HashMap => JHashMap, HashSet => JHashSet, LinkedHashSet => JLinkedHashSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text-pipeline expressions.
  *
  * The text operators (tokenize → n-gram → count/hash) were originally
  * composed from `org.apache.spark.sql.functions` higher-order array
  * functions. Semantically that is the right declarative shape, but Spark
  * evaluates lambda functions *interpreted, per element* (HOFs are
  * `CodegenFallback`; there is no common-subexpression caching inside a
  * lambda), so a fold over a 50-token array costs hundreds of boxed
  * expression evaluations per row — measured ~10x the scan cost on the
  * documents table. Each expression here replaces one such pipeline with a
  * tight JVM loop reachable from whole-stage codegen (`doGenCode` emits a
  * single static call), preserving the exact semantics the specs and the
  * DuckDB oracles pin down.
  *
  * These are library-internal (constructed via [[org.apache.spark.sql.graft.ColumnBridge]]);
  * constructor parameters that are not data-dependent (gram size, word
  * sets) stay plain Scala values embedded as codegen references.
  */
object TextExprs {

  private val Space = UTF8String.fromString(" ")

  /** Whitespace-run tokenizer: split on runs of 0x20, drop empties.
    * Byte-level scan is safe: UTF-8 multibyte sequences never contain
    * 0x20. Exactly `filter(split(text, " +"), t => t != "")`.
    */
  def tokenize(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new JArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      if (b(i) == 0x20) i += 1
      else {
        var j = i + 1
        while (j < n && b(j) != 0x20) j += 1
        out.add(UTF8String.fromBytes(b, i, j - i))
        i = j
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 32-bit SimHash over whitespace tokens in ONE pass: tokenize (same
    * byte-level scan as [[tokenize]]), md5 each token ONCE, take the top
    * 60 bits (= the first 15 hex chars, i.e. `conv(substring(md5(t),1,15),
    * 16,10)` — the engine-portable `hash60` contract shared with the
    * oracle), and accumulate all 32 ±1 bit counters in the same loop.
    * The Column-HOF formulation this replaces expanded to 32 independent
    * `aggregate` calls, each re-tokenizing and re-hashing every token —
    * a 32× md5 blowup per row that dominated the corpus scan.
    */
  def simhash32(s: UTF8String): Long = {
    val b = s.getBytes
    val n = b.length
    val md = md5Local.get()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (b(i) == 0x20) i += 1
      else {
        var j = i + 1
        while (j < n && b(j) != 0x20) j += 1
        md.reset()
        md.update(b, i, j - i)
        val d = md.digest()
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        h = h >>> 4 // top 60 bits = first 15 hex chars of the digest
        var t = 0
        while (t < 32) {
          counts(t) += (((h >>> t) & 1L).toInt << 1) - 1
          t += 1
        }
        i = j
      }
    }
    var out = 0L
    var t = 0
    while (t < 32) { if (counts(t) > 0) out |= 1L << t; t += 1 }
    out
  }

  /** Word n-grams joined with " "; `distinct` keeps first occurrence
    * (matching `array_distinct`). Shorter-than-n input → empty array.
    */
  def ngrams(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = arr.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    if (distinct) {
      val seen = new JLinkedHashSet[UTF8String]()
      var p = 0
      while (p < cnt) {
        seen.add(gramAt(toks, p, n))
        p += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    } else {
      val out = new Array[Any](cnt)
      var p = 0
      while (p < cnt) {
        out(p) = gramAt(toks, p, n)
        p += 1
      }
      new GenericArrayData(out)
    }
  }

  private def gramAt(toks: Array[UTF8String], p: Int, n: Int): UTF8String =
    if (n == 1) toks(p)
    else {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(p + j); j += 1 }
      UTF8String.concatWs(Space, parts: _*)
    }

  /** Gopher repetition statistics in one pass: occurrence counts for
    * 1/2/3-grams via open hash maps, then
    * (n_words, top_word, n_bigrams, top_bigram, n_trigrams, dup_trigrams)
    * where `top_*` is the max occurrence count and `dup_trigrams` the
    * number of trigram *occurrences* whose trigram appears more than once.
    * All integers — callers derive each fraction with one exact division.
    */
  def repetition(arr: ArrayData): InternalRow = {
    val m = arr.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    val words = new JHashMap[UTF8String, Int]()
    val bigrams = new JHashMap[UTF8String, Int]()
    val trigrams = new JHashMap[UTF8String, Int]()
    var topWord = 0L
    var topBigram = 0L
    i = 0
    while (i < m) {
      val wc = bump(words, toks(i))
      if (wc > topWord) topWord = wc
      if (i + 1 < m) {
        val bc = bump(bigrams, gramAt(toks, i, 2))
        if (bc > topBigram) topBigram = bc
        if (i + 2 < m) bump(trigrams, gramAt(toks, i, 3))
      }
      i += 1
    }
    val nTrigrams = math.max(m - 2, 0).toLong
    var ones = 0L
    val it = trigrams.values().iterator()
    while (it.hasNext) if (it.next() == 1) ones += 1
    new GenericInternalRow(Array[Any](
      m.toLong, topWord, math.max(m - 1, 0).toLong, topBigram,
      nTrigrams, nTrigrams - ones))
  }

  private def bump(mp: JHashMap[UTF8String, Int], k: UTF8String): Int = {
    val c = mp.merge(k, 1, (a, b) => a + b)
    c.intValue()
  }

  /** Shannon entropy of the word distribution, one pass: per-word counts
    * in a hashmap, then per-word terms `floor((c/n)·ln(c/n)·10⁶)` summed
    * as BIGINTs (quantize-then-sum — hashmap iteration order can't perturb
    * an integer sum, so the result is engine-portable). Returns
    * (n_tokens, distinct_words, entropy_micro) with entropy_micro =
    * −Σ terms ≥ 0 (in −10⁶·nats); 0 for empty or single-word docs.
    */
  def wordEntropy(arr: ArrayData): InternalRow = {
    val m = arr.numElements()
    val words = new JHashMap[UTF8String, Int]()
    var i = 0
    while (i < m) { bump(words, arr.getUTF8String(i)); i += 1 }
    var sum = 0L
    val it = words.values().iterator()
    val n = m.toDouble
    while (it.hasNext) {
      val p = it.next().toDouble / n
      sum += math.floor(p * math.log(p) * 1000000.0).toLong
    }
    new GenericInternalRow(Array[Any](
      m.toLong, words.size().toLong, -sum))
  }

  /** Deflate-compressibility stats: raw UTF-8 byte count, deflated byte
    * count (raw stream, level 6, default strategy), and the compression
    * ratio on the 1e-6 integer grid. Highly repetitive or templated text
    * compresses far below natural prose, and random gibberish compresses
    * hardly at all — the standard corpus-quality signal (Gopher/RedPajama
    * style). Deterministic for a given JVM (the JDK bundles its own zlib);
    * byte counts MAY shift across JDK majors, which is why this signal is
    * spec-gated rather than oracle-gated — no SQL engine exposes deflate.
    */
  def deflateStats(s: UTF8String): InternalRow = {
    val raw = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(raw)
    d.finish()
    var out = 0L
    val buf = new Array[Byte](4096)
    while (!d.finished()) out += d.deflate(buf)
    d.end()
    val ratio =
      if (raw.length == 0) 1000000L
      else math.floor(out.toDouble / raw.length * 1000000.0).toLong
    new GenericInternalRow(Array[Any](raw.length.toLong, out, ratio))
  }

  /** 64-bit hash per sliding k-token window. Per-token FNV-1a 64 over the
    * UTF-8 bytes, then a polynomial fold across the window. The hash VALUE
    * is internal-only (candidate keys for the duplicate-span passes; final
    * answers always re-verify on exact span strings), so it need not match
    * any engine's xxhash64 — equal spans hash equal, which is the only
    * property correctness relies on.
    */
  def windowHashes(arr: ArrayData, k: Int): ArrayData = {
    val m = arr.numElements()
    val cnt = m - k + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val b = arr.getUTF8String(i).getBytes
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < b.length) {
        h ^= (b(j) & 0xffL)
        h *= 0x100000001b3L
        j += 1
      }
      th(i) = h
      i += 1
    }
    val out = new Array[Long](cnt)
    var p = 0
    while (p < cnt) {
      var h = 1125899906842597L
      var j = 0
      while (j < k) {
        h = h * 0x9e3779b185ebca87L + th(p + j)
        j += 1
      }
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  /** UTF8String hash set from plain strings (codegen init helper —
    * `TextExprs` has no companion class, so this is reachable as a static
    * call from Janino-compiled code).
    */
  def buildSet(words: Seq[String]): JHashSet[UTF8String] = {
    val s = new JHashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Greedy longest-match WordPiece over a token array (the standard BERT
    * inference algorithm): per token, repeatedly take the longest prefix
    * present in the vocabulary — continuation pieces carry the "##"
    * prefix — and emit `unk` for the whole token when no prefix matches.
    * Deterministic for a fixed vocabulary.
    */
  def wordpiece(arr: ArrayData, vocab: JHashSet[UTF8String],
                unk: UTF8String): ArrayData = {
    val m = arr.numElements()
    val out = new JArrayList[UTF8String]()
    var i = 0
    while (i < m) {
      val tok = arr.getUTF8String(i).toString
      val pieces = new JArrayList[UTF8String]()
      var start = 0
      var ok = true
      while (ok && start < tok.length) {
        var end = tok.length
        var found: UTF8String = null
        while (found == null && end > start) {
          val sub = tok.substring(start, end)
          val candidate =
            UTF8String.fromString(if (start == 0) sub else "##" + sub)
          if (vocab.contains(candidate)) found = candidate
          else end -= 1
        }
        if (found == null) ok = false
        else { pieces.add(found); start = end }
      }
      if (ok) out.addAll(pieces) else out.add(unk)
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** Count of array elements contained in `set`. */
  def countInSet(arr: ArrayData, set: JHashSet[UTF8String]): Long = {
    val m = arr.numElements()
    var c = 0L
    var i = 0
    while (i < m) {
      if (set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Exact sum of per-token character counts (order-independent integer
    * sum — bit-identical to the `aggregate(toks, 0L, acc + length(t))`
    * fold it replaces).
    */
  def sumTokenChars(arr: ArrayData): Long = {
    val m = arr.numElements()
    var s = 0L
    var i = 0
    while (i < m) { s += arr.getUTF8String(i).numChars(); i += 1 }
    s
  }

  /** Unicode normalization (NFC/NFD/NFKC/NFKD) via `java.text.Normalizer`.
    * The `isNormalized` fast path returns the input UTF8String untouched —
    * for the common case (already-NFC web text) the cost is one scan, no
    * allocation, no re-encode.
    */
  def unicodeNormalize(s: UTF8String,
      form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  /** Java-regex `\s` membership for a byte (all-ASCII set, UTF-8-safe). */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** See [[NormText]]: lower → trim(0x20) → collapse `\s+` → " ", with an
    * optional codepoint-bounded prefix early-stop (`prefixLen < 0` = full).
    */
  def normText(s: UTF8String, prefixLen: Int): UTF8String = {
    val b = s.toLowerCase.getBytes
    var lo = 0
    var hi = b.length
    while (lo < hi && b(lo) == 0x20) lo += 1
    while (hi > lo && b(hi - 1) == 0x20) hi -= 1
    val out = new Array[Byte](hi - lo)
    var o = 0
    var cps = 0 // codepoints emitted (continuation bytes 10xxxxxx not counted)
    var i = lo
    while (i < hi && (prefixLen < 0 || cps < prefixLen)) {
      val c = b(i)
      if (isWs(c)) {
        out(o) = 0x20; o += 1; cps += 1
        i += 1
        while (i < hi && isWs(b(i))) i += 1
      } else {
        out(o) = c; o += 1
        if ((c & 0xc0) != 0x80) cps += 1
        i += 1
        // copy the continuation bytes of a multibyte codepoint atomically
        while (i < hi && (b(i) & 0xc0) == 0x80) { out(o) = b(i); o += 1; i += 1 }
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** See [[Hash60]]: first 15 md5 hex chars as a 60-bit non-negative long. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val digest = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) >> 4) & 0xfL)
  }
  def hash60(s: UTF8String): Long = hash60(s.getBytes)
}

/** `tokenize(text)` — see [[TextExprs.tokenize]]. */
case class WhitespaceTokens(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextExprs.tokenize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.tokenize($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `unicode_normalize(text)` — see [[TextExprs.unicodeNormalize]]. `form`
  * is one of NFC/NFD/NFKC/NFKD (validated at construction, so a typo fails
  * at plan time, not per row).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {
  private val f = java.text.Normalizer.Form.valueOf(form)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextExprs.unicodeNormalize(input.asInstanceOf[UTF8String], f)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextExprs.unicodeNormalize($c, " +
        s"java.text.Normalizer.Form.${f.name})")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash32(text)` — see [[TextExprs.simhash32]]. */
case class SimHashBits(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextExprs.simhash32(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ngrams(tokens, n[, distinct])` — see [[TextExprs.ngrams]]. */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  require(n >= 1, "ngram size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextExprs.ngrams(input.asInstanceOf[ArrayData], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExprs.ngrams($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document repetition statistics — see [[TextExprs.repetition]]. */
case class RepetitionStats(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("top_word", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false),
    StructField("n_trigrams", LongType, nullable = false),
    StructField("dup_trigrams", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextExprs.repetition(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.repetition($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word-distribution Shannon entropy — see [[TextExprs.wordEntropy]]. */
case class WordEntropyStats(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("distinct_words", LongType, nullable = false),
    StructField("entropy_micro", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextExprs.wordEntropy(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.wordEntropy($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deflate-compressibility stats — see [[TextExprs.deflateStats]]. */
case class DeflateStats(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("raw_bytes", LongType, nullable = false),
    StructField("deflate_bytes", LongType, nullable = false),
    StructField("ratio_micro", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextExprs.deflateStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.deflateStats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sliding k-token window hashes — see [[TextExprs.windowHashes]]. */
case class WindowHashes64(child: Expression, k: Int) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  require(k >= 1, "window size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextExprs.windowHashes(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExprs.windowHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of tokens that belong to a fixed word set (stopword hits). */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  @transient private lazy val set: JHashSet[UTF8String] =
    TextExprs.buildSet(words)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextExprs.countInSet(input.asInstanceOf[ArrayData], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // embed the words (serializable strings), rebuild the UTF8String set
    // once per compiled plan via a mutable-state one-time initializer
    val wordsRef = ctx.addReferenceObj("words", words,
      "scala.collection.immutable.Seq")
    val setVar = ctx.addMutableState("java.util.HashSet", "wordSet",
      v => s"$v = graft.functions.TextExprs.buildSet($wordsRef);")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExprs.countInSet($c, $setVar)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Greedy WordPiece pieces for a token array against a fixed vocabulary. */
case class WordpiecePieces(child: Expression, vocab: Seq[String],
                           unk: String) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  @transient private lazy val set: JHashSet[UTF8String] =
    TextExprs.buildSet(vocab)
  @transient private lazy val unkU = UTF8String.fromString(unk)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextExprs.wordpiece(input.asInstanceOf[ArrayData], set, unkU)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("vocab", vocab,
      "scala.collection.immutable.Seq")
    val setVar = ctx.addMutableState("java.util.HashSet", "wpVocab",
      v => s"$v = graft.functions.TextExprs.buildSet($vocabRef);")
    val unkRef = ctx.addReferenceObj("unk", unkU,
      classOf[UTF8String].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExprs.wordpiece($c, $setVar, $unkRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact sum of token character counts. */
case class SumTokenChars(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextExprs.sumTokenChars(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.sumTokenChars($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Stopword-vote language ID: per-language hit counts in one pass over the
  * token array, argmax with (hits desc, language asc) tiebreak, "und" when
  * no language scores a hit — byte-identical to the previous fold.
  */
case class LangBest(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  @transient private lazy val model = new LangModel(langs)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    model.best(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("langModel", model,
      classOf[LangModel].getName)
    defineCodeGen(ctx, ev, c => s"$modelRef.best($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Merge-rank-faithful BPE encoding of a token array: per token, start
  * from single characters and repeatedly apply the LOWEST-RANK applicable
  * merge (all its occurrences, left-to-right non-overlapping) until no
  * learned pair remains — the exact apply-time semantics matching
  * [[graft.ml.BpeTrain]] training, unlike greedy longest-match WordPiece
  * which can pick pieces the merge order would never form. Emits the flat
  * piece sequence (pieces rejoin to their tokens).
  */
case class BpeEncodePieces(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  @transient private lazy val model = new BpeModel(merges)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    model.encode(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model,
      classOf[BpeModel].getName)
    defineCodeGen(ctx, ev, c => s"$modelRef.encode($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Serializable merge-rank model for [[BpeEncodePieces]] (top-level class
  * so generated code can name it without inner-class `$` binary names).
  */
class BpeModel(merges: Seq[(String, String)]) extends Serializable {
  private val pairs: Array[(String, String)] = merges.toArray
  // boxed Integer values: JHashMap[String, Int] would unbox a missing
  // key's null to 0, silently treating EVERY pair as rank 0 (and looping
  // forever when that pair is absent from the word)
  private val rank = new JHashMap[String, Integer]()
  pairs.zipWithIndex.foreach { case ((l, r), i) =>
    rank.putIfAbsent(l + "\u0000" + r, Integer.valueOf(i)); ()
  }

  def encode(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val out = new JArrayList[UTF8String]()
    var t = 0
    while (t < m) {
      val tok = arr.getUTF8String(t).toString
      // split by CODE POINT, not UTF-16 code unit: a surrogate pair split
      // into lone surrogates round-trips as '?' through UTF8String, which
      // would break piece-rejoin losslessness for non-BMP text — and must
      // match the training-side symbolization (wordTable's split(word,''),
      // trainInMemory's codePointSyms) so merge ranks apply
      var syms = new Array[String](tok.codePointCount(0, tok.length))
      var i = 0
      var si = 0
      while (i < tok.length) {
        val cc = Character.charCount(tok.codePointAt(i))
        syms(si) = tok.substring(i, i + cc)
        si += 1
        i += cc
      }
      var done = syms.length < 2
      while (!done) {
        // lowest-rank pair present anywhere in the symbol sequence
        var best = Int.MaxValue
        var j = 0
        while (j < syms.length - 1) {
          val r = rank.get(syms(j) + "\u0000" + syms(j + 1))
          if (r != null && r < best) best = r
          j += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (l, r) = pairs(best)
          val next = new JArrayList[String](syms.length)
          var p = 0
          while (p < syms.length) {
            if (p + 1 < syms.length && syms(p) == l && syms(p + 1) == r) {
              next.add(l + r); p += 2
            } else { next.add(syms(p)); p += 1 }
          }
          syms = next.toArray(new Array[String](next.size))
          if (syms.length < 2) done = true
        }
      }
      var k = 0
      while (k < syms.length) {
        out.add(UTF8String.fromString(syms(k))); k += 1
      }
      t += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}

/** Serializable vote model for [[LangBest]] (top-level class so generated
  * code can name it without inner-class `$` binary names).
  */
class LangModel(langs: Seq[(String, Seq[String])]) extends Serializable {
  private val sorted = langs.sortBy(_._1).toArray
  private val names: Array[UTF8String] =
    sorted.map { case (l, _) => UTF8String.fromString(l) }
  private val sets: Array[JHashSet[UTF8String]] =
    sorted.map { case (_, ws) => TextExprs.buildSet(ws) }
  private val und = UTF8String.fromString("und")

  def best(arr: ArrayData): UTF8String = {
    val m = arr.numElements()
    val counts = new Array[Long](sets.length)
    var i = 0
    while (i < m) {
      val t = arr.getUTF8String(i)
      var l = 0
      while (l < sets.length) {
        if (sets(l).contains(t)) counts(l) += 1
        l += 1
      }
      i += 1
    }
    var bestIdx = -1
    var bestCount = 0L
    var l = 0
    while (l < counts.length) {
      if (counts(l) > bestCount) { bestCount = counts(l); bestIdx = l }
      l += 1
    }
    if (bestIdx < 0) und else names(bestIdx)
  }
}

/** `norm_text(text[, prefixLen])` — whitespace/case normalization,
  * bit-identical to `regexp_replace(trim(lower(text)), "\\s+", " ")`:
  * Unicode lowercase (delegated to `UTF8String.toLowerCase`, the same
  * call the `lower` builtin makes), trim of 0x20 only (the `trim`
  * builtin's contract), then each maximal run of Java-regex `\s`
  * (tab/LF/VT/FF/CR/space — all ASCII, so the byte scan is UTF-8-safe)
  * collapses to one space. The regex form walks the full document
  * through the regex engine and allocates per match; this is one pass
  * and one output buffer.
  *
  * `prefixLen >= 0` additionally truncates to the first `prefixLen`
  * CODEPOINTS of the normalized text (`substring(norm, 1, n)`
  * semantics) and stops scanning as soon as they are produced — the
  * edit-distance blocker only needs 80 chars of multi-KB documents.
  */
case class NormText(child: Expression, prefixLen: Int = -1)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextExprs.normText(input.asInstanceOf[UTF8String], prefixLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExprs.normText($c, $prefixLen)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hash60(text | binary)` — scalar twin of
  * [[HashArrayExprs.hash60ModElems]] (no modulus): integer value of the
  * first 15 md5 hex chars, bit-identical to
  * `conv(substring(md5(cast(c as binary)), 1, 15), 16, 10) cast long`
  * without allocating the hex string. Accepts string (UTF-8 bytes, the
  * `cast(string as binary)` contract) or binary input.
  */
case class Hash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"hash60 requires string or binary input, got $t")
    }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => TextExprs.hash60(s)
    case b: Array[Byte] => TextExprs.hash60(b)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.hash60($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
