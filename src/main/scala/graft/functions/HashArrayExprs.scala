package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native array-hash kernels for the dedup pipeline.
  *
  * The shingle/MinHash paths were composed from `transform(arr, lambda)` —
  * semantically right, but higher-order functions are `CodegenFallback`
  * and evaluate the lambda interpreted per element, which also knocks the
  * WHOLE enclosing Filter/Project out of whole-stage codegen. Each kernel
  * here replaces one such lambda pipeline with a single static call
  * reachable from codegen, preserving bit-exact semantics (same hash
  * functions, same Long arithmetic as the non-ANSI Spark operators they
  * replace).
  */
object HashArrayExprs {

  /** Per-element xxhash64 (seed 42 — the `functions.xxhash64` default).
    * Delegates to the SAME `XxHash64Function` the builtin uses, so values
    * are bit-identical to `transform(arr, s => xxhash64(s))`.
    */
  def xxhash64Elems(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  /** [[graft.ml.Dedup.hash60]] (integer value of the first 15 md5 hex
    * chars) mod `m`, per element — bit-identical to
    * `transform(arr, s => conv(substring(md5(s), 1, 15), 16, 10)
    * .cast(long) % m)`: 15 hex chars = 60 bits, so the base-16 parse is
    * exact and non-negative, and `%` of non-negatives matches Java.
    */
  def hash60ModElems(arr: ArrayData, m: Long): ArrayData = {
    val md = md5Local.get()
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val digest = md.digest(arr.getUTF8String(i).getBytes)
      // first 15 hex chars = first 7 bytes + high nibble of byte 8
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (digest(b) & 0xffL); b += 1 }
      v = (v << 4) | ((digest(7) >> 4) & 0xfL)
      out(i) = v % m
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature in ONE array pass: slot `j` =
    * `min_x((as(j)*x + bs(j)) % prime)` over the shingle hashes `x` —
    * bit-identical to `array(array_min(transform(sh, x =>
    * (lit(a)*x + lit(b)) % prime)) …)` for `x, a, b ∈ [0, prime)` with
    * `prime = 2³¹−1` (products stay < 2⁶², so no Long wrap on either
    * side). An empty input yields all-null slots, matching `array_min`
    * on an empty array.
    */
  def minhashSig(arr: ArrayData, as: Array[Long], bs: Array[Long],
                 prime: Long): ArrayData = {
    val k = as.length
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * x + bs(j)) % prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Splice-out + rejoin in ONE pass — bit-identical to
    * `when(rs.isNull, concat_ws(" ", tk)).otherwise(concat_ws(" ",
    * filter(tk, (t, i) => !exists(rs, r => i+1 >= r.start_tok && i+1 <=
    * r.end_tok))))` for `rs: array<struct<start_tok: long, end_tok:
    * long>>`: token i (1-based) survives unless some range covers it;
    * survivors join with single spaces; a null `rs` keeps every token;
    * `concat_ws` never returns null (null `tk` → empty string). The HOF
    * form evaluated an interpreted `exists` lambda per TOKEN per range.
    */
  def spliceConcat(tk: ArrayData, rs: ArrayData): UTF8String = {
    if (tk == null) return UTF8String.EMPTY_UTF8
    val n = tk.numElements()
    var m = 0
    val starts = if (rs == null) null else new Array[Long](rs.numElements())
    val ends = if (rs == null) null else new Array[Long](rs.numElements())
    if (rs != null) {
      m = rs.numElements()
      var j = 0
      while (j < m) {
        val row = rs.getStruct(j, 2)
        starts(j) = row.getLong(0)
        ends(j) = row.getLong(1)
        j += 1
      }
    }
    val kept = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val pos = i + 1L
      var cut = false
      var j = 0
      while (!cut && j < m) {
        if (pos >= starts(j) && pos <= ends(j)) cut = true
        j += 1
      }
      if (!cut) kept.add(tk.getUTF8String(i))
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "),
      kept.toArray(new Array[UTF8String](kept.size())): _*)
  }

  /** See [[ConcatStructField]]: join string field `ordinal` of each
    * struct element with `sep` — one pass, no per-element lambda.
    */
  def concatStructField(arr: ArrayData, ordinal: Int, numFields: Int,
                        sep: UTF8String): UTF8String = {
    val n = arr.numElements()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      parts(i) = arr.getStruct(i, numFields).getUTF8String(ordinal)
      i += 1
    }
    UTF8String.concatWs(sep, parts: _*)
  }

  /** Whitespace-token count without building the token array — the cheap
    * filter-side twin of [[TextExprs.tokenize]]: number of 0x20-separated
    * runs (UTF-8 multibyte sequences never contain 0x20).
    */
  def tokenCount(s: UTF8String): Int = {
    val b = s.getBytes
    val n = b.length
    var cnt = 0
    var i = 0
    while (i < n) {
      if (b(i) == 0x20) i += 1
      else {
        cnt += 1
        var j = i + 1
        while (j < n && b(j) != 0x20) j += 1
        i = j
      }
    }
    cnt
  }
}

/** `xxhash64_elems(arr)` — see [[HashArrayExprs.xxhash64Elems]]. */
case class XxHash64Array(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashArrayExprs.xxhash64Elems(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashArrayExprs.xxhash64Elems($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hash60_mod_elems(arr, m)` — see [[HashArrayExprs.hash60ModElems]]. */
case class Hash60ModArray(child: Expression, m: Long) extends UnaryExpression
    with ExpectsInputTypes {
  require(m > 0, "modulus must be positive")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashArrayExprs.hash60ModElems(input.asInstanceOf[ArrayData], m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashArrayExprs.hash60ModElems($c, ${m}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sig(sh)` — see [[HashArrayExprs.minhashSig]]. */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long],
                      prime: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(as.nonEmpty && as.size == bs.size, "one (a, b) pair per slot")
  require(prime > 0 && prime <= Int.MaxValue.toLong,
    "prime must fit 31 bits so a*x + b cannot wrap a Long")
  private lazy val aArr = as.toArray
  private lazy val bArr = bs.toArray
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    HashArrayExprs.minhashSig(input.asInstanceOf[ArrayData], aArr, bArr, prime)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhAs", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhBs", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashArrayExprs.minhashSig($c, $aRef, $bRef, ${prime}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `token_count(text)` — see [[HashArrayExprs.tokenCount]]. */
case class TokenCount(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    HashArrayExprs.tokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashArrayExprs.tokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `splice_concat(tk, rs)` — see [[HashArrayExprs.spliceConcat]].
  * Null-safe binary form: callers guarantee non-null children (coalesce
  * text to "" and ranges to an empty array), which keeps the expression
  * on the cheap `defineCodeGen` path.
  */
case class SpliceConcat(tk: Expression, rs: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = tk
  override def right: Expression = rs
  override def dataType: DataType = StringType
  override protected def nullSafeEval(t: Any, r: Any): Any =
    HashArrayExprs.spliceConcat(t.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, r) =>
      s"graft.functions.HashArrayExprs.spliceConcat($t, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tk = newLeft, rs = newRight)
}

/** `concat_struct_field(arr, ordinal, sep)` — see
  * [[HashArrayExprs.concatStructField]]: bit-identical to
  * `concat_ws(sep, transform(arr, _.getField(f)))` for an array of
  * non-null structs whose field `ordinal` is a non-null string (the
  * line-reassembly shape), without the per-element interpreted lambda.
  */
case class ConcatStructField(child: Expression, ordinal: Int,
                             numFields: Int, sep: String)
    extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _)
          if ordinal >= 0 && ordinal < s.size &&
            s(ordinal).dataType == StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"concat_struct_field needs array<struct> with string field " +
              s"$ordinal, got $t")
    }
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HashArrayExprs.concatStructField(input.asInstanceOf[ArrayData],
      ordinal, numFields, UTF8String.fromString(sep))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("csfSep", UTF8String.fromString(sep),
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashArrayExprs.concatStructField($c, $ordinal, " +
        s"$numFields, $sepRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
