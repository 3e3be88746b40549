package graft.query

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable quantile sketches (DataSketches KLL) — the percentile twin of
  * [[FieldStats]]' HLL distinct-count sketches: per-group (per-file,
  * per-day) sketches that roll up to coarser grains WITHOUT rescanning
  * data. `Percentiles.exact` answers one query exactly; this answers every
  * future quantile query over any group combination from stored state —
  * the only percentile economics that survive 100 TB retention.
  *
  * k=200 gives ~1.65 % rank error at 99 % confidence, a few KB per
  * sketch. The aggregation buffer holds the live heap sketch; Java
  * serialization (custom `writeObject`) only runs at shuffle boundaries
  * (TypedImperativeAggregate semantics), so per-row cost is one sketch
  * update.
  */
object QuantileSketch {

  val K = 200

  /** Serializable holder: live sketch in memory, compact bytes on the
    * wire.
    */
  final class Holder(@transient var sk: KllDoublesSketch) extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b = sk.toByteArray
      out.writeInt(b.length)
      out.write(b)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      sk = KllDoublesSketch.heapify(Memory.wrap(b))
    }
  }

  private def empty = KllDoublesSketch.newHeapInstance(K)

  /** Aggregates raw doubles into a serialized KLL sketch. */
  object SketchAgg extends Aggregator[Double, Holder, Array[Byte]] {
    def zero: Holder = new Holder(empty)
    def reduce(h: Holder, v: Double): Holder = { h.sk.update(v); h }
    def merge(a: Holder, b: Holder): Holder = { a.sk.merge(b.sk); a }
    def finish(h: Holder): Array[Byte] = h.sk.toByteArray
    def bufferEncoder: Encoder[Holder] = Encoders.javaSerialization(classOf[Holder])
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Unions serialized sketches (the rollup path). */
  object MergeAgg extends Aggregator[Array[Byte], Holder, Array[Byte]] {
    def zero: Holder = new Holder(empty)
    def reduce(h: Holder, b: Array[Byte]): Holder = {
      h.sk.merge(KllDoublesSketch.heapify(Memory.wrap(b))); h
    }
    def merge(a: Holder, b: Holder): Holder = { a.sk.merge(b.sk); a }
    def finish(h: Holder): Array[Byte] = h.sk.toByteArray
    def bufferEncoder: Encoder[Holder] = Encoders.javaSerialization(classOf[Holder])
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column function: KLL sketch of a double column. */
  def kllAgg(c: Column): Column = udaf(SketchAgg, Encoders.scalaDouble).apply(c)

  /** Column function: union of serialized sketches. */
  def kllMerge(c: Column): Column =
    udaf(MergeAgg, Encoders.BINARY).apply(c)

  /** Quantile estimate from a serialized sketch (runs over per-group
    * sketch rows — tiny frames, so a scalar UDF is fine here).
    */
  val kllQuantile: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bytes: Array[Byte], q: Double) =>
      KllDoublesSketch.heapify(Memory.wrap(bytes)).getQuantile(q))

  /** One sketch per group: (groupCols..., sketch). */
  def sketchByGroup(df: DataFrame, field: String,
                    groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(kllAgg(col(field).cast("double")).as("sketch"))

  /** Roll sketches up to coarser groups and read off quantiles — zero
    * rescans of the underlying data.
    */
  def mergeSketches(sketches: DataFrame, groupCols: Seq[String],
                    quantiles: Seq[Double]): DataFrame = {
    val merged =
      if (groupCols.isEmpty) sketches.agg(kllMerge(col("sketch")).as("sketch"))
      else sketches.groupBy(groupCols.map(col): _*)
        .agg(kllMerge(col("sketch")).as("sketch"))
    quantiles.foldLeft(merged) { (d, q) =>
      d.withColumn(s"p${(q * 100).round}",
        kllQuantile(col("sketch"), lit(q)))
    }
  }
}
