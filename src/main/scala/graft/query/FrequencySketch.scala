package graft.query

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable frequent-items (heavy hitters) sketches — the third sketch of
  * the stats triad next to [[FieldStats]]' HLL distinct counts and
  * [[QuantileSketch]]'s KLL percentiles: per-group top-value summaries
  * that roll up to coarser grains without rescanning data.
  *
  * The reference tracks 1024–10 000 exact distinct values per field and
  * gives up beyond that (`src/storage/field_stats.rs:86-87`); a
  * Misra-Gries style sketch keeps guaranteed-error top-k estimates at ANY
  * cardinality in fixed memory — `maxMapSize` = 512 bounds the count
  * error by n/256 while the map stays a few KB.
  */
object FrequencySketch {

  val MaxMapSize = 512
  private val serde = new ArrayOfStringsSerDe

  /** Live sketch in memory, compact bytes only at shuffle boundaries. */
  final class Holder(@transient var sk: ItemsSketch[String]) extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b = sk.toByteArray(serde)
      out.writeInt(b.length)
      out.write(b)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      sk = ItemsSketch.getInstance(Memory.wrap(b), serde)
    }
  }

  private def empty = new ItemsSketch[String](MaxMapSize)

  /** Aggregates raw values into a serialized frequency sketch. */
  object SketchAgg extends Aggregator[String, Holder, Array[Byte]] {
    def zero: Holder = new Holder(empty)
    def reduce(h: Holder, v: String): Holder = {
      if (v != null) h.sk.update(v)
      h
    }
    def merge(a: Holder, b: Holder): Holder = { a.sk.merge(b.sk); a }
    def finish(h: Holder): Array[Byte] = h.sk.toByteArray(serde)
    def bufferEncoder: Encoder[Holder] = Encoders.javaSerialization(classOf[Holder])
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Unions serialized sketches (the rollup path). */
  object MergeAgg extends Aggregator[Array[Byte], Holder, Array[Byte]] {
    def zero: Holder = new Holder(empty)
    def reduce(h: Holder, b: Array[Byte]): Holder = {
      h.sk.merge(ItemsSketch.getInstance(Memory.wrap(b), serde)); h
    }
    def merge(a: Holder, b: Holder): Holder = { a.sk.merge(b.sk); a }
    def finish(h: Holder): Array[Byte] = h.sk.toByteArray(serde)
    def bufferEncoder: Encoder[Holder] = Encoders.javaSerialization(classOf[Holder])
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def freqAgg(c: Column): Column = udaf(SketchAgg, Encoders.STRING).apply(c)
  def freqMerge(c: Column): Column = udaf(MergeAgg, Encoders.BINARY).apply(c)

  /** One sketch per group: (groupCols..., sketch). */
  def sketchByGroup(df: DataFrame, field: String,
                    groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(freqAgg(col(field).cast("string")).as("sketch"))

  /** Roll sketches up to coarser groups and emit the top-k items with
    * their frequency estimates (no false negatives: every item that could
    * be above threshold appears). Runs over per-group sketch rows — tiny
    * frames, so the scalar UDF is fine.
    */
  def mergeTopK(sketches: DataFrame, groupCols: Seq[String],
                k: Int): DataFrame = {
    val topK = udf { bytes: Array[Byte] =>
      ItemsSketch.getInstance(Memory.wrap(bytes), serde)
        .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
        .sortBy(r => (-r.getEstimate, r.getItem))
        .take(k)
        .map(r => (r.getItem, r.getEstimate))
    }
    val merged =
      if (groupCols.isEmpty) sketches.agg(freqMerge(col("sketch")).as("sketch"))
      else sketches.groupBy(groupCols.map(col): _*)
        .agg(freqMerge(col("sketch")).as("sketch"))
    merged
      .select(groupCols.map(col) :+
        posexplode(topK(col("sketch"))).as(Seq("rank", "hit")): _*)
      .select(groupCols.map(col) :+ (col("rank") + 1).as("rank") :+
        col("hit._1").as("item") :+ col("hit._2").as("estimate"): _*)
  }
}
