package graft.ml

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque `binary` + typed
  * metadata, with decode / feature-extract / resize / frame-sample stages
  * running as `mapPartitions` over a typed Dataset.
  *
  * The Spark-side plumbing is real and tested: binary column handling,
  * per-partition batch iteration (one codec context per partition, not per
  * row), typed output schema, narrow no-shuffle execution, partition-by-kind
  * writes. The codec itself is a ==DETERMINISTIC STUB== — this environment
  * has no image/audio libraries, so `decodeStub`/`featuresStub`/
  * `frameSampleStub` derive fake-but-stable values from the content hash.
  * Swapping in a real codec changes only those three pure functions.
  *
  * Scale notes: decode is the canonical CPU-heavy narrow stage — it
  * parallelizes perfectly (no shuffle), so the only 100 TB concerns are
  * (a) input file sizes (`maxPartitionBytes` keeps media batches bounded)
  * and (b) not widening the row before heavy stages — features are computed
  * from bytes *before* the bytes column is dropped, never carried along.
  */
object Multimodal {

  /** One decoded media row: metadata + a fixed-dim feature vector. */
  case class Decoded(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      n_frames: Int,
      features: Array[Double])

  val FeatureDim = 16

  private def md5Hex(bytes: Array[Byte]): String = {
    // MessageDigest is not thread-safe — one instance per call is the
    // simple safe choice (cheap relative to a real codec).
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"$b%02x").mkString
  }

  /** First 15 md5 hex chars as a 60-bit non-negative long — identical to
    * [[Dedup.hash60]] and replicable in any SQL engine.
    */
  def hash60(bytes: Array[Byte]): Long =
    java.lang.Long.parseLong(md5Hex(bytes).substring(0, 15), 16)

  // ----------------------------------------------------------- STUB codecs

  /** STUB image decode: (width, height, channels) from the content hash.
    * A real implementation would parse the container header here.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val h = hash60(bytes)
    (128 + (h % 896L).toInt, 128 + ((h >> 10) % 896L).toInt, 3)
  }

  /** STUB feature extraction: FeatureDim doubles in [-1, 1] from per-index
    * content hashes. A real implementation would run a vision model over
    * the decoded pixels.
    */
  def featuresStub(bytes: Array[Byte]): Array[Double] = {
    val hex = md5Hex(bytes)
    Array.tabulate(FeatureDim) { i =>
      val hi = java.lang.Long.parseLong(
        md5Hex(s"$hex:$i".getBytes(StandardCharsets.UTF_8)).substring(0, 15), 16)
      ((hi % 2000001L) - 1000000L).toDouble / 1e6
    }
  }

  /** STUB frame count for video sampling: 1-12 frames from the hash. */
  def frameCountStub(bytes: Array[Byte]): Int =
    1 + ((hash60(bytes) >> 20) % 12L).toInt

  // ------------------------------------------------------------- operators

  /** Decode + feature-extract: one narrow `mapPartitions` pass. Input must
    * have a long id column and a binary content column; the binary payload
    * is dropped from the output (schema discipline — never carry bytes past
    * the decode stage).
    */
  def decodeAndFeaturize(df: DataFrame, idCol: String,
                         bytesCol: String): Dataset[Decoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup happens ONCE here (codec init in real impl)
        it.map { case (id, bytes) =>
          val (w, h, c) = decodeStub(bytes)
          Decoded(id, w, h, c, frameCountStub(bytes), featuresStub(bytes))
        }
      }
  }

  /** Resize planning: pure-metadata scale factors toward a target box,
    * preserving aspect ratio (min scale). Column arithmetic only.
    */
  def withResizePlan(decoded: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val scale = least(
      lit(targetW.toDouble) / col("width"),
      lit(targetH.toDouble) / col("height"))
    decoded
      .withColumn("scale", scale)
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame sample points (ms offsets): every `stepMs` across n_frames —
    * array column, ready to `explode` into a per-frame decode stage.
    */
  def frameOffsets(decoded: DataFrame, stepMs: Long): DataFrame =
    decoded.withColumn("frame_offsets_ms",
      transform(sequence(lit(0), col("n_frames") - 1), i => i * stepMs))

  /** Write decoded media partitioned by a kind column — the layout that
    * lets downstream readers prune whole modalities.
    */
  def writePartitionedByKind(df: DataFrame, kindCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(kindCol).parquet(path)
}
