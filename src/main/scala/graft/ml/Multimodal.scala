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
  * writes. The codec is pluggable ([[Multimodal.MediaCodec]]):
  *   - [[Multimodal.ImageIoCodec]] — REAL JPEG/PNG/GIF/BMP decode on the
  *     JVM's built-in `javax.imageio` (zero external dependencies):
  *     header-true dimensions/channels, multi-frame counts via
  *     `ImageReader.getNumImages`, and a normalized luma-histogram feature
  *     vector from the decoded pixels.
  *   - [[Multimodal.StubCodec]] (default) — a ==DETERMINISTIC STUB==
  *     deriving stable values from the content hash; it exists because the
  *     oracle-gated queries run over synthetic text payloads that are not
  *     decodable images, and because a SQL oracle must be able to recompute
  *     the "decode" symbolically.
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

  // --------------------------------------------------------------- codecs

  /** Pluggable media codec: all three functions are pure byte→value so the
    * `mapPartitions` stages stay narrow and deterministic.
    */
  trait MediaCodec extends Serializable {
    /** (width, height, channels) from the container/header. */
    def decode(bytes: Array[Byte]): (Int, Int, Int)
    /** Fixed [[FeatureDim]]-dim feature vector from the decoded content. */
    def features(bytes: Array[Byte]): Array[Double]
    /** Number of frames (1 for still images). */
    def frameCount(bytes: Array[Byte]): Int
  }

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

  /** Deterministic hash-derived codec — the default for oracle-gated
    * queries over synthetic (non-image) payloads.
    */
  object StubCodec extends MediaCodec {
    override def decode(bytes: Array[Byte]): (Int, Int, Int) = decodeStub(bytes)
    override def features(bytes: Array[Byte]): Array[Double] = featuresStub(bytes)
    override def frameCount(bytes: Array[Byte]): Int = frameCountStub(bytes)
  }

  /** REAL image codec on the JVM's built-in `javax.imageio` — decodes
    * JPEG/PNG/GIF/BMP/WBMP with no external dependencies. Features are a
    * [[FeatureDim]]-bin normalized luma histogram over the decoded pixels
    * (Rec. 601 integer luma), a standard cheap perceptual signature:
    * resize-invariant enough for near-dup blocking and fully
    * deterministic. Throws `IllegalArgumentException` on undecodable
    * bytes — callers choosing this codec are asserting the column holds
    * real images; use [[decodeAndFeaturizeSafe]] to route bad rows to a
    * quarantine output instead.
    */
  object ImageIoCodec extends MediaCodec {
    private def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null)
        throw new IllegalArgumentException("undecodable image bytes")
      img
    }

    override def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val img = read(bytes)
      (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
    }

    override def features(bytes: Array[Byte]): Array[Double] =
      lumaHistogram(read(bytes))

    /** True frame count from the container (animated GIF > 1) via
      * `ImageReader.getNumImages` — no full decode of every frame.
      */
    override def frameCount(bytes: Array[Byte]): Int = {
      val iis = javax.imageio.ImageIO
        .createImageInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new IllegalArgumentException("no image reader for bytes")
        val r = readers.next()
        r.setInput(iis)
        try r.getNumImages(true) finally r.dispose()
      } finally iis.close()
    }

    /** [[FeatureDim]]-bin luma histogram, normalized to sum 1. */
    def lumaHistogram(img: java.awt.image.BufferedImage): Array[Double] = {
      val bins = new Array[Long](FeatureDim)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          bins(luma * FeatureDim / 256) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      bins.map(_.toDouble / n)
    }

    /** Aspect-preserving resize into a `targetW`×`targetH` box (min scale
      * — the same plan [[withResizePlan]] computes as metadata), re-encoded
      * as PNG. Bilinear interpolation for downscale quality. Returns
      * (png bytes, out width, out height).
      */
    def resize(bytes: Array[Byte], targetW: Int,
               targetH: Int): (Array[Byte], Int, Int) = {
      val img = read(bytes)
      val scale = math.min(targetW.toDouble / img.getWidth,
        targetH.toDouble / img.getHeight)
      val ow = math.max(1, math.floor(img.getWidth * scale).toInt)
      val oh = math.max(1, math.floor(img.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(ow, oh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, ow, oh, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      (bos.toByteArray, ow, oh)
    }
  }

  // ------------------------------------------------------------- operators

  /** Decode + feature-extract: one narrow `mapPartitions` pass. Input must
    * have a long id column and a binary content column; the binary payload
    * is dropped from the output (schema discipline — never carry bytes past
    * the decode stage). Pass [[ImageIoCodec]] for real image columns.
    */
  def decodeAndFeaturize(df: DataFrame, idCol: String, bytesCol: String,
                         codec: MediaCodec = StubCodec): Dataset[Decoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    // codec work is the dominant per-row cost; a one-split input would
    // otherwise decode every frame in a single task (scale-adaptive
    // no-op on multi-split inputs)
    graft.engine.GraftSession.fanOutSmall(
        df.select(col(idCol).cast("long"), col(bytesCol).cast("binary")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup happens ONCE here (codec init in real impl)
        it.map { case (id, bytes) =>
          val (w, h, c) = codec.decode(bytes)
          Decoded(id, w, h, c, codec.frameCount(bytes), codec.features(bytes))
        }
      }
  }

  /** One decoded row OR a quarantine record for undecodable bytes. */
  case class DecodedOrError(
      media_id: Long,
      ok: Boolean,
      error: String,
      decoded: Option[Decoded])

  /** [[decodeAndFeaturize]] with per-row error capture: corrupt media is a
    * data fact at corpus scale, not an exception — bad rows come back as
    * `ok=false` quarantine records instead of failing the job. Still one
    * narrow pass.
    */
  def decodeAndFeaturizeSafe(df: DataFrame, idCol: String, bytesCol: String,
                             codec: MediaCodec): Dataset[DecodedOrError] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val (w, h, c) = codec.decode(bytes)
            DecodedOrError(id, ok = true, error = "",
              Some(Decoded(id, w, h, c, codec.frameCount(bytes),
                codec.features(bytes))))
          } catch {
            case e: Exception =>
              DecodedOrError(id, ok = false,
                error = String.valueOf(e.getMessage), None)
          }
        }
      }
  }

  /** One resized image row: output dimensions + re-encoded PNG payload. */
  case class Resized(
      media_id: Long,
      out_width: Int,
      out_height: Int,
      png: Array[Byte])

  /** REAL resize stage ([[ImageIoCodec.resize]]): aspect-preserving scale
    * into the target box, PNG re-encode, one narrow `mapPartitions` pass.
    * The input bytes column is replaced by the (smaller) output payload —
    * the shuffle/write after this stage moves resized bytes only.
    */
  def resizeImages(df: DataFrame, idCol: String, bytesCol: String,
                   targetW: Int, targetH: Int): Dataset[Resized] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (out, ow, oh) = ImageIoCodec.resize(bytes, targetW, targetH)
          Resized(id, ow, oh, out)
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
