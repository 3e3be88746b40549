package graft.ml

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import graft.SparkSuite

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def bytes(s: String) = s.getBytes(StandardCharsets.UTF_8)

  test("stub codec is deterministic and bounded") {
    val (w, h, c) = Multimodal.decodeStub(bytes("payload"))
    assert((w, h, c) == Multimodal.decodeStub(bytes("payload")))
    assert(w >= 128 && w < 1024 && h >= 128 && h < 1024 && c == 3)
    val f = Multimodal.featuresStub(bytes("payload"))
    assert(f.length == Multimodal.FeatureDim)
    assert(f.forall(v => v >= -1.0 && v <= 1.0))
    assert(Multimodal.frameCountStub(bytes("payload")) >= 1)
  }

  test("decodeAndFeaturize runs as a narrow typed pass and drops bytes") {
    val df = Seq((1L, "aaa"), (2L, "bbb")).toDF("media_id", "s")
      .withColumn("payload", col("s").cast("binary"))
    val out = Multimodal.decodeAndFeaturize(df, "media_id", "payload")
    assert(!out.schema.fieldNames.contains("payload"))
    val rows = out.orderBy("media_id").collect()
    assert(rows.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(rows.forall(_.features.length == Multimodal.FeatureDim))
    // narrow: no exchange in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("resize plan preserves aspect ratio within the target box") {
    val df = Seq((1L, 640, 480, 3, 1, Array(0.0))).toDF(
      "media_id", "width", "height", "channels", "n_frames", "features")
    val r = Multimodal.withResizePlan(df, 256, 256).collect()(0)
    assert(r.getAs[Int]("out_width") == 256)
    assert(r.getAs[Int]("out_height") == 192)
  }

  test("frameOffsets explodes into per-frame rows") {
    val df = Seq((1L, 3)).toDF("media_id", "n_frames")
    val offs = Multimodal.frameOffsets(df, stepMs = 1000L)
      .select(explode(col("frame_offsets_ms")).as("off"))
      .as[Long].collect().toSeq
    assert(offs == Seq(0L, 1000L, 2000L))
  }

  // ------------------------------------------------- real ImageIO codec

  /** Deterministic synthetic image: a horizontal luma gradient. */
  private def pngBytes(w: Int, h: Int, format: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255) / math.max(1, w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("ImageIoCodec decodes real PNG and JPEG headers truthfully") {
    for (fmt <- Seq("png", "jpg")) {
      val (w, h, c) = Multimodal.ImageIoCodec.decode(pngBytes(320, 200, fmt))
      assert((w, h) == (320, 200), s"format $fmt")
      assert(c == 3)
      assert(Multimodal.ImageIoCodec.frameCount(pngBytes(8, 8, fmt)) == 1)
    }
  }

  test("ImageIoCodec luma-histogram features are a normalized distribution") {
    val f = Multimodal.ImageIoCodec.features(pngBytes(256, 16))
    assert(f.length == Multimodal.FeatureDim)
    assert(math.abs(f.sum - 1.0) < 1e-9)
    // the gradient spreads luma across all bins roughly evenly
    assert(f.forall(_ > 0.0))
    assert(f.max < 0.2)
    // an all-black image lands entirely in bin 0
    val img = new java.awt.image.BufferedImage(10, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val black = Multimodal.ImageIoCodec.features(bos.toByteArray)
    assert(black(0) == 1.0 && black.drop(1).forall(_ == 0.0))
  }

  test("decodeAndFeaturize with ImageIoCodec over a real image column") {
    val df = Seq((1L, pngBytes(64, 32)), (2L, pngBytes(100, 50)))
      .toDF("media_id", "payload")
    val rows = Multimodal
      .decodeAndFeaturize(df, "media_id", "payload", Multimodal.ImageIoCodec)
      .orderBy("media_id").collect()
    assert(rows.map(r => (r.media_id, r.width, r.height)).toSeq ==
      Seq((1L, 64, 32), (2L, 100, 50)))
    assert(rows.forall(r => math.abs(r.features.sum - 1.0) < 1e-9))
  }

  test("decodeAndFeaturizeSafe quarantines undecodable rows, keeps good ones") {
    val df = Seq((1L, pngBytes(40, 40)), (2L, bytes("not an image")))
      .toDF("media_id", "payload")
    val rows = Multimodal
      .decodeAndFeaturizeSafe(df, "media_id", "payload", Multimodal.ImageIoCodec)
      .orderBy("media_id").collect()
    assert(rows(0).ok && rows(0).decoded.exists(_.width == 40))
    assert(!rows(1).ok && rows(1).decoded.isEmpty)
  }

  test("resizeImages really rescales pixels, aspect-preserving, PNG output") {
    val df = Seq((1L, pngBytes(640, 480))).toDF("media_id", "payload")
    val r = Multimodal.resizeImages(df, "media_id", "payload", 256, 256)
      .collect()(0)
    // matches the metadata plan: min-scale box fit (640,480) -> (256,192)
    assert((r.out_width, r.out_height) == (256, 192))
    val round = javax.imageio.ImageIO
      .read(new java.io.ByteArrayInputStream(r.png))
    assert((round.getWidth, round.getHeight) == (256, 192))
  }

  test("partition-by-kind write produces prunable layout") {
    val tmp = java.nio.file.Files.createTempDirectory("mm").toString
    val df = Seq((1L, "image"), (2L, "audio")).toDF("media_id", "kind")
    Multimodal.writePartitionedByKind(df, "kind", tmp)
    assert(new java.io.File(s"$tmp/kind=image").exists())
    val back = spark.read.parquet(tmp).filter(col("kind") === "image")
    assert(back.count() == 1)
  }
}
