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

  test("partition-by-kind write produces prunable layout") {
    val tmp = java.nio.file.Files.createTempDirectory("mm").toString
    val df = Seq((1L, "image"), (2L, "audio")).toDF("media_id", "kind")
    Multimodal.writePartitionedByKind(df, "kind", tmp)
    assert(new java.io.File(s"$tmp/kind=image").exists())
    val back = spark.read.parquet(tmp).filter(col("kind") === "image")
    assert(back.count() == 1)
  }
}
