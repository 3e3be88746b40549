package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("zvalue interleaves bits (known Morton values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("x", "y")
    val out = df.select(ZOrder.zvalue(Seq(col("x"), col("y")), bits = 4))
      .as[Long].collect().toSeq
    // morton(x,y) with x at even bits: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3
    // (3,5)= x bits 11 -> 0b_0_1_0_1? compute: x=3 (b0=1,b1=1), y=5
    // (b0=1,b1=0,b2=1) -> z = 1·1 + 2·1 + 4·1 + 8·0 + 16·0 + 32·1 = 39
    assert(out == Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("fused Morton expression equals the composed shift/mask formula") {
    val rnd = new scala.util.Random(13)
    val df = (1 to 500).map(_ => (rnd.nextInt(65536).toLong,
        rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("a", "b", "c")
    for (cols <- Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c"))) {
      val cs = cols.map(col)
      val diff = df.select(
          ZOrder.zvalue(cs).as("fused"),
          ZOrder.zvalueComposed(cs).as("composed"))
        .filter(col("fused") =!= col("composed")).count()
      assert(diff == 0L, s"cols $cols")
    }
    // null propagation: any null input nulls the z-value
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
    val r = withNull.select(ZOrder.zvalue(Seq(col("a"), col("b")))).collect()
    assert(r.head.isNullAt(0))
    // SQL surface
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_morton(4, 3L, 5L)").head.getLong(0) == 39L)
  }

  test("bucketize clamps and spreads the domain") {
    val df = Seq(-5.0, 0.0, 500.0, 1000.0, 2000.0).toDF("v")
    val out = df.select(ZOrder.bucketize(col("v"), 0.0, 1000.0, bits = 4))
      .as[Long].collect().toSeq
    assert(out.head == 0L && out.last == 15L) // clamped
    assert(out(2) == 7L) // midpoint -> middle bucket
    assert(out == out.sorted)
  }

  test("z-order layout gives usable per-file bounds on BOTH dimensions") {
    val n = 4000
    val rnd = new scala.util.Random(7)
    val df = (0 until n).map(_ => (rnd.nextInt(1000), rnd.nextInt(1000)))
      .toDF("x", "y")

    def partitionStats(laid: DataFrame): Array[(Long, Long, Long, Long)] =
      laid.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min(col("x").cast("long")).as("x0"), max(col("x").cast("long")).as("x1"),
          min(col("y").cast("long")).as("y0"), max(col("y").cast("long")).as("y1"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    def hits(stats: Array[(Long, Long, Long, Long)],
             xr: Option[(Long, Long)], yr: Option[(Long, Long)]): Int =
      stats.count { case (x0, x1, y0, y1) =>
        xr.forall { case (a, b) => x1 >= a && x0 <= b } &&
        yr.forall { case (a, b) => y1 >= a && y0 <= b }
      }

    val zStats = partitionStats(ZOrder.layout(df,
      Seq(("x", 0.0, 1000.0), ("y", 0.0, 1000.0)), numFiles = 16))
    val linStats = partitionStats(df.repartitionByRange(16, col("x")))
    assert(zStats.length == 16 && linStats.length == 16)

    // a y-only predicate: linear-on-x cannot prune at all, z-order can
    val yRange = Some((100L, 199L))
    assert(hits(linStats, None, yRange) == 16)
    assert(hits(zStats, None, yRange) < 16)
    // an x-only predicate still prunes under z-order (bounds stay usable)
    assert(hits(zStats, Some((100L, 199L)), None) < 16)
  }
}
