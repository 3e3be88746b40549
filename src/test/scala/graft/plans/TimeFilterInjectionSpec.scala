package graft.plans

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._

import graft.SparkSuite

class TimeFilterInjectionSpec extends SparkSuite {
  import spark.implicits._
  import TimeFilterInjection._

  private val base = 1700000000000L

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("tfi").toString
    Seq.tabulate(10)(i => (i.toLong, new Timestamp(base + i * 60_000L)))
      .toDF("id", "p_timestamp").write.parquet(s"$dir/logs")
    s"$dir/logs"
  }

  test("injects the window above stream relations; results bounded") {
    val path = mkTable()
    install(spark)
    set(spark, Seq(StreamWindow(path, "p_timestamp",
      base, base + 5 * 60_000L)))
    try {
      val df = spark.read.parquet(path).select("id")
      assert(df.count() == 5) // rows 0..4 inside the window
      // the rule's filter must reach the parquet scan as pushed filters
      val scan = df.queryExecution.executedPlan.toString
      assert(scan.contains("PushedFilters") &&
        scan.contains("GreaterThanOrEqual(p_timestamp"))
    } finally clear(spark)
  }

  test("skips when the query already constrains the time column") {
    val path = mkTable()
    install(spark)
    set(spark, Seq(StreamWindow(path, "p_timestamp",
      base, base + 60_000L)))
    try {
      // user asks for a LATER slice than the injected window would allow —
      // reference semantics: the user's own filter wins, no injection
      val df = spark.read.parquet(path)
        .filter(col("p_timestamp") >= new Timestamp(base + 8 * 60_000L))
      assert(df.count() == 2)
    } finally clear(spark)
  }

  test("idempotent under fixed-point optimization: exactly one filter") {
    val path = mkTable()
    install(spark)
    set(spark, Seq(StreamWindow(path, "p_timestamp", base, base + 60_000L)))
    try {
      val df = spark.read.parquet(path).select("id")
      val nFilters = df.queryExecution.optimizedPlan.collect {
        case f: Filter => f }.size
      assert(nFilters == 1)
      assert(df.count() == 1)
    } finally clear(spark)
  }

  test("per-relation skip: a constrained stream A leaves stream B's injection intact") {
    val pathA = mkTable()
    val pathB = Files.createTempDirectory("tfi").toString + "/logs"
    // B's timestamps run in REVERSE id order so B's window selects ids 5..9
    Seq.tabulate(10)(i => (i.toLong, new Timestamp(base + (9 - i) * 60_000L)))
      .toDF("id", "p_timestamp").write.parquet(pathB)
    install(spark)
    set(spark, Seq(
      StreamWindow(pathA, "p_timestamp", base, base + 2 * 60_000L),
      StreamWindow(pathB, "p_timestamp", base, base + 5 * 60_000L)))
    try {
      // user constrains ONLY A (wider than A's window: all 10 rows);
      // reference semantics: A keeps the user filter un-narrowed, B still
      // gets its injected window (ids 5..9) → join yields exactly 5 rows.
      //   old global-name skip       → 10 rows (B never windowed)
      //   A wrongly injected as well → 0 rows (A ids 0..1 ∩ B ids 5..9)
      val a = spark.read.parquet(pathA)
        .filter(col("p_timestamp") >= new Timestamp(base))
      val b = spark.read.parquet(pathB)
      assert(a.join(b, "id").count() == 5)
    } finally clear(spark)
  }

  test("unregistered tables and non-timestamp columns untouched") {
    val path = mkTable()
    install(spark)
    set(spark, Seq(
      StreamWindow("/nowhere", "p_timestamp", base, base + 1000),
      StreamWindow(path, "id", 0, 1))) // long column: must not inject
    try {
      assert(spark.read.parquet(path).count() == 10)
    } finally clear(spark)
  }
}
