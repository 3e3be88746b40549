package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class ArrayDotProductSpec extends SparkSuite {
  import spark.implicits._

  test("native dot matches the HOF formulation bit-for-bit") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.75f)),
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f))).toDF("a", "b")
    val hof = df.select(
      aggregate(zip_with(transform($"a", _.cast("double")),
        transform($"b", _.cast("double")), _ * _), lit(0.0), _ + _).as("d"))
      .as[Double].collect().toSeq
    val native = df.select(GraftFunctions.graftDot($"a", $"b").as("d"))
      .as[Double].collect().toSeq
    assert(native == hof)
  }

  test("null array or null element yields null") {
    val df = Seq(
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),
      (None, Some(Seq(Some(1.0))))).toDF("a", "b")
    val out = df.select(GraftFunctions.graftDot($"a", $"b")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("native l2sq matches the HOF formulation bit-for-bit") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.75f)),
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f))).toDF("a", "b")
    val hof = df.select(
      aggregate(zip_with(transform($"a", _.cast("double")),
        transform($"b", _.cast("double")),
        (x, y) => (x - y) * (x - y)), lit(0.0), _ + _).as("d"))
      .as[Double].collect().toSeq
    val native = df.select(GraftFunctions.graftL2Sq($"a", $"b").as("d"))
      .as[Double].collect().toSeq
    assert(native == hof)
  }

  test("l2sq null array or null element yields null; SQL-registered") {
    val df = Seq(
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),
      (None, Some(Seq(Some(1.0))))).toDF("a", "b")
    val out = df.select(GraftFunctions.graftL2Sq($"a", $"b")).collect()
    assert(out.forall(_.isNullAt(0)))
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_l2sq(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)), " +
        "array(CAST(3.0 AS DOUBLE), CAST(5.0 AS DOUBLE))) AS d")
      .as[Double].head()
    assert(r == 13.0)
  }

  test("mismatched array lengths yield null in all three kernels (zip_with parity)") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    // the HOF formulation the kernels claim bit-identity with: zip_with
    // pads the shorter side with null -> null element -> null sum
    val hof = df.select(
      aggregate(zip_with($"a", $"b", _ * _), lit(0.0), _ + _)).collect()
    assert(hof.head.isNullAt(0))
    for (k <- Seq(GraftFunctions.graftDot($"a", $"b"),
                  GraftFunctions.graftL2Sq($"a", $"b"),
                  GraftFunctions.graftCosine($"a", $"b"))) {
      assert(df.select(k).collect().head.isNullAt(0),
        s"expected null for mismatched lengths in $k")
    }
  }

  test("registered as SQL function via session registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)), " +
        "array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS d")
      .as[Double].head()
    assert(r == 11.0)
  }

  test("graft_date_bin matches Counts.dateBin from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_date_bin(TIMESTAMP_NTZ'2024-06-15 10:32:45', 3600000) AS b")
      .collect()(0).get(0).toString
    assert(r == "2024-06-15T10:00")
    val viaCounts = Seq("2024-06-15 10:32:45").toDF("ts")
      .select(graft.query.Counts
        .dateBin(col("ts").cast("timestamp"), 3600000L).as("b"))
      .collect()(0).get(0).toString
    assert(viaCounts == r)
  }

  test("wrong arity raises AnalysisException (WRONG_NUM_ARGS), not IOOBE") {
    GraftFunctions.register(spark)
    for (sql <- Seq(
        "SELECT graft_dot(array(1.0))",
        "SELECT graft_cosine(array(1.0), array(1.0), array(1.0))",
        "SELECT graft_tokens()",
        "SELECT graft_tokens('a', 'b')",
        "SELECT graft_ngrams('x y z')",
        "SELECT graft_repetition()",
        "SELECT graft_date_bin(TIMESTAMP_NTZ'2024-06-15 10:32:45')",
        "SELECT graft_array_has_all(array('a'))",
        "SELECT graft_morton(8)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(e.getMessage.toLowerCase.contains("parameter") ||
        e.getMessage.contains("WRONG_NUM_ARGS"), s"$sql -> ${e.getMessage}")
    }
  }

  test("wrong input types raise AnalysisException at analysis, not codegen CCE") {
    GraftFunctions.register(spark)
    for (sql <- Seq(
        "SELECT graft_dot('not an array', 'neither')",
        "SELECT graft_tokens(array(1, 2))",       // wants STRING
        "SELECT graft_ngrams(42, 2)",             // wants ARRAY<STRING>
        "SELECT graft_repetition('raw text')",    // wants ARRAY<STRING>
        "SELECT graft_morton(8, 'strings')")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(e.getMessage.contains("DATATYPE_MISMATCH") ||
        e.getMessage.toLowerCase.contains("data type mismatch") ||
        e.getMessage.contains("CANNOT_RESOLVE"), s"$sql -> ${e.getMessage}")
    }
  }

  test("graft_array_has_all from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_array_has_all(array('a','b','c'), array('a','c')) AS yes,
        |       graft_array_has_all(array('a','b'), array('a','z')) AS no"""
        .stripMargin).collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("graft_cosine is bit-identical to the composed dot/norm form") {
    val df = spark.range(1, 200).select(
      array($"id".cast("double"), ($"id" % 7 - 3).cast("double"),
        ($"id" * 0.37).cast("double")).as("a"),
      array(($"id" % 5).cast("double"), ($"id" + 11).cast("double"),
        ($"id" * -0.11).cast("double")).as("b"))
    val fused = df.select(GraftFunctions.graftCosine($"a", $"b")).as[Double].collect()
    val composed = df.select(
      GraftFunctions.graftDot($"a", $"b") /
        (sqrt(GraftFunctions.graftDot($"a", $"a")) *
          sqrt(GraftFunctions.graftDot($"b", $"b")))).as[Double].collect()
    assert(fused.toSeq == composed.toSeq) // exact, not approximate
  }

  test("graft_cosine handles float arrays, unequal lengths, null elements") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_cosine(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
        |               array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS same,
        |  graft_cosine(CAST(array(1.0, 2.0, 5.0) AS ARRAY<DOUBLE>),
        |               CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>)) AS uneq,
        |  graft_cosine(array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE)),
        |               CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>)) AS n
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0)
    // unequal lengths -> null (zip_with / DuckDB list_zip parity)
    assert(r.isNullAt(1))
    assert(r.isNullAt(2))
  }

  test("stays inside whole-stage codegen") {
    // a computed input (not a foldable local relation) forces real codegen
    val df = spark.range(100).select(
      array($"id".cast("double"), ($"id" + 1).cast("double")).as("a"),
      array(($"id" * 2).cast("double"), $"id".cast("double")).as("b"))
    val q = df.select(GraftFunctions.graftDot($"a", $"b").as("d"))
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project"))
    // and the generated loop produces correct values: id*2id + (id+1)*id
    val r = q.as[Double].collect()
    assert(r(3) == (3.0 * 6.0 + 4.0 * 3.0))
  }
}
