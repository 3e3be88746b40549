package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

class LogTemplatesSpec extends SparkSuite {
  import spark.implicits._

  test("template masks quoted strings, hex ids, IPs and digit runs") {
    val lines = Seq(
      """GET /api/u/4281 from 10.0.12.9 took 35ms""",
      """GET /api/u/99 from 10.4.0.1 took 7ms""",
      """trace deadbeefcafe1234 status="ok" code 200""").toDF("line")
    val out = lines.select(LogTemplates.template(col("line")).as("t"))
      .as[String].collect()
    assert(out(0) == "GET /api/u/<N> from <IP> took <N>ms")
    assert(out(1) == "GET /api/u/<N> from <IP> took <N>ms")
    assert(out(2) == "trace <HEX> status=\"<*>\" code <N>")
  }

  test("mine groups by template with exact stats and deterministic example") {
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2026-01-01 00:01:00")
    val t2 = Timestamp.valueOf("2026-01-01 00:02:00")
    val logs = Seq(
      ("err code 500", t0, 1L),
      ("err code 503", t2, 2L),
      ("ok took 3ms", t1, 1L)).toDF("line", "ts", "user")
    val rows = LogTemplates.mine(logs, col("line"), col("ts"), col("user"))
      .orderBy("template").collect()
    assert(rows.length == 2)
    val err = rows(0)
    assert(err.getAs[String]("template") == "err code <N>")
    assert(err.getAs[Long]("n_events") == 2L)
    assert(err.getAs[Long]("n_users") == 2L)
    assert(err.getAs[Timestamp]("first_ts") == t0)
    assert(err.getAs[Timestamp]("last_ts") == t2)
    assert(err.getAs[String]("example") == "err code 500")
    assert(rows(1).getAs[String]("template") == "ok took <N>ms")
  }
}
