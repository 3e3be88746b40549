package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log template mining (Drain-lite): collapse log lines that differ only in
  * their variable parts into one template row with occurrence statistics.
  *
  * The reference engine surfaces raw log search plus counts; template
  * mining is the standard next step every log-analytics stack ships
  * (Drain/Spell log parsing): mask the variable tokens, group by the
  * masked line. We mask, in order,
  *   1. quoted strings        `"..."` → `"<*>"` (payload values),
  *   2. hex ids of length ≥ 8 (trace/span ids, digests) → `<HEX>`,
  *   3. IPv4 addresses → `<IP>`,
  *   4. digit runs → `<N>`  (counts, sizes, timestamps, ports).
  * The masking is a fixed `regexp_replace` chain — codegen'd, RE2-safe
  * regexes, so external engines reproduce templates byte-for-byte.
  *
  * Scale shape: one narrow projection + one hash aggregation keyed by the
  * template string. Cardinality after masking is the number of distinct
  * FORMATS (small), so the shuffle carries one row per (partition,
  * template) after partial aggregation — at 100 TB this is scan-bound.
  */
object LogTemplates {

  /** The masked template for one log line. */
  def template(line: Column): Column = {
    val quoted = regexp_replace(line, "\"[^\"]*\"", "\"<*>\"")
    val hexids = regexp_replace(quoted, "\\b[0-9a-f]{8,}\\b", "<HEX>")
    val ips = regexp_replace(hexids,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ips, "\\d+", "<N>")
  }

  /** Mine templates over a log frame: one row per distinct template with
    * occurrence count, distinct-user count, first/last timestamp, and the
    * lexicographically-smallest raw line as the deterministic example.
    */
  def mine(logs: DataFrame, lineCol: Column, tsCol: Column,
           userCol: Column): DataFrame =
    logs.select(template(lineCol).as("template"), lineCol.as("__line"),
        tsCol.as("__ts"), userCol.as("__user"))
      .groupBy(col("template"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("__user")).as("n_users"),
        min(col("__ts")).as("first_ts"),
        max(col("__ts")).as("last_ts"),
        min(col("__line")).as("example"))
}
