package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Saved two-stream correlation (equi-join) configs, validated server-side
  * and executable (reference `src/correlation.rs:402-421` `JoinConfig` /
  * `:280-348` `validate` — the reference only validates and stores; the
  * console executes. Here execution is native: `ds1.join(ds2, ...)`).
  */
object Correlation {

  final case class JoinCondition(tableName: String, field: String)
  final case class TableConfig(tableName: String, selectedFields: Seq[String])
  final case class CorrelationConfig(
      tableConfigs: Seq[TableConfig],
      joinConditions: Seq[JoinCondition])

  /** Structural + schema validation, mirroring the reference's checks:
    * exactly two distinct tables, join tables == config tables, and every
    * selected/join field present in its table's schema.
    */
  def validate(cfg: CorrelationConfig,
               schemas: Map[String, Seq[String]]): Either[String, Unit] = {
    val cfgTables = cfg.tableConfigs.map(_.tableName).toSet
    val joinTables = cfg.joinConditions.map(_.tableName).toSet
    if (cfgTables.size != 2)
      Left("must provide config for two unique tables")
    else if (cfgTables != joinTables)
      Left("must provide same tables for join config and table config")
    else {
      val missing = cfg.tableConfigs.flatMap { tc =>
        schemas.get(tc.tableName) match {
          case None => Seq(s"unknown table ${tc.tableName}")
          case Some(fields) =>
            val joinField = cfg.joinConditions
              .find(_.tableName == tc.tableName).map(_.field)
            (tc.selectedFields ++ joinField)
              .filterNot(fields.contains)
              .map(f => s"field $f not in ${tc.tableName}")
        }
      }
      if (missing.isEmpty) Right(()) else Left(missing.mkString("; "))
    }
  }

  /** Execute the correlation: select each side's fields (join key always
    * included), equi-join. Join-key columns are disambiguated with a table
    * prefix on the right side.
    */
  def execute(spark: SparkSession, cfg: CorrelationConfig,
              tables: Map[String, DataFrame]): Either[String, DataFrame] =
    validate(cfg, tables.map { case (n, df) => n -> df.columns.toSeq }).map { _ =>
      val Seq(leftCfg, rightCfg) = cfg.tableConfigs.take(2)
      def side(tc: TableConfig): (DataFrame, String) = {
        val joinField = cfg.joinConditions
          .find(_.tableName == tc.tableName).get.field
        val fields = (tc.selectedFields ++ Seq(joinField)).distinct
        (tables(tc.tableName).select(fields.map(col): _*), joinField)
      }
      val (l, lKey) = side(leftCfg)
      val (r0, rKey) = side(rightCfg)
      // prefix right columns to avoid ambiguity in the joined projection
      val r = r0.columns.foldLeft(r0)((df, c) =>
        df.withColumnRenamed(c, s"${rightCfg.tableName}.$c"))
      l.join(r, l(lKey) === r(s"`${rightCfg.tableName}.$rKey`"), "inner")
    }
}
