package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.ml.Dedup

/** Dev tool: stage-by-stage timing of the Jaccard dedup pipeline. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(cores = 32, appName = "graft-profile")
    val docs = GraftSession.table(spark, sfDir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    time("warmup count")(docs.count())
    val sets = Dedup.shingleHashFrame(docs, "doc_id", "text")
    time("shingleHashFrame count")(sets.count())
    val setsP = sets.persist()
    time("persist materialize")(setsP.count())
    val ex = setsP.select(col("id"), explode(col("sh")).as("shingle"))
    time("explode count")(ex.count())
    val a = ex.select(col("shingle"), col("id").as("id_a"))
    val b = ex.select(col("shingle"), col("id").as("id_b"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    time("pair join+agg count")(inter.count())
    val interSH = a.hint("shuffle_hash").join(b.hint("shuffle_hash"), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    time("pair join+agg (shuffle_hash)")(interSH.count())
    // single-shuffle alternative: group by shingle, expand ordered pairs
    // in-group with higher-order functions, regroup by pair
    val grouped = ex.groupBy(col("shingle"))
      .agg(collect_list(col("id")).as("ids"))
    val pairsG = grouped
      .select(explode(flatten(transform(col("ids"), x =>
        transform(filter(col("ids"), y => y > x),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    time("pair grouped-expand count")(pairsG.count())
    time("pair grouped-expand (2nd)")(pairsG.count())
    time("full jaccardPairs")(
      Dedup.jaccardPairs(docs, "doc_id", "text").count())
    time("full jaccardPairsPrefix")(
      Dedup.jaccardPairsPrefix(docs, "doc_id", "text").count())
    time("jaccardPairs (2nd)")(
      Dedup.jaccardPairs(docs, "doc_id", "text").count())
    time("jaccardPairsPrefix (2nd)")(
      Dedup.jaccardPairsPrefix(docs, "doc_id", "text").count())
    time("full lshPairs")(
      Dedup.lshPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
