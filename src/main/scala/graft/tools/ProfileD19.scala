package graft.tools

import org.apache.spark.sql.functions._

/** d19 stage profiler at sf0.1 — the measurement behind the
  * scan-local signature rewrite: the first cut shuffled
  * |docs|·64·|shingles| lane rows through an aggregation (its persist
  * alone cost 12 s); the per-row array form runs the same arithmetic
  * inside codegen with no shuffle (sweep 20.7 → 8.5 s, exact-pair
  * verification is the remaining floor). Run:
  * `sbt "runMain graft.tools.ProfileD19"`. */
object ProfileD19 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.Graft.session(32, "profile-d19")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[d19] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    val sh = graft.operators.Dedup.withShingles(docs, "doc_id", "text", 3)
    time("shingles")(sh.select(explode(col("shingles"))).count())
    time("exact jaccard pairs")(
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    spark.catalog.clearCache()
    time("prefix jaccard pairs")(
      graft.operators.Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    spark.catalog.clearCache()
    time("full sweep")(
      graft.operators.Dedup.bandPlanSweep(docs, "doc_id", "text").count())
    spark.stop()
  }
}
