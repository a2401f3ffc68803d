package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Audit for the a25 lambda-inlining failure mode (ProjectCollapse
  * splicing a computed array column into a per-element lambda body):
  * prints how many times the upstream native expression appears in the
  * optimized plan of each suspect operator — 1 = evaluated once, >1 =
  * re-evaluated per element. Run with
  * `sbt "runMain graft.tools.ProfileInline"`. */
object ProfileInline {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)

    def occurrences(plan: String, needle: String): Int =
      plan.sliding(needle.length).count(_ == needle)

    val d03 = graft.operators.Dedup.minHashLshPairs(
      docs, "doc_id", "text", n = 3, numHashes = 64, bands = 16,
      threshold = 0.5)
    val p03 = d03.queryExecution.optimizedPlan.toString
    println(s"[inline] d03 minhash_words occurrences: " +
      occurrences(p03, "minhash_words"))
    println(s"[inline] d03 inlined-into-band-lambda: " +
      occurrences(p03, "hash(slice(minhash_words"))
    p03.split("\n").filter(_.contains("minhash_words"))
      .foreach(l => println("[inline] line: " + l.take(200)))

    val t0 = System.nanoTime()
    d03.count()
    println(f"[inline] d03 runtime: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
