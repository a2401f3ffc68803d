package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Ad-hoc profiling harness for the MinHash-LSH stages (not part of the
  * driver contract). Also runs a 10× scale smoke: documents exploded
  * 10-fold to check the operator's scaling slope. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = graft.Tables.documents(spark, dir)
    // warm
    docs.count()

    val sigNew = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.minhashWords(split(col("text"), " "), 64, 3).as("sig"))
    time("signatures (fused words path)")(sigNew.select(max(expr("sig[0]"))).collect())
    val sh = Dedup.withShingles(docs, "doc_id", "text", 3)
    time("shingle strings (d02 oracle path)")(sh.select(max(size(col("shingles")))).collect())
    val shh = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.ngramHashes(split(col("text"), " "), 3).as("shingles"))
    time("hashed shingles (d03 verify path)")(shh.select(max(size(col("shingles")))).collect())
    time("full d03")(Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).count())
    time("full d03 again (warm)")(Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).count())

    // 10x scale smoke: unique suffix per copy keeps shingle sets distinct
    val big = docs.crossJoin(spark.range(10).toDF("copy"))
      .select((col("doc_id") * 10 + col("copy")).as("doc_id"),
        concat(col("text"), lit(" tail"), col("copy")).as("text"))
    println(s"[profile] scaled docs: ${big.count()}")
    val p10 = time("d03 at 10x docs")(
      Dedup.minHashLshPairs(big, "doc_id", "text", 3, 64, 16, 0.5).count())
    println(s"[profile] d03 pairs at 10x: $p10")
    // the star-link output contract: same candidate/verify work, but
    // ~cluster-linear rows instead of quadratic pair materialization
    val l1 = time("d03 star links at 1x")(
      Dedup.minHashLshLinks(docs, "doc_id", "text", 3, 64, 16, 0.5).count())
    println(s"[profile] links at 1x: $l1")
    val l10 = time("d03 star links at 10x docs")(
      Dedup.minHashLshLinks(big, "doc_id", "text", 3, 64, 16, 0.5).count())
    println(s"[profile] links at 10x: $l10")
    spark.stop()
  }
}
