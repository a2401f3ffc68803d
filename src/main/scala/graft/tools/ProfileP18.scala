package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Scratch stage profiler for p18_curate_full — not part of the API. */
object ProfileP18 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p18] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm
    graft.queries.CurationQueries.queries("p18_curate_full")(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val planted = docs.unionAll(docs.withColumn("doc_id", col("doc_id") + 1000000L))
    val lined = graft.queries.CurationQueries.withPlantedLines(planted)
    t("boilerplate") {
      val cleaned = TextAnalysis.removeBoilerplate(lined, "doc_id", "source", "ltext", minDocFreq = 5L)
        .filter(col("n_kept") > 0)
        .select(col("doc_id"), translate(col("clean_text"), "\n", " ").as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cleaned.count()
      val lm = t("bigram_lm") {
        val x = TextAnalysis.bigramLmScore(cleaned, "doc_id", "text")
        x.count(); x
      }
      val gated = cleaned.join(lm.filter(col("nll") <= 3.45).select(col("doc_id")), "doc_id")
      val kept = t("dedup_digest") {
        val k = gated
          .groupBy(sha2(col("text"), 256).as("__dig"))
          .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("__w"))
          .select(col("__w.doc_id").as("doc_id"), col("__w.text").as("text"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        k.count(); k
      }
      t("vocab_encode") {
        graft.operators.Packing.vocabEncode(kept, "doc_id", "text", seqLen = 128)
          .orderBy(col("seq_id")).count()
      }
    }
    t("full_query") {
      spark.catalog.clearCache()
      graft.queries.CurationQueries.queries("p18_curate_full")(spark, dir).count()
    }
    spark.stop()
  }
}
