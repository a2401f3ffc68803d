package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Packing, TextAnalysis}

/** Ad-hoc profiling harness for the p18 curate-full stages. */
object ProfileCurate {
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

    import org.apache.spark.sql.expressions.Window
    val d0 = graft.Tables.documents(spark, dir)
    d0.count()
    val planted = d0.unionAll(d0.withColumn("doc_id", col("doc_id") + 1000000L))
    val lined = graft.queries.CurationQueries.withPlantedLines(planted)
    val cleaned = TextAnalysis.removeBoilerplate(lined, "doc_id", "source",
        "ltext", minDocFreq = 5L)
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), translate(col("clean_text"), "\n", " ").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("boilerplate (cleaned)")(cleaned.count())
    val lm = TextAnalysis.bigramLmScore(cleaned, "doc_id", "text")
    time("bigram LM")(lm.filter(col("nll") <= 3.45).count())
    val gated = cleaned.join(
      lm.filter(col("nll") <= 3.45).select(col("doc_id")), "doc_id")
    val kept = gated.withColumn("__rn", row_number().over(
        Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("gate + dedup (kept)")(kept.count())
    time("vocabEncode")(Packing.vocabEncode(kept, "doc_id", "text", 128).count())
    time("full warm re-run")(
      graft.queries.CurationQueries.curateFull(spark, dir).count())
    spark.stop()
  }
}
