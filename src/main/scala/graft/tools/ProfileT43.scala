package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level timing for the t43 TextTiling 10× slope (round-7
  * verdict item): names the dominant stage at 1× (sf0.1) and 10×
  * (synthetic ×10 docs, staged to parquet so both cells scan files
  * like the bench does). Stages, matching
  * [[graft.operators.TextAnalysis.textTilingBoundaries]]:
  *   A  the (doc, blk, hash) count build — corpus scan + first shuffle
  *   B  everything after (norms, adjacent-dot self-join, gap window)
  * Run: `sbt "runMain graft.tools.ProfileT43"`. */
object ProfileT43 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.Graft.session(32, "profile-t43")
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.Tables.documents(spark, dir)
    val staged = java.nio.file.Files.createTempDirectory("t43x10")
    staged.toFile.deleteOnExit()
    base.crossJoin(spark.range(10).toDF("c"))
      .select((col("doc_id") * 10 + col("c")).as("doc_id"),
        concat(col("text"), lit(" t"), col("c")).as("text"))
      .write.mode("overwrite").parquet(staged.toString)
    val docs10 = spark.read.parquet(staged.toString)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def stages(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      // stage A in isolation: the internal cnt table, replicated here
      // (same expressions as the operator)
      val words = df.select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .select(col("doc_id"), expr("pos div 20").as("blk"),
          graft.operators.Dedup.md5Hash60Col(col("w")).as("h"))
      val cnt = words.groupBy(col("doc_id"), col("blk"), col("h"))
        .agg(count(lit(1)).as("c"))
      val tA = time(cnt.count())
      spark.catalog.clearCache()
      val tFull = time(graft.operators.TextAnalysis
        .textTilingBoundaries(df, "doc_id", "text").count())
      println(f"[t43] $tag: stageA(cnt build) $tA%.2f s, full $tFull%.2f s" +
        f" -> tail(B) ~ ${tFull - tA}%.2f s")
      spark.catalog.clearCache()
    }
    // warm codegen once
    graft.operators.TextAnalysis.textTilingBoundaries(
      base.limit(50), "doc_id", "text").count()
    spark.catalog.clearCache()
    stages(base, "1x")
    stages(docs10, "10x")
    spark.stop()
  }
}
