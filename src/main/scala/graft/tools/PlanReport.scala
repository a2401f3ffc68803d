package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generates PLANS.md: the formatted physical plan of each headline
  * query at sf0.1 plus measured 1×/10× scale-up timings for the hot
  * operator families — the evidence behind the 100 TB design claims.
  * Run: `sbt "runMain graft.tools.PlanReport"`. */
object PlanReport {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.Graft.session(32, "plan-report")
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans and scale-up measurements (generated)\n\n")
    sb.append("Regenerate with `sbt \"runMain graft.tools.PlanReport\"`. Source: sf0.1.\n")

    val planQueries = Seq(
      "q01_pricing_summary", "q03_revenue_nation", "q04_top_orders",
      "q17_asof_join", "p02_chunk_exact_chars", "d03_dedup_minhash",
      "a01_ann_bruteforce")
    sb.append("\n## Physical plans (executed, AQE final)\n")
    planQueries.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.count() // let AQE finalize
      sb.append(s"\n### $name\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.take(4000))
      sb.append("\n```\n")
    }

    sb.append("\n## Scale-up slope (1× = sf0.1; 10× = synthetic ×10 rows)\n\n")
    sb.append("| operator | 1× time | 10× time | slope |\n|---|---|---|---|\n")

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = graft.Tables.documents(spark, dir).cache(); docs.count()
    val docs10 = docs.crossJoin(spark.range(10).toDF("c"))
      .select((col("doc_id") * 10 + col("c")).as("doc_id"),
        concat(col("text"), lit(" t"), col("c")).as("text"),
        lit("s").as("source")).cache()
    docs10.count()
    val li = graft.Tables.lineitem(spark, dir).cache(); li.count()
    val li10 = li.crossJoin(spark.range(10).toDF("c"))
      .withColumn("l_orderkey", col("l_orderkey") * 10 + col("c")).drop("c").cache()
    li10.count()
    val emb = graft.Tables.embeddings(spark, dir).cache(); emb.count()
    val emb10 = emb.crossJoin(spark.range(10).toDF("c"))
      .select((col("vec_id") * 10 + col("c")).as("vec_id"), col("embedding")).cache()
    emb10.count()

    def row(name: String, t1: Double, t10: Double): Unit =
      sb.append(f"| $name | $t1%.2f s | $t10%.2f s | ${t10 / t1}%.1f× |\n")

    row("hash agg (q01 shape)",
      time(li.groupBy("l_returnflag").agg(sum("l_quantity")).count()),
      time(li10.groupBy("l_returnflag").agg(sum("l_quantity")).count()))
    row("exact dedup (sha256 groupBy)",
      time(graft.operators.Dedup.exactKeepFirst(docs, "doc_id", "text").count()),
      time(graft.operators.Dedup.exactKeepFirst(docs10, "doc_id", "text").count()))
    row("minhash LSH near-dup",
      time(graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).count()),
      time(graft.operators.Dedup.minHashLshPairs(docs10, "doc_id", "text", 3, 64, 16, 0.5).count()))
    row("chunk+embed pipeline",
      time(graft.pipeline.EmbedPipeline.run(docs).count()),
      time(graft.pipeline.EmbedPipeline.run(docs10).count()))
    row("ANN top-10 (custom TopKPerKey)",
      time(graft.operators.Similarity.bruteForceTopKExec(
        emb.filter(col("vec_id") < 50), emb, "vec_id", "embedding", 10).count()),
      time(graft.operators.Similarity.bruteForceTopKExec(
        emb10.filter(col("vec_id") < 50), emb10, "vec_id", "embedding", 10).count()))

    // 100× rows for the narrow/linear stages — 500k docs, 60M lineitem
    val docs100 = docs.crossJoin(spark.range(100).toDF("c"))
      .select((col("doc_id") * 100 + col("c")).as("doc_id"),
        concat(col("text"), lit(" t"), col("c")).as("text"),
        lit("s").as("source"))
    val li100 = li.crossJoin(spark.range(100).toDF("c"))
      .withColumn("l_orderkey", col("l_orderkey") * 100 + col("c")).drop("c")
    sb.append("\n## 100× rows (500k docs / 60M lineitem, uncached synthetic)\n\n")
    sb.append("| operator | 100× time |\n|---|---|\n")
    sb.append(f"| hash agg (q01 shape) | ${time(li100.groupBy("l_returnflag").agg(sum("l_quantity")).count())}%.2f s |\n")
    sb.append(f"| exact dedup (sha256 groupBy) | ${time(graft.operators.Dedup.exactKeepFirst(docs100, "doc_id", "text").count())}%.2f s |\n")
    sb.append(f"| chunk+embed pipeline | ${time(graft.pipeline.EmbedPipeline.run(docs100).count())}%.2f s |\n")

    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("[plan-report] wrote PLANS.md")
    spark.stop()
  }
}
