package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway phase profiler for heavy-query investigation (not part of
  * the library surface; bench/verify never reference it). */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"PHASE $tag: ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    val edges = t("artifact") {
      val e = graft.queries.GraphCache.custPartEdges(spark, dir)
      println(s"  edges=${e.count()}")
      e
    }
    t("hits_total") {
      val out = graft.operators.Hits.hits(edges, "c", "p",
        iterations = 3, topK = 20, edgesDistinct = true)
      println(s"  rows=${out.count()}")
    }
    t("hits_again") {
      val out = graft.operators.Hits.hits(edges, "c", "p",
        iterations = 3, topK = 20, edgesDistinct = true)
      println(s"  rows=${out.count()}")
    }
    // replicate the internals with per-phase timing
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.DecimalType
      import org.apache.spark.storage.StorageLevel
      val e = t("pin+count") {
        val x = edges.select(col("c").cast("long").as("c"),
          col("p").cast("long").as("p"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        println(s"  m=${x.count()}")
        x
      }
      var auth = e.select(col("p")).distinct()
        .withColumn("a", lit(1L).cast(DecimalType(38, 0)))
      var hub: org.apache.spark.sql.DataFrame = null
      (1 to 3).foreach { i =>
        hub = e.join(auth, "p").groupBy(col("c"))
          .agg(sum(col("a")).as("h"))
        auth = e.join(hub, "c").groupBy(col("p"))
          .agg(sum(col("h")).as("a"))
        t(s"iter$i (cumulative chain)") { println(s"  authN=${auth.count()}") }
      }
      val authP = auth.persist(StorageLevel.MEMORY_AND_DISK)
      val hubP = hub.persist(StorageLevel.MEMORY_AND_DISK)
      t("pin final") { authP.count() }
      val tagged = authP.select(lit("auth").as("side"),
          col("p").as("id"), col("a").as("raw"))
        .unionByName(hubP.select(lit("hub").as("side"),
          col("c").as("id"), col("h").as("raw")))
      val pruned = graft.plans.TopKPerKey.prune(tagged, "side", "raw", "id", 20)
      t("authP recount") { authP.count() }
      t("hubP count") { hubP.count() }
      t("tagged count") { tagged.count() }
      t("readout plan-compile") { pruned.queryExecution.executedPlan }
      t("readout execute") { println(s"  k=${pruned.count()}") }
      t("readout again") { println(s"  k=${pruned.count()}") }
      e.unpersist(); authP.unpersist(); hubP.unpersist()
    }
    spark.stop()
  }
}
