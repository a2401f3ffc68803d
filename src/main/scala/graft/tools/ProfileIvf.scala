package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiling for the a08 IVF+k-means path (not part of
  * the driver contract): where do the trainer's sequential jobs spend
  * their time at bench scale? */
object ProfileIvf {
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

    val e = graft.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    time("warm scan")(e.count())

    val n = time("count")(e.count())
    val k = math.max(8, math.min(256, (n / 16).toInt))
    println(s"[profile] n=$n k=$k")
    val centroids = time("fit (2 iters)") {
      graft.operators.KMeans.fit(e, "vec_id", "embedding", k = k, iterations = 2)._2
    }
    val corpus = graft.operators.KMeans.assign(
      e.repartition(spark.sparkContext.defaultParallelism), "vec_id", "embedding", centroids)
    time("corpus assign")(corpus.count())
    val probes = graft.operators.KMeans.assignTopP(
      e.filter(col("vec_id") < 5), "vec_id", "embedding", centroids, p = 4)
    time("probe assign")(probes.count())
    time("ivf topk") {
      graft.operators.Similarity.ivfTopK(probes, corpus,
        "vec_id", "embedding", "cluster", k = 10)
        .orderBy(col("query_id"), col("rank")).count()
    }
    time("full a08") {
      graft.queries.CurationQueries.annIvfKmeans(spark, dir).count()
    }
    spark.stop()
  }
}
