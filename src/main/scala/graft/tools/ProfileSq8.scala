package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the a25 SQ8 search — run with
  * `sbt "runMain graft.tools.ProfileSq8"`. */
object ProfileSq8 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sq8] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val model = time("fit")(
      graft.operators.Sq8.fit(e, "vec_id", "embedding"))

    // rebuild searchRefinedExact stage by stage (mirrors Sq8.scala)
    val mn = model.minQ.mkString("array(", ", ", ")")
    val mx = model.maxQ.mkString("array(", ", ", ")")
    val quant = s"transform(embedding, x -> cast(round(cast(x as double) * ${model.scale}, 0) as bigint))"
    val compressed = e
      .select(col("vec_id").cast("long").as("neighbor_id"),
        expr(quant).as("vq"))
      .withColumn("codes", expr(
        s"""transform(sequence(1, ${model.minQ.length}), d ->
           |  least(255, greatest(0,
           |    (greatest(0, element_at(vq, d) - element_at($mn, d)) * 255)
           |      div greatest(1, element_at($mx, d) - element_at($mn, d)))))""".stripMargin))
      .withColumn("r255", expr(
        s"""transform(sequence(1, ${model.minQ.length}), d ->
           |  255 * element_at($mn, d) + element_at(codes, d)
           |    * (element_at($mx, d) - element_at($mn, d)))""".stripMargin))
      .select(col("neighbor_id"), col("r255"))
    time("compressed.count")(compressed.count())
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").cast("long").as("query_id"),
        expr(quant).as("vq"))
      .withColumn("q255", expr("transform(vq, x -> 255 * x)"))
      .select(col("query_id"), col("q255"))
    val scored = compressed
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("dist", expr(
        """aggregate(zip_with(q255, r255, (a, b) -> (a - b) * (a - b)),
          |  cast(0 as bigint), (acc, x) -> acc + x)""".stripMargin))
      .select(col("query_id"), col("neighbor_id"), col("dist"))
    time("scored.count")(scored.count())
    val pruned = graft.plans.TopKPerKey.prune(
      scored.withColumn("neg_dist", -col("dist")),
      "query_id", "neg_dist", "neighbor_id", 100)
    time("pruned.count")(pruned.count())
    println(scored.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
