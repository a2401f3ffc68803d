package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling harness for the BM25 stages (not part of the driver
  * contract): times candidate generation, weight computation, and the
  * score aggregation separately to localize the bottleneck. */
object ProfileBm25 {
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
    docs.count() // warm

    val c = docs.select(col("doc_id"), col("text"))
    val q = c.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("qid"),
        array_join(slice(split(col("text"), " "), 1, 12), " ").as("qtext"))
    q.count()

    val cwords = c.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"),
      explode(split(col("text"), " ")).as("term"))
    time("corpus words explode")(cwords.count())
    val qterms = q.select(col("qid").as("query_id"),
      explode(array_distinct(split(col("qtext"), " "))).as("term"))
    val tf = cwords
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    time("tf table")(println(s"tf rows: ${tf.count()}"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    time("df table")(df.count())
    val fanout = tf.join(broadcast(qterms), Seq("term"))
    time("query fan-out join")(println(s"fanout rows: ${fanout.count()}"))
    val agg = fanout.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
    time("score aggregation")(println(s"pairs: ${agg.count()}"))

    time("full a11")(graft.queries.CurationQueries.bm25Search(spark, dir).count())
    time("full a11 warm")(graft.queries.CurationQueries.bm25Search(spark, dir).count())
    spark.stop()
  }
}
