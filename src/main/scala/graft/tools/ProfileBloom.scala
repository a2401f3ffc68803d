package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Bloom

/** Ad-hoc profiling harness for the Bloom decontamination stages (not
  * part of the driver contract): filter build vs probe pass vs the
  * shuffle join it replaces, plus a 10× corpus smoke. */
object ProfileBloom {
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

    val d = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val bench = d.filter(col("doc_id") % 25 === 0)
      .select(array_join(slice(split(col("text"), " "), 1, 60), " ").as("bench_text"))
    // warm (sf0.001 end-to-end: JIT + codegen)
    graft.queries.CurationQueries.bloomDecontaminate(spark, "/root/testdata/sf0.001").count()

    val bits = time("filter build")(Bloom.ngramFilter(bench, "bench_text", n = 8))
    def probe(docs: org.apache.spark.sql.DataFrame) =
      docs.select(col("doc_id"),
          Bloom.ngramHitCount("text", 8, bits).cast("long").as("n_hits"))
        .filter(col("n_hits") >= 1)
    time("probe pass")(probe(d).count())
    time("probe pass (warm)")(probe(d).count())
    time("t10 shuffle join")(graft.queries.CurationQueries.contamination(spark, dir).count())

    val big = d.crossJoin(spark.range(10).toDF("copy"))
      .select((col("doc_id") * 10 + col("copy")).as("doc_id"),
        concat(col("text"), lit(" tail"), col("copy")).as("text"))
    println(s"[profile] scaled docs: ${big.count()}")
    time("probe at 10x docs")(probe(big).count())
    spark.stop()
  }
}
