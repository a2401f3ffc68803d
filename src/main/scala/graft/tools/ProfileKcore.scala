package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiling for the g05 k-core peel (not part of the
  * driver contract): which peel stage holds the memory at sf0.1? */
object ProfileKcore {
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

    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    time("lineitem count")(println(li.count()))
    val pairs = li.as("x").join(li.as("y"),
      col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
    time("pair count")(println(pairs.count()))
    val strong = pairs
      .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
      .agg(countDistinct(col("x.ok")).as("c"))
      .filter(col("c") >= 2)
      .select(col("a"), col("b"))
    time("strong count")(println(strong.count()))
    val (res, r) = time("peel")(graft.operators.KCore.peel(strong, "a", "b", k = 2))
    time("result")(println((res.count(), r)))
    spark.stop()
  }
}
