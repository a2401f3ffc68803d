package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for optimization rounds: times named plan
  * fragments against the noop sink (guide §1.4 — compute every column,
  * discard the result, no sink cost) so a bench row's cost can be
  * attributed to its stages. `sbt "runMain graft.tools.Probe <name>
  * [sfDir]"`. Fragments are registered ad hoc per round; this is a
  * measurement tool, not part of any query path. */
object Probe {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "copurchase"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.Graft.session(32, "probe")
    spark.sparkContext.setLogLevel("WARN")
    which match {
      case "copurchase" => copurchase(spark, dir)
      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }

  /** art_copurchase_weights stage split: scan+groupBy, pair explode,
    * pair groupBy, publish write. */
  private def copurchase(spark: SparkSession, dir: String): Unit = {
    val li = graft.Tables.lineitem(spark, dir)
    // warm the input page cache / JIT once
    time("warm: full build (1st, cold JIT)") {
      noop(graft.queries.GraphCache.coPurchaseWeightsOf(li))
    }
    val perOrder = li
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("ps"))
    time("stage1: groupBy(ok) collect_set") { noop(perOrder) }
    val pairs = perOrder.select(explode(expr(
      """flatten(transform(ps, (x, i) ->
        |  transform(slice(ps, i + 2, size(ps)), y ->
        |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
    time("stage2: + pair explode") { noop(pairs) }
    time("stage3: full build (warm)") {
      noop(graft.queries.GraphCache.coPurchaseWeightsOf(li))
    }
    time("stage4: publish+read+count (warm)") {
      graft.queries.GraphCache.resetMemoForTest()
      graft.queries.GraphCache.sweepSharedStore()
      graft.queries.GraphCache.coPurchaseWeights(spark, dir).count()
    }
    time("stage5: repeat") {
      graft.queries.GraphCache.resetMemoForTest()
      graft.queries.GraphCache.sweepSharedStore()
      graft.queries.GraphCache.coPurchaseWeights(spark, dir).count()
    }
  }
}
