package graft.tools

/** Print one headline query's executed plan (AQE final) at a given sf
  * dir — the per-query iteration loop behind PLANS.md. Usage:
  * `sbt "runMain graft.tools.PlanOne t42_stitch_pairs [sfDir]"`. */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.Graft.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "plan-one")
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val n = df.count()
    val dt = (System.nanoTime() - t0) / 1e9
    val plan = df.queryExecution.executedPlan.toString
    println(s"=== $name rows=$n time=${"%.2f".format(dt)}s " +
      s"filescans=${"FileScan".r.findAllIn(plan).length}")
    println(plan)
    spark.stop()
  }
}
