package graft.tools

/** Scratch phase-timer for the g03 build (round-9 profiling; not part
  * of the library surface). */
object ProfileG03 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.Graft.session(32, "profile-g03")
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[g03] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("warmup sf0.001") {
      graft.queries.Relational9.g03Triangles(spark, "/root/testdata/sf0.001").count()
    }
    graft.core.Caching.CacheLedger.releaseAll()
    spark.catalog.clearCache()
    val w = t("weights build+count") {
      graft.queries.GraphCache.coPurchaseWeights(spark, dir).count()
    }
    println(s"[g03] edges: $w")
    t("triangle artifact build") {
      graft.queries.GraphCache.coPurchaseTriangles(spark, dir).count()
    }
    val tri = graft.queries.GraphCache.coPurchaseTriangles(spark, dir)
    println("[g03] total triangles: " + tri.agg(
      org.apache.spark.sql.functions.expr("sum(n_triangles) / 3")).collect()(0))
    t("g03 query (artifact warm)") {
      graft.queries.Relational9.g03Triangles(spark, dir).count()
    }
    spark.stop()
  }
}
