package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for the named queries to
  * `<outDir>/<query>.txt` — the evidence files the optimization rounds
  * commit under plans/rNN/ as `<query>_before.txt` / `_after.txt`.
  * Run: `sbt "runMain graft.tools.ExplainDump <outDir> <q1,q2,...>
  * [sfDir]"`. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainDump <outDir> <q1,q2,...> [sfDir]")
    val outDir = Paths.get(args(0))
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    Files.createDirectories(outDir)
    val spark = graft.Graft.session(8, "explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val df = qs(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"$n.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $outDir/$n.txt")
    }
    spark.stop()
  }
}
