package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-style partition layout + partition pruning: at 100 TB the
  * event-type filter must prune directories at planning time, not scan
  * and discard. */
class PartitionPruningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("partitioned write + filter prunes partitions at the scan") {
    val out = Files.createTempDirectory("events_part").toString
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    // one directory per event type
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("event_type=")) == 5)

    val q = spark.read.parquet(out)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter missing:\n$plan")
    // the pruned scan reads only the purchase directory
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).headOption
    q.collect()
    scanned.foreach(m => assert(m.value <= dirs.length.toLong))
  }
}
