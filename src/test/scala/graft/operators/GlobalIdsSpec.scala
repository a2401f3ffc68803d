package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[GlobalIds.assign]]: ids equal the global `row_number`
  * definition, are dense 0-based, and are invariant to the input's
  * partitioning — while the physical plan never sorts the data in one
  * task (the whole point of the two-level rank). */
class GlobalIdsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("ids == rank by key, dense from 0, any input partitioning") {
    // keys deliberately unsorted, with gaps
    val keys = scala.util.Random.shuffle((1 to 5000).map(_ * 7L)).toSeq
    for (parts <- Seq(1, 13)) {
      val out = GlobalIds.assign(
          keys.toDF("doc_id").repartition(parts), "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = keys.sorted.zipWithIndex
        .map { case (k, i) => k -> i.toLong }.toMap
      assert(out === expect, s"at input parts=$parts")
    }
  }

  test("plan has no single-task global sort over the data") {
    val df = GlobalIds.assign((1 to 100).map(_.toLong).toDF("doc_id"), "doc_id")
    val plan = df.queryExecution.executedPlan.toString
    // the data path is range-partitioned + local sort; the only global
    // window runs over the |partitions|-row offset table
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"expected a range exchange in:\n$plan")
  }
}
