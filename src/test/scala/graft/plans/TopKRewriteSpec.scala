package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[TopKWindowRewrite]]: the window-form grouped top-k idiom is
  * rewritten to plan through [[TopKPerKeyExec]] bounded heaps, with
  * results identical to the un-rewritten window — existing DataFrame
  * code gets the survivors-only shuffle with no source change. */
class TopKRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def windowTopK(k: Int) = {
    val df = (1 to 2000)
      .map(i => (i % 7L, (i * 37 % 1000).toLong, i.toLong))
      .toDF("key", "score", "id")
    val w = Window.partitionBy(col("key"))
      .orderBy(col("score").desc, col("id"))
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("key"), col("score"), col("id"), col("rank"))
  }

  private def withRule[A](f: => A): A = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopKWindowRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == TopKWindowRewrite)
  }

  test("rewrite fires: TopKPerKeyExec appears under the window") {
    withRule {
      val plan = windowTopK(5).queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"no bounded-heap exec in:\n$plan")
    }
  }

  test("results identical with and without the rewrite") {
    val plain = windowTopK(5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val rewritten = withRule {
      windowTopK(5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    }
    assert(rewritten === plain)
    assert(plain.size === 35) // 7 keys × 5
  }

  test("single-sort-key row_number rewrites; equal to window form when tie-free") {
    withRule {
      // scores are UNIQUE per key here, so the tie-nondeterministic
      // single-key idiom has exactly one valid answer — the rewritten
      // plan must reproduce the window form bit for bit
      val df = (1 to 2000)
        .map(i => (i % 7L, i.toLong))
        .toDF("key", "score")
      val w = Window.partitionBy(col("key")).orderBy(col("score").desc)
      val q = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 4)
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val got = q.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (0L to 6L).flatMap { k =>
        val top = (1 to 2000).map(_.toLong).filter(_ % 7 == k)
          .sorted(Ordering[Long].reverse).take(4)
        top.zipWithIndex.map { case (s, i) => (k, s, i + 1) }
      }.toSet
      assert(got === want)
    }
  }

  test("single-sort-key with score TIES: a valid top-k set survives") {
    withRule {
      // 10 rows per key share score 5; row_number's own tie order is
      // arbitrary, so the contract is: k rows per key, scores equal to
      // the window form's score multiset
      val df = (1 to 300)
        .map(i => (i % 3L, 5L, i.toLong))
        .toDF("key", "score", "id")
      val w = Window.partitionBy(col("key")).orderBy(col("score").desc)
      val q = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 7)
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val byKey = q.collect().groupBy(_.getLong(0))
      assert(byKey.keySet === Set(0L, 1L, 2L))
      byKey.values.foreach { rows =>
        assert(rows.length === 7)
        assert(rows.forall(_.getLong(1) === 5L))
        assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to 7).toSeq)
      }
    }
  }

  test("k < 1 left alone; analyzer-projected expression keys rewrite too") {
    withRule {
      // rank <= 0 → no rewrite (and an empty result either way)
      val z = windowTopK(0)
      assert(!z.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(z.count() === 0)
      // an expression partition key is extracted to a projected
      // attribute by the analyzer BEFORE optimization, so the rewrite
      // correctly applies there as well
      val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("a", "b")
      val w = Window.partitionBy(col("a") % 3)
        .orderBy(col("b").desc, col("a"))
      val q = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 2)
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(q.count() === 6)
    }
  }
}
