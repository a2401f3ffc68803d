package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Drift.embeddingDrift]] on hand-computed centroids. */
class EmbeddingDriftSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("hand-computed per-label L1 centroid displacement") {
    // label 1: A centroid (2, 0) from {(1,0), (3,0)}; B centroid (4, 0)
    //   → L1 = 2.0 → 2,000,000 micro-units
    // label 2: identical snapshots → zero shift
    val a = Seq((1, Seq(1.0f, 0.0f)), (1, Seq(3.0f, 0.0f)),
      (2, Seq(5.0f, 5.0f))).toDF("label", "embedding")
    val b = Seq((1, Seq(4.0f, 0.0f)), (2, Seq(5.0f, 5.0f)))
      .toDF("label", "embedding")
    val out = Drift.embeddingDrift(a, b, "label", "embedding").collect()
    assert(out.length === 2)
    val l1 = out.find(_.getInt(0) == 1).get
    assert(l1.getAs[Long]("n_a") === 2L)
    assert(l1.getAs[Long]("n_b") === 1L)
    // num = |sA_0·nB − sB_0·nA| = |4·2²⁰·1 − 4·2²⁰·2| = 4·2²⁰
    assert(l1.getAs[String]("l1_num") === (4L * (1L << 20)).toString)
    assert(l1.getAs[Long]("l1_shift_micro") === 2000000L)
    val l2 = out.find(_.getInt(0) == 2).get
    assert(l2.getAs[String]("l1_num") === "0")
    assert(l2.getAs[Long]("l1_shift_micro") === 0L)
  }

  test("labels present in only one snapshot are excluded") {
    val a = Seq((1, Seq(1.0f)), (9, Seq(1.0f))).toDF("label", "embedding")
    val b = Seq((1, Seq(1.0f))).toDF("label", "embedding")
    val out = Drift.embeddingDrift(a, b, "label", "embedding").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1))
  }
}
