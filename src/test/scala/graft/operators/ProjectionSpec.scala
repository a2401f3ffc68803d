package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.signProjection]] — JL sign random projection: exact
  * integer arithmetic, seed determinism, shuffle-free plan, and the
  * distance-preservation property the reduction exists for. */
class ProjectionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val dim = 8
  private def vecs(rows: (Long, Seq[Float])*) = rows.toSeq.toDF("id", "vec")

  test("projections are integer multiples of 2^-20 (exact arithmetic)") {
    val out = Similarity.signProjection(
        vecs((1L, Seq(0.25f, -1.5f, 0.125f, 3.0f, 0.0f, 1.0f, -0.5f, 2.0f))),
        "id", "vec", dim, k = 4)
      .collect()
    assert(out.length === 4)
    out.foreach { r =>
      val scaled = r.getDouble(2) * 1048576
      assert(scaled === math.rint(scaled), s"non-integral scaled value: $r")
    }
  }

  test("same seed reproduces identical projections; another seed differs") {
    val v = vecs((1L, Seq(1.0f, 2.0f, -1.0f, 0.5f, 3.0f, -2.0f, 0.25f, 1.5f)))
    val a = Similarity.signProjection(v, "id", "vec", dim, 4).collect().map(_.getDouble(2)).toSeq
    val b = Similarity.signProjection(v, "id", "vec", dim, 4).collect().map(_.getDouble(2)).toSeq
    val c = Similarity.signProjection(v, "id", "vec", dim, 4, seed = "other")
      .collect().map(_.getDouble(2)).toSeq
    assert(a === b)
    assert(a !== c)
  }

  test("projection is scan-local: no exchange in the plan") {
    val p = Similarity.signProjection(
        vecs((1L, Seq.fill(8)(1.0f))), "id", "vec", dim, 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"projection must not shuffle:\n$p")
  }

  test("close pairs stay closer than far pairs (JL property)") {
    // deterministic pseudo-random base vector + a tiny and a large
    // perturbation; k=16 projections of d=64
    def gen(s: Long): Seq[Float] =
      (1 to 64).map(i => (((s * 2654435761L + i * 40503L) % 1000) / 500.0f - 1.0f))
    val base = gen(7)
    val near = base.updated(0, base.head + 0.01f)
    val far = gen(13)
    val out = Similarity.signProjection(
        vecs((1L, base), (2L, near), (3L, far)), "id", "vec", 64, 16)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getLong(1)).map(_.getDouble(2)) }
    def dist(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    assert(dist(out(1L).toSeq, out(2L).toSeq) < dist(out(1L).toSeq, out(3L).toSeq))
  }
}
