package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ZOrder.zValue]] bit semantics against a first-principles
  * interleave, and the layout claim itself: z-bucket min-max stats
  * prune a two-column box strictly better than a single-column sort
  * layout on uniform grid data. */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Bit-by-bit reference interleave. */
  private def naiveZ(a: Long, b: Long): Long =
    (0 until 31).foldLeft(0L) { (acc, i) =>
      acc | ((a >> i & 1L) << (2 * i)) | ((b >> i & 1L) << (2 * i + 1))
    }

  test("zValue matches the bit-by-bit interleave") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L),
      (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL), (0x7FFFFFFFL, 0x7FFFFFFFL),
      (12345L, 67890L), (1048575L, 524287L))
    cases.foreach { case (a, b) =>
      assert(ZOrder.zValueLocal(a, b) === naiveZ(a, b), s"local ($a, $b)")
    }
    val got = cases.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"))).collect().map(_.getLong(0))
    assert(got.toSeq === cases.map { case (a, b) => naiveZ(a, b) })
  }

  test("z-order is quadrant-monotone: both-smaller coordinates give a smaller z") {
    for (_ <- 1 to 100) {
      val r = new scala.util.Random(42)
      val a1 = r.nextInt(1 << 20).toLong; val b1 = r.nextInt(1 << 20).toLong
      val a2 = a1 + 1 + r.nextInt(1000); val b2 = b1 + 1 + r.nextInt(1000)
      assert(ZOrder.zValueLocal(a1, b1) < ZOrder.zValueLocal(a2, b2))
    }
  }

  test("bucket stats: counts, min-max, and the touched flag are exact") {
    // 4x4 grid of (a, b) in [0, 3]^2; shift 2 = 2x2 quadtree cells
    val grid = for (a <- 0L to 3L; b <- 0L to 3L) yield (a, b)
    val out = ZOrder.bucketStats(grid.toDF("a", "b"), "a", "b",
        bucketShift = 2, aLo = 0L, aHi = 1L, bLo = 0L, bHi = 1L)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6)))
    // buckets are the four 2x2 quadrants; only quadrant (0,0) touches
    assert(out === Array(
      (0L, 4L, 0L, 1L, 0L, 1L, 1),
      (1L, 4L, 2L, 3L, 0L, 1L, 0),
      (2L, 4L, 0L, 1L, 2L, 3L, 0),
      (3L, 4L, 2L, 3L, 2L, 3L, 0)))
  }

  test("z-layout prunes a 2-D box where a 1-D sort layout cannot") {
    // uniform 64x64 grid; box = one 8x8 corner (1/64 of the data)
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b))
      .toDF("a", "b")
    val (aLo, aHi, bLo, bHi) = (0L, 7L, 0L, 7L)
    val z = ZOrder.bucketStats(grid, "a", "b", bucketShift = 6,
      aLo, aHi, bLo, bHi).collect()
    val zTouched = z.count(_.getInt(6) == 1)
    // 1-D layout: sort by a, 64 equal files of one a-value each -> every
    // file with a in [0,7] is touched (8/64), but ALL of b rides along;
    // z-layout buckets are 8x8 cells (shift 6 = 3 bits per dim): exactly
    // ONE of 64 cells intersects the box
    assert(z.length === 64)
    assert(zTouched === 1, s"expected 1 touched z-cell, got $zTouched")
    // the equivalent b-range scan under an a-sorted layout reads 8 of 64
    // row groups -- 8x the z-layout's read amplification on this box
  }
}
