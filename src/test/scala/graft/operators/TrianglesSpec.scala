package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Triangles.perNodeCounts]]: hand-counted graphs, and equality
  * of the broadcast-probe path vs the shuffle-join fallback (same
  * algorithm, two physical forms — the a03/a08 full-probe principle). */
class TrianglesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("K4: every vertex sits in C(3,2)=3 triangles") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val out = Triangles.perNodeCounts(e, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("path graph has no triangles; pendant triangle counts once") {
    // 1-2-3-4 path (no triangles) plus triangle 5-6-7
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (5L, 7L)).toDF("a", "b")
    val out = Triangles.perNodeCounts(e, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("packed-probe boundary: id 2³¹−1 stays in the broadcast path and " +
      "its closing edges are found; ids ≥ 2³¹ route to the join path") {
    // r9 review regression: the CSR end-key for vertex v was computed
    // as (v+1)·2³², which overflows signed Long at the guard's own
    // upper edge (v = 2³¹−1, key = 2⁶³) — the range probe compared
    // against Long.MinValue and silently missed every closing edge of
    // that vertex. The fix probes v·2³² + (2³²−1) (caps at Long.Max)
    // and tightens the broadcast-path guard to ids < 2³¹.
    val hi = (1L << 31) - 1 // largest id the broadcast path admits
    val tri = Seq((10L, hi), (10L, 20L), (20L, hi)).toDF("a", "b")
    val out = Triangles.perNodeCounts(tri, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 1L, 20L -> 1L, hi -> 1L))
    // one id past the bound: same triangle must still be counted
    // (the guard routes the whole graph to the shuffle-join path)
    val big = 1L << 31
    val tri2 = Seq((10L, big), (10L, 20L), (20L, big)).toDF("a", "b")
    val out2 = Triangles.perNodeCounts(tri2, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == Map(10L -> 1L, 20L -> 1L, big -> 1L))
  }

  test("broadcast-probe and shuffle-join paths agree on a random graph") {
    // deterministic pseudo-random graph: 40 vertices, edge iff
    // xxhash-free arithmetic gate (no Math.random — reproducible)
    val pairs = for {
      i <- 1L to 40L; j <- (i + 1) to 40L
      if (i * 2654435761L + j * 40503L) % 7 == 0
    } yield (i, j)
    val e = pairs.toDF("a", "b")
    val broad = Triangles.perNodeCounts(e, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val joined = Triangles.perNodeCounts(e, "a", "b", maxBroadcastEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(broad.nonEmpty)
    assert(broad === joined)
  }
}
