package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[PageRank.pageRank]]: symmetry (a regular graph keeps equal
  * ranks), centrality ordering (a star's hub outranks its spokes),
  * determinism across partitionings, and mass conservation up to the
  * documented floor loss. */
class PageRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] =
    PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def undirected(pairs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    pairs ++ pairs.map(_.swap)

  test("regular graph: every node keeps the same rank") {
    // undirected 4-cycle: perfectly symmetric
    val got = run(undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))))
    assert(got.size === 4)
    assert(got.values.toSet.size === 1, s"asymmetric ranks: $got")
  }

  test("star: hub outranks spokes; spokes identical") {
    val got = run(undirected((1L to 6L).map(i => (0L, i))))
    val hub = got(0L)
    val spokes = (1L to 6L).map(got)
    assert(spokes.toSet.size === 1, s"spokes differ: $got")
    assert(hub > spokes.head * 3, s"hub not dominant: $got")
  }

  test("deterministic across input partitionings") {
    val pairs = undirected((1L to 40L).map(i => (i % 7, i + 10)))
    val a = run(pairs)
    val b = PageRank.pageRank(pairs.toDF("src", "dst").repartition(13),
      "src", "dst", 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("mass conserved up to floor loss") {
    val pairs = undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L),
      (0L, 2L), (1L, 3L)))
    val got = run(pairs)
    val total = got.values.sum
    assert(total <= PageRank.Scale)
    assert(total > PageRank.Scale * 99 / 100, s"lost too much mass: $total")
  }
}
