package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bfs.hopDistances]]: exact shortest hop counts on a chain,
  * shortest-of-several-paths, the hop cap, unreachable exclusion, and
  * multi-source minimums. */
class BfsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long],
                  hops: Int): Map[Long, Long] =
    Bfs.hopDistances(edges.toDF("src", "dst"), "src", "dst",
        sources.toDF("id"), hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain distances; cap truncates; unreachable excluded") {
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
    assert(run(chain, Seq(0L), 3) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(run(chain, Seq(0L), 10) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("shortest of several paths wins; cycles don't revisit") {
    // 0->1->2->3 and shortcut 0->3; cycle 3->0
    val g = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (3L, 0L))
    assert(run(g, Seq(0L), 5) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("multi-source takes the minimum distance") {
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(chain, Seq(0L, 3L), 2) ===
      Map(0L -> 0L, 3L -> 0L, 1L -> 1L, 4L -> 1L, 2L -> 2L))
  }
}
