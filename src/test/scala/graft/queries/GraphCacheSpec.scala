package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_gc_spec").toString
    // a triangle (parts 1,2,3 share orders pairwise) + a pendant (4)
    Seq((10L, 1L), (10L, 2L), (11L, 2L), (11L, 3L), (12L, 1L), (12L, 3L),
        (13L, 3L), (13L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("triangle artifact resolves its nested edges artifact first (no recursive memo)") {
    // calling the TRIANGLE artifact on a fresh key forces the edges
    // build from inside its code path — the regression this pins:
    // a computeIfAbsent inside another's mapping function throws
    // "Recursive update" whenever both keys land in one CHM bin
    val tri = GraphCache.coPurchaseTriangles(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri === Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      "the planted triangle's three corners each count it once")
  }

  test("artifact reads are stable across repeated calls and match a direct build") {
    val viaCache = GraphCache.coPurchaseEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val again = GraphCache.coPurchaseEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaCache === again)
    assert(viaCache === Set((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
  }
}
