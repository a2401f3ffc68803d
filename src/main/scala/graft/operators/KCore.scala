package graft.operators

import graft.core.Caching.LedgerOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling (Batagelj–Zaveršnik
  * semantics, materialized round by round): repeatedly delete every
  * vertex whose CURRENT degree is < k until none qualifies; the
  * surviving subgraph is the k-core, and the round at which a vertex
  * fell is its peel wave — the standard cohesion readout (spam rings,
  * community nuclei, "which parts hold the co-purchase web together").
  *
  * Shape per round: one degree aggregate (map-side combined count) and
  * two anti joins on the vertex key — every stage shuffles on the
  * vertex/edge keys only, no broadcast of anything graph-sized, no
  * driver-side graph state (the driver sees ONE scalar per round: the
  * weak-vertex count that decides convergence). Round frames persist
  * and the previous round unpersists once its successor materializes —
  * the g01/g02 iteration discipline. Round count is data-dependent but
  * small in practice (the peel front must strictly shrink); `maxRounds`
  * fails loudly rather than looping.
  */
object KCore {

  /** Peel `edges` (undirected, one row per edge) to the `k`-core.
    *
    * Returns (result, rounds): result has one row per vertex —
    * `(node, peel_round, core_deg)` with `peel_round` = the 1-based
    * round the vertex was deleted in, or 0 for core members;
    * `core_deg` = degree within the final core (0 for deleted
    * vertices). `rounds` is the number of non-empty peel waves — the
    * unroll depth an SQL replay of the fixpoint needs. */
  def peel(edges: DataFrame, aCol: String, bCol: String, k: Int,
           maxRounds: Int = 64,
           localComputeMaxEdges: Long = 10000000L,
           localComputeMaxNodes: Long = 1000000L): (DataFrame, Int) = {
    require(k >= 1, "k must be positive")
    val sym = edges
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(edges.select(col(bCol).as("u"), col(aCol).as("v")))
      .persistLedgered()
    // LOCAL regime (r10, the Hits/PageRank/Bfs/Clusters pattern): the
    // synchronous peel is a pure integer fixpoint — a CSR walk over
    // one collected packed-long edge array (r11, was Array[Row]; see
    // LocalGraph's primitive byte budget — ≈180 MB peak at the
    // 10M-edge guard) reproduces every wave (and therefore the ROUND
    // COUNT the oracle unroll depends on) exactly, without 2 checkpoint
    // jobs + 3 shuffles per round. Gated to Long ids (any range — r12:
    // ids past the packing bound take LocalGraph's dictionary
    // pre-pass) and null-free edges; edge MULTIPLICITY is preserved
    // (degree = edge-row count, the distributed aggregate's semantics
    // — the CSR keeps duplicate rows). Past the guards the superstep
    // peel below runs unchanged.
    val longIds = sym.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    val st = sym.agg(count(lit(1)),
      count(when(col("u").isNull || col("v").isNull, lit(1))),
      max(greatest(col("u"), col("v"))),
      min(least(col("u"), col("v")))).collect()(0)
    if (longIds && st.getLong(1) == 0 &&
        st.getLong(0) > 0 && st.getLong(0) <= localComputeMaxEdges) {
      val (packed, ids) = LocalGraph.collectIndexed(sym, "u", "v",
        st.getLong(3), st.getLong(2))
      if (ids.length <= localComputeMaxNodes) {
        val (offsets, targets) = LocalGraph.csrIndexed(packed, ids.length)
        val n = ids.length
        // sym contains BOTH directions, so every node has out-rows and
        // deg(i) = out-multiplicity = the distributed degree aggregate
        val deg = new Array[Long](n)
        val alive = new Array[Boolean](n)
        var i = 0
        while (i < n) {
          deg(i) = (offsets(i + 1) - offsets(i)).toLong; alive(i) = true
          i += 1
        }
        val remNode = scala.collection.mutable.ArrayBuffer[Int]()
        val remRound = scala.collection.mutable.ArrayBuffer[Int]()
        var r = 0
        var done = false
        while (!done) {
          val weak = scala.collection.mutable.ArrayBuffer[Int]()
          i = 0
          while (i < n) { if (alive(i) && deg(i) < k) weak += i; i += 1 }
          if (weak.isEmpty) done = true
          else {
            r += 1
            if (r > maxRounds) throw new IllegalStateException(
              s"k-core peel did not converge within $maxRounds rounds — " +
                "raise maxRounds for this graph")
            weak.foreach { w => alive(w) = false; remNode += w; remRound += r }
            // each (w, v) row has a (v, w) mirror feeding deg(v):
            // decrement survivors once per incident row multiplicity
            weak.foreach { w =>
              var kk = offsets(w)
              while (kk < offsets(w + 1)) {
                val v = targets(kk)
                if (alive(v)) deg(v) -= 1L
                kk += 1
              }
            }
          }
        }
        val out = new java.util.ArrayList[org.apache.spark.sql.Row](n)
        i = 0
        while (i < n) {
          if (alive(i)) out.add(org.apache.spark.sql.Row(ids(i), 0, deg(i)))
          i += 1
        }
        i = 0
        while (i < remNode.length) {
          out.add(org.apache.spark.sql.Row(ids(remNode(i)), remRound(i), 0L))
          i += 1
        }
        import org.apache.spark.sql.types._
        return (edges.sparkSession.createDataFrame(out,
          StructType(Seq(
            StructField("node", LongType),
            StructField("peel_round", IntegerType, nullable = false),
            StructField("core_deg", LongType)))), r)
      }
    }
    // the vertex set is tracked EXPLICITLY: a wave that deletes all of
    // a vertex's neighbors leaves it with degree 0 but NO edge rows, so
    // an edges-only formulation silently loses it — it must instead
    // fall in the next wave (deg 0 < k). KCoreSpec's two-component
    // case pins exactly this.
    var aliveV = sym.select(col("u")).distinct().localCheckpointLedgered(eager = true)
    var alive = sym
    var removed: Option[DataFrame] = None
    var r = 0
    var done = false
    var lastVertDeg: DataFrame = null
    while (!done) {
      // eager localCheckpoint, not persist: round r's logical plan
      // embeds round r−1's THREE times (directly, and twice through
      // the weak set), so an un-truncated lineage grows 3^r and the
      // DRIVER dies of plan analysis long before any executor works —
      // measured as a driver OOM at 5 rounds on the sf0.1 graph. The
      // checkpoint trades Catalyst stats (the g01 persist-vs-
      // localCheckpoint tradeoff) for O(1) plan depth, which is the
      // binding constraint in any fixpoint whose round output feeds
      // the next round twice. One checkpointed (vertex, degree) frame
      // per round serves weak set, survivor set, and the final core
      // readout — 2 checkpoint jobs per round, not 4.
      val deg = alive.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val vertDeg = aliveV.join(deg, Seq("u"), "left")
        .select(col("u"), coalesce(col("deg"), lit(0L)).as("deg"))
        .localCheckpointLedgered(eager = true)
      val weak = vertDeg.filter(col("deg") < k).select(col("u").as("w"))
      if (weak.count() == 0) {
        done = true
        lastVertDeg = vertDeg
      } else {
        r += 1
        if (r > maxRounds) throw new IllegalStateException(
          s"k-core peel did not converge within $maxRounds rounds — " +
            "raise maxRounds for this graph")
        val rm = weak.select(col("w").as("node"))
          .withColumn("peel_round", lit(r))
        removed = Some(removed.map(_.unionByName(rm)).getOrElse(rm))
        aliveV = vertDeg.filter(col("deg") >= k).select(col("u"))
        val next = alive
          .join(weak, alive("u") === weak("w"), "left_anti")
          .join(weak.withColumnRenamed("w", "w2"),
            alive("v") === col("w2"), "left_anti")
          .localCheckpointLedgered(eager = true)
        // checkpoint blocks are ledger-registered (localCheckpoint
        // pins OUTSIDE the SQL CacheManager — neither clearCache nor
        // ContextCleaner-before-GC reaches them). The SUPERSEDED edge
        // list is fully consumed by `next`'s eager checkpoint, so its
        // blocks release NOW — peak storage stays O(2 rounds), not
        // O(all rounds). vertDeg snapshots must NOT release early:
        // every round's `rm` (a view over its vertDeg) rides to the
        // final readout through `removed`, and a truncated-lineage
        // checkpoint cannot recompute dropped blocks. Round 1's alive
        // is `sym` (a persist, no LogicalRDD) — the release no-ops.
        graft.core.Caching.releaseCheckpoint(alive)
        alive = next
      }
    }
    // at the fixpoint the last vertDeg IS the core with its degrees
    val core = lastVertDeg
      .select(col("u").as("node"), lit(0).as("peel_round"),
        col("deg").as("core_deg"))
    val out = removed match {
      case None => core
      case Some(rm) => core.unionByName(
        rm.withColumn("core_deg", lit(0L))
          .select(col("node"), col("peel_round"), col("core_deg")))
    }
    (out, r)
  }
}
