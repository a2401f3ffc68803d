package graft.operators

import graft.core.Caching.LedgerOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop BFS: shortest hop distance from a source set to every
  * reachable node, up to `maxHops` — the Pregel min-propagation
  * complement to [[PageRank]]'s sum-propagation. Pure integer
  * semantics (distances are exact smallest hop counts), so both
  * engines agree trivially; the oracle unrolls the same k frontier
  * expansions.
  *
  * Scale posture: iteration i joins the CURRENT frontier (nodes first
  * reached at distance i — shrinking, not the whole reached set)
  * against the edge list, then anti-joins the reached set to keep only
  * new nodes: k iterations = k (frontier⋈edges) shuffles bounded by
  * the frontier×degree product, plus one |reached|-row anti join each
  * round. Distances never revisit a node, so total work across rounds
  * is O(|E| + |V|) for connected graphs — the textbook BFS bound,
  * with no driver-side state.
  */
object Bfs {

  /** Hop distances from `sources` (a 1-column DataFrame of node ids)
    * over the directed edge list, capped at `maxHops`.
    * Output: (id, dist) for every node within the cap (sources at 0). */
  def hopDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   sources: DataFrame, maxHops: Int,
                   edgesDistinct: Boolean = false,
                   localComputeMaxEdges: Long = 10000000L,
                   localComputeMaxNodes: Long = 1000000L): DataFrame = {
    require(maxHops >= 0)
    // cached once: every hop joins the frontier against the edge list,
    // and uncached `e` would re-derive the caller's edge pipeline
    // (orders⋈lineitem + distinct for the trade graph) per hop —
    // persist keeps Catalyst stats (see the PageRank note on why
    // localCheckpoint is the wrong materialization here).
    // edgesDistinct: artifact-served callers (g02) skip the redundant
    // |E|-row distinct shuffle, the PageRank/Hits flag applied here
    val proj = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val e = (if (edgesDistinct) proj else proj.distinct())
      .persistLedgered()
    // eager pin (the PageRank rule): every hop is its own eager-
    // checkpoint action joining `e`; a cache that silently fails to
    // populate re-runs the edge distinct per hop
    val st = e.agg(count(lit(1)),
      count(when(col("src").isNull || col("dst").isNull, lit(1))),
      max(greatest(col("src"), col("dst"))),
      min(least(col("src"), col("dst")))).collect()(0)
    val src = sources.select(col(sources.columns.head).cast("long").as("id"))
      .distinct()
    // LOCAL regime (r10, the Hits/PageRank pattern): hop distances are
    // pure integer min-propagation — a CSR walk over one collected
    // packed-long edge array (r11, was Array[Row] — see LocalGraph's
    // primitive byte budget: ≈180 MB peak at the 10M-edge guard) is
    // bit-identical to the k-superstep plan, and below the guards it
    // replaces k sequential join+distinct+anti-join+checkpoint stages
    // whose scheduling floor dwarfs the walk. Null endpoints or null
    // sources keep the distributed plan; past the guards it runs
    // unchanged. Any id range (r12): ids past the packing bound take
    // LocalGraph's dictionary pre-pass instead of losing the regime.
    if (st.getLong(0) > 0 && st.getLong(0) <= localComputeMaxEdges &&
        st.getLong(1) == 0) {
      val srcRows = src.collect()
      if (srcRows.forall(!_.isNullAt(0))) {
        val (packed, ids) = LocalGraph.collectIndexed(e, "src", "dst",
          st.getLong(3), st.getLong(2))
        if (ids.length <= localComputeMaxNodes) {
          val (offsets, targets) = LocalGraph.csrIndexed(packed, ids.length)
          // dist over node indices; sources OUTSIDE the edge list's
          // node set still emit (id, 0) — the distributed union does
          val dist = new Array[Int](ids.length)
          java.util.Arrays.fill(dist, -1)
          val extra = scala.collection.mutable.ArrayBuffer[Long]()
          var frontier = new Array[Int](srcRows.length)
          var fn = 0
          srcRows.foreach { r =>
            val i = LocalGraph.idx(ids, r.getLong(0))
            if (i >= 0) {
              if (dist(i) < 0) { dist(i) = 0; frontier(fn) = i; fn += 1 }
            } else extra += r.getLong(0)
          }
          var hop = 1
          while (hop <= maxHops && fn > 0) {
            val next = new Array[Int](ids.length)
            var nn = 0
            var fi = 0
            while (fi < fn) {
              val u = frontier(fi)
              var k = offsets(u)
              while (k < offsets(u + 1)) {
                val v = targets(k)
                if (dist(v) < 0) { dist(v) = hop; next(nn) = v; nn += 1 }
                k += 1
              }
              fi += 1
            }
            frontier = next; fn = nn
            hop += 1
          }
          val out = new java.util.ArrayList[org.apache.spark.sql.Row]()
          var i = 0
          while (i < ids.length) {
            if (dist(i) >= 0)
              out.add(org.apache.spark.sql.Row(ids(i), dist(i).toLong))
            i += 1
          }
          extra.foreach(id => out.add(org.apache.spark.sql.Row(id, 0L)))
          import org.apache.spark.sql.types._
          return edges.sparkSession.createDataFrame(out,
            StructType(Seq(
              StructField("id", LongType),
              StructField("dist", LongType))))
        }
      }
    }
    // each iteration references the previous reached set TWICE (anti
    // join + union), so the un-truncated logical plan doubles per hop —
    // exponential analysis time by hop ~10. localCheckpoint
    // materializes each frontier and cuts the lineage: plan size stays
    // O(1) per iteration (the iterative-algorithm contract; Pregel
    // systems do the same superstep materialization)
    var reached = src.withColumn("dist", lit(0L)).localCheckpointLedgered()
    var frontier = reached
    (1 to maxHops).foreach { i =>
      val next = e.join(frontier.select(col("id").as("src")), "src")
        .select(col("dst").as("id")).distinct()
        .join(reached.select(col("id")), Seq("id"), "left_anti")
        .withColumn("dist", lit(i.toLong))
        .localCheckpointLedgered()
      val grown = reached.unionAll(next).localCheckpointLedgered()
      // the prior reached snapshot is fully copied into `grown` and the
      // prior frontier is superseded by `next` (both consumed EAGERLY
      // above) — release their blocks NOW so a deep BFS holds two
      // frontiers + one reached set, not every hop's history. At i = 1
      // frontier IS the reached snapshot, already released.
      graft.core.Caching.releaseCheckpoint(reached)
      if (i > 1) graft.core.Caching.releaseCheckpoint(frontier)
      reached = grown
      frontier = next
    }
    reached
  }

  /** The DuckDB replay: `edgeSql` yields (src, dst) directed,
    * `sourcesSql` yields (id). Frontiers unroll as CTEs with the same
    * anti-join-the-reached-set step. */
  def oracleSql(edgeSql: String, sourcesSql: String, maxHops: Int): String = {
    val steps = (1 to maxHops).map { i =>
      val prevReached = (0 until i).map(j => s"SELECT id FROM f$j")
        .mkString(" UNION ALL ")
      s"""f$i AS (
         |  SELECT DISTINCT e.dst AS id
         |  FROM edges e JOIN f${i - 1} f ON e.src = f.id
         |  WHERE e.dst NOT IN ($prevReached))"""
        .stripMargin
    }.mkString(",\n")
    val all = (0 to maxHops)
      .map(i => s"SELECT id, CAST($i AS BIGINT) AS dist FROM f$i")
      .mkString("\nUNION ALL\n")
    s"""WITH edges AS ($edgeSql),
       |f0 AS (SELECT DISTINCT id FROM ($sourcesSql)),
       |$steps
       |$all""".stripMargin
  }
}
