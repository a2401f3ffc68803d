package graft.operators

import graft.core.Caching.LedgerOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed triangle counting — the cohesion signal behind g03's
  * co-purchase query, shaped for graphs that don't fit one machine.
  *
  * Algorithm (the standard compact-forward / degree-orientation scheme,
  * cf. Suri & Vassilvitskii "Counting Triangles and the Curse of the
  * Last Reducer", WWW'11):
  *
  *  1. Rank every vertex by (degree, id) — a TOTAL order — using the
  *     two-level [[GlobalIds.assignBy]] rank (no single-task window).
  *  2. Orient each undirected edge from lower rank to higher rank.
  *     Every triangle then has exactly ONE source vertex (its rank
  *     minimum), so each is enumerated once, never three times; and
  *     out-degrees are bounded by O(√m) on arbitrary graphs — the hot
  *     celebrity node that breaks id-ordered orientation at web scale
  *     fans IN, not out.
  *  3. Enumerate wedges (v, w) from each vertex's out-neighbor list and
  *     keep those whose closing edge v→w exists.
  *
  * The closing-edge test is the whole cost. Two physical paths:
  *
  *  - |E| ≤ `maxBroadcastEdges`: pack each directed edge into one long
  *    (u·2³² + w over the dense 0-based ranks), broadcast the SORTED
  *    long array (8 B/edge — 10M edges = 80 MB, the same budget class
  *    as a broadcast-hash join side), and probe it with binary search
  *    INSIDE the wedge loop. The ~d² wedge stream per vertex is never
  *    materialized, never shuffled — only actual triangles leave the
  *    task. At sf0.1 the co-purchase graph generates 83M wedges; as
  *    shuffle rows they cost ~26 s, as in-memory probes ~2 s.
  *  - larger |E|: the three-way self-join in rank space (each leg
  *    shuffles on a key, AQE handles skew). Same output, no broadcast
  *    assumption — the 1000-executor fallback for graphs whose edge
  *    list outgrows a broadcast.
  *
  * Degree-orientation measured at sf0.1: 99.7M wedges under id order
  * vs 83.4M under degree order — only 16% here because the co-purchase
  * graph is near-regular (degrees 38–222), but on power-law graphs the
  * gap is the difference between O(m^1.5) and the last reducer never
  * finishing; the ordering costs two |V|-bounded joins, so it's kept.
  *
  * Cache lifetime: `rank` and `dir` persist MEMORY_AND_DISK for the
  * duration of the returned (lazy) plan; single-query callers (Bench,
  * Verify) clear the cache after consuming the action.
  *
  * Input: undirected edges as distinct (aCol, bCol) pairs, integral
  * node ids. Output: (node, n_triangles) for every node in ≥1 triangle.
  */
object Triangles {

  private val Pack = 4294967296L // 2^32: ranks are dense 0-based longs

  def perNodeCounts(edges: DataFrame, aCol: String, bCol: String,
                    maxBroadcastEdges: Long = 10000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"))
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // (degree, id) is a total order over vertices; ranks are dense and
    // 0-based, so a rank pair packs into one long
    val rank = GlobalIds.assignBy(deg, Seq(col("d"), col("v")))
      .select(col("v"), col("global_id").as("r"))
      .persistLedgered()
    val dir = e
      .join(rank.select(col("v").as("a"), col("r").as("ra")), "a")
      .join(rank.select(col("v").as("b"), col("r").as("rb")), "b")
      .select(least(col("ra"), col("rb")).as("u"),
        greatest(col("ra"), col("rb")).as("w"))
      .persistLedgered()
    val m = dir.count()
    val corners: DataFrame =
      if (m <= maxBroadcastEdges) {
        val packed = dir.select((col("u") * Pack + col("w")).as("p"))
          .as[Long].collect()
        java.util.Arrays.sort(packed)
        val bc = spark.sparkContext.broadcast(packed)
        dir.groupBy(col("u"))
          .agg(sort_array(collect_list(col("w"))).as("ns"))
          .as[(Long, Seq[Long])]
          .flatMap { case (u, ns) =>
            // ns ascending = rank order, so pairs (i < j) are already
            // oriented low→high and probe as packed directed edges
            val arr = ns.toArray
            val out = scala.collection.mutable.ArrayBuffer[Long]()
            var i = 0
            while (i < arr.length - 1) {
              var j = i + 1
              while (j < arr.length) {
                if (java.util.Arrays.binarySearch(
                    bc.value, arr(i) * Pack + arr(j)) >= 0) {
                  out += u; out += arr(i); out += arr(j)
                }
                j += 1
              }
              i += 1
            }
            out
          }.toDF("r")
      } else {
        dir.as("e1").join(dir.as("e2"), col("e1.w") === col("e2.u"))
          .join(dir.as("e3"),
            col("e1.u") === col("e3.u") && col("e2.w") === col("e3.w"))
          .select(explode(array(col("e1.u"), col("e1.w"), col("e2.w")))
            .as("r"))
      }
    corners.groupBy(col("r")).agg(count(lit(1)).as("n_triangles"))
      .join(rank, Seq("r"))
      .select(col("v").as("node"), col("n_triangles"))
  }
}
