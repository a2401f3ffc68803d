package graft.operators

import graft.core.Caching.LedgerOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the cohesion signal behind g03's
  * co-purchase query, shaped for graphs that don't fit one machine.
  *
  * Algorithm (the standard compact-forward / degree-orientation scheme,
  * cf. Suri & Vassilvitskii "Counting Triangles and the Curse of the
  * Last Reducer", WWW'11):
  *
  *  1. Order every vertex by (degree, id) — a TOTAL order. No dense
  *     rank is materialized (round 9 — a GlobalIds pass + a final
  *     rank→id back-join used to cost ~2 s of the build): orientation
  *     only needs the COMPARISON, so the degree join carries (d, id)
  *     pairs and the edge orients in place.
  *  2. Orient each undirected edge from lower to higher (degree, id).
  *     Every triangle then has exactly ONE source vertex (its order
  *     minimum), so each is enumerated once, never three times; and
  *     out-degrees are bounded by O(√m) on arbitrary graphs — the hot
  *     celebrity node that breaks id-ordered orientation at web scale
  *     fans IN, not out.
  *  3. Enumerate wedges (v, w) from each vertex's out-neighbor list and
  *     keep those whose closing edge v→w exists.
  *
  * The closing-edge test is the whole cost. Two physical paths:
  *
  *  - |E| ≤ `maxBroadcastEdges` AND ids < 2³¹ (so every packed key
  *    stays inside signed-Long range): pack each directed edge
  *    into one long (u·2³² + w over the ORIGINAL ids), broadcast the
  *    SORTED long array (8 B/edge — 10M edges = 80 MB, the same budget
  *    class as a broadcast-hash join side). The sorted array IS a CSR:
  *    v's out-neighbors are the contiguous range [v·2³², v·2³²+2³²−1],
  *    so each wedge base (u, v) closes ALL its wedges with one range
  *    lookup + a linear merge of u's remaining list against N⁺(v) —
  *    O(d_u + d_v) per directed edge, sequential access (round 9:
  *    replaced a per-wedge binary search of log m random probes). The
  *    ~d² wedge stream per vertex is never materialized, never
  *    shuffled — only actual triangles leave the task.
  *  - larger |E| (or ids ≥ 2³²): the three-way self-join in oriented
  *    edge space (each leg shuffles on a key, AQE handles skew). Same
  *    output, no broadcast assumption — the 1000-executor fallback for
  *    graphs whose edge list outgrows a broadcast.
  *
  * Degree-orientation measured at sf0.1: 99.7M wedges under id order
  * vs 83.4M under degree order — only 16% here because the co-purchase
  * graph is near-regular (degrees 38–222), but on power-law graphs the
  * gap is the difference between O(m^1.5) and the last reducer never
  * finishing; the ordering costs one |V|-bounded join, so it's kept.
  *
  * Cache lifetime: `deg` (|V|-bounded, two orient-join legs) — plus
  * the oriented edge frame on the self-join path (three legs) —
  * persist MEMORY_AND_DISK for the duration of the returned (lazy)
  * plan; single-query callers (Bench, Verify) clear the cache after
  * consuming the action. On the broadcast path the oriented frame has
  * exactly one consumer and is never persisted.
  *
  * Input: undirected edges as distinct (aCol, bCol) pairs, integral
  * node ids. Output: (node, n_triangles) for every node in ≥1 triangle.
  */
object Triangles {

  // ONE packing rule, ONE file (r11 verdict #5): the packed-long key
  // layout and its id bound live in LocalGraph; Triangles — the
  // operator the toolkit was promoted FROM — now consumes them like
  // every other local regime, so the two copies can't drift (the r11
  // sink-node bug was exactly a rewrite-duplication artifact).
  private val Pack = LocalGraph.Pack

  def perNodeCounts(edges: DataFrame, aCol: String, bCol: String,
                    maxBroadcastEdges: Long = 10000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"))
    // |E| and the id bound (packing needs ids < 2³²) read straight off
    // the INPUT edge frame — when the edge list is a parquet artifact
    // (the GraphCache shape) this is a cheap columnar scan, and it
    // saves materializing the oriented frame just to count it
    val stats = e.agg(count(lit(1)),
      max(greatest(col("a"), col("b"))), min(least(col("a"), col("b"))))
      .collect()(0)
    val m = stats.getLong(0)
    val maxId = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    val minId = if (stats.isNullAt(2)) 0L else stats.getLong(2)
    lazy val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
      // |V|-bounded; consumed by BOTH orient-join legs — unpersisted,
      // each leg would recompute the degree aggregate over 2|E| rows
      .persistLedgered()
    // orient in place by the (degree, id) total order — the join is
    // |V|-bounded per side (broadcast below AQE's threshold, shuffle
    // join above it; both scale)
    lazy val dirE = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
    val corners: DataFrame =
      // the probe set lives in DENSE-INDEX space (r12 verdict #7):
      // collectIndexed packs idx(lo)·2³² + idx(hi) over the sorted id
      // dictionary, so ANY integral id range — ≥ 2³¹, negative —
      // keeps the broadcast path (previously such graphs silently
      // fell to the three-join legs even when tiny). Indices are
      // dense in [0, |V|) with |V| ≤ 2·|E| ≤ 2·10⁷, so the largest
      // probe key is far below the 2³¹·2³² signed-overflow edge the
      // raw-id packing had to guard against (review r9); the
      // dictionary is sorted, so index order ≡ raw-id order and the
      // canonical (min, max) orientation survives the translation.
      if (m <= maxBroadcastEdges) {
        // the probe set is packed ID-CANONICALLY (min-id index · 2³² +
        // max-id index), NOT in orientation direction: u's out-list
        // below is in id order while edges are (d, id)-oriented, so a
        // wedge pair (v, w) with id_v < id_w may have its closing edge
        // stored as w→v — canonical packing makes presence
        // direction-free and keeps the CSR range/merge walk valid
        // (probes are generated in (v, ascending w) order). Collected
        // from the INPUT frame (orientation can't change edge
        // identity), so the oriented join feeds exactly ONE consumer —
        // the out-list aggregate — and needs no persist.
        val canon = e.select(least(col("a"), col("b")).as("lo"),
          greatest(col("a"), col("b")).as("hi"))
        val (packedIdx, nodeDict) =
          LocalGraph.collectIndexed(canon, "lo", "hi", minId, maxId)
        java.util.Arrays.sort(packedIdx)
        // CSR offsets over the sorted packed array, built once here
        // (r13): the walk used two lowerBound binary searches per
        // wedge BASE — ~22 random probes each over a ~24 MB array,
        // measured as 42 s of executor CPU on the sf0.1 build (the
        // row's dominant cost). off(v)..off(v+1) is the same range,
        // one L1-resident int read per base.
        val off = {
          val o = new Array[Int](nodeDict.length + 1)
          var p = 0
          var v = 0
          while (v < nodeDict.length) {
            o(v) = p
            while (p < packedIdx.length && (packedIdx(p) >>> 32) == v) p += 1
            v += 1
          }
          o(nodeDict.length) = p
          o
        }
        val bc = spark.sparkContext.broadcast(packedIdx)
        val bcIds = spark.sparkContext.broadcast(nodeDict)
        val bcOff = spark.sparkContext.broadcast(off)
        // Per-PARTITION dense count array instead of 3 corner rows per
        // triangle (r13): the corner stream fed the downstream partial
        // count with 3·|triangles| rows (~tens of millions at sf0.1 —
        // the build's dominant stage), where a |V|-long array per task
        // absorbs every increment locally and emits ≤ |V| partial rows.
        // Indices are dense in [0, |V|), so the "hash map" is an array.
        dirE.groupBy(col("u"))
          .agg(sort_array(collect_list(col("w"))).as("ns"))
          .as[(Long, Array[Long])]
          .mapPartitions { rows =>
            val dict = bcIds.value
            val es = bc.value
            val offs = bcOff.value
            val counts = new Array[Long](dict.length)
            rows.foreach { case (u, arr) =>
              // arr ascending (id order ⇒ index order): each unordered
              // pair {v, w} ⊆ arr appears once as (i < j), and its
              // canonical probe key is idx(arr(i))·2³² + idx(arr(j))
              val uix = java.util.Arrays.binarySearch(dict, u)
              val aidx = new Array[Long](arr.length)
              var t = 0
              while (t < arr.length) {
                val ix = java.util.Arrays.binarySearch(dict, arr(t))
                if (ix < 0 || uix < 0) throw new IllegalStateException(
                  s"Triangles: endpoint ${if (ix < 0) arr(t) else u} absent " +
                    "from the edge dictionary collected one job earlier — " +
                    "the edge input drifted between jobs; persist the edge frame")
                aidx(t) = ix.toLong
                t += 1
              }
              var i = 0
              while (i < arr.length - 1) {
                val v = aidx(i)
                var lo = offs(v.toInt)
                val hi = offs(v.toInt + 1)
                var j = i + 1
                while (j < arr.length && lo < hi) {
                  val pw = es(lo) - v * Pack
                  if (pw < aidx(j)) lo += 1
                  else if (pw > aidx(j)) j += 1
                  else {
                    counts(uix) += 1; counts(v.toInt) += 1
                    counts(aidx(j).toInt) += 1
                    lo += 1; j += 1
                  }
                }
                i += 1
              }
            }
            Iterator.range(0, counts.length)
              .filter(counts(_) > 0L)
              .map(k => (dict(k), counts(k)))
          }.toDF("node", "c")
      } else {
        // three self-join legs read the oriented frame — persist it
        // here (the broadcast path has exactly one consumer and skips
        // the persist)
        val de = dirE.persistLedgered()
        de.as("e1").join(de.as("e2"), col("e1.w") === col("e2.u"))
          .join(de.as("e3"),
            col("e1.u") === col("e3.u") && col("e2.w") === col("e3.w"))
          .select(explode(array(col("e1.u"), col("e1.w"), col("e2.w")))
            .as("node"))
          .select(col("node"), lit(1L).as("c"))
      }
    // sum of per-task partials (broadcast path) ≡ count of corner rows
    // (join path) — both emit (node, c)
    corners.groupBy(col("node")).agg(sum(col("c")).as("n_triangles"))
  }
}
