package graft.operators

import graft.core.Caching.LedgerOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup cluster formation: connected components over a near-dup pair
  * graph, plus canonical-document selection.
  *
  * Pair emitters ([[Dedup.jaccardPairs]], [[Dedup.minHashLshPairs]],
  * [[Dedup.simHashPairs]], [[Dedup.cosinePairsLsh]]) produce edges; a
  * real dedup pass must then KEEP one document per transitive cluster —
  * A~B and B~C must drop two of three even when A~C was never emitted
  * (exactly the situation the LSH hot-bucket guard's representative
  * links create). The reference's own dedup is name-granular keep-first
  * (src/api/app.py:103-105); this is the content-granular, transitive
  * generalization.
  *
  * Scale design (100 TB posture):
  *  - iterative min-label propagation: per round, every node adopts the
  *    minimum label among itself and its neighbors. Rounds needed equal
  *    the graph eccentricity of each component's minimum node — for
  *    near-dup graphs components are quasi-cliques (or stars around a
  *    representative after the hot-bucket guard), so 2-4 rounds in
  *    practice; `maxIterations` bounds adversarial chains.
  *  - each round is two shuffles (neighbor-min aggregation + label
  *    join), all on the id key — no text or payload moves.
  *  - lineage is cut per round with `localCheckpoint` (on a real
  *    cluster, point `spark.sparkContext.setCheckpointDir` at durable
  *    storage and switch to `checkpoint` for executor-loss safety).
  *  - convergence is detected with a per-round `changed == 0` count —
  *    one tiny driver-side scalar per round, not a collect of labels.
  */
object Clusters {

  /** Connected components of the undirected graph given by
    * `pairs(idACol, idBCol)`. Returns one row per node that appears in
    * at least one pair: `(id, cluster_id)` with `cluster_id` = minimum
    * node id in the component. */
  def connectedComponents(pairs: DataFrame, idACol: String = "id_a",
                          idBCol: String = "id_b",
                          maxIterations: Int = 25,
                          localComputeMaxEdges: Long = 10000000L,
                          localComputeMaxNodes: Long = 1000000L): DataFrame = {
    require(maxIterations >= 1, "maxIterations must be positive")
    val fwd = pairs.select(col(idACol).as("src"), col(idBCol).as("dst"))
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpointLedgered()
    // LOCAL regime (r10, the Hits/PageRank/Bfs pattern): components of
    // a bounded pair graph resolve in one union-find pass over the
    // collected edges — bit-identical to the CONVERGED propagation
    // (cluster_id = min id per component is the fixpoint, not a
    // round-count artifact), without k join+checkpoint supersteps.
    // Gated to LONG ids and null-free edges (the generic distributed
    // plan keeps any orderable id type and its null topology); past
    // the guards the propagation below runs unchanged. One deliberate
    // divergence: an adversarial over-`maxIterations` chain RAISES on
    // the distributed path (un-converged labels would silently split
    // clusters) but the union-find is always converged, so it simply
    // returns the exact answer.
    val longIds = fwd.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    val st = edges.agg(count(lit(1)),
      count(when(col("src").isNull || col("dst").isNull, lit(1))),
      max(greatest(col("src"), col("dst"))),
      min(least(col("src"), col("dst")))).collect()(0)
    if (longIds && st.getLong(1) == 0 &&
        st.getLong(0) > 0 && st.getLong(0) <= localComputeMaxEdges) {
      // one packed-long collect + union-find over dense node indices
      // (r11, was Array[Row] + boxed HashMap — see LocalGraph's
      // primitive byte budget: ≈180 MB peak at the 10M-edge guard).
      // The dictionary is SORTED by id, so a smaller index IS a
      // smaller id and union-by-min-index = union-by-min-id. Any id
      // range (r12): out-of-bound ids take the dictionary pre-pass.
      val (packed, ids) = LocalGraph.collectIndexed(edges, "src", "dst",
        st.getLong(3), st.getLong(2))
      if (ids.length <= localComputeMaxNodes) {
        val parent = new Array[Int](ids.length)
        var i = 0
        while (i < ids.length) { parent(i) = i; i += 1 }
        def find(x0: Int): Int = {
          var x = x0
          while (parent(x) != x) {
            parent(x) = parent(parent(x)) // path halving
            x = parent(x)
          }
          x
        }
        i = 0
        while (i < packed.length) {
          // packed words are already dense indices (collectIndexed)
          val ra = find(LocalGraph.src(packed(i)).toInt)
          val rb = find(LocalGraph.dst(packed(i)).toInt)
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          i += 1
        }
        // canonical label = min id per component; union-by-min above
        // makes every root already the minimum of its component
        val out = new java.util.ArrayList[org.apache.spark.sql.Row](ids.length)
        i = 0
        while (i < ids.length) {
          out.add(org.apache.spark.sql.Row(ids(i), ids(find(i))))
          i += 1
        }
        import org.apache.spark.sql.types._
        return pairs.sparkSession.createDataFrame(out,
          StructType(Seq(
            StructField("id", LongType),
            StructField("cluster_id", LongType))))
      }
    }
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpointLedgered()
    var iter = 0
    var converged = false
    while (iter < maxIterations && !converged) {
      // min label among each node's neighbors, then fold in its own
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_min"))
      val hopped = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
      // pointer jumping: also adopt the CURRENT label of one's label
      // (labels map ids → component members ≤ themselves, so
      // label(label(x)) is in x's component and never larger) — the
      // min's reach roughly doubles per round instead of growing one
      // hop, turning path-diameter convergence into ~log rounds. One
      // extra |V|-row join per round; on chain-shaped components
      // (sequential entity names differ by single digit flips) this is
      // the difference between ~10 rounds and ~4.
      val next = hopped
        .join(labels.select(col("id").as("__lid"), col("label").as("__ll")),
          hopped("label") === col("__lid"), "left")
        .select(col("id"), col("old_label"),
          least(col("label"), coalesce(col("__ll"), col("label"))).as("label"))
        .localCheckpointLedgered()
      converged = next.filter(col("label") < col("old_label")).isEmpty
      // the superseded label snapshot is fully consumed by `next`'s
      // eager checkpoint — release its blocks now (the KCore/Bfs
      // per-round rule: peak storage O(2 rounds), not O(all rounds))
      graft.core.Caching.releaseCheckpoint(labels)
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    // loud, not silent: un-converged labels would split one true cluster
    // into several, and the dedup pass would then KEEP extra copies with
    // no signal anything went wrong (hitting the cap is otherwise
    // indistinguishable from convergence to the caller)
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $maxIterations rounds — " +
        "the graph has a label-propagation chain longer than the cap; " +
        "raise maxIterations (rounds needed = eccentricity of each component's minimum node)")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Canonical-document selection over a near-dup pair graph: every
    * document gets its `cluster_id` (itself when it appears in no pair)
    * and `keep` — true only for the cluster's canonical member, the
    * minimum id. Dropping `keep = false` rows is the dedup pass. */
  def canonicalize(docs: DataFrame, pairs: DataFrame, idCol: String,
                   maxIterations: Int = 25): DataFrame = {
    val cc = connectedComponents(pairs, maxIterations = maxIterations)
    docs.join(cc, docs(idCol) === cc("id"), "left")
      .select(docs("*"),
        coalesce(col("cluster_id"), docs(idCol)).as("cluster_id"))
      .withColumn("keep", col(idCol) === col("cluster_id"))
  }
}
