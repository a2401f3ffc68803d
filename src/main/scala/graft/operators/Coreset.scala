package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Farthest-point sampling (a30) — the greedy k-center coreset
  * selector (Gonzalez 1985, the 2-approximation): start from the
  * minimum id, then k−1 times pick the point FARTHEST from everything
  * chosen so far. The selected set is the classic diversity coreset a
  * training-data pipeline draws when it wants coverage rather than
  * volume — SemDeDup prunes redundancy pair-by-pair, this picks the
  * spanning skeleton directly — and the per-round max-min distance is
  * the coverage radius² trajectory (how much of embedding space each
  * additional pick buys).
  *
  * EXACT end to end: vectors quantize to 2²⁰ fixed point (the shared
  * [[Drift.quantize]]), distances are integer L2² (≤ 64·(2·2²⁰)² < 2⁴⁹
  * — BIGINT-safe), argmax ties break by minimum id — a total order
  * both engines replay, so the oracle re-derives every pick
  * relationally while this side splices each chosen vector as plan
  * literals.
  *
  * Scale posture: one corpus persist; each round is ONE scan-local
  * projection (the running min-distance folds the new centroid's
  * literal vector — no join, no shuffle) plus ONE bounded TakeOrdered
  * action returning a single row to the driver. k rounds = k bounded
  * actions over a persisted narrow frame; total scan work O(k·n·d)
  * (the round-r expression chains r `least` terms, but each term is a
  * literal-vector dot — still scan-local; callers with k ≫ 16 should
  * re-persist the running min every ~16 rounds). Cache lifetime:
  * released before return (the selection is the output; nothing lazy
  * escapes). */
object Coreset {

  /** (round, chosen_id, covered_r2): the pick sequence and, per round,
    * the max-min L2² (in 2⁴⁰-scale integer units) the pick closed —
    * round 0 is the seed (min id, radius undefined → 0). `k` caps at
    * the corpus size. */
  def farthestPointSample(vectors: DataFrame, idCol: String,
                          vecCol: String, k: Int,
                          localComputeMaxRows: Long = 200000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = vectors.sparkSession
    import spark.implicits._
    val base = vectors
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        Drift.quantize(vecCol).as("vq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val first = base.orderBy(col("id")).limit(1)
        .select(col("id"), col("vq")).collect()
      require(first.nonEmpty, "farthestPointSample needs a non-empty corpus")
      var chosenId = first(0).getLong(0)
      var chosenVq = first(0).getSeq[Long](1).toArray
      val picks = scala.collection.mutable.ArrayBuffer(
        (0, chosenId, 0L))
      val st = base.agg(count(lit(1)),
        count(when(col("id").isNull, lit(1)))).collect()(0)
      val n = st.getLong(0)
      // LOCAL regime (r10, the graph-fixpoint pattern applied to the
      // OTHER sequential-action shape): each distributed round is one
      // bounded TakeOrdered action, so k rounds pay k scheduling
      // round-trips for ~ms of integer arithmetic each. Below the row
      // guard, on null-free ids and uniform vector lengths, the greedy
      // runs over the collected quantized corpus with the SAME Long
      // L2² and (mind desc, id asc) tie order — the quantization
      // itself still runs IN the plan (we collect `base`), so both
      // regimes share every bit of the arithmetic.
      if (n <= localComputeMaxRows && st.getLong(1) == 0) {
        val all = base.collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
          .sortBy(_._1)
        val dim = all(0)._2.length
        if (all.forall(_._2.length == dim)) {
          def l2(a: Array[Long], b: Array[Long]): Long = {
            var dsum = 0L; var i = 0
            while (i < a.length) {
              val x = a(i) - b(i); dsum += x * x; i += 1
            }
            dsum
          }
          var chosen = all(0)._2 // seed = min id (all is id-sorted)
          val taken = new java.util.HashSet[Int](); taken.add(0)
          val mind = Array.fill(all.length)(Long.MaxValue)
          var r = 1
          val kk = math.min(k.toLong, n).toInt
          while (r < kk) {
            var best = -1
            var i = 0
            while (i < all.length) {
              if (!taken.contains(i)) {
                val d = l2(all(i)._2, chosen)
                if (d < mind(i)) mind(i) = d
                // ascending-id scan + strict > keeps the minimum id
                // among max-mind ties — the orderBy(desc, id) order
                if (best == -1 || mind(i) > mind(best)) best = i
              }
              i += 1
            }
            taken.add(best)
            chosen = all(best)._2
            picks += ((r, all(best)._1, mind(best)))
            r += 1
          }
          return picks.toSeq.toDF("round", "chosen_id", "covered_r2")
            .orderBy(col("round"))
        }
      }
      var mind = lit(Long.MaxValue)
      var r = 1
      while (r < math.min(k.toLong, n).toInt) {
        val cLit = chosenVq.mkString("array(", "L, ", "L)")
        // integer L2² against the just-chosen centroid's literal vector
        val dNew = graft.functions.GraftFunctions.sqDistLong(
          col("vq"), expr(cLit))
        mind = least(mind, dNew)
        val next = base
          // chosen points carry mind 0 and could only win on a fully
          // duplicated corpus — exclude them so even that degenerate
          // case picks fresh ids (the oracle replays the exclusion)
          .filter(!col("id").isInCollection(picks.map(_._2)))
          .select(col("id"), col("vq"), mind.as("mind"))
          .orderBy(col("mind").desc, col("id"))
          .limit(1)
          .collect()(0)
        chosenId = next.getLong(0)
        chosenVq = next.getSeq[Long](1).toArray
        picks += ((r, chosenId, next.getLong(2)))
        r += 1
      }
      picks.toSeq.toDF("round", "chosen_id", "covered_r2")
        .orderBy(col("round"))
    } finally base.unpersist()
  }
}
