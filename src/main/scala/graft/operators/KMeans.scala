package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column — the IVF coarse-quantizer
  * trainer (the `label`-column IVF in [[Similarity.ivfTopK]] becomes
  * self-sufficient: train lists, then probe them).
  *
  * Deterministic throughout: init picks the k vectors with the smallest
  * ids (stable under re-runs and task retries); assignment breaks
  * distance ties by centroid index. Each iteration is one broadcast of
  * the k×dim centroid matrix + one narrow assignment pass + one centroid
  * recomputation ([[Centroids.byGroupBy]]) — no quadratic anything, and
  * the per-iteration shuffle carries (cluster, dim, partial-sum) rows
  * only.
  *
  * Assignment scores ALL k centroids in one pass over a broadcast
  * matrix (single UDF, O(k·dim) per row) rather than k per-centroid
  * expression columns — k is bounded by broadcast size (k·dim doubles,
  * e.g. 4096 lists × 768 dims ≈ 25 MB), not by codegen limits, which
  * caps the old column-per-centroid form at O(100).
  */
object KMeans {

  /** Argmin over squared-L2 distances to a broadcast centroid matrix;
    * ties break toward the lower centroid index. One pass, all k. */
  private def argminCluster(df: DataFrame, vecCol: String,
                            centroids: Array[Array[Double]]): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    // boxed return so a null vector yields a null cluster (matching the
    // old expression pipeline's null propagation) instead of an NPE
    val f = udf { (v: Seq[Double]) =>
      if (v == null) null
      else {
        val cs = bc.value
        var best = 0
        var bestD = Double.MaxValue
        var i = 0
        while (i < cs.length) {
          val c = cs(i)
          var d = 0.0
          var j = 0
          val dim = math.min(c.length, v.length)
          while (j < dim) { val x = v(j) - c(j); d += x * x; j += 1 }
          if (d < bestD) { bestD = d; best = i }
          i += 1
        }
        Int.box(best)
      }
    }
    // asNondeterministic: the argmin IS pure, but downstream equi-joins
    // on the produced `cluster` column make InferFiltersFromConstraints
    // add isnotnull(cluster), and PushDownPredicates then substitutes
    // the WHOLE UDF into the pushed filter — the k·dim distance scan
    // runs twice per row (once in Filter, once in Project; r11 verdict,
    // PLANS.md a08/a36). Blocking pushdown keeps the null-guard above
    // the project, evaluating isnotnull on the already-computed column.
    f.asNondeterministic()(expr(s"transform($vecCol, x -> cast(x as double))"))
  }

  /** Train k centroids; returns (assignments DF (id, cluster), centroids
    * as local array indexed by cluster id). */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
          iterations: Int = 5): (DataFrame, Array[Array[Double]]) = {
    require(iterations >= 1, "k-means needs at least one iteration")
    // the trainer drives 1 + iterations actions over the same rows —
    // cache the 2-column projection once instead of re-scanning the
    // source per iteration (at 100 TB the input would be a sampled
    // training subset; the cache bounds to that subset, not the corpus).
    // Spread the subset across all cores: assignment is O(n·k·dim) CPU
    // and a small training file otherwise lands in ONE input partition,
    // serializing the whole fit. Results are partitioning-independent
    // (argmin is per-row pure; centroid means are exact decimal sums).
    val base = df.select(col(idCol), col(vecCol))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .cache()
    // deterministic init: the k smallest-id vectors; with fewer than k
    // rows the effective k shrinks to the row count
    var centroids: Array[Array[Double]] = base
      .orderBy(col(idCol)).limit(k)
      .select(expr(s"transform($vecCol, x -> cast(x as double))"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(centroids.nonEmpty, "k-means needs a non-empty input")

    var assigned: DataFrame = null
    var iter = 0
    while (iter < iterations) {
      assigned = base
        .select(col(idCol), col(vecCol),
          argminCluster(base, vecCol, centroids).as("cluster"))
      val newCentroids = Centroids.byGroupBy(assigned, "cluster", vecCol)
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // empty clusters keep their previous centroid
      centroids = centroids.zipWithIndex.map { case (old, i) => newCentroids.getOrElse(i, old) }
      iter += 1
    }
    // lazy unpersist: later evaluations of `assigned` recompute from the
    // source, which stays correct (assignment is a pure function of the
    // returned centroids)
    base.unpersist(false)
    (assigned.select(col(idCol), col("cluster")), centroids)
  }

  /** Assign an arbitrary dataframe to the trained lists (for IVF probe). */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             centroids: Array[Array[Double]]): DataFrame =
    df.select(col(idCol), col(vecCol),
      argminCluster(df, vecCol, centroids).as("cluster"))

  /** Fixed-point exact assignment (the a14/d12 engine-exact pattern):
    * vectors are quantized to `scale`-scaled BIGINTs and the squared-L2
    * argmin against pre-quantized centroids runs in pure integer
    * arithmetic with index tiebreak — bit-replayable by a SQL twin
    * holding the `centroidsQ` literals, with no float-summation-order
    * hazard. [[assign]] remains the double-precision production
    * surface. */
  def assignExact(df: DataFrame, idCol: String, vecCol: String,
                  centroidsQ: Array[Array[Long]],
                  scale: Long = 1L << 20): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(centroidsQ)
    val f = udf { (vq: Seq[Long]) =>
      if (vq == null) null
      else {
        val cs = bc.value
        var best = 0
        var bestD = Long.MaxValue
        var i = 0
        while (i < cs.length) {
          val c = cs(i)
          var d = 0L
          var j = 0
          val dim = math.min(c.length, vq.length)
          while (j < dim) { val x = vq(j) - c(j); d += x * x; j += 1 }
          if (d < bestD) { bestD = d; best = i }
          i += 1
        }
        Int.box(best)
      }
    }
    // asNondeterministic for the same reason as [[argminCluster]]: the
    // function is pure, but without it the join null-guard duplicates
    // the k-way integer distance scan below the Project (r11 verdict —
    // a08/a36 paid the k=256 scan twice per corpus row).
    df.select(col(idCol), col(vecCol),
      f.asNondeterministic()(quantized(vecCol, scale)).as("cluster"))
  }

  /** [[assignExact]] that ALSO returns the winning squared distance as
    * `r2` (r13): a36 re-derived it downstream with a centroid join plus
    * an interpreted `aggregate(zip_with(...))` per row — but the argmin
    * scan already holds bestD when it picks the cluster. Same
    * quantization, same tiebreak; r2 ≡ the distance the join+HOF form
    * recomputed, bit-exactly (integer arithmetic). */
  def assignExactWithDist(df: DataFrame, idCol: String, vecCol: String,
                          centroidsQ: Array[Array[Long]],
                          scale: Long = 1L << 20): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(centroidsQ)
    val f = udf { (vq: Seq[Long]) =>
      if (vq == null) null
      else {
        val cs = bc.value
        var best = 0
        var bestD = Long.MaxValue
        var i = 0
        while (i < cs.length) {
          val c = cs(i)
          var d = 0L
          var j = 0
          val dim = math.min(c.length, vq.length)
          while (j < dim) { val x = vq(j) - c(j); d += x * x; j += 1 }
          if (d < bestD) { bestD = d; best = i }
          i += 1
        }
        (best, bestD)
      }
    }
    df.select(col(idCol), col(vecCol),
        f.asNondeterministic()(quantized(vecCol, scale)).as("__a"))
      .select(col(idCol), col(vecCol),
        col("__a._1").as("cluster"), col("__a._2").as("r2"))
  }

  /** Fixed-point multi-probe: each row explodes to its `p` nearest
    * lists by (integer distance, index) — [[assignTopP]] made
    * engine-exact the same way as [[assignExact]]. */
  def assignTopPExact(df: DataFrame, idCol: String, vecCol: String,
                      centroidsQ: Array[Array[Long]], p: Int,
                      scale: Long = 1L << 20): DataFrame = {
    require(p >= 1, "probe count must be >= 1")
    val bc = df.sparkSession.sparkContext.broadcast(centroidsQ)
    val pp = p
    val f = udf { (vq: Seq[Long]) =>
      if (vq == null) null
      else {
        val cs = bc.value
        cs.indices.map { i =>
          val c = cs(i)
          var d = 0L
          var j = 0
          val dim = math.min(c.length, vq.length)
          while (j < dim) { val x = vq(j) - c(j); d += x * x; j += 1 }
          (d, i)
        }.sorted.take(math.min(pp, cs.length)).map(_._2).toArray
      }
    }
    df.select(col(idCol), col(vecCol),
      explode_outer(f(quantized(vecCol, scale))).as("cluster"))
  }

  /** The vector quantization both exact paths and their SQL twins use:
    * round(x·scale) as BIGINT, via the SQL round() so the rounding mode
    * cannot drift across engines. */
  private def quantized(vecCol: String, scale: Long): Column =
    expr(s"transform($vecCol, x -> cast(round(cast(x as double) * $scale, 0) as bigint))")

  /** Multi-probe assignment: each row explodes to its `p` NEAREST lists
    * (distance order, index tiebreak). Probing several lists is how real
    * IVF trades compute for recall — a query near a list boundary finds
    * neighbors that fell just across it. `p = centroids.length`
    * degenerates to exact brute force over all lists. */
  def assignTopP(df: DataFrame, idCol: String, vecCol: String,
                 centroids: Array[Array[Double]], p: Int): DataFrame = {
    require(p >= 1, "probe count must be >= 1")
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val pp = p
    val f = udf { (v: Seq[Double]) =>
      if (v == null) null
      else {
        val cs = bc.value
        // (distance, index) sorted ascending; ties break toward the
        // lower index — consistent with argminCluster for p = 1
        cs.indices.map { i =>
          val c = cs(i)
          var d = 0.0
          var j = 0
          val dim = math.min(c.length, v.length)
          while (j < dim) { val x = v(j) - c(j); d += x * x; j += 1 }
          (d, i)
        }.sorted.take(math.min(pp, cs.length)).map(_._2).toArray
      }
    }
    // explode_outer: a null-vector row survives with a null cluster,
    // matching assign()'s contract (plain explode would drop the row)
    df.select(col(idCol), col(vecCol),
      explode_outer(f(expr(s"transform($vecCol, x -> cast(x as double))"))).as("cluster"))
  }
}
