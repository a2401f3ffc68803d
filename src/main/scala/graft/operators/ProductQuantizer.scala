package graft.operators

import graft.core.Caching.LedgerOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for billion-scale ANN (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — the FAISS
  * IVF-PQ compression leg): the vector space splits into `m` subspaces,
  * each with its own k-means codebook; a corpus vector is stored as `m`
  * small codes (m bytes at k ≤ 256) instead of dim·4 float bytes, and a
  * query scores a code list with `m` table lookups (asymmetric distance
  * computation — query stays exact, corpus is quantized).
  *
  * Scale design (100 TB posture):
  *  - training runs ONE Lloyd's job per iteration for ALL m codebooks
  *    (rows explode to (id, subspace, subvector); assignment is a
  *    broadcast argmin; centroid updates aggregate on (subspace, code) —
  *    m·k keys, exact decimal means via [[Centroids.byGroupBy]], so the
  *    model is bit-reproducible regardless of partitioning);
  *  - encoding is scan-local (one UDF pass, broadcast codebooks);
  *  - ADC scoring never touches corpus vectors: the per-query lookup
  *    table (m·k doubles) rides in the broadcast query row, the score is
  *    m codegen'd element_at terms, and survivors flow through the
  *    bounded-heap [[graft.plans.TopKPerKey]] prune — the shuffle
  *    carries ≤ k·|queries|·|partitions| rows of (ids, distance), with
  *    the corpus read at ~dim·4/m× compression.
  */
object ProductQuantizer {

  /** Trained model: `codebooks(sub)(code)` is a subDim-length centroid. */
  final case class Model(m: Int, k: Int, subDim: Int,
                         codebooks: Array[Array[Array[Double]]])

  private def asDouble(vecCol: String): Column =
    expr(s"transform($vecCol, x -> cast(x as double))")

  /** Squared L2 between a subvector and a codebook row. */
  private def sqDist(v: Seq[Double], off: Int, c: Array[Double]): Double = {
    var d = 0.0
    var j = 0
    while (j < c.length) { val x = v(off + j) - c(j); d += x * x; j += 1 }
    d
  }

  /** Argmin code for one subvector (ties break to the lower code —
    * consistent with [[KMeans.argminCluster]]). */
  private def argminCode(v: Seq[Double], off: Int, book: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < book.length) {
      val d = sqDist(v, off, book(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Train `m` sub-codebooks of `k` centroids each. Deterministic init
    * (the k smallest-id vectors, sliced per subspace); empty cells keep
    * their previous centroid. Requires the dimension to divide by m. */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
          m: Int, k: Int, iterations: Int = 2): Model = {
    require(m >= 1 && k >= 1 && iterations >= 1, "m, k, iterations must be positive")
    val spark = vectors.sparkSession
    // LOCAL REGIME (r13, the KMeans.fit twin — see
    // KMeans.localFitMaxValues): at training-subset size the
    // per-iteration explode/assign/centroid job chain is pure
    // scheduling overhead (2000×64 doubles measured 6.6 s WARM); below
    // the value cap the null-filtered projection collects once
    // (bounded CollectLimit) and the subspace Lloyd's runs locally
    // with bit-identical arithmetic (PqSpec pins regime equality).
    val integralId = vectors.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    if (integralId) {
      val projAll = vectors
        .filter(col(vecCol).isNotNull)
        .select(col(idCol).cast("long").as("__id"), asDouble(vecCol).as("__v"))
      val dimRow = projAll.select(size(col("__v"))).limit(1).collect()
      val dim0 = if (dimRow.isEmpty) 1 else math.max(1, dimRow(0).getInt(0))
      val capRows = math.max(1L, KMeans.localFitMaxValues(spark) / dim0)
      if (capRows <= Int.MaxValue) {
        val head = projAll.limit(capRows.toInt + 1).collect()
        // null ids fall through to the distributed path (r13 advice #2:
        // getLong(0) NPE'd here where the distributed orderBy/limit
        // tolerated null ids — the KMeans.fit guard's twin)
        if (head.length <= capRows && head.forall(!_.isNullAt(0))) {
          val rows = head.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
            .sortBy(_._1)
          if (rows.nonEmpty && rows.forall(_._2.length == rows(0)._2.length))
            return fitLocal(rows.map(_._2), m, k, iterations)
        }
      }
    }
    val base = vectors
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), asDouble(vecCol).as("v"))
      .repartition(spark.sparkContext.defaultParallelism)
      .cache()
    val initRows = base.orderBy(col("id")).limit(k)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    require(initRows.nonEmpty, "product quantizer needs a non-empty input")
    // fewer vectors than codes: the effective k shrinks to the row
    // count, the KMeans.fit convention — with the nominal k, the
    // codebook rebuild below indexed codebooks(s)(c) for never-seeded
    // codes c >= |rows| and crashed (r9 review). The returned Model
    // carries the effective k, so every downstream ADC table/encode
    // sizes itself consistently.
    val ke = math.min(k, initRows.length)
    val dim = initRows.head.length
    require(dim % m == 0, s"dimension $dim must divide into $m subspaces")
    val subDim = dim / m
    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => initRows.map(_.slice(s * subDim, (s + 1) * subDim)))
    // one row per (vector, subspace): the SINGLE per-iteration job below
    // trains every codebook at once
    val exploded = base.select(col("id"),
      posexplode(expr(s"transform(sequence(0, ${m - 1}), s -> slice(v, s * $subDim + 1, $subDim))")))
      .select(col("id"), col("pos").as("sub"), col("col").as("sv"))
    var iter = 0
    while (iter < iterations) {
      val bc = spark.sparkContext.broadcast(codebooks)
      val assignUdf = udf { (sub: Int, sv: Seq[Double]) =>
        argminCode(sv, 0, bc.value(sub))
      }
      val assigned = exploded.withColumn("code", assignUdf(col("sub"), col("sv")))
        .withColumn("grp", col("sub") * ke + col("code"))
      val updated = Centroids.byGroupBy(assigned, "grp", "sv")
        .collect().map(r => r.getAs[Number]("grp").intValue() ->
          r.getSeq[Double](1).toArray).toMap
      codebooks = Array.tabulate(m)(s =>
        Array.tabulate(ke)(c => updated.getOrElse(s * ke + c, codebooks(s)(c))))
      iter += 1
    }
    base.unpersist(false)
    Model(m, ke, subDim, codebooks)
  }

  /** Driver-side subspace Lloyd's — [[fit]]'s local regime over the
    * id-sorted collected projection: same init (k smallest ids, sliced
    * per subspace), same per-subspace integer argmin with low-code
    * tie-break, same per-(subspace, code, dim) decimal(28,10)-quantized
    * exact sums / counts / double division / 9-digit HALF_UP round as
    * [[Centroids.byGroupBy]], empty cells keep their previous
    * centroid. Vectors must be uniform-length (caller-guarded). */
  private def fitLocal(vecs: Array[Array[Double]], m: Int, k: Int,
                       iterations: Int): Model = {
    val ke = math.min(k, vecs.length)
    val dim = vecs(0).length
    require(dim % m == 0, s"dimension $dim must divide into $m subspaces")
    val subDim = dim / m
    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => vecs.take(ke).map(_.slice(s * subDim, (s + 1) * subDim)))
    var iter = 0
    while (iter < iterations) {
      val sums = Array.ofDim[java.math.BigDecimal](m * ke, subDim)
      val cnts = Array.ofDim[Long](m * ke, subDim)
      vecs.foreach { v =>
        var s = 0
        while (s < m) {
          val code = argminCode(v, s * subDim, codebooks(s))
          val grp = s * ke + code
          var j = 0
          while (j < subDim) {
            val q = KMeans.dec10(v(s * subDim + j))
            sums(grp)(j) = if (sums(grp)(j) == null) q else sums(grp)(j).add(q)
            cnts(grp)(j) += 1
            j += 1
          }
          s += 1
        }
      }
      codebooks = Array.tabulate(m)(s => Array.tabulate(ke) { c =>
        val grp = s * ke + c
        if (cnts(grp)(0) == 0) codebooks(s)(c)
        else Array.tabulate(subDim)(j =>
          KMeans.round9(sums(grp)(j).doubleValue() / cnts(grp)(j).toDouble))
      })
      iter += 1
    }
    Model(m, ke, subDim, codebooks)
  }

  /** Encode every vector as its `m` nearest sub-codes — one scan-local
    * UDF pass, broadcast codebooks. Output: (id, codes: array<int>). */
  def encode(vectors: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val bc = vectors.sparkSession.sparkContext.broadcast(model.codebooks)
    val subDim = model.subDim
    val codeUdf = udf { (v: Seq[Double]) =>
      if (v == null) null
      else {
        val books = bc.value
        Array.tabulate(books.length)(s => argminCode(v, s * subDim, books(s)))
      }
    }
    vectors
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), codeUdf(asDouble(vecCol)).as("codes"))
  }

  /** Flat ADC lookup table for one exact query vector:
    * `table(sub·k + code)` = squared L2 between the query's subvector
    * and that codebook centroid. */
  def adcTable(q: Array[Double], model: Model): Array[Double] = {
    val t = new Array[Double](model.m * model.k)
    var s = 0
    while (s < model.m) {
      var c = 0
      while (c < model.k) {
        t(s * model.k + c) = sqDist(q.toSeq, s * model.subDim, model.codebooks(s)(c))
        c += 1
      }
      s += 1
    }
    t
  }

  /** Asymmetric-distance top-k: exact queries against the PQ-encoded
    * corpus. Query tables are built on the driver (the query set is
    * small by the same contract that lets it broadcast) and ride in the
    * broadcast join; the per-row score is `m` static element_at terms —
    * codegen'd, no HOF, no corpus vector access. Output:
    * (query_id, neighbor_id, adc_dist, rank), rank by (distance asc,
    * neighbor_id) — a total order for determinism. */
  def adcTopK(queries: DataFrame, encodedCorpus: DataFrame, model: Model,
              idCol: String, vecCol: String, topK: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qTables = queries
      .select(col(idCol).cast("long").as("query_id"), asDouble(vecCol).as("qv"))
      .collect()
      .map(r => (r.getLong(0), adcTable(r.getSeq[Double](1).toArray, model)))
      .toSeq
    val qDf = qTables.toDF("query_id", "table")
    val scored = encodedCorpus
      .select(col("id").as("neighbor_id"), col("codes"))
      .join(broadcast(qDf), col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", round(
        (0 until model.m)
          .map(s => element_at(col("table"),
            lit(s * model.k) + element_at(col("codes"), s + 1) + 1))
          .reduce(_ + _), 6))
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id"))
    // bounded-heap prune keys on the NEGATED distance (the operator
    // keeps top scores; nearest = greatest negative distance)
    graft.plans.TopKPerKey.prune(
        scored.withColumn("neg_dist", -col("adc_dist")),
        "query_id", "neg_dist", "neighbor_id", topK)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"), col("rank"))
  }

  /** The full FAISS-style search: ADC over the compressed corpus
    * shortlists `shortlist` candidates per query (the pass that touches
    * 100% of the data — at ~dim·4/m× less IO than exact search), then
    * an EXACT cosine re-rank touches only the shortlist members' full
    * vectors (`shortlist`·|queries| rows — negligible). Raw ADC
    * recall@k is bounded by quantization error; the refine step is what
    * buys exact-grade precision at compressed-scan cost (measured on
    * the test corpus: 0.3 raw → 0.94 refined @ shortlist 100).
    * Output matches [[Similarity.bruteForceTopK]]:
    * (query_id, neighbor_id, score, rank) by (cosine desc, id). */
  /** The COMPLETE FAISS IVF-PQ shape: a coarse k-means quantizer routes
    * vectors to inverted lists, PQ encodes the RESIDUAL (v − centroid —
    * residuals cluster tighter than raw vectors, so the same codebook
    * budget buys less quantization error), queries probe their `nprobe`
    * nearest lists only, ADC scores ride per-(query, list) tables built
    * on the query's residual against that list's centroid, and an exact
    * cosine refine touches only shortlist members.
    *
    * Scale posture: the corpus is scanned for training (bounded sample
    * at real scale), once for encode, and once per search — the search
    * scan touches only probed lists (`nprobe/coarseK` of the data) at
    * PQ-compressed width; candidate pruning goes through the
    * bounded-heap [[graft.plans.TopKPerKey]] operator; the per-(query,
    * list) tables broadcast (|queries|·nprobe·m·k doubles).
    *
    * Output matches [[Similarity.bruteForceTopK]]:
    * (query_id, neighbor_id, score, rank) by (cosine desc, id). */
  def ivfAdcTopKRefined(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String,
                        coarseK: Int, nprobe: Int, m: Int, k: Int,
                        iterations: Int, shortlist: Int, topK: Int,
                        persistResid: Boolean = true): DataFrame = {
    require(nprobe >= 1 && nprobe <= coarseK, "need 1 <= nprobe <= coarseK")
    require(shortlist >= topK, "shortlist must be at least topK")
    val spark = corpus.sparkSession
    import spark.implicits._
    // 1. coarse quantizer + list assignment
    val (_, cents) = KMeans.fit(corpus, idCol, vecCol, coarseK, iterations)
    val assigned = KMeans.assign(corpus, idCol, vecCol, cents)
    // 2. residual vectors, scan-local against the broadcast centroids
    val bcCents = spark.sparkContext.broadcast(cents)
    val residUdf = udf { (v: Seq[Double], cl: Int) =>
      if (v == null) null
      else {
        val c = bcCents.value(cl)
        Array.tabulate(v.length)(i => v(i) - (if (i < c.length) c(i) else 0.0))
      }
    }
    // persist: the residual stream feeds the PQ trainer, the encode
    // pass, AND the cluster join-back (encode drops the cluster column)
    // — unpersisted, the corpus scan + assignment + residual UDFs would
    // re-run for each. Repeated-invocation callers pass
    // persistResid=false (the sequencePack persistToks convention:
    // per-call cache entries accumulate until unpersist).
    val residRaw = assigned.select(col(idCol).as("id"), col("cluster"),
      residUdf(asDouble(vecCol), col("cluster")).as("rv"))
    val resid =
      if (persistResid)
        residRaw.persistLedgered()
      else residRaw
    // 3. ONE residual codebook pooled across lists (the FAISS default)
    val model = fit(resid, "id", "rv", m, k, iterations)
    val codes = encode(resid, "id", "rv", model)
      .join(resid.select(col("id"), col("cluster")), "id")
    // 4. per-(query, probed list) ADC tables on the query's residual
    val qRows = queries
      .select(col(idCol).cast("long").as("query_id"), asDouble(vecCol).as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qTables = qRows.flatMap { case (qid, qv) =>
      val byDist = cents.indices.map { li =>
        val c = cents(li)
        var d = 0.0; var j = 0
        while (j < math.min(c.length, qv.length)) {
          val x = qv(j) - c(j); d += x * x; j += 1
        }
        (d, li)
      }.sorted.take(nprobe)
      byDist.map { case (_, li) =>
        val c = cents(li)
        val qr = Array.tabulate(qv.length)(i =>
          qv(i) - (if (i < c.length) c(i) else 0.0))
        (qid, li, adcTable(qr, model))
      }
    }.toSeq
    val qDf = qTables.toDF("query_id", "cluster", "table")
    // 5. ADC over probed lists only — the join key IS the list id
    val scored = codes
      .join(broadcast(qDf), Seq("cluster"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("adc_dist", round(
        (0 until model.m)
          .map(s => element_at(col("table"),
            lit(s * model.k) + element_at(col("codes"), s + 1) + 1))
          .reduce(_ + _), 6))
      .select(col("query_id"), col("id").as("neighbor_id"), col("adc_dist"))
    val candidates = graft.plans.TopKPerKey.prune(
        scored.withColumn("neg_dist", -col("adc_dist")),
        "query_id", "neg_dist", "neighbor_id", shortlist)
      .select(col("query_id"), col("neighbor_id"))
    // 6. exact refine on the shortlist
    val q = queries.select(col(idCol).as("query_id"), asDouble(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(vecCol).as("cv"))
    val refined = candidates
      .join(c, "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("score", round(Similarity.cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    refined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  def adcTopKRefined(queries: DataFrame, encodedCorpus: DataFrame,
                     corpus: DataFrame, model: Model,
                     idCol: String, vecCol: String,
                     shortlist: Int, topK: Int): DataFrame = {
    require(shortlist >= topK, "shortlist must be at least topK")
    val candidates = adcTopK(queries, encodedCorpus, model, idCol, vecCol, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(vecCol).as("cv"))
    // shortlist join first (shrinks the corpus side to the candidates),
    // then the tiny broadcast of exact query vectors
    val scored = candidates
      .join(c, "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("score", round(Similarity.cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  // ------------------------------------------------------------------
  // Engine-exact (fixed-point) surfaces — the a14/d12 oracle pattern.
  // Training stays double-precision; encode and ADC run in pure integer
  // arithmetic against 2^20-quantized codebooks, so a SQL twin holding
  // the quantized literals replays shortlists bit-for-bit. ADC values
  // are bounded by dim·(2^22)^2 ≈ 2^50 < 2^53, so even a double-keyed
  // heap prune compares them exactly.
  // ------------------------------------------------------------------

  /** Codebooks quantized for the exact paths: round(c·scale) as BIGINT,
    * done once on the driver and spliced into the oracle as literals. */
  def quantizeModel(model: Model, scale: Long = 1L << 20): Array[Array[Array[Long]]] =
    model.codebooks.map(_.map(_.map(x => math.round(x * scale.toDouble))))

  /** round(v·scale) as BIGINT via the SQL round(), so the rounding mode
    * matches the oracle's by construction. */
  private def quantizedCol(vecCol: String, scale: Long): Column =
    expr(s"transform($vecCol, x -> cast(round(cast(x as double) * $scale, 0) as bigint))")

  /** [[encode]] in fixed point: per-subspace integer argmin (ties to
    * the lower code) over the quantized codebooks. */
  def encodeExact(vectors: DataFrame, idCol: String, vecCol: String,
                  booksQ: Array[Array[Array[Long]]],
                  scale: Long = 1L << 20): DataFrame = {
    val bc = vectors.sparkSession.sparkContext.broadcast(booksQ)
    val subDim = booksQ(0)(0).length
    val codeUdf = udf { (vq: Seq[Long]) =>
      if (vq == null) null
      else {
        val books = bc.value
        Array.tabulate(books.length) { s =>
          var best = 0
          var bestD = Long.MaxValue
          var c = 0
          while (c < books(s).length) {
            val cb = books(s)(c)
            var d = 0L
            var j = 0
            while (j < cb.length) { val x = vq(s * subDim + j) - cb(j); d += x * x; j += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          best
        }
      }
    }
    vectors
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), codeUdf(quantizedCol(vecCol, scale)).as("codes"))
  }

  /** [[adcTopKRefined]] in fixed point: integer ADC shortlist (the
    * query tables are integer squared distances from the quantized
    * query subvectors to the quantized codebooks), exact cosine refine.
    * Returns the result plus the quantized codebooks for the oracle
    * splice. */
  def adcTopKRefinedExact(queries: DataFrame, corpus: DataFrame, model: Model,
                          idCol: String, vecCol: String,
                          shortlist: Int, topK: Int,
                          scale: Long = 1L << 20): (DataFrame, Array[Array[Array[Long]]]) = {
    require(shortlist >= topK, "shortlist must be at least topK")
    val spark = corpus.sparkSession
    import spark.implicits._
    val booksQ = quantizeModel(model, scale)
    val codes = encodeExact(corpus, idCol, vecCol, booksQ, scale)
    val qRows = queries
      .select(col(idCol).cast("long").as("query_id"),
        quantizedCol(vecCol, scale).as("vq"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val qTables = qRows.map { case (qid, vq) =>
      val t = new Array[Long](model.m * model.k)
      var s = 0
      while (s < model.m) {
        var c = 0
        while (c < model.k) {
          val cb = booksQ(s)(c)
          var d = 0L
          var j = 0
          while (j < cb.length) { val x = vq(s * model.subDim + j) - cb(j); d += x * x; j += 1 }
          t(s * model.k + c) = d
          c += 1
        }
        s += 1
      }
      (qid, t)
    }.toSeq
    val qDf = qTables.toDF("query_id", "table")
    val scored = codes
      .select(col("id").as("neighbor_id"), col("codes"))
      .join(broadcast(qDf), col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist",
        (0 until model.m)
          .map(s => element_at(col("table"),
            lit(s * model.k) + element_at(col("codes"), s + 1) + 1))
          .reduce(_ + _))
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id"))
    // negated BIGINT distance: TopKPerKey keeps top scores under the
    // native long ordering, so the integer shortlist is exact at any
    // magnitude (no double-widening bound)
    val candidates = graft.plans.TopKPerKey.prune(
        scored.withColumn("neg_dist", -col("adc_dist")),
        "query_id", "neg_dist", "neighbor_id", shortlist)
      .withColumn("rn", row_number().over(ws))
      .filter(col("rn") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(vecCol).as("cv"))
    val refined = candidates
      .join(c, "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("score", round(Similarity.cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    (refined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank")),
     booksQ)
  }

  /** [[ivfAdcTopKRefined]] in fixed point: the coarse assignment, the
    * residuals (computed by exact integer subtraction in the
    * `scale`-scaled space — no second rounding), the PQ encode, and the
    * ADC shortlist all run in integer arithmetic. The PQ TRAINER runs
    * on the scaled-integer residuals cast to double (scaling every
    * input by one constant leaves Lloyd's geometry unchanged) and its
    * codebooks round to integers in the same scaled space, so a SQL
    * twin holding the quantized coarse centroids + codebooks replays
    * list routing, residual encoding, and the shortlist bit-for-bit.
    * Returns (result, quantized coarse centroids, quantized codebooks)
    * for the oracle splice. */
  def ivfAdcTopKRefinedExact(queries: DataFrame, corpus: DataFrame,
                             idCol: String, vecCol: String,
                             coarseK: Int, nprobe: Int, m: Int, k: Int,
                             iterations: Int, shortlist: Int, topK: Int,
                             scale: Long = 1L << 20,
                             persistResid: Boolean = true)
      : (DataFrame, Array[Array[Long]], Array[Array[Array[Long]]]) = {
    // fail fast on bad search params BEFORE paying for training
    require(nprobe >= 1 && nprobe <= coarseK, "need 1 <= nprobe <= coarseK")
    require(shortlist >= topK, "shortlist must be at least topK")
    val model =
      fitIvfPqExact(corpus, idCol, vecCol, coarseK, m, k, iterations, scale)
    val df = searchIvfPqExact(queries, corpus, idCol, vecCol, model,
      nprobe, shortlist, topK, persistResid)
    (df, model.centsQ, model.booksQ)
  }

  /** A trained IVF-PQ index model in the `scale`-quantized integer
    * space: coarse centroids + residual codebooks. [[fitIvfPqExact]] is
    * deterministic in (corpus, params), so a model is memoizable and
    * shareable across queries evaluating the same parameters (see
    * `graft.queries.ModelCache`) — in production the index is trained
    * once and served many times, never retrained per query. */
  final case class IvfPqModel(centsQ: Array[Array[Long]],
                              booksQ: Array[Array[Array[Long]]],
                              subDim: Int, m: Int, k: Int, scale: Long)

  /** Corpus residuals vs their quantized coarse centroid — exact
    * integer subtraction in the scaled space (no second rounding).
    * Output: (id, cluster, rvq: array<bigint>). */
  private def residualFrame(corpus: DataFrame, idCol: String,
                            vecCol: String, centsQ: Array[Array[Long]],
                            scale: Long): DataFrame = {
    val assigned = KMeans.assignExact(corpus, idCol, vecCol, centsQ, scale)
    val bcCents = corpus.sparkSession.sparkContext.broadcast(centsQ)
    val residUdf = udf { (vq: Seq[Long], cl: java.lang.Integer) =>
      if (vq == null || cl == null) null
      else {
        val c = bcCents.value(cl)
        Array.tabulate(vq.length)(i => vq(i) - (if (i < c.length) c(i) else 0L))
      }
    }
    assigned.select(col(idCol).as("id"), col("cluster"),
      residUdf(quantizedCol(vecCol, scale), col("cluster")).as("rvq"))
  }

  /** [[fitIvfPqExact]] that KEEPS the residual frame persisted and
    * returns it: a same-session search over the SAME corpus can reuse
    * it and skip one corpus encode pass (the a15 cold path's one
    * redundancy after the train/search split). The returned resid is
    * (id, cluster, rvq) — exactly [[searchIvfPqSweepExact]]'s
    * `precomputedResid` shape; eviction is harmless (the plan
    * recomputes deterministically). */
  def fitIvfPqExactWithResid(corpus: DataFrame, idCol: String, vecCol: String,
                             coarseK: Int, m: Int, k: Int, iterations: Int,
                             scale: Long = 1L << 20)
      : (IvfPqModel, DataFrame) = {
    val (_, cents) = KMeans.fit(corpus, idCol, vecCol, coarseK, iterations)
    val centsQ = cents.map(_.map(x => math.round(x * scale.toDouble)))
    val resid = residualFrame(corpus, idCol, vecCol, centsQ, scale)
      .persistLedgered()
    val model = fit(resid, "id", "rvq", m, k, iterations)
    val booksQ = model.codebooks.map(_.map(_.map(x => math.round(x))))
    (IvfPqModel(centsQ, booksQ, model.subDim, m, k, scale), resid)
  }

  /** Recompute the residual frame for an ALREADY-TRAINED model — the
    * serve-side twin of [[fitIvfPqExactWithResid]]'s returned frame:
    * a JVM that loaded the model from a cross-JVM store (rather than
    * training it) derives bit-identical residuals with one corpus
    * encode pass (centsQ/scale round-trip exactly as longs, and the
    * assignment + subtraction are integer-deterministic). Output:
    * (id, cluster, rvq) — [[searchIvfPqSweepExact]]'s
    * `precomputedResid` shape; NOT persisted (caller decides). */
  def residualsFor(corpus: DataFrame, idCol: String, vecCol: String,
                   model: IvfPqModel): DataFrame =
    residualFrame(corpus, idCol, vecCol, model.centsQ, model.scale)

  /** Train the IVF-PQ model only: coarse k-means, then residual PQ in
    * the quantized space. The residual frame is persisted for the
    * trainer's scans and released before returning — the encoded corpus
    * is [[searchIvfPqExact]]'s job (per-search cost), the model is the
    * once-per-parameter-set artifact. */
  def fitIvfPqExact(corpus: DataFrame, idCol: String, vecCol: String,
                    coarseK: Int, m: Int, k: Int, iterations: Int,
                    scale: Long = 1L << 20): IvfPqModel = {
    val (model, resid) = fitIvfPqExactWithResid(
      corpus, idCol, vecCol, coarseK, m, k, iterations, scale)
    resid.unpersist(false)
    model
  }

  /** IVF-PQ search against a pre-trained [[IvfPqModel]]: encode the
    * corpus residuals (the per-search index-build cost), probe each
    * query's `nprobe` nearest lists with integer ADC tables, exact
    * cosine refine of the shortlist. Bit-identical to the combined
    * [[ivfAdcTopKRefinedExact]] for a model trained on `corpus` with
    * the same params. One-leg [[searchIvfPqSweepExact]] — a single
    * shared body, so a tie-break or ADC fix can never diverge between
    * the single and sweep forms. */
  def searchIvfPqExact(queries: DataFrame, corpus: DataFrame,
                       idCol: String, vecCol: String, model: IvfPqModel,
                       nprobe: Int, shortlist: Int, topK: Int,
                       persistResid: Boolean = true,
                       precomputedResid: Option[DataFrame] = None,
                       precomputedCodes: Option[DataFrame] = None): DataFrame =
    searchIvfPqSweepExact(queries, corpus, idCol, vecCol, model,
      Seq(nprobe), shortlist, topK, persistResid, precomputedResid,
      precomputedCodes).drop("nprobe")

  /** The encoded-corpus POSTINGS of an IVF-PQ index: (id, cluster,
    * codes) — one row per vector, the stored form a vector store
    * persists next to the model (the [[graft.operators.IndexStore]]
    * postings artifact). `resid` is the (id, cluster, rvq) residual
    * frame of the corpus under THIS model's centroids (the trainer's —
    * see [[fitIvfPqExactWithResid]]). Deterministic in (corpus,
    * model), so a served search over stored postings is bit-identical
    * to one that re-encodes ([[searchIvfPqSweepExact]] uses the exact
    * same encode). */
  def encodeIvfPqPostings(resid: DataFrame, model: IvfPqModel): DataFrame =
    encodeExact(resid, "id", "rvq", model.booksQ, scale = 1L)
      .join(resid.select(col("id"), col("cluster")), "id")

  /** [[searchIvfPqExact]] for SEVERAL nprobe values in one pass — the
    * recall-vs-cost dial readout an IVF index needs before its nprobe
    * ships. The corpus is encoded ONCE and the per-(query, probed-list)
    * ADC tables are built for max(nprobes); each sweep leg then
    * restricts to its n nearest lists (the nearest-n lists are a prefix
    * of the nearest-max ordering, so no re-probe is ever needed).
    * Output adds a `nprobe` column; each leg is bit-identical to
    * [[searchIvfPqExact]] at that nprobe. */
  def searchIvfPqSweepExact(queries: DataFrame, corpus: DataFrame,
                            idCol: String, vecCol: String, model: IvfPqModel,
                            nprobes: Seq[Int], shortlist: Int, topK: Int,
                            persistResid: Boolean = true,
                            precomputedResid: Option[DataFrame] = None,
                            precomputedCodes: Option[DataFrame] = None)
      : DataFrame = {
    val centsQ = model.centsQ
    val booksQ = model.booksQ
    val m = model.m
    val k = model.k
    val scale = model.scale
    require(nprobes.nonEmpty &&
      nprobes.forall(n => n >= 1 && n <= centsQ.length),
      "need 1 <= every nprobe <= coarseK")
    require(shortlist >= topK, "shortlist must be at least topK")
    val maxProbe = nprobes.max
    val spark = corpus.sparkSession
    import spark.implicits._
    // same persist rationale (and accumulation caveat) as
    // ivfAdcTopKRefined: the residual stream feeds encode +
    // cluster join-back. A precomputedResid (the trainer's — see
    // fitIvfPqExactWithResid / ModelCache.ivfPqIndex) must be the
    // (id, cluster, rvq) frame of THIS corpus under THIS model's
    // centroids; the caller owns that correspondence. It is
    // RE-persisted here: if a cache clear evicted the trainer's
    // handle since, persist() re-registers it (idempotent when still
    // cached), so the two consumers below never double-compute.
    // precomputedCodes (the SERVED-FROM-POSTINGS path — an IndexStore
    // postings artifact, possibly compaction-filtered) skips the resid
    // + encode passes entirely; its (id, cluster, codes) rows define
    // the candidate set, so masked/compacted stores restrict the
    // search by construction
    val codesRaw = precomputedCodes.getOrElse {
      val resid = precomputedResid match {
        case Some(pr) =>
          if (persistResid)
            pr.persistLedgered()
          else pr
        case None =>
          val residRaw = residualFrame(corpus, idCol, vecCol, centsQ, scale)
          if (persistResid)
            residRaw.persistLedgered()
          else residRaw
      }
      encodeExact(resid, "id", "rvq", booksQ, scale = 1L)
        .join(resid.select(col("id"), col("cluster")), "id")
    }
    // the encoded index is scanned once PER SWEEP LEG — persist it too
    // when there is more than one (lifetime: LRU / caller clearCache,
    // like every trained-index intermediate here)
    val codes =
      if (nprobes.size > 1)
        codesRaw.persistLedgered()
      else codesRaw
    val qRows = queries
      .select(col(idCol).cast("long").as("query_id"),
        quantizedCol(vecCol, scale).as("vq"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val qTables = qRows.flatMap { case (qid, vq) =>
      val byDist = centsQ.indices.map { li =>
        val c = centsQ(li)
        var d = 0L
        var j = 0
        val dim = math.min(c.length, vq.length)
        while (j < dim) { val x = vq(j) - c(j); d += x * x; j += 1 }
        (d, li)
      }.sorted.take(maxProbe)
      byDist.zipWithIndex.map { case ((_, li), pr) =>
        val c = centsQ(li)
        val qr = Array.tabulate(vq.length)(i =>
          vq(i) - (if (i < c.length) c(i) else 0L))
        val t = new Array[Long](m * k)
        var s = 0
        while (s < m) {
          var cc = 0
          while (cc < k) {
            val cb = booksQ(s)(cc)
            var d = 0L
            var j = 0
            while (j < cb.length) { val x = qr(s * model.subDim + j) - cb(j); d += x * x; j += 1 }
            t(s * k + cc) = d
            cc += 1
          }
          s += 1
        }
        (qid, li, pr + 1, t)
      }
    }.toSeq
    val qDf = qTables.toDF("query_id", "cluster", "np_rank", "table")
    val scored = codes
      .join(broadcast(qDf), Seq("cluster"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("adc_dist",
        (0 until m)
          .map(s => element_at(col("table"),
            lit(s * k) + element_at(col("codes"), s + 1) + 1))
          .reduce(_ + _))
      .select(col("query_id"), col("np_rank"),
        col("id").as("neighbor_id"), col("adc_dist"))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id"))
    val candidates = nprobes.map { n =>
      graft.plans.TopKPerKey.prune(
          scored.filter(col("np_rank") <= n)
            .withColumn("neg_dist", -col("adc_dist")),
          "query_id", "neg_dist", "neighbor_id", shortlist)
        .withColumn("rn", row_number().over(ws))
        .filter(col("rn") <= shortlist)
        .select(lit(n).as("nprobe"), col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _)
    val q = queries.select(col(idCol).as("query_id"), asDouble(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(vecCol).as("cv"))
    val refined = candidates
      .join(c, "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("score", round(Similarity.cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    refined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("nprobe"), col("query_id"), col("neighbor_id"),
        col("score"), col("rank"))
  }
}
