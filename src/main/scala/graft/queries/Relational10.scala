package graft.queries

import graft.core.Caching.LedgerOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._

/** Tenth batch (round 6): conversion attribution, embedding-space
  * drift monitoring, and curriculum staging — the analytics /
  * monitoring / training-prep trio a production corpus pipeline runs
  * beside the operators already covered. */
object Relational10 {

  /** q45: first/last-touch conversion attribution — for every purchase,
    * which preceding marketing touch (view/click/signup) within 7 days
    * gets the credit, under both classic models at once. The shape is
    * the q17 as-of family: a per-user range join (per-user event counts
    * bound the fan-out), then ONE aggregation with min_by/max_by over
    * an exact integer order key (epoch-micros ×10¹⁰ + event_id — unique,
    * so both engines pick identical winners; no window, no per-group
    * sort). Conversions with no touch in the window keep NULL credit
    * (the left join) — dropping them would overstate attribution
    * coverage. */
  def q45Attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"),
        col("ts").as("cts"))
    val touch = ev.filter(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("touch_type"), col("ts").as("tts"))
    val attributed = conv.join(touch, Seq("user_id"))
      .filter(col("tts") <= col("cts") &&
        col("tts") >= col("cts") - expr("INTERVAL 7 DAYS"))
      .withColumn("ord",
        unix_micros(col("tts")).cast(DecimalType(38, 0)) *
          lit(10000000000L) + col("touch_id"))
      .groupBy(col("conv_id"))
      .agg(
        min_by(struct(col("touch_id"), col("touch_type")), col("ord")).as("ft"),
        max_by(struct(col("touch_id"), col("touch_type")), col("ord")).as("lt"))
    conv.join(attributed, Seq("conv_id"), "left_outer")
      .select(col("conv_id").as("event_id"), col("user_id"),
        date_format(col("cts"), "yyyy-MM-dd HH:mm:ss").as("conv_ts"),
        col("ft.touch_id").as("first_touch_id"),
        col("ft.touch_type").as("first_touch_type"),
        col("lt.touch_id").as("last_touch_id"),
        col("lt.touch_type").as("last_touch_type"))
      .orderBy(col("event_id"))
  }

  /** a22: embedding snapshot drift ([[graft.operators.Drift
    * .embeddingDrift]]) — per-label L1 centroid displacement between
    * two snapshots (even vec_ids = yesterday, odd = today — the d15
    * snapshot convention), exact integer numerator + floor-division
    * micro-units, the vector-side twin of t33. */
  def a22EmbeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    graft.operators.Drift.embeddingDrift(
      e.filter(col("vec_id") % 2 === 0),
      e.filter(col("vec_id") % 2 === 1),
      "label", "embedding")
  }

  /** p29: curriculum staging — order the corpus easy→hard (difficulty
    * here: token count, the standard length curriculum) and cut it
    * into 10 equal-count stages, emitting a per-stage manifest with a
    * membership checksum. Ranks come from [[graft.operators.GlobalIds
    * .assignBy]] over (n_tokens, doc_id) — the two-level form, no
    * single-task global sort — and the stage id is integer arithmetic
    * on the rank (pos·10 div n), so the staging is a pure function of
    * the corpus. The bit_xor checksum makes the oracle verify stage
    * MEMBERSHIP, not just sizes (the t27 principle). */
  def p29Curriculum(spark: SparkSession, dir: String): DataFrame = {
    val d = documentsParallel(spark, dir)
      .select(col("doc_id"),
        when(col("text").isNull, lit(0L))
          .otherwise(size(split(col("text"), " ")).cast("long"))
          .as("n_tokens"))
    val ranked = graft.operators.GlobalIds.assignBy(
      d, Seq(col("n_tokens"), col("doc_id")))
    val n = d.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("stage", expr("(global_id * 10) div n"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        expr("bit_xor(doc_id)").as("doc_checksum"))
      .orderBy(col("stage"))
  }

  /** t36: PII redaction ([[graft.operators.TextAnalysis.piiRedact]])
    * over the corpus with PLANTED identifiers (every 10th doc gains an
    * email + phone + IPv4 suffix, replayed verbatim by the oracle —
    * the planted-lines convention, so the redactor provably fires).
    * The full redacted text is hash-checked, not just the counts. */
  def t36PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val d = documentsParallel(spark, dir).select(col("doc_id"), col("text"))
    val planted = d.withColumn("ptext",
      when(col("doc_id") % 10 === 0,
        concat(col("text"), lit(" reach user"),
          col("doc_id").cast("string"), lit("@mail.example.com or "),
          lit("555-867-5309 from 192.168."),
          (col("doc_id") % 256).cast("string"), lit(".7")))
        .otherwise(col("text")))
    graft.operators.TextAnalysis.piiRedact(planted, "doc_id", "ptext")
      .orderBy(col("doc_id"))
  }

  /** p30: length-bucketed inference batching — the dynamic-batching
    * prep every embedding/inference fleet runs: sort documents by
    * token count (GlobalIds two-level rank — no single-task sort),
    * cut into fixed-size batches of 32, and report each batch's
    * padding economics (a batch pads every member to its own max, so
    * length-sorted batches waste `n·max − Σlen` ≈ 0 where random
    * batches waste ~n·(max−mean)). The per-batch `bit_xor` checksum
    * makes the oracle verify batch MEMBERSHIP. Output is
    * |corpus|/32-bounded. */
  def p30LengthBatches(spark: SparkSession, dir: String): DataFrame = {
    val batchSize = 32
    val d = documentsParallel(spark, dir)
      .select(col("doc_id"),
        when(col("text").isNull, lit(0L))
          .otherwise(size(split(col("text"), " ")).cast("long"))
          .as("n_tokens"))
    graft.operators.GlobalIds.assignBy(d, Seq(col("n_tokens"), col("doc_id")))
      .withColumn("batch_id", expr(s"global_id div $batchSize"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"),
        (count(lit(1)) * max(col("n_tokens")) - sum(col("n_tokens")))
          .as("pad_tokens"),
        expr("bit_xor(doc_id)").as("doc_checksum"))
      .orderBy(col("batch_id"))
  }

  /** DCG position weights, ×10⁶ integer: w_i = round(10⁶ / log₂(i+1)).
    * Computed ONCE here and spliced as literals into BOTH the Spark
    * plan and the DuckDB oracle (the t17 md5-literal principle) — the
    * single libm evaluation site makes cross-engine parity structural
    * rather than numerical. */
  private val DcgW: IndexedSeq[Long] =
    (1 to 10).map(i => Math.round(1e6 / (Math.log(i + 1.0) / Math.log(2.0))))
  private val IdcgAt10: Long =
    (1 to 10).map(i => (11L - i) * DcgW(i - 1)).sum

  /** a23: ranking-quality metrics — MRR and nDCG@10 of the IVF path
    * against the exact ranking, per query (a21 measures set recall;
    * MRR/nDCG grade POSITIONS — a result list with the right set in
    * the wrong order passes recall and fails here). Relevance is
    * graded by exact rank (rel = 11 − exact_rank, 0 if outside the
    * exact top-10); every metric is integer arithmetic over the
    * spliced weight literals, reported in ppm via floor division —
    * the t33 discipline. */
  def a23RankingMetrics(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val q = e.filter(col("vec_id") < 5)
    val exact = graft.operators.Similarity
      .bruteForceTopKExec(q, e, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("erank"))
    val approx = graft.operators.Similarity
      .ivfTopK(q, e, "vec_id", "embedding", "label", k = 10)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("pos"))
    val graded = approx
      .join(exact, Seq("query_id", "neighbor_id"), "left_outer")
      .withColumn("rel",
        coalesce(lit(11L) - col("erank").cast("long"), lit(0L)))
      .withColumn("w",
        element_at(array(DcgW.map(lit(_)): _*), col("pos")))
    graded.groupBy(col("query_id"))
      .agg(sum(col("rel") * col("w")).cast("long").as("dcg"),
        min(when(col("rel") > 0, col("pos"))).as("__fh"))
      .withColumn("mrr_ppm",
        coalesce(expr("1000000 div __fh"), lit(0L)))
      .withColumn("ndcg_ppm", expr(s"(dcg * 1000000) div ${IdcgAt10}L"))
      .select(col("query_id"), col("dcg"), col("mrr_ppm"), col("ndcg_ppm"))
      .orderBy(col("query_id"))
  }

  /** a24: nprobe sensitivity sweep — recall@10 of the IVF-PQ path at
    * nprobe ∈ {1, 2, 4} against exact brute force, per (query, nprobe).
    * This is the OTHER half of a21's readout: a21 grades the shipped
    * parameters, this grades the dial itself — the recall-vs-cost curve
    * an index owner reads before picking nprobe. The index model comes
    * from [[ModelCache.ivfPqModel]] (trained once per JVM, shared with
    * a15/a21) and the corpus is encoded ONCE for all sweep legs
    * ([[graft.operators.ProductQuantizer.searchIvfPqSweepExact]]); the
    * whole sweep is engine-exact, so the recall table hash-checks
    * against a DuckDB replay whose probe legs share one corpus-encode
    * CTE the same way. */
  def a24NprobeSweep(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 5)
    val exact = graft.operators.Similarity
      .bruteForceTopKExec(q, e, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"))
      // 50 bounded rows, two consumers (overlap join, query list)
      .persistLedgered()
    val (model, resid) = ModelCache.ivfPqIndex(spark, dir)
    val sweep = graft.operators.ProductQuantizer.searchIvfPqSweepExact(
      q, e, "vec_id", "embedding", model,
      nprobes = Nprobes, shortlist = 100, topK = 10,
      precomputedResid = Some(resid))
    a24Oracle = Some(a24OracleSql(model.centsQ, model.booksQ, subDim = 8))
    val overlap = exact
      .join(sweep.select(col("nprobe"), col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id"), col("nprobe"))
      .agg(count(lit(1)).as("n_overlap"))
    val nps = Nprobes.toDF("nprobe")
    exact.select(col("query_id")).distinct()
      .crossJoin(broadcast(nps))
      .join(overlap, Seq("query_id", "nprobe"), "left_outer")
      .select(col("query_id"), col("nprobe"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)).cast("double") / 10.0, 6)
          .as("recall"))
      .orderBy(col("query_id"), col("nprobe"))
  }

  private val Nprobes = Seq(1, 2, 4)

  /** a24's oracle carries the trained-then-quantized model literals —
    * same last-writer-wins lifecycle as [[Relational9]]'s a21. */
  @volatile private var a24Oracle: Option[String] = None

  /** One corpus-encode (cents/codes CTEs), one max-nprobe query-table
    * build (probes keeps its rank), then every sweep leg restricts
    * `p.rn <= np` — the DuckDB mirror of the Spark sweep's shape. */
  private def a24OracleSql(centsQ: Array[Array[Long]],
                           booksQ: Array[Array[Array[Long]]],
                           subDim: Int): String = {
    val maxProbe = Nprobes.max
    val npVals = Nprobes.map(n => s"($n)").mkString(", ")
    val cents = centsQ.zipWithIndex.map { case (c, i) =>
      s"($i, ${c.mkString("[", ", ", "]")})" }.mkString(",\n    ")
    val books = booksQ.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (cb, c) =>
        s"($s, $c, ${cb.mkString("[", ", ", "]")})" } }.mkString(",\n    ")
    s"""WITH d AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vd,
       |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1048576, 0) AS BIGINT)) AS vq
       |  FROM embeddings),
       |cents(ci, cq) AS (VALUES
       |    $cents),
       |books(s, c, bq) AS (VALUES
       |    $books),
       |nps(np) AS (VALUES $npVals),
       |cdist AS (
       |  SELECT v.vec_id, c.ci,
       |    list_sum(list_transform(generate_series(1, len(v.vq)), d ->
       |      (v.vq[d] - c.cq[d]) * (v.vq[d] - c.cq[d]))) AS dist
       |  FROM v CROSS JOIN cents c),
       |crank AS (SELECT vec_id, ci,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, ci) AS rn
       |  FROM cdist),
       |asg AS (SELECT vec_id, ci AS cluster FROM crank WHERE rn = 1),
       |resid AS (
       |  SELECT v.vec_id, a.cluster,
       |    list_transform(generate_series(1, len(v.vq)), d -> v.vq[d] - c.cq[d]) AS rq
       |  FROM v JOIN asg a ON a.vec_id = v.vec_id
       |  JOIN cents c ON c.ci = a.cluster),
       |enc AS (
       |  SELECT r.vec_id, b.s, b.c,
       |    list_sum(list_transform(generate_series(1, $subDim), d ->
       |      (r.rq[b.s * $subDim + d] - b.bq[d]) * (r.rq[b.s * $subDim + d] - b.bq[d]))) AS dist
       |  FROM resid r CROSS JOIN books b),
       |codes AS MATERIALIZED (SELECT vec_id, s, c AS code FROM (
       |  SELECT vec_id, s, c,
       |    row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
       |  FROM enc) r WHERE rn = 1),
       |probes AS (SELECT vec_id, ci AS cluster, rn FROM crank
       |  WHERE vec_id < 5 AND rn <= $maxProbe),
       |qresid AS (
       |  SELECT p.vec_id, p.cluster, p.rn,
       |    list_transform(generate_series(1, len(v.vq)), d -> v.vq[d] - c.cq[d]) AS rq
       |  FROM probes p JOIN v ON v.vec_id = p.vec_id
       |  JOIN cents c ON c.ci = p.cluster),
       |qenc AS MATERIALIZED (
       |  SELECT r.vec_id, r.cluster, r.rn, b.s, b.c,
       |    list_sum(list_transform(generate_series(1, $subDim), d ->
       |      (r.rq[b.s * $subDim + d] - b.bq[d]) * (r.rq[b.s * $subDim + d] - b.bq[d]))) AS dist
       |  FROM qresid r CROSS JOIN books b),
       |adc AS (
       |  SELECT np.np AS nprobe, p.vec_id AS query_id, a.vec_id AS neighbor_id,
       |    sum(qe.dist) AS adc_dist
       |  FROM nps np
       |  JOIN probes p ON p.rn <= np.np
       |  JOIN asg a ON a.cluster = p.cluster AND a.vec_id <> p.vec_id
       |  JOIN codes cd ON cd.vec_id = a.vec_id
       |  JOIN qenc qe ON qe.vec_id = p.vec_id AND qe.cluster = p.cluster
       |    AND qe.s = cd.s AND qe.c = cd.code
       |  GROUP BY 1, 2, 3),
       |short AS (SELECT nprobe, query_id, neighbor_id FROM (
       |  SELECT nprobe, query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY nprobe, query_id
       |      ORDER BY adc_dist, neighbor_id) AS rn
       |  FROM adc) r WHERE rn <= 100),
       |refined AS (
       |  SELECT sh.nprobe, sh.query_id, sh.neighbor_id,
       |    round(list_cosine_similarity(qv.vd, cv.vd), 6) AS score
       |  FROM short sh
       |  JOIN v qv ON qv.vec_id = sh.query_id
       |  JOIN v cv ON cv.vec_id = sh.neighbor_id),
       |topk AS (SELECT nprobe, query_id, neighbor_id FROM (
       |  SELECT nprobe, query_id, neighbor_id, row_number() OVER (
       |    PARTITION BY nprobe, query_id ORDER BY score DESC, neighbor_id) AS rk
       |  FROM refined) r WHERE rk <= 10),
       |ex AS (
       |  ${Relational9.exactTop10OracleSql}),
       |ov AS (
       |  SELECT t.nprobe, e.query_id, count(*) AS n_overlap
       |  FROM ex e JOIN topk t
       |    ON t.query_id = e.query_id AND t.neighbor_id = e.neighbor_id
       |  GROUP BY 1, 2)
       |SELECT q.query_id, np.np AS nprobe,
       |  COALESCE(ov.n_overlap, 0) AS n_overlap,
       |  round(COALESCE(ov.n_overlap, 0) / 10.0, 6) AS recall
       |FROM (SELECT DISTINCT query_id FROM ex) q
       |CROSS JOIN nps np
       |LEFT JOIN ov ON ov.query_id = q.query_id AND ov.nprobe = np.np
       |ORDER BY q.query_id, np.np""".stripMargin
  }

  /** t38: quality-ordered token-budget selection — THE data-recipe
    * primitive: keep the best documents (here stopword-density
    * permille, a C4/Gopher-style naturalness proxy, as an exact
    * integer so both engines order identically) until a global token
    * budget (half the corpus) is spent. No single-task sort anywhere:
    * the quality rank is the two-level [[graft.operators.GlobalIds
    * .assignBy]] and the running token total is
    * [[graft.operators.GlobalIds.exclusivePrefixSum]] (the p14
    * two-level shape generalized — in-bucket windows + one bounded
    * bucket-total fold). A document is kept iff its INCLUSIVE running
    * total fits the budget. Output: per-source keep accounting with
    * `bit_xor` membership checksums — the hash oracle covers the kept
    * SET, not just its size. */
  def t38TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    // r14: token + stopword counts from ONE scan-local byte pass
    // (stop_token_stats) — the old form materialized split(text, ' ')
    // three times per doc and ran the stopword filter as an interpreted
    // HOF lambda per token (guide §4: prefer codegen'd natives on the
    // hot scan). Bit-identical: same single-space split (empties kept),
    // exact byte equality against the stop list, same
    // (n_stop·1000) div n_tokens integer density; null text still
    // reports (0, 0) via the coalesces (split never yields size 0 on
    // non-null input, so the old size-0 guard only ever fired on null).
    val d = documentsParallel(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.functions.GraftFunctions.stopTokenStats(col("text"), stop)
          .as("st"))
      .select(col("doc_id"), col("source"),
        coalesce(col("st.nt"), lit(0L)).as("n_tokens"),
        coalesce(expr("(st.ns * 1000L) div st.nt"), lit(0L)).as("q"))
    val ranked = graft.operators.GlobalIds.assignBy(
      d, Seq(col("q").desc, col("doc_id")))
    val summed = graft.operators.GlobalIds.exclusivePrefixSum(
      ranked, "global_id", "n_tokens")
    // budget from the RANKED frame (assignBy persists internally) — an
    // aggregate over `d` would re-scan the parquet and re-tokenize
    // every document just to derive one scalar
    val budget = broadcast(ranked.agg(
      expr("sum(n_tokens) div 2").as("budget")))
    summed.crossJoin(budget)
      .filter(col("prefix") + col("n_tokens") <= col("budget"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).as("tokens_kept"),
        min(col("q")).as("min_q"),
        expr("bit_xor(doc_id)").as("kept_checksum"))
      .orderBy(col("source"))
  }

  /** q46: top event paths — the sequence-mining readout behind every
    * "what do users do before X" question: each user's event stream in
    * (ts, event_id) order yields its consecutive 3-step paths via two
    * `lead` windows (scan-local once the per-user clustering exists —
    * ONE shuffle, no self-joins), then a global count with the top 20
    * paths. Tail positions with fewer than 2 successors drop (concat
    * propagates the NULL lead). Hot-user posture: the window's
    * per-user sort runs in Spark's spilling sort, so a million-event
    * user is disk pressure, not an OOM; the path count aggregate
    * map-side combines to |distinct paths| state. */
  def q46EventPaths(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("path", concat(col("event_type"), lit(">"),
        lead(col("event_type"), 1).over(w), lit(">"),
        lead(col("event_type"), 2).over(w)))
      .filter(col("path").isNotNull)
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_event_paths"     -> q46EventPaths _,
    "a23_ranking_metrics" -> a23RankingMetrics _,
    "a24_nprobe_sweep"    -> a24NprobeSweep _,
    "t38_token_budget"    -> t38TokenBudget _,
    "q45_attribution"     -> q45Attribution _,
    "a22_embedding_drift" -> a22EmbeddingDrift _,
    "p29_curriculum"      -> p29Curriculum _,
    "t36_pii_redact"      -> t36PiiRedact _,
    "p30_length_batches"  -> p30LengthBatches _)

  /** a24's oracle is dynamic (trained-model literals) — last-writer-
    * wins after the query runs, the CurationQueries convention. */
  def oracles: Map[String, String] =
    staticOracles ++ a24Oracle.map("a24_nprobe_sweep" -> _)

  private val staticOracles: Map[String, String] = Map(
    // t38: the same integer quality key (stopword permille, floor
    // division), the same inclusive-running-total keep rule — DuckDB
    // replays the rank with one window; Spark reaches the same
    // cumulative sums through the two-level distributed shape
    "t38_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CASE WHEN text IS NULL THEN 0
        |      ELSE len(string_split(text, ' ')) END AS n_tokens,
        |    CASE WHEN text IS NULL OR len(string_split(text, ' ')) = 0 THEN 0
        |      ELSE (len(list_filter(string_split(text, ' '),
        |        w -> list_contains(['the','a','of','and','to','in','is'], w))) * 1000)
        |        // len(string_split(text, ' ')) END AS q
        |  FROM documents),
        |b AS (SELECT sum(n_tokens) // 2 AS budget FROM d),
        |r AS (SELECT *, sum(n_tokens) OVER (ORDER BY q DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d),
        |k AS (SELECT r.* FROM r, b WHERE r.cum <= b.budget)
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
        |  CAST(min(q) AS BIGINT) AS min_q, bit_xor(doc_id) AS kept_checksum
        |FROM k GROUP BY source ORDER BY source""".stripMargin,
    "q46_event_paths" ->
      """WITH p AS (
        |  SELECT event_type || '>' ||
        |    lead(event_type, 1) OVER w || '>' ||
        |    lead(event_type, 2) OVER w AS path
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT path, count(*) AS n FROM p WHERE path IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "a23_ranking_metrics" -> {
      val wRows = DcgW.zipWithIndex
        .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
      s"""WITH d AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |wt(i, w) AS (VALUES $wRows),
         |ex AS (
         |  SELECT query_id, neighbor_id, rank AS erank FROM (
         |  ${Relational9.exactTop10OracleSql}) ext),
         |ap AS (
         |  SELECT query_id, neighbor_id, rank AS pos FROM (
         |  ${Relational9.ivfTop10OracleSql}) apt),
         |g AS (
         |  SELECT a.query_id, a.pos,
         |    CASE WHEN e.erank IS NOT NULL THEN 11 - e.erank ELSE 0 END AS rel,
         |    wt.w
         |  FROM ap a
         |  LEFT JOIN ex e ON e.query_id = a.query_id
         |    AND e.neighbor_id = a.neighbor_id
         |  JOIN wt ON wt.i = a.pos),
         |agg AS (
         |  SELECT query_id, CAST(sum(rel * w) AS BIGINT) AS dcg,
         |    min(CASE WHEN rel > 0 THEN pos END) AS fh
         |  FROM g GROUP BY query_id)
         |SELECT query_id, dcg,
         |  CAST(COALESCE(1000000 // fh, 0) AS BIGINT) AS mrr_ppm,
         |  CAST((CAST(dcg AS HUGEINT) * 1000000) // ${IdcgAt10} AS BIGINT)
         |    AS ndcg_ppm
         |FROM agg ORDER BY query_id""".stripMargin
    },
    "q45_attribution" ->
      """WITH conv AS (SELECT event_id AS conv_id, user_id, ts AS cts
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (SELECT user_id, event_id AS touch_id,
        |    event_type AS touch_type, ts AS tts
        |  FROM events WHERE event_type IN ('view', 'click', 'signup')),
        |j AS (
        |  SELECT c.conv_id, t.touch_id, t.touch_type,
        |    CAST(epoch_us(t.tts) AS HUGEINT) * 10000000000 + t.touch_id AS ord
        |  FROM conv c JOIN touch t ON t.user_id = c.user_id
        |    AND t.tts <= c.cts AND t.tts >= c.cts - INTERVAL 7 DAY),
        |agg AS (
        |  SELECT conv_id,
        |    arg_min(touch_id, ord) AS first_touch_id,
        |    arg_min(touch_type, ord) AS first_touch_type,
        |    arg_max(touch_id, ord) AS last_touch_id,
        |    arg_max(touch_type, ord) AS last_touch_type
        |  FROM j GROUP BY conv_id)
        |SELECT c.conv_id AS event_id, c.user_id,
        |  strftime(c.cts, '%Y-%m-%d %H:%M:%S') AS conv_ts,
        |  a.first_touch_id, a.first_touch_type,
        |  a.last_touch_id, a.last_touch_type
        |FROM conv c LEFT JOIN agg a ON a.conv_id = c.conv_id
        |ORDER BY event_id""".stripMargin,
    "a22_embedding_drift" ->
      """WITH q AS (SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1048576, 0) AS BIGINT)) AS vq
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |ex AS (SELECT vec_id, label, t.d AS d, vq[t.d] AS qv
        |  FROM q, unnest(generate_series(1, len(vq))) AS t(d)),
        |sa AS (SELECT label, d, CAST(sum(qv) AS HUGEINT) AS s_a,
        |    count(*) AS n_a
        |  FROM ex WHERE vec_id % 2 = 0 GROUP BY label, d),
        |sb AS (SELECT label, d, CAST(sum(qv) AS HUGEINT) AS s_b,
        |    count(*) AS n_b
        |  FROM ex WHERE vec_id % 2 = 1 GROUP BY label, d),
        |j AS (SELECT sa.label, max(sa.n_a) AS n_a, max(sb.n_b) AS n_b,
        |    sum(abs(sa.s_a * sb.n_b - sb.s_b * sa.n_a)) AS l1_num
        |  FROM sa JOIN sb ON sa.label = sb.label AND sa.d = sb.d
        |  GROUP BY sa.label)
        |SELECT label, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(CAST(l1_num AS HUGEINT) AS VARCHAR) AS l1_num,
        |  CAST((CAST(l1_num AS HUGEINT) * 1000000) //
        |    (CAST(n_a AS HUGEINT) * n_b * 1048576) AS BIGINT) AS l1_shift_micro
        |FROM j ORDER BY label""".stripMargin,
    "t36_pii_redact" ->
      """WITH p AS (SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0 THEN
        |      text || ' reach user' || CAST(doc_id AS VARCHAR) ||
        |      '@mail.example.com or 555-867-5309 from 192.168.' ||
        |      CAST(doc_id % 256 AS VARCHAR) || '.7'
        |    ELSE text END AS ptext
        |  FROM documents)
        |SELECT doc_id,
        |  COALESCE(CAST(len(regexp_extract_all(ptext,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT), 0) AS n_emails,
        |  COALESCE(CAST(len(regexp_extract_all(ptext,
        |    '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT), 0) AS n_phones,
        |  COALESCE(CAST(len(regexp_extract_all(ptext,
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT), 0) AS n_ips,
        |  COALESCE(regexp_replace(regexp_replace(regexp_replace(ptext,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g'), '') AS clean_text
        |FROM p ORDER BY doc_id""".stripMargin,
    "p30_length_batches" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(CASE WHEN text IS NULL THEN 0
        |      ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (SELECT doc_id, n_tokens,
        |    row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS pos
        |  FROM d)
        |SELECT pos // 32 AS batch_id, count(*) AS n_docs,
        |  max(n_tokens) AS max_tokens,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS pad_tokens,
        |  bit_xor(doc_id) AS doc_checksum
        |FROM r GROUP BY 1 ORDER BY batch_id""".stripMargin,
    "p29_curriculum" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(CASE WHEN text IS NULL THEN 0
        |      ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (SELECT doc_id, n_tokens,
        |    row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS pos
        |  FROM d),
        |n AS (SELECT count(*) AS n FROM d)
        |SELECT CAST((pos * 10) // (SELECT n FROM n) AS BIGINT) AS stage,
        |  count(*) AS n_docs,
        |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
        |  bit_xor(doc_id) AS doc_checksum
        |FROM r GROUP BY 1 ORDER BY stage""".stripMargin)
}
