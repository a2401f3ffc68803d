package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.core.Caching.LedgerOps
import graft.operators.{IndexStore, ProductQuantizer}

/** Trained-model registry — what a production vector platform has
  * instead of retraining per query: a09 (PQ search) and a21 (the ANN
  * quality report, which evaluates a09's parameters) need the SAME
  * codebooks, and `ProductQuantizer.fit` is fully deterministic in
  * (data, params), so memoizing by (sf dir, params) changes no result.
  *
  * Two layers (r9 advice #4 made the second cross-JVM):
  *  - a JVM-scoped memo (survives Spark cache clearing deliberately:
  *    a trained index is an artifact, not a cached scan);
  *  - a CROSS-JVM publish through [[IndexStore]]'s store (atomic
  *    rename, per-user root): the first JVM that ever needs a model
  *    trains and publishes it; every later Verify/Bench/serving JVM
  *    loads the parquet codebooks (~3.5 s of duplicate Lloyd's
  *    iterations per bench JVM before this). Staleness is carried in
  *    the key — [[graft.core.Fs.dataFingerprint]] of the embeddings
  *    table — so a regenerated corpus addresses a fresh path and can
  *    never serve a stale model. Codebooks round-trip exactly
  *    (parquet doubles / longs), so a loaded model encodes
  *    bit-identically to the trained one.
  */
object ModelCache {

  /** Bench hook (the [[GraphCache.resetMemoForTest]] twin): drop every
    * in-JVM model memo so the next call re-resolves through the
    * cross-JVM store — with the store swept too, the next call is a
    * true rebuild (the bench's warm-art protocol times exactly that). */
  private[graft] def resetMemosForBench(): Unit = {
    pqMemo.clear(); ivfPqMemo.clear(); sq8Memo.clear(); kmeansMemo.clear()
  }

  private val pqMemo =
    new java.util.concurrent.ConcurrentHashMap[String, ProductQuantizer.Model]()

  private val ivfPqMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, (ProductQuantizer.IvfPqModel, org.apache.spark.sql.DataFrame)]()

  /** The embeddings-table staleness fingerprint for `dir` (the only
    * input either model is a function of, besides its parameters).
    * Package-visible: postings/merged-segment publish keys must carry
    * the SAME fingerprint as the model they were encoded with (r10
    * advice — a corpus regen that retrains the model must also strand
    * any postings encoded with the old codebooks; since the model is a
    * pure function of (fingerprint, recipe), sharing the fingerprint
    * pins postings to their model instance). */
  private[queries] def fp(dir: String): String =
    graft.core.Fs.dataFingerprint(Seq(s"$dir/embeddings.parquet"))

  /** The a09/a21 PQ codebook (m=8, k=16, 2 iterations) for `dir`'s
    * embeddings table — trained once EVER per (corpus version,
    * params), served from the cross-JVM store after that. */
  def pqModel(spark: SparkSession, dir: String): ProductQuantizer.Model =
    // the memo key carries the SAME corpus fingerprint as the store key
    // (r11 advice): a corpus regenerated under the same dir within one
    // JVM misses the memo and re-resolves through the store, instead of
    // serving the stale in-process model for the JVM lifetime.
    pqMemo.computeIfAbsent(s"$dir|pq-8-16-2|fp=${fp(dir)}", _ => {
      val path = IndexStore.publishPath(s"mc_pq-8-16-2.v1|$dir|fp=${fp(dir)}")
      IndexStore.loadOrPublishPq(spark, path) {
        ProductQuantizer.fit(
          embeddings(spark, dir).select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", m = 8, k = 16, iterations = 2)
      }
    })

  /** The a15/a21/a24 IVF-PQ index (coarseK=16, m=8, k=16, 2
    * iterations) for `dir`'s embeddings table — a21/a24 evaluate
    * exactly a15's parameters, so all share one training run, and the
    * training run itself is shared across JVMs via the store. The
    * memo holds (model, residual frame): the residuals are part of
    * the index build; when the model came from the store instead of a
    * local train, they are re-derived bit-identically with one corpus
    * encode pass ([[ProductQuantizer.residualsFor]] — integer-exact
    * from the round-tripped centroids). Eviction (LRU or bench
    * clearCache) is harmless — the frame recomputes deterministically
    * from the same plan. */
  def ivfPqIndex(spark: SparkSession, dir: String)
      : (ProductQuantizer.IvfPqModel, org.apache.spark.sql.DataFrame) =
    ivfPqMemo.computeIfAbsent(s"$dir|ivfpq-16-8-16-2|fp=${fp(dir)}", _ => {
      val path = IndexStore.publishPath(
        s"mc_ivfpq-16-8-16-2.v1|$dir|fp=${fp(dir)}")
      var trainedResid: Option[org.apache.spark.sql.DataFrame] = None
      val model = IndexStore.loadOrPublishIvfPq(spark, path) {
        val (m, r) = ProductQuantizer.fitIvfPqExactWithResid(
          embeddings(spark, dir).select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", coarseK = 16, m = 8, k = 16, iterations = 2)
        trainedResid = Some(r)
        m
      }
      val resid = trainedResid.getOrElse(
        ProductQuantizer.residualsFor(
          embeddings(spark, dir).select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", model).persistLedgered())
      (model, resid)
    })

  /** [[ivfPqIndex]]'s model half. */
  def ivfPqModel(spark: SparkSession, dir: String): ProductQuantizer.IvfPqModel =
    ivfPqIndex(spark, dir)._1

  /** The memoized ivf-pq model, when this JVM holds exactly ONE — the
    * a42/s33 oracle fallback (r12 advice): a consumer that reads
    * oracleSql after a name-filtered run that skipped a42/s33 (but ran
    * any ivf-pq sibling) still gets the replay oracle instead of a
    * silent omission. Ambiguous (two corpora memoized) or cold JVMs
    * return None — the documented weaker rows-only check. */
  def peekIvfPqModel: Option[ProductQuantizer.IvfPqModel] = {
    val it = ivfPqMemo.values().iterator()
    if (!it.hasNext) None
    else { val m = it.next()._1; if (it.hasNext) None else Some(m) }
  }

  private val sq8Memo =
    new java.util.concurrent.ConcurrentHashMap[String, graft.operators.Sq8.Model]()

  /** a25's SQ8 bounds model for `dir`'s embeddings table — per-dim
    * min/max at the 2¹⁸ scale, a pure function of the corpus (no
    * training iterations), fitted once EVER per corpus version and
    * served cross-JVM from the store (r12 verdict #2: a25 paid the fit
    * in-row, so its bench attribution swung with run order while every
    * sibling model had an art_ prebuild row). Bounds round-trip exactly
    * (parquet longs), so artifact-served and freshly-fitted runs
    * encode bit-identically. */
  def sq8Model(spark: SparkSession, dir: String): graft.operators.Sq8.Model =
    sq8Memo.computeIfAbsent(s"$dir|sq8-262144|fp=${fp(dir)}", _ => {
      val path = IndexStore.publishPath(s"mc_sq8-262144.v1|$dir|fp=${fp(dir)}")
      IndexStore.loadOrPublishSq8(spark, path) {
        graft.operators.Sq8.fit(
          embeddings(spark, dir).select(col("vec_id"), col("embedding")),
          "vec_id", "embedding")
      }
    })

  private val kmeansMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Long]]]()

  /** a08's coarse quantizer — k = clamp(|corpus|/16, 8, 256) lists,
    * 2 Lloyd's iterations, centroids quantized to 2²⁰-scale longs (the
    * d12 splice convention) — trained once EVER per (corpus version,
    * k), served cross-JVM from the store after that (r10 verdict #3:
    * a08 retrained its k=256 quantizer inline every bench run). The
    * loaded form is the QUANTIZED array the assignment and the spliced
    * oracle both consume, so artifact-served and freshly-trained runs
    * are bit-identical by construction. */
  def kmeansCoarse(spark: SparkSession, dir: String): Array[Array[Long]] =
    kmeansMemo.computeIfAbsent(s"$dir|km-coarse|fp=${fp(dir)}", _ => {
      val e = embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      // one count() job to SIZE the model — k is a hyperparameter of
      // corpus cardinality, needed before training AND in the key
      val n = e.count()
      val k = math.max(8, math.min(256, (n / 16).toInt))
      val path = IndexStore.publishPath(
        s"mc_km-coarse-$k-2.v1|$dir|fp=${fp(dir)}")
      IndexStore.loadOrPublishKmeans(spark, path) {
        val (_, centroids) = graft.operators.KMeans.fit(
          e, "vec_id", "embedding", k = k, iterations = 2)
        centroids.map(_.map(x => math.round(x * 1048576.0)))
      }
    })
}
