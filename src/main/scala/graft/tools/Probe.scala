package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for optimization rounds: times named plan
  * fragments against the noop sink (guide §1.4 — compute every column,
  * discard the result, no sink cost) so a bench row's cost can be
  * attributed to its stages. `sbt "runMain graft.tools.Probe <name>
  * [sfDir]"`. Fragments are registered ad hoc per round; this is a
  * measurement tool, not part of any query path. */
object Probe {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "copurchase"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.Graft.session(32, "probe")
    spark.sparkContext.setLogLevel("WARN")
    which match {
      case "copurchase" => copurchase(spark, dir)
      case "triangles" => triangles(spark, dir)
      case "a11" => a11(spark, dir)
      case "parts" => parts(spark, dir)
      case "p18" => p18(spark, dir)
      case "trainers" => trainers(spark, dir)
      case "ab14" => ab14(spark, dir)
      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }

  /** p18 phase split (replicates curateFull's stage boundaries). */
  private def p18(spark: SparkSession, dir: String): Unit = {
    val qs = graft.SparkEntry.queries
    time("p18 full #1 (cold)") { qs("p18_curate_full")(spark, dir).count() }
    graft.core.Caching.CacheLedger.releaseAll(); spark.catalog.clearCache()
    time("p18 full #2 (warm)") { qs("p18_curate_full")(spark, dir).count() }
    graft.core.Caching.CacheLedger.releaseAll(); spark.catalog.clearCache()
    val d0 = graft.Tables.documents(spark, dir)
    val planted = d0.unionAll(d0.withColumn("doc_id", col("doc_id") + 1000000L))
    val lined = graft.queries.CurationQueries.withPlantedLines(planted)
    val cleanedPlan = graft.operators.TextAnalysis
      .removeBoilerplate(lined, "doc_id", "source", "ltext", minDocFreq = 5L)
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), translate(col("clean_text"), "\n", " ").as("text"))
    time("phase1: boilerplate (noop)") { noop(cleanedPlan) }
    val ck1 = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_ckpt", "probe_cleaned").toString
    time("phase1 + ckpt write") {
      cleanedPlan.coalesce(8).write.mode("overwrite").parquet(ck1)
    }
    val cleaned = spark.read.schema(cleanedPlan.schema).parquet(ck1)
    val lm = graft.operators.TextAnalysis.bigramLmScore(cleaned, "doc_id", "text")
    time("phase2: LM score (noop)") { noop(lm) }
    val gated = cleaned.join(
      lm.filter(col("nll") <= 3.45).select(col("doc_id")), "doc_id")
    val kept = gated
      .groupBy(sha2(col("text"), 256).as("__dig"))
      .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("__w"))
      .select(col("__w.doc_id").as("doc_id"), col("__w.text").as("text"))
    time("phase3: gate+keepfirst (noop)") { noop(kept) }
    val ck2 = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_ckpt", "probe_kept").toString
    time("phase3 + ckpt write") {
      kept.coalesce(8).write.mode("overwrite").parquet(ck2)
    }
    val keptR = spark.read.schema(kept.schema).parquet(ck2)
    time("phase4: vocabEncode+orderBy (count)") {
      graft.operators.Packing.vocabEncode(keptR, "doc_id", "text", seqLen = 128)
        .orderBy(col("seq_id")).count()
    }
  }

  /** Scan-partition counts of every base table. */
  private def parts(spark: SparkSession, dir: String): Unit = {
    Seq("documents", "embeddings", "lineitem", "orders", "customer",
      "events").foreach { t =>
      val df = graft.Tables.table(spark, dir, t)
      println(s"PROBE $t partitions = ${df.rdd.getNumPartitions}")
    }
  }

  /** a11 construction-vs-execution split. */
  private def a11(spark: SparkSession, dir: String): Unit = {
    val qs = graft.SparkEntry.queries
    (1 to 3).foreach { i =>
      val df = time(s"a11 construct #$i") { qs("a11_bm25_topk")(spark, dir) }
      time(s"a11 count #$i") { df.count() }
      graft.core.Caching.CacheLedger.releaseAll()
      spark.catalog.clearCache()
    }
    // stage split of the bm25 core over the a11 shape
    val c = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val q = c.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("qid"),
        array_join(slice(split(col("text"), " "), 1, 12), " ").as("qtext"))
    val qterms = q.select(col("qid").as("query_id"),
        explode(array_distinct(split(col("qtext"), " "))).as("term"))
      .select(col("query_id"), xxhash64(col("term")).as("ht"))
    val qtermRows = time("collect qterms") { qterms.collectAsList() }
    println(s"PROBE qterm rows = ${qtermRows.size}")
    val vocab = {
      import scala.jdk.CollectionConverters._
      val a = qtermRows.asScala.map(_.getLong(1)).toArray.distinct
      java.util.Arrays.sort(a); a
    }
    println(s"PROBE vocab size = ${vocab.length}")
    val tf = c.select(col("doc_id"),
        graft.functions.GraftFunctions.wordCount(col("text")).cast("long").as("dl"),
        explode(graft.functions.GraftFunctions.termTfs(col("text"), vocab)).as("e"))
      .select(col("doc_id"), col("e.ht").as("ht"), col("e.tf").as("tf"), col("dl"))
    time("tf scan noop") { noop(tf) }
    time("tf scan noop again") { noop(tf) }
    println(s"PROBE tf rows = ${tf.count()}")
    val qtermsLocal = spark.createDataFrame(qtermRows, qterms.schema)
    val fan = tf.join(broadcast(qtermsLocal), Seq("ht"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("tf")).as("s"))
    time("fanout join+agg noop") { noop(fan) }
    println(s"PROBE fan rows = ${fan.count()}")
  }

  /** Trained-model artifact stage split (art_kmeans_coarse,
    * art_pq_model, art_ivfpq_index): where the Lloyd's chains spend
    * their seconds — init collects, per-iteration assignment+centroid
    * jobs, store publish. Each piece runs twice (cold JIT, then the
    * number that matters). */
  /** r14 interleaved A/Bs: old vs new t38 scan / d15 shape, 3 reps
    * each in ONE JVM so host drift cannot masquerade as a delta. */
  private def ab14(spark: SparkSession, dir: String): Unit = {
    def teardown(): Unit = {
      graft.core.Caching.CacheLedger.releaseAll(); spark.catalog.clearCache()
    }
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    val stopArr = stop.map(w => s"'$w'").mkString("array(", ", ", ")")
    def t38Old(): DataFrame = {
      val d = graft.Tables.documentsParallel(spark, dir).select(
        col("doc_id"), col("source"),
        when(col("text").isNull, lit(0L))
          .otherwise(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        when(col("text").isNull || size(split(col("text"), " ")) === 0, lit(0L))
          .otherwise(expr(
            s"(size(filter(split(text, ' '), w -> array_contains($stopArr, w))) * 1000L)" +
              " div size(split(text, ' '))")).as("q"))
      val ranked = graft.operators.GlobalIds.assignBy(
        d, Seq(col("q").desc, col("doc_id")))
      val summed = graft.operators.GlobalIds.exclusivePrefixSum(
        ranked, "global_id", "n_tokens")
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
    def d15Old(): DataFrame = {
      val base = graft.Tables.documentsParallel(spark, dir)
        .select(col("doc_id"), col("text"))
      val today = base.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionAll(base.filter(col("doc_id") % 2 === 1)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" fresh")).as("text")))
        .unionAll(base.filter(col("doc_id") % 2 === 1)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(col("text"), lit(" fresh")).as("text")))
      graft.operators.Dedup.incrementalKeepNew(
          today, "doc_id", "text", base, "text")
        .orderBy(col("id"))
    }
    def a18Old(): DataFrame = {
      val h = graft.operators.HyperLogLog.hashExpr(
        "concat(l_orderkey, '-', l_linenumber)", "qs")
      graft.operators.Profile.exactQuantiles(
        graft.Tables.lineitem(spark, dir).filter(expr(s"$h < ${1L << 57}")),
        "l_returnflag",
        round(col("l_extendedprice") * 1000000L).cast("long"),
        Seq(50, 90, 99))
    }
    def t28Old(): DataFrame = {
      // madOutliers with the WINDOW-form quantiles (pre-r14 shape)
      val v = graft.Tables.events(spark, dir)
        .select(col("event_type"), col("event_id"),
          expr("cast(round(value * 1000000) as bigint)").as("v6"))
      val med = graft.operators.Profile.exactQuantiles(
          v.select(col("event_type"), col("event_id"), col("v6")),
          "event_type", col("v6"), Seq(50))
        .select(col("event_type").as("__gm"), col("pctl_u").as("med100"))
      val dev = v.join(broadcast(med), v("event_type") <=> med("__gm"))
        .drop("__gm")
        .withColumn("dev100", abs(lit(100L) * col("v6") - col("med100")))
      val mad = graft.operators.Profile.exactQuantiles(
          dev, "event_type", col("dev100"), Seq(50))
        .select(col("event_type").as("__gd"), col("pctl_u").as("mad10000"))
      dev.join(broadcast(mad), dev("event_type") <=> mad("__gd"))
        .filter(lit(100L) * col("dev100") > lit(3L) * col("mad10000"))
        .select(dev("event_type"), col("event_id"), col("v6"), col("dev100"),
          col("mad10000"))
        .orderBy(col("event_type"), col("event_id"))
    }
    val qs = graft.SparkEntry.queries
    // warm both paths once
    t38Old().count(); teardown()
    qs("t38_token_budget")(spark, dir).count(); teardown()
    d15Old().count(); teardown()
    qs("d15_incremental_dedup")(spark, dir).count(); teardown()
    a18Old().count(); teardown()
    qs("a18_sample_quantiles")(spark, dir).count(); teardown()
    t28Old().count(); teardown()
    qs("t28_outliers")(spark, dir).count(); teardown()
    (1 to 3).foreach { i =>
      time(s"t38 OLD #$i") { t38Old().count() }; teardown()
      time(s"t38 NEW #$i") { qs("t38_token_budget")(spark, dir).count() }
      teardown()
      time(s"d15 OLD #$i") { d15Old().count() }; teardown()
      time(s"d15 NEW #$i") { qs("d15_incremental_dedup")(spark, dir).count() }
      teardown()
      time(s"a18 OLD #$i") { a18Old().count() }; teardown()
      time(s"a18 NEW #$i") { qs("a18_sample_quantiles")(spark, dir).count() }
      teardown()
      time(s"t28 OLD #$i") { t28Old().count() }; teardown()
      time(s"t28 NEW #$i") { qs("t28_outliers")(spark, dir).count() }
      teardown()
    }
  }

  private def trainers(spark: SparkSession, dir: String): Unit = {
    import graft.operators.{KMeans, ProductQuantizer}
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val n = time("embeddings count") { e.count() }
    println(s"PROBE n = $n, dim = ${e.select(size(col("embedding"))).head().getInt(0)}")
    (1 to 2).foreach { i =>
      time(s"kmeans fit k=256 it=2 #$i") {
        KMeans.fit(e, "vec_id", "embedding", k = 256, iterations = 2)
      }
      graft.core.Caching.CacheLedger.releaseAll(); spark.catalog.clearCache()
    }
    (1 to 2).foreach { i =>
      time(s"pq fit m=8 k=16 it=2 #$i") {
        ProductQuantizer.fit(e, "vec_id", "embedding", m = 8, k = 16, iterations = 2)
      }
      graft.core.Caching.CacheLedger.releaseAll(); spark.catalog.clearCache()
    }
    (1 to 2).foreach { i =>
      time(s"ivfpq fit coarseK=16 m=8 k=16 it=2 #$i") {
        ProductQuantizer.fitIvfPqExact(e, "vec_id", "embedding",
          coarseK = 16, m = 8, k = 16, iterations = 2)
      }
      graft.core.Caching.CacheLedger.releaseAll(); spark.catalog.clearCache()
    }
    // the store publish + read-back legs
    time("sq8 fit") { graft.operators.Sq8.fit(e, "vec_id", "embedding") }
    graft.operators.IndexStore.sweepPublishRoot()
    graft.queries.ModelCache.resetMemosForBench()
    time("ModelCache.kmeansCoarse (publish+read)") {
      graft.queries.ModelCache.kmeansCoarse(spark, dir)
    }
    time("ModelCache.pqModel (publish+read)") {
      graft.queries.ModelCache.pqModel(spark, dir)
    }
    time("ModelCache.ivfPqIndex (publish+read)") {
      graft.queries.ModelCache.ivfPqIndex(spark, dir)
    }
  }

  /** art_copurchase_triangles stage split over the (already built)
    * co-purchase edge artifact. */
  private def triangles(spark: SparkSession, dir: String): Unit = {
    val edges = graft.queries.GraphCache.coPurchaseEdges(spark, dir)
    time("warm input: edges count") { edges.count() }
    time("triangles cold") {
      noop(graft.operators.Triangles.perNodeCounts(edges, "a", "b"))
    }
    time("triangles warm") {
      noop(graft.operators.Triangles.perNodeCounts(edges, "a", "b"))
    }
    val e = edges.selectExpr("cast(a as long) a", "cast(b as long) b")
    val deg = e.selectExpr("a as v").unionAll(e.selectExpr("b as v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    time("deg agg") { noop(deg) }
    val dirE = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
    time("orient joins") { noop(dirE) }
    time("outlists agg") {
      noop(dirE.groupBy(col("u"))
        .agg(sort_array(collect_list(col("w"))).as("ns")))
    }
  }

  /** art_copurchase_weights stage split: scan+groupBy, pair explode,
    * pair groupBy, publish write. */
  private def copurchase(spark: SparkSession, dir: String): Unit = {
    val li = graft.Tables.lineitem(spark, dir)
    // warm the input page cache / JIT once
    time("warm: full build (1st, cold JIT)") {
      noop(graft.queries.GraphCache.coPurchaseWeightsOf(li))
    }
    val perOrder = li
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("ps"))
    time("stage1: groupBy(ok) collect_set") { noop(perOrder) }
    val pairs = perOrder.select(explode(expr(
      """flatten(transform(ps, (x, i) ->
        |  transform(slice(ps, i + 2, size(ps)), y ->
        |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
    time("stage2: + pair explode") { noop(pairs) }
    time("stage3: full build (warm)") {
      noop(graft.queries.GraphCache.coPurchaseWeightsOf(li))
    }
    time("stage4: publish+read+count (warm)") {
      graft.queries.GraphCache.resetMemoForTest()
      graft.queries.GraphCache.sweepSharedStore()
      graft.queries.GraphCache.coPurchaseWeights(spark, dir).count()
    }
    time("stage5: repeat") {
      graft.queries.GraphCache.resetMemoForTest()
      graft.queries.GraphCache.sweepSharedStore()
      graft.queries.GraphCache.coPurchaseWeights(spark, dir).count()
    }
  }
}
