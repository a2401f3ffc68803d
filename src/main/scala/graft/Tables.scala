package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All queries take `(spark, sfDir)` and read parquet directly so the
  * parquet scan is the leaf of the Catalyst plan — filters and column
  * pruning push down to the scan (verified via `.explain("formatted")`:
  * `PushedFilters` / `ReadSchema`).
  */
object Tables {
  /** Tables smaller than this skip the single-split repartition below
    * (a broadcast-side dimension gains nothing from an exchange). */
  private val MinRepartitionBytes = 131072L

  /** (path|parallelism) → planned scan partition count, memoized: the
    * count requires planning the bare scan once per table per session
    * shape. */
  private val splitMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Read a testdata table: a plain parquet scan, no exchange above it.
    * r14: the r13 per-TABLE repartition gate (documents/customer) taxed
    * every CHEAP consumer of those tables ~0.2–0.7 s to shuffle a text
    * column it barely processes (driver r12→r13: t27 0.21→2.09, t12
    * 0.21→1.50, t13 0.26→1.21 — the round-13 verdict's finding #2).
    * The parallelization is now OPT-IN at the consumer via
    * [[tableParallel]]: only queries whose scans carry heavy per-row
    * compute (tokenization, shingle hashing, term matching, edit
    * distance, digesting) request it. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Read a testdata table, parallelizing single-row-group scans
    * (r13, made consumer-opt-in in r14): a row group is parquet's
    * split floor, and the sf-scale corpus tables ship as ONE file with
    * one row group apiece — so every scan-local heavy stage
    * (tokenization, shingle hashing, cosine fan-outs against broadcast
    * queries) ran on ONE core of local[32] until its first exchange.
    * When the planned scan has less than half the session's
    * parallelism AND the file carries enough bytes to matter, insert
    * one hash exchange right above the scan; the bytes are
    * corpus-table-sized (≤ ~11 MB at sf0.1), so the exchange is
    * trivially cheap next to the work it parallelizes. Deterministic
    * filters and column pruning push THROUGH Repartition, so
    * PushedFilters/ReadSchema at the scan are unchanged. At production
    * scale (files/row groups ≥ cores) the guard is false and the plan
    * is untouched — the scale-adaptive rule, not a local[32] constant.
    *
    * Relational tables were A/B'd in r13 and LOST (join/agg-bound,
    * first exchange immediate: q36 funnel 0.87 → 1.31 s); embeddings
    * lost net too (most consumers aggregate or sample it cheaply;
    * KMeans.fit repartitions its own training projection) — only
    * scan-compute-heavy documents/customer consumers call this. */
  def tableParallel(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    val target = spark.sparkContext.defaultParallelism
    val bytes =
      try java.nio.file.Files.size(java.nio.file.Paths.get(path))
      catch { case _: Throwable => 0L } // non-local store: leave untouched
    if (bytes < MinRepartitionBytes) df
    else {
      val scanParts = splitMemo.computeIfAbsent(s"$path|$target",
        _ => Integer.valueOf(df.rdd.getNumPartitions)).intValue()
      // HASH partitioning on the leading (id) column, NOT round-robin:
      // repartition(n) pays spark.sql.execution.sortBeforeRepartition —
      // a full local sort of the whole single-partition table inside
      // one task (the r13 full-bench run measured it as +1–4 s on every
      // text/event-bearing row: 228 s vs 172 s total). Hash exchange
      // has no such sort, and the leading column is the table's unique
      // id, so the spread is even.
      if (scanParts * 2 <= target)
        df.repartition(target, org.apache.spark.sql.functions.col(
          df.schema.fields.head.name))
      else df
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  /** events.ts has shipped as both TIMESTAMP(NANOS) — which Spark refuses
    * to read directly (PARQUET_TYPE_ILLEGAL) — and plain timestamp[us],
    * depending on testdata generation. Adapt to whichever type the scan
    * yields: raw nanos via the legacy flag become a microsecond timestamp
    * (`ts div 1000` is exact long division — a double roundtrip would lose
    * precision at 1.7e18); native timestamp[us] (read as TIMESTAMP_NTZ) is
    * cast to the session-TZ timestamp so downstream query types match the
    * nanos path (sessions run UTC, so wall-clock == instant).
    * Sub-microsecond truncation is invisible to every query here (they
    * truncate to ≥1 s granularity or compare >30 min gaps). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  /** documents with the single-row-group scan parallelized — for the
    * scan-compute-heavy consumers only (tokenization/shingling/term
    * matching/digest queries); see [[tableParallel]]. */
  def documentsParallel(spark: SparkSession, dir: String): DataFrame =
    tableParallel(spark, dir, "documents")
  /** customer with the single-row-group scan parallelized — for the
    * edit-distance pair generation (q33/q40 name pairs); see
    * [[tableParallel]]. */
  def customerParallel(spark: SparkSession, dir: String): DataFrame =
    tableParallel(spark, dir, "customer")
}
