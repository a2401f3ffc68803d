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

  /** Tables whose scans carry heavy PER-ROW compute (tokenization,
    * shingle hashing, edit distance) — the ones where a
    * single-row-group scan serializes real work. The relational
    * tables (lineitem/orders/events) hit their first exchange almost
    * immediately (join/agg-bound), and the full-bench A/B showed the
    * blanket exchange costing them more scheduling overhead than it
    * bought (q36 funnel 0.87 → 1.31 s) while the corpus tables won
    * big (t43 2.07 → 0.75 s, a11 2.8 → 1.7 s). embeddings was A/B'd
    * too and LOST net: most consumers aggregate or sample it cheaply
    * and paid the extra AQE stage (a34 2.17 → 1.31, t22 1.27 → 0.78,
    * p29 1.69 → 1.18, a37 2.29 → 1.84 without it) against two modest
    * winners (a15 0.86 → 1.46, a21 0.92 → 1.25 with it); vector-heavy
    * operators that need the spread (KMeans.fit) already repartition
    * their own training projection. */
  private val RepartitionTables = Set("documents", "customer")

  /** (path|parallelism) → planned scan partition count, memoized: the
    * count requires planning the bare scan once per table per session
    * shape. */
  private val splitMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Read a testdata table, parallelizing single-row-group scans
    * (r13): a row group is parquet's split floor, and the sf-scale
    * corpus tables ship as ONE file with one row group apiece — so
    * every scan-local heavy stage (tokenization, shingle hashing,
    * cosine fan-outs against broadcast queries) ran on ONE core of
    * local[32] until its first exchange. When the planned scan has
    * less than half the session's parallelism AND the file carries
    * enough bytes to matter, insert one round-robin exchange right
    * above the scan; the bytes are corpus-table-sized (≤ ~11 MB at
    * sf0.1), so the exchange is trivially cheap next to the work it
    * parallelizes. Deterministic filters and column pruning push
    * THROUGH Repartition, so PushedFilters/ReadSchema at the scan are
    * unchanged. At production scale (files/row groups ≥ cores) the
    * guard is false and the plan is untouched — the scale-adaptive
    * rule, not a local[32] constant. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    val target = spark.sparkContext.defaultParallelism
    val bytes =
      try java.nio.file.Files.size(java.nio.file.Paths.get(path))
      catch { case _: Throwable => 0L } // non-local store: leave untouched
    if (bytes < MinRepartitionBytes || !RepartitionTables.contains(name)) df
    else {
      val scanParts = splitMemo.computeIfAbsent(s"$path|$target",
        _ => Integer.valueOf(df.rdd.getNumPartitions)).intValue()
      // HASH partitioning on the leading (id) column, NOT round-robin:
      // repartition(n) pays spark.sql.execution.sortBeforeRepartition —
      // a full local sort of the whole single-partition table inside
      // one task (the full-bench run measured it as +1–4 s on every
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
}
