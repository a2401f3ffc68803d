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
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
