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
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark refuses to read
    * directly (PARQUET_TYPE_ILLEGAL). Read it as raw nanos via the legacy
    * flag and convert to a microsecond timestamp (`ts div 1000` is exact
    * long division — a double roundtrip would lose precision at 1.7e18).
    * Sub-microsecond truncation is invisible to every query here (they
    * truncate to ≥1 s granularity or compare >30 min gaps). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
