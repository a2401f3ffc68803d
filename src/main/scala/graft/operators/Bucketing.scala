package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout helpers: pre-shuffle fact tables once at write time
  * so repeated key joins/aggregations run with ZERO exchanges.
  *
  * At 100 TB this is the difference between every `lineitem ⋈ orders`
  * paying a full shuffle of both sides and paying it once at ingest:
  * both tables bucketed by the join key into the same bucket count give
  * Catalyst matching output partitioning, and the sort-merge join reads
  * co-located buckets directly (verified by BucketingSpec: no Exchange
  * in the joined plan).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets —
    * sort-merge joins then skip their sort too). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key: exchange-free. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
