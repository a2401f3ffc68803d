package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware aggregation: two-phase salted groupBy for hot keys.
  *
  * A plain `groupBy(key)` sends every row of a hot key to one reducer;
  * at 100 TB one skewed key stalls the stage. Salting splits each key
  * into `buckets` sub-groups aggregated in parallel, then merges the
  * partials — the classic remedy when AQE's skew handling can't help
  * (it only splits *join* partitions, not aggregation groups).
  *
  * The partial/merge pairs must be algebraic: count→sum, sum→sum,
  * min→min, max→max. The convenience [[saltedStats]] covers those; for
  * arbitrary mergeable state use a typed Aggregator instead.
  */
object Skew {

  /** Deterministic salt in [0, buckets): hashes a distinguishing column
    * (row identity), NOT rand() — task retries must re-produce the same
    * salt or partial aggregates double-count. */
  def salt(distinct: Column, buckets: Int): Column =
    pmod(xxhash64(distinct), lit(buckets.toLong)).cast("int")

  /** count/sum/min/max over `valueCol` grouped by `key`, computed with a
    * salted partial phase. Result is identical to the unsalted groupBy. */
  def saltedStats(df: DataFrame, key: String, valueCol: String,
                  saltSource: String, buckets: Int = 16): DataFrame =
    df
      .withColumn("__salt", salt(col(saltSource), buckets))
      .groupBy(col(key), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol)).as("__s"),
        min(col(valueCol)).as("__mn"),
        max(col(valueCol)).as("__mx"))
      .groupBy(col(key))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).as("sum"),
        min(col("__mn")).as("min"),
        max(col("__mx")).as("max"))
}
