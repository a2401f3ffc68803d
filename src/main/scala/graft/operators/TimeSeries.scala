package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a fixed grid per series key, carrying the last observation forward
  * across empty buckets (the standard gap-fill + ffill of every
  * metrics/feature store).
  *
  * Scale posture: one shuffle on (key, bucket) for the last-observation
  * aggregate (map-side combined — the `max(struct(ts, id, v))` partial
  * keeps one row per bucket per partition), then the grid explode is
  * O(span/step) per KEY — independent of event volume — and the
  * forward fill is one window sort per key over grid rows only. The
  * per-key window is the honest cost of ffill (it is a prefix scan);
  * keys are the parallelism unit, so 10⁶ series at 100 TB spread over
  * executors, and no window ever sees raw events — only buckets.
  */
object TimeSeries {

  /** Resample `df` to `stepSec`-second buckets per `keyCol`:
    * (key, bucket_ts, n_obs, v_last) for every grid step between the
    * key's first and last event, where `v_last` is the most recent
    * observation at or before the bucket (deterministic last-writer:
    * max (ts, id) order), carried forward across empty buckets
    * (n_obs = 0).
    *
    * `valueCol` must be an exact (integer-scaled) column so the fill
    * is engine-exact; `idCol` breaks same-timestamp ties. */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, valueCol: String,
                    stepSec: Long): DataFrame = {
    val step = lit(stepSec)
    val bucketed = df.select(col(keyCol).as("k"),
        (floor(unix_timestamp(col(tsCol)) / step) * step).as("bucket"),
        col(tsCol).as("ts"), col(idCol).as("id"), col(valueCol).as("v"))
      // a null timestamp has no bucket; letting it through would create
      // a null grid bound and poison the key's whole sequence()
      .filter(col("bucket").isNotNull)
      // last observation per bucket: struct max orders by (ts, id, v);
      // id is unique per row so v never decides the max — the winner is
      // the latest (ts, id), engine-reproducible
      .groupBy(col("k"), col("bucket"))
      .agg(count(lit(1)).as("n_obs"),
        max(struct(col("ts"), col("id"), col("v"))).as("last"))
      .select(col("k"), col("bucket"), col("n_obs"),
        col("last").getField("v").as("v_bucket"))
    val grid = bucketed.groupBy(col("k"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("k"),
        explode(expr(s"sequence(b0, b1, $stepSec)")).as("bucket"))
    val w = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, Seq("k", "bucket"), "left")
      .select(col("k"), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("v_bucket"), ignoreNulls = true).over(w).as("v_last"))
      .select(col("k"),
        date_format(timestamp_seconds(col("bucket")), "yyyy-MM-dd HH:mm:ss")
          .as("bucket_ts"),
        col("n_obs"), col("v_last"))
  }
}
