package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Thirteenth batch (round 6, driver session, cont. 2): capacity /
  * concurrency analytics over the events stream. */
object Relational13 {

  /** q49: peak concurrent sessions per day — the classic sweep-line
    * (interval-overlap) readout, built WITHOUT the textbook global
    * window sort: sessionize (q10's 30-min-gap rule), emit ±1 boundary
    * deltas, order them by the two-level [[graft.operators.GlobalIds]]
    * rank (range partition + per-partition counters), and running-sum
    * the deltas with the two-level exclusive prefix sum — at any
    * corpus size the only single-task stage folds `corpus/1024` bucket
    * totals. The standard SQL form (`sum(delta) OVER (ORDER BY ...)`)
    * is the oracle, and is exactly the plan that does NOT survive
    * scale (one unpartitioned WindowExec holding every boundary).
    *
    * Interval semantics are closed [start, end]: the −1 lands at
    * `end_us + 1` so a single-event session still occupies its
    * instant, and a session starting exactly when another ends (same
    * microsecond) overlaps it. Boundary order is (us, flag, user_id)
    * with ends (flag 0) before starts (flag 1) — a unique total order
    * (one user's sessions are disjoint and >30 min apart), so every
    * row's running value is deterministic in both engines.
    *
    * Output: per day (of the boundary event's own timestamp), the
    * maximum in-flight session count observed at any boundary and the
    * epoch-microsecond of the first boundary attaining it. */
  def q49PeakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val bounds = events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > 1800d, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
    graft.operators.Analytics.peakConcurrency(bounds, "user_id", "st", "en")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_peak_concurrency" -> q49PeakConcurrency _)

  val oracles: Map[String, String] = Map(
    "q49_peak_concurrency" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged
        |), bounds AS (
        |  SELECT user_id, min(ts) AS st, max(ts) AS en
        |  FROM sess GROUP BY user_id, session_id
        |), ep AS (
        |  SELECT user_id, st AS ts, epoch_us(st) AS us_ord, 1 AS flag, 1 AS delta
        |  FROM bounds
        |  UNION ALL
        |  SELECT user_id, en AS ts, epoch_us(en) + 1 AS us_ord, 0 AS flag, -1 AS delta
        |  FROM bounds
        |), run AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, epoch_us(ts) AS us,
        |    CAST(sum(delta) OVER (ORDER BY us_ord, flag, user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
        |  FROM ep
        |), pk AS (
        |  SELECT day, max(conc) AS peak_sessions FROM run GROUP BY day
        |)
        |SELECT pk.day, pk.peak_sessions, min(r.us) AS first_peak_us
        |FROM pk JOIN run r ON r.day = pk.day AND r.conc = pk.peak_sessions
        |GROUP BY pk.day, pk.peak_sessions
        |ORDER BY pk.day""".stripMargin)
}
