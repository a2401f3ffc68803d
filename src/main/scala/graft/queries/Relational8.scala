package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.{Changelog, Sampling, ZOrder}

/** Eighth batch (round 5, continued): change-log materialization
  * (SCD2 history + CDC latest-wins compaction), deterministic weighted
  * sampling, and Z-order layout statistics. Every query is engine-
  * exact with a full DuckDB oracle. */
object Relational8 {

  /** q38: SCD2 dimension history from the event log — each user's
    * event_type as the tracked attribute, consecutive no-change runs
    * collapsed into validity intervals ([[Changelog.scd2Intervals]]).
    * One shuffle on user_id; all windows share its clustering. */
  def q38Scd2(spark: SparkSession, dir: String): DataFrame =
    Changelog.scd2Intervals(events(spark, dir), "user_id", "ts",
        "event_id", "event_type")
      .orderBy(col("user_id"), col("valid_from"))

  /** q39: CDC latest-wins compaction — current state per user from the
    * change stream, an 'error' as the latest change tombstoning the
    * key ([[Changelog.latestState]]); values carried as exact
    * micro-units. ONE map-side-combined aggregation — the 100 TB
    * merge-on-read shape (no window, no per-key sort). */
  def q39CdcMerge(spark: SparkSession, dir: String): DataFrame =
    Changelog.latestState(
        events(spark, dir).select(col("user_id"), col("event_id"),
          col("ts"), col("event_type"),
          expr("cast(round(value * 1000000) as bigint)").as("v6")),
        "user_id", "ts", "event_id",
        tombstone = col("event_type") === "error",
        payload = Seq("event_type", "v6"))
      .withColumnRenamed("event_type", "last_type")
      .withColumnRenamed("v6", "last_value6")
      .orderBy(col("user_id"))

  /** t29: reproducible weighted sampling — 50 documents per source,
    * drawn with probability proportional to length (Efraimidis-
    * Spirakis over salted-md5 uniforms, [[Sampling.weightedTopK]]);
    * the mixture-building complement to t22's rate gate and t26's
    * uniform bottom-k. */
  def t29WeightedSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.weightedTopK(documents(spark, dir), "source", "doc_id",
        "n_chars", k = 50)
      .orderBy(col("stratum"), col("rank"))

  /** p24: Z-order layout statistics — lineitem bucketed by the Morton
    * interleave of (l_partkey, l_suppkey), per-bucket min-max stats,
    * and the `touched` pruning flag for a two-column query box
    * ([[ZOrder.bucketStats]]): the multi-dimensional clustering a
    * min-max-indexed store needs before either column can prune. */
  def p24ZorderLayout(spark: SparkSession, dir: String): DataFrame =
    ZOrder.bucketStats(lineitem(spark, dir), "l_partkey", "l_suppkey",
        bucketShift = 16, aLo = 1000L, aHi = 1200L, bLo = 100L, bHi = 140L)
      .orderBy(col("bucket"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_scd2"            -> q38Scd2 _,
    "q39_cdc_merge"       -> q39CdcMerge _,
    "t29_weighted_sample" -> t29WeightedSample _,
    "p24_zorder_layout"   -> p24ZorderLayout _)

  val oracles: Map[String, String] = Map(
    "q38_scd2" -> (Changelog.scd2OracleSql("events", "user_id", "ts",
      "event_id", "event_type") + "\nORDER BY user_id, valid_from"),
    "q39_cdc_merge" ->
      """WITH r AS (SELECT user_id, event_type,
        |    CAST(round(value * 1000000) AS BIGINT) AS v6, ts,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_changes
        |  FROM events)
        |SELECT user_id, event_type AS last_type, v6 AS last_value6,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS updated_at, n_changes
        |FROM r WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,
    "t29_weighted_sample" -> (Sampling.oracleSql("documents", "source",
      "doc_id", "n_chars", k = 50) + "\nORDER BY stratum, rank"),
    "p24_zorder_layout" -> (ZOrder.oracleSql("lineitem", "l_partkey",
      "l_suppkey", bucketShift = 16,
      aLo = 1000L, aHi = 1200L, bLo = 100L, bHi = 140L) +
      "\nORDER BY bucket"))
}
