package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.{Changelog, Clusters, FuzzyJoin, Profile, Sampling, ZOrder}

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
    Sampling.weightedTopK(documentsParallel(spark, dir), "source", "doc_id",
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

  /** q40: entity-resolution composite — the q33 fuzzy-join pair graph
    * (customer names within Levenshtein 1, deletion-neighborhood
    * blocked) closed into connected components
    * ([[Clusters.canonicalize]]): every customer gets a canonical
    * cluster id (the component minimum) and a keep bit. The
    * record-linkage workflow end to end in one hash-checked query; the
    * oracle replays the n² pair definition and a recursive-CTE closure. */
  def q40EntityClusters(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir).select(col("c_custkey"), col("c_name"))
    // pair graph from the shared GraphCache artifact (q33 reports the
    // SAME graph — one deletion-neighborhood build per JVM)
    val pairs = GraphCache.customerNamePairs(spark, dir)
      .select(col("ida").as("id_a"), col("idb").as("id_b"))
    Clusters.canonicalize(c, pairs, "c_custkey")
      .select(col("c_custkey"), col("c_name"), col("cluster_id"),
        col("keep").cast("int").as("keep"))
      .orderBy(col("c_custkey"))
  }

  /** q41: integer-exact equi-width histogram — 20 bins of
    * l_extendedprice (micro-units) per return flag
    * ([[Profile.histogram]]); one bounds broadcast, one binning
    * aggregate, |groups|·20 output rows. */
  def q41Histogram(spark: SparkSession, dir: String): DataFrame =
    Profile.histogram(lineitem(spark, dir), "l_returnflag",
        expr("cast(round(l_extendedprice * 1000000) as bigint)"), nBins = 20)
      .orderBy(col("l_returnflag"), col("bin"))

  /** t30: per-domain quality-score calibration — the t17 classifier
    * score mapped to its within-source percentile (percent_rank over
    * (score, doc_id)). Cross-domain thresholds on raw classifier
    * scores keep whole domains (a domain whose scores all sit high
    * would survive any global cut); calibrating to per-domain
    * percentiles makes one `cal >= x` threshold drop the same
    * FRACTION of every domain — the quality-filter fairness fix.
    * percent_rank is (rank−1)/(n−1): integer ranks both engines agree
    * on, one exactly-rounded double division. One shuffle on source. */
  def t30ScoreCalibration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    documentsParallel(spark, dir)
      .select(col("doc_id"), col("source"),
        round(graft.functions.GraftFunctions.classifierScore(col("text"), 4096), 6)
          .as("clf_score"))
      .withColumn("cal", percent_rank().over(
        Window.partitionBy(col("source"))
          .orderBy(col("clf_score"), col("doc_id"))))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_scd2"            -> q38Scd2 _,
    "q39_cdc_merge"       -> q39CdcMerge _,
    "t29_weighted_sample" -> t29WeightedSample _,
    "p24_zorder_layout"   -> p24ZorderLayout _,
    "q40_entity_clusters" -> q40EntityClusters _,
    "q41_histogram"       -> q41Histogram _,
    "t30_score_calibration" -> t30ScoreCalibration _)

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
      "\nORDER BY bucket"),
    "q40_entity_clusters" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        |  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |  WHERE levenshtein(a.c_name, b.c_name) <= 1),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |reach(id, lab) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst),
        |cc AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id)
        |SELECT c.c_custkey, c.c_name,
        |  COALESCE(cc.cluster_id, c.c_custkey) AS cluster_id,
        |  CAST(CASE WHEN c.c_custkey = COALESCE(cc.cluster_id, c.c_custkey)
        |    THEN 1 ELSE 0 END AS INT) AS keep
        |FROM customer c LEFT JOIN cc ON cc.id = c.c_custkey
        |ORDER BY c.c_custkey""".stripMargin,
    "q41_histogram" ->
      """WITH v AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 1000000) AS BIGINT) AS v6
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b AS (SELECT l_returnflag, min(v6) AS mn, max(v6) AS mx
        |  FROM v GROUP BY l_returnflag)
        |SELECT v.l_returnflag,
        |  ((v.v6 - b.mn) * 20) // (b.mx - b.mn + 1) AS bin,
        |  count(*) AS n_rows, min(v.v6) AS v_min, max(v.v6) AS v_max
        |FROM v JOIN b ON v.l_returnflag IS NOT DISTINCT FROM b.l_returnflag
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t30_score_calibration" ->
      """WITH s AS (
        |  SELECT doc_id, source,
        |    round(list_sum(list_transform(string_split(text, ' '),
        |      w -> ((('0x' || substr(md5(w), 1, 8))::BIGINT % 4096) * 2654435761) % 2001 - 1000))
        |      / (1000.0 * len(string_split(text, ' '))), 6) AS clf_score
        |  FROM documents)
        |SELECT doc_id, source, clf_score,
        |  percent_rank() OVER (PARTITION BY source
        |    ORDER BY clf_score, doc_id) AS cal
        |FROM s ORDER BY doc_id""".stripMargin)
}
