package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-log materialization operators — the two standard shapes a
  * warehouse derives from an append-only event/CDC stream:
  *
  *  - [[scd2Intervals]]: slowly-changing-dimension type-2 history
  *    (validity intervals per key, consecutive no-change runs
  *    collapsed) — the audit/"as of any time" view;
  *  - [[latestState]]: merge-on-read compaction to current state
  *    (latest surviving row per key, tombstones deleting) — the
  *    Hudi/Iceberg MERGE semantics as one aggregation.
  *
  * Both are engine-exact: ordering is (ts, unique id) everywhere, so
  * ties are impossible and a SQL twin replays row for row.
  *
  * Scale posture: scd2Intervals is ONE shuffle on the key (all three
  * windows and the island aggregation share the (key, ts, id)
  * clustering — Catalyst plans one Exchange and sorts within
  * partitions); latestState is a single map-side-combined max_by
  * aggregate — no window, no sort, the (key, 1-struct) rows are all
  * that shuffles, which is why it is the 100 TB compaction shape.
  */
object Changelog {

  /** Open-interval sentinel (the SCD2 "high date" convention). */
  val HighDate = "9999-12-31 00:00:00"

  /** SCD2 validity intervals of `stateCol` per `keyCol`, ordered by
    * (`tsCol`, `idCol`); consecutive events with an unchanged state
    * merge into one interval (gaps-and-islands: a change flag from
    * lag, a running sum to number the islands). Output per interval:
    * (key, state, valid_from, valid_to, n_events, is_current) with
    * formatted timestamps and [[HighDate]] on the open interval. */
  def scd2Intervals(events: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__id"))
    val base = events.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      col(idCol).as("__id"), col(stateCol).as("__st"))
    val islands = base
      .withColumn("__chg",
        when(lag(col("__st"), 1).over(w) === col("__st"), lit(0L))
          .otherwise(lit(1L)))
      .withColumn("__grp", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__k"), col("__grp"))
      .agg(min(col("__st")).as("__state"), min(col("__ts")).as("__vf"),
        count(lit(1)).as("n_events"))
    val wi = Window.partitionBy(col("__k")).orderBy(col("__vf"))
    islands
      .withColumn("__vt", lead(col("__vf"), 1).over(wi))
      .select(col("__k").as(keyCol), col("__state").as("state"),
        date_format(col("__vf"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        coalesce(date_format(col("__vt"), "yyyy-MM-dd HH:mm:ss"),
          lit(HighDate)).as("valid_to"),
        col("n_events"),
        when(col("__vt").isNull, lit(1)).otherwise(lit(0)).as("is_current"))
  }

  /** The DuckDB replay of [[scd2Intervals]] (same windows, same
    * island numbering) over table `src` with the caller's column
    * names. */
  def scd2OracleSql(src: String, keyCol: String, tsCol: String,
                    idCol: String, stateCol: String): String =
    s"""WITH m AS (SELECT $keyCol AS k, $tsCol AS ts, $idCol AS id,
       |    $stateCol AS st,
       |    CASE WHEN lag($stateCol) OVER (PARTITION BY $keyCol
       |        ORDER BY $tsCol, $idCol) = $stateCol
       |      THEN 0 ELSE 1 END AS chg
       |  FROM $src),
       |g AS (SELECT *, sum(chg) OVER (PARTITION BY k ORDER BY ts, id
       |    ROWS UNBOUNDED PRECEDING) AS grp FROM m),
       |i AS (SELECT k, grp, min(st) AS state, min(ts) AS vf,
       |    count(*) AS n_events
       |  FROM g GROUP BY k, grp),
       |f AS (SELECT k, state, vf, n_events,
       |    lead(vf) OVER (PARTITION BY k ORDER BY vf) AS vt FROM i)
       |SELECT k AS $keyCol, state,
       |  strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
       |  COALESCE(strftime(vt, '%Y-%m-%d %H:%M:%S'), '$HighDate')
       |    AS valid_to,
       |  n_events,
       |  CAST(CASE WHEN vt IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
       |FROM f""".stripMargin

  /** Latest-wins CDC compaction: one row per key — the change with the
    * greatest (`tsCol`, `idCol`) — DROPPED entirely when that latest
    * change satisfies `tombstone` (the delete marker). `payload`
    * columns ride through from the winning row; `n_changes` counts
    * every change seen for the key (the merge audit).
    *
    * One aggregation: max_by over a (ts, id) struct partial-aggregates
    * map-side, so only one candidate row per key per partition
    * shuffles — no window, no per-key sort. */
  def latestState(changes: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, tombstone: Column,
                  payload: Seq[String]): DataFrame = {
    val payloadStruct = struct(
      (Seq(tsCol) ++ payload).map(c => col(c).as(c)) :+
        tombstone.as("__del"): _*)
    changes
      .groupBy(col(keyCol))
      .agg(max_by(payloadStruct, struct(col(tsCol), col(idCol))).as("__w"),
        count(lit(1)).as("n_changes"))
      .filter(!col("__w.__del"))
      .select(col(keyCol) +:
        payload.map(c => col(s"__w.$c").as(c)) :+
        date_format(col(s"__w.$tsCol"), "yyyy-MM-dd HH:mm:ss")
          .as("updated_at") :+
        col("n_changes"): _*)
  }
}
