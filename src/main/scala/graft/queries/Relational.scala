package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables._

/** Relational query surface: scan / filter / project / aggregate / join /
  * window / sort / top-k / set ops / rollup — the standard-operator
  * checklist of SURVEY.md §2.8, exercised over the TPC-H-ish testdata.
  *
  * Cross-engine parity notes (these queries are hash-compared against
  * DuckDB running the SQL in [[oracles]]):
  *  - All money/quantity arithmetic is done in DECIMAL(18,6) (exact, so
  *    summation order — which differs between engines — cannot change the
  *    result) and cast to DOUBLE only at the end.
  *  - Counts are BIGINT on both sides (DuckDB sum(int) yields HUGEINT, so
  *    oracle SQL casts).
  *  - Every query has a total deterministic ORDER BY.
  *  - Timestamps are truncated (date / date_trunc) before output: events.ts
  *    is nanosecond-precision parquet, which Spark reads at microsecond
  *    precision while DuckDB keeps nanos.
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  /** TPC-H Q1-style pricing summary: the canonical scan→hash-agg plan.
    * At 100 TB this is a pure map-side-partial + final agg on 6 groups —
    * no skew risk, shuffle carries only the grouped partials. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("sum_base_price"),
        round(sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)).cast(DecimalType(18, 6)) - dec(col("l_discount")))), 2)
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Filtered detail projection — exists to prove predicate pushdown +
    * column pruning reach the parquet scan (PushedFilters / ReadSchema). */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    li.filter(col("l_returnflag") === "R" && col("l_discount") > 0.05)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** TPC-H Q5-style star join: fact table joins small dims. nation/region
    * are broadcast explicitly; customer/orders stay on the shuffle path
    * (at 100 TB customer is too big to broadcast).
    *
    * Eager aggregation: lineitem collapses to per-order partials BEFORE
    * the join (~4× fewer join-input rows; the join shuffle carries one
    * exact-decimal partial instead of two doubles per line). Partial
    * decimal sums re-summed after the join are bit-identical to the
    * single-pass sum — measured ~20% faster at sf0.1, and the row-count
    * reduction compounds at scale. */
  def q03RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val o  = orders(spark, dir)
    val c  = customer(spark, dir)
    val n  = nation(spark, dir)
    val r  = region(spark, dir)
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)).cast(DecimalType(18, 6)) - dec(col("l_discount"))))
          .as("order_rev"),
        count(lit(1)).as("order_lines"))
    perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(r("r_name").isin("ASIA", "EUROPE"))
      .groupBy(n("n_name").as("nation"))
      .agg(
        round(sum(col("order_rev")), 2).cast("double").as("revenue"),
        sum(col("order_lines")).as("n_lines"))
      .orderBy(col("revenue").desc, col("nation"))
  }

  /** Top-k by sort: Catalyst plans orderBy+limit as TakeOrderedAndProject —
    * no full sort/shuffle of the fact table. */
  def q04TopOrders(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Window functions: per-customer order sequence + running spend.
    * One shuffle on o_custkey serves both window functions (same frame). */
  def q05RunningSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_spend",
        round(sum(dec(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("running_spend"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Distinct aggregation (expand + two-phase agg under the hood). */
  def q06DistinctParts(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))

  /** Set operations: customers that placed orders EXCEPT the BUILDING
    * segment (SQL EXCEPT = distinct anti semantics). */
  def q07SetOps(spark: SparkSession, dir: String): DataFrame = {
    val withOrders = orders(spark, dir).select(col("o_custkey").as("custkey"))
    val building = customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    withOrders.except(building).orderBy(col("custkey"))
  }

  /** Rollup (grouping sets): subtotals per flag and grand total. NULL
    * grouping keys are coalesced to 'ALL' so engine NULL-ordering
    * differences can't affect the comparison. */
  def q08Rollup(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Event-time tumbling window aggregation (batch form of the streaming
    * hourly rollup — same plan shape Structured Streaming produces). */
  def q09EventsHourly(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(dec(col("value"))), 2).cast("double").as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Sessionization: split each user's event stream at >30 min gaps (lag +
    * cumulative flag-sum), then aggregate per session. Single shuffle on
    * user_id; both windows and the final groupBy reuse that partitioning. */
  def q10Sessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > 1800d, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(dec(col("value"))), 2).cast("double").as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Anti join: customers that never ordered (NOT EXISTS). */
  def q11NeverOrdered(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val o = orders(spark, dir).filter(col("o_orderdate") >= "2001-01-01")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Conditional aggregation (manual pivot) over the events stream. */
  def q12EventPivot(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"),
        round(sum(when(col("event_type") === "purchase", dec(col("value"))).otherwise(lit(null))), 2)
          .cast("double").as("purchase_value"))
      .orderBy(col("user_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary _,
    "q02_filter_project"  -> q02FilterProject _,
    "q03_revenue_nation"  -> q03RevenueByNation _,
    "q04_top_orders"      -> q04TopOrders _,
    "q05_running_spend"   -> q05RunningSpend _,
    "q06_distinct_parts"  -> q06DistinctParts _,
    "q07_setops"          -> q07SetOps _,
    "q08_rollup"          -> q08Rollup _,
    "q09_events_hourly"   -> q09EventsHourly _,
    "q10_sessions"        -> q10Sessions _,
    "q11_never_ordered"   -> q11NeverOrdered _,
    "q12_event_pivot"     -> q12EventPivot _)

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
        |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS sum_disc_price,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty,
        |count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem WHERE l_returnflag = 'R' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_revenue_nation" ->
      """SELECT n_name AS nation,
        |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
        |count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA','EUROPE')
        |GROUP BY n_name ORDER BY revenue DESC, nation""".stripMargin,
    "q04_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q05_running_spend" ->
      """SELECT o_custkey, o_orderkey,
        |row_number() OVER w AS rn,
        |CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q06_distinct_parts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_lines
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q07_setops" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY custkey""".stripMargin,
    "q08_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |coalesce(l_linestatus, 'ALL') AS linestatus,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q09_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |count(*) AS n,
        |CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q10_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session,
        |    ts, event_id
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
        |CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS session_value
        |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "q11_never_ordered" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q12_event_pivot" ->
      """SELECT user_id,
        |CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
        |CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
        |CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |CAST(round(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS purchase_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
}
