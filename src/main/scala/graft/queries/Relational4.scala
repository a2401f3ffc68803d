package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._
import graft.operators.RangeJoin

/** Fourth relational batch: range join and the wider window-function
  * surface. */
object Relational4 {

  /** q22: range join — events matched to the order-activity interval of
    * their user (interval = [first order, last order] per customer with
    * custkey = user_id), via the binned equi-join plan. */
  def q22RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("double").as("point"))
    val intervals = orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        min(col("o_orderdate").cast("timestamp").cast("double")).as("start_s"),
        max(col("o_orderdate").cast("timestamp").cast("double")).as("end_s"))
      // stretch the interval forward so it actually overlaps the 2024
      // event window for a subset of users (orders end in 2001)
      .select(col("o_custkey"),
        col("start_s"),
        (col("end_s") + (col("o_custkey") % 200) * lit(6000000.0)).as("end_s"))
    RangeJoin.binned(ev, intervals, "point", "start_s", "end_s",
        binWidth = 86400L * 365,
        equiKeys = Seq("user_id" -> "o_custkey"))
      .select(col("event_id"), col("user_id"))
      .orderBy(col("event_id"))
  }

  /** q23: window-function zoo — lag/lead, ntile, percent_rank, dense
    * rank, first/last value over one customer-order window. */
  def q23WindowZoo(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFrame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(spark, dir)
      .filter(col("o_custkey") < 200)
      .select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1, -1L).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1, -1L).over(w).as("next_order"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        dense_rank().over(w).as("drank"),
        first(col("o_orderkey")).over(wFrame).as("first_order"),
        last(col("o_orderkey")).over(wFrame).as("last_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q24: TPC-H Q14-style promo revenue share per ship-year — a
    * conditional-ratio aggregate over a fact⋈dim join (part broadcast). */
  def q24PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val p = part(spark, dir)
    val disc = col("l_extendedprice").cast(DecimalType(18, 6)) *
      (lit(BigDecimal(1)).cast(DecimalType(18, 6)) - col("l_discount").cast(DecimalType(18, 6)))
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(
        round(sum(when(col("p_type") === "PROMO", disc).otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 6)))), 2)
          .cast("double").as("promo_revenue"),
        round(sum(disc), 2).cast("double").as("total_revenue"))
      .withColumn("promo_pct",
        round(lit(100.0) * col("promo_revenue") / nullif(col("total_revenue"), lit(0.0)), 6))
      .orderBy(col("ship_year"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_range_join" -> q22RangeJoin _,
    "q23_window_zoo" -> q23WindowZoo _,
    "q24_promo_revenue" -> q24PromoRevenue _)

  val oracles: Map[String, String] = Map(
    "q24_promo_revenue" ->
      """WITH j AS (
        |  SELECT year(l_shipdate) AS ship_year, p_type,
        |    CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS disc
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT CAST(ship_year AS BIGINT) AS ship_year,
        |CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN disc ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS promo_revenue,
        |CAST(round(sum(disc), 2) AS DOUBLE) AS total_revenue,
        |round(100.0 * CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN disc ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
        |  / nullif(CAST(round(sum(disc), 2) AS DOUBLE), 0.0), 6) AS promo_pct
        |FROM j GROUP BY ship_year ORDER BY ship_year""".stripMargin,
    "q22_range_join" ->
      """WITH iv AS (
        |  SELECT o_custkey, min(epoch(o_orderdate)) AS start_s,
        |    max(epoch(o_orderdate)) + (o_custkey % 200) * 6000000.0 AS end_s
        |  FROM orders GROUP BY o_custkey)
        |SELECT event_id, user_id FROM events, iv
        |WHERE user_id = o_custkey AND epoch(ts) >= start_s AND epoch(ts) <= end_s
        |ORDER BY event_id""".stripMargin,
    "q23_window_zoo" ->
      """SELECT o_custkey, o_orderkey,
        |coalesce(lag(o_orderkey) OVER w, -1) AS prev_order,
        |coalesce(lead(o_orderkey) OVER w, -1) AS next_order,
        |CAST(ntile(4) OVER w AS INT) AS quartile,
        |round(percent_rank() OVER w, 6) AS pct_rank,
        |CAST(dense_rank() OVER w AS INT) AS drank,
        |first_value(o_orderkey) OVER wf AS first_order,
        |last_value(o_orderkey) OVER wf AS last_order
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
}
