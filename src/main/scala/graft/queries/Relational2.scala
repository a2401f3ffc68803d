package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._
import graft.operators.AsOfJoin

/** Second relational batch: scalar subquery, JSON access, scalar string/
  * date function coverage, and the as-of join. */
object Relational2 {

  /** q13: scalar-subquery filter — orders above 1.5× the mean price.
    * The threshold is computed exactly (decimal sum rounded before the
    * double cast) and broadcast; no driver-side collect. */
  def q13BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val stats = o.agg(
      round(sum(col("o_totalprice").cast(DecimalType(18, 6))), 2).cast("double").as("s"),
      count(lit(1)).as("n"))
    o.crossJoin(broadcast(stats))
      .filter(col("o_totalprice") > lit(1.5) * col("s") / col("n"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** q14: JSON column access — events.props is a JSON object; extract,
    * cast, aggregate. */
  def q14JsonProps(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** q15: scalar string-function coverage over customer names. */
  def q15StringFuncs(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir)
      .filter(col("c_custkey") < 1000)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("upper_name"),
        length(col("c_name")).cast("long").as("name_len"),
        substring(col("c_name"), 1, 8).as("prefix8"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        levenshtein(col("c_name"), lit("Customer")).cast("long").as("lev"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"))
      .orderBy(col("c_custkey"))

  /** q16: date/time scalar functions on order dates. */
  def q16DateFuncs(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .filter(col("o_orderkey") < 2000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"), // 0=Sunday, DuckDB convention
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("due_date"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("age_days"))
      .orderBy(col("o_orderkey"))

  /** q17: as-of join — each purchase event matched to the user's most
    * recent view event at or before it (one shuffle, no fan-out). */
  def q17AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    AsOfJoin.join(purchases, views, key = "user_id",
        leftTime = "ts", rightTime = "view_ts",
        rightValueCols = Seq("view_id", "view_ts"))
      .select(
        col("user_id"), col("event_id"),
        coalesce(col("asof_view_id"), lit(-1L)).as("view_id"),
        coalesce(
          round(col("ts").cast("double") - col("asof_view_ts").cast("double"), 3),
          lit(-1d)).as("gap_seconds"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_big_orders"   -> q13BigOrders _,
    "q14_json_props"   -> q14JsonProps _,
    "q15_string_funcs" -> q15StringFuncs _,
    "q16_date_funcs"   -> q16DateFuncs _,
    "q17_asof_join"    -> q17AsOfJoin _)

  val oracles: Map[String, String] = Map(
    "q13_big_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) FROM orders)
        |                         / (SELECT count(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q14_json_props" ->
      """SELECT event_type,
        |count(CAST(props->>'$.k' AS BIGINT)) AS n_with_k,
        |CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        |max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q15_string_funcs" ->
      """SELECT c_custkey,
        |upper(c_name) AS upper_name,
        |CAST(length(c_name) AS BIGINT) AS name_len,
        |substring(c_name, 1, 8) AS prefix8,
        |regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |CAST(levenshtein(c_name, 'Customer') AS BIGINT) AS lev,
        |concat_ws('|', c_mktsegment, c_name) AS tagged
        |FROM customer WHERE c_custkey < 1000 ORDER BY c_custkey""".stripMargin,
    "q16_date_funcs" ->
      """SELECT o_orderkey,
        |CAST(year(o_orderdate) AS BIGINT) AS y,
        |CAST(month(o_orderdate) AS BIGINT) AS m,
        |CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
        |strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
        |CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS age_days
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,
    "q17_asof_join" ->
      """WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS view_id, ts AS view_ts FROM events WHERE event_type = 'view')
        |SELECT p.user_id, p.event_id,
        |coalesce(v.view_id, -1) AS view_id,
        |coalesce(round(epoch(p.ts) - epoch(v.view_ts), 3), -1) AS gap_seconds
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.view_ts <= p.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin)
}
