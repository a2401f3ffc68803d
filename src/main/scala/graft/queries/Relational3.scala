package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._

/** Third relational batch: cube, exact percentiles, semi join, union
  * distinct. */
object Relational3 {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))

  /** q18: CUBE over (returnflag, linestatus) — all four grouping sets. */
  def q18Cube(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_price"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** q19: exact interpolated percentiles (median, p90) per return flag —
    * Spark `percentile` and DuckDB `quantile_cont` share the linear
    * interpolation definition. */
  def q19Percentiles(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("median_price"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** q20: semi join — orders having at least one returned high-quantity
    * line (EXISTS). */
  def q20ReturnedOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val li = lineitem(spark, dir)
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 30)
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy(col("o_orderkey"))
  }

  /** q21: UNION (distinct) of two key projections — set-dedup semantics. */
  def q21UnionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val fromOrders = orders(spark, dir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("custkey"))
    val fromSegment = customer(spark, dir)
      .filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey").as("custkey"))
    fromOrders.union(fromSegment).distinct().orderBy(col("custkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_cube"            -> q18Cube _,
    "q19_percentiles"     -> q19Percentiles _,
    "q20_returned_orders" -> q20ReturnedOrders _,
    "q21_union_distinct"  -> q21UnionDistinct _)

  val oracles: Map[String, String] = Map(
    "q18_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |coalesce(l_linestatus, 'ALL') AS linestatus,
        |count(*) AS n,
        |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q19_percentiles" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
        |round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
        |count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q20_returned_orders" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R' AND l_quantity >= 30)
        |ORDER BY o_orderkey""".stripMargin,
    "q21_union_distinct" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |UNION
        |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        |ORDER BY custkey""".stripMargin)
}
