package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._

/** Fifth relational batch: grouping sets, correlated EXISTS/NOT EXISTS
  * subqueries, and the lateral-explode + map-type scalar surface. */
object Relational5 {

  /** q25: GROUPING SETS — the general form rollup (q08) and cube (q18)
    * specialize: ((flag, status), (flag), ()) in one pass. One shuffle;
    * Catalyst expands the sets map-side (Expand node), so the fact
    * table is still read once at 100 TB. */
  def q25GroupingSets(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity").cast(DecimalType(18, 6))), 2).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n_rows"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** q26: correlated EXISTS + NOT EXISTS — customers with a finalized
    * order but no pending one. Catalyst decorrelates both predicates
    * into one semi- and one anti-join on c_custkey
    * (RewritePredicateSubquery), so no per-row subquery ever runs —
    * the plan shape that survives 100 TB. */
  def q26Exists(spark: SparkSession, dir: String): DataFrame = {
    customer(spark, dir).createOrReplaceTempView("q26_customer")
    orders(spark, dir).createOrReplaceTempView("q26_orders")
    spark.sql(
      """SELECT c_custkey, c_name, c_acctbal
        |FROM q26_customer c
        |WHERE EXISTS (SELECT 1 FROM q26_orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM q26_orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** q27: lateral explode of the leading words with positional index,
    * plus MapType construction/extraction (map_from_arrays +
    * element_at) riding through codegen. Narrow (no shuffle): explode
    * and the scalar surface both run inside the scan stage. */
  def q27LateralWords(spark: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    documentsParallel(spark, dir)
      .select(col("doc_id"),
        posexplode(slice(split(col("text"), " "), 1, 10)).as(Seq("pos", "word")))
      .withColumn("m",
        map_from_arrays(array(lit("len"), lit("pos")),
          array(length(col("word")).cast("long"), col("pos").cast("long"))))
      .select(col("doc_id"), col("pos"),
        col("word"),
        element_at(col("m"), "len").as("word_len"),
        col("word").isin(stop: _*).cast("int").as("is_stop"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** q28: FULL OUTER join of two independent aggregates (order volume
    * vs event volume per entity) with null-safe equality on the
    * mismatch flag — the one outer-join shape q03/q11/q17/q22 don't
    * cover. Both sides pre-aggregate before the join, so the shuffle
    * carries one row per entity, not the fact tables. */
  def q28FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    val ev = events(spark, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    o.join(ev, o("o_custkey") === ev("user_id"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("user_id")).as("entity_id"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_orders").eqNullSafe(col("n_events")).cast("int").as("balanced"))
      .orderBy(col("entity_id"))
  }

  /** q29: UNPIVOT (melt) — the wide per-flag measure matrix back to
    * long form, the inverse of q12's pivot. Spark lowers `unpivot` to
    * the same Expand node as grouping sets: the aggregate output is
    * read once and fanned out map-side, no extra shuffle. */
  def q29Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(col("l_quantity").cast(DecimalType(18, 6))), 2).cast("double").as("qty"),
        round(sum(col("l_extendedprice").cast(DecimalType(18, 6))), 2).cast("double").as("price"),
        round(sum(col("l_discount").cast(DecimalType(18, 6))), 2).cast("double").as("disc"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("qty"), col("price"), col("disc")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))
  }

  /** q30: the skew remedy PROVEN equal to the plain aggregation — the
    * two-phase salted groupBy (see [[graft.operators.Skew.saltedStats]])
    * over decimal-exact values, hash-compared against DuckDB's unsalted
    * GROUP BY. Exactness requires algebraic partials over an exact
    * type: decimal sums merge order-free where double sums would not. */
  def q30SkewSalted(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedStats(
        lineitem(spark, dir).select(col("l_returnflag"), col("l_orderkey"),
          col("l_quantity").cast(DecimalType(12, 2)).as("qty")),
        key = "l_returnflag", valueCol = "qty", saltSource = "l_orderkey",
        buckets = 16)
      .select(col("l_returnflag"), col("n"),
        col("sum").cast("double").as("sum_qty"),
        col("min").cast("double").as("min_qty"),
        col("max").cast("double").as("max_qty"))
      .orderBy(col("l_returnflag"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_skew_salted"   -> q30SkewSalted _,
    "q25_grouping_sets" -> q25GroupingSets _,
    "q26_exists"        -> q26Exists _,
    "q27_lateral_words" -> q27LateralWords _,
    "q28_full_outer"    -> q28FullOuter _,
    "q29_unpivot"       -> q29Unpivot _)

  val oracles: Map[String, String] = Map(
    "q30_skew_salted" ->
      """SELECT l_returnflag, count(*) AS n,
        |CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |CAST(min(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS min_qty,
        |CAST(max(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS max_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q25_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |coalesce(l_linestatus, 'ALL') AS linestatus,
        |CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
        |count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q26_exists" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q28_full_outer" ->
      """WITH o AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey),
        |ev AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
        |SELECT coalesce(o_custkey, user_id) AS entity_id,
        |coalesce(n_orders, 0) AS n_orders,
        |coalesce(n_events, 0) AS n_events,
        |CAST(n_orders IS NOT DISTINCT FROM n_events AS INT) AS balanced
        |FROM o FULL OUTER JOIN ev ON o_custkey = user_id
        |ORDER BY entity_id""".stripMargin,
    "q29_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS qty,
        |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS price,
        |    CAST(round(sum(CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'qty' AS measure, qty AS value FROM w
        |UNION ALL SELECT l_returnflag, 'price', price FROM w
        |UNION ALL SELECT l_returnflag, 'disc', disc FROM w
        |ORDER BY l_returnflag, measure""".stripMargin,
    "q27_lateral_words" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ')[1:10] AS ws FROM documents)
        |SELECT doc_id, CAST(i - 1 AS INT) AS pos, ws[i] AS word,
        |CAST(length(ws[i]) AS BIGINT) AS word_len,
        |CAST(list_contains(['the','a','of','and','to','in','is'], ws[i]) AS INT) AS is_stop
        |FROM w, unnest(generate_series(1, len(ws))) AS t(i)
        |ORDER BY doc_id, pos""".stripMargin)
}
