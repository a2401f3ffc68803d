package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.{Kmv, Profile}

/** Sixth batch: the data-profiling surface — single-pass table
  * profiles (KMV distinct sketches) and exact interpolated quantiles,
  * both engine-exact down to the hash. */
object Relational6 {

  /** q31: one-scan profile of the documents table — row counts,
    * null counts, KMV distinct estimates, canonical min/max for every
    * column. The shape a curation run's first job takes at 100 TB:
    * one map-side-combined aggregate, sketch buffers not rows on the
    * wire, no Expand replay per distinct column. */
  def q31Profile(spark: SparkSession, dir: String): DataFrame = {
    import Profile.ColSpec
    val d = documentsParallel(spark, dir)
    Profile.profile(d, Seq(
      ColSpec("doc_id", col("doc_id"), col("doc_id").cast("string")),
      ColSpec("lang", col("lang"), col("lang")),
      ColSpec("n_chars", col("n_chars"), col("n_chars").cast("string")),
      ColSpec("source", col("source"), col("source")),
      ColSpec("text", col("text"), col("text"))))
  }

  /** q32: exact p50/p90/p99 of l_extendedprice per returnflag, linear
    * interpolation at rank p·(n−1)/100 in integer micro-units —
    * `pctl_u` = value ×1e8, bit-exact in both engines. Uses
    * [[Profile.exactQuantilesDistributed]]: 3 giant groups is exactly
    * the shape where a PARTITION BY window would cap parallelism at 3
    * tasks; the two-level rank uses every core (ProfileSpec proves the
    * forms row-equal). */
  def q32Quantiles(spark: SparkSession, dir: String): DataFrame =
    Profile.exactQuantilesDistributed(
      lineitem(spark, dir), "l_returnflag",
      round(col("l_extendedprice") * 1000000L).cast("long"),
      Seq(50, 90, 99))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_profile"   -> q31Profile _,
    "q32_quantiles" -> q32Quantiles _)

  private def profileLeg(name: String, minMaxSql: String, canonSql: String) =
    s"""SELECT '$name' AS col_name, count(*) AS n_rows,
       |  CAST(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |  ${Kmv.oracleScalar("documents",
            s"COALESCE($canonSql, '~null~')", "prof")} AS n_distinct,
       |  substr(CAST(min($minMaxSql) AS VARCHAR), 1, 16) AS min_val,
       |  substr(CAST(max($minMaxSql) AS VARCHAR), 1, 16) AS max_val
       |FROM documents""".stripMargin

  val oracles: Map[String, String] = Map(
    "q31_profile" -> Seq(
        profileLeg("doc_id", "doc_id", "CAST(doc_id AS VARCHAR)"),
        profileLeg("lang", "lang", "lang"),
        profileLeg("n_chars", "n_chars", "CAST(n_chars AS VARCHAR)"),
        profileLeg("source", "source", "source"),
        profileLeg("text", "text", "text"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "q32_quantiles" ->
      """WITH r AS (SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 1000000) AS BIGINT) AS v6 FROM lineitem),
        |rk AS (SELECT g, v6, row_number() OVER (PARTITION BY g ORDER BY v6) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n FROM r),
        |j AS (SELECT g, p, (p * (n - 1)) // 100 AS k, (p * (n - 1)) % 100 AS frac,
        |    rn, v6
        |  FROM rk CROSS JOIN (VALUES (50), (90), (99)) AS ps(p)
        |  WHERE rn = (p * (n - 1)) // 100 + 1 OR rn = (p * (n - 1)) // 100 + 2),
        |a AS (SELECT g, p, frac,
        |    min(CASE WHEN rn = k + 1 THEN v6 END) AS lo,
        |    max(CASE WHEN rn = k + 2 THEN v6 END) AS hi
        |  FROM j GROUP BY g, p, frac)
        |SELECT g AS l_returnflag, p, lo * (100 - frac) + COALESCE(hi, lo) * frac AS pctl_u
        |FROM a ORDER BY l_returnflag, p""".stripMargin)
}
