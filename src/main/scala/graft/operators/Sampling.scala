package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement — Efraimidis &
  * Spirakis (2006): each row draws a uniform u ∈ (0,1] and ranks by
  * u^(1/w); the top-k per stratum is an exact weighted sample without
  * replacement. The training-mixture use case: sample documents with
  * probability proportional to length/quality weight, reproducibly.
  *
  * Determinism (the t04/t26 principle): u comes from a salted md5 of
  * the row id, not rand() — re-runs, task retries, and the DuckDB twin
  * draw identical keys. Ranking uses ln(u)/w (order-isomorphic to
  * u^(1/w)): ONE libm ln per row on an IEEE-exact argument, rounded to
  * a 1e-9-scaled BIGINT (the t19 ln convention), then one
  * exactly-rounded double division by the integer weight — every
  * comparison both engines make is on bit-identical doubles.
  *
  * Scale posture: the key is scan-local; the top-k prune is the
  * [[graft.plans.TopKPerKeyExec]] bounded heap — each partition ships
  * at most k candidate rows per stratum, no per-stratum sort, no
  * global window. The post-prune rank window touches ≤ k·|strata|
  * rows. */
object Sampling {

  /** The shared E-S keying stage: (stratum, id, weight, es_key) with
    * the deterministic salted-md5 uniform — scan-local, so the SAME
    * code keys the batch top-k and the s19 streaming aggregation.
    * Rows with weight ≤ 0 or null are excluded (zero-weight rows can
    * never be drawn; negative weights are undefined). */
  def esKeyed(df: DataFrame, stratumCol: String, idCol: String,
              weightCol: String, salt: String = "es"): DataFrame = {
    // the integral-weight contract is ENFORCED, not assumed (r9
    // review): a fractional weight column would truncate differently
    // than DuckDB's rounding CAST, and a 0-to-1-range weight truncates
    // to 0 — es_key = s9/0.0 = ±Infinity/NaN, which Spark orders ABOVE
    // every real key. Fail at plan time with the column named.
    df.schema(weightCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => ()
      case other => throw new IllegalArgumentException(
        s"esKeyed: weight column '$weightCol' must be integral " +
          s"(got $other) — pre-scale fractional weights to integer " +
          "units (e.g. milli-weights) so both engines rank identically")
    }
    // hash the post-projection "id" column — same VALUES as the
    // caller's id column, which is what the oracle hashes too
    val h = graft.operators.HyperLogLog.hashExpr("id", salt)
    // u = (h+1)/2^60 ∈ (0,1]; ln once; s9 = round(ln(u)·1e9) as BIGINT;
    // key = s9 / w (negative, closer to 0 = better draw)
    df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(stratumCol).as("stratum"), col(idCol).as("id"),
        col(weightCol).cast("long").as("weight"))
      .withColumn("__s9", expr(
        s"cast(round(ln(cast(($h) + 1 as double) / 1152921504606846976) " +
          "* 1000000000, 0) as bigint)"))
      .withColumn("es_key",
        col("__s9").cast("double") / col("weight").cast("double"))
  }

  /** Top-`k` weighted sample per `stratumCol`; `weightCol` must be a
    * positive integral column. Output: (stratum, id, weight, es_key,
    * rank) ordered within stratum by the E-S key (rank 1 = first
    * drawn). */
  def weightedTopK(df: DataFrame, stratumCol: String, idCol: String,
                   weightCol: String, k: Int,
                   salt: String = "es"): DataFrame = {
    require(k >= 1, "sample size must be positive")
    val keyed = esKeyed(df, stratumCol, idCol, weightCol, salt)
    val pruned = graft.plans.TopKPerKey.prune(
      keyed, "stratum", "es_key", "id", k)
    pruned
      .withColumn("rank", row_number().over(
          Window.partitionBy(col("stratum"))
            .orderBy(col("es_key").desc, col("id")))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("stratum"), col("id"), col("weight"), col("es_key"),
        col("rank"))
  }

  /** The DuckDB replay: same salted hash, same ln rounding, same
    * double division, same (key desc, id) ranking. `src` must expose
    * the caller's stratum/id/weight columns. */
  def oracleSql(src: String, stratumCol: String, idCol: String,
                weightCol: String, k: Int, salt: String = "es"): String =
    s"""WITH w AS (SELECT $stratumCol AS stratum, $idCol AS id,
       |    CAST($weightCol AS BIGINT) AS weight,
       |    ('0x' || substr(md5('$salt|' || CAST($idCol AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM $src
       |  WHERE $weightCol IS NOT NULL AND $weightCol > 0),
       |s AS (SELECT stratum, id, weight,
       |    CAST(round(ln(CAST(h + 1 AS DOUBLE) / 1152921504606846976)
       |      * 1000000000, 0) AS BIGINT) AS s9
       |  FROM w),
       |r AS (SELECT stratum, id, weight,
       |    CAST(s9 AS DOUBLE) / CAST(weight AS DOUBLE) AS es_key,
       |    row_number() OVER (PARTITION BY stratum
       |      ORDER BY CAST(s9 AS DOUBLE) / CAST(weight AS DOUBLE) DESC, id)
       |      AS rank
       |  FROM s)
       |SELECT stratum, id, weight, es_key, CAST(rank AS BIGINT) AS rank
       |FROM r WHERE rank <= $k""".stripMargin
}
