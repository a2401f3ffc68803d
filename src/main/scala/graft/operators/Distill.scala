package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares DISTILLATION of an integer signal
  * onto two integer features (+ intercept) — the training side of the
  * curation stack's scoring operators (t17 applies a trained classifier;
  * this trains one), shaped for the 100 TB pipeline:
  *
  *  - ONE aggregation pass builds the normal-equation sufficient
  *    statistics per group (n, Σx, ΣxxT, Σxy, Σy, Σy²) — a mergeable
  *    monoid, so partial aggregation runs map-side and the shuffle
  *    carries 10 numbers per (partition, group), never rows. The same
  *    monoid property makes the streaming twin a watermarked groupBy.
  *  - The 3×3 system solves INSIDE the plan by Cramer's rule — four
  *    integer determinants per group, no driver-side collect, no
  *    iteration. (Normal equations + Cramer beat gradient descent here
  *    structurally: the solution is closed-form, one pass, and exact.)
  *  - Coefficients quantize to milli-units by exact scaled division
  *    ([[ExactArith.scaledFloorDivSql]] on sign-decomposed operands —
  *    DECIMAL(38) never overflows below ~10⁹ rows per group, and past
  *    that ANSI mode raises instead of wrapping).
  *  - A second pass scores the QUANTIZED model: residuals against the
  *    milli-coefficients, R² in ppm. The group table (one row per
  *    group) broadcast-joins back onto the feature stream, so the
  *    scoring pass is scan + broadcast hash join + partial agg — no
  *    shuffle of the corpus.
  *
  * All arithmetic is integer-exact and engine-portable: sums of
  * bounded ints, integer determinants, truncate-toward-zero scaled
  * division (sign decomposition keeps the div nonnegative, where
  * Spark's `div` and DuckDB's `//` agree).
  */
object Distill {

  /** Signed exact scaled division as a SQL fragment:
    * trunc-toward-zero of (num · scale / den), den > 0 required
    * (Cramer call sites pass abs(det) and fold the sign into num).
    * Sign-decomposed so the split-form floor div only ever sees
    * nonnegative operands — floor ≡ trunc there, and both engines'
    * integer division agree on nonnegative inputs. */
  private def signedScaledDiv(num: String, den: String,
                              scale: Long): String =
    s"(CASE WHEN ($num) < 0 THEN -1 ELSE 1 END * " +
      ExactArith.scaledFloorDivSql(s"abs($num)", den, scale) + ")"

  /** OLS of `y` on (1, x1, x2) per `group`, coefficients in
    * milli-units, quantized-model R² in ppm.
    *
    * `df` must provide integer columns `group`, `x1`, `x2`, `y`;
    * callers bound the features (the q55 site caps x ≤ 511,
    * y ≤ 4095) so every intermediate fits DECIMAL(38,0) up to ~10⁹
    * rows per group. Output one row per group:
    * (group, n, b0_milli, b1_milli, b2_milli, r2_ppm), degenerate
    * groups (singular design matrix, zero label variance) surface as
    * NULL coefficients / NULL r2, never a division error. */
  def olsDistill(df: DataFrame, group: String,
                 x1: String, x2: String, y: String): DataFrame = {
    val d38 = (c: String) => s"CAST($c AS DECIMAL(38,0))"
    // one pass: the normal-equation monoid. Sums in DECIMAL(38,0)
    // from the aggregate on (map-side partials carry the same 10-tuple)
    val stats = df.groupBy(col(group))
      .agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(expr(d38(x1))).as("sx1"), sum(expr(d38(x2))).as("sx2"),
        sum(expr(s"${d38(x1)} * ${d38(x1)}")).as("s11"),
        sum(expr(s"${d38(x1)} * ${d38(x2)}")).as("s12"),
        sum(expr(s"${d38(x2)} * ${d38(x2)}")).as("s22"),
        sum(expr(d38(y))).as("sy"),
        sum(expr(s"${d38(x1)} * ${d38(y)}")).as("s1y"),
        sum(expr(s"${d38(x2)} * ${d38(y)}")).as("s2y"))
    // Cramer: det of A = [[n,sx1,sx2],[sx1,s11,s12],[sx2,s12,s22]]
    // and the three column-replaced numerators. Plain column algebra —
    // Catalyst folds it into the same project as the aggregate output.
    val solved = stats
      .withColumn("det", expr(
        """n   * (s11 * s22 - s12 * s12)
          |- sx1 * (sx1 * s22 - s12 * sx2)
          |+ sx2 * (sx1 * s12 - s11 * sx2)""".stripMargin))
      .withColumn("num0", expr(
        """sy  * (s11 * s22 - s12 * s12)
          |- sx1 * (s1y * s22 - s12 * s2y)
          |+ sx2 * (s1y * s12 - s11 * s2y)""".stripMargin))
      .withColumn("num1", expr(
        """n   * (s1y * s22 - s12 * s2y)
          |- sy  * (sx1 * s22 - s12 * sx2)
          |+ sx2 * (sx1 * s2y - s1y * sx2)""".stripMargin))
      .withColumn("num2", expr(
        """n   * (s11 * s2y - s1y * s12)
          |- sx1 * (sx1 * s2y - s1y * sx2)
          |+ sy  * (sx1 * s12 - s11 * sx2)""".stripMargin))
      .select(col(group), col("n"), col("sy"), col("det"),
        // fold sign(det) into the numerator, divide by |det|:
        // trunc-toward-zero in BOTH engines regardless of sign
        expr(s"CASE WHEN det = 0 THEN NULL ELSE ${signedScaledDiv(
          "num0 * CASE WHEN det < 0 THEN -1 ELSE 1 END",
          "abs(det)", 1000L)} END").as("b0_milli"),
        expr(s"CASE WHEN det = 0 THEN NULL ELSE ${signedScaledDiv(
          "num1 * CASE WHEN det < 0 THEN -1 ELSE 1 END",
          "abs(det)", 1000L)} END").as("b1_milli"),
        expr(s"CASE WHEN det = 0 THEN NULL ELSE ${signedScaledDiv(
          "num2 * CASE WHEN det < 0 THEN -1 ELSE 1 END",
          "abs(det)", 1000L)} END").as("b2_milli"))
    // second pass: score the QUANTIZED model. One row per group →
    // broadcast hash join back onto the feature stream; residual sums
    // partial-aggregate map-side like any groupBy.
    val ybar = expr(ExactArith.scaledFloorDivSql("sy", "n", 1000L))
    df.join(broadcast(solved
        .withColumn("ybar_milli", ybar)), Seq(group))
      .withColumn("resid", expr(
        s"CAST($y AS DECIMAL(38,0)) * 1000 - " +
          s"(b0_milli + b1_milli * ${d38(x1)} + b2_milli * ${d38(x2)})"))
      .withColumn("dev", expr(
        s"CAST($y AS DECIMAL(38,0)) * 1000 - ybar_milli"))
      .groupBy(col(group), col("n"), col("b0_milli"), col("b1_milli"),
        col("b2_milli"))
      .agg(sum(expr("resid * resid")).as("sse"),
        sum(expr("dev * dev")).as("sst"))
      .select(col(group),
        col("n").cast("long").as("n"),
        col("b0_milli").cast("long").as("b0_milli"),
        col("b1_milli").cast("long").as("b1_milli"),
        col("b2_milli").cast("long").as("b2_milli"),
        expr("CASE WHEN sst = 0 OR b0_milli IS NULL THEN NULL ELSE " +
          "CAST(1000000 - " +
          ExactArith.scaledFloorDivSql("sse", "sst", 1000000L) +
          " AS BIGINT) END").as("r2_ppm"))
      .orderBy(col(group))
  }
}
