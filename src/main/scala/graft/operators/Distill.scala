package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares DISTILLATION of an integer signal
  * onto two integer features (+ intercept) — the training side of the
  * curation stack's scoring operators (t17 applies a trained
  * classifier; this trains one), shaped for the 100 TB pipeline:
  *
  *  - ONE aggregation pass per corpus, total. The normal-equation
  *    sufficient statistics (n, Σx, ΣxxT, Σxy, Σy, Σy²) are a
  *    mergeable monoid: partial aggregation runs map-side, the shuffle
  *    carries eleven numbers per (partition, group), never rows, and
  *    the same monoid is the streaming twin's state.
  *  - The 3×3 system solves INSIDE the plan by Cramer's rule — four
  *    integer determinants per group, no driver collect, no iteration.
  *    (Normal equations + Cramer beat gradient descent structurally
  *    here: closed-form, one pass, exact.)
  *  - Coefficients quantize to milli-units by exact scaled division
  *    ([[ExactArith.scaledFloorDivSql]] on sign-decomposed operands —
  *    DECIMAL(38) never overflows below ~10⁹ rows per group, and past
  *    that ANSI mode raises instead of wrapping).
  *  - Even the QUANTIZED model's R² needs no second pass: with
  *    integer coefficients b, Σ(1000·y − b·x)² expands to
  *    10⁶·Σy² − 2000·bᵀ(Xᵀy) + bᵀ(XᵀX)b — every term a product of
  *    the already-aggregated statistics, so the residual sum is exact
  *    WITHOUT revisiting a single row. (An early draft re-scanned the
  *    corpus through a broadcast join to score residuals; the
  *    expansion deletes that whole pass.)
  *
  * All arithmetic is integer-exact and engine-portable: sums of
  * bounded ints, integer determinants, truncate-toward-zero scaled
  * division (sign decomposition keeps the div nonnegative, where
  * Spark's `div` and DuckDB's `//` agree).
  */
object Distill {

  /** Largest quantized coefficient magnitude a group may produce before
    * it is declared degenerate (NULL model, like det = 0): keeps the
    * expanded quantized-SSE algebra inside DECIMAL(38,0) for any group
    * within the documented feature/row bounds. Oracle SQL mirrors the
    * same guard (Relational14 `b` CTE). */
  val coeffCapMilli: Long = 1000000000L

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

  /** The sufficient-statistics pass: one row per group carrying the
    * normal-equation monoid (n, Σx1, Σx2, Σx1², Σx1x2, Σx2², Σy,
    * Σx1y, Σx2y, Σy²) in DECIMAL(38,0). Split out so the streaming
    * twin can run exactly this aggregate under a streaming trigger
    * and hand the sink table to [[solveFromStats]]. */
  def suffStats(df: DataFrame, group: String,
                x1: String, x2: String, y: String): DataFrame = {
    val d38 = (c: String) => s"CAST($c AS DECIMAL(38,0))"
    df.groupBy(col(group))
      .agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(expr(d38(x1))).as("sx1"), sum(expr(d38(x2))).as("sx2"),
        sum(expr(s"${d38(x1)} * ${d38(x1)}")).as("s11"),
        sum(expr(s"${d38(x1)} * ${d38(x2)}")).as("s12"),
        sum(expr(s"${d38(x2)} * ${d38(x2)}")).as("s22"),
        sum(expr(d38(y))).as("sy"),
        sum(expr(s"${d38(x1)} * ${d38(y)}")).as("s1y"),
        sum(expr(s"${d38(x2)} * ${d38(y)}")).as("s2y"),
        sum(expr(s"${d38(y)} * ${d38(y)}")).as("syy"))
  }

  /** Cramer solve + milli quantization + expanded quantized-model R²,
    * all as column algebra over a [[suffStats]] frame (batch plan or
    * streaming sink — one row per group either way). Degenerate
    * groups (singular design matrix, zero label variance) surface as
    * NULL coefficients / NULL r2, never a division error. */
  def solveFromStats(stats: DataFrame): DataFrame = {
    val group = stats.columns.head
    val solved = stats
      // det of A = [[n,sx1,sx2],[sx1,s11,s12],[sx2,s12,s22]] and the
      // three column-replaced numerators. Plain column algebra —
      // Catalyst folds it into the same project as the aggregate.
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
      // fold sign(det) into the numerator, divide by |det|:
      // trunc-toward-zero in BOTH engines regardless of sign
      .withColumn("b0", expr(s"CASE WHEN det = 0 THEN NULL ELSE ${
        signedScaledDiv("num0 * CASE WHEN det < 0 THEN -1 ELSE 1 END",
          "abs(det)", 1000L)} END"))
      .withColumn("b1", expr(s"CASE WHEN det = 0 THEN NULL ELSE ${
        signedScaledDiv("num1 * CASE WHEN det < 0 THEN -1 ELSE 1 END",
          "abs(det)", 1000L)} END"))
      .withColumn("b2", expr(s"CASE WHEN det = 0 THEN NULL ELSE ${
        signedScaledDiv("num2 * CASE WHEN det < 0 THEN -1 ELSE 1 END",
          "abs(det)", 1000L)} END"))
      // Ill-conditioned guard (r9 advice): an almost-singular group
      // (tiny nonzero det) can blow |b*_milli| past ~10¹², and the
      // b²·ΣxxT terms in the SSE expansion below would then overflow
      // DECIMAL(38,0) — an ANSI runtime abort of the WHOLE query on
      // one degenerate group (while a 128-bit oracle sails through).
      // Such a model is numerically meaningless anyway: treat the
      // group as degenerate, exactly like det = 0. At the cap
      // (|b| ≤ 10⁹ milli) every SSE term stays ≤ ~10³³ under the
      // documented feature bounds — 5 orders inside DECIMAL(38,0).
      .withColumn("illcond", expr(
        s"abs(b0) > $coeffCapMilli OR abs(b1) > $coeffCapMilli" +
          s" OR abs(b2) > $coeffCapMilli"))
      .withColumn("b0", expr("CASE WHEN illcond THEN NULL ELSE b0 END"))
      .withColumn("b1", expr("CASE WHEN illcond THEN NULL ELSE b1 END"))
      .withColumn("b2", expr("CASE WHEN illcond THEN NULL ELSE b2 END"))
      // quantized-model residual sums, expanded over the monoid:
      //   SSE = Σ(1000y − b0 − b1x1 − b2x2)²
      //       = 10⁶·syy − 2000·(b0·sy + b1·s1y + b2·s2y) + bᵀ(XᵀX)b
      //   SST = Σ(1000y − ȳ_milli)², ȳ_milli = ⌊1000·sy/n⌋
      //       = 10⁶·syy − 2000·ȳ_milli·sy + n·ȳ_milli²
      // (y ≥ 0 required for the ȳ floor — labels here are counts)
      .withColumn("ybar", expr(ExactArith.scaledFloorDivSql("sy", "n", 1000L)))
      .withColumn("sse", expr(
        """1000000 * syy - 2000 * (b0 * sy + b1 * s1y + b2 * s2y)
          |+ (b0 * b0 * n + b1 * b1 * s11 + b2 * b2 * s22
          |   + 2 * b0 * b1 * sx1 + 2 * b0 * b2 * sx2
          |   + 2 * b1 * b2 * s12)""".stripMargin))
      .withColumn("sst", expr(
        "1000000 * syy - 2000 * ybar * sy + n * ybar * ybar"))
    solved.select(col(group),
      col("n").cast("long").as("n"),
      col("b0").cast("long").as("b0_milli"),
      col("b1").cast("long").as("b1_milli"),
      col("b2").cast("long").as("b2_milli"),
      expr("CASE WHEN sst = 0 OR b0 IS NULL THEN NULL ELSE " +
        "CAST(1000000 - " +
        ExactArith.scaledFloorDivSql("sse", "sst", 1000000L) +
        " AS BIGINT) END").as("r2_ppm"))
      .orderBy(col(group))
  }

  /** OLS of `y` on (1, x1, x2) per `group`, coefficients in
    * milli-units, quantized-model R² in ppm — one corpus pass.
    *
    * `df` must provide integer columns `group`, `x1`, `x2` and a
    * NONNEGATIVE integer `y`; callers bound the features (the q55
    * site caps x ≤ 511, y ≤ 4095) so every intermediate fits
    * DECIMAL(38,0) up to ~10⁹ rows per group. Output one row per
    * group: (group, n, b0_milli, b1_milli, b2_milli, r2_ppm). */
  def olsDistill(df: DataFrame, group: String,
                 x1: String, x2: String, y: String): DataFrame =
    solveFromStats(suffStats(df, group, x1, x2, y))
}
