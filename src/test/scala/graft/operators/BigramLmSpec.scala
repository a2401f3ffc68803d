package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[TextAnalysis.bigramLmScore]] — add-one-smoothed bigram LM over the
  * corpus: closed-form probabilities, repeated-bigram weighting, the
  * short-doc zero path, and the fluency ordering the signal exists for. */
class BigramLmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Double)] =
    TextAnalysis.bigramLmScore(rows.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  /** The operator's exact arithmetic: scaled-long ln per distinct bigram,
    * count-weighted integer sum, mean, 6-decimal round. */
  private def nll(terms: Seq[(Long, Long, Long)], v: Long): Double = {
    // (k, c12, cctx); HALF_UP like Spark's round() — math.rint is
    // half-even and would diverge on exact .5 boundaries
    val s = terms.map { case (k, c12, cctx) =>
      k * java.math.BigDecimal.valueOf(
        math.log((c12 + 1).toDouble / (cctx + v)) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }.sum
    val nb = terms.map(_._1).sum
    ((-2 * s + nb) / (2 * nb)).toDouble / 1e6
  }

  test("scores equal the closed-form add-one bigram model") {
    // corpus: "a b a b", "a b c", "z" -> V=4; c(ab)=3, c(ba)=1, c(bc)=1;
    // contexts: a=3, b=2
    val out = run(Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z")))
    assert(out(1L) === ((3L, nll(Seq((2L, 3L, 3L), (1L, 1L, 2L)), 4L))))
    assert(out(2L) === ((2L, nll(Seq((1L, 3L, 3L), (1L, 1L, 2L)), 4L))))
  }

  test("single-word docs report zero bigrams and zero nll") {
    val out = run(Seq((1L, "a b"), (2L, "z")))
    assert(out(2L) === ((0L, 0.0)))
  }

  test("corpus-typical phrasing scores lower nll than shuffled phrasing") {
    // ten docs repeat the same phrase; one doc uses the same words in an
    // order the corpus never produces -> rarer bigrams -> higher nll
    val typical = (1L to 10L).map(i => (i, "the quick brown fox jumps"))
    val atypical = Seq((99L, "fox the jumps quick brown"))
    val out = run(typical ++ atypical)
    assert(out(1L)._2 < out(99L)._2)
  }
}
