package graft.queries

import graft.core.Caching.LedgerOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._
import graft.operators.Dedup.md5Hash60Col

/** Twelfth batch (round 6, driver session, cont.): share-shift OLAP,
  * corpus-geometry and capacity-planning instruments — the
  * readout-style queries an analytics/curation team keeps on a
  * dashboard next to the heavy operators. */
object Relational12 {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))

  /** q48: revenue share shift — per (nation, quarter), the nation's
    * share of that quarter's revenue in ppm and its quarter-over-
    * quarter delta: the classic market-share / mix-shift OLAP readout
    * (ratio_to_report + lag composed). Revenue sums in exact
    * DECIMAL(18,6) (the q03 discipline); the share is integer floor
    * division (corpus-sized denominator — the t33 rule), so the shift
    * is an exact integer difference. The windows run over the
    * |nations|·|quarters|-bounded aggregate, not the fact table. */
  def q48ShareShift(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val c = customer(spark, dir)
    val n = nation(spark, dir)
    val agg = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        concat(year(col("o_orderdate")), lit("-Q"),
          quarter(col("o_orderdate"))).as("qtr"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
      // micro-unit INTEGER revenue for the share division: a scale-6
      // decimal × 10⁶ is exact, and both engines then floor-divide
      // plain integers (a decimal ÷ decimal floor has engine-specific
      // scale rules; a HUGEINT cast of the raw decimal would truncate
      // the fraction on the oracle side)
      .withColumn("rev6",
        (col("rev") * lit(1000000L)).cast(DecimalType(38, 0)))
    val wn = Window.partitionBy(col("nation")).orderBy(col("qtr"))
    agg
      .withColumn("share_ppm",
        expr("(rev6 * 1000000) div sum(rev6) OVER (PARTITION BY qtr)"))
      .withColumn("shift_ppm",
        col("share_ppm") - lag(col("share_ppm"), 1).over(wn))
      .select(col("nation"), col("qtr"),
        round(col("rev"), 2).cast("double").as("revenue"),
        col("share_ppm"), col("shift_ppm"))
      .orderBy(col("nation"), col("qtr"))
  }

  /** a31: pairwise-distance histogram — the corpus-geometry profile
    * (hubness / cluster-structure readout) over a DETERMINISTIC pair
    * sample: two independent md5-gated row samples (the a18 salted-
    * predicate principle — partition-invariant, replayable) meet in a
    * broadcast join, distances are integer L2² in 2²⁰ fixed point, and
    * the 32 bucket edges derive from the sample's own exact max (both
    * engines compute the identical integer, so the binning is
    * portable with no magic constants). Sample rates are the dial
    * that keeps |A|·|B| bounded at any corpus size. */
  def a31DistanceHistogram(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), graft.operators.Drift.quantize("embedding").as("vq"))
    def gate(tag: String, mod: Int) =
      md5Hash60Col(concat(lit(s"$tag|"), col("vec_id").cast("string"))) % mod === 0
    val a = e.filter(gate("pa", 5))
      .select(col("vec_id").as("id_a"), col("vq").as("va"))
    val b = e.filter(gate("pb", 5))
      .select(col("vec_id").as("id_b"), col("vq").as("vb"))
    // sq_dist_long: the interpreted aggregate(zip_with(...)) fold ran
    // per PAIR here (r13 — the a12/a36 disease at pair volume); the
    // native expression is one codegen'd linear pass, bit-identical
    val pairs = b.join(broadcast(a), col("id_a") < col("id_b"))
      .withColumn("d2", graft.functions.GraftFunctions.sqDistLong(
        col("va"), col("vb")))
      .select(col("d2"))
      .persistLedgered()
    val maxD = broadcast(pairs.agg(max(col("d2")).as("maxd")))
    pairs.crossJoin(maxD)
      .withColumn("bucket", expr("cast((d2 * 32) div (maxd + 1) as int)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("d2")).as("min_d2"), max(col("d2")).as("max_d2"))
      .orderBy(col("bucket"))
  }

  /** p33: sequence-length packing sweep — the capacity-planning
    * readout for p28's boundary-respecting padded packing: for each
    * candidate seqLen, the sequence count, total pad tokens, and pad
    * waste in ppm of the padded volume. ONE corpus scan fans each doc
    * into |L| rows (a broadcast of 4 literals), then a |L|-bounded
    * aggregate — the a24/d19 sweep principle applied to the packer's
    * dial. */
  def p33SeqlenSweep(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val lens = Seq(64, 128, 256, 512)
    val d = documentsParallel(spark, dir)
      .select(when(col("text").isNull, lit(0L))
        .otherwise(size(split(col("text"), " ")).cast("long")).as("n_tok"))
      .filter(col("n_tok") > 0)
    d.crossJoin(broadcast(lens.toDF("seq_len")))
      .withColumn("n_seqs", expr("(n_tok + seq_len - 1) div seq_len"))
      .groupBy(col("seq_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_seqs")).as("n_seqs"),
        sum(col("n_seqs") * col("seq_len") - col("n_tok")).as("pad_tokens"),
        sum(col("n_seqs") * col("seq_len")).as("padded_tokens"))
      .withColumn("pad_ppm",
        expr("(pad_tokens * 1000000) div padded_tokens"))
      .select(col("seq_len"), col("n_docs"), col("n_seqs"),
        col("pad_tokens"), col("pad_ppm"))
      .orderBy(col("seq_len"))
  }

  /** t41: vocabulary growth curve (Heaps' law readout) — distinct
    * 3-gram vocabulary gained per decile of the corpus read in doc-id
    * order: how fast new text stops appearing, the saturation signal
    * behind "is more of this source worth crawling?". Rides the t39
    * first-occurrence machinery: per gram hash, min(doc_id), bucketed
    * into deciles by position (doc ids are dense), one 10-row
    * cumulative window. */
  def t41VocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = documentsParallel(spark, dir)
    val n = broadcast(docs.agg(count(lit(1)).as("n")))
    val firsts = docs
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.ngramStrings(col("text"), 3))
          .as("shingle"))
      .select(col("doc_id"), md5Hash60Col(col("shingle")).as("h"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    val perDecile = firsts.crossJoin(n)
      .withColumn("decile", expr("least(9, (first_doc * 10) div n)"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("new_grams"))
    // bare global window over the 10-row decile frame — the GlobalIds
    // bounded-fold pattern (10 rows in one task, not data)
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDecile
      .withColumn("cum_grams", sum(col("new_grams")).over(w))
      .select(col("decile").cast("int").as("decile"), col("new_grams"),
        col("cum_grams"))
      .orderBy(col("decile"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_share_shift"   -> q48ShareShift _,
    "a31_distance_hist" -> a31DistanceHistogram _,
    "p33_seqlen_sweep"  -> p33SeqlenSweep _,
    "t41_vocab_growth"  -> t41VocabGrowth _)

  val oracles: Map[String, String] = Map(
    "q48_share_shift" ->
      """WITH agg AS (
        |  SELECT n.n_name AS nation,
        |    CAST(year(o.o_orderdate) AS VARCHAR) || '-Q' ||
        |      CAST(quarter(o.o_orderdate) AS VARCHAR) AS qtr,
        |    sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS rev
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |s AS (SELECT nation, qtr, rev,
        |    CAST((CAST(rev * 1000000 AS HUGEINT) * 1000000) //
        |      CAST(sum(CAST(rev * 1000000 AS HUGEINT))
        |        OVER (PARTITION BY qtr) AS HUGEINT) AS BIGINT) AS share_ppm
        |  FROM agg)
        |SELECT nation, qtr,
        |  CAST(round(rev, 2) AS DOUBLE) AS revenue, share_ppm,
        |  share_ppm - lag(share_ppm) OVER (PARTITION BY nation ORDER BY qtr)
        |    AS shift_ppm
        |FROM s ORDER BY nation, qtr""".stripMargin,
    "a31_distance_hist" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576, 0) AS BIGINT)) AS vq
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |a AS (SELECT vec_id AS id_a, vq AS va FROM e
        |  WHERE ('0x' || substr(md5('pa|' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 5 = 0),
        |b AS (SELECT vec_id AS id_b, vq AS vb FROM e
        |  WHERE ('0x' || substr(md5('pb|' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 5 = 0),
        |p AS (SELECT CAST(list_sum(list_transform(
        |    generate_series(1, len(a.va)),
        |    i -> (a.va[i] - b.vb[i]) * (a.va[i] - b.vb[i]))) AS BIGINT) AS d2
        |  FROM a JOIN b ON a.id_a < b.id_b),
        |m AS (SELECT max(d2) AS maxd FROM p)
        |SELECT CAST((p.d2 * 32) // (m.maxd + 1) AS INT) AS bucket,
        |  count(*) AS n_pairs, min(p.d2) AS min_d2, max(p.d2) AS max_d2
        |FROM p, m GROUP BY 1 ORDER BY bucket""".stripMargin,
    "p33_seqlen_sweep" ->
      """WITH d AS (SELECT CAST(CASE WHEN text IS NULL THEN 0
        |    ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_tok
        |  FROM documents),
        |x AS (SELECT n_tok, L.seq_len,
        |    (n_tok + L.seq_len - 1) // L.seq_len AS n_seqs
        |  FROM d CROSS JOIN (VALUES (64), (128), (256), (512)) AS L(seq_len)
        |  WHERE n_tok > 0)
        |SELECT seq_len, count(*) AS n_docs,
        |  CAST(sum(n_seqs) AS BIGINT) AS n_seqs,
        |  CAST(sum(n_seqs * seq_len - n_tok) AS BIGINT) AS pad_tokens,
        |  CAST((sum(n_seqs * seq_len - n_tok) * 1000000)
        |    // sum(n_seqs * seq_len) AS BIGINT) AS pad_ppm
        |FROM x GROUP BY seq_len ORDER BY seq_len""".stripMargin,
    "t41_vocab_growth" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(string_split(text,' ')) - 2),
        |    i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS shingles
        |  FROM documents),
        |ex AS (SELECT doc_id,
        |    ('0x' || substr(md5(unnest(shingles)), 1, 15))::BIGINT AS h FROM sh),
        |f AS (SELECT h, min(doc_id) AS first_doc FROM ex GROUP BY h),
        |n AS (SELECT count(*) AS n FROM documents),
        |d AS (SELECT least(9, (first_doc * 10) // (SELECT n FROM n)) AS decile,
        |    count(*) AS new_grams
        |  FROM f GROUP BY 1)
        |SELECT CAST(decile AS INT) AS decile, new_grams,
        |  CAST(sum(new_grams) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_grams
        |FROM d ORDER BY decile""".stripMargin)
}
