package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-domain distribution drift — the data-quality monitor a corpus
  * pipeline runs per source/snapshot: how far does each domain's word
  * distribution sit from the corpus distribution? Sources whose drift
  * jumps between crawls are the ones whose extraction broke.
  *
  * Metric: total-variation distance over a capped vocabulary,
  *   TV(s) = ½ Σ_w |o_w/n_s − c_w/N|
  * computed EXACTLY as the integer numerator Σ_w |o_w·N − c_w·n_s|
  * over the common denominator n_s·N (one |…| sum of BIGINT-exact
  * DECIMAL(38) products — no per-word division, so no rounding
  * anywhere until the final reporting division). Unlike χ², TV needs
  * no per-word denominators, which is what makes it exactly
  * replayable.
  *
  * Scale posture: vocabulary capped at `maxVocab` (count desc, word
  * asc — deterministic), everything else lumped into ONE `~other~`
  * bucket whose counts are derived by subtraction (n_s − Σ o_w,
  * N − Σ c_w), so state is |sources|·(maxVocab+1) regardless of true
  * vocabulary size; the per-(source, word) aggregate is the only
  * corpus-sized shuffle, and it map-side combines.
  */
object Drift {

  /** (source, n_words, tv_num, tv_ppm) per source: `tv_num` the exact
    * integer numerator and `tv_ppm` the drift in parts per million via
    * integer FLOOR division,
    *   tv_ppm = (tv_num · 10⁶) div (2 · n_s · N),
    * so the reported metric is bit-exact across engines. (A previous
    * form rounded the double quotient to 6 places; a quotient within
    * an ulp of a 5·10⁻⁷ boundary rounds differently in Spark's
    * BigDecimal HALF_UP vs DuckDB's float path — integer floor
    * division has no such boundary.)
    *
    * `tv_num` is carried internally as DECIMAL(38,0) — the bound:
    * tv_num ≤ 2·n_s·N ≤ 2·N², so N (total corpus words) up to ~7·10¹⁸
    * stays inside 38 digits; a 100 TB corpus is ~10¹³ words, 5 orders
    * of headroom — but EMITTED as its canonical digit string: a raw
    * decimal cell hashes differently across engines (Python `Decimal`
    * vs DuckDB HUGEINT renderings) even when the values are equal,
    * while the digit string is one canonical form everywhere, and it
    * survives any future widening past 38 digits unchanged. */
  def sourceDrift(docs: DataFrame, srcCol: String, textCol: String,
                  maxVocab: Int): DataFrame = {
    val words = docs
      .filter(col(textCol).isNotNull)
      .select(col(srcCol).as("src"), explode(split(col(textCol), " ")).as("w"))
    // one corpus-sized aggregate; everything below is vocab-bounded
    val perSrc = words.groupBy(col("src"), col("w"))
      .agg(count(lit(1)).as("o"))
    val corpus = perSrc.groupBy(col("w")).agg(sum(col("o")).as("c"))
    val vocab = corpus
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
    val nTot = corpus.agg(sum(col("c")).as("nn"))
    val vocTot = vocab.agg(sum(col("c")).as("cv"))
    val srcTot = perSrc.groupBy(col("src")).agg(sum(col("o")).as("ns"))
    // dense (source × vocab-word) grid with o = 0 where absent, plus
    // the subtraction-derived ~other~ bucket per source
    val inVocab = perSrc.join(broadcast(vocab.select(col("w"))), Seq("w"))
    val srcVoc = inVocab.groupBy(col("src")).agg(sum(col("o")).as("ov"))
    val grid = srcTot.crossJoin(broadcast(vocab))
      .join(perSrc, Seq("src", "w"), "left_outer")
      .select(col("src"), col("ns"), col("c"),
        coalesce(col("o"), lit(0L)).as("o"))
    val other = srcTot
      .join(srcVoc, Seq("src"), "left_outer")
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(vocTot))
      .select(col("src"), col("ns"),
        (col("nn") - col("cv")).as("c"),
        (col("ns") - coalesce(col("ov"), lit(0L))).as("o"))
    val d19 = (c: Column) => c.cast(DecimalType(19, 0))
    val terms = grid.unionByName(other)
      .crossJoin(broadcast(nTot))
      .select(col("src"), col("ns"), col("nn"),
        abs(d19(col("o")) * d19(col("nn")) -
          d19(col("c")) * d19(col("ns"))).as("t"))
    terms.groupBy(col("src"), col("ns"), col("nn"))
      .agg(sum(col("t")).cast(DecimalType(38, 0)).as("tv_num"))
      // split-form exact floor division ([[ExactArith]]): the naive
      // (tv_num·10⁶) div … would overflow DECIMAL(38) at tv_num > 10³²
      .withColumn("tv_ppm",
        expr("CAST(" + ExactArith.scaledFloorDivSql("tv_num",
          "CAST(2 AS DECIMAL(38,0)) * CAST(ns AS DECIMAL(38,0)) * " +
            "CAST(nn AS DECIMAL(38,0))", 1000000L) + " AS BIGINT)"))
      .select(col("src").as("source"), col("ns").as("n_words"),
        // canonical digit string (scale-0 decimal → no point, no exp)
        col("tv_num").cast("string").as("tv_num"), col("tv_ppm"))
      .orderBy(col("source"))
  }

  private[graft] val EmbScale = 1L << 20

  /** The ×2²⁰ quantization every drift consumer must share — ONE
    * definition so the streaming monitor (s15) cannot silently diverge
    * from the batch operator it claims oracle-equality with. */
  private[graft] def quantize(vecCol: String): Column =
    expr(s"transform($vecCol, x -> cast(round(cast(x as double) * $EmbScale, 0) as bigint))")

  /** Embedding-space drift between two corpus snapshots — the
    * monitoring twin of [[sourceDrift]] for the vector side of the
    * pipeline: when an embedding model is redeployed or a source's
    * content shifts, each label's centroid moves, and the L1 centroid
    * displacement per label is the cheapest exactly-replayable readout.
    *
    * EXACT arithmetic, the t33 pattern: components quantized to
    * integers (×2²⁰), per-(label, snapshot) component sums are the only
    * corpus-sized aggregate (map-side combined to |labels|·d·2 cells),
    * and the displacement
    *   L1(label) = Σ_d |μA_d − μB_d| = Σ_d |sA_d·nB − sB_d·nA| / (nA·nB)
    * is carried as the exact DECIMAL(38) numerator `l1_num` over the
    * common denominator, reported as integer floor-division micro-units
    * (`l1_shift_micro` = raw-embedding-units × 10⁻⁶) — no float path,
    * both engines replay bit-exactly. `l1_num` is EMITTED as its
    * canonical digit string (the [[sourceDrift]] `tv_num` convention:
    * raw decimal cells hash differently across engines even when
    * equal). Bound: l1_num ≤ d·2·2²⁰·max(n)·n_a·n_b, so ~10⁹ vectors
    * per label per snapshot at d=64 stays inside 38 digits; the micro
    * readout divides split-form ([[ExactArith]]) so it survives the
    * full numerator range instead of overflowing 10⁶× early
    * (EmbeddingDriftSpec pins the 2¹¹⁰ case).
    *
    * Scale posture: the component explode inflates the scan d× but
    * partial-aggregates to bounded state (|labels|·d·2 cells, like the
    * bigram model tables); everything after is label-bounded. Output:
    * (label, n_a, n_b, l1_num, l1_shift_micro), labels present in both
    * snapshots only (a one-sided label has no displacement to report —
    * its appearance/disappearance is [[sourceDrift]]-style count drift,
    * visible in n_a/n_b of neighbors). */
  def embeddingDrift(snapA: DataFrame, snapB: DataFrame, labelCol: String,
                     vecCol: String): DataFrame =
    embeddingDriftFromSums(
      componentSums(snapA, labelCol, vecCol, "a"),
      componentSums(snapB, labelCol, vecCol, "b"))

  /** The corpus-sized half of [[embeddingDrift]]: per-(label,
    * component) quantized sums + vector counts, tagged `s_$tag`/
    * `n_$tag`. Exposed separately so a STREAMING aggregation can
    * produce the same monoid partials (the s06 HLL pattern: the
    * stream carries mergeable state, the exact division happens once
    * at read time). */
  def componentSums(df: DataFrame, labelCol: String, vecCol: String,
                    tag: String): DataFrame = df
    .filter(col(vecCol).isNotNull)
    .select(col(labelCol).as("label"),
      posexplode(quantize(vecCol)).as(Seq("d", "q")))
    .groupBy(col("label"), col("d"))
    .agg(sum(col("q")).cast(DecimalType(38, 0)).as(s"s_$tag"),
      count(lit(1)).as(s"n_$tag"))

  /** The label-bounded tail of [[embeddingDrift]]: exact L1 numerator
    * + ppm floor division over two [[componentSums]] frames (columns
    * (label, d, s_a, n_a) and (label, d, s_b, n_b)). */
  def embeddingDriftFromSums(a: DataFrame, b: DataFrame): DataFrame = {
    val scale = EmbScale
    // n is per (label, d) but constant across d within a label (every
    // vector carries every component) — max() collapses it exactly
    a.join(b, Seq("label", "d"))
      .groupBy(col("label"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(abs(col("s_a") * col("n_b").cast(DecimalType(38, 0)) -
          col("s_b") * col("n_a").cast(DecimalType(38, 0))))
          .cast(DecimalType(38, 0)).as("l1_num"))
      .withColumn("l1_shift_micro",
        expr("CAST(" + ExactArith.scaledFloorDivSql("l1_num",
          s"CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)) * " +
            s"CAST($scale AS DECIMAL(38,0))", 1000000L) + " AS BIGINT)"))
      .select(col("label"), col("n_a"), col("n_b"),
        col("l1_num").cast("string").as("l1_num"), col("l1_shift_micro"))
      .orderBy(col("label"))
  }
}
