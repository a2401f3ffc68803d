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
    * integer numerator (DECIMAL(38,0)) and `tv_ppm` the drift in parts
    * per million via integer FLOOR division,
    *   tv_ppm = (tv_num · 10⁶) div (2 · n_s · N),
    * so the reported metric is bit-exact across engines. (A previous
    * form rounded the double quotient to 6 places; a quotient within
    * an ulp of a 5·10⁻⁷ boundary rounds differently in Spark's
    * BigDecimal HALF_UP vs DuckDB's float path — integer floor
    * division has no such boundary.) */
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
      // IntegralDivide (`div`) on decimals: exact floor quotient → LONG
      .withColumn("tv_ppm",
        expr("CAST((tv_num * CAST(1000000 AS DECIMAL(38,0))) div " +
          "(CAST(2 AS DECIMAL(38,0)) * CAST(ns AS DECIMAL(38,0)) * " +
          "CAST(nn AS DECIMAL(38,0))) AS BIGINT)"))
      .select(col("src").as("source"), col("ns").as("n_words"),
        col("tv_num"), col("tv_ppm"))
      .orderBy(col("source"))
  }
}
