package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fill-in-the-middle span corruption (p31) — the training-data
  * transform behind FIM-capable code/text models (Bavarian et al.,
  * "Efficient Training of Language Models to Fill in the Middle",
  * 2022): each document is cut at two deterministic points into
  * (prefix, middle, suffix) and re-serialized with the middle moved to
  * the end, in PSM or SPM sentinel order, so the model learns infilling
  * from an ordinary left-to-right objective.
  *
  * Everything is a pure function of (doc_id, text): the two cut points
  * and the PSM/SPM coin come from 60-bit md5 prefixes of tagged doc-id
  * strings (the t34 md5-coin convention — deterministic, uniform,
  * engine-replayable), so the whole transform is scan-local with ZERO
  * shuffles, survives any repartition, and an oracle replays the
  * re-serialized text byte for byte. At 100 TB this is the ideal
  * operator shape: map-only over the corpus scan, output size = input
  * size + 3 sentinels per row.
  */
object Fim {

  val Pre = "<PRE>"
  val Suf = "<SUF>"
  val Mid = "<MID>"

  private def h(tag: String, idCol: String) =
    Dedup.md5Hash60Col(concat(lit(s"$tag|"), col(idCol).cast("string")))

  /** (doc_id, mode, n_prefix, n_middle, n_suffix, fim_text) per doc of
    * length ≥ 2; cut points lo ≤ hi in [1, len] give
    * prefix = text[1, lo−1], middle = text[lo, hi−1], suffix =
    * text[hi, len] (prefix and middle may be empty; the suffix always
    * carries ≥ 1 char since hi ≤ len; the three always reassemble to
    * the original — the invariant NoveltyFimSpec pins).
    * mode: 'psm' → PRE p SUF s MID m; 'spm' → SUF s PRE p MID m. */
  def fimSplit(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull && length(col(textCol)) >= 2)
      .withColumn("__len", length(col(textCol)).cast("long"))
      .withColumn("__c1", h("fim1", idCol) % col("__len") + 1)
      .withColumn("__c2", h("fim2", idCol) % col("__len") + 1)
      .withColumn("__lo", least(col("__c1"), col("__c2")))
      .withColumn("__hi", greatest(col("__c1"), col("__c2")))
      .withColumn("__prefix",
        expr(s"substring($textCol, 1, cast(__lo as int) - 1)"))
      .withColumn("__middle",
        expr(s"substring($textCol, cast(__lo as int), cast(__hi - __lo as int))"))
      .withColumn("__suffix",
        expr(s"substring($textCol, cast(__hi as int), cast(__len - __hi as int) + 1)"))
      .withColumn("mode",
        when(h("fimm", idCol) % 2 === 0, lit("psm")).otherwise(lit("spm")))
      .select(
        col(idCol).as("doc_id"),
        col("mode"),
        length(col("__prefix")).cast("long").as("n_prefix"),
        length(col("__middle")).cast("long").as("n_middle"),
        length(col("__suffix")).cast("long").as("n_suffix"),
        when(col("mode") === "psm",
          concat(lit(Pre), col("__prefix"), lit(Suf), col("__suffix"),
            lit(Mid), col("__middle")))
          .otherwise(
            concat(lit(Suf), col("__suffix"), lit(Pre), col("__prefix"),
              lit(Mid), col("__middle"))).as("fim_text"))
      .orderBy(col("doc_id"))
}
