package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE training (Sennrich et al. 2016) — the piece of the
  * tokenizer story that IS buildable offline: the cl100k ranks FILE is
  * unobtainable data, but the algorithm that produces such files runs
  * fine on the corpus itself, and [[graft.core.BpeTokenizer.fromRanks]]
  * consumes the result, closing the train→encode loop end to end.
  *
  * Classic BPE trains over the WORD-FREQUENCY dictionary, not the raw
  * corpus: one corpus pass builds (word, freq) — vocabulary-bounded —
  * and every merge iteration is a small Spark job over that cached
  * dict (adjacent-pair counts weighted by word frequency, best pair by
  * (weight desc, pair asc) — deterministic), followed by a scan-local
  * merge application. At 100 TB the corpus pass is the only
  * corpus-sized job; iterations scale with |vocab|, not corpus rows.
  *
  * Symbols are characters (string-level BPE); merged tokens concatenate.
  * Training stops early when no pair reaches `minFreq`. */
object BpeTrain {

  /** One learned merge: `left`+`right` → `left+right`, chosen at `rank`
    * with corpus weight `weight`. */
  final case class Merge(rank: Int, left: String, right: String, weight: Long) {
    def merged: String = left + right
  }

  private val storage = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** Learn `numMerges` merges from the corpus.
    *
    * Hybrid execution: the word-frequency dict is vocabulary-bounded, so
    * when it fits under `maxLocalVocab` rows it is collected ONCE and the
    * merge loop runs on the driver (a Spark job per merge would pay
    * whole-job overhead to scan a few thousand rows — measured 4 min vs
    * seconds for 24 merges on a 40-word vocabulary). Corpora whose
    * vocabulary genuinely exceeds the bound take the distributed loop,
    * where each iteration is a pair-count job over the cached dict.
    * Both paths implement identical arithmetic and tie-breaks —
    * BpeTrainSpec asserts sequence equality. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minFreq: Long = 2L, maxLocalVocab: Long = 100000L): Seq[Merge] =
    core(docs, textCol, numMerges, minFreq, maxLocalVocab,
      needAlphabet = false)._1

  /** [[train]] plus the corpus ALPHABET (every distinct character),
    * extracted from the word dict the training pass already built — no
    * second corpus scan (and no alphabet job at all for plain [[train]]
    * callers on the distributed path). */
  def trainFull(docs: DataFrame, textCol: String, numMerges: Int,
                minFreq: Long = 2L, maxLocalVocab: Long = 100000L)
  : (Seq[Merge], Seq[String]) =
    core(docs, textCol, numMerges, minFreq, maxLocalVocab, needAlphabet = true)

  private def core(docs: DataFrame, textCol: String, numMerges: Int,
                   minFreq: Long, maxLocalVocab: Long,
                   needAlphabet: Boolean): (Seq[Merge], Seq[String]) = {
    require(numMerges >= 1, "need at least one merge")
    val spark = docs.sparkSession
    var dict = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(expr("split(word, '')").as("syms"), col("freq"))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist(storage)
    val vocabSize = dict.count()

    if (vocabSize <= maxLocalVocab) {
      val rows = dict.collect()
        .map(r => (r.getSeq[String](0).toArray, r.getLong(1)))
      dict.unpersist(false)
      val alphabet =
        if (!needAlphabet) Seq.empty[String]
        else rows.iterator.flatMap(_._1).toSeq.distinct.sorted
      return (trainLocal(rows, numMerges, minFreq), alphabet)
    }
    val alphabet =
      if (!needAlphabet) Seq.empty[String]
      else dict.select(explode(col("syms")).as("c")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted

    val merges = ArrayBuffer.empty[Merge]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = dict.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(0, size(syms) - 2),
            |  j -> struct(element_at(syms, j + 1) AS l,
            |              element_at(syms, j + 2) AS r))""".stripMargin)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("w"))
        .orderBy(col("w").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getLong(2) < minFreq) done = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        merges += Merge(i, l, r, top(0).getLong(2))
        // greedy left-to-right, non-overlapping — the standard BPE
        // application order ("aaa" under (a,a) becomes [aa, a])
        val mergeUdf = udf { syms: Seq[String] =>
          val out = ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
              out += l + r; j += 2
            } else { out += syms(j); j += 1 }
          }
          out.toSeq
        }
        val next = dict.select(mergeUdf(col("syms")).as("syms"), col("freq"))
          .persist(storage)
        next.count()
        dict.unpersist(false)
        dict = next
      }
      i += 1
    }
    dict.unpersist(false)
    (merges.toSeq, alphabet)
  }

  /** UTF-8 binary string ordering — Spark's `orderBy` on strings
    * compares UTF-8 bytes unsigned, while Java's `compareTo` compares
    * UTF-16 units; they disagree for supplementary characters vs
    * U+E000..U+FFFF, so the LOCAL tie-break must use the same byte
    * ordering as the distributed path or merge sequences diverge
    * depending only on which path ran. */
  private val utf8Ordering: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    var r = 0
    while (r == 0 && i < n) {
      r = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      i += 1
    }
    if (r != 0) r else java.lang.Integer.compare(x.length, y.length)
  }

  /** Driver-side merge loop — identical arithmetic and (weight desc,
    * pair asc in UTF-8 byte order) tie-break as the distributed path. */
  private def trainLocal(dict0: Array[(Array[String], Long)], numMerges: Int,
                         minFreq: Long): Seq[Merge] = {
    var dict = dict0
    val merges = ArrayBuffer.empty[Merge]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (syms, freq) =>
        var j = 0
        while (j + 1 < syms.length) {
          val key = (syms(j), syms(j + 1))
          counts.update(key, counts.getOrElse(key, 0L) + freq)
          j += 1
        }
      }
      implicit val ord: Ordering[String] = utf8Ordering
      val best = counts.toSeq
        .sortBy { case ((l, r), w) => (-w, l, r) }
        .headOption
      best match {
        case Some(((l, r), w)) if w >= minFreq =>
          merges += Merge(i, l, r, w)
          dict = dict.map { case (syms, freq) =>
            val out = ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
                out += l + r; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.toArray, freq)
          }
        case _ => done = true
      }
      i += 1
    }
    merges.toSeq
  }

  /** Rank table for [[graft.core.BpeTokenizer.fromRanks]]: every
    * character of the learned merges (and any extra base characters
    * supplied) ranked first by codepoint, then the merged tokens in
    * merge order — the rank ordering the encoder's lowest-rank-first
    * loop needs to reproduce training segmentation. */
  def ranks(merges: Seq[Merge], baseChars: Seq[String] = Nil): Map[String, Int] = {
    // codepoint (UTF-8 byte) order, not default UTF-16 String order — the
    // two disagree for supplementary characters vs U+E000..U+FFFF and the
    // rank table must match the training path's byte ordering
    val chars = (merges.flatMap(m => (m.left + m.right).map(_.toString)) ++
      baseChars).distinct.sorted(utf8Ordering)
    val base = chars.zipWithIndex.toMap
    // earlier-wins on merged-token collisions: two different merges can
    // produce the same string (e.g. (a,bc) and (ab,c) both → "abc");
    // the encoder's lowest-rank-first loop must see the FIRST (lowest)
    // rank or encode segmentation diverges from training
    merges.foldLeft(base) { (m, mg) =>
      if (m.contains(mg.merged)) m else m + (mg.merged -> (base.size + mg.rank))
    }
  }

  /** Char-level greedy BPE encode: apply the lowest-ranked applicable
    * merge until none applies — the standard encode loop, over the SAME
    * character symbols training used. (The byte-level
    * [[graft.core.BpeTokenizer]] would split multi-byte characters into
    * bytes whose partial sequences are never in a char-trained rank
    * table, and its cl100k pre-tokenizer would cut words at
    * apostrophe/digit boundaries training never saw — char-trained
    * ranks must be applied char-wise.) */
  private[operators] def encodeWord(word: String,
                                    rankMap: Map[String, Int]): Seq[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var continue = syms.length >= 2
    while (continue) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j + 1 < syms.length) {
        rankMap.get(syms(j) + syms(j + 1)) match {
          case Some(r) if r < bestRank => bestRank = r; bestIdx = j
          case _ =>
        }
        j += 1
      }
      if (bestIdx < 0) continue = false
      else {
        syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
          syms.drop(bestIdx + 2)
        continue = syms.length >= 2
      }
    }
    syms.toSeq
  }

  /** Encode the corpus with merges just trained on it: one training
    * pass, then a scan-local UDF over the broadcast rank table — the
    * full train→encode loop as one operator. Output per document:
    * (doc_id, n_chars, n_bpe_tokens, chars_per_token), the
    * chars-per-token compression every tokenizer evaluation reports.
    * The ratio rounds half-away in integer micro-units (t19 rule). */
  def trainEncode(docs: DataFrame, idCol: String, textCol: String,
                  numMerges: Int, minFreq: Long = 2L): DataFrame = {
    // alphabet comes back from the training pass's own dict — no second
    // corpus scan
    val (merges, alphabet) = trainFull(docs, textCol, numMerges, minFreq)
    val rankMap = ranks(merges, alphabet)
    val bc = docs.sparkSession.sparkContext.broadcast(rankMap)
    val countUdf = udf { (text: String) =>
      if (text == null) 0L
      else text.split(" ").iterator.filter(_.nonEmpty)
        .map(w => encodeWord(w, bc.value).length.toLong).sum
    }
    docs.select(col(idCol).as("doc_id"),
        length(col(textCol)).cast("long").as("n_chars"),
        countUdf(col(textCol)).as("n_bpe_tokens"))
      .withColumn("chars_per_token",
        when(col("n_bpe_tokens") === 0, lit(0.0))
          .otherwise(TextAnalysis.microMean("n_chars", "n_bpe_tokens")))
  }

  /** The merge table as a DataFrame (for the query surface). */
  def trainTable(docs: DataFrame, textCol: String, numMerges: Int,
                 minFreq: Long = 2L, maxLocalVocab: Long = 100000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, numMerges, minFreq, maxLocalVocab)
      .map(m => (m.rank.toLong, m.left, m.right, m.merged, m.weight))
      .toDF("rank", "left", "right", "merged", "weight")
  }
}
