package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-string self-join (entity resolution): all id pairs whose
  * strings are within Levenshtein distance 1, found WITHOUT the n²
  * cross join.
  *
  * Blocking is the deletion neighborhood (FastSS / SymSpell family:
  * Bocek et al. 2007, "Fast Similarity Search in Large Dictionaries"):
  * each string emits itself plus every single-character deletion as
  * 8-byte xxhash64 keys. Two strings with ed(s,t) ≤ 1 always share a
  * key —
  *
  *  - substitution at i:  del_i(s) = del_i(t);
  *  - deletion (t = del_i(s)): t's 0-deletion key equals s's del_i key;
  *  - equality: the 0-deletion keys match
  *
  * — so the block join has NO false negatives; a final exact
  * `levenshtein` filter on the (rare) candidates removes hash / block
  * false positives. FuzzyJoinSpec proves pair-set equality with the
  * brute-force O(n²) join on an adversarial corpus (substitutions,
  * indels, transpositions, duplicates).
  *
  * Segment blocking (PassJoin) was rejected: data with a long shared
  * prefix (every `Customer#…` name shares its first half) collapses one
  * segment key to a single block and re-creates the quadratic
  * candidate set. Deletion keys stay discriminative under shared
  * prefixes because every key retains all but one character.
  *
  * Scale posture: |s|+1 keys per row, shuffled as (hash, id) pairs —
  * strings never shuffle (the d10 convention). Candidate volume is
  * Σ_block |block|², bounded by true near-duplicate density plus hash
  * collisions, not by n². The exact filter joins strings back by id
  * (broadcast-able when the candidate set is small; a shuffle join on
  * the id key otherwise). A hot block (e.g. millions of identical
  * strings) is a REAL duplicate cluster — cap or pre-dedup with
  * [[Dedup]] before fuzzy-joining, as d08's cluster pipeline does.
  */
object FuzzyJoin {

  /** Upper bound on the Catalyst-estimated size of the (id, string)
    * dictionary projection for the string-back joins to take the
    * broadcast path; above it they fall back to shuffle joins on the
    * id key automatically. 128 MiB: comfortably inside one executor's
    * broadcast budget, far above any bench-scale dictionary (plan
    * estimates for parquet-backed frames derive from file sizes, so
    * a 100 TB corpus estimates far past this and degrades safely). */
  private[operators] val dictBroadcastMaxBytes: BigInt =
    BigInt(128L * 1024 * 1024)

  /** Pairs (id_a < id_b) with levenshtein(str_a, str_b) ≤ 1, plus the
    * distance. Output: (`ida`, `idb`, `dist`), ordered by caller.
    *
    * `maxBlockDf` is the hot-block guard (the d03 hot-bucket pattern):
    * a block shared by B rows expands to B²/2 candidates, and the one
    * way a deletion block gets huge is a giant cluster of identical or
    * near-identical strings. Blocks over the cap collapse to min-id
    * star links — each member pairs with the block's minimum id only,
    * O(B) not O(B²). When the cap triggers, the output is
    * DEDUP-GRADE: the duplicate cluster stays connected through its
    * representative (what cluster formation — d08 — consumes), but the
    * exhaustive pair list inside the hot cluster is not enumerated;
    * that list is itself Θ(B²) and no algorithm could emit it any
    * smaller. Pass `None` for the strict enumerate-every-pair
    * contract. */
  def levenshtein1SelfJoin(df: DataFrame, idCol: String, strCol: String,
                           maxBlockDf: Option[Int] = Some(1000))
  : DataFrame = {
    // null strings have no edit distance to anything: excluded up front
    // (explode of a null key array would drop them silently anyway —
    // this makes the contract explicit)
    val base = df.select(col(idCol).cast("long").as("__id"),
      col(strCol).as("__s")).filter(col("__s").isNotNull)
    // id + every single-deletion variant, hashed; array_distinct guards
    // strings with repeated characters (del_i == del_j) from emitting
    // duplicate keys and inflating the block join
    val keys = base.select(col("__id"),
      explode(array_distinct(expr(
        """transform(sequence(0, length(__s)),
          |  i -> xxhash64(CASE WHEN i = 0 THEN __s
          |                ELSE concat(substring(__s, 1, i - 1),
          |                            substring(__s, i + 1)) END))"""
          .stripMargin))).as("hk"))
    val cand = (maxBlockDf match {
      case Some(cap) =>
        // per-block pair expansion over the sorted member list: same
        // volume as the self-join below the cap, min-id star above it
        keys.groupBy(col("hk"))
          .agg(sort_array(collect_list(col("__id"))).as("ids"))
          .filter(size(col("ids")) >= 2)
          .select(explode(when(size(col("ids")) <= cap,
              expr("""flatten(transform(ids, (x, i) ->
                     |  transform(slice(ids, i + 2, size(ids)), y ->
                     |    struct(x AS ida, y AS idb))))""".stripMargin))
            .otherwise(
              expr("""transform(slice(ids, 2, size(ids) - 1), y ->
                     |  struct(ids[0] AS ida, y AS idb))""".stripMargin))).as("p"))
          .select(col("p.ida"), col("p.idb"))
      case None =>
        keys.as("l").join(keys.as("r"), col("l.hk") === col("r.hk"))
          .filter(col("l.__id") < col("r.__id"))
          .select(col("l.__id").as("ida"), col("r.__id").as("idb"))
    }).distinct()
    // The string-back joins broadcast the DICTIONARY side explicitly
    // (round-8 advice #4: left to AQE's size estimate, the hints pin
    // one plan on every host). The first r9 pin broadcast the
    // candidate side — wrong at both ends: cand is the LARGER frame
    // when near-duplicate density is high (sequential `Customer#…`
    // names pair with every one-digit neighbor, ~20× more pairs than
    // names), and wrapping the first join's OUTPUT in broadcast()
    // forced a driver collect + re-broadcast of the whole joined
    // frame between the two joins (23.8 MB of broadcast builds,
    // 3× the CPU of the shuffle plan it replaced). The (id, string)
    // projection is the smaller side at any density — near-dup pairs
    // are Ω(matches) while the dictionary is O(rows) — and two
    // dictionary broadcasts keep the candidate stream pipelined
    // through both hash joins in one codegen stage, zero shuffle.
    // For a dictionary too big to broadcast, the fallback is the
    // d10 convention (shuffle join on the id key) — and the flip is
    // AUTOMATIC (r9 advice): the hint is gated on Catalyst's own size
    // estimate of the (id, string) projection, so a corpus-scale
    // dictionary degrades to the shuffle join with no manual edit and
    // no driver/executor OOM risk.
    val dictBytes = base.queryExecution.optimizedPlan.stats.sizeInBytes
    def hinted(d: DataFrame): DataFrame =
      if (dictBytes <= dictBroadcastMaxBytes) broadcast(d) else d
    cand
      .join(hinted(base.select(col("__id").as("ida"), col("__s").as("sa"))),
        Seq("ida"))
      .join(hinted(base.select(col("__id").as("idb"), col("__s").as("sb"))),
        Seq("idb"))
      .withColumn("dist",
        org.apache.spark.sql.functions.levenshtein(col("sa"), col("sb"))
          .cast("long"))
      .filter(col("dist") <= 1)
      .select(col("ida"), col("idb"), col("dist"))
  }
}
