package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.{Dedup, GlobalIds, UrlNorm}

/** Ninth batch (round 5): crawl-intake URL canonicalization,
  * text canonicalization (Unicode fold), containment dedup, scalable
  * global id assignment, and the salted skew JOIN remedy. Every query
  * is engine-exact with a full DuckDB oracle. */
object Relational9 {

  /** t31: URL canonicalization + canonical-URL keep-first dedup
    * ([[UrlNorm.dedupByCanonicalUrl]]). URLs are synthesized
    * deterministically from (source, doc_id) — uppercase host noise,
    * default port, `www.`, tracking params, unsorted params, trailing
    * slash, fragment — so the whole messy-input space is exercised and
    * DuckDB replays synthesis + canonicalization verbatim. The
    * `a=%5 / b=%3` structure guarantees pigeonhole collisions (25 docs
    * per source, 15 canonical slots), so the keep/dup verdicts are
    * exercised too. */
  def t31UrlNorm(spark: SparkSession, dir: String): DataFrame = {
    val url = concat(
      lit("HTTPS://WWW."), upper(col("source")), lit(".Example.COM:443/Docs/"),
      (col("doc_id") % 5).cast("string"),
      lit("/?utm_source=feed&b="), (col("doc_id") % 3).cast("string"),
      lit("&a="), (col("doc_id") % 5).cast("string"),
      lit("#sec"), col("doc_id").cast("string"))
    UrlNorm.dedupByCanonicalUrl(
        documents(spark, dir).select(col("doc_id"), col("source")),
        "doc_id", url)
      .orderBy(col("doc_id"))
  }

  /** t32: Unicode text canonicalization — NFD → strip combining marks →
    * NFC → casefold ([[graft.functions.GraftFunctions.foldText]], the
    * native `unicode_norm` expression): composed `é`, decomposed
    * `e`+U+0301, and case noise all collapse to one byte sequence, the
    * precondition for any hash-keyed dedup on multilingual text.
    * Accented tokens (plus a decomposed combining sequence) are planted
    * deterministically; DuckDB replays the fold with its utf8proc
    * `strip_accents`/`lower` — two independent Unicode implementations
    * agreeing bit-for-bit on the result. */
  def t32UnicodeFold(spark: SparkSession, dir: String): DataFrame = {
    val accented = array(lit("café"), lit("naïve"), lit("Zürich"),
      lit("São"), lit("crème"), lit("über"), lit("señor"), lit("àéîõü"))
    val planted = concat(
      substring_index(col("text"), " ", 3), lit(" "),
      element_at(accented, (col("doc_id") % 8 + 1).cast("int")),
      lit(" é"))
    documents(spark, dir)
      .select(col("doc_id"), planted.as("planted"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.foldText(col("planted")).as("folded"),
        length(col("planted")).as("n_cp"),
        length(graft.functions.GraftFunctions.foldText(col("planted")))
          .as("n_cp_folded"))
      .orderBy(col("doc_id"))
  }

  /** d17: containment near-dup pairs ([[Dedup.containmentPairs]]) —
    * the doc-inside-doc signal Jaccard misses: 15-word excerpt
    * documents are planted from every 20th document, and each must
    * surface with containment 1.0 against its host (the host's Jaccard
    * to the excerpt is ~0.08, far below any useful threshold). */
  def d17Containment(spark: SparkSession, dir: String): DataFrame = {
    val d0 = documents(spark, dir).select(col("doc_id"), col("text"))
    val quotes = d0.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 900000L).as("doc_id"),
        substring_index(col("text"), " ", 15).as("text"))
    Dedup.containmentPairs(d0.unionAll(quotes), "doc_id", "text",
        n = 3, threshold = 0.9)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** p25: contiguous global row ids ([[GlobalIds.assign]]) — the
    * two-level distributed rank whose oracle is the very operator it
    * refuses to run as a single task: `row_number() OVER (ORDER BY
    * doc_id)`. */
  def p25GlobalIds(spark: SparkSession, dir: String): DataFrame =
    GlobalIds.assign(documents(spark, dir).select(col("doc_id")), "doc_id")
      .orderBy(col("doc_id"))

  /** q42: salted skew JOIN proven exact — a planted hot key (every
    * l_orderkey % 3 == 0 line rerouted to partkey 1, ~33% of the fact
    * table on ONE key) would make a plain shuffle join put a third of
    * the table in one task. The remedy: fact rows take a deterministic
    * salt in [0,8), the dim side replicates 8× (one row per salt), and
    * the join key becomes (key, salt) — the hot key's rows spread over
    * 8 tasks. `merge` hints keep the broadcast planner from hiding the
    * skew problem being demonstrated. The oracle is the UNSALTED join:
    * revenue sums are decimal-exact, so salting must change nothing. */
  def q42SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
      .withColumn("jk",
        when(col("l_orderkey") % 3 === 0, lit(1L)).otherwise(col("l_partkey")))
      .withColumn("salt",
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(8L)))
    val dim = part(spark, dir).select(col("p_partkey"), col("p_brand"))
      .withColumn("salt", explode(sequence(lit(0L), lit(7L))))
    li.hint("merge")
      .join(dim.hint("merge"),
        li("jk") === dim("p_partkey") && li("salt") === dim("salt"))
      .groupBy(col("p_brand"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,6)") *
          (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
          .as("rev_raw"),
        count(lit(1)).as("n_lines"))
      .select(col("p_brand"),
        round(col("rev_raw"), 2).cast("double").as("revenue"), col("n_lines"))
      .orderBy(col("p_brand"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t31_urlnorm"      -> t31UrlNorm _,
    "t32_unicode_fold" -> t32UnicodeFold _,
    "d17_containment"  -> d17Containment _,
    "p25_global_ids"   -> p25GlobalIds _,
    "q42_salted_join"  -> q42SaltedJoin _)

  private val urlSynthSql =
    "'HTTPS://WWW.' || upper(source) || '.Example.COM:443/Docs/' || " +
      "CAST(doc_id % 5 AS VARCHAR) || '/?utm_source=feed&b=' || " +
      "CAST(doc_id % 3 AS VARCHAR) || '&a=' || CAST(doc_id % 5 AS VARCHAR) || " +
      "'#sec' || CAST(doc_id AS VARCHAR)"

  val oracles: Map[String, String] = Map(
    "t31_urlnorm" ->
      s"""WITH u AS (SELECT doc_id, $urlSynthSql AS url FROM documents),
         |c AS (SELECT doc_id,
         |  ${UrlNorm.canonicalizeOracleSql("url")} AS canon_url FROM u)
         |SELECT doc_id, canon_url,
         |  split_part(split_part(canon_url, '://', 2), '/', 1) AS host,
         |  CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY canon_url)
         |    THEN 1 ELSE 0 END AS INT) AS keep,
         |  count(*) OVER (PARTITION BY canon_url) AS n_dups
         |FROM c ORDER BY doc_id""".stripMargin,
    "t32_unicode_fold" ->
      """WITH p AS (SELECT doc_id,
        |    array_to_string(string_split(text, ' ')[1:3], ' ') || ' ' ||
        |    (['café','naïve','Zürich','São','crème','über','señor','àéîõü'])
        |      [CAST(doc_id % 8 AS INT) + 1] || ' e' || chr(769) AS planted
        |  FROM documents)
        |SELECT doc_id, lower(strip_accents(planted)) AS folded,
        |  length(planted) AS n_cp,
        |  length(lower(strip_accents(planted))) AS n_cp_folded
        |FROM p ORDER BY doc_id""".stripMargin,
    "d17_containment" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 900000 AS doc_id,
        |    array_to_string(string_split(text, ' ')[1:15], ' ') AS text
        |  FROM documents WHERE doc_id % 20 = 0),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(string_split(text,' ')) - 2),
        |    i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS shingles
        |  FROM corpus),
        |ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sz AS (SELECT doc_id, len(shingles) AS n_sh FROM sh)
        |SELECT id_a, id_b, n_inter,
        |  round(n_inter / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE), 6) AS containment
        |FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE n_inter / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "p25_global_ids" ->
      """SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS global_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q42_salted_join" ->
      """SELECT p_brand,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |    (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 2)
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part
        |  ON p_partkey = CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE l_partkey END
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
}
