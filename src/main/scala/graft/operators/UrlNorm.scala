package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup — the crawl-intake step
  * every web-scale corpus runs before content dedup: the same page
  * arrives under `HTTP://WWW.Site.com:80/a/?utm_source=x` and
  * `http://site.com/a`, and content-level dedup (d01/d03) should never
  * have to pay a text shuffle for what the URL already proves.
  *
  * Canonical form (the common subset of the Safe-Browsing / crawler
  * conventions, chosen so every step is a deterministic string rewrite
  * both engines replay exactly):
  *   1. drop the `#fragment`;
  *   2. lowercase the scheme and host;
  *   3. strip the scheme's default port (`:80` http, `:443` https);
  *   4. strip a leading `www.` host label;
  *   5. drop tracking parameters (`utm_*`, `ref=`, `fbclid=`,
  *      `gclid=`) and empty parameters;
  *   6. sort the surviving query parameters bytewise;
  *   7. strip the path's trailing slash.
  *
  * Scale posture: canonicalization is a scan-local projection (split /
  * filter / array_sort — all codegen'd, no UDF, no regex backtracking
  * beyond two anchored patterns); the keep-first dedup shuffles ONE
  * hashed key per row (the canonical string), never the document —
  * exactly d01's contract with the canonical URL as the digest.
  */
object UrlNorm {

  private val trackingPredSql =
    "p -> NOT (starts_with(p, 'utm_') OR starts_with(p, 'ref=') OR " +
      "starts_with(p, 'fbclid=') OR starts_with(p, 'gclid=') OR p = '')"

  /** Scan-local canonicalization of a URL column (see object doc for
    * the rule set). Assumes an absolute `scheme://host[:port]/...` URL
    * (the crawl-frontier invariant). */
  def canonicalize(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    // everything after the FIRST '://' — substring_index(…, -1) would
    // split at the LAST occurrence, so a URL embedding another absolute
    // URL in a query param would canonicalize to the EMBEDDED one
    // (caught in review; the DuckDB twin always used first-occurrence)
    val rest = substr(noFrag, length(scheme) + 4, lit(1 << 24))
    // the authority ends at the FIRST of '/' or '?' — a pathless URL
    // can still carry a query (https://a.com?x=1)
    val hostPort = lower(substring_index(substring_index(rest, "/", 1), "?", 1))
    // path+query with its leading '/' (empty when the URL has no path)
    val pathQ = substr(rest, length(hostPort) + 1, lit(1 << 24))
    val hostNoPort = when(scheme === "https",
        regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val host = regexp_replace(hostNoPort, "^www\\.", "")
    val path = regexp_replace(substring_index(pathQ, "?", 1), "/$", "")
    // query = everything after the FIRST '?' (a literal '?' inside a
    // param value belongs to the query, not to a second split point)
    val query = when(pathQ.contains("?"),
      substr(pathQ, length(substring_index(pathQ, "?", 1)) + 2, lit(1 << 24)))
      .otherwise(lit(""))
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => !(p.startsWith("utm_") || p.startsWith("ref=") ||
          p.startsWith("fbclid=") || p.startsWith("gclid=") || p === ""))),
      "&")
    concat(scheme, lit("://"), host, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

  /** Per-row canonical URL + keep-first dedup verdict + duplicate-set
    * size: (`idCol`, canon_url, host, keep, n_dups). One shuffle on the
    * canonical string (window partitioned by it — same clustering for
    * the min-id and the count). */
  def dedupByCanonicalUrl(df: DataFrame, idCol: String,
                          urlCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("canon_url"))
    val canon = col("canon_url")
    // after the FIRST '://' (a canonical URL can still embed another
    // absolute URL in a param value), authority ends at the first of
    // '/' or '?' (pathless canonical URLs can carry surviving params)
    val afterScheme = substr(canon,
      length(substring_index(canon, "://", 1)) + 4, lit(1 << 24))
    df.select(col(idCol), canonicalize(urlCol).as("canon_url"))
      .withColumn("host",
        substring_index(substring_index(afterScheme, "/", 1), "?", 1))
      .withColumn("keep",
        (col(idCol) === min(col(idCol)).over(w)).cast("int"))
      .withColumn("n_dups", count(lit(1)).over(w))
  }

  /** The t31/s12 test-fixture URL synthesis (deterministic from
    * (source, doc_id); exercises host case, default port, `www.`,
    * tracking params, unsorted params, trailing slash, fragment).
    * ONE definition for the Spark and SQL forms — four literal copies
    * previously had to stay byte-identical or the oracles would
    * silently diverge from their queries. */
  def synthUrl(docId: Column, source: Column): Column = concat(
    lit("HTTPS://WWW."), upper(source), lit(".Example.COM:443/Docs/"),
    (docId % 5).cast("string"),
    lit("/?utm_source=feed&b="), (docId % 3).cast("string"),
    lit("&a="), (docId % 5).cast("string"),
    lit("#sec"), docId.cast("string"))

  /** [[synthUrl]]'s DuckDB twin over the documents table's columns. */
  val synthUrlSql: String =
    "'HTTPS://WWW.' || upper(source) || '.Example.COM:443/Docs/' || " +
      "CAST(doc_id % 5 AS VARCHAR) || '/?utm_source=feed&b=' || " +
      "CAST(doc_id % 3 AS VARCHAR) || '&a=' || CAST(doc_id % 5 AS VARCHAR) || " +
      "'#sec' || CAST(doc_id AS VARCHAR)"

  /** DuckDB replay of [[canonicalize]] over a SQL expression `urlSql`
    * (same rule set, DuckDB's list/string surface). */
  def canonicalizeOracleSql(urlSql: String): String = {
    val noFrag = s"split_part($urlSql, '#', 1)"
    s"""(WITH parts AS (SELECT
       |    lower(split_part($noFrag, '://', 1)) AS scheme,
       |    substr($noFrag, strpos($noFrag, '://') + 3) AS rest),
       |hp AS (SELECT scheme, rest,
       |    lower(split_part(split_part(rest, '/', 1), '?', 1)) AS hostport,
       |    substr(rest,
       |      length(split_part(split_part(rest, '/', 1), '?', 1)) + 1) AS pathq
       |  FROM parts),
       |h AS (SELECT scheme, pathq,
       |    regexp_replace(CASE
       |      WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
       |      WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
       |      ELSE hostport END, '^www\\.', '') AS host
       |  FROM hp),
       |pq AS (SELECT scheme, host,
       |    regexp_replace(split_part(pathq, '?', 1), '/$$', '') AS path,
       |    CASE WHEN strpos(pathq, '?') > 0
       |      THEN substr(pathq, strpos(pathq, '?') + 1) ELSE '' END AS query
       |  FROM h),
       |pr AS (SELECT scheme, host, path,
       |    array_to_string(list_sort(list_filter(
       |      string_split(query, '&'), $trackingPredSql)), '&') AS params
       |  FROM pq)
       |SELECT scheme || '://' || host || path ||
       |  CASE WHEN params = '' THEN '' ELSE '?' || params END FROM pr)""".stripMargin
  }
}
