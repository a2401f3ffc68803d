package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-exact KMV (k-minimum-values) distinct sketch — Bar-Yossef et
  * al. 2002, the "bottom-k" estimator — over the same 60-bit md5 hash
  * as [[HyperLogLog]].
  *
  * Where HLL keeps 2^P 1-byte registers, KMV keeps the k smallest
  * DISTINCT hash values seen; with hashes uniform on [0, 2^60) the
  * k-th smallest h_k estimates density, and
  * `(k-1) · 2^60 div h_k` estimates the distinct count (exact integer
  * floor division — the (k-1) numerator makes the estimator unbiased).
  * Under k distinct values the sketch IS the value set, so the count
  * is exact — the property HLL's linear-counting correction only
  * approximates. Relative error ≈ 1/√(k−2) (~8.9% at the default
  * k=128, 1 KiB of state per group).
  *
  * Everything is deterministic and integer-only, so DuckDB replays the
  * whole sketch bit for bit ([[oracleLeg]]): recompute the md5 hashes,
  * rank them per group, read h_k, do the same HUGEINT floor division.
  * No floating point anywhere — the a06 HLL pattern, without even the
  * one driver-rounded alpha constant.
  *
  * Scale posture: the sketch is a commutative, idempotent monoid
  * (set-union truncated to bottom-k), so the [[KmvAggregator]] gets
  * map-side partials — each partition ships ≤ k longs per group it
  * saw, never its rows — and the SAME aggregate runs in a single
  * streaming `groupBy` with k·8 bytes of state per group. Per-row cost
  * is O(1) once a group's sketch fills (one comparison against the
  * current h_k rejects hashes above it); only accepted hashes pay the
  * O(k) sorted insert, and at most k + k·H(n/k) « n rows are ever
  * accepted.
  */
object Kmv {

  /** Default sketch size: 1 KiB per group, ~8.9% relative error. */
  val K = 128

  private val Range60: Long = 1L << 60

  /** The estimate from a sorted distinct bottom-k array — shared by
    * [[KmvAggregator.finish]] and the spec's SQL-path replay. BigInt
    * only because (k−1)·2^60 exceeds Long for k > 8; the division is
    * still exact integer floor (both operands positive). */
  def estimate(sorted: Array[Long], k: Int): Long =
    if (sorted.length < k) sorted.length.toLong
    else ((BigInt(k - 1) * BigInt(Range60)) / BigInt(sorted(k - 1))).toLong

  /** Bottom-k distinct 60-bit hashes as a typed Aggregator. The buffer
    * is the sorted hash array packed big-endian into bytes (BINARY has
    * a first-class encoder; an O(k) repack per accepted row is noise
    * next to the row's own md5). */
  private[operators] def unpack(buf: Array[Byte]): Array[Long] = {
    val out = new Array[Long](buf.length / 8)
    val bb = java.nio.ByteBuffer.wrap(buf)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }
  private[operators] def pack(xs: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(xs.length * 8)
    xs.foreach(bb.putLong)
    bb.array()
  }

  class KmvAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Byte], Long] {
    import Kmv.{unpack, pack}

    override def zero: Array[Byte] = Array.emptyByteArray

    override def reduce(buf: Array[Byte], h: Long): Array[Byte] = {
      val n = buf.length / 8
      // O(1) fast path: a full sketch rejects anything ≥ its current
      // h_k (the last packed long) — the overwhelmingly common case
      if (n == k) {
        val hk = java.nio.ByteBuffer.wrap(buf, (n - 1) * 8, 8).getLong
        if (h >= hk) return buf
      }
      val xs = unpack(buf)
      val pos = java.util.Arrays.binarySearch(xs, h)
      if (pos >= 0) return buf // already present: idempotent
      val ins = -pos - 1
      val kept = math.min(n + 1, k)
      val out = new Array[Long](kept)
      System.arraycopy(xs, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(xs, ins, out, ins + 1, kept - ins - 1)
      pack(out)
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val xs = unpack(a); val ys = unpack(b)
      val out = new Array[Long](math.min(xs.length + ys.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < xs.length || j < ys.length)) {
        val take =
          if (j >= ys.length || (i < xs.length && xs(i) <= ys(j))) {
            val v = xs(i); i += 1
            if (j < ys.length && ys(j) == v) j += 1 // union, not multiset
            v
          } else { val v = ys(j); j += 1; v }
        out(o) = take; o += 1
      }
      pack(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
    }

    override def finish(buf: Array[Byte]): Long = estimate(unpack(buf), k)
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  /** The same bottom-k monoid, finishing with the sketch's sorted
    * hash VALUES instead of the distinct-count estimate — the form
    * set-RESEMBLANCE estimators need (d22): two sketches' bottom-k
    * union says which of its members both sides hold. */
  class KmvSketchAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Long, Array[Byte], Seq[Long]] {
    private val core = new KmvAggregator(k)
    override def zero: Array[Byte] = core.zero
    override def reduce(buf: Array[Byte], h: Long): Array[Byte] =
      core.reduce(buf, h)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      core.merge(a, b)
    override def finish(buf: Array[Byte]): Seq[Long] =
      Kmv.unpack(buf).toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** `kmv_distinct(hash)` as a Column over [[HyperLogLog.hashExpr]]
    * input — batch and streaming alike. */
  def kmvAgg(keyCol: String, prefix: String, k: Int = K): Column =
    udaf(new KmvAggregator(k)).apply(expr(HyperLogLog.hashExpr(keyCol, prefix)))

  /** The same 60-bit md5 item hash built from a Column instead of a
    * spliced column name — for callers whose key is a computed
    * canonical string ([[Profile]]). NULL canon must be coalesced by
    * the caller (concat propagates null into the aggregator input). */
  def hashCol(canon: Column, prefix: String): Column =
    conv(substring(md5(concat(lit(s"$prefix|"), canon)), 1, 15), 16, 10)
      .cast("long")

  /** [[kmvAgg]] over a caller-built canonical string Column. */
  def kmvAggCol(canon: Column, prefix: String, k: Int = K): Column =
    udaf(new KmvAggregator(k)).apply(hashCol(canon, prefix))

  /** Ungrouped scalar form of [[oracleLeg]]: a parenthesized DuckDB
    * subquery estimating the distinct count of `canonSql` (a VARCHAR
    * expression, null-free) over `table` — the whole-table KMV replay
    * [[Profile.profile]]'s oracle splices once per profiled column. */
  def oracleScalar(table: String, canonSql: String, prefix: String,
                   k: Int = K): String =
    s"""(SELECT CAST(CASE WHEN count(*) < $k THEN count(*)
       |    ELSE (${k - 1}::HUGEINT * $Range60::HUGEINT)
       |         // max(CASE WHEN rn = $k THEN h END) END AS BIGINT)
       | FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
       |       FROM (SELECT DISTINCT
       |         ('0x' || substr(md5('$prefix|' || $canonSql), 1, 15))::BIGINT AS h
       |         FROM $table))
       | WHERE rn <= $k)""".stripMargin

  /** Per-group KMV distinct count of `prefix|key` strings. */
  def approxCountDistinct(df: DataFrame, groupCol: String, keyCol: String,
                          prefix: String, outCol: String, k: Int = K): DataFrame =
    df.groupBy(col(groupCol)).agg(kmvAgg(keyCol, prefix, k).as(outCol))

  /** The DuckDB replay of one [[approxCountDistinct]] leg, as a CTE
    * body producing (grp, `outCol`): rank the distinct hashes, keep the
    * bottom k, read nd (= min(n, k)) and h_k, apply the same floor
    * division. nd < k ⇒ the sketch held every distinct hash ⇒ exact. */
  def oracleLeg(table: String, groupCol: String, keyCol: String,
                prefix: String, outCol: String, k: Int = K): String =
    s"""SELECT grp, CAST(CASE WHEN nd < $k THEN nd
       |    ELSE (${k - 1}::HUGEINT * $Range60::HUGEINT) // hk END AS BIGINT) AS $outCol
       |FROM (
       |  SELECT grp, count(*) AS nd, max(CASE WHEN rn = $k THEN h END) AS hk
       |  FROM (
       |    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT $groupCol AS grp,
       |      ('0x' || substr(md5('$prefix|' || CAST($keyCol AS VARCHAR)), 1, 15))::BIGINT AS h
       |      FROM $table))
       |  WHERE rn <= $k
       |  GROUP BY grp)""".stripMargin

  /** Cross-source vocabulary Jaccard from bottom-k sketches (d22) —
    * Broder's set-resemblance estimator in its KMV form (Beyer et al.
    * SIGMOD'07 §5): for sources a, b with sketches S_a, S_b (the k
    * smallest distinct gram hashes each), the k smallest of S_a ∪ S_b
    * are a uniform sample of a ∪ b, so
    * J(a, b) ≈ |{h ∈ U_k : h ∈ S_a ∧ h ∈ S_b}| / |U_k|.
    * t40 computes the exact containment matrix by joining the full
    * per-source gram postings — corpus-sized on both legs; this reads
    * the same signal from |sources|·k longs of state: the corpus-sized
    * work collapses to ONE map-side-combining sketch aggregation (the
    * [[KmvAggregator]] monoid), and the pair stage touches only
    * sketches (k·|sources|² rows bounded, data-independent). Same
    * gram universe and same 60-bit hash as t40, so the sketch is
    * literally sampling t40's exact matrix.
    *
    * Everything is integer-exact and the sketch is deterministic in
    * the data, so DuckDB replays the estimate bit for bit — the
    * estimator's ±1/√k error is vs the TRUE Jaccard, not across
    * engines. Output: (source_a, source_b, k_used, n_common,
    * jaccard_est_ppm) per unordered pair, a < b. */
  def crossSourceJaccard(docs: DataFrame, srcCol: String, textCol: String,
                         n: Int = 3, k: Int = 256): DataFrame = {
    val sk = docs
      .select(col(srcCol).as("source"),
        explode(graft.functions.GraftFunctions.ngramStrings(col(textCol), n))
          .as("shingle"))
      .select(col("source"), Dedup.md5Hash60Col(col("shingle")).as("h"))
      .groupBy(col("source"))
      .agg(udaf(new KmvSketchAggregator(k)).apply(col("h")).as("sk"))
    val r = sk.select(col("source"), explode(col("sk")).as("h"))
    val srcs = sk.select(col("source"))
    val pairs = srcs.as("pa").join(srcs.as("pb"),
        col("pa.source") < col("pb.source"))
      .select(col("pa.source").as("sa"), col("pb.source").as("sb"))
    val ea = pairs.join(r, col("source") === col("sa"))
      .select(col("sa"), col("sb"), col("h"),
        lit(1L).as("in_a"), lit(0L).as("in_b"))
    val eb = pairs.join(r, col("source") === col("sb"))
      .select(col("sa"), col("sb"), col("h"),
        lit(0L).as("in_a"), lit(1L).as("in_b"))
    val u = ea.unionByName(eb)
      .groupBy(col("sa"), col("sb"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    // union bottom-k per pair: the window runs over sketch rows only
    // (≤ 2k per pair — bounded state however large the corpus)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sa"), col("sb")).orderBy(col("h"))
    u.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("k_used"),
        sum(col("in_a") * col("in_b")).as("n_common"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("k_used"), col("n_common"),
        expr("(n_common * 1000000) div k_used").as("jaccard_est_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }
}
