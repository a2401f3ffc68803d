package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the multi-dimensional clustering
  * trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving the
  * bits of two scan-predicate columns gives a single sort key under
  * which rows close in EITHER dimension land close in the layout, so
  * per-file/bucket min-max stats prune scans on BOTH columns instead
  * of only the leading sort column.
  *
  * Everything is integer bit arithmetic (shift/mask interleave) — a
  * SQL engine replays z-values and bucket stats bit for bit.
  *
  * Scale posture: the z-value is a scan-local projection; the layout
  * action at scale is `repartitionByRange($"zval")` +
  * `sortWithinPartitions` (one range shuffle, the same cost as any
  * global sort layout); [[bucketStats]] aggregates to the bucket
  * count, which is bounded by the z-prefix width, not the corpus. */
object ZOrder {

  /** Bit-spread: 31-bit input x → 62-bit word with x's bits at even
    * positions (the "binary magic numbers" interleave). */
  private def spread(x: Column): Column = {
    val a = x.bitwiseAND(lit(0x7FFFFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val c = b.bitwiseOR(shiftleft(b, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val d = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x3333333333333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton z-value of two non-negative ≤31-bit columns: bits of `a`
    * at even positions, bits of `b` at odd. */
  def zValue(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))

  /** JVM reference of [[zValue]] for specs. */
  def zValueLocal(a: Long, b: Long): Long = {
    def sp(x0: Long): Long = {
      var x = x0 & 0x7FFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      (x | (x << 1)) & 0x5555555555555555L
    }
    sp(a) | (sp(b) << 1)
  }

  /** Per-bucket layout stats under the z-order: bucket = zval >>
    * `bucketShift` (a quadtree cell — 2^(shift/2) × 2^(shift/2) in
    * the two dimensions), with row count and min/max of both columns,
    * plus a `touched` flag for the query box [`aLo`,`aHi`] ×
    * [`bLo`,`bHi`] (bucket stats intersect the box ⇒ a scan must read
    * it). The fraction of touched buckets is the pruning win a
    * min-max-indexed store gets from this layout. */
  def bucketStats(df: DataFrame, aCol: String, bCol: String,
                  bucketShift: Int,
                  aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame =
    df.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .withColumn("__z", zValue(col("a"), col("b")))
      .groupBy(shiftright(col("__z"), bucketShift).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      .withColumn("touched",
        (col("min_a") <= aHi && col("max_a") >= aLo &&
          col("min_b") <= bHi && col("max_b") >= bLo).cast("int"))

  /** The DuckDB replay of [[bucketStats]]: same masks, same shifts,
    * same box. `src` must expose the two columns. */
  def oracleSql(src: String, aCol: String, bCol: String, bucketShift: Int,
                aLo: Long, aHi: Long, bLo: Long, bHi: Long): String =
    s"""WITH z0 AS (SELECT CAST($aCol AS BIGINT) AS a,
       |    CAST($bCol AS BIGINT) AS b,
       |    (CAST($aCol AS BIGINT) & 2147483647) AS ax,
       |    (CAST($bCol AS BIGINT) & 2147483647) AS bx
       |  FROM $src),
       |z1 AS (SELECT a, b, ((ax | (ax << 16)) & 281470681808895) AS ax,
       |    ((bx | (bx << 16)) & 281470681808895) AS bx FROM z0),
       |z2 AS (SELECT a, b, ((ax | (ax << 8)) & 71777214294589695) AS ax,
       |    ((bx | (bx << 8)) & 71777214294589695) AS bx FROM z1),
       |z3 AS (SELECT a, b, ((ax | (ax << 4)) & 1085102592571150095) AS ax,
       |    ((bx | (bx << 4)) & 1085102592571150095) AS bx FROM z2),
       |z4 AS (SELECT a, b, ((ax | (ax << 2)) & 3689348814741910323) AS ax,
       |    ((bx | (bx << 2)) & 3689348814741910323) AS bx FROM z3),
       |z5 AS (SELECT a, b, ((ax | (ax << 1)) & 6148914691236517205) AS ax,
       |    ((bx | (bx << 1)) & 6148914691236517205) AS bx FROM z4),
       |z AS (SELECT a, b, (ax | (bx << 1)) AS zv FROM z5)
       |SELECT zv >> $bucketShift AS bucket, count(*) AS n_rows,
       |  min(a) AS min_a, max(a) AS max_a,
       |  min(b) AS min_b, max(b) AS max_b,
       |  CAST(CASE WHEN min(a) <= $aHi AND max(a) >= $aLo
       |    AND min(b) <= $bHi AND max(b) >= $bLo
       |    THEN 1 ELSE 0 END AS INT) AS touched
       |FROM z GROUP BY 1""".stripMargin
}
