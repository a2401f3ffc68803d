package graft.operators

import graft.core.Caching.LedgerOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Contiguous global row ids at scale — `row_number() OVER (ORDER BY
  * key)` without the single-task global window that kills it at 100 TB.
  *
  * Two-level rank (the distributed zipWithIndex): range-partition the
  * rows on the key, rank locally inside each sorted partition (one
  * sequential counter per task — genuine per-partition imperative
  * logic, the documented `mapPartitions` carve-out), then add each
  * partition's starting offset, computed from the per-partition counts.
  * The counts are DERIVED from the ranked output itself (`max(local
  * rank)+1` per partition), so the data is scanned once and the only
  * extra traffic is one |partitions|-row aggregate + a broadcast join.
  *
  * The assigned ids are independent of WHERE the range boundaries fall
  * (any split of a sorted sequence prefix-sums to the same global
  * ranks), so the output is deterministic even though the range
  * sampler is not — the property that makes this safe to re-run.
  *
  * Cache lifetime: the internal `ranked` persist (MEMORY_AND_DISK,
  * corpus-sized) lives as long as the returned LAZY DataFrame may be
  * re-consumed — there is no eager point inside the operator at which
  * releasing it is safe (both consumers sit in the one returned plan,
  * and an early unpersist would let them recompute against DIFFERENT
  * sampler boundaries). It is registered with
  * [[graft.core.Caching.CacheLedger]]: callers release between logical
  * queries via `CacheLedger.releaseAll()` (Bench/Verify do, plus their
  * `clearCache()`); long-lived sessions call it at query boundaries.
  *
  * Requires `keyCol` totally ordered (unique); ids are 0-based and
  * dense. Output: (`keyCol`, global_id).
  */
object GlobalIds {

  def assign(df: DataFrame, keyCol: String): DataFrame = {
    // the typed fast path casts to long — a non-integral key would
    // cast to all-NULL and return garbage silently; reject loudly and
    // point at the generic form
    df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case t => throw new IllegalArgumentException(
        s"GlobalIds.assign needs an integral key column, got $t — " +
          "use assignBy for arbitrary sort columns")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism
    val ranked = df
      .select(col(keyCol).cast("long").as("k"))
      .repartitionByRange(parts, col("k"))
      .sortWithinPartitions(col("k"))
      .as[Long]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var i = -1L
        it.map { k => i += 1; (k, pid, i) }
      }
      .toDF("k", "pid", "lrank")
      // consumed twice (offset derivation + the final join): without
      // materialization the nondeterministic range sampler could place
      // boundaries DIFFERENTLY on the second run, and offsets computed
      // against run A would be joined with ranks from run B. The output
      // is corpus-sized, so the persist must outlive this call — it is
      // ledger-registered for release BETWEEN queries (never during
      // one: both consumers live in the one returned plan)
      .persistLedgered()
    // one narrow second scan: the per-partition counts fold map-side to
    // |partitions| rows; their running sum is the offset table (bounded
    // window — |partitions| rows in one task, not data)
    val offsets = ranked.groupBy(col("pid"))
      .agg((max(col("lrank")) + 1).as("cnt"))
      .withColumn("off",
        coalesce(sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("pid"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("pid"), col("off"))
    ranked.join(broadcast(offsets), "pid")
      .select(col("k").as(keyCol), (col("off") + col("lrank")).as("global_id"))
  }

  /** Generalized form: contiguous 0-based ids by an arbitrary TOTAL
    * order over `sortCols` (ties would make ranks partition-dependent —
    * include a unique tiebreaker). Keeps every input column and
    * appends `global_id`; same two-level shape as [[assign]], with the
    * generic row carried through a RowEncoder. */
  def assignBy(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val outSchema = StructType(sorted.schema.fields ++ Seq(
      StructField("__pid", IntegerType, nullable = false),
      StructField("__lrank", LongType, nullable = false)))
    val ranked = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var i = -1L
      it.map { r =>
        i += 1
        // Seq[Any] keeps pid an Int — a plain Seq(pid, i) would widen
        // it to Long and break the RowEncoder's INT field
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq[Any](pid, i))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .persistLedgered()
    val offsets = ranked.groupBy(col("__pid"))
      .agg((max(col("__lrank")) + 1).as("cnt"))
      .withColumn("off",
        coalesce(sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("__pid"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("off"))
    ranked.join(broadcast(offsets), "__pid")
      .withColumn("global_id", col("off") + col("__lrank"))
      .drop("__pid", "__lrank", "off")
  }

  /** EXCLUSIVE prefix sum of `valueCol` in `orderCol` order, added as
    * column `prefix` — the p14 two-level shape generalized: `orderCol`
    * must be a dense non-negative long (e.g. [[assignBy]]'s
    * `global_id`); rows prefix-sum inside `bucketWidth`-wide buckets
    * with a partitioned window, bucket totals fold in ONE bounded
    * single-partition task (corpus/bucketWidth rows by construction),
    * so there is no global sort and no unpartitioned WindowExec.
    * Cache lifetime: the bucketed projection persists for the two
    * branch scans — ledger-registered, released between queries like
    * every corpus-sized index intermediate here. */
  def exclusivePrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                         bucketWidth: Int = 1024): DataFrame = {
    require(bucketWidth >= 1, "bucket width must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val bucketed = df
      // integer division, not floor(x / w): the latter evaluates in
      // double and can mis-round past 2⁵³, assigning a row to the wrong
      // bucket and corrupting the prefix sum — `div` is exact at any
      // long magnitude
      .withColumn("__bucket", expr(s"`$orderCol` div $bucketWidth"))
      .persistLedgered()
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bucket")).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val inBucket = bucketed.withColumn("__in_off",
      coalesce(sum(col(valueCol)).over(wIn), lit(0L)))
    val bucketOffsets = bucketed.groupBy(col("__bucket"))
      .agg(sum(col(valueCol)).as("__bsum"))
      .select(col("__bucket").cast("long"), col("__bsum").cast("long"))
      .as[(Long, Long)]
      .repartition(1)
      .sortWithinPartitions(col("__bucket"))
      .mapPartitions { it =>
        var acc = 0L
        it.map { case (b, s) => val off = acc; acc += s; (b, off) }
      }
      .toDF("__bucket", "__b_off")
    inBucket.join(broadcast(bucketOffsets), "__bucket")
      .withColumn("prefix", col("__b_off") + col("__in_off"))
      .drop("__bucket", "__in_off", "__b_off")
  }
}
