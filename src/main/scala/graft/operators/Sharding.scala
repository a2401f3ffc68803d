package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + shard assignment — the export step of
  * a training-data pipeline: the curated corpus must reach the trainer
  * in a pseudorandom order that is REPRODUCIBLE (resumable jobs,
  * audit), split into fixed shard files.
  *
  * The shuffle key is the salted 60-bit md5 of the document id
  * ([[HyperLogLog.hashExpr]]'s exact hash contract, so DuckDB replays
  * it): a keyed hash is a pseudorandom permutation driver — changing
  * `salt` reshuffles, re-running does not. Shard = key mod n (hash
  * partitioning — every shard statistically equal-sized with no global
  * coordination), position = rank by (key, id) WITHIN the shard.
  *
  * Scale posture: one narrow projection (id, hash), one shuffle on the
  * shard key, one per-shard sort — exactly the physical plan of a
  * partitioned write (`repartition(n, key).sortWithinPartitions`),
  * which is how the real export runs; there is NO global row_number
  * (a single-partition bottleneck this operator exists to avoid — the
  * global order is never materialized, only the per-shard order, which
  * is all a sharded reader consumes).
  */
object Sharding {

  /** Assign every row a (shard, pos): shard = salted-md5(id) mod
    * `nShards`, pos = 1-based rank of (hash, id) within the shard.
    * Output: (`idCol`, shard, pos). */
  def corpusShuffle(df: DataFrame, idCol: String, nShards: Int,
                    salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = expr(HyperLogLog.hashExpr(idCol, salt))
    df.select(col(idCol), h.as("hk"))
      .withColumn("shard", (col("hk") % nShards).cast("long"))
      .withColumn("pos", row_number()
        .over(Window.partitionBy(col("shard"))
          .orderBy(col("hk"), col(idCol))).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }
}
