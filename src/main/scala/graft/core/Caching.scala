package graft.core

import org.apache.spark.sql.DataFrame

/** Cache-lifetime discipline for operators that must persist a
  * corpus-sized intermediate (two-consumer plans, nondeterministic
  * range samplers frozen for determinism — the GlobalIds/boilerplate
  * pattern).
  *
  * Two tools:
  *
  *  - [[materializeBounded]]: for operators whose OUTPUT is bounded
  *    (top-k readouts, |groups|·|percentiles| tables), the persist can
  *    be released INSIDE the operator — run the one action, rebuild the
  *    result as a LocalRelation, unpersist everything in `finally`. No
  *    caller contract needed; nothing survives the call.
  *
  *  - [[CacheLedger]]: for operators whose output is corpus-sized, the
  *    persist must outlive the call (the returned lazy frame may be
  *    consumed any number of times), so the operator REGISTERS it and a
  *    long-lived session calls [[CacheLedger.releaseAll]] between
  *    logical queries — the targeted form of
  *    `spark.catalog.clearCache()` that does not evict caches the
  *    caller created for itself. Bench/Verify call it (belt) in
  *    addition to their per-query `clearCache()` (braces).
  *
  * Safety note on release timing: nothing may unpersist a registered
  * frame WHILE a consuming action runs — which is why release is an
  * explicit caller act and never a listener firing mid-query. For
  * DETERMINISTIC persistLedgered intermediates a released frame is
  * also safe to re-consume (the next action just recomputes) — but a
  * localCheckpointLedgered frame is NOT: the checkpoint TRUNCATES
  * lineage, so once its pinned blocks are released there is nothing
  * to recompute FROM and a post-release action throws "checkpoint
  * block not found" rather than silently rebuilding (r9 review) —
  * results built on one (Bfs's reached set) must be fully consumed
  * before the boundary that releases it, same rule as the
  * nondeterministic class below. For NONDETERMINISTIC
  * snapshots (GlobalIds' range-sampler boundaries), release means the
  * retained result must NOT be consumed again: a post-release action
  * re-evaluates the sampler independently per plan branch (column
  * pruning makes the two exchanges non-identical, so ReuseExchange
  * cannot dedupe them) and offsets from one evaluation would join
  * ranks from the other. Release at a query boundary = "this query's
  * results are finished", not "cheap to rebuild".
  */
object Caching {

  /** Collect the (bounded!) result and rebuild it as a LocalRelation —
    * same schema, same row order — so every cached dependency can be
    * unpersisted by the caller's `finally` without the returned frame
    * ever re-reading them. Only for outputs with a hard size bound
    * independent of the corpus (top-k, group×percentile grids). */
  def materializeBounded(df: DataFrame): DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    df.sparkSession.createDataFrame(rows, df.schema)
  }

  /** Chain-position shorthand for the standard corpus-sized-
    * intermediate lifetime: persist MEMORY_AND_DISK and register with
    * the [[CacheLedger]], so `…expr.persistLedgered()` replaces
    * `…expr.persist(MEMORY_AND_DISK)` wherever the frame must outlive
    * the operator call and be released at the next query boundary.
    * Operators that release their own persists in `finally` (Hits,
    * exactQuantilesDistributed, Coreset) or per-iteration (BpeTrain,
    * KCore's checkpoint rounds, foreachBatch bodies) do NOT use it. */
  implicit class LedgerOps(private val df: DataFrame) {
    def persistLedgered(): DataFrame = CacheLedger.register(
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    /** `localCheckpoint` with ledger lifetime: the checkpoint's pinned
      * RDD blocks live OUTSIDE the SQL CacheManager (clearCache never
      * releases them — the Bfs/KCore fixpoint leak), so the underlying
      * RDDs register for direct unpersist at the next query boundary.
      * Defaults to eager, matching `Dataset.localCheckpoint()`. */
    def localCheckpointLedgered(eager: Boolean = true): DataFrame = {
      val out = df.localCheckpoint(eager)
      org.apache.spark.sql.graftbridge.ColumnBridge.checkpointedRdds(out)
        .foreach(CacheLedger.registerRdd)
      out
    }
  }

  /** Release a SUPERSEDED checkpoint's blocks NOW, mid-query — for
    * fixpoint loops where round r's checkpoint replaces round r−1's:
    * without this, the ledger's strong refs pin every round until the
    * query boundary and peak storage grows O(rounds × frontier),
    * where the pre-ledger code let the ContextCleaner reclaim dead
    * rounds mid-query. Only call on frames no later plan references. */
  def releaseCheckpoint(df: DataFrame): Unit =
    org.apache.spark.sql.graftbridge.ColumnBridge.checkpointedRdds(df)
      .foreach(r => try r.unpersist(blocking = false)
                    catch { case _: Throwable => () })

  /** Registry of operator-internal persisted frames. STRONG refs on
    * purpose: `Dataset.unpersist` needs the Dataset handle (the
    * CacheManager keys on its plan), and the returned lazy result
    * holds only the logical plan — a weak ref is collectable the
    * moment the operator returns, silently skipping the unpersist
    * (observed). The held plan trees are small and the ledger is
    * cleared at every query boundary, so retention is bounded. */
  object CacheLedger {
    private val entries =
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    private val rdds =
      new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.rdd.RDD[_]]()

    def register(df: DataFrame): DataFrame = {
      entries.add(df)
      df
    }

    /** Checkpoint-pinned RDDs (see `localCheckpointLedgered`) —
      * released by direct RDD unpersist, the only lever that reaches
      * blocks the SQL CacheManager doesn't own. */
    def registerRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit =
      rdds.add(rdd)

    /** Unpersist every registered frame/RDD and clear the ledger.
      * Call between logical queries, never during one. */
    def releaseAll(): Unit = {
      var df = entries.poll()
      while (df != null) {
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () }
        df = entries.poll()
      }
      var rdd = rdds.poll()
      while (rdd != null) {
        try rdd.unpersist(blocking = false)
        catch { case _: Throwable => () }
        rdd = rdds.poll()
      }
    }
  }
}
