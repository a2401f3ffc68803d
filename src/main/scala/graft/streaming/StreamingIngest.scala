package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.core.ChunkStrategy
import graft.pipeline.{EmbedPipeline, Embedder, HashEmbedder, VectorRecord}

/** Streaming mode of the engine (SURVEY §2.8): the reference is a
  * queue-consumer pipeline with at-least-once delivery and independent
  * work items; Structured Streaming's file source over a drop directory
  * reproduces it with exactly-once sink semantics via checkpointing —
  * strictly stronger than the reference's ack-after-process.
  *
  * The reference has no event-time notion; the windowed/sessionized
  * aggregations here are the north-star streaming-analytics extensions
  * (watermarks bound state; without them a 100 TB stream accretes state
  * forever). */
object StreamingIngest {

  /** Drop-directory ingestion: every file that lands becomes a document
    * row (path, content, ingest batch). `maxFilesPerTrigger` is the
    * backpressure knob (the RabbitMQ prefetch analogue). */
  def readDocuments(spark: SparkSession, dropDir: String,
                    maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .option("wholetext", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dropDir)
      .select(
        abs(xxhash64(input_file_name())).as("doc_id"),
        input_file_name().as("source"),
        col("value").as("text"))

  /** Streaming chunk+embed: same stages as the batch pipeline — the
    * DataFrame program is shared, only the source differs. */
  def embedStream(docs: DataFrame, strategy: ChunkStrategy = ChunkStrategy.ExactByCharacters,
                  size: Int = 256, overlap: Int = 128,
                  embedder: Embedder = new HashEmbedder(64)): Dataset[VectorRecord] =
    EmbedPipeline.embedStage(
      EmbedPipeline.chunkStage(docs, strategy, size, overlap), embedder)

  /** Start the ingestion: vectors written to a parquet store laid out
    * as one `batch=N` partition directory per micro-batch (so a
    * re-delivered batch overwrites instead of duplicating — effective
    * exactly-once; readers see an extra `batch` provenance column via
    * partition discovery). Do not mix with a flat pre-existing store:
    * partition discovery rejects conflicting layouts. */
  def start(vectors: Dataset[VectorRecord], outDir: String, checkpointDir: String,
            ledgerDir: Option[String] = None): StreamingQuery =
    vectors.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[VectorRecord], batchId: Long) =>
        batch.persist()
        // idempotent by batchId: a crash between this write and the
        // checkpoint commit re-delivers the batch, which then OVERWRITES
        // the same directory instead of appending duplicates — this is
        // what makes checkpoint + foreachBatch actually exactly-once
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ledgerDir.foreach { dir =>
          EmbedPipeline.ledger(batch.toDF())
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").parquet(s"$dir/batch=$batchId")
        }
        batch.unpersist()
        ()
      }
      .start()

  /** Streaming vector-DB upsert (K1-K3 in streaming mode): each
    * micro-batch flows through [[graft.sinks.VectorDbSinks.upsert]] with
    * the batchId as the uuid5 jobId component — re-delivered batches
    * re-send the SAME record ids, so the store's upsert semantics make
    * checkpoint + foreachBatch effectively exactly-once end to end
    * (the reference's own idempotency design, README.md:210). */
  def startVectorDb(vectors: Dataset[VectorRecord], checkpointDir: String,
                    baseUrl: String, apiKey: String,
                    shape: graft.sinks.VectorDbSinks.PayloadShape,
                    jobId: String): StreamingQuery =
    vectors.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[VectorRecord], batchId: Long) =>
        graft.sinks.VectorDbSinks.upsert(batch, baseUrl, apiKey, shape,
          jobId = s"$jobId-$batchId")
        ()
      }
      .start()

  /** Streaming sequence packing — the streaming analogue of
    * [[graft.operators.Packing.sequencePack]]: every arriving document
    * gets a GLOBAL token offset that keeps growing across micro-batches,
    * so training sequences can be cut from an unbounded ingest stream.
    *
    * Within one micro-batch the batch-local offsets come from the same
    * hierarchical prefix sum as the batch operator; the cross-batch base
    * is recovered from the SINK (max(start_token + n_tokens) over what
    * was already written), not from driver memory — a restart re-reads
    * the high-water mark, and the per-batchId overwrite directories make
    * re-delivered batches idempotent, so offsets stay contiguous and
    * duplicate-free under crash/replay (the `start` sink's exactly-once
    * recipe applied to a stateful quantity).
    *
    * One-task-per-batch bound: only the high-water-mark read touches
    * prior output, and it reads the tiny per-batch ledger column, not
    * the corpus. */
  def packStream(docs: DataFrame, outDir: String, checkpointDir: String,
                 seqLen: Int, idCol: String = "doc_id",
                 textCol: String = "text"): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // high-water mark from already-committed batches (restart-safe:
        // derived from the sink, never from driver state). Offsets are
        // monotone across batches, so the mark lives in the HIGHEST
        // prior batch directory — read only that one, keeping the
        // per-batch cost O(one batch), not O(stream history)
        val base: Long = {
          val dir = new org.apache.hadoop.fs.Path(outDir)
          val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val priorIds =
            if (!fs.exists(dir)) Seq.empty[Long]
            else fs.listStatus(dir).toSeq.map(_.getPath.getName)
              // strict match: a stray batch=5.bak entry would NumberFormat-crash
              // every future trigger otherwise
              .filter(_.matches("batch=\\d+"))
              .map(_.stripPrefix("batch=").toLong)
              .filter(_ < batchId)
          // walk DOWN from the highest prior dir until one has rows: an
          // EMPTY micro-batch (e.g. a zero-row file) leaves a rowless
          // dir whose max is null — the mark then lives one dir earlier
          // (almost always the first read; all-empty history → 0)
          priorIds.sorted(Ordering[Long].reverse).iterator.map { id =>
            spark.read.parquet(s"$outDir/batch=$id")
              .agg(max(col("start_token") + col("n_tokens"))).head()
          }.collectFirst { case r if !r.isNullAt(0) => r.getLong(0) }
            .getOrElse(0L)
        }
        val packed = graft.operators.Packing
          .sequencePack(batch.toDF(), idCol, textCol, seqLen,
            persistToks = false)
          .withColumn("start_token", col("start_token") + base)
          .select(col("doc_id"), col("n_tokens"), col("start_token"),
            expr(s"start_token div $seqLen").as("seq_id"),
            (col("start_token") % seqLen).as("seq_offset"),
            lit(batchId).as("batch_id"))
        packed.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()

  /** Watermarked tumbling-window aggregation over an event stream —
    * late data beyond the watermark is dropped, bounding state. */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream interval join: purchases matched to the same user's
    * views within the preceding `windowExpr` — both sides watermarked so
    * the join state is bounded (unwatermarked stream-stream joins grow
    * state forever). */
  def purchaseViewJoin(purchases: DataFrame, views: DataFrame,
                       watermark: String = "2 hours",
                       windowExpr: String = "INTERVAL 1 HOUR"): DataFrame = {
    val p = purchases.withWatermark("ts", watermark).alias("p")
    val v = views.withWatermark("view_ts", watermark).alias("v")
    p.join(v, expr(
      s"p.user_id = v.user_id AND v.view_ts BETWEEN p.ts - $windowExpr AND p.ts"))
      .select(col("p.user_id").as("user_id"), col("p.event_id").as("purchase_id"),
        col("v.view_id"), col("p.ts"), col("v.view_ts"))
  }

  /** [[purchaseViewJoin]] with LEFT OUTER semantics: every purchase
    * emits, matched views attached, null view columns otherwise. The
    * null-side emission is WATERMARK-DRIVEN — an unmatched purchase's
    * row leaves the join state only once both sides' watermark passes
    * the last instant a matching view could still arrive (`p.ts`, the
    * interval's upper bound). In a bounded replay the watermark stops
    * `watermark` short of the max event time, so the stream tail's
    * unmatched purchases would be withheld forever; the caller must
    * advance the watermark past every real event with a
    * punctuation/heartbeat row on EACH side (standard practice for
    * draining outer-join state in bounded replays — see s16) to read
    * the complete, batch-equal result. */
  def purchaseViewLeftJoin(purchases: DataFrame, views: DataFrame,
                           watermark: String = "2 hours",
                           windowExpr: String = "INTERVAL 1 HOUR"): DataFrame = {
    val p = purchases.withWatermark("ts", watermark).alias("p")
    val v = views.withWatermark("view_ts", watermark).alias("v")
    p.join(v, expr(
      s"p.user_id = v.user_id AND v.view_ts BETWEEN p.ts - $windowExpr AND p.ts"),
      "left_outer")
      .select(col("p.user_id").as("user_id"), col("p.event_id").as("purchase_id"),
        col("v.view_id"), col("p.ts"), col("v.view_ts"))
  }

  /** Streaming exact dedup: drop re-ingested duplicate documents by
    * content hash across micro-batches. With a watermark column the
    * state is bounded ([[Dataset.dropDuplicatesWithinWatermark]]);
    * without one it grows with the distinct-key count — acceptable for
    * digest keys (32 bytes/doc). */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("text_hash", sha2(col("text"), 256))
      .dropDuplicates("text_hash")

  /** Static eval-suite n-gram hashes for [[curateStream]]: collected
    * once on the driver (an eval suite is bounded — thousands of items,
    * not a corpus) and shipped to every task as a literal array. */
  def benchNgramHashes(bench: DataFrame, textCol: String, n: Int): Seq[Long] =
    bench.select(explode(graft.operators.Dedup.hashedNgrams(textCol, n)).as("h"))
      .distinct().collect().map(_.getLong(0)).toSeq

  /** Streaming curation: quality-gate incoming documents and drop any
    * that quote the (static) benchmark set — decontamination applied at
    * ingest time. The eval-side n-grams are a broadcast literal and the
    * check is pure Catalyst (`arrays_overlap` on xxhash64 n-gram keys,
    * the SAME hashing as the batch [[graft.operators.Dedup.contaminationPairs]]),
    * so the stream stays stateless: no streaming-join restrictions, no
    * state store, works in append mode. */
  def curateStream(docs: DataFrame, benchHashes: Seq[Long], n: Int = 8,
                   minQuality: Double = 0.0): DataFrame =
    docs
      .filter(graft.operators.TextAnalysis.qualityScore(col("text")) >= minQuality)
      .withColumn("__ng", graft.operators.Dedup.hashedNgrams("text", n))
      .filter(!arrays_overlap(col("__ng"), typedLit(benchHashes)))
      .drop("__ng")

  /** Streaming NEAR-dedup: drop documents whose full MinHash signature
    * equals an earlier document's — exact duplicates always collide,
    * and near-copies collide when every one of the `numHashes` lanes
    * agrees (P = jaccard^numHashes, so 16 lanes ≈ only >0.95-similar
    * near-copies). This is the streaming-safe point on the dedup
    * spectrum: state is one 8-byte key per distinct signature (the
    * xxhash64 of the lane array), no pair joins, no candidate buckets —
    * the full LSH pass stays a batch job over the landed corpus, this
    * gate just keeps the stream from re-landing what it already saw.
    * Shorter-than-`n`-words documents pass through (their signature is
    * the all-sentinel array, which would otherwise collide them all). */
  def nearDedupStream(docs: DataFrame, n: Int = 3, numHashes: Int = 16): DataFrame =
    docs
      .withColumn("__sig_key",
        when(size(split(col("text"), " ")) < n, xxhash64(col("text")))
          .otherwise(xxhash64(graft.functions.GraftFunctions.minhashWords(
            split(col("text"), " "), numHashes, n))))
      .dropDuplicates("__sig_key")
      .drop("__sig_key")

  /** [[curateStream]] with the eval set as a Bloom bitset instead of a
    * literal hash array: probe cost is O(numHashes) per n-gram
    * regardless of eval-suite size, and the plan carries a fixed ~1 MiB
    * constant instead of an ever-growing literal. Error is one-sided —
    * a false positive drops a clean document (conservative for
    * decontamination), a contaminated one is never kept. Still
    * stateless: append mode, no state store. */
  def curateStreamBloom(docs: DataFrame, bits: Array[Long], n: Int = 8,
                        minQuality: Double = 0.0,
                        numHashes: Int = graft.operators.Bloom.DefaultNumHashes): DataFrame =
    docs
      .filter(graft.operators.TextAnalysis.qualityScore(col("text")) >= minQuality)
      .filter(graft.operators.Bloom.ngramHitCount("text", n, bits, numHashes) === 0)

  /** Per-user session state for [[sessionize]]: the session id IS the
    * first-event timestamp — unique per session without a counter, so
    * expired state can be REMOVED outright (a counter would need
    * immortal per-user state to avoid id collisions after idling, which
    * grows without bound on high-cardinality keys). */
  final case class SessionState(sessionStartTs: Long, lastTs: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long)

  /** Stateful sessionization with flatMapGroupsWithState: custom per-key
    * state (gap-based sessions, ids = session start timestamps),
    * processing-time timeout fully expiring idle users — the
    * KeyValueGroupedDataset custom-state surface with bounded state.
    *
    * Every session CLOSED while folding a batch is emitted (a key can
    * close several sessions in one micro-batch — mapGroupsWithState's
    * one-row-per-key contract would silently drop all but the last),
    * plus a snapshot of the still-open session; the open session is
    * re-emitted with updated counts in later batches and finally on
    * timeout, so downstream consumers keep the max-n_events row per
    * (user_id, session_id).
    *
    * `expireIdle=false` swaps the timeout to NoTimeout for BOUNDED
    * replays (the s03 oracle row): with processing-time timers armed,
    * the micro-batch engine keeps constructing no-data batches to
    * service them, so a Trigger.AvailableNow run never settles —
    * and in a single bounded replay idle-state expiry can change
    * nothing anyway (every session is already emitted as a
    * closed row or an open-session snapshot while folding). */
  /** Stateful greedy event throttling — q44's anchored rate limit as
    * streaming state: one (user, type) keeps only its last KEPT
    * timestamp as state (8 bytes per live key), each micro-batch's
    * events sort in memory and pass the greedy gate against the
    * carried anchor. The sort buffer is per key PER MICRO-BATCH — the
    * state engine hands groups as unsorted iterators, so ordering a
    * greedy chain needs the batch's rows in hand; the bound is the
    * trigger size (maxFilesPerTrigger / maxOffsetsPerTrigger), which
    * is how a hot key stays an operator knob rather than an OOM (the
    * unbounded-history case is the BATCH operator's job, and
    * q44EventThrottle handles it with a spilling secondary sort). Under a single bounded
    * replay this equals the batch operator exactly (the s-series
    * unified-semantics contract), and across micro-batches it matches
    * batch AS LONG AS delivery is event-time ordered between batches
    * (the StreamingSpec scenario). A LATE event older than the carried
    * anchor is suppressed — which still upholds the rate-limit
    * guarantee (all kept events ≥ 1 h apart) but can differ from the
    * batch greedy replayed over the reordered history; an exact-replay
    * requirement under lateness needs a watermark + event buffer, not
    * an 8-byte anchor. Input: (user_id, event_type, ts_seconds,
    * event_id). */
  def throttleStream(events: Dataset[(Long, String, Long, Long)])
  : Dataset[(Long, String, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[Long]) =>
          var anchor = state.getOption.getOrElse(Long.MinValue)
          val kept = rows.toIndexedSeq.sortBy(r => (r._3, r._4)).filter { r =>
            if (anchor == Long.MinValue || r._3 >= anchor + 3600L) {
              anchor = r._3; true
            } else false
          }
          state.update(anchor)
          kept.iterator
      }
  }

  /** s24: streaming market-basket pair miner — q50's co-occurrence
    * input built incrementally at ingest: state per basket (order) is
    * the distinct-part set seen so far (bounded by basket width, the
    * per-key-bounded posture), and each NEW part emits one
    * `(ok, pk, −1)` membership row plus one `(ok, min, max)` row per
    * part already in the basket. Every unordered pair is emitted
    * EXACTLY ONCE — when its later member arrives — so the emitted
    * multiset equals the batch per-order pair fan-out regardless of
    * how micro-batches split a basket (StreamingSpec drives the
    * split-basket case); the downstream support/lift aggregation is a
    * plain count monoid over these rows. Within a batch the rows sort
    * by part id, so emission order is deterministic too. */
  def basketPairStream(lines: Dataset[(Long, Long)])
  : Dataset[(Long, Long, Long)] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (ok: Long, rows: Iterator[(Long, Long)], state: GroupState[Seq[Long]]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          var parts = state.getOption.getOrElse(Seq.empty[Long])
          rows.map(_._2).toSeq.sorted.foreach { pk =>
            if (!parts.contains(pk)) {
              out += ((ok, pk, -1L))
              parts.foreach { q =>
                out += ((ok, math.min(pk, q), math.max(pk, q)))
              }
              parts = parts :+ pk
            }
          }
          state.update(parts)
          out.iterator
      }
  }

  /** s21: streaming event-transition monitor — q47's Markov readout at
    * ingest time. State per user is ONE (last_type, last_ts, last_id)
    * triple however long the stream runs (the [[throttleStream]]
    * bounded-state posture); each arriving event emits a (from, to)
    * edge against the stored last event and replaces it, so the edge
    * MULTISET equals the batch `lead()` pairs whatever the micro-batch
    * boundaries — transition counting is prefix-decomposable given
    * in-order per-user delivery (the honest s13 contract: within a
    * batch the group sorts by (ts, event_id); across batches the file
    * source must not split a user's history out of time order, which
    * a single AvailableNow replay and any ts-ordered feed satisfy).
    * The contract is ENFORCED, not just commented: an arrival at or
    * before the stored (last_ts, last_id) is a replay that would emit
    * edges batch lead() never produces — it is DROPPED and counted in
    * the `graft.s21.late_arrivals_dropped` accumulator (zero on every
    * contract-satisfying feed), so a disordered replay degrades
    * loudly-observably instead of silently diverging. */
  def transitionStream(events: Dataset[(Long, String, Long, Long)])
  : Dataset[(String, String)] = {
    val spark = events.sparkSession
    import spark.implicits._
    val late = spark.sparkContext
      .longAccumulator("graft.s21.late_arrivals_dropped")
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[(String, Long, Long)]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          var last = state.getOption.orNull
          rows.toIndexedSeq.sortBy(r => (r._3, r._4)).foreach { r =>
            if (last != null &&
                (r._3 < last._2 || (r._3 == last._2 && r._4 <= last._3))) {
              late.add(1L) // older than (or equal to) state: out-of-order
            } else {
              if (last != null) out += ((last._1, r._2))
              last = (r._2, r._3, r._4)
            }
          }
          if (last != null) state.update(last)
          out.iterator
      }
  }

  /** s25: streaming time-weighted-average monitor — q51's
    * irregular-sample integral maintained at ingest. State per
    * (user, type) is ONE (last_ts_us, last_v6) pair however long the
    * stream runs; each arriving reading closes the interval the
    * stored reading was holding open (q51's lead() semantics: a value
    * holds until the next one) and emits (dur_us, held v6), then
    * replaces the state. The emitted interval MULTISET equals the
    * batch lead() pairs whatever the micro-batch boundaries —
    * interval emission is prefix-decomposable under the s21 in-order
    * per-key delivery contract (within a batch the group sorts by
    * (ts, event_id); across batches a single AvailableNow replay of a
    * ts-ordered feed qualifies). As in [[transitionStream]], the
    * contract is enforced: a reading STRICTLY older than the stored
    * last_ts would close a negative-duration interval lead() never
    * produces — dropped and counted in
    * `graft.s25.late_arrivals_dropped`. Input: (user, type, ts_us,
    * event_id, v6). Output: (user, type, dur_us, v6) per closed
    * interval. */
  def twaStream(readings: Dataset[(Long, String, Long, Long, Long)])
  : Dataset[(Long, String, Long, Long)] = {
    val spark = readings.sparkSession
    import spark.implicits._
    val late = spark.sparkContext
      .longAccumulator("graft.s25.late_arrivals_dropped")
    readings
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[(Long, String, Long, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, String, Long, Long)]
          var last = state.getOption.orNull
          rows.toIndexedSeq.sortBy(r => (r._3, r._4)).foreach { r =>
            if (last != null && r._3 < last._1) {
              late.add(1L) // strictly older than state: out-of-order
            } else {
              if (last != null) out += ((key._1, key._2, r._3 - last._1, last._2))
              last = (r._3, r._5)
            }
          }
          if (last != null) state.update(last)
          out.iterator
      }
  }

  def sessionize(events: Dataset[(Long, Long)], gapSeconds: Long = 1800L,
                 expireIdle: Boolean = true): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeout = if (expireIdle) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle user: emit the final snapshot ONCE and drop the state
            // entirely — timestamp-derived ids cannot collide with a
            // later session, so nothing needs to survive
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(userId, st.sessionStartTs, st.nEvents))
          } else {
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, Long.MinValue, 0L))
            rows.toSeq.sortBy(_._2).foreach { case (_, ts) =>
              st =
                if (st.lastTs != Long.MinValue && ts - st.lastTs <= gapSeconds)
                  st.copy(lastTs = ts, nEvents = st.nEvents + 1)
                else {
                  if (st.lastTs != Long.MinValue)
                    closed += SessionOut(userId, st.sessionStartTs, st.nEvents)
                  SessionState(ts, ts, 1L)
                }
            }
            state.update(st)
            if (expireIdle) state.setTimeoutDuration("1 hour")
            (closed :+ SessionOut(userId, st.sessionStartTs, st.nEvents)).iterator
          }
      }
  }
}
