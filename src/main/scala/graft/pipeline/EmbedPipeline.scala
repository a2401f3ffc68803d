package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ChunkStrategy, Uuid5}
import graft.operators.Chunking

/** One chunk flowing through the embed stage. */
final case class ChunkRow(doc_id: Long, source: String, chunk_seq: Int,
                          chunk_id: String, chunk_text: String)

/** A chunk with its vector — the standardized sink record
  * (reference README.md:201-210: id, source_data, source_document,
  * embeddings). */
final case class VectorRecord(id: String, source_text: String,
                              source_document: String, vector: Array[Float])

/** The reference pipeline restated as one declarative Spark job
  * (SURVEY.md §3.1): documents → chunk → embed → vector records (+ jobs
  * ledger). Queue hops become stage boundaries; the embed map runs in
  * `mapPartitions` with the reference's batching envelope.
  *
  * Scale posture: chunking is narrow (no shuffle); embedding is narrow;
  * the only shuffle is the optional ledger aggregation. Partition count
  * governs embed-API parallelism — at 1000 executors, repartition the
  * chunk set to ~#executors × cores before embedding.
  */
object EmbedPipeline {

  /** documents(doc_id, text, source) → typed chunk rows. */
  def chunkStage(docs: DataFrame, strategy: ChunkStrategy,
                 size: Int, overlap: Int): Dataset[ChunkRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("source"), posexplode(Chunking.chunkUdf(strategy, size, overlap)))
      .select(
        col("doc_id"), col("source"),
        col("pos").as("chunk_seq"),
        col("col.chunkId").as("chunk_id"),
        col("col.text").as("chunk_text"))
      .as[ChunkRow]
  }

  /** The embed map: groups of ≤ `embedder.maxBatchSize` per call inside
    * each partition (reference E1, worker.py:92-113). Order within the
    * partition is preserved by construction. */
  def embedStage(chunks: Dataset[ChunkRow], embedder: Embedder): Dataset[VectorRecord] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.mapPartitions { it =>
      it.grouped(embedder.maxBatchSize).flatMap { group =>
        val vecs = embedder.embedBatch(group.map(_.chunk_text).toIndexedSeq)
        require(vecs.length == group.length,
          s"embedder returned ${vecs.length} vectors for ${group.length} texts — refusing to zip-drop chunks silently")
        group.iterator.zip(vecs.iterator).map { case (c, v) =>
          // sink id carries document context (like the reference's
          // uuid5(batch_id, job_id, i), vector_uploader.py:59) — chunk_id
          // alone is uuid5(text, pos, label) and collides across
          // documents that share a window
          VectorRecord(Uuid5.ofParts(c.doc_id, c.chunk_seq, c.chunk_text),
            c.chunk_text, c.source, v)
        }
      }
    }
  }

  /** Full ingestion: the `/jobs` lifecycle as one DataFrame program. */
  def run(docs: DataFrame, strategy: ChunkStrategy = ChunkStrategy.ExactByCharacters,
          size: Int = 256, overlap: Int = 128,
          embedder: Embedder = new HashEmbedder(64)): Dataset[VectorRecord] =
    embedStage(chunkStage(docs, strategy, size, overlap), embedder)

  /** A vector record plus its batch outcome: `ok=false` rows carry the
    * failure cause instead of a vector (the reference's FAILED batch,
    * worker.py:327-335). */
  final case class StatusRecord(id: String, source_text: String,
                                source_document: String, vector: Array[Float],
                                ok: Boolean, error: String)

  /** Embed with the reference's partial-failure semantics: an embed-batch
    * failure (after the embedder's own retries) fails THOSE chunks, not
    * the Spark job — failed rows flow to the ledger as batch failures so
    * the job lands on PARTIALLY_COMPLETED / FAILED exactly like
    * update_job_with_batch (job_service.py:32-51). */
  def embedStageWithStatus(chunks: Dataset[ChunkRow], embedder: Embedder): Dataset[StatusRecord] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.mapPartitions { it =>
      it.grouped(embedder.maxBatchSize).flatMap { group =>
        try {
          val vecs = embedder.embedBatch(group.map(_.chunk_text).toIndexedSeq)
          require(vecs.length == group.length,
            s"embedder returned ${vecs.length} vectors for ${group.length} texts")
          group.iterator.zip(vecs.iterator).map { case (c, v) =>
            StatusRecord(Uuid5.ofParts(c.doc_id, c.chunk_seq, c.chunk_text),
              c.chunk_text, c.source, v, ok = true, error = "")
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            group.iterator.map { c =>
              StatusRecord(Uuid5.ofParts(c.doc_id, c.chunk_seq, c.chunk_text),
                c.chunk_text, c.source, Array.empty[Float], ok = false,
                error = String.valueOf(e.getMessage))
            }
        }
      }
    }
  }

  /** A1 ledger over status records: COMPLETED when every batch
    * succeeded, FAILED when none did, else PARTIALLY_COMPLETED. */
  def statusLedger(records: Dataset[StatusRecord]): DataFrame =
    records.toDF()
      .groupBy(col("source_document").as("job_id"))
      .agg(
        count(lit(1)).as("total_chunks"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("chunks_succeeded"))
      .withColumn("job_status",
        when(col("chunks_succeeded") === col("total_chunks"), "COMPLETED")
          .when(col("chunks_succeeded") > 0, "PARTIALLY_COMPLETED")
          .otherwise("FAILED"))

  /** Jobs ledger from the embedded output: per-source batch accounting
    * (A1 semantics — COMPLETED / PARTIALLY_COMPLETED / FAILED). `ok`
    * marks per-chunk success; callers computing partial failures pass the
    * per-partition success flags. */
  def ledger(records: DataFrame): DataFrame =
    records
      .groupBy(col("source_document").as("job_id"))
      .agg(count(lit(1)).as("vectors_written"),
        countDistinct(col("id")).as("distinct_ids"))
      .withColumn("job_status",
        when(col("vectors_written") === col("distinct_ids"), "COMPLETED")
          .otherwise("PARTIALLY_COMPLETED"))

  /** Deterministic record id for re-chunked text: uuid5(source, seq, text)
    * — idempotent under retry, the reference's own upsert-id design. */
  def recordId(source: String, seq: Int, text: String): String =
    Uuid5.ofParts(source, seq, text)
}
