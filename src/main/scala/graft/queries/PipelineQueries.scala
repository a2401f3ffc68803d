package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.core.ChunkStrategy
import graft.operators.Chunking

/** Reference-pipeline operators as oracle-checkable queries over the
  * `documents` table: split_file blocks (P1/P2), char chunking (T3),
  * token chunking (T2, rows-only: BPE is not SQL-expressible), intake
  * filters (F1-F3), and the job/batch status ledger (A1/A4).
  */
object PipelineQueries {

  /** P1 `split_file`: fixed blocks of 10 "lines" (words — the testdata
    * documents are single-line). Block text loses separators, replicating
    * the reference's newline-loss quirk. */
  def splitBlocks(spark: SparkSession, dir: String): DataFrame =
    Chunking.splitBlocks(documents(spark, dir), perBlock = 10)
      .orderBy(col("doc_id"), col("block_id"))

  /** T3 EXACT_BY_CHARACTERS on the pure-Catalyst path: 256-char windows,
    * 128 overlap. */
  def chunkExactChars(spark: SparkSession, dir: String): DataFrame =
    Chunking.chunkExactByChars(documents(spark, dir), size = 256, overlap = 128)
      .withColumn("chunk_start", col("chunk_start").cast("long"))
      .orderBy(col("doc_id"), col("chunk_start"))

  /** T2 EXACT token windows via the chunker UDF (rows-only check: token
    * windows have no DuckDB equivalent). Includes the UUIDv5 chunk id. */
  def chunkExactTokens(spark: SparkSession, dir: String): DataFrame =
    Chunking.chunkDocuments(documents(spark, dir), ChunkStrategy.Exact,
        size = 32, overlap = 8)
      .orderBy(col("doc_id"), col("chunk_seq"))

  /** T6 SENTENCE strategy over '.'-delimited text (rows-only). */
  def chunkSentences(spark: SparkSession, dir: String): DataFrame =
    Chunking.chunkDocuments(documents(spark, dir), ChunkStrategy.Sentence,
        size = 24, overlap = 4)
      .orderBy(col("doc_id"), col("chunk_seq"))

  /** F1-F3 intake filters: size window + language predicate, projected
    * and deterministically ordered (the valid-file scan). */
  def docFilter(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .filter(col("n_chars").between(100, 500) && col("lang") =!= "zh")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** A1 `update_job_with_batch` ledger semantics: jobs = sources, batches
    * = documents; a batch deterministically "fails" when doc_id % 37 == 0.
    * COMPLETED when all succeed, FAILED when none do, else
    * PARTIALLY_COMPLETED (reference job_service.py:32-51). */
  def jobLedger(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("ok", when(col("doc_id") % 37 =!= 0, 1L).otherwise(0L))
      .groupBy(col("source").as("job_id"))
      .agg(
        count(lit(1)).as("total_batches"),
        sum(col("ok")).as("batches_succeeded"))
      .withColumn("job_status",
        when(col("batches_succeeded") === col("total_batches"), "COMPLETED")
          .when(col("batches_succeeded") > 0, "PARTIALLY_COMPLETED")
          .otherwise("FAILED"))
      .orderBy(col("job_id"))

  /** A4 status lookup: the multi-job `POST /jobs/status` projection
    * (filter + 2-column project on the ledger). */
  def jobStatusLookup(spark: SparkSession, dir: String): DataFrame =
    jobLedger(spark, dir)
      .filter(col("job_id").isin("src1", "src3", "src5"))
      .select(col("job_id"), col("job_status"))
      .orderBy(col("job_id"))

  /** The full ingestion pipeline (§3.1): chunk → deterministic local
    * embed → vector records (rows-only: hash embeddings have no SQL
    * equivalent; determinism is asserted by EmbedPipelineSpec). The raw
    * vector is projected to (dim, xxhash64) — the driver's row-sorter
    * cannot hash array cells, and the hash pins the full contents. */
  def embedPipeline(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.EmbedPipeline.run(documents(spark, dir))
      .toDF()
      .select(col("id"), col("source_document"),
        size(col("vector")).as("n_dim"),
        xxhash64(to_json(col("vector"))).as("vector_hash"))
      .orderBy(col("id"))

  /** p09: multimodal pipeline over synthetic payloads derived from the
    * documents table — binary header encode → mapPartitions decode stub →
    * resize plan → feature records (rows-only; MultimodalSpec pins the
    * decode semantics). */
  def mediaPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .map { r =>
        val text = r.getString(1)
        val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val b = java.nio.ByteBuffer.allocate(10 + body.length)
        val w = 64 + (r.getLong(0) % 1024).toInt
        b.putShort(w.toShort).putShort((w / 2).toShort).putShort(3.toShort)
          .putInt(body.length)
        b.put(body)
        Multimodal.MediaRow(r.getLong(0), "image", b.array())
      }
    Multimodal.resizePlan(Multimodal.decodeImages(media), maxSide = 256)
      .select(col("media_id"), col("width"), col("height"),
        col("out_width"), col("out_height"))
      .orderBy(col("media_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p08_embed_pipeline"    -> embedPipeline _,
    "p09_media_pipeline"    -> mediaPipeline _,
    "p01_split_blocks"      -> splitBlocks _,
    "p02_chunk_exact_chars" -> chunkExactChars _,
    "p03_chunk_exact_tokens"-> chunkExactTokens _,
    "p04_chunk_sentences"   -> chunkSentences _,
    "p05_doc_filter"        -> docFilter _,
    "p06_job_ledger"        -> jobLedger _,
    "p07_job_status_lookup" -> jobStatusLookup _)

  val oracles: Map[String, String] = Map(
    "p01_split_blocks" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |b AS (SELECT doc_id, words,
        |      unnest(generate_series(0, CAST(ceil(len(words)/10.0) AS BIGINT) - 1)) AS i
        |      FROM w)
        |SELECT doc_id, i AS block_id,
        |array_to_string(words[i*10+1 : i*10+10], '') AS block_text,
        |CAST(len(words[i*10+1 : i*10+10]) AS BIGINT) AS n_words
        |FROM b ORDER BY doc_id, block_id""".stripMargin,
    "p02_chunk_exact_chars" ->
      """WITH starts AS (SELECT doc_id, text,
        |      unnest(generate_series(0, length(text) - 1, 128)) AS s
        |      FROM documents)
        |SELECT doc_id, s AS chunk_start,
        |substring(text, CAST(s + 1 AS INT), 256) AS chunk_text
        |FROM starts ORDER BY doc_id, chunk_start""".stripMargin,
    "p05_doc_filter" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE n_chars BETWEEN 100 AND 500 AND lang <> 'zh'
        |ORDER BY doc_id""".stripMargin,
    "p06_job_ledger" ->
      """SELECT source AS job_id, count(*) AS total_batches,
        |CAST(sum(CASE WHEN doc_id % 37 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS batches_succeeded,
        |CASE WHEN sum(CASE WHEN doc_id % 37 <> 0 THEN 1 ELSE 0 END) = count(*) THEN 'COMPLETED'
        |     WHEN sum(CASE WHEN doc_id % 37 <> 0 THEN 1 ELSE 0 END) > 0 THEN 'PARTIALLY_COMPLETED'
        |     ELSE 'FAILED' END AS job_status
        |FROM documents GROUP BY source ORDER BY job_id""".stripMargin,
    "p07_job_status_lookup" ->
      """SELECT source AS job_id,
        |CASE WHEN sum(CASE WHEN doc_id % 37 <> 0 THEN 1 ELSE 0 END) = count(*) THEN 'COMPLETED'
        |     WHEN sum(CASE WHEN doc_id % 37 <> 0 THEN 1 ELSE 0 END) > 0 THEN 'PARTIALLY_COMPLETED'
        |     ELSE 'FAILED' END AS job_status
        |FROM documents WHERE source IN ('src1','src3','src5')
        |GROUP BY source ORDER BY job_id""".stripMargin)
}
