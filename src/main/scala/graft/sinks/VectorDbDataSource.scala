package graft.sinks

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 writer for the vector-DB sinks (SURVEY §4's optional v2
  * step beyond `foreachPartition`): commit-coordinated upserts with
  * driver-side accounting.
  *
  * ```
  * records.toDF().write
  *   .format("graft.sinks.VectorDbDataSource")
  *   .option("url", "http://host:6333").option("apiKey", k)
  *   .option("shape", "QDRANT").option("jobId", job)
  *   .mode("append").save()
  * ```
  *
  * Semantics:
  *  - every task buffers `batchSize` (default 128) rows per POST, the
  *    reference's micro-batch size;
  *  - record ids are uuid5(jobId, partitionId, i) — identical on task
  *    RETRY, so a re-executed task overwrites its own rows (upsert
  *    idempotency is the abort story: aborted tasks need no undo);
  *  - each task's commit message carries (uploaded, failed) counts;
  *    `BatchWrite.commit` aggregates them into
  *    [[VectorDbDataSource.lastCommitStats]] for the driver (the
  *    accounting the reference keeps in its Postgres ledger).
  *
  * Expected input schema: `id string, source_text string,
  * source_document string, vector array<float>` ([[VectorRecord]]).
  */
class VectorDbDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VectorDbDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new VectorDbTable()
}

object VectorDbDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("source_text", StringType),
    StructField("source_document", StringType),
    StructField("vector", ArrayType(FloatType))))

  final case class CommitStats(uploaded: Long, failed: Long, tasks: Int)

  /** Stats of the most recent successful commit on this driver. */
  @volatile var lastCommitStats: Option[CommitStats] = None
}

private[sinks] class VectorDbTable extends Table with SupportsWrite {
  override def name(): String = "graft-vectordb"
  override def schema(): StructType = VectorDbDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val opts = info.options()
    val conf = VdbWriteConf(
      url = require(opts, "url"),
      apiKey = opts.getOrDefault("apiKey", ""),
      shapeName = require(opts, "shape"),
      jobId = opts.getOrDefault("jobId", "job"),
      batchSize = opts.getOrDefault("batchSize", "128").toInt,
      attempts = opts.getOrDefault("attempts", "3").toInt)
    // fail fast on an unknown shape at planning time, not mid-task
    VectorDbSinks.shapeFor(conf.shapeName)
    val schema = info.schema()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new VdbBatchWrite(conf, schema)
      }
    }
  }

  private def require(opts: CaseInsensitiveStringMap, key: String): String = {
    val v = opts.get(key)
    if (v == null) throw new IllegalArgumentException(s"vector-DB writer needs option '$key'")
    v
  }
}

private[sinks] final case class VdbWriteConf(url: String, apiKey: String,
                                             shapeName: String, jobId: String,
                                             batchSize: Int, attempts: Int)
  extends Serializable

private[sinks] final case class VdbCommit(uploaded: Long, failed: Long)
  extends WriterCommitMessage

private[sinks] class VdbBatchWrite(conf: VdbWriteConf, schema: StructType)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new VdbWriterFactory(conf, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val stats = messages.collect { case VdbCommit(u, f) => (u, f) }
    VectorDbDataSource.lastCommitStats = Some(VectorDbDataSource.CommitStats(
      stats.map(_._1).sum, stats.map(_._2).sum, messages.length))
  }

  /** Nothing to undo: uuid5(jobId, partition, i) ids make any rows a
    * failed attempt already shipped harmless — the retry overwrites
    * them (the reference's own idempotency design, README.md:210). */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sinks] class VdbWriterFactory(conf: VdbWriteConf, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new VdbDataWriter(conf, schema, partitionId)
}

private[sinks] class VdbDataWriter(conf: VdbWriteConf, schema: StructType,
                                   partitionId: Int)
    extends DataWriter[InternalRow] {

  private val shape = VectorDbSinks.shapeFor(conf.shapeName)
  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(30)).build()
  private val idxText = schema.fieldIndex("source_text")
  private val idxDoc = schema.fieldIndex("source_document")
  private val idxVec = schema.fieldIndex("vector")
  private val buf = new scala.collection.mutable.ArrayBuffer[graft.pipeline.VectorRecord]()
  private var i = 0
  private var uploaded = 0L
  private var failed = 0L

  override def write(row: InternalRow): Unit = {
    // null-safe: a poison row (null text/doc/vector) must not kill the
    // task — ship empties instead (uuid5 ids stay deterministic)
    val vec = if (row.isNullAt(idxVec)) Array.empty[Float]
              else row.getArray(idxVec).toFloatArray()
    def str(i: Int): String =
      if (row.isNullAt(i)) "" else row.getUTF8String(i).toString
    buf += graft.pipeline.VectorRecord(
      id = "", // id assigned by shape.entry from (jobId, partitionId, i)
      source_text = str(idxText),
      source_document = str(idxDoc),
      vector = vec)
    if (buf.length >= conf.batchSize) flush()
  }

  private def flush(): Unit = {
    if (buf.nonEmpty) {
      val entries = buf.map { r =>
        val e = shape.entry(r, conf.jobId, partitionId.toLong, i); i += 1; e
      }
      val ok = VectorDbSinks.postWithRetry(client, s"${conf.url}${shape.path}",
        shape.authHeader(conf.apiKey), shape.body(entries.toSeq),
        conf.attempts, baseDelayMs = 200L)
      if (ok) uploaded += buf.length else failed += buf.length
      buf.clear()
    }
  }

  override def commit(): WriterCommitMessage = {
    flush()
    // a task whose uploads ALL failed poisons the job: surface it as a
    // task failure so Spark retries (idempotent ids make that safe)
    if (failed > 0 && uploaded == 0)
      throw new java.io.IOException(s"all $failed upserts failed for partition $partitionId")
    VdbCommit(uploaded, failed)
  }

  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}
