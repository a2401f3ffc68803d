package graft.core

/** Pipeline configuration surface — the typed form of the reference's
  * request/metadata objects (SURVEY §2.3 T10, §1.1).
  */

/** EmbeddingsMetadata (reference src/models/embeddings_metadata.py:7-15;
  * server defaults 512/256 at :42-43). */
final case class EmbeddingsConfig(
    embeddingsType: String = "OPEN_AI",
    chunkSize: Int = 512,
    chunkOverlap: Int = 256,
    chunkStrategy: ChunkStrategy = ChunkStrategy.Exact,
    model: String = "text-embedding-ada-002",
    // HUGGING_FACE leg (r10): the field the reference's validator
    // message reserves (validators.py:22) — required when
    // embeddingsType is HUGGING_FACE, ignored otherwise
    huggingFaceModelName: Option[String] = None)

/** VectorDBMetadata (reference src/models/vector_db_metadata.py:6-13). */
final case class VectorDbConfig(
    vectorDbType: String,
    indexName: String,
    environment: String = "",
    collection: String = "")

/** VectorflowRequest (reference src/shared/vectorflow_request.py:4-49):
  * one ingestion job's full configuration. */
final case class IngestRequest(
    embeddings: EmbeddingsConfig = EmbeddingsConfig(),
    vectorDb: Option[VectorDbConfig] = None,
    vectorDbKey: Option[String] = None,
    linesPerBatch: Int = 1000,
    webhookUrl: Option[String] = None,
    webhookKey: Option[String] = None,
    documentId: Option[String] = None,
    chunkValidationUrl: Option[String] = None)

/** Request validation (reference src/api/validators.py:7-51): the same
  * check set, returning the first failed validation like the reference's
  * dispatch. */
object RequestValidator {
  sealed trait Validation { def error: String; def status: Int }
  case object Metadata extends Validation { val error = "Missing required fields"; val status = 400 }
  case object EmbeddingType extends Validation {
    // the reference's reserved message (validators.py:22): its check
    // `embeddings_type in [OPEN_AI]` pairs with exactly this error —
    // the HUGGING_FACE leg was designed to pass once the model name is
    // present, which this library implements (Routing.embedderFor)
    val error = "Hugging face embeddings models require a " +
      "\"hugging_face_model_name\" in the \"embeddings_metadata\""
    val status = 400
  }
  case object Webhook extends Validation {
    val error = "Webhook URL provided but no webhook key"; val status = 400
  }

  /** First failed validation, or None when the request is well-formed
    * (reference validate(): first falsy entry wins). */
  def validate(r: IngestRequest, localVectorDb: Boolean = false): Option[Validation] = {
    val checks: Seq[(Validation, Boolean)] = Seq(
      Metadata -> (r.vectorDb.isEmpty || r.vectorDbKey.nonEmpty || localVectorDb),
      // OPEN_AI always passes (validators.py:39, worker.py:52-73);
      // HUGGING_FACE passes with its model name — the leg the
      // reference reserved (r10, see EmbeddingType.error)
      EmbeddingType -> (r.embeddings.embeddingsType == "OPEN_AI" ||
        (r.embeddings.embeddingsType == "HUGGING_FACE" &&
          r.embeddings.huggingFaceModelName.exists(_.nonEmpty))),
      Webhook -> (r.webhookUrl.isEmpty || r.webhookKey.nonEmpty))
    checks.collectFirst { case (v, ok) if !ok => v }
  }
}
