package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persist / restore trained ANN index models as parquet — the
  * production half of the train-once-serve-many contract
  * ([[graft.queries.ModelCache]] covers one JVM; a real deployment
  * trains on one cluster, writes the model next to the corpus, and
  * every serving job loads it — the reference's vector-DB ecosystem
  * does exactly this with its index snapshots).
  *
  * Layout (all sizes are model-sized — coarseK + m·k rows — never
  * corpus-sized):
  *   `<path>/params`     one row: (sub_dim, m, k, scale)
  *   `<path>/centroids`  (list_id, vec: array<long>) — coarse centroids
  *   `<path>/codebooks`  (sub, code, vec: array<long>) — PQ codebooks
  *
  * Everything stored is the model's INTEGER-QUANTIZED form
  * ([[ProductQuantizer.IvfPqModel]] carries centsQ/booksQ as longs), so
  * the round-trip is bit-exact by construction — a reloaded model
  * serves searches identical to the trainer's own (IndexStoreSpec pins
  * result equality, not just field equality). */
object IndexStore {

  def saveIvfPq(spark: SparkSession, model: ProductQuantizer.IvfPqModel,
                path: String): Unit = {
    import spark.implicits._
    Seq((model.subDim, model.m, model.k, model.scale))
      .toDF("sub_dim", "m", "k", "scale")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
    model.centsQ.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("list_id", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    (for {
      (book, sub) <- model.booksQ.zipWithIndex
      (v, code) <- book.zipWithIndex
    } yield (sub, code, v.toSeq)).toSeq
      .toDF("sub", "code", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  def loadIvfPq(spark: SparkSession, path: String)
      : ProductQuantizer.IvfPqModel = {
    val p = spark.read.parquet(s"$path/params").collect()
    require(p.length == 1, s"expected one params row, got ${p.length}")
    val (subDim, m, k, scale) =
      (p(0).getAs[Int]("sub_dim"), p(0).getAs[Int]("m"),
        p(0).getAs[Int]("k"), p(0).getAs[Long]("scale"))
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy(col("list_id")).collect()
      .map(r => r.getAs[Int]("list_id") -> r.getSeq[Long](r.fieldIndex("vec")).toArray)
    require(cents.map(_._1).sameElements(cents.indices),
      "centroid list_ids must be dense 0..n-1")
    val bookRows = spark.read.parquet(s"$path/codebooks")
      .orderBy(col("sub"), col("code")).collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code"),
        r.getSeq[Long](r.fieldIndex("vec")).toArray))
    val books = Array.tabulate(m) { sub =>
      val rows = bookRows.filter(_._1 == sub)
      require(rows.map(_._2).sameElements(0 until k),
        s"codebook $sub must carry dense codes 0..${k - 1}")
      rows.map(_._3)
    }
    ProductQuantizer.IvfPqModel(cents.map(_._2), books, subDim, m, k, scale)
  }

  /** Convenience: the served-search form — load the model at `path`
    * and run [[ProductQuantizer.searchIvfPqExact]] with it. */
  def serveIvfPq(queries: DataFrame, corpus: DataFrame, idCol: String,
                 vecCol: String, path: String, nprobe: Int,
                 shortlist: Int, topK: Int): DataFrame =
    ProductQuantizer.searchIvfPqExact(queries, corpus, idCol, vecCol,
      loadIvfPq(corpus.sparkSession, path), nprobe, shortlist, topK)
}
