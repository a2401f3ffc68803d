package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Chunkers
import graft.operators.{Dedup, KMeans, Similarity}

/** Regressions for the round-1 code-review findings. */
class ReviewRegressionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("paragraph chunker terminates when floor(bound*size) == 0") {
    // size=1, bound=0.75 -> checkBound would floor to 0 and spin forever
    val chunks = Chunkers.paragraph(Seq("a\n\nb\n\nc"), size = 1, overlap = 0)
    assert(chunks.nonEmpty && chunks.length <= 10)
  }

  test("custom top-k accepts string ids as tiebreak") {
    import spark.implicits._
    val vecs = (0 until 30).map(i => (s"uuid-${"%03d".format(i)}", Array(i.toFloat, 1f)))
      .toDF("id", "v")
    val out = Similarity.bruteForceTopKExec(
      vecs.filter(col("id") === "uuid-000"), vecs, "id", "v", k = 5)
    assert(out.count() == 5)
    // and ties on score resolve to the lexicographically smallest ids
    val tied = (0 until 20).map(i => (s"t-${"%02d".format(i)}", Array(1f, 0f))).toDF("id", "v")
    val picked = Similarity.bruteForceTopKExec(
        tied.filter(col("id") === "t-19"), tied, "id", "v", k = 3)
      .collect().map(_.getString(1)).sorted
    assert(picked.toSeq == Seq("t-00", "t-01", "t-02"))
  }

  test("k-means shrinks k to the row count and rejects zero iterations") {
    import spark.implicits._
    val tiny = (0 until 3).map(i => (i.toLong, Array(i.toFloat, 0f))).toDF("id", "v")
    val (assigned, centroids) = KMeans.fit(tiny, "id", "v", k = 8, iterations = 2)
    assert(centroids.length == 3)
    assert(assigned.count() == 3)
    intercept[IllegalArgumentException](KMeans.fit(tiny, "id", "v", k = 2, iterations = 0))
  }

  test("simhash pairs tolerate null text rows") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, null.asInstanceOf[String]), (3L, "a b c d"))
      .toDF("id", "text")
    val pairs = Dedup.simHashPairs(df, "id", "text", maxDistance = 0).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 3L)))
  }

  test("embedder returning short batches fails loudly instead of dropping chunks") {
    import spark.implicits._
    val lying = new graft.pipeline.Embedder {
      override val dim = 2
      override val maxBatchSize = 8
      override def embedBatch(texts: IndexedSeq[String]): IndexedSeq[Array[Float]] =
        texts.drop(1).map(_ => Array(0f, 1f)) // one short
    }
    val chunks = (0 until 6).map(i =>
      graft.pipeline.ChunkRow(i.toLong, "s", i, s"c$i", s"t$i")).toDS().coalesce(1)
    val e = intercept[Exception](
      graft.pipeline.EmbedPipeline.embedStage(chunks, lying).collect())
    assert(e.getMessage != null)
  }
}
