package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def collectPack(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("offsets are the exact running token sum in id order") {
    // 3 + 5 + 2 + 4 tokens; seqLen 8 puts doc 30 in sequence 1
    val docs = Seq(
      (10L, "a b c"),
      (20L, "d e f g h"),
      (30L, "i j"),
      (40L, "k l m n")).toDF("doc_id", "text")
    val got = collectPack(Packing.sequencePack(docs, "doc_id", "text", seqLen = 8))
    assert(got(10L) === ((3L, 0L, 0L, 0L)))
    assert(got(20L) === ((5L, 3L, 0L, 3L)))
    assert(got(30L) === ((2L, 8L, 1L, 0L)))
    assert(got(40L) === ((4L, 10L, 1L, 2L)))
  }

  test("hierarchical sum is independent of the bucket width") {
    val docs = (0L until 300L).map(i => (i * 7, ("w " * (1 + (i % 13).toInt)).trim))
      .toDF("doc_id", "text")
    val fine = collectPack(Packing.sequencePack(docs, "doc_id", "text", 2048, bucketWidth = 16))
    val coarse = collectPack(Packing.sequencePack(docs, "doc_id", "text", 2048, bucketWidth = 100000))
    assert(fine === coarse)
  }

  test("null text counts zero tokens; null ids are excluded (r2 review)") {
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "a b"),
      (java.lang.Long.valueOf(2L), null),
      (null.asInstanceOf[java.lang.Long], "x y z"),
      (java.lang.Long.valueOf(3L), "c")).toDF("doc_id", "text")
    val got = collectPack(Packing.sequencePack(docs, "doc_id", "text", seqLen = 4))
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(2L) === ((0L, 2L, 0L, 2L))) // null text = 0 tokens
    assert(got(3L)._2 === 2L)              // offsets unshifted past it
  }

  test("sparse non-contiguous ids pack without gaps in the token stream") {
    val docs = Seq((5L, "a b"), (5000L, "c"), (5000000L, "d e f"))
      .toDF("doc_id", "text")
    val got = collectPack(Packing.sequencePack(docs, "doc_id", "text", seqLen = 4))
    assert(got(5L)._2 === 0L)
    assert(got(5000L)._2 === 2L)
    assert(got(5000000L)._2 === 3L)
  }
}
