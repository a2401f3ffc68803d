package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-6 loud-failure guards: corrupt inputs and misuse
  * must fail with a NAMED error, not an opaque NPE/CCE deep in a task
  * (the wrong-length-vector convention, extended per ADVICE r5). */
class AdviceGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2, 2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("gramMatrix: a null vector ELEMENT fails loudly, naming the index") {
    import spark.implicits._
    val bad = Seq(Seq[java.lang.Double](1.0, null, 3.0))
      .toDF("embedding")
    val e = intercept[Exception] {
      LinAlg.gramMatrix(bad, "embedding", dim = 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("null element at index 1")))
  }

  test("unicode_norm: non-literal form argument is a clean analysis error") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("abc", "NFC")).toDF("t", "f").createOrReplaceTempView("un_t")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT unicode_norm(t, f) FROM un_t").collect()
    }
    assert(e.getMessage.contains("foldable STRING literal"))
    // the supported literal form still works
    val ok = spark.sql("SELECT unicode_norm(t, 'NFC') FROM un_t").collect()
    assert(ok.head.getString(0) === "abc")
  }

  test("minhash_signature: non-literal k argument is a clean analysis error") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("abc", 4)).toDF("t", "k").createOrReplaceTempView("mh_t")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_signature(t, k) FROM mh_t").collect()
    }
    assert(e.getMessage.contains("foldable non-null INT literal"))
    // CAST(NULL AS INT) is foldable AND correctly typed — without the
    // null check it would silently unbox to k = 0
    val n = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_signature(t, CAST(NULL AS INT)) FROM mh_t")
        .collect()
    }
    assert(n.getMessage.contains("foldable non-null INT literal"))
  }
}
