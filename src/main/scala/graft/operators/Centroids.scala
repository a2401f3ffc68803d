package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group vector centroids — the k-means/IVF training primitive.
  *
  * Two implementations with identical results:
  *  - [[byGroupBy]]: posexplode → (group, dim) decimal mean → rebuild
  *    array. Pure Catalyst, exact decimal arithmetic (cross-engine
  *    checkable), two shuffles but both on small keys.
  *  - [[VectorMean]]: a typed `Aggregator` (the UDAF surface) folding
  *    double arrays in one pass — one shuffle, mutable buffer, the shape
  *    you use when the group count is huge.
  */
object Centroids {

  /** (group, dim, mean) rebuilt into (group, centroid: array<double>).
    * Means are computed as exact decimal sums / counts, rounded to 9. */
  def byGroupBy(vectors: DataFrame, groupCol: String, vecCol: String): DataFrame =
    vectors
      .select(col(groupCol).as("grp"), posexplode(col(vecCol)))
      .groupBy(col("grp"), col("pos"))
      .agg((sum(col("col").cast(DecimalType(28, 10))).cast("double") / count(lit(1)))
        .as("m"))
      .groupBy(col("grp"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("entries"))
      .select(col("grp"),
        expr("transform(entries, e -> round(e.m, 9))").as("centroid"))

  /** Typed UDAF: mean of float vectors per key. */
  class VectorMean(dim: Int) extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {
    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)
    override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { b._1(i) += a(i).toDouble; i += 1 }
      (b._1, b._2 + 1)
    }
    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
    override def finish(r: (Array[Double], Long)): Array[Double] = {
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) { out(i) = r._1(i) / r._2; i += 1 }
      out
    }
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(Encoders.kryo[Array[Double]], Encoders.scalaLong)
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoderHelper.doubleArray
  }

  /** Aggregator-based centroids over a typed (group, vector) dataset. */
  def byAggregator(vectors: Dataset[(Int, Array[Float])], dim: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.groupByKey(_._1)
      .mapValues(_._2)
      .agg(new VectorMean(dim).toColumn.name("centroid"))
      .toDF("grp", "centroid")
  }
}

private object ExpressionEncoderHelper {
  import org.apache.spark.sql.Encoder
  val doubleArray: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
