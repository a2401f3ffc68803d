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

  /** Simplified silhouette (a34) — the cluster-quality readout
    * (Hruschka et al.'s centroid variant of Rousseeuw 1987: b−a over
    * max(a,b) with a = squared distance to OWN centroid, b = squared
    * distance to the NEAREST OTHER centroid; O(n·k) instead of the
    * O(n²) pairwise original), engine-exact end to end:
    *
    *  - vectors quantize to 2²⁰ fixed point, SHIFTED nonnegative
    *    (+2²¹, covering components in [−2, 2] — embeddings here are
    *    sub-unit; a component beyond ±2 would quantize negative and
    *    reintroduce the divergence, so that precondition is part of
    *    this operator's contract) so every later floor division has
    *    nonnegative operands — the a27 lesson (negative-operand
    *    integral division is an engine boundary); squared distances
    *    are shift-invariant.
    *  - centroids are the FLOOR-DIVIDED integer means (sd div n), a
    *    deterministic ≤1-unit quantization both engines replay — this
    *    is what makes cross-label distance comparison plain integer
    *    ordering instead of cross-multiplied rationals.
    *  - s_ppm carries an explicit sign around a nonnegative ppm floor
    *    division; a vector sitting exactly on both centroids reads
    *    null.
    *
    * Scale posture: one posexplode aggregate for the k·d centroid
    * table (broadcast), a k-way scan-local fan-out for distances, and
    * a per-vector argmin window over k−1 rows — corpus never
    * self-joins. Output: (vec_id, label, nearest_other, s_ppm). */
  def simplifiedSilhouette(vectors: DataFrame, idCol: String,
                           groupCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val S = 1L << 20
    val Off = 1L << 21 // shift covers components in [−2, 2]
    val q = vectors.select(col(idCol).as("vec_id"), col(groupCol).as("label"),
      expr(s"transform($vecCol, x -> cast(round(cast(x as double) * $S, 0) as bigint) + $Off)")
        .as("qv"))
    val n = q.groupBy(col("label")).agg(count(lit(1)).as("n"))
    val cq = q.select(col("label"), posexplode(col("qv")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("col")).as("sd"))
      .join(n, "label")
      .withColumn("cqd", expr("sd div n"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cqd")))).as("es"))
      .select(col("label").as("m_label"),
        expr("transform(es, e -> e.cqd)").as("cq"))
    val dists = q.crossJoin(broadcast(cq))
      // sq_dist_long (r13): this fan-out is n·k rows — the interpreted
      // zip_with fold was the distance stage's whole cost
      .withColumn("d2", graft.functions.GraftFunctions.sqDistLong(
        col("qv"), col("cq")))
      .select(col("vec_id"), col("label"), col("m_label"), col("d2"))
    val own = dists.filter(col("label") === col("m_label"))
      .select(col("vec_id"), col("label"), col("d2").as("a2"))
    val wNear = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2"), col("m_label"))
    val other = dists.filter(col("label") =!= col("m_label"))
      .withColumn("rn", row_number().over(wNear)).filter(col("rn") === 1)
      .select(col("vec_id"), col("m_label").as("nearest_other"),
        col("d2").as("b2"))
    own.join(other, "vec_id")
      .withColumn("s_ppm", expr(
        """case when greatest(a2, b2) = 0 then cast(null as bigint)
          |when b2 >= a2 then cast(((b2 - a2) * cast(1000000 as decimal(38,0)))
          |  div greatest(a2, b2) as bigint)
          |else -cast(((a2 - b2) * cast(1000000 as decimal(38,0)))
          |  div greatest(a2, b2) as bigint) end""".stripMargin))
      .select(col("vec_id"), col("label"), col("nearest_other"), col("s_ppm"))
      .orderBy(col("vec_id"))
  }
}

private object ExpressionEncoderHelper {
  import org.apache.spark.sql.Encoder
  val doubleArray: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
