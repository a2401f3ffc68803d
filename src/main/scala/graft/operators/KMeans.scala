package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column — the IVF coarse-quantizer
  * trainer (the `label`-column IVF in [[Similarity.ivfTopK]] becomes
  * self-sufficient: train lists, then probe them).
  *
  * Deterministic throughout: init picks the k vectors with the smallest
  * ids (stable under re-runs and task retries); assignment breaks
  * distance ties by centroid index. Each iteration is one broadcast of
  * k centroids + one narrow assignment pass + one centroid
  * recomputation ([[Centroids.byGroupBy]]) — no quadratic anything, and
  * the per-iteration shuffle carries (cluster, dim, partial-sum) rows
  * only.
  */
object KMeans {

  /** Squared-L2 distance between a row vector column and a broadcast
    * literal centroid (array of doubles). */
  private def sqDist(vecCol: String, centroid: Array[Double]): org.apache.spark.sql.Column = {
    val lits = centroid.mkString("array(", "d,", "d)")
    expr(
      s"""aggregate(zip_with(transform($vecCol, x -> cast(x as double)), $lits,
         |  (x, c) -> (x - c) * (x - c)), 0d, (acc, v) -> acc + v)""".stripMargin)
  }

  /** Train k centroids; returns (assignments DF (id, cluster), centroids
    * as local array indexed by cluster id). */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
          iterations: Int = 5): (DataFrame, Array[Array[Double]]) = {
    require(iterations >= 1, "k-means needs at least one iteration")
    // deterministic init: the k smallest-id vectors; with fewer than k
    // rows the effective k shrinks to the row count (every distance
    // column below is built from the ACTUAL centroid count)
    var centroids: Array[Array[Double]] = df
      .orderBy(col(idCol)).limit(k)
      .select(expr(s"transform($vecCol, x -> cast(x as double))"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(centroids.nonEmpty, "k-means needs a non-empty input")
    val kEff = centroids.length

    val arr = (0 until kEff).map(i => s"__d$i").mkString("array(", ",", ")")
    var assigned: DataFrame = null
    var iter = 0
    while (iter < iterations) {
      val distCols = centroids.zipWithIndex.map { case (c, i) =>
        sqDist(vecCol, c).as(s"__d$i")
      }
      val withDists = df.select((col(idCol) +: col(vecCol) +: distCols.toSeq): _*)
      // argmin with index tiebreak via array_position of the minimum
      assigned = withDists
        .withColumn("cluster",
          (expr(s"array_position($arr, array_min($arr))") - 1).cast("int"))
        .select(col(idCol), col(vecCol), col("cluster"))
      val newCentroids = Centroids.byGroupBy(assigned, "cluster", vecCol)
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // empty clusters keep their previous centroid
      centroids = centroids.zipWithIndex.map { case (old, i) => newCentroids.getOrElse(i, old) }
      iter += 1
    }
    (assigned.select(col(idCol), col("cluster")), centroids)
  }

  /** Assign an arbitrary dataframe to the trained lists (for IVF probe). */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             centroids: Array[Array[Double]]): DataFrame = {
    val k = centroids.length
    val distCols = centroids.zipWithIndex.map { case (c, i) => sqDist(vecCol, c).as(s"__d$i") }
    val arr = (0 until k).map(i => s"__d$i").mkString("array(", ",", ")")
    df.select((col(idCol) +: col(vecCol) +: distCols.toSeq): _*)
      .withColumn("cluster",
        (expr(s"array_position($arr, array_min($arr))") - 1).cast("int"))
      .select(col(idCol), col(vecCol), col("cluster"))
  }
}
