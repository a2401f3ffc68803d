package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match point events to the
  * intervals containing them.
  *
  * Naive `l.join(r, point between start and end)` is a broadcast/cross
  * nested-loop — O(|l|·|r|) comparisons. The binned form maps each point
  * to one bin and each interval to the bins it overlaps (explode), turning
  * the range predicate into an equi-join on the bin id with a residual
  * filter — the standard trick Spark lacks natively (Databricks' range
  * join optimization does exactly this). Cost: O(|l| + |r|·bins/interval
  * + matches); bin width trades bucket fan-out against candidate noise.
  */
object RangeJoin {

  /** Join `points` (with numeric `pointCol`) to `intervals` (with
    * `startCol`/`endCol`, inclusive bounds): every output row is a
    * (point row ++ interval row) pair with start ≤ point ≤ end. */
  def binned(points: DataFrame, intervals: DataFrame, pointCol: String,
             startCol: String, endCol: String, binWidth: Long): DataFrame = {
    val p = points.withColumn("__bin", (col(pointCol) / binWidth).cast("long"))
    val i = intervals.withColumn("__bin", explode(expr(
      s"sequence(cast($startCol / $binWidth as long), cast($endCol / $binWidth as long))")))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
