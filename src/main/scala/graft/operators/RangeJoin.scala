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
    * (point row ++ interval row) pair with start ≤ point ≤ end.
    *
    * `equiKeys` are (pointsKey, intervalsKey) pairs that belong in the
    * JOIN CONDITION, not a post-join filter. Most real range joins are
    * per-entity ("this user's events inside this user's interval") and
    * the entity key must shuffle-partition the join — leaving it as a
    * residual filter invites a near-cartesian per bin whenever the
    * optimizer fails to fold the predicate into the join (Catalyst's
    * PushPredicateThroughJoin usually rescues a same-name filter, but a
    * generic operator must not depend on a rescue). */
  def binned(points: DataFrame, intervals: DataFrame, pointCol: String,
             startCol: String, endCol: String, binWidth: Long,
             equiKeys: Seq[(String, String)] = Nil): DataFrame = {
    val p = points.as("__p").withColumn("__bin", (col(pointCol) / binWidth).cast("long"))
    val i = intervals.as("__i").withColumn("__bin", explode(expr(
      s"sequence(cast($startCol / $binWidth as long), cast($endCol / $binWidth as long))")))
    val cond = equiKeys.foldLeft(p("__bin") === i("__bin")) {
      case (c, (pk, ik)) => c && col(s"__p.$pk") === col(s"__i.$ik")
    }
    p.join(i, cond)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(p("__bin")).drop(i("__bin"))
  }
}
