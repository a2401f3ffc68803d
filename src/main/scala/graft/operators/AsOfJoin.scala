package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — an operator Spark's DataFrame
  * API lacks. Composed from built-ins per the preference order (SURVEY
  * §2.8 / build prompt): union the two sides, one window pass per key
  * ordered by time with right rows sorting before left rows at equal
  * timestamps, and `last(_, ignoreNulls)` carrying the latest right
  * payload forward.
  *
  * Scale shape: ONE shuffle (by key) + an in-partition sort — no join
  * fan-out, no range explosion, skew bounded by the hottest key exactly
  * like any keyed window. This is the plan a dedicated SortMergeAsOfExec
  * would produce, so a custom physical operator would only save the
  * union bookkeeping columns.
  */
object AsOfJoin {

  /** For each left row, attach `rightValueCols` from the right row with
    * the greatest `rightTime` ≤ `leftTime` within the same `key`
    * (left-outer: unmatched left rows keep nulls).
    *
    * @param left       left side; must contain `key` and `leftTime`
    * @param right      right side; must contain `key` and `rightTime`
    * @param key        equi-join key column name (both sides)
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param rightValueCols right columns to carry (renamed as given)
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(
        Seq(col(key), col("__t"), col("__side")) ++
          leftCols.filterNot(_ == key).map(c => col(c)) ++
          rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(
        Seq(col(key), col("__t"), col("__side")) ++
          leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightValueCols.map(c => col(c).as(s"__r_$c")): _*)
    // right rows (side 0) sort before left rows at the same timestamp →
    // "at or before" semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(
        (Seq(col(key), col("__t"), col("__side")) ++
          leftCols.filterNot(_ == key).map(c => col(c)) ++
          rightValueCols.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"__c_$c"))): _*)
    carried
      .filter(col("__side") === 1)
      .select(
        (Seq(col(key)) ++
          leftCols.filterNot(_ == key).map(c => col(c)) ++
          rightValueCols.map(c => col(s"__c_$c").as(s"asof_$c"))): _*)
  }
}
