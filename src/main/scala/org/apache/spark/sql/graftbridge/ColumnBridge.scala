package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); an
  * extension library providing native Catalyst expressions accesses them
  * from inside the `org.apache.spark.sql` namespace — the same pattern
  * third-party Spark extensions use. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (Dataset.ofRows is private[sql]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]].logicalPlan

  /** The RDDs a `localCheckpoint` pinned behind a frame's LogicalRDD
    * nodes. localCheckpoint persists OUTSIDE the SQL CacheManager —
    * `spark.catalog.clearCache()` and `Dataset.unpersist` never touch
    * those blocks — so lifetime management must unpersist the RDDs
    * directly (the graft CacheLedger does). */
  def checkpointedRdds(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    logicalPlan(df).collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
}
