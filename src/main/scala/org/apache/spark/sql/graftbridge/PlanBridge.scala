/** Bridge into Spark's `private[sql]` Dataset↔LogicalPlan converters, for
  * optimizer rules that build their replacement subtree with the DataFrame
  * API (running the analyzer on the new ops) instead of hand-assembling
  * resolved catalyst nodes. Companion to [[ColumnBridge]]; nothing else of
  * Spark's internals is touched.
  */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object PlanBridge {

  /** Wrap an (analyzed) plan as a DataFrame of the given session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame (analysis runs here if it
    * hasn't yet; the optimizer is NOT invoked). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
}
