/** Access shim for Catalyst's `CollectTopK`, which is private to this
  * package — same single-purpose bridge pattern as
  * org.apache.spark.sql.graftbridge.ColumnBridge. Nothing else in the
  * package is touched.
  */
package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftCollectTopK {
  /** The bounded-heap top-k collector as an AggregateExpression;
    * `reverse=false` keeps the k LARGEST under the child type's ordering,
    * `reverse=true` the k smallest (see graft.plans.TopKSpec). */
  def apply(e: Expression, k: Int, reverse: Boolean): Expression =
    CollectTopK(e, k, reverse).toAggregateExpression()
}
