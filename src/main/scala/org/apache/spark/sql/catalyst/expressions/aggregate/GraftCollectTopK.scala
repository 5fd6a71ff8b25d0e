/** Access shim for Catalyst's `CollectTopK`, which is private to this
  * package — same single-purpose bridge pattern as
  * org.apache.spark.sql.graftbridge.ColumnBridge. Nothing else in the
  * package is touched.
  */
package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftCollectTopK {
  /** The bounded-heap top-k collector as an AggregateExpression;
    * `reverse=true` keeps the largest k under the child type's ordering. */
  def apply(e: Expression, k: Int, reverse: Boolean): Expression =
    CollectTopK(e, k, reverse).toAggregateExpression()
}
