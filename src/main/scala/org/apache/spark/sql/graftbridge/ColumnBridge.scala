/** Bridge into Spark's `private[sql]` Column↔Expression converters.
  *
  * Spark 4 made `Column` wrap an opaque ColumnNode; the supported way to
  * build a Column from a custom Catalyst Expression inside a library is
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * This one-file subpackage re-exports exactly those two conversions for
  * graft's native expressions (VecDot). No other Spark internals are
  * touched.
  */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column tree into the catalyst Expression the
    * analyzer can resolve (Unresolved* nodes and all). `expression` above
    * wraps the ColumnNode lazily, which is fine inside a DataFrame but NOT
    * inside a FunctionRegistry builder — the analyzer never looks through
    * the wrapper and codegen then fails. Needed to register Column-algebra
    * compositions (graft's text-analysis tier) as SQL functions. */
  def analyzableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Catalyst's bounded-heap top-k collector: the partial-aggregating
    * primitive behind graft.plans.TopK. `reverse=false` keeps the k
    * LARGEST under the child type's ordering, `reverse=true` the k
    * smallest (verified against the window-rank oracle in TopKSpec). */
  def collectTopK(e: Expression, k: Int, reverse: Boolean): Column =
    column(org.apache.spark.sql.catalyst.expressions.aggregate
      .GraftCollectTopK(e, k, reverse))
}
