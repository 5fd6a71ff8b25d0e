package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays (float or double), with
  * whole-stage codegen — the hot inner loop of every cosine-similarity
  * operator (ANN top-k, embedding near-dup, LSH signatures).
  *
  * Why a custom Catalyst Expression: the composable form
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)`
  * allocates an intermediate array per row and evaluates its lambdas in
  * interpreted CodegenFallback — measured ~10× slower at sf0.1. This
  * expression generates a primitive fused multiply-add loop instead
  * (SURVEY §7.3 escalation path: built-ins, then custom Expression).
  *
  * Semantics match the HOF form exactly so DuckDB oracles stay valid:
  * left-to-right double accumulation (x_i·y_i added in index order), NULL
  * if the arrays differ in length or any element is NULL — the same result
  * `zip_with`'s null-padding would produce.
  *
  * Cross-engine conventions for CONSUMERS of this fold: round derived
  * scores to 6 dp and normalize IEEE negative zero before hashing
  * ([[CrossEngine.normZero]] — Spark's BigDecimal round and DuckDB's
  * libm round disagree at -0.0), and use rounded comparisons so a
  * last-ulp libm difference can never flip an ordering. The
  * `q_crossengine_zero` catalog entry re-proves the convention against
  * DuckDB every round.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "vec_dot"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires two array<float|double> arguments, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val leftFloat = elemType(left) == FloatType
    val rightFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression) =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(a, left)} * ${get(b, right)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column-API entry point: `vecDot(a, b)` — a drop-in for the
    * aggregate/zip_with fold. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
