package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Gram-term expression for the covariance/top-PC tier.
  *
  * [[graft.llm.Similarity.embTopPc]] needs every pairwise product
  * x_i·x_j of an embedding row as an EXACT scaled integer
  * (round(x_i·x_j·1e12) summed as BIGINT — the moment convention its
  * DuckDB oracle replays). The composable form (nested `transform`
  * HOFs building dims² structs per row) runs interpreted — measured
  * ~5 s of the entry's 6.7 s at sf0.1 — while this expression is one
  * compiled loop inside whole-stage codegen.
  *
  * Cross-engine contract: products fold as (x_i·x_j)·1e12 in IEEE
  * order, and the half-away-from-zero integer rounding is EXACT on the
  * binary double — at scale 0 the binary decision (frac ≥ 0.5 after an
  * exact floor subtract) coincides with both Spark's decimal HALF_UP
  * `round` and DuckDB's `std::round`, because the 0.5 boundary is
  * itself representable: there is no decimal-vs-binary edge case at
  * integer scale, unlike fractional scales.
  *
  * Output is row-major: term (i, j) sits at index i·dims + j. NULL
  * input, a NULL element, or a dims² that would exceed the per-row
  * array budget yields NULL (the operator's aggregation then sees no
  * terms from that row — embTopPc filters nulls up front).
  */
case class GramTerms(child: Expression) extends UnaryExpression {

  override def prettyName: String = "gram_terms"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"gram_terms requires an array<float|double> argument, got ${t.sql}")
    }

  @transient private lazy val childFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** public: called from generated code. */
  def terms(xRaw: ArrayData): ArrayData = {
    val n = xRaw.numElements()
    if (n > 1024) return null // 1M longs/row is the sanity budget
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (xRaw.isNullAt(i)) return null
      x(i) = if (childFloat) xRaw.getFloat(i).toDouble else xRaw.getDouble(i)
      i += 1
    }
    val out = new Array[Long](n * n)
    i = 0
    while (i < n) {
      val xi = x(i)
      var j = 0
      while (j < n) {
        val p = xi * x(j) * 1e12
        val a = math.abs(p)
        val f = math.floor(a)
        val r = f.toLong + (if (a - f >= 0.5) 1L else 0L)
        out(i * n + j) = if (p < 0) -r else r
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = terms(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramTerms", this,
      classOf[GramTerms].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  $ref.terms($a);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : GramTerms = copy(child = newChild)
}

object GramTerms {
  def gramTerms(x: Column): Column =
    ColumnBridge.column(GramTerms(ColumnBridge.expression(x)))
}
