package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native candidate-pair match primitives — the inner loops of the dedup
  * rescoring joins, replacing interpreted `aggregate`/`zip_with`/`split`
  * lambda chains (CodegenFallback + per-row array allocation) with fused
  * primitive loops, the same escalation as [[VecDot]].
  *
  * Each expression is RESULT-IDENTICAL to the HOF form it replaces
  * (pinned in `MatchExpressionsSpec`); the DuckDB oracles replay the HOF
  * semantics, so equivalence is also re-proven by the hash gate every
  * round.
  */

/** Exact integer dot product Σ x_i·y_i over two integer arrays as a
  * LONG — [[graft.llm.Similarity.int8Dot]]'s
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, +)`: NULL if the
  * lengths differ (zip_with's null padding nulls the sum) or any element
  * is NULL. Each product is widened to long BEFORE multiplying: the
  * type check admits any array<int>, and for inputs outside the int8
  * range the int·int product would silently wrap where the ANSI
  * zip_with form raises — widening gives the mathematically exact
  * result instead of either failure (the long sum cannot overflow
  * below ~2³¹ full-range int products). Identical to the HOF form on
  * every input the HOF form accepts. */
case class IntVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "int_vec_dot"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<int> arguments, got ${l.sql} and ${r.sql}")
    }

  /** public: called from generated code; null boxed for the null path. */
  def dot(x: ArrayData, y: ArrayData): java.lang.Long = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getInt(i).toLong * y.getInt(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intVecDot", this, classOf[IntVecDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = $ref.dot($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntVecDot =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two arrays hold EQUAL non-null elements —
  * the minhash signature-agreement estimator
  * `size(filter(zip_with(a, b, (x, y) -> x = y), m -> m))`: positions
  * past the shorter array (zip_with's null padding) and positions with a
  * NULL element compare to NULL and are dropped by the filter, so they
  * never count. Never NULL itself. */
case class ArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "array_eq_count"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  private def elemOk(t: DataType): Boolean = t match {
    case StringType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _)) if l == r && elemOk(l) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays of the same string/int/long " +
          s"element type, got ${l.sql} and ${r.sql}")
    }

  @transient private lazy val elemType =
    left.dataType.asInstanceOf[ArrayType].elementType

  /** public: called from generated code. */
  def eqCount(x: ArrayData, y: ArrayData): Int = {
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    elemType match {
      case StringType =>
        while (i < n) {
          if (!x.isNullAt(i) && !y.isNullAt(i) &&
            x.getUTF8String(i) == y.getUTF8String(i)) c += 1
          i += 1
        }
      case IntegerType =>
        while (i < n) {
          if (!x.isNullAt(i) && !y.isNullAt(i) &&
            x.getInt(i) == y.getInt(i)) c += 1
          i += 1
        }
      case LongType =>
        while (i < n) {
          if (!x.isNullAt(i) && !y.isNullAt(i) &&
            x.getLong(i) == y.getLong(i)) c += 1
          i += 1
        }
    }
    c
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    eqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("arrayEqCount", this,
      classOf[ArrayEqCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.eqCount($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayEqCount =
    copy(left = newLeft, right = newRight)
}

/** Character Hamming distance over the common prefix length of two
  * strings — the simhash-bitstring rescore
  * `size(filter(zip_with(split(a, ''), split(b, ''), (x, y) -> x != y),
  * d -> d))` without the two per-row char arrays: positions past the
  * shorter string compare to NULL under zip_with's padding and are
  * dropped, so only the first min(len) positions count. Comparison is by
  * UTF-16 code unit — identical to the split-based form for the ASCII
  * '0'/'1' signatures this rescores, with one deliberate divergence: an
  * EMPTY string yields 0 (no positions), where the split form's
  * `split('', '') = ['']` artifact would count 1 against a non-empty
  * peer. Signatures are fixed-width in every caller. */
case class StringHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "string_hamming"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got ${l.sql} and ${r.sql}")
    }

  /** public: called from generated code. */
  def hamming(a: UTF8String, b: UTF8String): Int = {
    val x = a.toString
    val y = b.toString
    val n = math.min(x.length, y.length)
    var c = 0
    var i = 0
    while (i < n) {
      if (x.charAt(i) != y.charAt(i)) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    hamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stringHamming", this,
      classOf[StringHamming].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.hamming($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringHamming =
    copy(left = newLeft, right = newRight)
}

object MatchExpressions {
  def intVecDot(a: Column, b: Column): Column =
    ColumnBridge.column(IntVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def arrayEqCount(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayEqCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def stringHamming(a: Column, b: Column): Column =
    ColumnBridge.column(StringHamming(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
