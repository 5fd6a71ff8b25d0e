package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native cell-assignment / PQ expressions over broadcast codebooks.
  *
  * The composable forms build one sub-expression PER CODEWORD — an
  * m×ksub-literal tree for PQ encode, a k-struct `array_sort` for IVF
  * probing — which Catalyst must analyze, optimize, and codegen on every
  * plan: the measured ~1-2 s first-plan floor of the PQ entries, and a
  * tree that GROWS with the (now corpus-scaled) semantic-dedup cell
  * count. These expressions instead ship the codebook as a codegen
  * REFERENCE OBJECT (`ctx.addReferenceObj`): the generated code is one
  * method call regardless of k, the inner loops are compiled Scala, and
  * the expression stays inside whole-stage codegen.
  *
  * Cross-engine contract (unchanged from the composable forms, which the
  * DuckDB oracles replay): every dot/sum folds in element order
  * left-to-right; distances/similarities are rounded to 6 dp with
  * Spark's own `round` semantics ([[CellMath.round6]] — `BigDecimal
  * .valueOf`, HALF_UP, so a tiny negative rounds to +0.0 exactly like
  * the built-in); ties break on the smaller codeword/cell index. Null
  * element or length-mismatch inputs yield NULL.
  */
private[graft] object CellMath {
  /** Exactly Spark's `round(x, 6)` on DoubleType: `java.math.BigDecimal
    * .valueOf` (Double.toString canonicalization, NOT the exact binary
    * expansion) + HALF_UP, with NaN/±Infinity passed through unchanged
    * (BigDecimal.valueOf would THROW on them — an all-zero embedding's
    * 0/0 cosine must keep the composable form's NaN-last ordering, not
    * kill the query). BigDecimal has no negative zero, so -1e-16 rounds
    * to +0.0 — the engine side of the [[CrossEngine]] convention holds
    * by construction. */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** left-to-right Σ x_i² — the driver-folded |c|² constant and the
    * shared |e|² term use the same association as VecDot / list_sum. */
  def sumSq(xs: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < xs.length) { s += xs(i) * xs(i); i += 1 }
    s
  }
}

/** Shared shape: a unary array<float|double> input scored against a
  * center/codebook table held as plain expression state. */
private[graft] trait CellCodebookExpression { self: Expression =>
  protected def inputElem(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def checkVec(e: Expression, what: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$what requires array<float|double>, got ${t.sql}")
    }

  /** null on null element or unexpected length, else a primitive copy. */
  protected def toDoubles(x: ArrayData, isFloat: Boolean, expected: Int)
      : Array[Double] = {
    val n = x.numElements()
    if (expected >= 0 && n != expected) return null
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      out(i) = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    out
  }
}

/** The `nProbe` nearest L2 cells of `child` among `centers`, ordered by
  * (rounded dist², cell index) — the [[graft.llm.Similarity]] IVF probe
  * and coarse-assignment primitive. dist² = |e|² − 2·e⋅c + |c|² with
  * |c|² driver-folded, exactly the composable form's association. An
  * embedding containing a non-finite element makes EVERY distance NaN
  * and assigns the first cells in index order — the same
  * garbage-in-deterministic-garbage-out the composable struct-sort
  * produced (Spark `round` passes NaN through; all-equal NaN structs
  * keep index order), kept for parity rather than nulled. */
case class NearestCells(
    child: Expression, centers: Seq[Seq[Double]], nProbe: Int)
    extends UnaryExpression with CellCodebookExpression {

  require(centers.nonEmpty, "centers must be non-empty")
  // a ragged center table would otherwise surface as an executor-side
  // ArrayIndexOutOfBounds deep in the dot loop — fail at plan construction
  require(centers.forall(_.length == centers.head.length),
    s"centers must be rectangular; got lengths " +
      s"${centers.map(_.length).distinct.sorted.mkString(", ")}")
  require(nProbe > 0, "nProbe must be positive")

  override def prettyName: String = "nearest_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child, prettyName)

  @transient private lazy val ctr: Array[Array[Double]] =
    centers.map(_.toArray).toArray
  @transient private lazy val cc: Array[Double] = ctr.map(CellMath.sumSq)
  @transient private lazy val dim: Int = ctr.head.length
  @transient private lazy val childFloat = inputElem(child) == FloatType

  /** public: called from generated code. */
  def nearest(xRaw: ArrayData): ArrayData = {
    val x = toDoubles(xRaw, childFloat, dim)
    if (x == null) return null
    val k = ctr.length
    val ee = CellMath.sumSq(x)
    val dist = new Array[Double](k)
    var c = 0
    while (c < k) {
      val w = ctr(c)
      var d = 0.0
      var i = 0
      while (i < dim) { d += x(i) * w(i); i += 1 }
      dist(c) = CellMath.round6(ee - 2.0 * d + cc(c))
      c += 1
    }
    val take = math.min(nProbe, k)
    val out = new Array[Int](take)
    val used = new Array[Boolean](k)
    var t = 0
    while (t < take) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!used(c2) && (best < 0 || dist(c2) < dist(best))) best = c2
        c2 += 1
      }
      used(best) = true
      out(t) = best
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = nearest(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  $ref.nearest($a);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCells = copy(child = newChild)
}

/** The MAX-COSINE cell index of `child` among `centers` (rounded to 6 dp,
  * ties on the smaller index) — the spherical-cell assignment of
  * SemDeDup. Scale-invariant: a positively-scaled duplicate lands in the
  * same cell bitwise. Deliberate divergence from the composable form: an
  * all-zero embedding (cosine 0/0 = NaN everywhere) assigns to cell 0
  * instead of throwing ANSI DIVIDE_BY_ZERO — a degenerate vector must
  * not kill a corpus-scale dedup job, and NaN similarities can never
  * flag it as anyone's duplicate downstream. */
case class MaxCosineCell(child: Expression, centers: Seq[Seq[Double]])
    extends UnaryExpression with CellCodebookExpression {

  require(centers.nonEmpty, "centers must be non-empty")
  require(centers.forall(_.length == centers.head.length),
    s"centers must be rectangular; got lengths " +
      s"${centers.map(_.length).distinct.sorted.mkString(", ")}")

  override def prettyName: String = "max_cosine_cell"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child, prettyName)

  @transient private lazy val ctr: Array[Array[Double]] =
    centers.map(_.toArray).toArray
  @transient private lazy val cnorm: Array[Double] =
    ctr.map(w => math.sqrt(CellMath.sumSq(w)))
  @transient private lazy val dim: Int = ctr.head.length
  @transient private lazy val childFloat = inputElem(child) == FloatType

  /** public: called from generated code; null boxed for the null path. */
  def maxCell(xRaw: ArrayData): java.lang.Integer = {
    val x = toDoubles(xRaw, childFloat, dim)
    if (x == null) return null
    val en = math.sqrt(CellMath.sumSq(x))
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < ctr.length) {
      val w = ctr(c)
      var d = 0.0
      var i = 0
      while (i < dim) { d += x(i) * w(i); i += 1 }
      val sim = CellMath.round6(d / (en * cnorm(c)))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    Integer.valueOf(best)
  }

  override def nullSafeEval(a: Any): Any = {
    val r = maxCell(a.asInstanceOf[ArrayData])
    if (r == null) null else r.intValue()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("maxCosineCell", this,
      classOf[MaxCosineCell].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |java.lang.Integer ${ev.value}_r = $ref.maxCell($a);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MaxCosineCell = copy(child = newChild)
}

/** PQ encode: all `m` subspace codes of `child` in ONE call — per
  * subspace, the nearest codeword by the same rounded-L2 rule as
  * [[NearestCells]] (dist over the dsub-slice, ties on the smaller
  * code). Replaces an m×ksub-literal tree with one reference object. */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CellCodebookExpression {

  require(codebook.nonEmpty && codebook.head.nonEmpty &&
    codebook.head.head.nonEmpty, "codebook must be m × ksub × dsub")
  require(codebook.forall(_.length == codebook.head.length) &&
    codebook.forall(_.forall(_.length == codebook.head.head.length)),
    "codebook must be rectangular m × ksub × dsub; got ragged " +
      "subspace/codeword lengths")

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child, prettyName)

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val cc: Array[Array[Double]] =
    cb.map(_.map(CellMath.sumSq))
  @transient private lazy val m = cb.length
  @transient private lazy val ksub = cb.head.length
  @transient private lazy val dsub = cb.head.head.length
  @transient private lazy val childFloat = inputElem(child) == FloatType

  /** public: called from generated code. */
  def encode(xRaw: ArrayData): ArrayData = {
    val x = toDoubles(xRaw, childFloat, m * dsub)
    if (x == null) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * dsub
      var ee = 0.0
      var t = 0
      while (t < dsub) { val v = x(off + t); ee += v * v; t += 1 }
      var best = 0
      var bestDist = Double.PositiveInfinity
      var first = true
      var c = 0
      while (c < ksub) {
        val w = cb(j)(c)
        var d = 0.0
        t = 0
        while (t < dsub) { d += x(off + t) * w(t); t += 1 }
        val dist = CellMath.round6(ee - 2.0 * d + cc(j)(c))
        if (first || dist < bestDist) { bestDist = dist; best = c; first = false }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(a: Any): Any = encode(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  $ref.encode($a);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PqEncode = copy(child = newChild)
}

/** Raw ADC inner product of a full-precision query (`left`) against PQ
  * codes (`right`): Σ_j q_sub_j ⋅ codebook_j[code_j], each subspace dot
  * folded left-to-right, the m partials then added left-to-right — the
  * exact association of the composable per-subspace `VecDot` sum (and of
  * the oracle's ordered list_sum). Rounding/normalization stay OUTSIDE
  * (`normZero(round(_, 6))`) so the cross-engine convention is applied
  * uniformly at the call site. NULL on length mismatch or an
  * out-of-range code. */
case class PqAdc(
    left: Expression, right: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends BinaryExpression with CellCodebookExpression {

  require(codebook.nonEmpty && codebook.head.nonEmpty &&
    codebook.head.head.nonEmpty, "codebook must be m × ksub × dsub")
  require(codebook.forall(_.length == codebook.head.length) &&
    codebook.forall(_.forall(_.length == codebook.head.head.length)),
    "codebook must be rectangular m × ksub × dsub; got ragged " +
      "subspace/codeword lengths")

  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(left, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess => right.dataType match {
        case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName codes must be array<int>, got ${t.sql}")
      }
      case f => f
    }

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val m = cb.length
  @transient private lazy val ksub = cb.head.length
  @transient private lazy val dsub = cb.head.head.length
  @transient private lazy val leftFloat = inputElem(left) == FloatType

  /** public: called from generated code; null boxed for the null path. */
  def adc(qRaw: ArrayData, codesRaw: ArrayData): java.lang.Double = {
    val q = toDoubles(qRaw, leftFloat, m * dsub)
    if (q == null || codesRaw.numElements() != m) return null
    var total = 0.0
    var j = 0
    while (j < m) {
      if (codesRaw.isNullAt(j)) return null
      val code = codesRaw.getInt(j)
      if (code < 0 || code >= ksub) return null
      val w = cb(j)(code)
      val off = j * dsub
      var part = 0.0
      var t = 0
      while (t < dsub) { part += q(off + t) * w(t); t += 1 }
      total += part
      j += 1
    }
    java.lang.Double.valueOf(total)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = $ref.adc($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object CellExpressions {
  def nearestCells(emb: Column, centers: Array[Array[Double]], nProbe: Int)
      : Column =
    ColumnBridge.column(NearestCells(
      ColumnBridge.expression(emb), centers.map(_.toSeq).toSeq, nProbe))

  def maxCosineCell(emb: Column, centers: Array[Array[Double]]): Column =
    ColumnBridge.column(MaxCosineCell(
      ColumnBridge.expression(emb), centers.map(_.toSeq).toSeq))

  def pqEncode(emb: Column, codebook: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(
      ColumnBridge.expression(emb), codebook.map(_.map(_.toSeq).toSeq).toSeq))

  def pqAdc(qEmb: Column, codes: Column,
      codebook: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(qEmb), ColumnBridge.expression(codes),
      codebook.map(_.map(_.toSeq).toSeq).toSeq))
}
