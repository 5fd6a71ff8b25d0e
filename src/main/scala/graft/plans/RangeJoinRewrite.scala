package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{NumericType, TimestampNTZType, TimestampType}

/** Opt-in optimizer rule promoting [[graft.scale.RangeJoin]] from a
  * library call to ENGINE BEHAVIOR — the [[SkewJoinRewrite]] pattern
  * pointed at the OTHER join Catalyst cannot plan well: a join whose
  * only cross-side predicate is `point BETWEEN lo AND hi` plans as
  * BroadcastNestedLoopJoin (or a cartesian when neither side
  * broadcasts), O(|L|·|R|) however selective the range is. When
  * `spark.graft.rangeJoin.rewrite=true`, such joins are rewritten to
  * the bucketed form: time quantized into
  * `spark.graft.rangeJoin.bucketSec`-wide buckets (default 86400),
  * intervals exploded into covered buckets, points equi-joined on
  * their single bucket, and the FULL ORIGINAL predicate re-applied —
  * so strict bounds, extra conjuncts, and NULL semantics are exactly
  * the nested loop's, and since a point has exactly one bucket no pair
  * can emit twice. RESULT-IDENTICAL, re-proven by the plain-predicate
  * oracle every round.
  *
  * NUMERIC bounds (r15 verdict task 5) hit the same BNLJ cliff — score
  * bands, length buckets, id ranges — and rewrite identically through
  * [[graft.scale.RangeJoin.pointInIntervalNum]], with
  * `spark.graft.rangeJoin.numBucketWidth` (fractional allowed, NO
  * default — the width is workload-specific and must be set
  * explicitly or the numeric family declines; see the accessor's
  * scaladoc for why a session-wide default is a trap) as the numeric
  * bucket width. The point and BOTH bounds
  * must belong to ONE type family (all timestamps or all numeric):
  * mixed-family triples are DECLINED — Spark would insert implicit
  * casts whose comparison semantics the bucket quantization cannot be
  * proven to cover, and a mixed triple is almost always a schema bug
  * the nested loop surfaces honestly.
  *
  * Joins left alone: anything but INNER/CROSS, hinted joins (the user
  * chose a strategy), joins already connected by a cross-side equality
  * (the planner runs those as equi-joins — rewriting could only add
  * work; see the keyed opt-in below), mixed-family or
  * non-timestamp/non-numeric bounds, and already-rewritten subtrees
  * (the `__graft_range` marker). Unlike [[SkewJoinRewrite]] no
  * plan-time jobs run — the pattern match is pure, so the only cost of
  * enabling the conf is the match itself.
  *
  * KEYED ranges (r17): `spark.graft.rangeJoin.keyedRewrite=true`
  * additionally treats equality-PLUS-range conditions — the
  * (tenant_id, ts BETWEEN lo AND hi) production shape — by lifting
  * every cross-side attribute=attribute equality into the bucketed
  * join's key list ([[graft.scale.RangeJoin]]'s `keys`), so the
  * shuffle partitions on (keys…, bucket). This is its OWN opt-in
  * because the default decline is RIGHT for high-cardinality keys: the
  * planner's hash join on a selective equality already confines the
  * range filter to small groups, and bucketing would only add interval
  * replication. On LOW-cardinality keys (tenants, categories, event
  * types) each hash group is a per-key cartesian and the keyed bucket
  * join wins — a DATA property the pure pattern match cannot see, so
  * the user chooses. Result identity is unconditional either way (the
  * FULL original predicate re-applies, equalities included); an
  * equality connector that is not attribute=attribute still declines
  * (the lift is proven for attribute pairs only). */
case class RangeJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val Marker = "__graft_range"

  private def enabled: Boolean =
    spark.conf.get("spark.graft.rangeJoin.rewrite", "false") == "true"
  private def bucketSec: Long =
    spark.conf.get("spark.graft.rangeJoin.bucketSec", "86400").toLong
  /** No default: unlike a day for timestamps there is NO universal
    * numeric width — score bands live near 0.1, id ranges near 1e6 —
    * and a wrong session-wide default silently funnels every row into
    * bucket 0, a single shuffle partition doing the full |L|·|R| work
    * serialized on one task (strictly worse than the nested loop it
    * replaces). Numeric rewrites therefore require the conf to be set
    * EXPLICITLY; unset declines the numeric family entirely. */
  private def numBucketWidth: Option[Double] =
    spark.conf.getOption("spark.graft.rangeJoin.numBucketWidth")
      .map(_.toDouble)
  private def keyedRewrite: Boolean =
    spark.conf.get("spark.graft.rangeJoin.keyedRewrite", "false") == "true"

  private def isRewritten(p: LogicalPlan): Boolean =
    p.output.exists(_.name.startsWith(Marker))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      // shape 1 (extension injection point): filter still above the join
      case f @ Filter(cond, Join(left, right, Inner | Cross, None, hint))
          if hint == JoinHint.NONE &&
            !isRewritten(left) && !isRewritten(right) =>
        rewrite(cond, left, right).getOrElse(f)
      // shape 2 (post-pushdown): predicate inside the join condition
      case j @ Join(left, right, Inner | Cross, Some(cond), hint)
          if hint == JoinHint.NONE &&
            !isRewritten(left) && !isRewritten(right) =>
        rewrite(cond, left, right).getOrElse(j)
    }
  }

  private def tsType(e: Expression): Boolean =
    e.dataType == TimestampType || e.dataType == TimestampNTZType
  private def numType(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]
  /** One type family across (point, lo, hi) — all timestamps or all
    * numeric; None (decline) for mixed or unsupported families. */
  private def familyOf(t: Expression, lo: Expression, hi: Expression)
      : Option[Boolean] =
    if (tsType(t) && tsType(lo) && tsType(hi)) Some(true)
    else if (numType(t) && numType(lo) && numType(hi)) Some(false)
    else None

  /** lower-bound conjunct: ts ≥/> bound (either operand order). */
  private def lowerOf(e: Expression): Option[(Attribute, Attribute)] =
    e match {
      case GreaterThanOrEqual(t: AttributeReference, b: AttributeReference) =>
        Some((t, b))
      case GreaterThan(t: AttributeReference, b: AttributeReference) =>
        Some((t, b))
      case LessThanOrEqual(b: AttributeReference, t: AttributeReference) =>
        Some((t, b))
      case LessThan(b: AttributeReference, t: AttributeReference) =>
        Some((t, b))
      case _ => None
    }

  /** upper-bound conjunct: ts ≤/< bound. */
  private def upperOf(e: Expression): Option[(Attribute, Attribute)] =
    e match {
      case LessThanOrEqual(t: AttributeReference, b: AttributeReference) =>
        Some((t, b))
      case LessThan(t: AttributeReference, b: AttributeReference) =>
        Some((t, b))
      case GreaterThanOrEqual(b: AttributeReference, t: AttributeReference) =>
        Some((t, b))
      case GreaterThan(b: AttributeReference, t: AttributeReference) =>
        Some((t, b))
      case _ => None
    }

  /** The cross-side equality conjuncts — ONE collection shared by the
    * decline gate and the keyed lift, so the two can never drift on
    * what counts as an equi connector. */
  private def equiConnectors(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Seq[Expression] =
    conjuncts.filter {
      case EqualTo(x, y) => connects(x, y, left, right)
      case EqualNullSafe(x, y) => connects(x, y, left, right)
      case _ => false
    }

  private def connects(x: Expression, y: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (x.references.nonEmpty && y.references.nonEmpty) &&
      ((x.references.subsetOf(left.outputSet) &&
        y.references.subsetOf(right.outputSet)) ||
        (y.references.subsetOf(left.outputSet) &&
          x.references.subsetOf(right.outputSet)))

  /** Cross-side attribute=attribute equalities, unoriented; None when
    * some connector is NOT a plain attribute pair (the keyed lift is
    * proven for attribute pairs only — decline). Null-safe equality is
    * never lifted: the bucketed join's key equality drops NULL=NULL
    * pairs that <=> would keep. */
  private def liftableEquis(conns: Seq[Expression])
      : Option[Seq[(Attribute, Attribute)]] = {
    val lifted = conns.map {
      case EqualTo(x: AttributeReference, y: AttributeReference) =>
        Some((x: Attribute, y: Attribute))
      case _ => None
    }
    if (lifted.exists(_.isEmpty)) None else Some(lifted.flatten)
  }

  private def rewrite(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val conns = equiConnectors(conjuncts, left, right)
    val equis =
      if (conns.isEmpty) Seq.empty
      else if (!keyedRewrite) return None
      else liftableEquis(conns) match {
        case Some(ps) => ps
        case None => return None
      }
    val lowers = conjuncts.flatMap(lowerOf)
    val uppers = conjuncts.flatMap(upperOf)
    // a (point, lo, hi) triple in ONE type family with the point wholly
    // on one side and both bounds on the other — the first match wins;
    // a non-positive width conf disables that family's rewrites
    val found = (for {
      (t1, lo) <- lowers
      (t2, hi) <- uppers
      if t1.exprId == t2.exprId
      isTs <- familyOf(t1, lo, hi).toSeq
      if (isTs && bucketSec > 0) || (!isTs && numBucketWidth.exists(_ > 0))
      (pts, ivs, flipped) <-
        (if (left.outputSet.contains(t1) &&
            right.outputSet.contains(lo) && right.outputSet.contains(hi))
          Some((left, right, false))
        else if (right.outputSet.contains(t1) &&
            left.outputSet.contains(lo) && left.outputSet.contains(hi))
          Some((right, left, true))
        else None).toSeq
    } yield (t1, lo, hi, pts, ivs, flipped, isTs)).headOption
    found.map { case (ts, lo, hi, points, intervals, flipped, isTs) =>
      def name(side: String, i: Int) = s"${Marker}_${side}$i"
      val pNames = points.output.indices.map(name("p", _))
      val iNames = intervals.output.indices.map(name("i", _))
      val pDf = PlanBridge.ofRows(spark, points).toDF(pNames: _*)
      val iDf = PlanBridge.ofRows(spark, intervals).toDF(iNames: _*)
      val tsName = name("p", points.output.indexWhere(_.exprId == ts.exprId))
      val loName =
        name("i", intervals.output.indexWhere(_.exprId == lo.exprId))
      val hiName =
        name("i", intervals.output.indexWhere(_.exprId == hi.exprId))
      // orient each lifted equality to (points attr, intervals attr)
      // and translate to the internal names; an equality that does not
      // straddle points/intervals cannot exist here (connects() proved
      // cross-side under the ORIGINAL left/right, which {points,
      // intervals} is a permutation of)
      val keyPairs = equis.map { case (x, y) =>
        if (points.outputSet.contains(x))
          (name("p", points.output.indexWhere(_.exprId == x.exprId)),
            name("i", intervals.output.indexWhere(_.exprId == y.exprId)))
        else
          (name("p", points.output.indexWhere(_.exprId == y.exprId)),
            name("i", intervals.output.indexWhere(_.exprId == x.exprId)))
      }
      val bucketed = PlanBridge.analyzed(
        if (isTs) graft.scale.RangeJoin.pointInInterval(
          pDf, tsName, iDf, loName, hiName, bucketSec, keyPairs)
        else graft.scale.RangeJoin.pointInIntervalNum(
          pDf, tsName, iDf, loName, hiName, numBucketWidth.get, keyPairs))
      val byName = bucketed.output.map(a => a.name -> a).toMap
      val restored = (points.output.zipWithIndex.map { case (a, i) =>
        Alias(byName(name("p", i)), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
      }) ++ (intervals.output.zipWithIndex.map { case (a, i) =>
        Alias(byName(name("i", i)), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
      })
      val ordered =
        if (flipped) restored.drop(points.output.length) ++
          restored.take(points.output.length)
        else restored
      // the full ORIGINAL predicate re-filters the bucket candidates:
      // strict bounds, extra conjuncts, everything — exactly the
      // nested loop's emission set
      Filter(cond, Project(ordered, bucketed)) match {
        case filtered => Project(
          (left.output ++ right.output).map(a => a: NamedExpression),
          filtered)
      }
    }
  }
}
