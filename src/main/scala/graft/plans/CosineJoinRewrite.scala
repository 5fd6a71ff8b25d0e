package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{array, col, posexplode, substring}
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.functions.VecDot
import graft.llm.Similarity

/** Opt-in optimizer rule (SURVEY §4's "strategy for LSH top-k join"):
  * rewrites a cosine-similarity threshold over a cross/unconditioned inner
  * join — the O(n·m) all-pairs plan — into a banded hyperplane-LSH
  * candidate join with exact rescoring: both sides are bucketed by LSH band
  * key, only same-bucket rows meet (a hash-partitioned equi-join), and the
  * ORIGINAL predicate re-filters the candidates, so every emitted row
  * satisfies the user's condition exactly.
  *
  * This is approximate query processing: pairs whose signatures disagree in
  * every band are never considered, so recall < 1 is possible (identical
  * and near-identical vectors always share all bands), and candidate
  * dedup gives the output SET semantics — byte-identical duplicate input
  * rows collapse to one qualifying pair where the cartesian would emit
  * each. Hence the rewrite is DISABLED unless
  * `spark.graft.cosineJoin.rewrite=true`, the standard opt-in contract for
  * AQP. Joins that already carry an equality connecting the two sides are
  * never rewritten — the planner runs those as equi-joins without a
  * cartesian, and the rewrite could only lose rows. Tuning:
  *
  *   - `spark.graft.cosineJoin.planes` (default 16) — signature bits
  *   - `spark.graft.cosineJoin.bands`  (default 4)  — higher = more recall
  *   - `spark.graft.cosineJoin.dim`    (default 64) — embedding width; a
  *     mismatched row raises a descriptive error at run time (silent
  *     misbucketing would be far worse)
  *
  * The pattern recognizes the expression tree both `Similarity.cosine` and
  * the SQL `cosine_sim` function produce (VecDot(a,b) / (√VecDot(a,a) ·
  * √VecDot(b,b))) compared `>=`/`>` against a positive literal, with `a`
  * from one join side and `b` from the other. Works both as an injected
  * extension rule (mid operator-optimization, filter still above the join)
  * and in `spark.experimental.extraOptimizations` (post-pushdown, predicate
  * already inside the join condition).
  */
case class CosineJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val BandIdx = "__graft_band_idx"
  private val BandKey = "__graft_band_key"
  private val Sig = "__graft_sig"

  private def enabled: Boolean =
    spark.conf.get("spark.graft.cosineJoin.rewrite", "false") == "true"
  private def planes: Int =
    spark.conf.get("spark.graft.cosineJoin.planes", "16").toInt
  private def bands: Int =
    spark.conf.get("spark.graft.cosineJoin.bands", "4").toInt
  private def dim: Int =
    spark.conf.get("spark.graft.cosineJoin.dim", "64").toInt

  /** cosine(a, b) as produced by Similarity.cosine / SQL cosine_sim. */
  private object CosineOf {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Divide(VecDot(a, b),
          Multiply(Sqrt(VecDot(a2, a3)), Sqrt(VecDot(b2, b3)), _), _)
          if a.semanticEquals(a2) && a.semanticEquals(a3) &&
            b.semanticEquals(b2) && b.semanticEquals(b3) =>
        Some((a, b))
      case _ => None
    }
  }

  /** cosine(a,b), optionally wrapped in round(·, k) — rounding commutes
    * with "is this pair a candidate" since the ORIGINAL predicate rescores
    * candidates exactly; only the pruning side needs the pair. */
  private object Cosineish {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case CosineOf(a, b) => Some((a, b))
      case Round(CosineOf(a, b), Literal(_, _), _) => Some((a, b))
      case _ => None
    }
  }

  /** A conjunct of shape cosine(a,b) >= t (or flipped), or the distance
    * form 1 - cosine(a,b) <= d, with an effective similarity bound > 0. */
  private def cosineThreshold(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(Cosineish(a, b), Literal(t: Double, _)) if t > 0 =>
        Some((a, b))
      case GreaterThan(Cosineish(a, b), Literal(t: Double, _)) if t > 0 =>
        Some((a, b))
      case LessThanOrEqual(Literal(t: Double, _), Cosineish(a, b)) if t > 0 =>
        Some((a, b))
      case LessThan(Literal(t: Double, _), Cosineish(a, b)) if t > 0 =>
        Some((a, b))
      // cosine DISTANCE: (1 - cos) <= d  ⇔  cos >= 1 - d, candidate iff 1-d > 0
      case LessThanOrEqual(Subtract(Literal(one: Double, _), Cosineish(a, b), _),
          Literal(d: Double, _)) if one == 1.0 && 1.0 - d > 0 =>
        Some((a, b))
      case LessThan(Subtract(Literal(one: Double, _), Cosineish(a, b), _),
          Literal(d: Double, _)) if one == 1.0 && 1.0 - d > 0 =>
        Some((a, b))
      case _ => None
    }

  /** Already-rewritten subtrees carry band columns; never rewrite twice. */
  private def isRewritten(p: LogicalPlan): Boolean =
    p.output.exists(_.name.startsWith("__graft_band"))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      // shape 1 (extension injection point): filter still above the join
      case f @ Filter(cond,
          Join(left, right, Inner | Cross, None, _))
          if !isRewritten(left) && !isRewritten(right) =>
        rewrite(cond, left, right).getOrElse(f)
      // shape 2 (experimental-methods injection point): predicate already
      // pushed into the join condition
      case j @ Join(left, right, Inner | Cross, Some(cond), _)
          if !isRewritten(left) && !isRewritten(right) =>
        rewrite(cond, left, right).getOrElse(j)
    }
  }

  /** A conjunct that already connects both sides by equality — the join is
    * then an equi-join the planner handles without a cartesian, and the
    * rewrite would only LOSE rows (band-disagreeing pairs that the equi-key
    * matched). Such joins are left untouched. */
  private def hasEquiConnector(
      conjuncts: Seq[Expression], left: LogicalPlan, right: LogicalPlan)
      : Boolean = conjuncts.exists {
    case EqualTo(x, y) => connects(x, y, left, right)
    case EqualNullSafe(x, y) => connects(x, y, left, right)
    case _ => false
  }

  private def connects(
      x: Expression, y: Expression, left: LogicalPlan, right: LogicalPlan)
      : Boolean =
    (x.references.nonEmpty && y.references.nonEmpty) &&
      ((x.references.subsetOf(left.outputSet) &&
        y.references.subsetOf(right.outputSet)) ||
        (y.references.subsetOf(left.outputSet) &&
          x.references.subsetOf(right.outputSet)))

  /** Grouping by every output column implements the candidate dedup; types
    * like MapType cannot be grouped and would fail analysis. */
  private def groupable(p: LogicalPlan): Boolean =
    p.output.forall(a => org.apache.spark.sql.catalyst.expressions
      .RowOrdering.isOrderable(a.dataType))

  private def rewrite(
      cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[LogicalPlan] = {
    if (planes <= 0 || bands <= 0 || planes % bands != 0) {
      logWarning(s"spark.graft.cosineJoin: planes ($planes) must be a " +
        s"positive multiple of bands ($bands); rewrite skipped")
      return None
    }
    if (!groupable(left) || !groupable(right)) return None
    val conjuncts = splitConjunctivePredicates(cond)
    if (hasEquiConnector(conjuncts, left, right)) return None
    val pair = conjuncts
      .flatMap(cosineThreshold).flatMap { case (x, y) =>
        if (x.references.subsetOf(left.outputSet) &&
          y.references.subsetOf(right.outputSet)) Some((x, y))
        else if (y.references.subsetOf(left.outputSet) &&
          x.references.subsetOf(right.outputSet)) Some((y, x))
        else None
      }.headOption
    pair.map { case (lEmb, rEmb) =>
      val width = planes / bands
      def banded(side: LogicalPlan, emb: Expression) = {
        val df = PlanBridge.ofRows(spark, side)
        val embCol =
          org.apache.spark.sql.graftbridge.ColumnBridge.column(emb)
        val sig = Similarity.lshSignature(embCol, planes, dim)
        // a NULL embedding can never satisfy cosine >= t (> 0): the
        // original plan filters such rows out, so drop them BEFORE the
        // signature whose dim guard would otherwise raise on size(NULL)
        df.filter(embCol.isNotNull)
          .withColumn(Sig, sig)
          .select(col("*"), posexplode(array((0 until bands).map(b =>
            substring(col(Sig), b * width + 1, width)): _*))
            .as(Seq(BandIdx, BandKey)))
          .drop(Sig)
      }
      // equi-join on (band index, band key): a hash-partitioned shuffle on
      // the band key — never a cartesian. Pairs that matched in several
      // bands are collapsed with a group-by-all-columns Aggregate (emitted
      // directly: Deduplicate would not be lowered this late in the
      // optimizer); the full original predicate then rescores candidates
      // exactly.
      val joined = PlanBridge.analyzed(
        banded(left, lEmb)
          .join(banded(right, rEmb), Seq(BandIdx, BandKey))
          .drop(BandIdx, BandKey))
      val dedup = org.apache.spark.sql.catalyst.plans.logical.Aggregate(
        joined.output, joined.output.map(a => a: NamedExpression), joined)
      val out = (left.output ++ right.output).map(a => a: NamedExpression)
      Project(out, Filter(cond, dedup))
    }
  }
}
