package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Opt-in optimizer rule that promotes [[JoinSkew.saltedJoin]] from a
  * library call to ENGINE BEHAVIOR (r14 verdict task 2): an inner
  * equi-join whose key statistics trip [[JoinSkew.saltingPlan]]'s
  * threshold is rewritten to the salted form automatically — hot keys'
  * left rows split across salt sub-keys, right rows replicated per
  * sub-key, cold keys through the plain join, the two paths unioned —
  * RESULT-IDENTICAL to the plain join (the oracle entry re-proves the
  * identity every round), without the user knowing the treatment exists.
  *
  * This is statistics-driven replanning: deciding needs the per-key
  * count tables, so the rule runs the bounded diagnosis (two map-side-
  * combined key-count aggregations + their count-table join — never the
  * data join itself) EAGERLY at optimization time and caches the
  * decision per canonicalized (left, right, key) triple, so a
  * fixed-point optimizer batch diagnoses each join once, not once per
  * iteration. That blocking plan-time work is why the rule is DISABLED
  * unless `spark.graft.skewJoin.rewrite=true` — the [[CosineJoinRewrite]]
  * opt-in contract. Tuning:
  *
  *   - `spark.graft.skewJoin.targetRows` (default 5000000) — per-key
  *     join-output rows one shuffle partition may receive before the
  *     key salts ([[JoinSkew.saltingPlan]]'s targetRows)
  *   - `spark.graft.skewJoin.topN` (default 20) — hot keys considered
  *
  * Joins the rule leaves alone, each for a scale reason:
  *   - anything but INNER with exactly one attribute=attribute equality
  *     (the salted decomposition is proven for that shape; AND-of-
  *     equalities keys rarely skew on the composite);
  *   - joins carrying a hint (the user already chose a strategy);
  *   - joins where either side sits under
  *     `spark.sql.autoBroadcastJoinThreshold` (the planner will
  *     broadcast — no shuffle on the key, so salting could only add
  *     work);
  *   - already-rewritten subtrees (internal columns carry the
  *     `__graft_skew` marker prefix), so the cold path's inner
  *     equi-join never re-diagnoses.
  *
  * The rewrite renames every column to a collision-proof internal name
  * before calling [[JoinSkew.saltedJoin]] (whose name guards assume
  * DataFrame usage), then projects back to the ORIGINAL attributes —
  * aliases re-binding the original exprIds, with the right side's key
  * attribute restored from the merged key (equal by the inner-join
  * condition) — so parent operators never see the treatment.
  */
case class SkewJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val Marker = "__graft_skew"

  private def enabled: Boolean =
    spark.conf.get("spark.graft.skewJoin.rewrite", "false") == "true"
  private def targetRows: Long =
    spark.conf.get("spark.graft.skewJoin.targetRows", "5000000").toLong
  private def topN: Int =
    spark.conf.get("spark.graft.skewJoin.topN", "20").toInt

  private def isRewritten(p: LogicalPlan): Boolean =
    p.output.exists(_.name.startsWith(Marker))

  /** Decision cache: canonicalized (left, right, key ordinal,
    * targetRows, topN) → the hot-key plan rows (empty = diagnosed, no
    * salting needed). Keeps a fixed-point optimizer batch from
    * re-running the diagnosis every iteration; bounded at 64 joins (a
    * plan-shape cardinality, not a data one) by LRU eviction of the
    * eldest entry — never a whole-cache clear, so one 65th join shape
    * cannot throw away 64 warm diagnoses.
    *
    * The decision is FROZEN PER SESSION per (plan, conf) key: data
    * appended to the underlying tables within a session does not
    * re-trigger the diagnosis, so a long-lived session keeps its
    * salting decisions (possibly missing newly-hot keys or salting
    * cooled ones — a performance question only; result identity holds
    * either way because the salted decomposition is identical for any
    * plan rows). Recurring 100 TB jobs re-plan per run anyway; a
    * session that must re-diagnose can toggle the rewrite conf off/on
    * around a fresh `SparkSession.newSession()`. */
  private val decided = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[
        (LogicalPlan, LogicalPlan, Int, Long, Int), Seq[Row]](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[
            (LogicalPlan, LogicalPlan, Int, Long, Int), Seq[Row]])
          : Boolean = size() > 64
    })

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if hint == JoinHint.NONE &&
            !isRewritten(left) && !isRewritten(right) =>
        equiKey(cond, left, right) match {
          case Some((lk, rk)) if !broadcastable(left, right) =>
            rewrite(j, left, right, lk, rk).getOrElse(j)
          case _ => j
        }
    }
  }

  /** The single attribute=attribute equality connecting the two sides,
    * oriented (leftKey, rightKey); None for any other condition shape. */
  private def equiKey(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Attribute, Attribute)] = cond match {
    case EqualTo(a: AttributeReference, b: AttributeReference)
        if left.outputSet.contains(a) && right.outputSet.contains(b) =>
      Some((a, b))
    case EqualTo(b: AttributeReference, a: AttributeReference)
        if left.outputSet.contains(a) && right.outputSet.contains(b) =>
      Some((a, b))
    case _ => None
  }

  /** A side the planner will broadcast has no shuffle on the join key —
    * skew there is a non-problem and the salted decomposition (two tag
    * joins + a union) could only add work. */
  private def broadcastable(left: LogicalPlan, right: LogicalPlan)
      : Boolean = {
    val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    threshold >= 0 &&
      (left.stats.sizeInBytes <= threshold ||
        right.stats.sizeInBytes <= threshold)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      lk: Attribute, rk: Attribute): Option[LogicalPlan] = {
    val keyOrdinal = left.output.indexWhere(_.exprId == lk.exprId)
    val hotRows = decideHotKeys(left, right, lk, rk, keyOrdinal)
    if (hotRows.isEmpty) return None

    // collision-proof internal names; the shared key name carries both
    // sides' key so saltedJoin's USING-style contract holds
    val k = s"${Marker}_k"
    def name(side: String, i: Int) = s"${Marker}_${side}$i"
    val lNames = left.output.zipWithIndex.map { case (a, i) =>
      if (a.exprId == lk.exprId) k else name("l", i) }
    val rNames = right.output.zipWithIndex.map { case (a, i) =>
      if (a.exprId == rk.exprId) k else name("r", i) }
    val lDf = PlanBridge.ofRows(spark, left).toDF(lNames: _*)
    val rDf = PlanBridge.ofRows(spark, right).toDF(rNames: _*)

    val planDf = spark.createDataFrame(
      spark.sparkContext.parallelize(hotRows, 1),
      StructType(Seq(StructField("key", lk.dataType),
        StructField("salt", LongType))))
    // the salted subtree carries broadcast() hints on its tag joins;
    // this rule runs AFTER the optimizer's own hint elimination, so the
    // ResolvedHint nodes must be folded into join hints here or they
    // reach physical planning (an INTERNAL_ERROR)
    val salted = org.apache.spark.sql.catalyst.optimizer
      .EliminateResolvedHint(PlanBridge.analyzed(
        JoinSkew.saltedJoin(lDf, rDf, k, planDf)))

    // project back to the ORIGINAL attributes: left columns (key
    // included) from the salted output's left half, right non-key
    // columns from its right half, and the right key restored from the
    // merged key (equal under the inner equi-join condition)
    val byName = salted.output.map(a => a.name -> a).toMap
    val restored = (left.output.zipWithIndex.map { case (a, i) =>
      val src = if (a.exprId == lk.exprId) byName(k) else byName(name("l", i))
      Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
    }) ++ (right.output.zipWithIndex.map { case (a, i) =>
      val src = if (a.exprId == rk.exprId) byName(k) else byName(name("r", i))
      Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
    })
    Some(Project(restored, salted))
  }

  /** Run (or recall) the bounded diagnosis: [[JoinSkew.saltingPlan]]'s
    * (key, salt) rows with salt ≥ 2 over non-NULL keys. */
  private def decideHotKeys(left: LogicalPlan, right: LogicalPlan,
      lk: Attribute, rk: Attribute, keyOrdinal: Int): Seq[Row] = {
    val cacheKey = (left.canonicalized, right.canonicalized, keyOrdinal,
      targetRows, topN)
    val cached = decided.get(cacheKey)
    if (cached != null) return cached
    val lKeys = PlanBridge.ofRows(spark, left)
      .select(org.apache.spark.sql.graftbridge.ColumnBridge.column(lk))
      .toDF("k")
    val rKeys = PlanBridge.ofRows(spark, right)
      .select(org.apache.spark.sql.graftbridge.ColumnBridge.column(rk))
      .toDF("k")
    val rows: Seq[Row] = JoinSkew.saltingPlan(lKeys, rKeys, "k",
        targetRows, topN)
      .filter(col("salt") >= 2L && col("key").isNotNull)
      .select("key", "salt").collect().toSeq
    decided.put(cacheKey, rows)
    rows
  }
}
