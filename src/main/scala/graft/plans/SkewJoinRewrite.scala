package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Opt-in optimizer rule that promotes [[JoinSkew.saltedJoin]] from a
  * library call to ENGINE BEHAVIOR (r14 verdict task 2; outer joins
  * r15 task 4; semi/anti completing the soundly-decomposable set in
  * r16): an INNER / LEFT OUTER / RIGHT OUTER / LEFT SEMI / LEFT ANTI
  * equi-join whose
  * key statistics trip [[JoinSkew.saltingPlan]]'s threshold is
  * rewritten to the salted form automatically — hot keys' preserved-
  * side rows split across salt sub-keys, the other side replicated per
  * sub-key, cold keys through the plain join, the two paths unioned —
  * RESULT-IDENTICAL to the plain join (the oracle entries re-prove the
  * identity every round), without the user knowing the treatment exists.
  *
  * LEFT SEMI/ANTI are the production filter shapes (blocklist
  * anti-joins, "has-a-record" semi-filters) and decompose by the same
  * argument as left outer: the replication puts a hot key's right rows
  * in EVERY salt bucket, so each left row's existence test in its one
  * bucket equals the plain join's (anti is the complement). All
  * preserved-side joins (outer/semi/anti) diagnose with
  * [[JoinSkew.saltingPlanPreserved]] — priced and ranked by
  * `greatest(out_rows, n_preserved)`, because a hot probe key MISSING
  * from the other side (the pathological key that is NOT in the
  * blocklist) has out_rows 0 yet still piles all its rows on one
  * shuffle partition, and out_rows-only pricing would never salt it.
  *
  * LEFT OUTER is the production enrichment shape at 100 TB — a fact
  * stream left-joining a registry/dimension exactly as the reference's
  * workload-queue ⋈ model-registry enrichment joins
  * (reference/DISTRIBUTED.md:361, :584) — and it skews exactly like
  * inner (the hot key piles the same preserved-side rows on one
  * partition). The decomposition extends soundly because the SALTED
  * side is the PRESERVED side: each preserved row lives in exactly one
  * (key, salt) bucket whose right replication covers it, so its match
  * set equals the plain join's and an unmatched row null-fills exactly
  * once ([[JoinSkew]]'s normalizeJoinType proof). RIGHT OUTER is the
  * same join with the sides flipped, handled by flipping. FULL OUTER
  * is DECLINED with a documented reason: both sides are preserved, so
  * whichever side is replicated would null-fill its unmatched hot-key
  * rows once per salt replica — replication has no sound full-outer
  * form; AQE's skew-join split (which replicates nothing) is the
  * treatment there.
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
  *   - anything but INNER / LEFT OUTER / RIGHT OUTER / LEFT SEMI /
  *     LEFT ANTI with exactly one attribute=attribute equality (the
  *     salted decomposition is proven for those shapes — full outer
  *     above; AND-of-equalities keys rarely skew on the composite);
  *   - joins carrying a hint (the user already chose a strategy);
  *   - joins whose BUILD-ELIGIBLE side sits under
  *     `spark.sql.autoBroadcastJoinThreshold` (either side for inner,
  *     only the non-preserved side for outer — Spark cannot broadcast
  *     the preserved side of an outer hash join): the planner will
  *     broadcast, no shuffle on the key, so salting could only add
  *     work;
  *   - already-rewritten subtrees (internal columns carry the
  *     `__graft_skew` marker prefix), so the cold path's
  *     equi-join never re-diagnoses.
  *
  * The rewrite renames every column to a collision-proof internal name
  * before calling [[JoinSkew.saltedJoin]] (whose name guards assume
  * DataFrame usage), then projects back to the ORIGINAL attributes —
  * aliases re-binding the original exprIds, with the non-preserved
  * side's key attribute restored from a pre-join duplicate of its key
  * (equal to the merged key on every matched row, NULL on outer
  * null-filled rows — restoring from the merged key would resurrect
  * the preserved side's value there) — so parent operators never see
  * the treatment.
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
      case j @ Join(left, right,
          jt @ (Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti),
          Some(cond), hint)
          if hint == JoinHint.NONE &&
            !isRewritten(left) && !isRewritten(right) =>
        equiKey(cond, left, right) match {
          case Some((lk, rk)) if !broadcastable(jt, left, right) =>
            rewrite(jt, left, right, lk, rk).getOrElse(j)
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
    * joins + a union) could only add work. Only BUILD-ELIGIBLE sides
    * count: an outer hash join can only broadcast its non-preserved
    * side, so a small PRESERVED side does not veto the treatment. */
  private def broadcastable(jt: JoinType, left: LogicalPlan,
      right: LogicalPlan): Boolean = {
    val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    def small(p: LogicalPlan) = p.stats.sizeInBytes <= threshold
    threshold >= 0 && (jt match {
      case LeftOuter | LeftSemi | LeftAnti => small(right)
      case RightOuter => small(left)
      case _ => small(left) || small(right)
    })
  }

  private def rewrite(jt: JoinType, left: LogicalPlan,
      right: LogicalPlan, lk: Attribute, rk: Attribute)
      : Option[LogicalPlan] = {
    // orient so the SALTED (split) side is the PRESERVED side — the
    // only sound orientation under replication (object scaladoc):
    // RightOuter runs as LeftOuter with the sides flipped
    val (pl, pr, pk, prk, flipped) = jt match {
      case RightOuter => (right, left, rk, lk, true)
      case _ => (left, right, lk, rk, false)
    }
    val keyOrdinal = pl.output.indexWhere(_.exprId == pk.exprId)
    val hotRows = decideHotKeys(pl, pr, pk, prk, keyOrdinal,
      preservedPricing = jt != Inner)
    if (hotRows.isEmpty) return None

    // collision-proof internal names; the shared key name carries both
    // sides' key so saltedJoin's USING-style contract holds. The
    // non-preserved side ALSO carries a pre-join duplicate of its key:
    // the merged key holds the preserved side's value on null-filled
    // outer rows, so the original key attribute of the other side must
    // restore from a column that is genuinely NULL there.
    val k = s"${Marker}_k"
    val rkDup = s"${Marker}_rkdup"
    def name(side: String, i: Int) = s"${Marker}_${side}$i"
    val lNames = pl.output.zipWithIndex.map { case (a, i) =>
      if (a.exprId == pk.exprId) k else name("l", i) }
    val rNames = pr.output.zipWithIndex.map { case (a, i) =>
      if (a.exprId == prk.exprId) k else name("r", i) }
    val lDf = PlanBridge.ofRows(spark, pl).toDF(lNames: _*)
    val rDf = PlanBridge.ofRows(spark, pr).toDF(rNames: _*)
      .withColumn(rkDup, col(k))

    val planDf = spark.createDataFrame(
      spark.sparkContext.parallelize(hotRows, 1),
      StructType(Seq(StructField("key", pk.dataType),
        StructField("salt", LongType))))
    // the salted subtree carries broadcast() hints on its tag joins;
    // this rule runs AFTER the optimizer's own hint elimination, so the
    // ResolvedHint nodes must be folded into join hints here or they
    // reach physical planning (an INTERNAL_ERROR)
    val joinTypeStr = jt match {
      case Inner => "inner"
      case LeftSemi => "left_semi"
      case LeftAnti => "left_anti"
      case _ => "left" // LeftOuter, and RightOuter flipped above
    }
    val salted = org.apache.spark.sql.catalyst.optimizer
      .EliminateResolvedHint(PlanBridge.analyzed(
        JoinSkew.saltedJoin(lDf, rDf, k, planDf, joinType = joinTypeStr)))

    // project back to the ORIGINAL attributes: preserved-side columns
    // (key included) from the salted output's left half, the other
    // side's non-key columns from its right half, and its key from the
    // pre-join duplicate (equal to the merged key on every matched
    // row, NULL on outer null-filled rows)
    val byName = salted.output.map(a => a.name -> a).toMap
    val plRestored = pl.output.zipWithIndex.map { case (a, i) =>
      val src = if (a.exprId == pk.exprId) byName(k) else byName(name("l", i))
      Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
        : NamedExpression
    }
    // semi/anti joins output ONLY the preserved side — there are no
    // right attributes to restore (and the salted plan carries none)
    val restored =
      if (jt == LeftSemi || jt == LeftAnti) plRestored
      else {
        val prRestored = pr.output.zipWithIndex.map { case (a, i) =>
          val src = if (a.exprId == prk.exprId) byName(rkDup)
            else byName(name("r", i))
          Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
            : NamedExpression
        }
        if (flipped) prRestored ++ plRestored else plRestored ++ prRestored
      }
    Some(Project(restored, salted))
  }

  /** Run (or recall) the bounded diagnosis: (key, salt) rows with
    * salt ≥ 2 over non-NULL keys. INNER joins price by join output
    * ([[JoinSkew.saltingPlan]]); preserved-side joins (outer / semi /
    * anti) price by `greatest(out_rows, n_preserved)`
    * ([[JoinSkew.saltingPlanPreserved]]) — a hot probe key MISSING
    * from the other side has out_rows 0 yet still piles (and, for
    * outer, emits) all its preserved rows, the dominant production
    * anti/blocklist shape. The pricing mode is part of the cache
    * key. */
  private def decideHotKeys(left: LogicalPlan, right: LogicalPlan,
      lk: Attribute, rk: Attribute, keyOrdinal: Int,
      preservedPricing: Boolean): Seq[Row] = {
    val cacheKey = (left.canonicalized, right.canonicalized,
      if (preservedPricing) keyOrdinal + (1 << 16) else keyOrdinal,
      targetRows, topN)
    val cached = decided.get(cacheKey)
    if (cached != null) return cached
    val lKeys = PlanBridge.ofRows(spark, left)
      .select(org.apache.spark.sql.graftbridge.ColumnBridge.column(lk))
      .toDF("k")
    val rKeys = PlanBridge.ofRows(spark, right)
      .select(org.apache.spark.sql.graftbridge.ColumnBridge.column(rk))
      .toDF("k")
    val plan =
      if (preservedPricing)
        JoinSkew.saltingPlanPreserved(lKeys, rKeys, "k", targetRows, topN)
      else JoinSkew.saltingPlan(lKeys, rKeys, "k", targetRows, topN)
    val rows: Seq[Row] = plan
      .filter(col("salt") >= 2L && col("key").isNotNull)
      .select("key", "salt").collect().toSeq
    decided.put(cacheKey, rows)
    rows
  }
}
