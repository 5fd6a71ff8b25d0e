package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Join-skew diagnostic card — the planning read a 100 TB engineer wants
  * BEFORE running a many-to-many join: per hot key, how many rows each
  * side carries and how many output rows that key alone will generate
  * (`n_left × n_right` — the quantity that decides between a plain
  * shuffle join, AQE skew splitting, and salting), plus a NULL-key total
  * row with the exact total output size and the top-N keys' share of it.
  * A join whose top-20 keys own 80% of the output is a salting
  * candidate; one whose total dwarfs both inputs is a blowup about to
  * happen.
  *
  * Exact, not sampled: both sides reduce to key-count tables first
  * (map-side combined), so the whole card costs two partial aggs + a
  * key-keyed join of two count relations — never the data join itself.
  * All arithmetic is integer; the only ratio is the final share.
  */
object JoinSkew {

  /** The actionable half of [[joinSkewCard]]: per hot key, the SALT
    * factor that caps its join output at `targetRows` per task —
    * salt = ceil(out_rows / targetRows), integer arithmetic
    * ((out + target − 1) div target). Keys with salt 1 need nothing;
    * the ones above are exactly the keys a salted-join rewrite (or
    * AQE's skew split, whose thresholds this card lets you SET) must
    * replicate. Same count-table-only cost envelope as the skew card.
    */
  def saltingPlan(left: DataFrame, right: DataFrame, keyCol: String,
      targetRows: Long, topN: Int = 20): DataFrame = {
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    joinSkewCard(left, right, keyCol, topN)
      .filter(!col("is_total"))
      .select(col("key"), col("n_left"), col("n_right"), col("out_rows"),
        expr(s"(out_rows + ${targetRows}L - 1) div ${targetRows}L")
          .cast("bigint").as("salt"))
  }

  /** [[saltingPlan]] for PRESERVED-side joins (left outer / semi /
    * anti): prices each key at `greatest(out_rows, n_left)` and ranks
    * hot keys by that price. `out_rows = n_left × n_right` is the
    * right price only for INNER joins — a hot PROBE key that is
    * MISSING from the other side (the dominant production anti shape:
    * a pathological key that is NOT in the blocklist) has out_rows 0,
    * yet its n_left rows still pile on one shuffle partition (and a
    * left-outer join even EMITS all of them null-filled). Pricing by
    * the max of join output and the preserved pile makes exactly those
    * keys salt; ranking by the same price keeps them inside topN,
    * where out_rows-ranked selection would sort them last. Same
    * count-table-only cost envelope as [[saltingPlan]]. */
  def saltingPlanPreserved(left: DataFrame, right: DataFrame,
      keyCol: String, targetRows: Long, topN: Int = 20): DataFrame = {
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val priced = keyCounts(left, right, keyCol)
      .withColumn("_price", greatest(col("out_rows"), col("n_left")))
    priced.orderBy(col("_price").desc, col("key").asc_nulls_last)
      .limit(topN)
      .select(col("key"), col("n_left"), col("n_right"), col("out_rows"),
        expr(s"(_price + ${targetRows}L - 1) div ${targetRows}L")
          .cast("bigint").as("salt"))
  }

  /** NULL-key semantics (round-14 advice fix): a genuine NULL join key
    * is a first-class skew row — both sides' NULL groups pair
    * null-safely (an equi-join would split them into two phantom rows
    * with out_rows 0, double-counting the totals). Its `out_rows` is
    * reported as n_left × n_right even though an EQUI-join emits zero
    * rows for NULLs, because the skew question this card answers — how
    * many rows land on one shuffle partition — is exactly that product
    * for a null-safe (`<=>`) join and still n_left + n_right of scan
    * skew for an equi-join. The summary row is marked by a dedicated
    * `is_total` column, never by `key IS NULL`. */
  /** Shared per-key count relation: (key, n_left, n_right, out_rows)
    * via two map-side-combined aggregations and one full NULL-SAFE
    * count-table join — keys living on one side only still belong in
    * the totals (they cost scan+shuffle even though they emit
    * nothing), and the NULL key groups of the two sides must meet in
    * ONE row, not two. */
  private def keyCounts(left: DataFrame, right: DataFrame,
      keyCol: String): DataFrame = {
    val cl = left.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("_cl"))
    val cr = right.groupBy(col(keyCol).as("_kr"))
      .agg(count(lit(1)).as("_cr"))
    cl.join(cr, col("key") <=> col("_kr"), "full")
      .select(coalesce(col("key"), col("_kr")).as("key"),
        coalesce(col("_cl"), lit(0L)).cast("bigint").as("n_left"),
        coalesce(col("_cr"), lit(0L)).cast("bigint").as("n_right"))
      .withColumn("out_rows",
        (col("n_left") * col("n_right")).cast("bigint"))
  }

  def joinSkewCard(left: DataFrame, right: DataFrame, keyCol: String,
      topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val j = keyCounts(left, right, keyCol)
    val totals = j.agg(
      sum("n_left").cast("bigint").as("n_left"),
      sum("n_right").cast("bigint").as("n_right"),
      sum("out_rows").cast("bigint").as("out_rows"))
    // NULLS LAST so a NULL data key ranks deterministically in BOTH
    // engines (Spark asc defaults nulls-first, DuckDB nulls-last)
    val top = j.orderBy(col("out_rows").desc,
      col("key").asc_nulls_last).limit(topN)
    val topRows = top.crossJoin(broadcast(totals
        .select(col("out_rows").as("_tot"))))
      .select(col("key"), lit(false).as("is_total"),
        col("n_left"), col("n_right"), col("out_rows"),
        when(col("_tot") === 0, lit(null).cast("double"))
          .otherwise(round(col("out_rows").cast("double") /
            col("_tot").cast("double"), 6)).as("out_share"))
    // the summary row: exact totals, and out_share = the top-N keys'
    // cumulative share of the join output (the concentration number
    // that decides the salting question)
    val summary = totals.crossJoin(broadcast(top.agg(
        sum("out_rows").cast("bigint").as("_topsum"))))
      .select(lit(null).cast(topRows.schema("key").dataType).as("key"),
        lit(true).as("is_total"),
        col("n_left"), col("n_right"), col("out_rows"),
        when(col("out_rows") === 0, lit(null).cast("double"))
          .otherwise(round(col("_topsum").cast("double") /
            col("out_rows").cast("double"), 6)).as("out_share"))
    topRows.unionByName(summary)
  }

  /** The salting TREATMENT for [[saltingPlan]]'s diagnosis — a salted
    * equi-join that is RESULT-IDENTICAL to
    * `left.join(right, Seq(keyCol), joinType)` for `joinType` inner,
    * left-outer, left-semi, or left-anti (see [[normalizeJoinType]]
    * for why exactly those four; the same diagnosis→treatment
    * pairing as `embTopPc`→`abttTransform`): hot keys' LEFT rows are
    * split across `salt` sub-keys and the RIGHT rows replicated once
    * per sub-key, so no single shuffle partition ever receives more
    * than ~targetRows of one key's join output; every other key flows
    * through the plain join path untouched, and the two paths union.
    *
    * `plan` = (key, salt) rows, normally [[saltingPlan]]'s output
    * (computed ONCE per recurring join at 100 TB and reused — hence the
    * explicit-plan primary form). Only rows with salt ≥ 2 get the
    * treatment; the plan relation must stay hot-key-bounded (topN rows)
    * because it broadcasts to both sides and multiplies the right side
    * by its salt factor.
    *
    * Row-to-sub-key assignment is `pmod(xxhash64(every left column),
    * salt)` — DETERMINISTIC in the row's full payload, never in its
    * arrival order. This matters under failure: a nondeterministic
    * assignment (round-robin over `monotonically_increasing_id()`)
    * feeding a shuffle partition key can change a row's salt between a
    * map stage's original run and its post-fetch-failure recompute,
    * duplicating or dropping hot-key rows — the classic
    * nondeterministic-repartition hazard, unacceptable for the 100 TB
    * production joins this operator targets where stage retries are
    * routine. Hot-key rows are near-identical in the KEY by definition
    * but almost always differ in some payload column (an id, a
    * timestamp), so the full-row hash still spreads them; rows that
    * are byte-identical across EVERY column co-locate — set
    * `roundRobinSalt = true` to trade that residual pile-up risk for
    * the stage-retry exposure above (documented fallback, only for
    * pipelines that disable stage retries or checkpoint the left
    * side). Columns containing MapType anywhere in their type are
    * excluded from the hash (Spark forbids hashing maps, recursively),
    * and a left side with NO non-key hashable payload falls back to
    * round-robin automatically — a salt hashed from the key alone is
    * constant per hot key, which would pay right-side replication for
    * zero spreading. The assignment affects only WHERE a row is
    * processed, never the joined output.
    *
    * NULL join keys take the cold path, where a NULL key matches
    * nothing exactly as in the plain join: they vanish under
    * inner/semi, null-fill once under left-outer, and are KEPT under
    * left-anti. Scale shape: two broadcast
    * tag joins (plan ≤ topN rows), the cold shuffle join, and the hot
    * shuffle join on (key, _salt) — no new corpus-sized shuffles beyond
    * the join being treated. */
  /** xxhash64 rejects MapType anywhere in a column's type tree (its
    * own check recurses), so the salt-column filter must too. */
  private def containsMap(dt: org.apache.spark.sql.types.DataType)
      : Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: org.apache.spark.sql.types.StructType =>
      s.fields.exists(f => containsMap(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType =>
      containsMap(a.elementType)
    case _ => false
  }

  private def validateSaltedJoin(left: DataFrame, right: DataFrame,
      keyCol: String, semiLike: Boolean = false): Unit = {
    val lcols = left.columns.toSeq
    val rcols = right.columns.toSeq.filterNot(_ == keyCol)
    require(lcols.contains(keyCol) && right.columns.contains(keyCol),
      s"both sides need the join key column '$keyCol'")
    // semi/anti drop ALL right payload before any select, so a payload
    // name shared across sides is impossible by construction there —
    // the guard would spuriously reject joins the plain
    // left.join(right, Seq(key), "left_semi") accepts
    require(semiLike || lcols.intersect(rcols).isEmpty,
      s"non-key columns must not collide across sides, got " +
        s"${lcols.intersect(rcols).mkString(", ")}")
    require(!lcols.contains("_salt") && !rcols.contains("_salt"),
      "saltedJoin reserves the _salt column name")
  }

  /** Normalized join type for the salted decomposition: "inner",
    * "left" (LEFT OUTER), "left_semi", or "left_anti". These are
    * exactly the types for which the decomposition is sound — the LEFT
    * side is the salted (split) side and the RIGHT side is replicated
    * per salt, so replicated rows may never emit rows of their own:
    * an inner join emits only matches; left outer / semi / anti
    * preserve only the (unreplicated) left side, whose rows each live
    * in exactly ONE (key, salt) bucket that the right replication
    * covers — so a left row's match set equals the plain join's
    * (outer: an unmatched row null-fills exactly once; semi: it emits
    * iff the right side holds its key, because the replication puts
    * the key's right rows in EVERY salt bucket; anti: the complement,
    * same argument). RIGHT/FULL outer would preserve the REPLICATED
    * side: an unmatched hot-key right row appears once per salt
    * replica and would null-fill `salt` times. A right-outer caller
    * flips sides first (the [[graft.plans.SkewJoinRewrite]]
    * treatment); full outer has no sound salted form under replication
    * and is refused. */
  private def normalizeJoinType(joinType: String): String =
    joinType.toLowerCase.replace("_", "") match {
      case "inner" => "inner"
      case "left" | "leftouter" => "left"
      case "semi" | "leftsemi" => "left_semi"
      case "anti" | "leftanti" => "left_anti"
      case other => throw new IllegalArgumentException(
        s"saltedJoin supports inner, left-outer, left-semi, and " +
          s"left-anti joins, got '$other' (right outer: flip the " +
          "sides; full outer: the replicated side would null-fill " +
          "once per salt replica — unsupported)")
    }

  def saltedJoin(left: DataFrame, right: DataFrame, keyCol: String,
      plan: DataFrame, roundRobinSalt: Boolean = false,
      joinType: String = "inner"): DataFrame = {
    val jt = normalizeJoinType(joinType)
    // semi/anti emit ONLY the left side; the right contributes just its
    // key to the existence test, so its payload never rides the shuffle
    val semiLike = jt == "left_semi" || jt == "left_anti"
    validateSaltedJoin(left, right, keyCol, semiLike)
    val lcols = left.columns.toSeq
    val rcols =
      if (semiLike) Seq.empty
      else right.columns.toSeq.filterNot(_ == keyCol)
    val outCols = (lcols ++ rcols).map(col)
    // materialize the ≤topN-row plan ONCE as bounded driver metadata
    // (the seed/centroid-table convention): it is consumed by two tag
    // joins, and leaving it lazy would re-run the two side aggregations
    // per consumer and drag the skew-card lineage (with its deliberate
    // 1-row cross joins) into every executed salted-join plan
    val keyType = left.schema(keyCol).dataType
    val hotRows = plan
      .filter(col("salt") >= 2L && col("key").isNotNull)
      .select(col("key").cast(keyType).as("_sk"),
        col("salt").cast(LongType).as("_sf"))
      .collect().toSeq
    if (hotRows.isEmpty) return left.join(right, Seq(keyCol), jt)
    val spark = left.sparkSession
    val hot = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(hotRows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_sk", keyType),
        org.apache.spark.sql.types.StructField("_sf", LongType)))))
    val lTag = left.join(hot, col(keyCol) === col("_sk"), "left")
    val rTag = right.join(hot, col(keyCol) === col("_sk"), "left")
    val coldJoin = lTag.filter(col("_sf").isNull)
      .select(lcols.map(col): _*)
      .join(rTag.filter(col("_sf").isNull)
        .select((keyCol +: rcols).map(col): _*), Seq(keyCol), jt)
    // hash only hashable columns — xxhash64 rejects MapType RECURSIVELY
    // (map inside struct/array too), so the filter must recurse. A salt
    // hashed from the KEY alone is constant per hot key (zero spread,
    // right-side replication for nothing), so when no non-key hashable
    // payload exists the fallback is round-robin — the documented
    // stage-retry exposure beats a silently degenerate treatment.
    val hashable = lcols.filterNot(c => containsMap(left.schema(c).dataType))
    val saltAssign =
      if (roundRobinSalt || hashable.forall(_ == keyCol))
        pmod(monotonically_increasing_id(), col("_sf"))
      else pmod(xxhash64(hashable.map(col): _*), col("_sf"))
    val hotJoin = lTag.filter(col("_sf").isNotNull)
      .withColumn("_salt", saltAssign)
      .select((lcols.map(col) :+ col("_salt")): _*)
      .join(rTag.filter(col("_sf").isNotNull)
          .withColumn("_salt",
            explode(sequence(lit(0L), col("_sf") - 1L)))
          .select(((keyCol +: rcols).map(col) :+ col("_salt")): _*),
        Seq(keyCol, "_salt"), jt)
    coldJoin.select(outCols: _*).unionByName(hotJoin.select(outCols: _*))
  }

  /** Convenience form: diagnose and treat in one call (fixture/test
    * scale — a recurring 100 TB join should persist the plan once via
    * [[saltingPlan]] and pass it to the primary form). */
  def saltedJoin(left: DataFrame, right: DataFrame, keyCol: String,
      targetRows: Long, topN: Int): DataFrame = {
    validateSaltedJoin(left, right, keyCol)
    saltedJoin(left, right, keyCol,
      saltingPlan(left, right, keyCol, targetRows, topN))
  }

  /** Diagnose-and-treat convenience for the preserved-side forms
    * (left outer / semi / anti — diagnosed with
    * [[saltingPlanPreserved]]'s probe-pile pricing). */
  def saltedJoin(left: DataFrame, right: DataFrame, keyCol: String,
      targetRows: Long, topN: Int, joinType: String): DataFrame = {
    val jt = normalizeJoinType(joinType)
    validateSaltedJoin(left, right, keyCol,
      jt == "left_semi" || jt == "left_anti")
    val plan =
      if (jt == "inner") saltingPlan(left, right, keyCol, targetRows, topN)
      else saltingPlanPreserved(left, right, keyCol, targetRows, topN)
    saltedJoin(left, right, keyCol, plan,
      roundRobinSalt = false, joinType = joinType)
  }
}
