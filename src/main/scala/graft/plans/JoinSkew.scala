package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  def joinSkewCard(left: DataFrame, right: DataFrame, keyCol: String,
      topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val cl = left.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("_cl"))
    val cr = right.groupBy(col(keyCol).as("_kr"))
      .agg(count(lit(1)).as("_cr"))
    // full NULL-SAFE join: keys living on one side only still belong in
    // the totals (they cost scan+shuffle even though they emit
    // nothing), and the NULL key groups of the two sides must meet in
    // ONE row, not two
    val j = cl.join(cr, col("key") <=> col("_kr"), "full")
      .select(coalesce(col("key"), col("_kr")).as("key"),
        coalesce(col("_cl"), lit(0L)).cast("bigint").as("n_left"),
        coalesce(col("_cr"), lit(0L)).cast("bigint").as("n_right"))
      .withColumn("out_rows",
        (col("n_left") * col("n_right")).cast("bigint"))
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
}
