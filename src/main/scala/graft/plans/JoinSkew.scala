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
      .filter(col("key").isNotNull)
      .select(col("key"), col("n_left"), col("n_right"), col("out_rows"),
        expr(s"(out_rows + ${targetRows}L - 1) div ${targetRows}L")
          .cast("bigint").as("salt"))
  }

  def joinSkewCard(left: DataFrame, right: DataFrame, keyCol: String,
      topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val cl = left.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("_cl"))
    val cr = right.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("_cr"))
    // full join: keys living on one side only still belong in the totals
    // (they cost scan+shuffle even though they emit nothing)
    val j = cl.join(cr, Seq("key"), "full")
      .select(col("key"),
        coalesce(col("_cl"), lit(0L)).cast("bigint").as("n_left"),
        coalesce(col("_cr"), lit(0L)).cast("bigint").as("n_right"))
      .withColumn("out_rows",
        (col("n_left") * col("n_right")).cast("bigint"))
    val totals = j.agg(
      sum("n_left").cast("bigint").as("n_left"),
      sum("n_right").cast("bigint").as("n_right"),
      sum("out_rows").cast("bigint").as("out_rows"))
    val top = j.orderBy(col("out_rows").desc, col("key").asc).limit(topN)
    val topRows = top.crossJoin(broadcast(totals
        .select(col("out_rows").as("_tot"))))
      .select(col("key"), col("n_left"), col("n_right"), col("out_rows"),
        when(col("_tot") === 0, lit(null).cast("double"))
          .otherwise(round(col("out_rows").cast("double") /
            col("_tot").cast("double"), 6)).as("out_share"))
    // the NULL-key summary row: exact totals, and out_share = the top-N
    // keys' cumulative share of the join output (the concentration
    // number that decides the salting question)
    val summary = totals.crossJoin(broadcast(top.agg(
        sum("out_rows").cast("bigint").as("_topsum"))))
      .select(lit(null).cast(topRows.schema("key").dataType).as("key"),
        col("n_left"), col("n_right"), col("out_rows"),
        when(col("out_rows") === 0, lit(null).cast("double"))
          .otherwise(round(col("_topsum").cast("double") /
            col("out_rows").cast("double"), 6)).as("out_share"))
    topRows.unionByName(summary)
  }
}
