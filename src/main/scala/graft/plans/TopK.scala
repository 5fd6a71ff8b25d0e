package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Distributed per-key top-k without shuffling the fact table.
  *
  * The textbook plan — `row_number() OVER (PARTITION BY key ORDER BY v)`
  * then `rank <= k` — shuffles EVERY row to its key's reducer and sorts
  * there, just to throw all but k away. At 100 TB that shuffle is the
  * bottleneck. This operator instead aggregates with a bounded-heap
  * collector (Catalyst's `CollectTopK`, an ObjectHashAggregate): the
  * map-side partial keeps at most k rows per key per partition, so the
  * shuffle carries ≤ k·partitions rows per key instead of all of them —
  * the same two-phase trick `TakeOrderedAndProject` plays for global
  * top-k, generalized per key.
  *
  * Ordering is the lexicographic struct order over `order` columns (all
  * one direction; mix directions by negating numeric columns). Include a
  * unique tiebreak so ties cannot make results nondeterministic. Ranks are
  * recovered by sorting the ≤k-element array — O(k log k) driver-free
  * post-processing, never a window.
  */
object TopK {

  /** Rows in the top-k of their (keys) group by `order`, with a `rank`
    * column 1..k. Output columns = input columns + rank. */
  def topKPerKey(
      df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
      descending: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    require(order.nonEmpty, "need at least one ordering column")
    val rowStruct = struct(df.columns.map(col): _*).as("_row")
    val sortKey = struct(order :+ (rowStruct: Column): _*)
    // CollectTopK's `reverse=false` keeps the k LARGEST under the child
    // ordering (verified against the window-rank reference in TopKSpec)
    val collect = ColumnBridge.collectTopK(
      ColumnBridge.expression(sortKey), k, reverse = !descending)
    df.groupBy(keys.map(col): _*)
      .agg(collect.as("_top"))
      .select(posexplode(sort_array(col("_top"), asc = !descending))
        .as(Seq("_pos", "_e")))
      .select(df.columns.map(c => col(s"_e._row.$c")) :+
        (col("_pos") + 1).cast("int").as("rank"): _*)
  }
}
