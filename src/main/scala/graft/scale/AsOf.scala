package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTs <= leftTs` for the same key (the point-in-time lookup a
  * feature-store / backtest pipeline needs; the reference's relational
  * grammar has no such operator, so this is a Spark-first extension in the
  * spirit of SURVEY §2.3 R10).
  *
  * Built the scale-safe way: instead of a range join (which Catalyst would
  * execute as a per-key cross product + filter), both sides are tagged and
  * UNIONed, then a single window pass partitioned by key and ordered by
  * (ts, side) carries the latest right payload forward onto each left row.
  * Cost is ONE hash shuffle of |L| + |R| rows and a per-partition sort —
  * no candidate explosion, skew bounded by the hottest key exactly as any
  * keyed window. Right rows sort before left rows on equal timestamps, so
  * matching is inclusive (`<=`), mirroring e.g. DuckDB's ASOF JOIN.
  *
  * Left rows with no prior right row keep a null payload (left-join
  * semantics). Determinism: ties inside the right side must be resolved by
  * the caller (pass a unique (key, ts) right side or pre-aggregate), since
  * "the" most recent row is otherwise ambiguous in any engine.
  */
object AsOf {

  /** @param payload right-side columns to carry onto matching left rows
    *                (names must not clash with left's — rename first). */
  def asOfJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      right.select(payload.map(col): _*).schema)

    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_side"),
        struct(leftCols.map(col): _*).as("_l"),
        lit(null).cast(payloadType).as("_r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_side"),
        lit(null).cast(l.schema("_l").dataType).as("_l"),
        struct(payload.map(col): _*).as("_r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        payload.map(c => col(s"_match.$c").as(c)): _*)
  }
}
