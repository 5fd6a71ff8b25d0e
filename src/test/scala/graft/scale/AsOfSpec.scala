package graft.scale

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** As-of join semantics: inclusive (<=) matching, latest-wins, left-join
  * nulls, key isolation — pinned on a hand-computable fixture, then
  * cross-checked against a window-free reference computation on events. */
class AsOfSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before each left row") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),
      (2L, ts("2024-01-01 09:00:00"), "c"), // before any right row: null
      (3L, ts("2024-01-01 10:00:00"), "d")  // key with no right rows at all
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 20.0), // equal ts: inclusive match
      (1L, ts("2024-01-01 11:00:00"), 30.0),
      (2L, ts("2024-01-01 11:00:00"), 99.0)
    ).toDF("k", "rt", "rv")

    val out = AsOf.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getLong(0), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))

    assert(out.toSeq == Seq(
      (1L, "a", Some(20.0)), // equal-ts right row matches (<=)
      (1L, "b", Some(30.0)), // latest of the three, not first
      (2L, "c", None),       // right rows exist but only later
      (3L, "d", None)))      // no right rows for the key
  }

  test("as-of join agrees with a per-row max-filter reference on events") {
    val s = spark
    val e = s.table("events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"))
    val fast = AsOf.asOfJoin(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("click_id"))

    // reference: plain (quadratic) join + greatest-prior aggregation
    val ref = purchases.join(
        clicks.withColumnRenamed("ts", "c_ts"), Seq("user_id"), "left")
      .filter(col("c_ts").isNull || col("c_ts") <= col("ts"))
      .groupBy("event_id")
      .agg(max(struct(col("c_ts"), col("click_id")))("click_id")
        .as("click_id"))

    val fastMap = fast.select("event_id", "click_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val refRows = ref.collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // the reference's left join drops only-null groups differently; compare
    // on the purchase set, treating absent as None
    val allIds = purchases.select("event_id").collect().map(_.getLong(0))
    assert(allIds.nonEmpty)
    allIds.foreach { id =>
      assert(fastMap.getOrElse(id, None) == refRows.getOrElse(id, None),
        s"mismatch for purchase $id")
    }
  }
}
