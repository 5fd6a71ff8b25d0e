package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Join-skew diagnostic card: hand-computed hot keys, one-sided keys in
  * the totals, NULL join keys as first-class skew rows (round-14 advice
  * fix), and the NULL-share guard on an empty join. */
class JoinSkewSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  test("joinSkewCard: hand-computed products, one-sided key costs " +
    "nothing in output but counts in totals, top-N truncates") {
    val s = spark
    import s.implicits._
    val left = Seq(1L, 1L, 1L, 2L).toDF("k")
    val right = Seq(1L, 2L, 2L, 3L).toDF("k")
    val rows = JoinSkew.joinSkewCard(left, right, "k", topN = 2).collect()
    val byKey = rows.filter(!_.getBoolean(1))
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toMap
    // products: key 1 -> 3*1 = 3, key 2 -> 1*2 = 2, key 3 -> 0*1 = 0
    // (excluded by topN = 2); total output 5
    assert(byKey == Map(
      1L -> ((3L, 1L, 3L, 0.6)),
      2L -> ((1L, 2L, 2L, 0.4))))
    val total = rows.find(_.getBoolean(1)).get
    assert(total.isNullAt(0), "summary key stays NULL")
    assert(total.getLong(2) == 4L && total.getLong(3) == 4L,
      "one-sided key 3 still counts in the input totals")
    assert(total.getLong(4) == 5L)
    assert(total.getDouble(5) == 1.0,
      "top-2 keys own the whole join output here")
  }

  test("joinSkewCard: a genuine NULL join key on both sides is ONE " +
    "data row (null-safe pairing), distinguishable from the summary " +
    "row via is_total, and totals count it once") {
    val s = spark
    import s.implicits._
    val left = Seq(Some(1L), None, None, None).toDF("k")
    val right = Seq(Some(1L), Some(1L), None).toDF("k")
    val rows = JoinSkew.joinSkewCard(left, right, "k", topN = 5).collect()
    val nullData = rows.filter(r => r.isNullAt(0) && !r.getBoolean(1))
    assert(nullData.length == 1,
      "the two sides' NULL groups must meet in exactly one row")
    // NULL key: 3 left x 1 right -> out_rows 3 (the null-safe-join /
    // shuffle-skew read; an equi-join emits 0 rows for them)
    assert((nullData.head.getLong(2), nullData.head.getLong(3),
      nullData.head.getLong(4)) == ((3L, 1L, 3L)))
    val total = rows.find(_.getBoolean(1)).get
    assert(total.getLong(2) == 4L && total.getLong(3) == 3L,
      "totals count every input row exactly once")
    assert(total.getLong(4) == 1L * 2L + 3L * 1L)
    // salting plan keeps the NULL data key (is_total filter, not
    // key IS NOT NULL) — it is a real hot key a salted join must treat
    val plan = JoinSkew.saltingPlan(left, right, "k", targetRows = 2L)
      .collect()
    val nullPlan = plan.filter(_.isNullAt(0))
    assert(nullPlan.length == 1 && nullPlan.head.getLong(4) == 2L,
      "ceil(3/2) = 2 for the NULL hot key")
  }

  test("saltingPlan: integer-ceil salt factors at a hand target") {
    val s = spark
    import s.implicits._
    // key 1: 3*4 = 12 rows -> salt ceil(12/5) = 3; key 2: 1*5 = 5 ->
    // exactly one task; key 3: 0 output -> salt 0? no: ceil(0/5) = 0,
    // but a key with no output emits nothing to salt — verify 0
    val left = (Seq.fill(3)(1L) ++ Seq(2L) ++ Seq(3L)).toDF("k")
    val right = (Seq.fill(4)(1L) ++ Seq.fill(5)(2L)).toDF("k")
    val rows = JoinSkew.saltingPlan(left, right, "k", targetRows = 5L)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(rows == Map(1L -> 3L, 2L -> 1L, 3L -> 0L))
    val e = intercept[IllegalArgumentException](
      JoinSkew.saltingPlan(left, right, "k", targetRows = 0L))
    assert(e.getMessage.contains("targetRows"))
  }

  test("joinSkewCard: disjoint keys yield zero output and NULL shares") {
    val s = spark
    import s.implicits._
    val left = Seq(1L, 2L).toDF("k")
    val right = Seq(3L, 4L).toDF("k")
    val rows = JoinSkew.joinSkewCard(left, right, "k", topN = 3).collect()
    val total = rows.find(_.getBoolean(1)).get
    assert(total.getLong(4) == 0L)
    assert(total.isNullAt(5), "zero-output share must be NULL, not 0/0")
    assert(rows.filter(!_.getBoolean(1)).forall(_.isNullAt(5)))
    val e = intercept[IllegalArgumentException](
      JoinSkew.joinSkewCard(left, right, "k", topN = 0))
    assert(e.getMessage.contains("topN"))
  }
}
