package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Join-skew diagnostic card: hand-computed hot keys, one-sided keys in
  * the totals, and the NULL-share guard on an empty join. */
class JoinSkewSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  test("joinSkewCard: hand-computed products, one-sided key costs " +
    "nothing in output but counts in totals, top-N truncates") {
    val s = spark
    import s.implicits._
    val left = Seq(1L, 1L, 1L, 2L).toDF("k")
    val right = Seq(1L, 2L, 2L, 3L).toDF("k")
    val rows = JoinSkew.joinSkewCard(left, right, "k", topN = 2).collect()
    val byKey = rows.filter(!_.isNullAt(0))
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    // products: key 1 -> 3*1 = 3, key 2 -> 1*2 = 2, key 3 -> 0*1 = 0
    // (excluded by topN = 2); total output 5
    assert(byKey == Map(
      1L -> ((3L, 1L, 3L, 0.6)),
      2L -> ((1L, 2L, 2L, 0.4))))
    val total = rows.find(_.isNullAt(0)).get
    assert(total.getLong(1) == 4L && total.getLong(2) == 4L,
      "one-sided key 3 still counts in the input totals")
    assert(total.getLong(3) == 5L)
    assert(total.getDouble(4) == 1.0,
      "top-2 keys own the whole join output here")
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
    val total = rows.find(_.isNullAt(0)).get
    assert(total.getLong(3) == 0L)
    assert(total.isNullAt(4), "zero-output share must be NULL, not 0/0")
    assert(rows.filter(!_.isNullAt(0)).forall(_.isNullAt(4)))
    val e = intercept[IllegalArgumentException](
      JoinSkew.joinSkewCard(left, right, "k", topN = 0))
    assert(e.getMessage.contains("topN"))
  }
}
