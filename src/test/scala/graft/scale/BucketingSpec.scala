package graft.scale

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bucketed co-located joins (no shuffle exchange) and stateful streaming. */
class BucketingSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  test("bucketed join plans without a shuffle exchange") {
    val s = spark
    Bucketing.writeBucketed(
      s.table("lineitem").select("l_orderkey", "l_quantity"),
      "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(
      s.table("orders").select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_bucketed", "l_orderkey", 8)
    val joined = Bucketing.bucketedJoin(s, "li_bucketed", "ord_bucketed", "l_orderkey")
    assert(joined.count() == s.table("lineitem").count())
    assert(Bucketing.isShuffleFree(joined),
      s"expected shuffle-free plan:\n${joined.queryExecution.executedPlan}")
    // contrast: the same sort-merge join over unbucketed views DOES
    // shuffle (hint forces SMJ so the small side isn't broadcast away)
    val unbucketed = s.table("lineitem").hint("merge")
      .join(s.table("orders"),
        s.table("lineitem")("l_orderkey") === s.table("orders")("o_orderkey"))
    assert(!Bucketing.isShuffleFree(unbucketed))
  }

  test("mapGroupsWithState keeps running per-user totals across batches") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-state-ckpt").toString
    s.table("events").limit(300).write.mode("append").parquet(dir)
    val bus = new graft.dml.events.EventBus(s, dir)
    val q = bus.statefulUserTotals("%")
      .writeStream.format("memory").queryName("user_totals")
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val totals = s.table("user_totals")
    assert(totals.count() > 0)
    // state equals the batch ground truth
    import org.apache.spark.sql.functions._
    val truth = s.read.parquet(dir).groupBy("user_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = totals.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == truth)
  }
}
