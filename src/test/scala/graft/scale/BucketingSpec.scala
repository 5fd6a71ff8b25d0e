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

  test("a bucketed signature index probes with zero exchange on the " +
    "index side") {
    val s = graft.SparkTestSession.withTables()
    import org.apache.spark.sql.functions._
    val d = s.table("documents").select("doc_id", "text")
    val old = d.filter(col("doc_id") % 5 =!= 4)
    val batch = d.filter(col("doc_id") % 5 === 4)
      .unionAll(d.filter(col("doc_id") % 10 === 0).select(
        (col("doc_id") + 100000L).as("doc_id"),
        expr("substring(text, 1, greatest(length(text) - 12, 1))").as("text")))

    // in-memory ground truth
    val expected = graft.llm.Dedup.incrementalCandidates(
      graft.llm.Dedup.signatureIndex(old), batch).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // index persisted bucketed on EXACTLY the candidate-join keys
    Bucketing.writeBucketed(graft.llm.Dedup.signatureIndex(old),
      "sig_index", Seq("band_idx", "band_hash"), buckets = 4)
    // AQE off for an exact (non-adaptive) plan tree to walk; broadcast off
    // so the candidate join is the sort-merge shape a corpus-scale index
    // would use (broadcast would trivially avoid all exchanges)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = graft.llm.Dedup.incrementalCandidates(
        s.table("sig_index"), batch)
      val got = probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)

      // the observable property bucketing buys: NOTHING re-partitions the
      // index scan before its join — the only exchanges sit above joins
      // (pair-row aggregates) or under batch-side inputs
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      val plan = probe.queryExecution.executedPlan
      def isIndexScan(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.tableIdentifier.exists(_.table == "sig_index")
        case _ => false
      }
      // true when a pre-join path from here reaches the index scan
      def reachesScanPreJoin(p: SparkPlan): Boolean = p match {
        case f if isIndexScan(f) => true
        case _: BaseJoinExec => false
        case other => other.children.exists(reachesScanPreJoin)
      }
      assert(plan.collect { case f if isIndexScan(f) => f }.nonEmpty,
        s"no sig_index scan in plan:\n$plan")
      val bad = plan.collect {
        case e: ShuffleExchangeExec if reachesScanPreJoin(e.child) => e
      }
      assert(bad.isEmpty,
        s"the bucketed index must reach its join without re-partitioning:\n$plan")
      assert(plan.toString.contains("SortMergeJoin"),
        "with broadcast disabled the probe join must be sort-merge")
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    graft.llm.PipelineCaches.clear()
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
