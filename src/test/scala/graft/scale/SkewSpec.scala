package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Salted aggregation/join must be result-identical to the direct plans —
  * only the shuffle layout changes. */
class SkewSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  test("salted sum/count equals direct aggregation") {
    val s = spark
    val direct = s.table("lineitem")
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(28,8)")).cast("double")
        .as("l_quantity_sum"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(
      s.table("lineitem"), Seq("l_returnflag"), "l_quantity", salts = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted sum/count with a deterministic saltCols id equals direct " +
    "aggregation and still spreads a constant-measure hot group") {
    val s = spark
    import s.implicits._
    // hot group: one key, constant measure — content hashing would
    // collapse it; the unique id column must spread it
    val hot = (1L to 4000L).map(i => (i, "k", 1.0)).toDF("id", "g", "v")
    val direct = hot.groupBy("g")
      .agg(sum(col("v").cast("decimal(28,8)")).cast("double")
        .as("v_sum"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedSumCount(hot, Seq("g"), "v", salts = 8,
      saltCols = Seq("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted == direct)
    // the deterministic salt genuinely spreads: every salt bucket holds
    // a fraction of the hot group, none holds it whole
    val buckets = hot.withColumn("_s",
        pmod(xxhash64(col("id")), lit(8)))
      .groupBy("_s").count().collect().map(_.getLong(1))
    assert(buckets.length == 8 && buckets.max < 4000L)
  }

  test("salted join equals direct join") {
    val s = spark
    val fact = s.table("orders").select("o_orderkey", "o_custkey")
    val dim = s.table("customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val direct = fact.join(dim, "o_custkey").count()
    val salted = Skew.saltedJoin(fact, dim, "o_custkey", salts = 8).count()
    assert(salted == direct)
  }

  test("streaming dedup with watermark drops replayed events") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdedup-ckpt").toString
    // replay the fixture log twice — at-least-once delivery
    s.table("events").limit(200).write.mode("append").parquet(dir)
    s.table("events").limit(200).write.mode("append").parquet(dir)
    val deduped = s.readStream
      .schema(graft.dml.events.Events.schema).parquet(dir)
      .withWatermark("ts", "24 hours")
      .dropDuplicates("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(s.table("dedup_out").count() == 200)
    assert(s.table("dedup_out").select("event_id").distinct().count() == 200)
  }
}
