package graft.dml.events

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Engine-record type for the event log (typed Dataset surface per SURVEY
  * §1.4 — user data stays DataFrame, the engine's own records are typed). */
final case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

/** Event layer (SURVEY §2.1 S6/S12, §2.7): PUBLISH/SUBSCRIBE over an
  * append-only events table plus WHEN-rule dispatch.
  *
  * The reference specifies pub/sub as durable local log + async propagation
  * (EXTENSIONS.md:194-224) and WHEN … THEN reactive workflows
  * (DSL.md:123-143). Spark-native realization: the log is an append-only
  * parquet directory; batch subscribers filter it, live subscribers run
  * Structured Streaming over the same directory (file source tails new
  * files); rules dispatch inside foreachBatch.
  */
object Events {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
}

final class EventBus(spark: SparkSession, path: String) {
  import spark.implicits._

  /** PUBLISH EVENT 'type' WITH PAYLOAD {...} (S12) — appends one file;
    * at scale publishers batch events and append partitioned files. */
  def publish(
      eventType: String, payload: Map[String, String] = Map.empty,
      value: Double = 0.0, userId: Long = -1L): Unit = {
    val props = payload.map { case (k, v) =>
      s"${graft.dml.PyJson.dumpString(k)}: ${graft.dml.PyJson.dumpString(v)}"
    }.mkString("{", ", ", "}")
    Seq((System.nanoTime(), new java.sql.Timestamp(System.currentTimeMillis()),
      userId, eventType, value, props))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(path)
  }

  /** SUBSCRIBE TO 'pattern' (batch): SQL LIKE pattern over the log. */
  def subscribe(pattern: String): DataFrame =
    spark.read.schema(Events.schema).parquet(path)
      .filter(col("event_type").like(pattern))

  /** Typed view of the same subscription (Dataset[Event] via the
    * case-class Encoder). */
  def subscribeTyped(pattern: String): org.apache.spark.sql.Dataset[Event] =
    subscribe(pattern).as[Event]

  /** Live subscription: Structured Streaming over the log directory. */
  def subscribeStream(pattern: String): DataFrame =
    spark.readStream.schema(Events.schema).parquet(path)
      .filter(col("event_type").like(pattern))

  /** Custom streaming state via mapGroupsWithState (brief:
    * "KeyValueGroupedDataset.mapGroupsWithState for custom state"): a
    * running per-user (count, value-total) that survives across
    * micro-batches. State size is bounded by the user-key cardinality. */
  def statefulUserTotals(pattern: String)
      : org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    subscribeStream(pattern).as[Event]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Event],
         state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          val batch = events.toSeq
          val updated = (n0 + batch.size, v0 + batch.map(_.value).sum)
          state.update(updated)
          (user, updated._1, updated._2)
      }
  }

  /** Metrics materialized view, streaming form (DISTRIBUTED.md:626-654):
    * watermarked tumbling-window counts/sums per event type. Late events
    * beyond the watermark are dropped; state is bounded by
    * (windows in flight × event types). */
  def windowedMetricsStream(
      windowDuration: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    spark.readStream.schema(Events.schema).parquet(path)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_sum"))
}

/** WHEN EVENT 'type' WHERE cond THEN action (S6). */
final case class WhenRule(
    name: String,
    eventTypePattern: String,
    condition: Column,
    action: DataFrame => Unit)

final class RuleEngine(rules: Seq[WhenRule]) {

  /** Dispatch rules against a batch of events; returns fired-rule names
    * with match counts. Each rule is one filter over the batch — rules
    * share the scan via the DataFrame cache. */
  def dispatchBatch(events: DataFrame): Map[String, Long] = {
    val cached = events.cache()
    try rules.flatMap { r =>
      val hits = cached
        .filter(col("event_type").like(r.eventTypePattern))
        .filter(r.condition)
      val n = hits.count()
      if (n > 0) { r.action(hits); Some(r.name -> n) } else None
    }.toMap
    finally { cached.unpersist(); () }
  }

  /** Streaming dispatcher: rules evaluated per micro-batch. */
  def runStream(
      events: DataFrame,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(1000L)): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dispatchBatch(batch); ()
      }
      .start()
}
