package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted-skew before/after probe for the salted-join treatment
  * (r13 verdict task 3): runs the q_salted_join construction PLAIN and
  * SALTED over the sf dir with AQE skew handling and broadcast joins
  * disabled (so both paths shuffle like a 100 TB sort-merge join would)
  * and prints wall time plus the max per-task shuffle-read records —
  * the quantity salting exists to cap. Run:
  * sbt "runMain graft.tools.SkewProbe [sfDir]"
  *
  * `diag` mode (r17 — sampled-diagnosis evidence): A/Bs the PLAN-TIME
  * diagnosis cost, exact vs `sampleRate = 0.01`, on a
  * HIGH-CARDINALITY key (event_id, ~unique, with a planted hot key) —
  * the shape where the exact diagnosis genuinely hurts at 100 TB: with
  * ~n distinct keys, map-side combine cannot shrink the count tables,
  * so the exact plan shuffles ~2n count rows while the sampled plan
  * shuffles ~2n·rate. (On LOW-cardinality keys — the q_salted_join
  * fixture's ≤501 — the exact diagnosis is already combine-crushed and
  * sampling buys nothing; the probe prints both so the tradeoff is on
  * record.) Run: sbt "runMain graft.tools.SkewProbe [sfDir] diag" */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.Tables.register(spark, dir)
    val e = spark.table("events").select(col("event_id"),
      when(col("event_id") % 3 === 0, 0L)
        .otherwise(pmod(col("user_id"), lit(500L)) + 1L).as("k"),
      col("value"))
    val r = e.groupBy("k").agg(count(lit(1)).cast("bigint").as("n_r"))
    val maxRead = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          maxRead.updateAndGet(m => math.max(m,
            t.taskMetrics.shuffleReadMetrics.recordsRead))
    }
    spark.sparkContext.addSparkListener(listener)
    def measure(label: String)(body: => Unit): Unit = {
      // warm once so codegen/scan caching charges neither variant
      body
      maxRead.set(0L)
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      var last = -1L; var spins = 0
      while (maxRead.get != last && spins < 40) {
        last = maxRead.get; spins += 1; Thread.sleep(250)
      }
      println(f"[skewprobe] $label%-8s wall ${wall}%.3f s  " +
        f"max-task-shuffle-read ${maxRead.get}%d records")
    }
    if (args.length > 1 && args(1) == "diag") {
      // high-cardinality diagnosis A/B: ~unique keys + a planted hot key
      // on each side; the exact count-table join shuffles ~2n rows, the
      // sampled one ~2n x rate
      val big = spark.table("events").select(
        when(col("event_id") % 3 === 0, 0L).otherwise(col("event_id"))
          .as("k"),
        col("user_id"), col("value"))
      val dim = spark.table("events").select(
        when(col("event_id") % 5 === 0, 0L).otherwise(col("event_id"))
          .as("k"),
        col("ts"))
      val target = 20000L
      def show(label: String)(plan: => org.apache.spark.sql.DataFrame)
          : Unit = {
        plan.collect() // warm: scan caches + codegen charge neither side
        maxRead.set(0L)
        val t0 = System.nanoTime()
        val rows = plan.collect()
        val wall = (System.nanoTime() - t0) / 1e9
        var last = -1L; var spins = 0
        while (maxRead.get != last && spins < 40) {
          last = maxRead.get; spins += 1; Thread.sleep(250)
        }
        val hot = rows.filter(_.getLong(4) >= 2L).map(r =>
          s"${r.getLong(0)}->salt${r.getLong(4)}").mkString(" ")
        println(f"[skewprobe] diag-$label%-12s wall ${wall}%.3f s  " +
          f"max-task-shuffle-read ${maxRead.get}%d records  hot: $hot")
      }
      show("exact") {
        graft.plans.JoinSkew.saltingPlanMulti(big, dim, Seq("k"),
          target, topN = 5, preserved = true)
      }
      show("sampled-0.01") {
        graft.plans.JoinSkew.saltingPlanSampled(big, dim, Seq("k"),
          target, topN = 5, sampleRate = 0.01)
      }
      spark.stop()
      return
    }
    measure("plain") {
      e.join(r, Seq("k")).write.format("noop").mode("overwrite").save()
    }
    measure("salted") {
      graft.plans.JoinSkew.saltedJoin(e, r, "k",
        targetRows = 200L, topN = 5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
