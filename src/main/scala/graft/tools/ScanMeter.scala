// Input-work meter: runs named catalog entries and reports TOTAL records
// and bytes read from sources across all tasks — the ground truth for
// "how many corpus passes did this plan actually run" that neither the
// static explain (which shows duplicated lineage AQE may dedupe at
// runtime) nor the final adaptive plan string (whose stage-reuse
// rendering is ambiguous) answers reliably.
// Run: sbt "runMain graft.tools.ScanMeter /root/testdata/sf0.01 q_x ..."
package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

object ScanMeter {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val records = new AtomicLong(0L)
    val bytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          records.addAndGet(m.inputMetrics.recordsRead)
          bytes.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    })
    names.foreach { name =>
      records.set(0L); bytes.set(0L)
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      // listener events are posted asynchronously; give the bus a
      // moment to drain (the public API has no waitUntilEmpty)
      Thread.sleep(1500)
      println(f"[scanmeter] $name%-24s recordsRead=${records.get}%,d " +
        f"bytesRead=${bytes.get}%,d")
      graft.llm.PipelineCaches.clear()
    }
    spark.stop()
  }
}
