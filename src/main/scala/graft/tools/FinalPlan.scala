// Post-execution plan audit: runs named catalog entries and prints the
// FINAL adaptive plan — the one AQE actually executed, where runtime-only
// shapes (reused shuffle stages, skew-join splits, runtime broadcast
// demotions) are visible that the static formatted explain cannot show.
// Run: sbt "runMain graft.tools.FinalPlan /root/testdata/sf0.01 q_x ..."
package graft.tools

import org.apache.spark.sql.SparkSession

object FinalPlan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name (final adaptive plan) ==========")
      val df = graft.SparkEntry.queries(name)(spark, dir)
      // collect(), not a noop write: write builds a SEPARATE
      // QueryExecution, leaving df's own adaptive plan unexecuted
      // (isFinalPlan=false); collect() drives df.queryExecution itself,
      // so the printed plan is the one AQE finalized
      df.collect()
      println(df.queryExecution.executedPlan.toString)
      graft.llm.PipelineCaches.clear()
    }
    spark.stop()
  }
}
