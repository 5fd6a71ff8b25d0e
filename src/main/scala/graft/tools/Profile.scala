// Per-query micro-profiler: runs named catalog queries repeatedly against a
// fixture dir and prints per-run wall times, separating one-time planning /
// codegen cost (run 1) from steady-state execution (runs 2+).
// Run: sbt "runMain graft.tools.Profile /root/testdata/sf0.1 3 q_corpus_filter ..."
package graft.tools

import org.apache.spark.sql.SparkSession

object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq
    else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.register(spark, dir)
    spark.table("lineitem").groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        // same honesty rule as Bench: no serving run N from run N-1's cache
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${times.map(t => f"$t%7.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
