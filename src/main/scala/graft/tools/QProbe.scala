package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch per-query timing probe: runs named catalog entries k times in
  * one JVM (cold cache each run) and prints every sample — used to
  * adjudicate bench regression flags against single-query floors. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_uuid_shape", "q_ts_forecast_input", "q_date_buckets")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 5).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qprobe] $name%-22s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
