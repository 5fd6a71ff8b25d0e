// Scaling evidence for the logisticQuality training loop at large
// `buckets` (r14 verdict task 7): the per-iteration driver collect is
// ≤ buckets+1 rows and the broadcast weight table is re-literalized per
// step, so the question is whether 10x buckets moves wall time through
// driver/plan overhead rather than executor work. Prints per-bucket-size
// wall times for the full 5-iteration fit (min of `reps`).
// Run: sbt "runMain graft.tools.LrBucketsProbe"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object LrBucketsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.Tables.register(spark, dir)
    // diversify the token space: the fixture corpus has ~31 distinct
    // words, which would cap OCCUPIED buckets far below either setting
    // — append per-doc synthetic tokens so occupancy genuinely scales
    // with the bucket budget
    val docs = spark.table("documents").select(col("doc_id"),
      concat(col("text"), lit(" tok"), pmod(col("doc_id"), lit(4000L)),
        lit(" tok"), pmod(col("doc_id") * 7L, lit(4000L))).as("text"),
      col("source"))
    val reps = 3
    for (buckets <- Seq(256, 2560)) {
      val times = (1 to reps).map { _ =>
        graft.llm.PipelineCaches.clear()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val w = graft.llm.Curation.lrWeights(docs,
          col("source") === "src0", buckets = buckets, iters = 5)
        val n = w.count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"[lrbuckets] buckets=$buckets%-5d weights=${times.head._2}%-5d " +
        times.map(t => f"${t._1}%.3f").mkString(" "))
    }
    spark.stop()
  }
}
