// Production-scale evidence for the unigram EM+prune trainer (r15
// verdict task 3): seedSize 2000 → vocabSize 512 — the fixture entries
// run at seed 60/vocab 40, which cannot exercise a realistic substring
// space because the fixture corpus has ~31 distinct words (max length
// 8). The probe diversifies the token space with synthetic md5-hex
// words (3–7 chars over a 16-char alphabet → tens of thousands of
// distinct ≤4-char pieces — the LrBucketsProbe discipline), so seeding
// genuinely selects 2000 of ~65k candidates through the distributed
// TakeOrderedAndProject and each EM round's ¾-prune works a
// production-sized vocabulary. Prints wall time (each of `reps` runs)
// + the final piece count. Run at sf0.1 and the ScaleUp-tiled sf1 dir
// for the 10×-rows curve (only the corpus passes scale; the per-round
// driver state stays vocabulary-bounded).
// Run: sbt "runMain graft.tools.UnigramProbe"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object UnigramProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.Tables.register(spark, dir)
    val docs = spark.table("documents").select(col("doc_id"),
      concat_ws(" ", (0 until 8).map(j =>
        substring(md5(concat(col("doc_id").cast("string"),
          lit("_" + j))), 1, 3 + j % 5)): _*).as("text"))
    val reps = 3
    val times = (1 to reps).map { _ =>
      graft.llm.PipelineCaches.clear()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val m = graft.llm.Unigram.train(spark, docs, maxPieceLen = 4,
        seedSize = 2000, iters = 2, vocabSize = 512)
      val n = m.pieces.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    println(f"[unigram] dir=$dir seed=2000 vocab=512 iters=2 " +
      f"pieces=${times.head._2}%d " +
      times.map(t => f"${t._1}%.3f").mkString(" "))
    spark.stop()
  }
}
