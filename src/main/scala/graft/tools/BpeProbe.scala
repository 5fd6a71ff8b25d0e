// Measures the REAL-BUDGET BPE claim with a number: trainLocal's
// driver-local merge loop (learn_bpe's incremental structure) at a
// realistic >= 8k-merge budget costs seconds, not one Spark job per
// round. The fixture's 31-word vocabulary is crossed into ~30k compound
// trigram words (freq = the occurrence-count product — zipf-shaped, like
// a natural vocabulary) purely to give the loop a realistic vocabulary;
// the corpus-sized aggregation that produces a (word, freq) table is the
// distributed path's one scan and is timed separately by the q_bpe_*
// bench entries. Run: sbt "runMain graft.tools.BpeProbe [merges]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nMerges = if (args.nonEmpty) args(0).toInt else 8192
    graft.Tables.register(spark, dir)

    val t0 = System.nanoTime()
    val base = graft.llm.Bpe
      .initialVocab(spark.table("documents"))
      .select("word", "freq").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val tAgg = (System.nanoTime() - t0) / 1e9

    // 31 words -> 31^3 = 29,791 compound words, freq = product
    val vocab = (for {
      (wa, fa) <- base; (wb, fb) <- base; (wc, fc) <- base
    } yield (wa + wb + wc, fa * fb * fc)).toArray
    val totalChars = vocab.map(w => w._1.length.toLong).sum
    println(f"[bpeprobe] corpus agg ${tAgg}%.2fs; vocab ${vocab.length}%d " +
      f"words, $totalChars%d chars; budget $nMerges%d merges")

    val t1 = System.nanoTime()
    val model = graft.llm.Bpe.trainLocalVocab(spark, vocab, nMerges)
    val nDone = model.merges.count()
    val tLoop = (System.nanoTime() - t1) / 1e9
    println(f"[bpeprobe] $nDone%d merges in ${tLoop}%.2fs " +
      f"(${nDone / tLoop}%.0f merges/s, driver-local loop)")
    spark.stop()
  }
}
