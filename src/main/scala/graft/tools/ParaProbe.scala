// Scratch diagnosis for q_paragraph_dedup's sf1 curve: candidate-pair
// and chunk counts at a given sf dir, stage-by-stage wall times.
// Run: sbt "runMain graft.tools.ParaProbe <dir>"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ParaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.Tables.register(spark, dir)
    val d = spark.table("documents").select("doc_id", "text")
    val planted = d.filter(col("doc_id") % 10 === 0)
      .withColumn("_w", split(col("text"), " "))
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(array_join(slice(col("_w"), 1, 8), " "),
          lit(" zq zr qx qy qz qw qv qu")).as("text"))
    val corpus = d.unionAll(planted)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[para] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val chunks = graft.llm.TextOps.chunkDocs(corpus, 8, 8)
      .withColumn("chunk_key", col("doc_id") * 100000L + col("chunk_idx"))
    val asDocs = chunks.select(col("chunk_key").as("doc_id"),
      col("chunk_text").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[para] chunks = ${t("chunk count")(asDocs.count())}")
    val cands = graft.llm.Dedup.minhashCandidates(asDocs, 3, 8, 4,
      minEstJaccard = 0.5, oracleHashes = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[para] candidates = ${t("candidate count")(cands.count())}")
    val scored = t("rescore+filter")(
      graft.llm.Dedup.jaccardRescore(asDocs, cands, 3)
        .filter(col("jaccard") >= 0.8).count())
    println(s"[para] dup pairs = $scored")
    val over = graft.llm.Dedup.oversizedBuckets(asDocs, 256, 3, 8, 4,
      oracleHashes = true).agg(count(lit(1)), max("n_docs")).collect()(0)
    println(s"[para] buckets>256: n=${over.get(0)} max=${over.get(1)}")
    spark.stop()
  }
}
