package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Source/sink round-trips: partitioned parquet (with directory pruning),
  * CSV and JSONL exports re-read through the format-dispatched reader. */
class CorpusIOSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("partitioned parquet round-trips and prunes partitions") {
    val s = spark
    val docs = s.table("documents")
      .select("doc_id", "lang", "n_chars", "text")
    val out = tmp("graft-parquet") + "/docs"
    CorpusIO.writeParquet(docs, out, partitionCols = Seq("lang"))

    val back = CorpusIO.read(s, out)
    assert(back.count() == docs.count())
    // lang became a partition column: filtering must prune directories,
    // visible as PartitionFilters in the scan (not a post-scan filter)
    val en = back.filter(col("lang") === "en")
    val scan = en.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("lang"), s"expected partition pruning:\n$scan")
    val expected = docs.filter(col("lang") === "en").count()
    assert(en.count() == expected)
  }

  test("csv export re-reads with identical aggregate facts") {
    val s = spark
    val src = s.table("orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val out = tmp("graft-csv") + "/orders"
    CorpusIO.writeCsv(src, out)
    val back = CorpusIO.read(s, out, schema = Some(src.schema),
      format = Some("csv"), options = Map("header" -> "true"))
    // compare on content, not schema nuances: counts and a decimal-exact sum
    val f = (d: org.apache.spark.sql.DataFrame) => d.agg(
      count(lit(1)), sum(col("o_totalprice").cast("decimal(18,2)"))).head()
    assert(f(back) == f(src))
  }

  test("headerless csv with explicit schema keeps its first data row") {
    val s = spark
    import s.implicits._
    val src = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
    val out = tmp("graft-csv-nohdr") + "/rows"
    src.write.csv(out) // no header option: first line IS data
    val back = CorpusIO.read(s, out, schema = Some(src.schema),
      format = Some("csv"))
    assert(back.count() == 2L, "schema-provided CSV must not eat row 1 as a header")
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("alpha", "beta"))
  }

  test("jsonl export re-reads with identical aggregate facts") {
    val s = spark
    val src = s.table("events").select("event_id", "user_id", "value")
    val out = tmp("graft-jsonl") + "/events"
    CorpusIO.writeJsonl(src, out)
    val back = CorpusIO.read(s, out, schema = Some(src.schema),
      format = Some("json")).select("event_id", "user_id", "value")
    assert(back.count() == src.count())
    val sumSrc = src.agg(sum(col("value").cast("decimal(18,2)"))).head().get(0)
    val sumBack = back.agg(sum(col("value").cast("decimal(18,2)"))).head().get(0)
    assert(sumSrc == sumBack)
  }
}
