package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Registers the driver fixture parquet tables (TESTDATA.md) as temp views so
  * both the DSL compiler's `spark.sql` path and the query catalog resolve the
  * same relations the DuckDB oracle sees.
  *
  * Scale note: views are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the scan, and partition parallelism follows
  * `spark.sql.files.maxPartitionBytes`, so the same registration works
  * unchanged on a 100 TB warehouse directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Registration is cheap-idempotent: a session conf flag records the dir
  // already registered so repeated calls (every catalog closure calls us)
  // don't re-read 10 parquet footers or mutate session state again.
  private val RegisteredKey = "spark.graft.registeredDir"

  /** Register every fixture table under `dir` as a temp view. Idempotent
    * per (session, dir).
    *
    * Determinism contract travels with the catalog: UTC session timezone is
    * pinned here (not just in the callers) so timestamp-literal filters are
    * always equivalent to the naive-timestamp DuckDB oracle.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; we read nanos as long and truncate to a µs timestamp with
    * integer division (`div`, not `/` — ~1.7e18 ns overflows double
    * precision), matching DuckDB's ns→µs truncation on read.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    if (spark.conf.getOption(RegisteredKey).contains(dir)) return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    names.foreach { n =>
      val raw = spark.read.parquet(s"$dir/$n.parquet")
      val df =
        if (n == "events" && raw.schema("ts").dataType == LongType)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else raw
      df.createOrReplaceTempView(n)
    }
    spark.conf.set(RegisteredKey, dir)
  }
}
