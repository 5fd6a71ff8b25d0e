package graft.scale

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins: both sides written bucketed by the join key
  * land join-compatible partitions on disk, so repeated fact⋈fact joins run
  * with NO shuffle exchange — the amortized answer for a 100 TB warehouse
  * where the same keys join daily (brief: "repartition()/bucketing for
  * co-located joins").
  */
object Bucketing {

  /** Persist `df` as a managed bucketed table (sorted within buckets for
    * merge-friendly reads); composite keys bucket on all columns, so a
    * join on exactly those keys reads the table with no exchange. Drops
    * any previous table AND its on-disk location first — a stale
    * directory from a killed run would otherwise fail
    * LOCATION_ALREADY_EXISTS. */
  def writeBucketed(
      df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = new java.io.File(warehouse, table.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Join two same-bucketed tables on their bucket key. With equal bucket
    * counts Spark plans a SortMergeJoin with no Exchange on either side. */
  def bucketedJoin(
      spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True when the physical plan contains no shuffle exchange — the
    * observable property bucketing buys. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
