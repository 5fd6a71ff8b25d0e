package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for tests (one JVM-wide session; suites run
  * sequentially under sbt's forked test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  val fixtureDir = "/root/testdata/sf0.001"

  def withTables(): SparkSession = {
    val s = spark
    Tables.register(s, fixtureDir)
    s
  }
}
