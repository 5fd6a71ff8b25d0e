package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-mitigation utilities for hot keys at warehouse scale.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; these
  * helpers cover the two cases it doesn't: aggregation skew (one giant
  * group) and broadcast-side replication for salted equi-joins. Salts are
  * deterministic (xxhash64 of the row key), so results are reproducible.
  */
object Skew {

  private val D = DecimalType(28, 8)

  /** Two-phase salted sum/count aggregation: partial aggregate on
    * (keys, salt) — splitting each hot group across `salts` reducers —
    * then final combine on keys. Decimal-exact, so the extra phase cannot
    * change results. */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    // salt must vary per ROW, not per value: a hot group with a constant
    // measure would otherwise collapse into one salt bucket. The aggregate
    // result is salt-invariant, so a partition-dependent id is fine.
    val salt = pmod(xxhash64(monotonically_increasing_id()), lit(salts))
    df.withColumn("_salt", salt)
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol).cast(D)).as("_psum"),
        count(lit(1)).as("_pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_psum")).cast("double").as(s"${valueCol}_sum"),
        sum(col("_pcnt")).as("n"))
  }

  /** Salted equi-join for a skewed fact side: the (small) build side is
    * replicated once per salt, the fact side gets a deterministic salt, and
    * the join key becomes (key, salt) — hot keys spread over `salts`
    * partitions. Build-side replication cost: |dim| × salts rows. */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
