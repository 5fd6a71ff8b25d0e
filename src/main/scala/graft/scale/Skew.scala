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
    * change results.
    *
    * Salt assignment: with `saltCols` (a unique row id, when the schema
    * has one) the salt is DETERMINISTIC — `pmod(xxhash64(saltCols),
    * salts)` — immune to the nondeterministic-shuffle-key hazard (a map
    * stage recomputed after a fetch failure re-assigning rows across
    * already-consumed reduce outputs, double-counting or losing them).
    * The default falls back to a per-row round-robin id because content
    * hashing CANNOT replace it here: a hot group with a constant
    * measure (key=k, value=1 a billion times) hashes every row
    * identically and would collapse back onto one reducer — the exact
    * skew this operator exists to break. Prefer passing `saltCols`
    * whenever a unique column exists; with the fallback, run against
    * checkpointed/stable input when stage retries must be exact. */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16, saltCols: Seq[String] = Nil): DataFrame = {
    val salt =
      if (saltCols.nonEmpty)
        pmod(xxhash64(saltCols.map(col): _*), lit(salts))
      else pmod(xxhash64(monotonically_increasing_id()), lit(salts))
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
