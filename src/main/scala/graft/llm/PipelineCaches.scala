package graft.llm

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Registry of the MEMORY_AND_DISK intermediates the dedup/curation
  * operators persist (band buckets, candidate pairs, label-propagation
  * rounds). Spark's CacheManager holds those entries until unpersisted, so
  * a long-lived session — a tick-scheduled `minhash_dedup` compute, a
  * notebook loop — would otherwise accumulate them without bound.
  *
  * Operators `track` what they persist; consumers call [[clear]] once a
  * result is materialized (the tick scheduler does this per batch;
  * Bench/Profile use the broader `spark.catalog.clearCache()`).
  * Unpersisting is always safe — an un-consumed lazy result silently
  * recomputes instead of reading the cache. */
object PipelineCaches {

  private val tracked = new ConcurrentLinkedQueue[DataFrame]()

  private[graft] def track(df: DataFrame): DataFrame = {
    tracked.add(df)
    df
  }

  /** Unpersist every tracked intermediate. */
  def clear(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = tracked.poll()
    }
  }
}
