package graft.llm

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Registry of the MEMORY_AND_DISK intermediates the dedup/curation
  * operators persist (band buckets, candidate pairs, label-propagation
  * rounds). Spark's CacheManager holds those entries until unpersisted, so
  * a long-lived session — a tick-scheduled `minhash_dedup` compute, a
  * notebook loop — would otherwise accumulate them without bound.
  *
  * Tracking is scoped so one consumer's reclaim cannot evict another's
  * live caches: a consumer that wants its own lifetime wraps the operator
  * call in [[scoped]] and clears the returned [[Scope]] when its result
  * has been consumed (the tick scheduler holds each batch's scope until
  * the next tick). Operator calls made outside any scope land in a global
  * default scope that the blanket [[clear]] reclaims — the pattern tests
  * and one-shot tools use. Unpersisting is always safe — an un-consumed
  * lazy result silently recomputes instead of reading the cache. */
object PipelineCaches {

  /** One consumer's tracked intermediates. Thread-safe; `clear` is
    * idempotent and a cleared scope can keep collecting (it just tracks
    * the next run). */
  final class Scope private[PipelineCaches] () {
    private[PipelineCaches] val tracked = new ConcurrentLinkedQueue[DataFrame]()

    /** Unpersist every intermediate tracked in this scope. */
    def clear(): Unit = {
      var df = tracked.poll()
      while (df != null) {
        df.unpersist(blocking = false)
        df = tracked.poll()
      }
    }
  }

  private val global = new Scope
  // the scope operator-side track() calls resolve against; persist-site
  // tracking happens while the operator builds (or, for iterative ops,
  // eagerly runs) its plan, which is on the caller's thread
  private val current = new InheritableThreadLocal[Scope]

  private[graft] def track(df: DataFrame): DataFrame = {
    Option(current.get).getOrElse(global).tracked.add(df)
    df
  }

  /** Run `body` with a fresh scope capturing everything it tracks; returns
    * the result and the scope handle. The caller owns the scope: call
    * `scope.clear()` once the result has been materialized/consumed.
    * If `body` throws, everything it tracked so far is cleared before the
    * exception propagates — a failing run must not leak the intermediates
    * it persisted before dying (a tick-scheduled compute with a transient
    * per-batch failure would otherwise re-leak on every failing tick). */
  def scoped[T](body: => T): (T, Scope) = {
    val s = new Scope
    val prev = current.get
    current.set(s)
    try (body, s)
    catch { case t: Throwable => s.clear(); throw t }
    finally current.set(prev)
  }

  /** Unpersist every intermediate tracked outside any [[scoped]] block. */
  def clear(): Unit = global.clear()
}
