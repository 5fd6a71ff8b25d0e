package graft.llm

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Scoped cache tracking: one consumer's reclaim must not evict another
  * consumer's live intermediates (ADVICE r3: the tick scheduler's
  * per-batch clear used to unpersist everything in the JVM). */
class PipelineCachesSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  test("global clear does not evict scoped caches; scope clear does") {
    val s = spark
    import s.implicits._

    val (dfA, scopeA) = PipelineCaches.scoped {
      val d = PipelineCaches.track(
        Seq(1, 2, 3).toDF("x").persist(StorageLevel.MEMORY_AND_DISK))
      d.count()
      d
    }
    val dfB = PipelineCaches.track(
      Seq(4, 5).toDF("y").persist(StorageLevel.MEMORY_AND_DISK))
    dfB.count()

    assert(dfA.storageLevel != StorageLevel.NONE)
    assert(dfB.storageLevel != StorageLevel.NONE)

    PipelineCaches.clear() // unscoped consumer reclaims the global scope
    assert(dfB.storageLevel == StorageLevel.NONE)
    assert(dfA.storageLevel != StorageLevel.NONE,
      "blanket clear must not evict a scoped consumer's live cache")

    scopeA.clear()
    assert(dfA.storageLevel == StorageLevel.NONE)
    scopeA.clear() // idempotent
  }

  test("scopes nest: inner tracks stay out of the outer scope") {
    val s = spark
    import s.implicits._
    val ((inner, innerScope), outerScope) = PipelineCaches.scoped {
      PipelineCaches.scoped {
        val d = PipelineCaches.track(
          Seq(1).toDF("z").persist(StorageLevel.MEMORY_AND_DISK))
        d.count()
        d
      }
    }
    outerScope.clear()
    assert(inner.storageLevel != StorageLevel.NONE,
      "outer scope clear must not reclaim the inner scope's cache")
    innerScope.clear()
    assert(inner.storageLevel == StorageLevel.NONE)
  }
}
