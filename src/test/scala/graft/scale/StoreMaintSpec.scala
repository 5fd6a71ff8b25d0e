package graft.scale

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The crash-safe store swap contract: replacement verified before the
  * live store is touched, pre-existing backups never pre-deleted, and —
  * the non-atomic window between the two renames — one-rename recovery
  * with nothing lost. */
class StoreMaintSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def freshStore(rows: Int): (String, String) = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-storemaint").toString
    val path = s"$dir/store"
    (1 to rows).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.parquet(path)
    (dir, path)
  }

  test("replaceStore swaps in the replacement and reclaims its backup") {
    val s = spark
    import s.implicits._
    val (_, path) = freshStore(10)
    val kept = StoreMaint.replaceStore(s, path,
      s.read.parquet(path).filter(col("id") <= 4))
    assert(kept == 4)
    assert(s.read.parquet(path).count() == 4)
    assert(!new java.io.File(path + "_old").exists,
      "backup must be reclaimed after the live path verifies")
  }

  test("a pre-existing crash backup is never deleted by the next swap") {
    val s = spark
    import s.implicits._
    val (dir, path) = freshStore(10)
    // a half-finished earlier swap left a backup that may be the only copy
    val stale = path + "_old"
    Seq((99L, "stale")).toDF("id", "v").write.parquet(stale)
    StoreMaint.replaceStore(s, path,
      s.read.parquet(path).filter(col("id") <= 3))
    assert(s.read.parquet(stale).count() == 1,
      "the stale backup must survive the swap untouched")
    // this swap's own backup took a fresh name and was then reclaimed
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("store_old")) == 1)
  }

  test("crash between the two renames: one-rename recovery, nothing lost") {
    val s = spark
    val (_, path) = freshStore(10)
    // reproduce replaceStore's state at the crash point: the replacement
    // is verified at the side path, the live store moved aside, the
    // second rename never ran
    s.read.parquet(path).filter(col("id") <= 4)
      .write.parquet(path + "_compacting")
    assert(new java.io.File(path).renameTo(new java.io.File(path + "_old")))
    assert(!new java.io.File(path).exists)

    assert(StoreMaint.recover(s, path), "recovery must report it acted")
    assert(s.read.parquet(path).count() == 10,
      "the ORIGINAL store comes back — the interrupted swap is undone")
    assert(new java.io.File(path + "_compacting").exists,
      "recovery deletes nothing; the replacement stays for reclaim")
    // a second recover is a no-op on the now-healthy store
    assert(!StoreMaint.recover(s, path))
    assert(s.read.parquet(path).count() == 10)
  }

  test("recover restores the NEWEST backup, not a stale canonical _old") {
    val s = spark
    import s.implicits._
    val (_, path) = freshStore(10)
    // a crash two swaps ago left a stale canonical backup (8 rows)...
    Seq.tabulate(8)(i => (i.toLong, "stale")).toDF("id", "v")
      .write.parquet(path + "_old")
    // ...so the next swap parked the then-current store (10 rows) under a
    // fresh name, then crashed in the rename window: live store gone
    assert(new java.io.File(path)
      .renameTo(new java.io.File(path + "_old_1234567890")))
    // make the mtime order unambiguous regardless of test speed
    assert(new java.io.File(path + "_old").setLastModified(1000000000000L))
    assert(new java.io.File(path + "_old_1234567890")
      .setLastModified(2000000000000L))

    assert(StoreMaint.recover(s, path))
    assert(s.read.parquet(path).count() == 10,
      "the newest surviving copy must come back, not the stale _old")
    assert(new java.io.File(path + "_old").exists,
      "the stale backup is left for operator reclaim, never deleted")
  }

  test("recover orders parks by name-embedded epoch, not filesystem mtime") {
    val s = spark
    import s.implicits._
    val (_, path) = freshStore(10)
    // an older park from two crashes ago (8 rows, wall-clock epoch)...
    Seq.tabulate(8)(i => (i.toLong, "stale")).toDF("id", "v")
      .write.parquet(path + "_old_1700000000000")
    // ...and the newest park (the 10-row store, one second later)
    assert(new java.io.File(path)
      .renameTo(new java.io.File(path + "_old_1700000001000")))
    // LIE with the mtimes (object stores report 0/fake dir mtimes and
    // rename can reset them): the newest park gets the OLDER mtime
    assert(new java.io.File(path + "_old_1700000001000")
      .setLastModified(1000000000000L))
    assert(new java.io.File(path + "_old_1700000000000")
      .setLastModified(2000000000000L))

    assert(StoreMaint.recover(s, path))
    assert(s.read.parquet(path).count() == 10,
      "the park with the larger name epoch must win even when mtime lies")
  }

  test("legacy nanoTime park suffixes never outrank wall-clock epochs") {
    val s = spark
    import s.implicits._
    val (_, path) = freshStore(10)
    // a pre-epoch-naming park: System.nanoTime() suffix ~1 day of
    // uptime (8.6e13) — numerically HUGE but not a wall clock; taking
    // it at face value would roll the store back to this stale copy
    Seq.tabulate(8)(i => (i.toLong, "stale")).toDF("id", "v")
      .write.parquet(path + "_old_86400000000000")
    assert(new java.io.File(path + "_old_86400000000000")
      .setLastModified(1000000000000L))
    // the real newest park, named with wall-clock millis, newer mtime
    assert(new java.io.File(path)
      .renameTo(new java.io.File(path + "_old_1700000001000")))
    assert(new java.io.File(path + "_old_1700000001000")
      .setLastModified(1500000000000L))

    assert(StoreMaint.recover(s, path))
    assert(s.read.parquet(path).count() == 10,
      "an out-of-window numeric suffix must fall back to mtime, not win")
  }

  test("recover with neither live store nor backup fails loudly") {
    val dir = Files.createTempDirectory("graft-storemaint").toString
    val e = intercept[java.io.IOException] {
      StoreMaint.recover(spark, s"$dir/missing")
    }
    assert(e.getMessage.contains("no backup"))
  }
}
