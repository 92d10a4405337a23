package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[graft.lake.TxLog]] — the multi-writer commit log:
  * serializability under REAL thread contention, the photo-finish CAS
  * path (data written, link loses), loser cleanup, crashed-writer
  * orphans being invisible and age-guard-reclaimed, and txn high-water
  * semantics. */
class TxLogSpec extends AnyFunSuite with SparkSpec {

  import graft.lake.{CommitConflict, TxLog}

  test("racing writers serialize: every version is transform(previous), no update lost") {
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_txlog_race")
    try {
      TxLog.commit(Seq(0L).toDF("n"), root, expected = -1)
      val threads = 3
      val opsEach = 3
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val pool = (1 to threads).map { _ =>
        new Thread(() => {
          try (1 to opsEach).foreach { _ =>
            TxLog.readModifyWrite(spark, root, maxRetries = 200) { base =>
              base.get.select((col("n") + 1L).as("n"))
            }
          } catch { case t: Throwable => errs.add(t); () }
        })
      }
      pool.foreach(_.start()); pool.foreach(_.join())
      assert(errs.isEmpty, s"writer thread failed: ${errs.peek()}")
      // total order: exactly one commit per increment, none lost
      assert(TxLog.current(root) == threads * opsEach)
      assert(TxLog.read(spark, root).as[Long].head() == threads * opsEach)
      // every intermediate version is its predecessor + 1 (serial history)
      (0 to threads * opsEach).foreach { v =>
        assert(TxLog.read(spark, root, v).as[Long].head() == v.toLong)
      }
      // losers cleaned up: one data directory per commit record
      val dataDirs = Option(new java.io.File(root).listFiles()).toSeq
        .flatten.count(f => f.isDirectory && f.getName.startsWith("d"))
      assert(dataDirs == threads * opsEach + 1)
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("photo-finish CAS: a commit that wrote its data but loses the link conflicts and cleans up") {
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_txlog_photo")
    try {
      TxLog.commit(Seq(1L).toDF("n"), root, expected = -1)
      TxLog.commit(Seq(2L).toDF("n"), root, expected = 0)
      // a second writer also targeting v1, with the cheap precheck
      // disabled so its data write happens and the LINK is what loses
      intercept[CommitConflict](TxLog.commitImpl(
        Seq(99L).toDF("n"), root, expected = 0, txn = -1L,
        precheck = false))
      // the winner's v1 is untouched; the loser left no data dir behind
      assert(TxLog.read(spark, root, 1).as[Long].head() == 2L)
      val dataDirs = Option(new java.io.File(root).listFiles()).toSeq
        .flatten.count(f => f.isDirectory && f.getName.startsWith("d"))
      assert(dataDirs == 2)
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("crashed writer: an unrecorded data dir is invisible to readers; vacuumOrphans reclaims it age-guarded") {
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_txlog_orphan")
    try {
      TxLog.commit(Seq(1L, 2L).toDF("n"), root, expected = -1)
      // crash simulation: a writer died after its data write, before
      // its commit record — the directory exists but nothing names it
      Seq(7L, 8L, 9L).toDF("n")
        .write.parquet(s"$root/d1-deadbeef")
      assert(TxLog.current(root) == 0)
      assert(TxLog.read(spark, root).count() == 2)
      // fresh orphans are protected (could be an in-flight commit)
      assert(TxLog.vacuumOrphans(root) == 0)
      assert(new java.io.File(root, "d1-deadbeef").isDirectory)
      // past the grace window it is reclaimed
      assert(TxLog.vacuumOrphans(root, graceMs = 0L) == 1)
      assert(!new java.io.File(root, "d1-deadbeef").exists())
      // the committed version was never at risk
      assert(TxLog.read(spark, root).count() == 2)
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("a live stream and a racing maintenance writer both commit; the final view equals batch truth") {
    val root = graft.io.Sources.scratchDir("graft_txlog_stream")
    try {
      // the maintenance thread rewrites the CURRENT view repeatedly
      // while the stream commits micro-batches — a genuine multi-writer
      // interleaving; serializability means the final view must equal
      // the one-shot batch truth no matter who won which version
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val maint = new Thread(() => {
        try while (!stop.get()) {
          if (TxLog.current(root) >= 0)
            TxLog.readModifyWrite(spark, root, maxRetries = 500)(b =>
              b.get.repartition(1))
          Thread.sleep(50)
        } catch { case t: Throwable => errs.add(t); () }
      })
      maint.start()
      val nBatches =
        try graft.streaming.StreamingLake.runViewCommitsCas(
          spark, sf001, root, nFiles = 4)
        finally { stop.set(true); maint.join() }
      assert(errs.isEmpty, s"maintenance writer failed: ${errs.peek()}")
      assert(nBatches == 4)
      val truth = graft.io.Sources.table(spark, sf001, "events")
        .filter(col("event_type").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("event_id").as("id_sum"))
      val got = TxLog.read(spark, root)
      assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty,
        "final view diverged from batch truth under multi-writer race")
      // every batch committed exactly once despite the interleaving
      assert(TxLog.lastTxn(root) == nBatches - 1)
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("checkpoint + vacuum: crash mid-vacuum leaves vacuumed-reading versions; checkpoint never regresses") {
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_txlog_ck")
    try {
      intercept[IllegalArgumentException](TxLog.checkpoint(root))
      (0 to 4).foreach(i =>
        TxLog.commit(Seq(i.toLong).toDF("n"), root, expected = i - 1,
          txn = if (i == 2) 50L else -1L))
      TxLog.checkpoint(root)
      // crash mid-vacuum simulation: record 0 unlinked, data dir still
      // there (vacuum deletes the record FIRST) — v0 must read as
      // vacuumed, and the counter/high-water hold via the checkpoint
      new java.io.File(root, "_commits/0000000000").delete()
      intercept[IllegalArgumentException](TxLog.read(spark, root, 0))
      assert(TxLog.current(root) == 4 && TxLog.lastTxn(root) == 50L)
      // v0's stranded data dir is unnamed by any record now — exactly
      // what vacuumOrphans reclaims (age guard bypassed for the test)
      assert(TxLog.vacuumOrphans(root, graceMs = 0L) == 1)
      // a resumed vacuum reclaims the remaining prefix (records 1, 2)
      assert(TxLog.vacuum(root, keepFrom = 3) == 2)
      assert(TxLog.read(spark, root, 3).as[Long].head() == 3L)
      assert(TxLog.read(spark, root).as[Long].head() == 4L)
      // commits continue after prefix reclaim
      TxLog.commit(Seq(9L).toDF("n"), root, expected = 4)
      assert(TxLog.current(root) == 5 && TxLog.lastTxn(root) == 50L)
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("txn high-water spans all commits; stale expected fails before writing data") {
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_txlog_txn")
    try {
      TxLog.commit(Seq(1L).toDF("n"), root, expected = -1, txn = 5L)
      TxLog.commit(Seq(2L).toDF("n"), root, expected = 0)
      assert(TxLog.lastTxn(root) == 5L)
      TxLog.commit(Seq(3L).toDF("n"), root, expected = 1, txn = 9L)
      assert(TxLog.lastTxn(root) == 9L)
      // stale expected: early conflict, and no data directory appears
      val before = Option(new java.io.File(root).listFiles()).toSeq
        .flatten.count(_.isDirectory)
      intercept[CommitConflict](
        TxLog.commit(Seq(9L).toDF("n"), root, expected = 0))
      val after = Option(new java.io.File(root).listFiles()).toSeq
        .flatten.count(_.isDirectory)
      assert(before == after, "stale commit wrote data before conflicting")
      // reading a never-committed version fails loudly
      intercept[IllegalArgumentException](TxLog.read(spark, root, 7))
    } finally graft.io.Sources.removeScratchDir(root)
  }
}
