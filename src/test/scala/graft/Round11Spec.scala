package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 pins: the rename-based IVF compaction swap (every crash
  * state recoverable, readers strictly read-only, post-crash tombstones
  * never lost) and the Versions hardening (loud concurrent-writer
  * failure, half-vacuum detection, txn high-water surviving maintenance
  * commits and vacuum).
  */
class Round11Spec extends AnyFunSuite with SparkSpec {

  private def emb = graft.io.Sources.table(spark, sf001, "embeddings")
    .filter(col("embedding").isNotNull)

  private def probeOf(dir: String) = {
    val q = emb.filter(col("vec_id") < 20)
    graft.sim.Ivf.probeIndex(q, dir, k = 3, nProbe = 4)
      .select("qid", "nid", "rank").localCheckpoint()
  }

  private def sameRows(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("Ivf swap crash mid-rename: readers read through WITHOUT mutating; writer entry completes the swap") {
    // The r10 verdict finding: the old rmTree-based swap had a crash
    // state (partial assigned + complete compacting) that recovery
    // mis-adjudicated, silently losing rows. The rename-based swap has
    // no partial state; this simulates its mid-point (assigned renamed
    // away, complete _SUCCESS-marked compacting) and pins both halves
    // of the contract.
    import graft.sim.Ivf
    val dir = graft.io.Sources.scratchDir("graft_swapcrash")
    try {
      Ivf.persistIndex(emb, dir, nClusters = 16)
      Ivf.deleteFromIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) === 2).select("vec_id"), dir)
      val want = probeOf(dir)
      // phase 1 of compactIndex, then "crash" right after rename #1
      Ivf.liveAssigned(spark, dir)
        .write.parquet(s"$dir/assigned_compacting")
      assert(new java.io.File(s"$dir/assigned_compacting/_SUCCESS").isFile)
      assert(new java.io.File(s"$dir/assigned")
        .renameTo(new java.io.File(s"$dir/assigned_old")))
      // reader in the crash state: same live set, and STRICTLY read-only
      val got = probeOf(dir)
      assert(sameRows(got, want), "probe changed across the crash state")
      assert(!new java.io.File(s"$dir/assigned").isDirectory &&
        new java.io.File(s"$dir/assigned_old").isDirectory &&
        new java.io.File(s"$dir/assigned_compacting").isDirectory,
        "a READER mutated the crash state (recovery must be writer-only)")
      // writer entry recovers: swap completed, leftovers reclaimed
      val (before, removed, after) = Ivf.compactIndex(spark, dir)
      assert(removed == 0L && before == after,
        "recovered swap re-removed rows the fold already dropped")
      assert(new java.io.File(s"$dir/assigned").isDirectory &&
        !new java.io.File(s"$dir/assigned_old").isDirectory &&
        !new java.io.File(s"$dir/assigned_compacting").isDirectory &&
        !new java.io.File(s"$dir/tombstones").isDirectory)
      assert(sameRows(probeOf(dir), want), "probe changed across recovery")
    } finally graft.io.Sources.removeScratchDir(dir)
  }

  test("Ivf swap crash pre-rename: complete compacting swaps in without losing POST-crash tombstones") {
    import graft.sim.Ivf
    val dir = graft.io.Sources.scratchDir("graft_swapcrash2")
    try {
      Ivf.persistIndex(emb, dir, nClusters = 16)
      val n = spark.read.parquet(s"$dir/assigned").count()
      val n2 = emb.filter(pmod(col("vec_id"), lit(5)) === 2).count()
      val n3 = emb.filter(pmod(col("vec_id"), lit(5)) === 3).count()
      Ivf.deleteFromIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) === 2).select("vec_id"), dir)
      // "crash" after the compacted table is fully written but before
      // either rename — assigned still intact beside it
      Ivf.liveAssigned(spark, dir)
        .write.parquet(s"$dir/assigned_compacting")
      // MORE deletes arrive after the crash: recovery must not drop them
      Ivf.deleteFromIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) === 3).select("vec_id"), dir)
      val (before, removed, after) = Ivf.compactIndex(spark, dir)
      // recovery swapped in the folded table (n - n2 rows), then the
      // run folded the post-crash tombstones (n3 more)
      assert(before == n - n2 && removed == n3 && after == n - n2 - n3,
        s"($before, $removed, $after) vs n=$n n2=$n2 n3=$n3")
      val post = probeOf(dir)
      assert(post.filter(pmod(col("nid"), lit(5)).isin(2, 3)).count() == 0,
        "a tombstoned id survived the recovered compaction")
      assert(!new java.io.File(s"$dir/tombstones").isDirectory)
    } finally graft.io.Sources.removeScratchDir(dir)
  }

  test("Ivf swap: markerless compacting garbage is discarded, pending tombstones still apply") {
    import graft.sim.Ivf
    val dir = graft.io.Sources.scratchDir("graft_swapcrash3")
    try {
      Ivf.persistIndex(emb, dir, nClusters = 16)
      val n = spark.read.parquet(s"$dir/assigned").count()
      val n2 = emb.filter(pmod(col("vec_id"), lit(5)) === 2).count()
      Ivf.deleteFromIndex(
        emb.filter(pmod(col("vec_id"), lit(5)) === 2).select("vec_id"), dir)
      // "crash" mid-write: junk parquet dir with NO _SUCCESS marker
      val junkDir = new java.io.File(s"$dir/assigned_compacting")
      assert(junkDir.mkdirs())
      java.nio.file.Files.write(
        new java.io.File(junkDir, "part-halfwritten").toPath,
        Array[Byte](1, 2, 3))
      val (before, removed, after) = Ivf.compactIndex(spark, dir)
      assert(before == n && removed == n2 && after == n - n2)
      assert(probeOf(dir)
        .filter(pmod(col("nid"), lit(5)) === 2).count() == 0)
    } finally graft.io.Sources.removeScratchDir(dir)
  }

  test("Ivf swap: a lingering assigned_old beside assigned is reclaimed at writer entry") {
    import graft.sim.Ivf
    val dir = graft.io.Sources.scratchDir("graft_swapcrash4")
    try {
      Ivf.persistIndex(emb, dir, nClusters = 16)
      val oldDir = new java.io.File(s"$dir/assigned_old")
      assert(oldDir.mkdirs())
      java.nio.file.Files.write(
        new java.io.File(oldDir, "part-stale").toPath, Array[Byte](9))
      val n = spark.read.parquet(s"$dir/assigned").count()
      val (before, removed, after) = Ivf.compactIndex(spark, dir)
      assert(before == n && removed == 0L && after == n)
      assert(!oldDir.isDirectory, "stale assigned_old not reclaimed")
    } finally graft.io.Sources.removeScratchDir(dir)
  }

  test("Versions: a FRESH orphan (concurrent writer mid-commit) fails loudly instead of being clobbered") {
    import graft.lake.Versions
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_versions_fresh")
    try {
      Versions.commit(Seq(1L).toDF("x"), root)
      // writer B is mid-commit on v1: fresh directory, fresh files
      val inflight = new java.io.File(root, "v1")
      assert(inflight.mkdirs())
      val data = new java.io.File(inflight, "part-writerB")
      java.nio.file.Files.write(data.toPath, Array[Byte](1, 2, 3))
      // writer A violating the single-writer contract must ERROR, and
      // writer B's in-progress data must be untouched
      intercept[IllegalStateException](
        Versions.commit(Seq(9L).toDF("x"), root))
      assert(data.isFile, "the concurrent writer's data was clobbered")
      assert(Versions.current(root) == 0)
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("Versions: a half-vacuumed version is rejected on read, not served as partial data") {
    import graft.lake.Versions
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_versions_halfvac")
    try {
      Versions.commit(Seq(1L, 2L, 3L).toDF("x"), root)
      Versions.commit(Seq(1L, 2L, 3L, 4L).toDF("x"), root)
      // crash mid-vacuum: marker gone (vacuum deletes it FIRST), data
      // files still on disk — a bare parquet read would "succeed"
      assert(new java.io.File(root, "v0/_SUCCESS").delete())
      intercept[IllegalArgumentException](Versions.read(spark, root, 0))
      assert(Versions.read(spark, root, 1).count() == 4)
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("Versions.readEvolved: add AND drop columns resolve to the current schema") {
    import graft.lake.Versions
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_versions_evolve")
    try {
      Versions.commit(Seq((1L, "a")).toDF("x", "y"), root)     // v0: (x, y)
      Versions.commit(Seq((1L, 2.5)).toDF("x", "z"), root)     // v1: (x, z)
      val v0e = Versions.readEvolved(spark, root, 0)
      // dropped column y omitted, added column z typed-null, current order
      assert(v0e.columns.toSeq == Seq("x", "z"))
      val r = v0e.collect()(0)
      assert(r.getLong(0) == 1L && r.isNullAt(1))
      assert(v0e.schema("z").dataType ==
        org.apache.spark.sql.types.DoubleType)
      // evolving the current version is the identity
      assert(Versions.readEvolved(spark, root).columns.toSeq == Seq("x", "z"))
      // plain read stays schema-faithful
      assert(Versions.read(spark, root, 0).columns.toSeq == Seq("x", "y"))
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("Versions: txn high-water survives txn-less maintenance commits and vacuum (replay-skip safety)") {
    import graft.lake.Versions
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_versions_hw")
    try {
      val view = Seq(("a", 1L, 10L)).toDF("event_type", "n", "id_sum")
      Versions.commit(view, root, txn = 0L)
      Versions.commit(view, root, txn = 1L)
      assert(Versions.lastTxn(root) == 1L)
      // a txn-less maintenance commit (compaction/fix-up) must CARRY the
      // mark forward, not reset it to -1
      Versions.commit(view, root)
      assert(Versions.lastTxn(root) == 1L,
        "maintenance commit reset the txn high-water mark")
      // vacuum never touches the manifest
      Versions.vacuum(root, keepFrom = Versions.current(root))
      assert(Versions.lastTxn(root) == 1L)
      // the composed footgun from the r10 verdict: redelivered batch
      // after maintenance + vacuum must still be SKIPPED
      val cur = Versions.current(root)
      graft.streaming.StreamingLake.applyBatch(root,
        Seq(("a", 999L)).toDF("event_type", "event_id"), batchId = 1L)
      assert(Versions.current(root) == cur,
        "redelivered batch was re-applied after a maintenance commit")
      // an out-of-order LOWER txn cannot regress the mark either
      Versions.commit(view, root, txn = 0L)
      assert(Versions.lastTxn(root) == 1L)
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("Versions.branch: zero-copy contract, refusal modes, and the cross-table retention footgun") {
    import graft.lake.Versions
    import spark.implicits._
    val src = graft.io.Sources.scratchDir("graft_br_src")
    val dst = graft.io.Sources.scratchDir("graft_br_dst")
    val dst2 = graft.io.Sources.scratchDir("graft_br_dst2")
    try {
      // branching an empty table fails loudly
      intercept[IllegalArgumentException](Versions.branch(src, dst))
      Versions.commit(Seq(1L, 2L, 3L).toDF("x"), src)       // src v0
      Versions.commit(Seq(1L, 2L, 3L, 4L).toDF("x"), src)   // src v1
      Versions.branch(src, dst, version = 0)
      // zero-copy: no local v0 directory, reads go through the base
      assert(!new java.io.File(dst, "v0").exists())
      assert(Versions.read(spark, dst).as[Long].collect().sorted.toSeq
        == Seq(1L, 2L, 3L))
      // branching onto an existing table (manifest or base) fails loudly
      intercept[IllegalArgumentException](Versions.branch(src, dst))
      // branch-of-branch resolves the PHYSICAL dir once (one-hop reads)
      Versions.branch(dst, dst2)
      assert(Versions.read(spark, dst2).count() == 3)
      // diverging commit lands locally and never moves the source
      Versions.commit(Seq(9L).toDF("x"), dst)               // branch v1
      assert(Versions.current(dst) == 1 && Versions.current(src) == 1)
      assert(Versions.read(spark, src, 1).count() == 4)
      // vacuum on the branch only reclaims LOCAL versions — the shared
      // base snapshot stays readable from both roots
      assert(Versions.vacuum(dst, keepFrom = 1) == 0)
      assert(Versions.read(spark, dst, 0).count() == 3)
      // ...but vacuuming the SOURCE below the branched version breaks
      // the branch's v0 LOUDLY, never silently (the documented footgun)
      assert(Versions.vacuum(src, keepFrom = 1) == 1)
      intercept[IllegalArgumentException](Versions.read(spark, dst, 0))
      // the branch's own diverged commit is unaffected
      assert(Versions.read(spark, dst, 1).as[Long].head() == 9L)
    } finally {
      graft.io.Sources.removeScratchDir(dst2)
      graft.io.Sources.removeScratchDir(dst)
      graft.io.Sources.removeScratchDir(src)
    }
  }

  test("Versions deletion vectors: chain reads, branch refusal, vacuum floor, delete-from-empty") {
    import graft.lake.Versions
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_dv_spec")
    val br = graft.io.Sources.scratchDir("graft_dv_branch")
    try {
      // deleting from an empty table fails loudly
      intercept[IllegalArgumentException](Versions.commitDelete(
        Seq(1L).toDF("k"), root, "k"))
      Versions.commit(Seq(1L, 2L, 3L, 4L, 5L).toDF("k"), root)  // v0
      Versions.commitDelete(Seq(2L, 4L).toDF("k"), root, "k")   // v1 (DV)
      Versions.commitDelete(Seq(5L).toDF("k"), root, "k")       // v2 (DV)
      assert(Versions.read(spark, root).as[Long].collect().sorted.toSeq
        == Seq(1L, 3L))
      // time travel into the middle of the chain
      assert(Versions.read(spark, root, 1).as[Long].collect().sorted.toSeq
        == Seq(1L, 3L, 5L))
      // deleting an already-deleted or absent key is idempotent
      Versions.commitDelete(Seq(2L, 99L).toDF("k"), root, "k")  // v3 (DV)
      assert(Versions.read(spark, root).as[Long].collect().sorted.toSeq
        == Seq(1L, 3L))
      // a zero-copy branch cannot be cut from a DV version
      intercept[IllegalArgumentException](Versions.branch(root, br))
      // vacuum floor auto-lowers to the chain base: nothing reclaimable
      assert(Versions.vacuum(root, keepFrom = 3) == 0)
      assert(Versions.read(spark, root, 2).count() == 2)
      // compaction collapses the chain; the old chain becomes reclaimable
      val v4 = Versions.compactDeletes(spark, root)
      assert(Versions.read(spark, root, v4).as[Long].collect().sorted.toSeq
        == Seq(1L, 3L))
      assert(Versions.vacuum(root, keepFrom = v4) == 4)
      assert(Versions.read(spark, root).as[Long].collect().sorted.toSeq
        == Seq(1L, 3L))
      // ...and the compacted version can be branched
      Versions.branch(root, br)
      assert(Versions.read(spark, br).count() == 2)
    } finally {
      graft.io.Sources.removeScratchDir(br)
      graft.io.Sources.removeScratchDir(root)
    }
  }

  test("Versions merge-on-read upsert: replace + insert in one overlay, composes with DV deletes") {
    import graft.lake.Versions
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_mor_spec")
    try {
      intercept[IllegalArgumentException](Versions.commitUpsert(
        Seq((1L, "a")).toDF("k", "s"), root, "k"))
      Versions.commit(
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"), root) // v0
      // one overlay: replace k=2, insert k=9
      Versions.commitUpsert(
        Seq((2L, "B"), (9L, "i")).toDF("k", "s"), root, "k")       // v1
      assert(Versions.read(spark, root).as[(Long, String)].collect()
        .sorted.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "i")))
      // DV delete composes on top of the upsert overlay
      Versions.commitDelete(Seq(1L, 9L).toDF("k"), root, "k")      // v2
      assert(Versions.read(spark, root).as[(Long, String)].collect()
        .sorted.toSeq == Seq((2L, "B"), (3L, "c")))
      // a second upsert can resurrect a deleted key
      Versions.commitUpsert(Seq((9L, "i2")).toDF("k", "s"), root, "k")
      assert(Versions.read(spark, root).as[(Long, String)].collect()
        .sorted.toSeq == Seq((2L, "B"), (3L, "c"), (9L, "i2")))
      // time travel sees each overlay state exactly
      assert(Versions.read(spark, root, 1).count() == 4)
      assert(Versions.read(spark, root, 0).as[(Long, String)].collect()
        .sorted.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("Catalog: refusal modes, snapshot isolation across tables, crashed phase-1 self-heals") {
    import graft.lake.{Catalog, Versions}
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_cat_spec")
    try {
      intercept[IllegalArgumentException](Catalog.commitAll(root, Map.empty))
      Catalog.commitAll(root, Map(
        "a" -> Seq(1L, 2L).toDF("x"), "b" -> Seq(10L).toDF("x")))
      // a table outside the snapshot fails loudly
      intercept[IllegalArgumentException](Catalog.read(spark, root, "zzz"))
      val snap0 = Catalog.snapshot(root)
      // crashed phase-1: table 'a' commits, catalog never flips
      Versions.commit(Seq(9L, 9L, 9L).toDF("x"), s"$root/a")
      assert(Catalog.read(spark, root, "a").count() == 2) // old pair holds
      // the next catalog commit stacks ABOVE the unreferenced version
      Catalog.commitAll(root, Map("a" -> Seq(5L).toDF("x")))
      assert(Catalog.read(spark, root, "a").as[Long].head() == 5L)
      assert(Catalog.snapshot(root)("a") == 2) // v1 = crashed orphan, skipped
      // a partial commitAll only bumps the NAMED tables; 'b' is carried
      assert(Catalog.snapshot(root)("b") == snap0("b"))
      assert(Catalog.read(spark, root, "b").as[Long].head() == 10L)
      // snapshot-derived vacuum reclaims the crashed version too
      assert(Catalog.vacuumTo(root) == 2) // a: v0 + crashed v1
      assert(Catalog.read(spark, root, "a").as[Long].head() == 5L)
      intercept[IllegalArgumentException](
        Versions.read(spark, s"$root/a", 1))
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("Versions.snapshot: pinned reads are repeatable while commits land; vacuum breaks the pin loudly") {
    import graft.lake.Versions
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_snap")
    try {
      intercept[IllegalArgumentException](Versions.snapshot(root))
      Versions.commit(Seq(1L, 2L, 3L).toDF("x"), root)
      val snap = Versions.snapshot(root)
      val before = Versions.read(spark, root, snap)
        .as[Long].collect().sorted.toSeq
      Versions.commit(Seq(7L).toDF("x"), root)
      Versions.commit(Seq(8L).toDF("x"), root)
      // repeatable read across two commits
      assert(Versions.read(spark, root, snap)
        .as[Long].collect().sorted.toSeq == before)
      assert(Versions.snapshot(root) == 2)
      // reclaiming the pinned version turns the handle into a loud error
      Versions.vacuum(root, keepFrom = 2)
      intercept[IllegalArgumentException](Versions.read(spark, root, snap))
    } finally graft.io.Sources.removeScratchDir(root)
  }
}
