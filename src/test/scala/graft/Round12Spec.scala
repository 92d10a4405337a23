package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 pins: the catalog-level link(2) CAS (no lost snapshot
  * under interleaved multi-table transactions), and the other
  * round-12 protocol upgrades.
  */
class Round12Spec extends AnyFunSuite with SparkSpec {

  import graft.lake.{Catalog, CommitConflict, Versions}

  test("racing multi-table transactions serialize on the catalog CAS: no snapshot lost") {
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_catalog_race")
    try {
      val threads = 3
      val opsEach = 3
      // each thread owns a disjoint member table (same-table phase-1
      // concurrency is governed by the member core's own contract);
      // the CATALOG record is what all of them race on
      (0 until threads).foreach { i =>
        Catalog.commitAll(root, Map(s"t$i" -> Seq(0L).toDF("n")))
      }
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val pool = (0 until threads).map { i =>
        new Thread(() => {
          try (1 to opsEach).foreach { _ =>
            Catalog.transact(root, maxRetries = 200) { snap =>
              Map(s"t$i" -> Catalog.read(spark, root, s"t$i", snap)
                .select((col("n") + 1L).as("n")))
            }
          } catch { case t: Throwable => errs.add(t); () }
        })
      }
      pool.foreach(_.start()); pool.foreach(_.join())
      assert(errs.isEmpty, s"transaction thread failed: ${errs.peek()}")
      // one catalog record per committed transaction, none lost
      assert(Catalog.catalogVersion(root) == threads + threads * opsEach - 1)
      val fin = Catalog.snapshot(root)
      (0 until threads).foreach { i =>
        // the rename-REPLACE flip loses here: a losing writer's stale
        // snapshot map would drop another thread's latest version, so
        // some table would read back fewer than opsEach increments
        assert(Catalog.read(spark, root, s"t$i").as[Long].head() ==
          opsEach.toLong, s"t$i lost an update")
        assert(fin.contains(s"t$i"), s"t$i missing from the final snapshot")
      }
      // every intermediate catalog version is a readable, internally
      // consistent snapshot (the cross-table history survives)
      (0 to Catalog.catalogVersion(root)).foreach { v =>
        Catalog.snapshotAt(root, v).foreach { case (t, tv) =>
          assert(Versions.read(spark, s"$root/$t", tv).count() == 1)
        }
      }
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("catalog conflict is loud: a stale-expected commitAll throws, winner's snapshot intact") {
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_catalog_conflict")
    try {
      Catalog.commitAll(root, Map("t" -> Seq(1L).toDF("n")))
      val cv = Catalog.catalogVersion(root)
      Catalog.commitAll(root, Map("t" -> Seq(2L).toDF("n")), cv)
      val winner = Catalog.snapshot(root)
      intercept[CommitConflict](
        Catalog.commitAll(root, Map("u" -> Seq(9L).toDF("n")), cv))
      assert(Catalog.snapshot(root) == winner, "loser replaced the snapshot")
      assert(Catalog.read(spark, root, "t").as[Long].head() == 2L)
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("catalog rejects table names that would corrupt the record or escape the root") {
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_catalog_names")
    try {
      Seq("a=b", "a b", "a/b", "../up", "").foreach { bad =>
        intercept[IllegalArgumentException](
          Catalog.commitAll(root, Map(bad -> Seq(1L).toDF("n"))))
      }
      assert(Catalog.catalogVersion(root) == -1, "a rejected name committed")
    } finally graft.io.Sources.removeScratchDir(root)
  }
}
