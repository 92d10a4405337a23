package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the r14 chain-read schema cache ([[graft.lake.Mor]] readDir
  * via the public Versions read path): cached reads return the same
  * rows, and a version directory deleted and RECREATED at the same
  * path (rollback / orphan-reclaim shapes) with a different schema is
  * never poisoned by a stale cache entry — the (path, mtime) key must
  * miss. */
class MorReadDirSpec extends AnyFunSuite with graft.SparkSpec {

  test("chain reads are row-identical across repeated reads (cache warm)") {
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_readdir_rows")
    try {
      val base = (1L to 100L).map(k => (k, k * 10)).toDF("k", "v")
      Versions.commit(base, root)
      Versions.commitDelete(Seq(3L, 5L).toDF("k"), root, "k",
        autoCompactAt = 0)
      val first = Versions.read(spark, root).orderBy("k").collect()
      val second = Versions.read(spark, root).orderBy("k").collect()
      assert(first.toSeq == second.toSeq && first.length == 98)
    } finally graft.io.Sources.removeScratchDir(root)
  }

  test("recreated version dir at the same path is re-inferred, not served stale") {
    import spark.implicits._
    val root = graft.io.Sources.scratchDir("graft_readdir_recreate")
    try {
      Versions.commit(Seq((1L, "a")).toDF("k", "s"), root)
      Versions.commit(Seq((2L, "b")).toDF("k", "s"), root) // v1
      assert(Versions.read(spark, root, 1).columns.toSeq == Seq("k", "s"))
      // roll v1 back (deletes the directory), then recommit a DIFFERENT
      // schema at the same v1 path — mtime differs, so the cache must
      // miss and the new schema must surface
      Versions.rollbackTo(root, keep = 0, made = 1)
      Thread.sleep(5) // ensure a distinct directory mtime
      Versions.commit(Seq((9L, 7L, true)).toDF("k", "n", "flag"), root)
      val re = Versions.read(spark, root, 1)
      assert(re.columns.toSeq == Seq("k", "n", "flag"))
      assert(re.collect().map(_.getLong(1)).toSeq == Seq(7L))
    } finally graft.io.Sources.removeScratchDir(root)
  }
}
