package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Minimal versioned-table layout — the lakehouse COMMIT primitive the
 * MERGE family (q320/q324) and the incremental-view / vacuum queries
 * (q325/q326) build on. Each version is an immutable parquet directory
 * `v<N>` under the table root; the CURRENT version is a one-line
 * `_current` manifest naming it. A commit is
 * write-new-directory-then-flip-pointer:
 *
 *   - readers of the old version are never disturbed (its files are
 *     immutable and stay on disk until [[vacuum]]);
 *   - a crash before the pointer flip leaves the old version current —
 *     the half-written directory is garbage, never corruption;
 *   - time travel is just [[read]] with an explicit version that
 *     vacuum hasn't reclaimed yet;
 *   - at 100 TB the pointer flip is O(1) regardless of table size —
 *     the same role Delta Lake's `_last_checkpoint` and Iceberg's
 *     `version-hint.text` play (public formats; here reduced to the
 *     single-writer harness case, so the manifest write IS the commit
 *     with no CAS needed).
 *
 * The reference has no storage engine at all (pandas frames die with
 * the Streamlit process, SURVEY.md §0) — this is part of the scale
 * extension surface.
 */
object Versions {

  private def manifest(root: String) = new java.io.File(root, "_current")

  private def manifestTokens(root: String): Array[String] = {
    val m = manifest(root)
    if (!m.isFile) Array.empty
    else new String(
      java.nio.file.Files.readAllBytes(m.toPath), "UTF-8").trim
      .split("\\s+")
  }

  /** Highest committed version, or -1 for an empty table root. */
  def current(root: String): Int = {
    val t = manifestTokens(root)
    if (t.isEmpty) -1 else t(0).toInt
  }

  /** The writer transaction id recorded by the LAST commit (-1 if the
    * last commit carried none, or the table is empty). Because the id
    * rides the `_current` pointer flip itself, "txn recorded" and
    * "version visible" are ONE atomic step — the idempotence handle a
    * streaming writer needs (Delta's `txn` action, public docs). */
  def lastTxn(root: String): Long = {
    val t = manifestTokens(root)
    if (t.length < 2) -1L else t(1).toLong
  }

  /** Commit `df` as the next version: write `v<N>` fully, then flip
    * the `_current` pointer. Returns N.
    *
    * Crash recovery: a writer that died between starting the `v<N>`
    * write and flipping the pointer leaves a half-written `v<N>`
    * directory that is provably garbage (the pointer never reached it,
    * so no reader can hold it) — it is cleared here so a crashed
    * commit never wedges the table. Single-writer contract, as stated
    * on the object. */
  def commit(df: DataFrame, root: String, txn: Long = -1L): Int = {
    val n = current(root) + 1
    val orphan = new java.io.File(root, s"v$n")
    if (orphan.isDirectory) {
      def rmTree(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
      }
      rmTree(orphan)
    }
    df.write.mode("errorifexists").parquet(s"$root/v$n")
    val tmp = new java.io.File(root, s"_current.tmp$n")
    val line = if (txn >= 0) s"$n $txn\n" else s"$n\n"
    java.nio.file.Files.write(tmp.toPath, line.getBytes("UTF-8"))
    // atomic on POSIX; object stores swap this for a CAS'd manifest PUT
    java.nio.file.Files.move(tmp.toPath, manifest(root).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    n
  }

  /** Read a version (default: current). Reading a vacuumed or
    * never-committed version fails loudly (no files ≠ empty table). */
  def read(spark: SparkSession, root: String, version: Int = -1): DataFrame = {
    val v = if (version >= 0) version else current(root)
    require(v >= 0, s"no committed version under $root")
    require(new java.io.File(root, s"v$v").isDirectory,
      s"version $v under $root is vacuumed or was never committed")
    spark.read.parquet(s"$root/v$v")
  }

  /** Retention: remove all versions BELOW `keepFrom` (the current
    * version is always kept regardless). Returns the number of version
    * directories reclaimed. Time travel to a vacuumed version fails
    * loudly in [[read]] — the retention/readability trade every
    * lakehouse exposes. */
  def vacuum(root: String, keepFrom: Int): Int = {
    val cur = current(root)
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
    }
    val victims = Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .filter(f => f.getName.stripPrefix("v").toInt < math.min(keepFrom, cur))
    victims.foreach(rmTree)
    victims.size
  }
}
