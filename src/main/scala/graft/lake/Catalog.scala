package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * MULTI-TABLE ATOMIC COMMITS — a catalog-level meta-log over
 * [[Versions]] tables (the Iceberg REST-catalog multi-table
 * transaction shape, public docs: single-table commits cannot keep two
 * tables mutually consistent, so the catalog's OWN pointer names a
 * `(table → version)` snapshot and flips once for all of them).
 *
 * Layout: each member table is an ordinary [[Versions]] root under
 * `root/<table>`; the catalog manifest `root/_catalog` is one line —
 * `tableA=vA tableB=vB …` — staged and atomically renamed, exactly the
 * [[Versions]] pointer-flip discipline lifted one level.
 *
 * The protocol ([[commitAll]]): commit every table's new version
 * FIRST (each is immutable and, crucially, NOT yet referenced by the
 * catalog), then flip the catalog pointer once. A crash anywhere
 * before the flip leaves the catalog on the OLD snapshot: the
 * already-committed new versions are merely unreferenced — readers
 * that go through the catalog ([[read]]) can never see them, so no
 * torn state (table A new + table B old) is observable. Unreferenced
 * versions are reclaimed later by [[vacuumTo]], which vacuums each
 * member table below its cataloged version — retention derives from
 * the snapshot, so it can never reclaim what the catalog still names.
 *
 * At 100 TB: N table commits (each a directory write + O(1) flip) plus
 * ONE catalog rename, regardless of data size. Single-writer at the
 * catalog level, like [[Versions]]; the [[TxLog]] CAS upgrade applies
 * the same way one level up.
 */
object Catalog {

  private def manifest(root: String) = new java.io.File(root, "_catalog")

  /** The cataloged snapshot: table → version. Empty map for a fresh
    * catalog. */
  def snapshot(root: String): Map[String, Int] = {
    val m = manifest(root)
    if (!m.isFile) Map.empty
    else new String(
      java.nio.file.Files.readAllBytes(m.toPath), "UTF-8").trim
      .split("\\s+").filter(_.nonEmpty)
      .map { tok =>
        val Array(t, v) = tok.split("=")
        t -> v.toInt
      }.toMap
  }

  /** Commit new contents for SEVERAL tables as one atomic unit: all
    * become visible together, or none do. Returns the new snapshot. */
  def commitAll(root: String, updates: Map[String, DataFrame]): Map[String, Int] = {
    require(updates.nonEmpty, "empty multi-table commit")
    val prev = snapshot(root)
    // phase 1: commit every table — new versions exist but are
    // UNREFERENCED until the catalog flip, so a crash here is invisible
    val next = prev ++ updates.toSeq.sortBy(_._1).map { case (t, df) =>
      t -> Versions.commit(df, s"$root/$t")
    }
    // phase 2: ONE atomic pointer flip for the whole snapshot
    val line = next.toSeq.sortBy(_._1)
      .map { case (t, v) => s"$t=$v" }.mkString(" ") + "\n"
    val tmp = new java.io.File(root, "_catalog.tmp")
    java.nio.file.Files.write(tmp.toPath, line.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, manifest(root).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Read a member table AT THE CATALOGED VERSION — the only read path
    * that sees mutually-consistent tables. Pass an explicit `asOf`
    * snapshot (from [[snapshot]]) to pin a multi-query pipeline to one
    * consistent cut across ALL tables, the cross-table form of
    * [[Versions.snapshot]]. */
  def read(spark: SparkSession, root: String, table: String,
           asOf: Map[String, Int] = null): DataFrame = {
    val snap = Option(asOf).getOrElse(snapshot(root))
    val v = snap.getOrElse(table,
      throw new IllegalArgumentException(
        s"table $table is not in the catalog snapshot under $root"))
    Versions.read(spark, s"$root/$table", v)
  }

  /** Retention derived FROM the snapshot: vacuum every member table
    * below its cataloged version. Unreferenced newer versions (a
    * crashed phase-1 commit) age out through each table's own orphan
    * rule on its next commit; cataloged versions can never be
    * reclaimed here by construction. Returns directories reclaimed. */
  def vacuumTo(root: String): Int = {
    val snap = snapshot(root)
    snap.toSeq.sortBy(_._1).map { case (t, v) =>
      Versions.vacuum(s"$root/$t", keepFrom = v)
    }.sum
  }
}
