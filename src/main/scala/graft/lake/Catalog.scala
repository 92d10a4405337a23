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
 * `root/<table>`; the catalog log `root/_catalog/<N>` holds one record
 * per catalog version — a single line `tableA=vA tableB=vB …` — and
 * the COMMIT POINT is put-if-absent creation of record `<N>` via
 * `link(2)` (staged to a temp name, then hard-linked into place —
 * link fails atomically with EEXIST where rename would silently
 * replace), exactly the [[TxLog]] CAS one level up. Two concurrent
 * multi-table transactions therefore CONFLICT LOUDLY
 * ([[CommitConflict]]) instead of last-write-wins losing a snapshot;
 * the loser re-reads the winner's snapshot and re-applies
 * ([[transact]] is that rebase loop).
 *
 * The protocol ([[commitAll]]): commit every table's new version
 * FIRST (each is immutable and, crucially, NOT yet referenced by the
 * catalog), then link the catalog record once. A crash — or a lost
 * CAS — anywhere before the link leaves the catalog on the OLD
 * snapshot: the already-committed new versions are merely unreferenced
 * — readers that go through the catalog ([[read]]) can never see them,
 * so no torn state (table A new + table B old) is observable.
 * Unreferenced versions age out once later commits raise each member's
 * cataloged floor and [[vacuumTo]] runs — retention derives from the
 * snapshot, so it can never reclaim what the catalog still names.
 *
 * Member-table contract: phase 1 commits through each member's OWN
 * commit discipline ([[Versions]] here — single writer per member
 * table, violations fail loudly in `reclaimOrphan`). The catalog CAS
 * serializes the cross-table FLIP; transactions that race on the same
 * member table additionally contend there, exactly as two Iceberg
 * transactions updating one table contend on its metadata pointer.
 *
 * At 100 TB: N table commits (each a directory write + O(1) flip) plus
 * ONE tiny record link, regardless of data size. Old catalog records
 * are kept — they are the cross-table time-travel history ([[read]]
 * with an explicit snapshot) — and cost bytes each, until [[vacuumTo]]
 * collapses history to the current snapshot or [[vacuumAged]] prunes
 * it by age (both prune records together with their data, so a
 * listable record always has a readable snapshot).
 */
object Catalog {

  private def logDir(root: String) = new java.io.File(root, "_catalog")

  private def recordFile(root: String, n: Int) =
    CasLog.recordFile(logDir(root), n)

  private def listed(root: String): Seq[Int] = CasLog.listed(logDir(root))

  /** Highest committed catalog version, or -1 for a fresh catalog. */
  def catalogVersion(root: String): Int = CasLog.maxRecord(logDir(root))

  /** The snapshot a specific catalog version recorded: table →
    * member-table version. */
  def snapshotAt(root: String, n: Int): Map[String, Int] = {
    val f = recordFile(root, n)
    require(f.isFile, s"catalog version $n under $root was never committed")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
      .split("\\s+").filter(_.nonEmpty)
      .map { tok =>
        val Array(t, v) = tok.split("=")
        t -> v.toInt
      }.toMap
  }

  /** The current cataloged snapshot: table → version. Empty map for a
    * fresh catalog. */
  def snapshot(root: String): Map[String, Int] = {
    val n = catalogVersion(root)
    if (n < 0) Map.empty else snapshotAt(root, n)
  }

  /** Commit new contents for SEVERAL tables as one atomic unit AT
    * catalog version `expected + 1`: all become visible together, or
    * none do. Fails with [[CommitConflict]] if another transaction
    * committed `expected + 1` first — before phase 1 when the catalog
    * has already moved (cheap early exit), or at the put-if-absent
    * link for a true photo-finish race; the loser's phase-1 member
    * versions stay unreferenced by the catalog (readers never see
    * them) and age out under later floors. Returns the new snapshot. */
  def commitAll(root: String, updates: Map[String, DataFrame],
                expected: Int): Map[String, Int] = {
    require(updates.nonEmpty, "empty multi-table commit")
    updates.keys.foreach(t => require(
      t.matches("[A-Za-z0-9_.-]+") && t != "." && t != "..",
      s"table name '$t' would corrupt the catalog record or escape " +
        "the catalog root"))
    val n = expected + 1
    if (catalogVersion(root) != expected)
      throw new CommitConflict(n,
        s"expected catalog version $expected but $root is at " +
          s"${catalogVersion(root)}")
    val prev = if (expected < 0) Map.empty[String, Int]
               else snapshotAt(root, expected)
    // phase 1: commit every table — new versions exist but are
    // UNREFERENCED until the catalog record lands, so a crash (or a
    // lost CAS below) here is invisible through the catalog
    val next = prev ++ updates.toSeq.sortBy(_._1).map { case (t, df) =>
      t -> Versions.commit(df, s"$root/$t")
    }
    // phase 2: ONE put-if-absent record for the whole snapshot
    // ([[CasLog]] — link(2) fails atomically with EEXIST if the record
    // exists; rename would silently REPLACE, losing the winner's
    // snapshot)
    val line = next.toSeq.sortBy(_._1)
      .map { case (t, v) => s"$t=$v" }.mkString(" ") + "\n"
    if (CasLog.putIfAbsent(logDir(root), n, line)) next
    else throw new CommitConflict(n,
      s"catalog version $n under $root was committed by another " +
        "transaction")
  }

  /** [[commitAll]] against the snapshot read at entry — still CAS'd,
    * so a race conflicts loudly rather than losing a snapshot. */
  def commitAll(root: String, updates: Map[String, DataFrame]): Map[String, Int] =
    commitAll(root, updates, catalogVersion(root))

  /** The optimistic multi-table transaction loop: read the current
    * snapshot, build the updates FROM it (read member tables with
    * [[read]]`(…, asOf = snap)` so the transaction is internally
    * consistent), try to commit; on [[CommitConflict]] re-read the
    * winner's snapshot and re-apply. Returns the committed snapshot. */
  def transact(root: String, maxRetries: Int = 20)
              (make: Map[String, Int] => Map[String, DataFrame]): Map[String, Int] = {
    var attempt = 0
    while (true) {
      val expected = catalogVersion(root)
      val snap = if (expected < 0) Map.empty[String, Int]
                 else snapshotAt(root, expected)
      try return commitAll(root, make(snap), expected)
      catch {
        case c: CommitConflict =>
          attempt += 1
          if (attempt > maxRetries) throw c
      }
    }
    Map.empty // unreachable
  }

  /** Read a member table AT THE CATALOGED VERSION — the only read path
    * that sees mutually-consistent tables. Pass an explicit `asOf`
    * snapshot (from [[snapshot]]/[[snapshotAt]]) to pin a multi-query
    * pipeline to one consistent cut across ALL tables, the cross-table
    * form of [[Versions.snapshot]]. */
  def read(spark: SparkSession, root: String, table: String,
           asOf: Map[String, Int] = null): DataFrame = {
    val snap = Option(asOf).getOrElse(snapshot(root))
    val v = snap.getOrElse(table,
      throw new IllegalArgumentException(
        s"table $table is not in the catalog snapshot under $root"))
    Versions.read(spark, s"$root/$table", v)
  }

  /** Retention derived FROM the snapshot: collapse the cross-table
    * history to the CURRENT snapshot. Superseded catalog records are
    * pruned FIRST, then every member table is vacuumed below its
    * cataloged version — so "the record exists" stays equivalent to
    * "its snapshot is readable" (vacuuming data under a record that
    * remained listable would strand as-of readers at the `_SUCCESS`
    * gate with a snapshot map that still resolves). Reads of a pruned
    * snapshot fail loudly in [[snapshotAt]]. Unreferenced newer
    * versions (a crashed or CAS-lost phase-1 commit) age out through
    * each table's own orphan rule on its next commit; the current
    * snapshot's versions can never be reclaimed here by construction.
    * For age-windowed retention that KEEPS readable history, use
    * [[vacuumAged]]. Returns member directories reclaimed. */
  def vacuumTo(root: String): Int = {
    val cur = catalogVersion(root)
    if (cur < 0) return 0
    listed(root).filter(_ < cur).foreach(n => recordFile(root, n).delete())
    snapshotAt(root, cur).toSeq.sortBy(_._1).map { case (t, v) =>
      Versions.vacuum(s"$root/$t", keepFrom = v)
    }.sum
  }

  /** AGE-BASED retention across the whole catalog: first prune catalog
    * RECORDS older than `maxAgeMs` (never the newest — the current
    * snapshot always stays addressable), then reclaim member-table
    * versions older than the window EXCEPT any version a RETAINED
    * record still names ([[Versions.vacuumAged]]'s `keep` set) — so
    * cataloged history, however old, stays readable by construction,
    * and an as-of pipeline pinned to a retained snapshot can never
    * lose a table out from under it. Returns member directories
    * reclaimed. */
  def vacuumAged(root: String, maxAgeMs: Long): Int = {
    val cur = catalogVersion(root)
    if (cur < 0) return 0
    val now = System.currentTimeMillis()
    listed(root).filter(n => n < cur &&
        now - recordFile(root, n).lastModified() >= maxAgeMs)
      .foreach(n => recordFile(root, n).delete())
    val retained = listed(root).map(snapshotAt(root, _))
    retained.flatMap(_.keys).distinct.sorted.map { t =>
      val keep = retained.flatMap(_.get(t)).toSet
      Versions.vacuumAged(s"$root/$t", maxAgeMs, keep)
    }.sum
  }
}
