package graft.lake

/**
 * The numbered put-if-absent record log shared by [[TxLog]] (commit
 * records under `_commits`) and [[Catalog]] (snapshot records under
 * `_catalog`): zero-padded decimal names, a digit-filtered listing,
 * and a stage-then-`link(2)` commit point that either creates the
 * record fully formed or reports it already taken. POSIX `rename(2)`
 * silently REPLACES an existing target, so `link(2)` — which fails
 * atomically with EEXIST — is the only rename-family primitive that
 * can serve as the CAS. The staged temp file is always removed,
 * whatever the link outcome (success, lost race, or an unexpected
 * I/O error), so the log directory never accumulates `_tmp-*` stubs.
 */
private[lake] object CasLog {

  def recordFile(dir: java.io.File, n: Int): java.io.File =
    new java.io.File(dir, f"$n%010d")

  def listed(dir: java.io.File): Seq[Int] =
    Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isFile).map(_.getName)
      .filter(_.matches("\\d+")).map(_.toInt)

  /** Highest record number, or -1 for an empty log. */
  def maxRecord(dir: java.io.File): Int = {
    val ns = listed(dir)
    if (ns.isEmpty) -1 else ns.max
  }

  /** Atomically create `target` with `line` — true if THIS call
    * created it, false if another writer got there first. */
  def putIfAbsentAt(target: java.io.File, line: String): Boolean = {
    val dir = target.getParentFile
    dir.mkdirs()
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new java.io.File(dir, s"_tmp-${target.getName}-$nonce")
    java.nio.file.Files.write(tmp.toPath, line.getBytes("UTF-8"))
    try {
      java.nio.file.Files.createLink(target.toPath, tmp.toPath)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally { tmp.delete(); () }
  }

  /** Atomically create record `n` with `line` — true if THIS call won
    * the CAS, false if another writer committed `n` first. */
  def putIfAbsent(dir: java.io.File, n: Int, line: String): Boolean =
    putIfAbsentAt(recordFile(dir, n), line)
}
