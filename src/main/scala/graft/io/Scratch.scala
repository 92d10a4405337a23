package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * "Build once, probe many" scratch tables: a derived table that several
 * registered queries share (the co-supply edge graph, its triangle set)
 * is built ONCE per (session, sfDir, kind), written to scratch parquet,
 * and every consumer reads the persisted copy — the exact pattern
 * [[graft.sim.Ivf.persistedIndex]] established for the IVF index (q130).
 * At 100 TB this is how a real pipeline amortizes an expensive
 * projection: the build pays the fact-table scan + pair generation one
 * time, and the 8 graph-mining queries downstream each pay only a read
 * of the (much smaller) derived table. Oracles are unaffected — they
 * replay the defining CTE chain against the raw tables.
 */
object Scratch {
  // Holder futures, not values: computeIfAbsent only INSERTS the future
  // (cheap, never blocks on other keys); the build itself runs outside
  // the map's lock stripe, so a build closure that recursively resolves
  // ANOTHER scratch kind cannot self-deadlock the map.
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String),
    java.util.concurrent.CompletableFuture[String]]()

  /** Kinds built since the last [[drainBuilt]] — lets [[graft.Bench]]
    * annotate WHICH query paid a shared build without changing any
    * timing. */
  private val built = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private[graft] def drainBuilt(): Seq[String] = {
    val out = Seq.newBuilder[String]
    var k = built.poll()
    while (k != null) { out += k; k = built.poll() }
    out.result()
  }

  /**
   * Read the persisted table `kind` for (spark, sfDir), building it
   * via `build` on first use in the session. The build is evaluated at
   * most once per key: computeIfAbsent installs only a lazy holder
   * (a CompletableFuture), and the thread that won the install runs the
   * Spark job OUTSIDE the map lock — so a build closure that itself
   * calls [[table]] for another kind serializes safely instead of
   * deadlocking (nested computeIfAbsent on one ConcurrentHashMap can
   * deadlock on a shared lock stripe). A failed build evicts its holder
   * so a later caller can retry. Stopped sessions' entries are lazily
   * evicted so the map never pins a dead session for the life of the
   * JVM (the on-disk dirs are scratch space and clean up with the JVM's
   * shutdown hook).
   */
  def table(spark: SparkSession, sfDir: String, kind: String)
           (build: => DataFrame): DataFrame =
    Sources.cachedParquet(spark, tablePath(spark, sfDir, kind)(build))

  /** [[table]] returning the persisted PATH instead of a DataFrame —
    * for consumers that must re-read the table on a DIFFERENT session
    * than the memo key (e.g. a streaming child session joining the
    * parent-built index: the build runs once on the parent, the child
    * reads the files). */
  def tablePath(spark: SparkSession, sfDir: String, kind: String)
               (build: => DataFrame): String = {
    memo.keySet.removeIf(
      (k: (SparkSession, String, String)) => k._1.sparkContext.isStopped)
    val key = (spark, sfDir, kind)
    val holder = new java.util.concurrent.CompletableFuture[String]()
    val installed = memo.computeIfAbsent(key,
      (_: (SparkSession, String, String)) => holder)
    if (installed eq holder) {
      // this thread owns the build; run it outside the map's lock
      try {
        val d = Sources.scratchDir(s"graft_shared_$kind")
        build.write.mode("overwrite").parquet(d)
        built.add(kind)
        holder.complete(d)
      } catch {
        case t: Throwable =>
          memo.remove(key, holder) // let a later caller retry
          holder.completeExceptionally(t)
          throw t
      }
    }
    installed.join()
  }
}
