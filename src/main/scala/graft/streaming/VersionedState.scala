package graft.streaming

import org.apache.spark.sql.SparkSession

/** Copy-on-write versioned-state directory with commit markers — the
  * crash protocol shared by [[ChangelogStream]] (CDC replica state)
  * and [[Scd2Stream]] (maintained dimension): state version
  * `v_<batchId>` is written FIRST, its `_committed_<batchId>` marker
  * only after the write completes, so a crash leaves either no new
  * version (replay rewrites it) or an unmarked one (ignored and
  * rewritten) — never a half-applied table. Marked batchIds are
  * skipped by callers, making checkpoint replays idempotent.
  *
  * GC of superseded versions deletes the MARKER FIRST, then the data:
  * a crash between the two deletes leaves an unmarked data dir, which
  * every reader ignores — the invariant is "a marker implies readable
  * version data", and deleting data before its marker would violate
  * it in exactly the crash window GC exists to survive. (The orphaned
  * unmarked dir is storage, not correctness; the next successful GC
  * pass of the same id removes it via the idempotent delete.)
  *
  * All filesystem access goes through the Hadoop FileSystem API (the
  * round-8 ADVICE fix: java.io.File silently no-ops on a non-local
  * stateDir), and marker-creation results are checked — a marker that
  * didn't land means the protocol is broken and continuing would
  * replay or GC the wrong version. */
private[graft] final class VersionedState(spark: SparkSession, stateDir: String,
    warnTag: String) {
  private val statePath = new org.apache.hadoop.fs.Path(stateDir)
  private val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(id: Long) =
    new org.apache.hadoop.fs.Path(statePath, s"_committed_$id")

  def committed(): Seq[Long] = {
    val statuses =
      try fs.listStatus(statePath)
      catch { case _: java.io.FileNotFoundException =>
        Array.empty[org.apache.hadoop.fs.FileStatus] }
    statuses.map(_.getPath.getName).collect {
      case n if n.startsWith("_committed_") => n.stripPrefix("_committed_").toLong
    }.toSeq.sorted
  }

  /** create(overwrite=false): a pre-existing marker is a protocol
    * violation (the caller's batch-skip check should have fired). */
  def writeMarker(id: Long): Unit = fs.create(marker(id), false).close()

  def versionPath(id: Long): String = s"$stateDir/v_$id"

  /** Seed version -1 (the initial state) if nothing is committed yet. */
  def ensureInitial(write: String => Unit): Unit =
    if (committed().isEmpty) {
      write(versionPath(-1L))
      writeMarker(-1L)
    }

  /** Retain the newest two committed versions (current +
    * crash-recovery); delete older ones marker-first (see scaladoc). */
  def gcOldVersions(): Unit =
    committed().dropRight(2).foreach { old =>
      if (!fs.delete(marker(old), false))
        System.err.println(
          s"[$warnTag] WARNING: stale marker _committed_$old not deleted")
      fs.delete(new org.apache.hadoop.fs.Path(versionPath(old)), true)
    }
}
