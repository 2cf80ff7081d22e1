package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Streaming half of the s19 CDC tier: a changelog FEED (parquet files
  * of (key, op, payload) rows landing in a directory — what
  * [[graft.operators.SnapshotDiff.changelog]] emits per release)
  * applied continuously, so a downstream replica converges to each
  * release without ever rescanning the full corpus.
  *
  * Each micro-batch applies its rows through
  * [[graft.operators.SnapshotDiff.applyChanges]] against the last
  * COMMITTED state version; the new state lands copy-on-write as
  * `v_<batchId>` with a commit marker dropped only after the write
  * completes (streamingMergeUpsert's discipline: a crash leaves either
  * no new version — replay rewrites it — or an unmarked one — ignored
  * and rewritten — never a half-applied table). A batchId already
  * marked committed is skipped, so checkpoint replays are idempotent.
  *
  * Ordering contract: within one changelog each key appears once, so
  * batches that split a changelog are key-disjoint and commute;
  * applying SUCCESSIVE changelogs requires file-arrival order (the
  * file-stream source lists in discovery order — one changelog per
  * landing, as the batch operator emits them).
  *
  * Scale: each batch shuffles |state| + |changes| on the key — the
  * incremental-sync cost the batch applyChanges scaladoc names, paid
  * per batch instead of per release. Retention keeps the two newest
  * committed versions (current + crash-recovery), GC'd marker-last. */
object ChangelogStream {

  def applyChangelogStreaming(spark: SparkSession, srcDir: String,
      stateDir: String, initial: DataFrame,
      keyCols: Seq[String], valueCols: Seq[String],
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val cols = (keyCols ++ valueCols).map(col)
    // state-version markers and listing go through the Hadoop
    // FileSystem API, the SAME api the version data is written/deleted
    // with (round-8 ADVICE: java.io.File silently returns nothing on a
    // non-local stateDir, so committed() was always empty there — the
    // initial state was rewritten every call and marker creation failed
    // unchecked). Marker creation/deletion results are CHECKED: a
    // marker that didn't land means the commit protocol is broken, and
    // continuing would replay or GC the wrong version.
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def marker(id: Long) = new org.apache.hadoop.fs.Path(statePath, s"_committed_$id")
    def committed(): Seq[Long] = {
      val statuses =
        try fs.listStatus(statePath)
        catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] }
      statuses.map(_.getPath.getName).collect {
        case n if n.startsWith("_committed_") => n.stripPrefix("_committed_").toLong
      }.toSeq.sorted
    }
    def writeMarker(id: Long): Unit =
      // create(overwrite=false): a pre-existing marker is a protocol
      // violation (the batch-skip check above it should have fired)
      fs.create(marker(id), false).close()
    def versionPath(id: Long) = s"$stateDir/v_$id"

    // v_-1: the initial replica state, committed before the stream runs
    if (committed().isEmpty) {
      initial.select(cols: _*).write.mode("overwrite").parquet(versionPath(-1L))
      writeMarker(-1L)
    }

    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)

    val q = stream.writeStream
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!committed().contains(batchId)) {
          val cur = spark.read.parquet(versionPath(committed().last))
          val next = graft.operators.SnapshotDiff.applyChanges(
            cur, batch, keyCols, valueCols)
          next.write.mode("overwrite").parquet(versionPath(batchId))
          writeMarker(batchId)
          // GC old versions MARKER-LAST (data first): a crash between
          // the two deletes leaves an unmarked data dir, which is
          // ignored — never a marker pointing at deleted data
          committed().dropRight(2).foreach { old =>
            fs.delete(new org.apache.hadoop.fs.Path(versionPath(old)), true)
            if (!fs.delete(marker(old), false))
              System.err.println(s"[changelog-stream] WARNING: stale marker _committed_$old not deleted")
          }
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(versionPath(committed().last))
  }
}
