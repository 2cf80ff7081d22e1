package graft

import org.apache.spark.sql.functions._
import graft.operators.SnapshotDiff
import graft.streaming.ChangelogStream

class ChangelogStreamSpec extends SparkSpec {

  test("streamed changelog application converges to the batch release") {
    val keys = Seq("doc_id"); val vals = Seq("text", "lang", "source")
    val v1 = Tables.documents(spark, sfDir)
    val v2 = SnapshotDiff.nextRelease(v1)
    val log = SnapshotDiff.changelog(v1, v2, keys, vals)

    // split the (key-disjoint) changelog across two PLAIN parquet
    // files (copied out of single-part Spark writes) so
    // maxFilesPerTrigger=1 forces two micro-batches
    val srcDir = java.nio.file.Files.createTempDirectory("graft_cl_src").toString
    val flat = java.nio.file.Files.createTempDirectory("graft_cl_flat").toString
    Seq(("part_a", "cl_a.parquet", 0), ("part_b", "cl_b.parquet", 1)).foreach {
      case (tmp, dest, parity) =>
        log.filter(pmod(col("doc_id"), lit(2)) === parity)
          .coalesce(1).write.mode("overwrite").parquet(s"$srcDir/$tmp")
        val part = new java.io.File(s"$srcDir/$tmp").listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(part.toPath,
          java.nio.file.Paths.get(flat, dest),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    val stateDir = java.nio.file.Files.createTempDirectory("graft_cl_state").toString
    val replica = ChangelogStream.applyChangelogStreaming(
      spark, flat, stateDir, v1, keys, vals)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select((keys ++ vals).map(col): _*)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rows(replica) === rows(v2), "replica must equal the release after draining the feed")

    // at least two state versions were committed (one per micro-batch
    // beyond the initial), and retention kept at most two
    val committed = new java.io.File(stateDir).listFiles()
      .map(_.getName).filter(_.startsWith("_committed_"))
    assert(committed.length <= 2, s"retention must GC old versions: ${committed.toSeq}")

    // re-running over the same feed + checkpoint is a no-op (idempotent)
    val replay = ChangelogStream.applyChangelogStreaming(
      spark, flat, stateDir, v1, keys, vals)
    assert(rows(replay) === rows(v2))
  }
}
