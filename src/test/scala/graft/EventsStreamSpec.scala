package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

class EventsStreamSpec extends SparkSpec {

  test("streaming windowed aggregate equals the batch aggregate") {
    val batch = EventsStream.windowedCountsBatch(spark, sfDir)
    val stream = EventsStream.windowedCountsStreaming(spark, sfDir, "events_stream_spec")
    assert(batch.count() > 0)
    assert(stream.exceptAll(batch).count() === 0, "streaming rows not in batch")
    assert(batch.exceptAll(stream).count() === 0, "batch rows not in streaming")
  }

  test("streaming MERGE upsert converges to the batch aggregate across micro-batches") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_merge").toString
    // split the events into 3 source files so maxFilesPerTrigger=1
    // yields 3 genuine micro-batches, each merged into the state table
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("value"))
    ev.repartition(3).write.parquet(s"$tmp/src")
    assert(spark.read.parquet(s"$tmp/src").inputFiles.length >= 3)

    val state = EventsStream.streamingMergeUpsert(spark, s"$tmp/src", s"$tmp/state")
    val expected = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("total_value"))
    assert(state.count() === expected.count())
    assert(state.exceptAll(expected).count() === 0, "state rows not in batch aggregate")
    assert(expected.exceptAll(state).count() === 0, "batch rows missing from state")

    // ≥3 micro-batches actually ran (batch ids start at 0, so the
    // newest marker id is ≥2), retention kept exactly the 2 newest
    // versions (current + crash-recovery), and older versions are GC'd
    // — an unbounded stream must not accumulate v_0..v_N forever
    val stateFiles = new java.io.File(s"$tmp/state").listFiles().map(_.getName)
    val markerIds = stateFiles.collect {
      case n if n.startsWith("_committed_") => n.stripPrefix("_committed_").toLong
    }.sorted
    assert(markerIds.nonEmpty && markerIds.last >= 2,
      s"expected newest batch id >=2, got ${markerIds.mkString(",")}")
    assert(markerIds.length <= 2,
      s"retention must keep <=2 versions, got markers ${markerIds.mkString(",")}")
    val versionDirs = stateFiles.filter(_.startsWith("v_")).map(_.stripPrefix("v_").toLong)
    assert(versionDirs.sorted.toSeq === markerIds.toSeq,
      s"on-disk versions ${versionDirs.sorted.mkString(",")} != markers ${markerIds.mkString(",")}")
    val replayed = EventsStream.streamingMergeUpsert(spark, s"$tmp/src", s"$tmp/state")
    assert(replayed.exceptAll(expected).count() === 0 &&
      expected.exceptAll(replayed).count() === 0,
      "replaying committed batches must not change the state")
  }

  test("stream-stream interval join emits exactly the batch band pairs") {
    val stream = EventsStream.viewPurchaseJoinStreaming(spark, sfDir, "ss_join_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = Tables.events(spark, sfDir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
    val batch = p.join(v,
        col("user_id") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr(
            s"INTERVAL ${graft.operators.AsofJoin.HorizonMinutes} MINUTES"))
      .select("p_id", "v_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture has no view→purchase pairs in the band")
    assert(stream === batch)
  }
}
