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

  test("stream-stream join across micro-batches drops a late view beyond the watermark") {
    import java.sql.Timestamp
    val root = java.nio.file.Files.createTempDirectory("graft_ss_late")
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()
    def t(min: Long) = Timestamp.valueOf(java.time.LocalDateTime
      .of(2024, 1, 1, 0, 0).plusMinutes(min))
    import spark.implicits._
    def land(name: String, rows: Seq[(Long, String, String, Timestamp)],
        modTime: Long): Unit = {
      val tmp = s"$root/stage_$name"
      rows.toDF("event_id", "user_id", "event_type", "ts")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
      val dst = new java.io.File(srcDir, name)
      assert(part.renameTo(dst))
      assert(dst.setLastModified(modTime))
    }
    // Three batches pin the eviction semantics, each element earned
    // empirically:
    //  - the global watermark is the MIN across the two watermarked
    //    sides, so BOTH sides carry a stray@130 (different users, no
    //    cross pairs) or one lagging side pins the watermark low;
    //  - an interval join never drops input by the raw watermark — a
    //    late row joins whatever state remains — so the drop is
    //    observable only once the doomed purchase's state is GONE;
    //  - state eviction runs with the batch-START watermark, so P1
    //    survives the very batch that raised the watermark past its
    //    band and is evicted one batch LATER. Hence 3 files: raise,
    //    evict, then the late arrival.
    val now = System.currentTimeMillis()
    // batch 1: P1@100 + V1@95 pair (horizon 10 min); strays@130 push
    // the 20-min watermark to 110 — past P1's whole view band [90,100]
    land("f1.parquet", Seq(
      (1L, "a", "purchase", t(100)),
      (2L, "a", "view", t(95)),
      (9L, "y", "view", t(130)),
      (10L, "z", "purchase", t(130))), now - 120000)
    // batch 2: runs WITH wm=110 → evicts P1 (100 < 110) after joining
    // its own fresh pair P2@135 + V3@132
    land("f2.parquet", Seq(
      (4L, "b", "purchase", t(135)),
      (5L, "b", "view", t(132))), now - 60000)
    // batch 3: V2@99 for user a is INSIDE P1's band — the batch join
    // pairs it — but P1's state is evicted and 99 is below the
    // view-side state watermark, so streaming must NOT emit (1,3)
    land("f3.parquet", Seq(
      (3L, "a", "view", t(99))), now)

    val got = EventsStream.viewPurchaseJoinStreamingMulti(spark, srcDir, "ss_late_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // sanity: an unwatermarked batch band join WOULD pair (1,3) — the
    // only difference streaming may introduce is the late-data drop
    val e = spark.read.parquet(srcDir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
    val batchPairs = p.join(v,
        col("user_id") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr(
            s"INTERVAL ${graft.operators.AsofJoin.HorizonMinutes} MINUTES"))
      .select("p_id", "v_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs === Set((1L, 2L), (1L, 3L), (4L, 5L)),
      s"fixture miscalibrated: batch band pairs = $batchPairs")
    assert(got === Set((1L, 2L), (4L, 5L)),
      s"streaming must drop the beyond-watermark view (1,3) and keep the rest, got $got")
  }

  test("streaming sessions MERGE across micro-batches (the case one batch can't exercise)") {
    import java.sql.Timestamp
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sess_merge")
    sys.addShutdownHook(rmTree(root.toFile))
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()
    def t(min: Long) = Timestamp.valueOf(java.time.LocalDateTime
      .of(2024, 1, 1, 0, 0).plusMinutes(min))
    def land(name: String,
        rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit = {
      val tmp = s"$root/stage_$name"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
      assert(part.renameTo(new java.io.File(srcDir, name)))
    }
    // file 1: user 10's open session (0, 2 min) + user 20's lone event;
    // file 2: user 10 again at 4 min — within gap of the OPEN session,
    // so the state store must MERGE it into one 3-event session, and
    // user 20's session must survive the second batch untouched
    land("f1.parquet", Seq(
      (1L, t(0), 10L, "view", 1.0, "{}"),
      (2L, t(2), 10L, "view", 2.0, "{}"),
      (3L, t(0), 20L, "view", 5.0, "{}")))
    land("f2.parquet", Seq(
      (4L, t(4), 10L, "click", 3.0, "{}")))
    val got = EventsStream.sessionWindowsStreaming(spark, srcDir,
        "sess_merge_spec", globFilter = "*.parquet", maxFilesPerTrigger = Some(1))
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((10L, 3L, 6.0), (20L, 1L, 5.0)))
  }

  test("append-mode sessions EVICT at the watermark: finalized once, late event dropped, open sessions unemitted") {
    import java.sql.Timestamp
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sess_evict")
    sys.addShutdownHook(rmTree(root.toFile))
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()
    def t(min: Long) = Timestamp.valueOf(java.time.LocalDateTime
      .of(2024, 1, 1, 0, 0).plusMinutes(min))
    // file→batch order must be DETERMINISTIC: FileStreamSource orders
    // by modification time, so each file gets an explicit mtime (the
    // ss-late spec's discipline — same-millisecond writes split
    // arbitrarily and the late event would ride in the first batch)
    def land(name: String,
        rows: Seq[(Long, Timestamp, Long, String, Double, String)],
        modTime: Long): Unit = {
      val tmp = s"$root/stage_$name"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
      val dst = new java.io.File(srcDir, name)
      assert(part.renameTo(dst))
      assert(dst.setLastModified(modTime))
    }
    val now = System.currentTimeMillis()
    // Three batches, each element earned empirically (the st3
    // discipline): the session store merges a batch's input into
    // still-open state BEFORE evicting, so a late event one batch
    // after the watermark jump would still MERGE — the session must
    // be evicted by an intervening batch for the drop to be
    // observable.
    // batch 1: user 10's session [0,2] plus a stray at 60 that pushes
    // the 10-min watermark to 50 — far past the session's end+gap (7)
    land("f1.parquet", Seq(
      (1L, t(0), 10L, "view", 1.0, "{}"),
      (2L, t(2), 10L, "view", 2.0, "{}"),
      (3L, t(60), 99L, "view", 9.0, "{}")), now - 120000)
    // batch 2: runs WITH wm=50 → finalizes and EVICTS user 10's
    // session (emitted once, n=2); user 20's session opens fresh
    land("f2.parquet", Seq(
      (5L, t(55), 20L, "view", 5.0, "{}")), now - 60000)
    // batch 3: a LATE event for user 10 at minute 3 — inside the
    // evicted session's gap window but behind the watermark: it must
    // be DROPPED, not resurrected as a new session (its end+gap=8 is
    // behind the watermark, so a resurrection would emit (10,1,3.0))
    land("f3.parquet", Seq(
      (4L, t(3), 10L, "view", 3.0, "{}")), now)
    val emissions = EventsStream.sessionWindowsStreamingFinal(spark, srcDir,
        "sess_evict_spec", globFilter = "*.parquet", maxFilesPerTrigger = Some(1))
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSeq
    // append mode emits only sessions the watermark FINALIZED: user
    // 10's session closed at watermark 50 with its batch-1 content —
    // exactly one emission, n=2. Had the late event merged, the
    // emission would be (10, 3, 6.0); had it resurrected a session
    // past eviction, a second finalized row (10, 1, 3.0) would emit
    // (its end+gap=8 is far behind the watermark). Users 20 and 99's
    // sessions are still OPEN at end of stream (end+gap beyond the
    // watermark) — state retained, nothing emitted.
    assert(emissions === Seq((10L, 2L, 3.0)),
      s"expected exactly the finalized pre-late-event session, got $emissions")
  }
}
