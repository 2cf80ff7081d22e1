package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.streaming.IndexStream

/** The stream-maintained BM25 index must serve EXACTLY what a batch
  * rebuild over the documents-so-far serves — micro-batching is an
  * implementation detail the index may not reveal — and a full
  * redelivery (fresh checkpoint) must be a true no-op because the
  * docids ledger, not streaming state, is the dedup authority. */
class IndexStreamSpec extends SparkSpec {

  private def probe(path: String, terms: Seq[String]) =
    TextOps.bm25OverIndex(spark, path, terms, 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("st4: micro-batches append through the t11c seam; replay with a fresh checkpoint is a no-op") {
    import spark.implicits._
    val base = Seq(
      (0L, "alpha beta beta gamma", "en"),
      (1L, "alpha alpha alpha alpha delta", "en"))
      .toDF("doc_id", "text", "lang")
    val arriving1 = Seq((2L, "beta beta beta beta beta", "fr"))
      .toDF("doc_id", "text", "lang")
    val arriving2 = Seq(
      (3L, "delta epsilon alpha", "en"),
      (4L, "alpha beta", "de"))
      .toDF("doc_id", "text", "lang")
    val terms = Seq("alpha", "beta")
    val tmp = java.nio.file.Files.createTempDirectory("bm25_stream_spec").toFile
    val idx = tmp.getAbsolutePath + "/idx"
    val incoming = tmp.getAbsolutePath + "/incoming"
    TextOps.materializeBm25IndexOf(base, idx)
    // two files → two micro-batches at maxFilesPerTrigger=1
    arriving1.coalesce(1).write.mode("overwrite").parquet(incoming)
    arriving2.coalesce(1).write.mode("append").parquet(incoming)
    val q = IndexStream.bm25IndexIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp1")
    try q.processAllAvailable() finally q.stop()
    // each micro-batch appended its own stats partial: base + 2
    val statRows = spark.read.parquet(s"$idx/stats").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(statRows.length === 3, "each micro-batch must land one stats partial")
    assert(statRows.map(_._1).sum === 5L)
    // the streamed index answers exactly what a batch rebuild answers
    val rebuilt = tmp.getAbsolutePath + "/idx_rebuilt"
    TextOps.materializeBm25IndexOf(
      base.unionByName(arriving1).unionByName(arriving2), rebuilt)
    val viaStream = probe(idx, terms)
    assert(viaStream === probe(rebuilt, terms),
      "stream-maintained index diverged from batch rebuild")
    assert(viaStream.nonEmpty)
    // FULL redelivery: a fresh checkpoint replays every file; the
    // ledger anti-join makes each replayed batch a publish-nothing
    // no-op — no new stats partial, no score drift
    val q2 = IndexStream.bm25IndexIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp2")
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$idx/stats").count() === 3,
      "replayed batches must publish nothing")
    assert(probe(idx, terms) === viaStream, "replay changed an answer")
    // restart on the SAME checkpoint: offsets resume, nothing re-runs
    val q3 = IndexStream.bm25IndexIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp1")
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.read.parquet(s"$idx/stats").count() === 3)
    rmTree(tmp)
  }

  test("mid-publish crash: the _appendlog redo record replays the half-published batch at restart; recovered index matches a clean run row-for-row") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val base = Seq(
      (0L, "alpha beta beta gamma", "en"),
      (1L, "alpha alpha alpha alpha delta", "en"))
      .toDF("doc_id", "text", "lang")
    val arriving = Seq(
      (2L, "beta beta beta beta beta", "fr"),
      (3L, "delta epsilon alpha", "en"))
      .toDF("doc_id", "text", "lang")
    val terms = Seq("alpha", "beta")
    val tmp = java.nio.file.Files.createTempDirectory("bm25_crash_spec").toFile
    val idx = tmp.getAbsolutePath + "/idx"
    val incoming = tmp.getAbsolutePath + "/incoming"
    val cp = tmp.getAbsolutePath + "/cp"
    val fs = new Path(idx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def logRecords() =
      if (fs.exists(new Path(idx, TextOps.Bm25AppendLogDir)))
        fs.listStatus(new Path(idx, TextOps.Bm25AppendLogDir)).map(_.getPath.getName).toSeq
      else Seq.empty
    def stagingDirs() = fs.listStatus(new Path(idx))
      .map(_.getPath.getName).filter(_.startsWith("__append_staging")).toSeq

    TextOps.materializeBm25IndexOf(base, idx)
    arriving.coalesce(1).write.mode("overwrite").parquet(incoming)

    // KILL the publish between the stats and docids renames — the exact
    // window round-10's verdict named: postings + stats of the batch are
    // live, the ledger is blind, and an un-recovered retry would
    // re-append the whole batch
    // try/finally around the injected hook: a failed assertion between
    // injection and reset must not leak the crash hook into every later
    // test sharing this JVM (round-11 ADVICE)
    TextOps.publishFaultHook =
      sub => if (sub == "docids") throw new RuntimeException("injected mid-publish crash")
    try {
      val q = IndexStream.bm25IndexIngest(spark, incoming, idx, cp)
      intercept[Exception] { try q.processAllAvailable() finally q.stop() }
    } finally TextOps.publishFaultHook = _ => ()
    assert(logRecords().size === 1, "the crashed publish must leave its redo record")
    assert(stagingDirs().size === 1, "the crashed publish must keep its staging dir (the redo copy)")
    assert(spark.read.parquet(s"$idx/stats").count() === 2,
      "the crash fixture must land the stats partial before dying (half-published state)")

    // restart on the SAME checkpoint: recover-on-open FINISHES the
    // claimed publish (docids land), then the retried micro-batch is a
    // ledger no-op — nothing re-appends
    val q2 = IndexStream.bm25IndexIngest(spark, incoming, idx, cp)
    try q2.processAllAvailable() finally q2.stop()
    assert(logRecords().isEmpty, "recovery must drop the replayed redo record")
    assert(stagingDirs().isEmpty, "recovery must drop the replayed staging dir")

    // clean run: same base, same batch, no crash
    val clean = tmp.getAbsolutePath + "/idx_clean"
    TextOps.materializeBm25IndexOf(base, clean)
    TextOps.bm25IndexAppend(spark, clean, arriving)
    def postings(p: String) = spark.read.parquet(s"$p/postings")
      .select("doc_id", "tok", "tf", "dl", "lang", "bucket").collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    def stats(p: String) = spark.read.parquet(s"$p/stats").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def docids(p: String) = spark.read.parquet(s"$p/docids").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(postings(idx) === postings(clean),
      "recovered index postings diverged from a clean run (duplicated or lost rows)")
    assert(stats(idx) === stats(clean), "recovered index stats partials diverged")
    assert(docids(idx) === docids(clean), "recovered index ledger diverged")
    assert(probe(idx, terms) === probe(clean, terms))

    // an UNCLAIMED staging dir (crash mid-staging: no record, content
    // incomplete, nothing published) must drop at recovery, not replay
    fs.mkdirs(new Path(idx, "__append_staging_orphan/postings/bucket=0"))
    val actions = TextOps.bm25IndexRecover(spark, idx)
    assert(actions === Seq("dropped=__append_staging_orphan"))
    assert(stagingDirs().isEmpty)
    assert(postings(idx) === postings(clean), "orphan drop must not touch live artifacts")

    // the OTHER end of the window: crash after the claim but before
    // ANY rename — recovery replays the whole batch from staging
    val arriving2 = Seq((4L, "epsilon zeta", "en")).toDF("doc_id", "text", "lang")
    TextOps.publishFaultHook =
      sub => if (sub == "postings") throw new RuntimeException("injected pre-rename crash")
    try intercept[Exception] { TextOps.bm25IndexAppend(spark, idx, arriving2) }
    finally TextOps.publishFaultHook = _ => ()
    assert(logRecords().size === 1 && stagingDirs().size === 1)
    val replayActions = TextOps.bm25IndexRecover(spark, idx)
    assert(replayActions.size === 1 && replayActions.head.startsWith("replayed="))
    TextOps.bm25IndexAppend(spark, clean, arriving2)
    assert(postings(idx) === postings(clean),
      "claimed-but-unrenamed batch must replay to exactly the clean append")
    assert(stats(idx) === stats(clean))
    assert(docids(idx) === docids(clean))
    rmTree(tmp)
  }

  test("st6: ANN micro-batches append through the v9d seam; full redelivery is a no-op (the index is the ledger)") {
    import spark.implicits._
    import graft.operators.Similarity
    // planted one-hot geometry: vecs 0..3 are the centroids, 4..11
    // assign to the axis they point along
    def vec(axis: Int) = { val v = Array.fill(64)(0.0f); v(axis) = 1.0f; v }
    val base = (0L until 8L).map(i => (i, s"l${i % 2}", vec((i % 4).toInt)))
      .toDF("vec_id", "label", "embedding")
    val arriving1 = Seq((8L, "l0", vec(1)), (9L, "l1", vec(2)))
      .toDF("vec_id", "label", "embedding")
    val arriving2 = Seq((10L, "l0", vec(3)), (11L, "l1", vec(0)))
      .toDF("vec_id", "label", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("ivf_stream_spec").toFile
    val idx = tmp.getAbsolutePath + "/idx"
    val incoming = tmp.getAbsolutePath + "/incoming"
    // the centroid table takes vec_id < IvfCentroids (= 8): the full
    // 8-row base keeps it well-formed while arrivals stay above it
    Similarity.materializeIvfOf(base, idx)
    arriving1.coalesce(1).write.mode("overwrite").parquet(incoming)
    arriving2.coalesce(1).write.mode("append").parquet(incoming)
    val q = graft.streaming.IndexStream.ivfIndexIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp1")
    try q.processAllAvailable() finally q.stop()
    def contents() = spark.read.parquet(idx)
      .select(col("vec_id"), col("cent_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val streamed = contents()
    // the streamed index holds row-for-row what a batch rebuild holds
    val rebuilt = tmp.getAbsolutePath + "/idx_rebuilt"
    Similarity.materializeIvfOf(
      base.unionByName(arriving1).unionByName(arriving2), rebuilt)
    val full = spark.read.parquet(rebuilt)
      .select(col("vec_id"), col("cent_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed === full, "stream-maintained ANN index diverged from batch rebuild")
    assert(streamed.keySet === (0L until 12L).toSet)
    // FULL redelivery under a fresh checkpoint: every file replays;
    // the per-vector ledger guard publishes nothing
    val before = spark.read.parquet(idx).count()
    val q2 = graft.streaming.IndexStream.ivfIndexIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp2")
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(idx).count() === before,
      "replayed batches must append nothing")
    assert(contents() === full, "replay changed the index")
    rmTree(tmp)
  }

  test("st7: streamed changelog apply equals a v2 rebuild; fresh-checkpoint replay keeps every answer") {
    import spark.implicits._
    import graft.operators.SnapshotDiff
    val docs = Tables.documents(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("bm25_cdcst_spec").toFile
    // the gate form end-to-end (fixture corpus): stream-applied page ≡
    // a fresh index built directly over the derived v2 corpus
    val rebuilt = tmp.getAbsolutePath + "/idx_v2"
    TextOps.materializeBm25IndexOf(SnapshotDiff.nextRelease(docs), rebuilt)
    val viaStream = TextOps.bm25CdcStreamedTopK(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val viaRebuilt = TextOps.bm25OverIndex(spark, rebuilt, TextOps.Bm25Terms, 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(viaStream === viaRebuilt, "streamed changelog apply diverged from v2 rebuild")
    assert(viaStream.nonEmpty)
    // FULL redelivery under a fresh checkpoint must publish NOTHING
    // (the st8/st9/st10 bar, round-13 verdict task #2): the replayed
    // batches read the same source files, find their file-set-keyed
    // applied marks, and skip — the artifact FILE SET is unchanged,
    // not merely the answers (the pre-mark behavior re-tombstoned and
    // re-added every updated doc, adding a generation per replay that
    // only compaction could reclaim)
    val tag = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val idx = Tables.scratchDir.getOrElse(
      System.getProperty("java.io.tmpdir")) + s"/graft_bm25_cdcst_$tag"
    assert(new java.io.File(idx).exists(), "the gate form must have landed its index in scratch")
    def allFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[String] =
        Option(f.listFiles()).map(_.toSeq).getOrElse(Nil).flatMap { c =>
          if (c.isDirectory) walk(c) else Seq(c.getPath)
        }
      // exclude the mark dir itself: redelivery may add no marks (all
      // present) but artifacts must be byte-stable regardless
      walk(new java.io.File(idx))
        .filterNot(_.contains(TextOps.Bm25CdcMarkDir)).toSet
    }
    val filesBefore = allFiles()
    val q2 = IndexStream.bm25CdcIngest(spark, s"${idx}_incoming", idx,
      tmp.getAbsolutePath + "/cp_replay")
    try q2.processAllAvailable() finally q2.stop()
    assert(allFiles() === filesBefore,
      "fresh-checkpoint redelivery published files")
    val afterReplay = TextOps.bm25OverIndex(spark, idx, TextOps.Bm25Terms, 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(afterReplay === viaStream, "full redelivery changed an answer")
    rmTree(tmp)
  }

  test("st6 kill mid-append: a killed batch's partial task commits are a no-op on restart") {
    import spark.implicits._
    import graft.operators.Similarity
    def vec(axis: Int) = { val v = Array.fill(64)(0.0f); v(axis) = 1.0f; v }
    val base = (0L until 8L).map(i => (i, s"l${i % 2}", vec((i % 4).toInt)))
      .toDF("vec_id", "label", "embedding")
    val arriving = Seq((8L, "l0", vec(1)), (9L, "l1", vec(2)),
      (10L, "l0", vec(3)), (11L, "l1", vec(0)))
      .toDF("vec_id", "label", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("ivf_kill_spec").toFile
    val idx = tmp.getAbsolutePath + "/idx"
    val incoming = tmp.getAbsolutePath + "/incoming"
    val cp = tmp.getAbsolutePath + "/cp"
    Similarity.materializeIvfOf(base, idx)
    arriving.coalesce(1).write.mode("overwrite").parquet(incoming)
    // KILL the first delivery mid-append: half the batch's rows land
    // (the committed-task state of a killed append job — real rows in
    // cell dirs, the batch unacknowledged), then the query dies
    IndexStream.ivfIngestFaultHook = b => {
      Similarity.ivfIndexAppend(spark, idx, b.filter(col("vec_id") % 2 === 0))
      throw new RuntimeException("injected mid-append crash")
    }
    try {
      val q = IndexStream.ivfIndexIngest(spark, incoming, idx, cp)
      intercept[Exception] { try q.processAllAvailable() finally q.stop() }
    } finally IndexStream.ivfIngestFaultHook = _ => ()
    // the torn state is real: even ids landed, odd ids did not
    val midIds = spark.read.parquet(idx)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(Set(8L, 10L).subsetOf(midIds) && !midIds.contains(9L) && !midIds.contains(11L),
      s"crash fixture must leave a half-appended batch, got $midIds")
    // restart on the SAME checkpoint: the unacknowledged batch
    // redelivers in full; the index-is-the-ledger anti-join drops the
    // already-landed half and appends ONLY the missing rows
    val q2 = IndexStream.ivfIndexIngest(spark, incoming, idx, cp)
    try q2.processAllAvailable() finally q2.stop()
    val clean = tmp.getAbsolutePath + "/idx_clean"
    Similarity.materializeIvfOf(base, clean)
    Similarity.ivfIndexAppend(spark, clean, arriving)
    def contents(p: String) = spark.read.parquet(p)
      .select(col("vec_id"), col("cent_id").cast("long"), col("label")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(contents(idx) === contents(clean),
      "recovered ANN index diverged from a clean run")
    // row-for-row, not byte-for-byte: the retry legitimately lands the
    // missing half in its own file — COUNT equality is what proves the
    // already-landed half did not duplicate
    assert(spark.read.parquet(idx).count() === spark.read.parquet(clean).count(),
      "retried batch duplicated its already-landed rows")
    rmTree(tmp)
  }

  test("st7 reclaim cadence: accumulated CDC churn fires the compaction cycle mid-stream") {
    import spark.implicits._
    // 10 docs; batch A's churn sits under the 20% bound (1 tomb / 9-10
    // live -> DEFER: the sidecar survives the batch), batch B's pushes
    // past it (3 tombs -> FIRE: the cycle reclaims mid-stream with no
    // operator in the loop) -- the TextOpsSpec policy ladder driven
    // through the streaming front door
    val v1 = (0 until 10).map(i => (i.toLong, s"alpha beta word$i tail$i", "en"))
      .toDF("doc_id", "text", "lang")
    val logA = Seq(("updated", 0L, "alpha beta word0 rev", "en"))
      .toDF("op", "doc_id", "text", "lang")
    val logB = Seq(
      ("updated", 1L, "alpha beta word1 rev", "en"),
      ("updated", 2L, "alpha beta word2 rev", "en"))
      .toDF("op", "doc_id", "text", "lang")
    val tmp = java.nio.file.Files.createTempDirectory("bm25_cadence_spec").toFile
    val idx = tmp.getAbsolutePath + "/idx"
    val incoming = tmp.getAbsolutePath + "/incoming"
    TextOps.materializeBm25IndexOf(v1, idx)
    // batch A alone: the policy must DEFER
    logA.coalesce(1).write.mode("overwrite").parquet(incoming)
    val qA = IndexStream.bm25CdcIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cpA")
    try qA.processAllAvailable() finally qA.stop()
    assert(new java.io.File(s"$idx/tombs").exists(),
      "under-bound churn must leave the sidecar (deferred cycle)")
    // batch B arrives: accumulated churn crosses the bound -> the
    // stream fires the cycle itself
    logB.coalesce(1).write.mode("append").parquet(incoming)
    val qB = IndexStream.bm25CdcIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cpA")
    try qB.processAllAvailable() finally qB.stop()
    assert(!new java.io.File(s"$idx/tombs").exists(),
      "over-bound churn must fire the reclaim mid-stream")
    // and the fired cycle preserved every answer: equals a rebuild of
    // the fully-revised corpus
    val rebuilt = tmp.getAbsolutePath + "/idx_rebuilt"
    TextOps.materializeBm25IndexOf(
      (0 until 10).map(i =>
        (i.toLong, if (i < 3) s"alpha beta word$i rev" else s"alpha beta word$i tail$i", "en"))
        .toDF("doc_id", "text", "lang"), rebuilt)
    val terms = Seq("alpha", "rev")
    assert(probe(idx, terms) === probe(rebuilt, terms))
    assert(probe(idx, terms).nonEmpty)
    rmTree(tmp)
  }

  test("st7 offset-commit crash: the redelivered CDC batch finds its applied-batch mark and publishes NOTHING") {
    import spark.implicits._
    val v1 = Seq(
      (0L, "alpha beta gamma", "en"), (1L, "beta gamma delta", "en"),
      (2L, "gamma delta epsilon", "en"), (3L, "delta epsilon zeta", "en"))
      .toDF("doc_id", "text", "lang")
    // changelog across two files → two micro-batches: batch A updates
    // doc 1 (tombstone + re-add), batch B deletes doc 2 and inserts 4
    val logA = Seq(("updated", 1L, "beta gamma eta", "en"))
      .toDF("op", "doc_id", "text", "lang")
    val logB = Seq(("deleted", 2L, "", ""), ("inserted", 4L, "zeta eta theta", "en"))
      .toDF("op", "doc_id", "text", "lang")
    val tmp = java.nio.file.Files.createTempDirectory("bm25_cdcmark_spec").toFile
    val idx = tmp.getAbsolutePath + "/idx"
    val incoming = tmp.getAbsolutePath + "/incoming"
    val cp = tmp.getAbsolutePath + "/cp"
    TextOps.materializeBm25IndexOf(v1, idx)
    logA.coalesce(1).write.mode("overwrite").parquet(incoming)
    logB.coalesce(1).write.mode("append").parquet(incoming)
    // crash AFTER the first micro-batch's verbs land and its mark is
    // written, BEFORE the checkpoint commits the offset — the one
    // restart position where the sink has applied a batch the source
    // will redeliver
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
    IndexStream.cdcIngestFaultHook = id => {
      if (fired.incrementAndGet() == 1)
        throw new RuntimeException(s"injected offset-commit crash after batch $id")
    }
    try {
      val q = IndexStream.bm25CdcIngest(spark, incoming, idx, cp)
      intercept[Exception] { try q.processAllAvailable() finally q.stop() }
    } finally IndexStream.cdcIngestFaultHook = _ => ()
    assert(fired.get() >= 1, "the fault hook must have fired")
    // restart on the SAME checkpoint: the unacknowledged batch
    // redelivers; the mark makes it a publish-nothing skip, then the
    // remaining batch applies normally
    val q2 = IndexStream.bm25CdcIngest(spark, incoming, idx, cp)
    try q2.processAllAvailable() finally q2.stop()
    // clean twin: same v1, same two micro-batches, no crash
    val clean = tmp.getAbsolutePath + "/idx_clean"
    TextOps.materializeBm25IndexOf(v1, clean)
    val q3 = IndexStream.bm25CdcIngest(spark, incoming, clean,
      tmp.getAbsolutePath + "/cp_clean")
    try q3.processAllAvailable() finally q3.stop()
    // row-level identity across EVERY artifact, generations included —
    // without the mark the replayed batch would re-tombstone doc 1 and
    // re-add it under one more generation (answers equal, artifacts
    // grown); count equality is what pins "published nothing"
    def postings(p: String) = spark.read.parquet(s"$p/postings")
      .select("doc_id", "tok", "tf", "dl", "lang", "gen", "bucket").collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    def stats(p: String) = spark.read.parquet(s"$p/stats").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def docids(p: String) = spark.read.parquet(s"$p/docids")
      .select("doc_id", "tomb", "gen", "dl").collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    // the reclaim policy is wired into the stream and this fixture's
    // churn crosses its bound (1 tomb > 0.2 × 4 live), so the sidecar
    // may legitimately be reclaimed — in BOTH runs identically
    def tombs(p: String) =
      if (!new java.io.File(s"$p/tombs").exists()) Seq.empty
      else spark.read.parquet(s"$p/tombs").collect()
        .map(_.toSeq).sortBy(_.toString).toSeq
    assert(postings(idx) === postings(clean),
      "replayed CDC batch changed postings (the mark did not skip it)")
    assert(stats(idx) === stats(clean), "replayed CDC batch added a stats partial")
    assert(docids(idx) === docids(clean), "replayed CDC batch grew the ledger")
    assert(tombs(idx) === tombs(clean), "replayed CDC batch re-tombstoned")
    val terms = Seq("gamma", "eta", "zeta")
    assert(probe(idx, terms) === probe(clean, terms))
    assert(probe(idx, terms).nonEmpty)
    // both applied batches left their marks under this checkpoint's key
    val marks = Option(new java.io.File(s"$idx/${TextOps.Bm25CdcMarkDir}").list())
      .getOrElse(Array.empty[String]).filterNot(_.startsWith(".")) // local-FS .crc sidecars
    assert(marks.length === 2, s"expected 2 marks, got ${marks.toSeq}")
    rmTree(tmp)
  }
}
