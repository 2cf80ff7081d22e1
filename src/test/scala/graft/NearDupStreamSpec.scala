package graft

import org.apache.spark.sql.functions._
import graft.streaming.NearDupStream
import graft.operators.Dedup

/** The stream-accumulated pair table must equal the batch MinHash-LSH
  * tier as a set at any micro-batching (pair discovery is arrival-order
  * invariant — a pair is found when its later member arrives), and the
  * three landed artifacts (pairs / buckets / docs) must publish as
  * ONE atomic commit: redelivery publishes nothing, a kill
  * mid-staging leaves nothing visible, a kill mid-publish is
  * replayed to completion at the next stream start. The
  * dup-discovery paths are pinned here on planted corpora; the sf0.01
  * gate form is oracle-checked against d3's SQL. */
class NearDupStreamSpec extends SparkSpec {

  private def pairsOf(indexPath: String) =
    spark.read.parquet(s"$indexPath/pairs")
      .select(col("a_id"), col("b_id"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq

  /** Two pinned-order files → two micro-batches (oldest mtime first). */
  private def landTwoFiles(dir: String,
      batch0: org.apache.spark.sql.DataFrame,
      batch1: org.apache.spark.sql.DataFrame): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val base = System.currentTimeMillis() - 120000L
    Seq((batch0, "batch-0.parquet", base), (batch1, "batch-1.parquet", base + 60000L))
      .foreach { case (df, name, mtime) =>
        val tmp = dir + "_tmp_" + name
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val target = new java.io.File(dir, name)
        java.nio.file.Files.move(part.toPath, target.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        target.setLastModified(mtime)
        rmTree(new java.io.File(tmp))
      }
  }

  /** Batch-tier answer over the union corpus: written as a documents
    * table so [[Dedup.minhashLshPairs]] runs its committed plan. */
  private def batchPairs(docs: org.apache.spark.sql.DataFrame,
      tmpRoot: String): Seq[(Long, Long, Double)] = {
    docs.write.mode("overwrite").parquet(s"$tmpRoot/documents.parquet")
    Dedup.minhashLshPairs(spark, tmpRoot).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
  }

  test("st9: cross-batch and within-batch pairs both land; redelivery publishes nothing") {
    import spark.implicits._
    // doc 10 duplicates doc 0 ACROSS batches; docs 11/12 duplicate each
    // other WITHIN a batch; docs 1 and 13 are unique
    val b0 = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "completely different words about entirely other things"))
      .toDF("doc_id", "text")
    val b1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "pack my box with five dozen liquor jugs tonight"),
      (12L, "pack my box with five dozen liquor jugs tonight"),
      (13L, "a third unrelated document with its own vocabulary"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("neardup_stream_spec").toFile
    val incoming = tmp.getAbsolutePath + "/incoming"
    val idx = tmp.getAbsolutePath + "/index"
    landTwoFiles(incoming, b0, b1)
    val q = NearDupStream.minhashIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp1")
    try q.processAllAvailable() finally q.stop()

    val got = pairsOf(idx)
    val want = batchPairs(b0.unionByName(b1), tmp.getAbsolutePath + "/corpus")
    assert(got === want, "streamed pair table diverged from the batch tier")
    assert(got.map(p => (p._1, p._2)) === Seq((0L, 10L), (11L, 12L)),
      "cross-batch and within-batch identical pairs must both be discovered")
    assert(got.forall(_._3 === 1.0d))

    // FULL redelivery under a fresh checkpoint: every doc is already in
    // the arrival ledger — publish NOTHING anywhere (file sets of all
    // three artifacts unchanged)
    // RECURSIVE walk: the buckets artifact is (band, bshard)
    // partitioned, so its data files live under nested dirs
    def files(sub: String): Set[String] = {
      def walk(f: java.io.File): Seq[String] =
        Option(f.listFiles()).map(_.toSeq).getOrElse(Nil).flatMap { c =>
          if (c.isDirectory) walk(c)
          else if (c.getName.endsWith(".parquet")) Seq(c.getPath) else Nil
        }
      walk(new java.io.File(s"$idx/$sub")).toSet
    }
    val before = Seq("pairs", "buckets", "docs").map(files)
    val q2 = NearDupStream.minhashIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp2")
    try q2.processAllAvailable() finally q2.stop()
    assert(Seq("pairs", "buckets", "docs").map(files) === before,
      "redelivery published files")
    assert(pairsOf(idx) === want)
    rmTree(tmp)
  }

  private def noDebris(root: String): Unit = {
    val staged = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("__ingest_staging")).map(_.getName).toSeq
    assert(staged.isEmpty, s"staging debris survived: $staged")
    val log = new java.io.File(root, graft.streaming.IngestCommit.LogDir)
    val recs = Option(log.listFiles()).map(_.map(_.getName).toSeq).getOrElse(Nil)
    assert(recs.isEmpty, s"redo records survived: $recs")
  }

  test("st9 kill mid-staging: nothing publishes; restart drops the debris and completes the batch") {
    import spark.implicits._
    val b0 = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val b1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "pack my box with five dozen liquor jugs tonight"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("neardup_kill_spec").toFile
    val incoming = tmp.getAbsolutePath + "/incoming"
    val idx = tmp.getAbsolutePath + "/index"
    landTwoFiles(incoming, b0, b1)
    // crash batch 1 after its artifacts staged, BEFORE the redo record
    // claims — an unclaimed staging dir a restart must discard
    var calls = 0
    graft.streaming.IngestCommit.stagingFaultHook = _ => {
      calls += 1
      if (calls == 2) throw new RuntimeException("injected mid-staging crash")
    }
    try {
      val q = NearDupStream.minhashIngest(spark, incoming, idx,
        tmp.getAbsolutePath + "/cp")
      intercept[Exception] { try q.processAllAvailable() finally q.stop() }
    } finally graft.streaming.IngestCommit.stagingFaultHook = _ => ()
    // NOTHING of batch 1 is visible: the one-barrier contract (batch 0
    // found no pairs, so the live pairs dir must not even exist yet)
    assert(!new java.io.File(s"$idx/pairs").exists(),
      "a mid-staging crash must publish nothing")
    val docsMid = spark.read.parquet(s"$idx/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(docsMid === Set(0L))
    // restart on the SAME checkpoint: batch 1 redelivers and completes
    val q2 = NearDupStream.minhashIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp")
    try q2.processAllAvailable() finally q2.stop()
    val want = batchPairs(b0.unionByName(b1), tmp.getAbsolutePath + "/corpus")
    assert(pairsOf(idx) === want)
    val docs = spark.read.parquet(s"$idx/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(docs === Seq(0L, 10L, 11L), "docs must land exactly once each")
    noDebris(idx)
    rmTree(tmp)
  }

  test("st9 kill mid-claim: a torn redo record publishes nothing; restart drops the .tmp and completes the batch") {
    import spark.implicits._
    val b0 = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val b1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "pack my box with five dozen liquor jugs tonight"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("neardup_kill3_spec").toFile
    val incoming = tmp.getAbsolutePath + "/incoming"
    val idx = tmp.getAbsolutePath + "/index"
    landTwoFiles(incoming, b0, b1)
    // crash batch 1 after the record .tmp is written but BEFORE the
    // rename that claims it — the torn-record window: recover must NOT
    // treat the .tmp as claimed (publishing a prefix and dropping the
    // arrival-authority artifact); it must drop the .tmp and the
    // staging dir, publish nothing, and let redelivery complete
    var claims = 0
    graft.streaming.IngestCommit.claimFaultHook = _ => {
      claims += 1
      if (claims == 2) throw new RuntimeException("injected mid-claim crash")
    }
    try {
      val q = NearDupStream.minhashIngest(spark, incoming, idx,
        tmp.getAbsolutePath + "/cp")
      intercept[Exception] { try q.processAllAvailable() finally q.stop() }
    } finally graft.streaming.IngestCommit.claimFaultHook = _ => ()
    // the crash fixture is real: an unclaimed .tmp plus a staging dir
    val logDir = new java.io.File(idx, graft.streaming.IngestCommit.LogDir)
    val tmpRecs = Option(logDir.listFiles())
      .map(_.filter(_.getName.endsWith(".json.tmp")).toSeq).getOrElse(Nil)
    assert(tmpRecs.nonEmpty, "the crash must leave an unclaimed .tmp record")
    // NOTHING of batch 1 published
    assert(!new java.io.File(s"$idx/pairs").exists(),
      "a mid-claim crash must publish nothing")
    val docsMid = spark.read.parquet(s"$idx/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(docsMid === Set(0L))
    // restart on the SAME checkpoint: recover drops the .tmp + staging,
    // then batch 1 redelivers and completes
    val q2 = NearDupStream.minhashIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp")
    try q2.processAllAvailable() finally q2.stop()
    val want = batchPairs(b0.unionByName(b1), tmp.getAbsolutePath + "/corpus")
    assert(pairsOf(idx) === want)
    val docs = spark.read.parquet(s"$idx/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(docs === Seq(0L, 10L, 11L), "docs must land exactly once each")
    noDebris(idx)
    rmTree(tmp)
  }

  test("st9 kill mid-publish: the claimed publish replays to completion at restart; redelivery adds nothing") {
    import spark.implicits._
    val b0 = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val b1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "pack my box with five dozen liquor jugs tonight"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("neardup_kill2_spec").toFile
    val incoming = tmp.getAbsolutePath + "/incoming"
    val idx = tmp.getAbsolutePath + "/index"
    landTwoFiles(incoming, b0, b1)
    // crash batch 1 mid-rename: pairs and buckets are live, the docs
    // rename has not happened, the redo record is claimed — the exact
    // window the _ingestlog replay exists for
    var docsRenames = 0
    graft.streaming.IngestCommit.publishFaultHook = sub => {
      if (sub == "docs") {
        docsRenames += 1
        if (docsRenames == 2)
          throw new RuntimeException("injected mid-publish crash")
      }
    }
    try {
      val q = NearDupStream.minhashIngest(spark, incoming, idx,
        tmp.getAbsolutePath + "/cp")
      intercept[Exception] { try q.processAllAvailable() finally q.stop() }
    } finally graft.streaming.IngestCommit.publishFaultHook = _ => ()
    // torn mid-rename state is real — and CLAIMED
    assert(pairsOf(idx).map(p => (p._1, p._2)) === Seq((0L, 10L)))
    val docsMid = spark.read.parquet(s"$idx/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(docsMid === Set(0L), s"crash fixture must leave batch 1's docs staged, got $docsMid")
    val recs = new java.io.File(idx, graft.streaming.IngestCommit.LogDir).listFiles()
    assert(recs != null && recs.nonEmpty, "the crash must leave a claimed redo record")
    // restart on the SAME checkpoint: recover finishes the renames
    // BEFORE the first batch, whose redelivery then anti-joins away
    val q2 = NearDupStream.minhashIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp")
    try q2.processAllAvailable() finally q2.stop()
    val want = batchPairs(b0.unionByName(b1), tmp.getAbsolutePath + "/corpus")
    assert(pairsOf(idx) === want, "replay + redelivery must equal a clean run")
    val docs = spark.read.parquet(s"$idx/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(docs === Seq(0L, 10L, 11L), "docs must land exactly once each")
    val bucketDups = spark.read.parquet(s"$idx/buckets")
      .groupBy(col("doc_id"), col("band")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(bucketDups === 0L, "bucket rows must not duplicate across the replay")
    noDebris(idx)
    rmTree(tmp)
  }

  test("collision candidates mint no self-pairs even if the landed index held the batch's own bucket rows") {
    import spark.implicits._
    // defense-in-depth for the round-12 ADVICE finding: feed the
    // collision join a landed side containing the fresh batch's own
    // rows (no longer reachable from this stream's crash windows under
    // the atomic publish, but the dirs are plain parquet)
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val fb = NearDupStream.bucketRowsOf(fresh).localCheckpoint(true)
    val cand = NearDupStream.collisionCandidates(fb, Some(fb))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cand === Seq((10L, 11L)), s"self-pairs leaked: $cand")
    val roles = NearDupStream.collisionCandidatesWithRoles(fb, Some(fb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // own rows are excluded from the landed side entirely, so only the
    // within-batch path remains — greater id drops
    assert(roles === Seq((10L, 11L, 11L)), s"roles diverged: $roles")
  }

  test("st9 bucket probe prunes to the arriving (band, bshard) dirs and loses no collision") {
    import spark.implicits._
    val b0 = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "completely different words about entirely other things"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("neardup_prune_spec").toFile
    val incoming = tmp.getAbsolutePath + "/incoming"
    val idx = tmp.getAbsolutePath + "/index"
    landTwoFiles(incoming, b0, b0.limit(0))
    val q = NearDupStream.minhashIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp")
    try q.processAllAvailable() finally q.stop()
    // the landed bucket table is (band, bshard) partitioned
    val bandDirs = new java.io.File(s"$idx/buckets").listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filterNot(_.startsWith("_")).toSeq // _ledger_index is the bucket-key sidecar
    assert(bandDirs.nonEmpty && bandDirs.forall(_.startsWith("band=")),
      s"bucket table not band-partitioned: $bandDirs")
    // a fresh batch's probe carries the (band, bshard) keys as a
    // PARTITION filter — the scan lists only the arriving dirs
    val fresh = Seq((10L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val fb = NearDupStream.withShard(NearDupStream.bucketRowsOf(fresh))
      .localCheckpoint(true)
    val pruned = NearDupStream.prunedLandedBuckets(spark, s"$idx/buckets", fb)
    assert(pruned.isDefined)
    val plan = pruned.get.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("band"))
    assert(scanLine.isDefined, s"no (band, bshard) partition filter:\n$plan")
    // pruning by the probe's own key set is lossless: candidates equal
    // the unpruned probe's
    def candsOf(lb: Option[org.apache.spark.sql.DataFrame]) =
      NearDupStream.collisionCandidates(fb, lb)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(candsOf(pruned) ===
      candsOf(Some(spark.read.parquet(s"$idx/buckets"))))
    assert(candsOf(pruned) === Seq((0L, 10L)))
    // bloom gate (round 16): a batch whose keys the bucket-key sidecar
    // has never seen DEFINITELY collides with nothing — the landed
    // table is not opened at all (None), and the candidate set is
    // equal (empty) by the no-false-negative argument
    val freshNone = Seq((20L, "utterly unrelated sentence with novel vocabulary"))
      .toDF("doc_id", "text")
    val fbNone = NearDupStream.withShard(NearDupStream.bucketRowsOf(freshNone))
      .localCheckpoint(true)
    val gate = NearDupStream.prunedLandedBuckets(spark, s"$idx/buckets", fbNone)
    assert(gate.isEmpty,
      "a no-possible-collision batch must skip the landed bucket read")
    // lossless: the unpruned probe agrees there is nothing to find
    assert(NearDupStream.collisionCandidates(fbNone,
      Some(spark.read.parquet(s"$idx/buckets"))).count() === 0L)
    rmTree(tmp)
  }

  test("st9 dropped ledger sidecar rebuilds from the docs landing; redelivery still publishes nothing") {
    import spark.implicits._
    val b0 = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "completely different words about entirely other things"))
      .toDF("doc_id", "text")
    val b1 = Seq((10L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("neardup_sidecar_spec").toFile
    val incoming = tmp.getAbsolutePath + "/incoming"
    val idx = tmp.getAbsolutePath + "/index"
    landTwoFiles(incoming, b0, b1)
    val q = NearDupStream.minhashIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp1")
    try q.processAllAvailable() finally q.stop()
    val want = pairsOf(idx)
    // drop the bloom sidecar (a torn overwrite or a pre-sidecar index);
    // the next stream open must REBUILD it from the authoritative docs
    // landing — redelivery still publishes nothing
    val sidecar = new java.io.File(s"$idx/docs/${graft.streaming.LedgerIndex.Dir}")
    assert(sidecar.exists(), "the stream must maintain the bloom sidecar")
    rmTree(sidecar)
    val q2 = NearDupStream.minhashIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp2")
    try q2.processAllAvailable() finally q2.stop()
    assert(pairsOf(idx) === want, "redelivery after sidecar loss changed the pair table")
    val docs = spark.read.parquet(s"$idx/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(docs === Seq(0L, 1L, 10L), "docs must land exactly once each")
    assert(sidecar.exists(), "the sidecar must rebuild on the next open")
    rmTree(tmp)
  }

  test("st9 gate form equals the batch MinHash-LSH tier on the fixture corpus") {
    val got = Dedup.streamedNearDupPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = Dedup.minhashLshPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
  }

  test("legacy bucket table (flat, string md5 key) migrates once; later batches publish and read cleanly") {
    // round-15 ADVICE (medium): read-side conversion left the live dir
    // mixing string and bigint `bucket` files after the first
    // post-upgrade publish, wedging every later batch's parquet read.
    // The fix migrates the landed table to the long-key (band, bshard)
    // layout BEFORE the batch publishes; this pins (a) the migration
    // happens and is exact (the 60-bit prefix join loses no pair),
    // (b) a SECOND post-upgrade batch — the previously-wedged read —
    // still works, (c) the migrated table prunes like a native one.
    import spark.implicits._
    val b0 = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "completely different words about entirely other things"))
      .toDF("doc_id", "text")
    val b1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (13L, "a third unrelated document with its own vocabulary"))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (20L, "pack my box with five dozen liquor jugs tonight"),
      (21L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("neardup_legacy_spec").toFile
    val idx = tmp.getAbsolutePath + "/index"
    NearDupStream.neardupAppend(spark, b0, idx, 0.8)
    // DEGRADE the landed bucket table to the legacy shape the pre-
    // long-key code published: flat directory (no band=/bshard= dirs),
    // 32-char md5-hex STRING bucket whose first 15 hex digits carry
    // the same 60 bits md5Long keeps
    val bucketsDir = s"$idx/buckets"
    val legacy = spark.read.parquet(bucketsDir)
      .select(col("doc_id"), col("band"),
        concat(lpad(lower(hex(col("bucket"))), 15, "0"),
          lit("0" * 17)).as("bucket"))
    val legacyTmp = s"$idx/buckets_legacy_tmp"
    legacy.coalesce(1).write.parquet(legacyTmp)
    rmTree(new java.io.File(bucketsDir))
    assert(new java.io.File(legacyTmp).renameTo(new java.io.File(bucketsDir)))

    NearDupStream.neardupAppend(spark, b1, idx, 0.8) // migrates, then publishes
    NearDupStream.neardupAppend(spark, b2, idx, 0.8) // the previously-wedged read

    // the pair table equals the batch tier over the union corpus
    val want = batchPairs(b0.unionByName(b1).unionByName(b2),
      tmp.getAbsolutePath + "/corpus")
    assert(pairsOf(idx) === want,
      "post-migration pair table diverged from the batch tier")
    assert(pairsOf(idx).map(p => (p._1, p._2)) ===
      Seq((0L, 10L), (0L, 21L), (10L, 21L)),
      "legacy-landed, cross-upgrade, and post-upgrade pairs must all be found")
    // the live table is now native: long keys, (band, bshard) layout,
    // no retired/staging debris
    val migrated = spark.read.parquet(bucketsDir)
    assert(migrated.schema("bucket").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(migrated.columns.contains("bshard"))
    val debris = new java.io.File(idx).listFiles()
      .map(_.getName).filter(n => n.contains("__compact_staging") ||
        n.contains("__retired")).toSeq
    assert(debris.isEmpty, s"migration debris survived: $debris")
    rmTree(tmp)
  }

  test("st9 gated probe drops the bucket row filter past BucketInFilterMax and stays lossless") {
    // round-17 (VERDICT r16 #2): a near-BucketGateMax batch used to
    // build a ~100k-literal `bucket IN (...)` expression. Past
    // BucketInFilterMax distinct hit buckets the probe must keep only
    // the (band, bshard) PARTITION filter — the row filter is a pruning
    // hint, so the candidate set is identical either way.
    import spark.implicits._
    // enough distinct landed docs that an all-duplicate fresh batch's
    // distinct hit buckets exceed the cap (LshBands buckets per doc);
    // per-doc word soup keeps the landed corpus itself dup-free
    val n = NearDupStream.BucketInFilterMax / Dedup.LshBands + 40
    def soup(i: Int): String =
      (0 until 12).map(j => "w" + ((i * 1315423911L + j * 2654435761L) & 0xffffff)).mkString(" ")
    val landed = (0 until n).map(i => (i.toLong, soup(i))).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("neardup_infilter_spec").toFile
    val idx = tmp.getAbsolutePath + "/index"
    NearDupStream.neardupAppend(spark, landed, idx, 0.8)
    val rowFilterRe = """bucket#\d+L? (IN|INSET)""".r
    // small batch (one duplicate, LshBands hit buckets): the row filter
    // is present and pushed at the scan
    val one = Seq((100000L, soup(0))).toDF("doc_id", "text")
    val fbOne = NearDupStream.withShard(NearDupStream.bucketRowsOf(one))
      .localCheckpoint(true)
    val prunedOne = NearDupStream.prunedLandedBuckets(spark, s"$idx/buckets", fbOne)
    assert(prunedOne.isDefined)
    val planOne = prunedOne.get.queryExecution.optimizedPlan.toString
    assert(rowFilterRe.findFirstIn(planOne).isDefined,
      s"small hit set must keep the bucket row filter:\n$planOne")
    // bulk duplicate batch: hit buckets exceed the cap -> partition
    // filter only (no giant In literal in the plan)
    val bulk = (0 until n).map(i => (100000L + i, soup(i))).toDF("doc_id", "text")
    val fbBulk = NearDupStream.withShard(NearDupStream.bucketRowsOf(bulk))
      .localCheckpoint(true)
    assert(fbBulk.select("bucket").distinct().count() > NearDupStream.BucketInFilterMax,
      "fixture must overflow the row-filter cap")
    val prunedBulk = NearDupStream.prunedLandedBuckets(spark, s"$idx/buckets", fbBulk)
    assert(prunedBulk.isDefined)
    val planBulk = prunedBulk.get.queryExecution.optimizedPlan.toString
    assert(rowFilterRe.findFirstIn(planBulk).isEmpty,
      s"past BucketInFilterMax the probe must not build a bucket IN literal:\n$planBulk")
    // lossless: candidates equal the unpruned probe's at both sizes
    def candsOf(fb: org.apache.spark.sql.DataFrame,
        lb: Option[org.apache.spark.sql.DataFrame]) =
      NearDupStream.collisionCandidates(fb, lb)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val full = Some(spark.read.parquet(s"$idx/buckets"))
    assert(candsOf(fbOne, prunedOne) === candsOf(fbOne, full))
    val bulkGot = candsOf(fbBulk, prunedBulk)
    assert(bulkGot === candsOf(fbBulk, full))
    assert(bulkGot.size >= n, "every duplicated doc must surface a candidate")
    rmTree(tmp)
  }
}
