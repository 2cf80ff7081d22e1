package graft

import org.apache.spark.sql.functions._
import graft.streaming.CurationStream
import graft.operators.{Curation, Dedup}

/** Curation at ingest: the streamed curated table must hold exactly
  * the batch composition's kept set (quality gate + exact dedup +
  * near-dup b-drop under id-ordered arrival; the ARRIVING side drops
  * under out-of-order arrival), and the three landed artifacts must
  * publish as ONE atomic commit (kill mid-staging → nothing visible,
  * kill mid-publish → replayed at stream start). Planted corpora pin
  * the reject paths; the sf0.01 gate form is oracle-checked against
  * the single-statement SQL composition. */
class CurationStreamSpec extends SparkSpec {

  private val pad = (1 to 30).map(i => s"w$i").mkString(" ") // ≥ MinTokens filler

  private def curated(root: String): Seq[Long] =
    spark.read.parquet(s"$root/curated")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted

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

  test("st10: quality rejects, exact dups, and near dups all gate; chains drop per the b-rule") {
    import spark.implicits._
    // doc 0: survives everything. doc 1: too short (quality reject).
    // doc 2: exact dup of 0 ACROSS batches (drops, and must not enter
    // the index). doc 3: identical to 0 -> near-... no: identical is
    // exact; doc 3 is a distinct text. doc 4: exact dup of 3 within
    // its batch. doc 5: near-dup CHAIN head case — 5 is dropped for
    // pairing with 3, and doc 6 pairing ONLY with 5 must STILL drop
    // (batch b-rule: b falls whether or not a also fell).
    val t0 = s"alpha bravo charlie delta echo foxtrot golf hotel $pad"
    val t3 = s"november oscar papa quebec romeo sierra tango uniform $pad"
    // t5: t3 with one word changed (high jaccard); t6: t5 with another
    // word changed (pairs with t5; may or may not pair with t3)
    val t5 = t3.replace("november", "zulu")
    val t6 = t5.replace("oscar", "yankee")
    val b0 = Seq((0L, t0, "en"), (1L, "too short", "en"), (3L, t3, "en"))
      .toDF("doc_id", "text", "lang")
    val b1 = Seq((2L, t0, "en"), (4L, t3, "fr"), (5L, t5, "en"), (6L, t6, "en"))
      .toDF("doc_id", "text", "lang")
    val tmp = java.nio.file.Files.createTempDirectory("curate_stream_spec").toFile
    val incoming = tmp.getAbsolutePath + "/incoming"
    val root = tmp.getAbsolutePath + "/corpus"
    landTwoFiles(incoming, b0, b1)
    val q = CurationStream.curateIngest(spark, incoming, root,
      tmp.getAbsolutePath + "/cp1")
    try q.processAllAvailable() finally q.stop()

    // the batch-rule mirror, computed independently: exact survivors
    // minus the b-side of every qualifying minhash pair
    val all = b0.unionByName(b1)
      .withColumn("n_tokens", size(graft.operators.TextOps.tokens(col("text"))).cast("long"))
      .filter(col("n_tokens") >= Curation.MinTokens)
    val ex = all.withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
          .orderBy(col("doc_id"))))
      .filter(col("rk") === 1).drop("rk").localCheckpoint(true)
    val corpusDir = tmp.getAbsolutePath + "/asTable"
    ex.select(col("doc_id"), col("text")).write.mode("overwrite")
      .parquet(s"$corpusDir/documents.parquet")
    val drops = Dedup.minhashLshPairs(spark, corpusDir)
      .select(col("b_id")).collect().map(_.getLong(0)).toSet
    val want = ex.select(col("doc_id")).collect().map(_.getLong(0))
      .filterNot(drops).toSeq.sorted
    assert(curated(root) === want, "streamed curated set diverged from the batch rule")
    // the planted paths actually exercised: 1 (quality), 2 and 4
    // (exact), 5 and 6 (near-dup, including the chain case)
    assert(curated(root) === Seq(0L, 3L))
    // dropped near-dups stay in the index (future arrivals must still
    // collide with them); exact dups and quality rejects do not
    val exIds = spark.read.parquet(s"$root/exact")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(exIds === Seq(0L, 3L, 5L, 6L))

    // full redelivery under a fresh checkpoint publishes NOTHING
    // RECURSIVE walk: the buckets artifact is (band, bshard)
    // partitioned, so its data files live under nested dirs
    def files(sub: String): Set[String] = {
      def walk(f: java.io.File): Seq[String] =
        Option(f.listFiles()).map(_.toSeq).getOrElse(Nil).flatMap { c =>
          if (c.isDirectory) walk(c)
          else if (c.getName.endsWith(".parquet")) Seq(c.getPath) else Nil
        }
      walk(new java.io.File(s"$root/$sub")).toSet
    }
    val before = Seq("exact", "buckets", "curated").map(files)
    val q2 = CurationStream.curateIngest(spark, incoming, root,
      tmp.getAbsolutePath + "/cp2")
    try q2.processAllAvailable() finally q2.stop()
    assert(Seq("exact", "buckets", "curated").map(files) === before,
      "redelivery published files")
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

  test("st10 kill mid-staging: nothing publishes; restart drops the debris and completes the batch") {
    import spark.implicits._
    val t0 = s"alpha bravo charlie delta echo foxtrot golf hotel $pad"
    val t3 = s"november oscar papa quebec romeo sierra tango uniform $pad"
    val b0 = Seq((0L, t0, "en")).toDF("doc_id", "text", "lang")
    val b1 = Seq((3L, t3, "en"), (5L, t3.replace("november", "zulu"), "en"))
      .toDF("doc_id", "text", "lang")
    val tmp = java.nio.file.Files.createTempDirectory("curate_kill_spec").toFile
    val incoming = tmp.getAbsolutePath + "/incoming"
    val root = tmp.getAbsolutePath + "/corpus"
    landTwoFiles(incoming, b0, b1)
    // crash batch 1 after staging, BEFORE the redo record claims
    var calls = 0
    graft.streaming.IngestCommit.stagingFaultHook = _ => {
      calls += 1
      if (calls == 2) throw new RuntimeException("injected mid-staging crash")
    }
    try {
      val q = CurationStream.curateIngest(spark, incoming, root,
        tmp.getAbsolutePath + "/cp")
      intercept[Exception] { try q.processAllAvailable() finally q.stop() }
    } finally graft.streaming.IngestCommit.stagingFaultHook = _ => ()
    // NOTHING of batch 1 is visible — the one-barrier contract
    assert(curated(root) === Seq(0L))
    val exMid = spark.read.parquet(s"$root/exact")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(exMid === Set(0L))
    // restart on the SAME checkpoint: batch 1 redelivers and completes
    val q2 = CurationStream.curateIngest(spark, incoming, root,
      tmp.getAbsolutePath + "/cp")
    try q2.processAllAvailable() finally q2.stop()
    assert(curated(root) === Seq(0L, 3L), "5 must still drop (near-dup of 3)")
    val exIds = spark.read.parquet(s"$root/exact")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(exIds === Seq(0L, 3L, 5L))
    noDebris(root)
    rmTree(tmp)
  }

  test("st10 kill mid-publish: the claimed publish replays to completion; drops equal a clean run") {
    import spark.implicits._
    val t0 = s"alpha bravo charlie delta echo foxtrot golf hotel $pad"
    val t3 = s"november oscar papa quebec romeo sierra tango uniform $pad"
    val b0 = Seq((0L, t0, "en")).toDF("doc_id", "text", "lang")
    val b1 = Seq((3L, t3, "en"), (5L, t3.replace("november", "zulu"), "en"))
      .toDF("doc_id", "text", "lang")
    val tmp = java.nio.file.Files.createTempDirectory("curate_kill2_spec").toFile
    val incoming = tmp.getAbsolutePath + "/incoming"
    val root = tmp.getAbsolutePath + "/corpus"
    landTwoFiles(incoming, b0, b1)
    // crash batch 1 mid-rename: curated and buckets live, the exact
    // rename (the arrival authority, last) not yet — record claimed
    var exactRenames = 0
    graft.streaming.IngestCommit.publishFaultHook = sub => {
      if (sub == "exact") {
        exactRenames += 1
        if (exactRenames == 2)
          throw new RuntimeException("injected mid-publish crash")
      }
    }
    try {
      val q = CurationStream.curateIngest(spark, incoming, root,
        tmp.getAbsolutePath + "/cp")
      intercept[Exception] { try q.processAllAvailable() finally q.stop() }
    } finally graft.streaming.IngestCommit.publishFaultHook = _ => ()
    // torn mid-rename state is real — and claimed
    assert(curated(root) === Seq(0L, 3L))
    val exMid = spark.read.parquet(s"$root/exact")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(exMid === Set(0L), s"crash fixture must leave batch 1's exact staged, got $exMid")
    val recs = new java.io.File(root, graft.streaming.IngestCommit.LogDir).listFiles()
    assert(recs != null && recs.nonEmpty, "the crash must leave a claimed redo record")
    // restart: recover replays the exact rename, redelivery adds nothing
    val q2 = CurationStream.curateIngest(spark, incoming, root,
      tmp.getAbsolutePath + "/cp")
    try q2.processAllAvailable() finally q2.stop()
    assert(curated(root) === Seq(0L, 3L), "replay + redelivery must equal a clean run")
    val exIds = spark.read.parquet(s"$root/exact")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(exIds === Seq(0L, 3L, 5L))
    val bucketDups = spark.read.parquet(s"$root/buckets")
      .groupBy(col("doc_id"), col("band")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(bucketDups === 0L)
    noDebris(root)
    rmTree(tmp)
  }

  test("st10 out-of-order arrival: the arriving smaller-id twin drops, the landed larger-id copy survives") {
    import spark.implicits._
    val t7 = s"november oscar papa quebec romeo sierra tango uniform $pad"
    val t5 = t7.replace("november", "zulu") // near-dup of t7
    // PERMUTED arrival: the LARGER id lands first, its smaller-id
    // near-twin arrives a batch later — the inversion of the gate's
    // pinned id-ordered fixtures
    val b0 = Seq((7L, t7, "en")).toDF("doc_id", "text", "lang")
    val b1 = Seq((5L, t5, "en")).toDF("doc_id", "text", "lang")
    val tmp = java.nio.file.Files.createTempDirectory("curate_ooo_spec").toFile
    val incoming = tmp.getAbsolutePath + "/incoming"
    val root = tmp.getAbsolutePath + "/corpus"
    landTwoFiles(incoming, b0, b1)
    val q = CurationStream.curateIngest(spark, incoming, root,
      tmp.getAbsolutePath + "/cp")
    try q.processAllAvailable() finally q.stop()
    // arrival-authoritative semantics: the landed copy (7) was already
    // served, the late arrival (5) is the redundant one — 5 drops even
    // though the batch id rule would have kept it and dropped 7
    assert(curated(root) === Seq(7L),
      "out-of-order near-dup arrival must drop the ARRIVING side")
    // the batch-rule mirror REALLY diverges here (this spec pins a
    // divergence, not an equality): batch c1 keeps the smaller id
    val corpusDir = tmp.getAbsolutePath + "/asTable"
    b0.unionByName(b1).select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    val batchDrops = Dedup.minhashLshPairs(spark, corpusDir)
      .select(col("b_id")).collect().map(_.getLong(0)).toSet
    assert(batchDrops === Set(7L), "fixture must invert the batch rule")
    // the dropped arrival still enters the exact table and the bucket
    // index (future arrivals must collide with it)
    val exIds = spark.read.parquet(s"$root/exact")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(exIds === Seq(5L, 7L))
    rmTree(tmp)
  }

  test("curation roles: own landed bucket rows are treated as within-batch, not as older copies") {
    import spark.implicits._
    // defense-in-depth twin of the st9 self-pair unit test: if the
    // landed bucket index ever holds rows for docs still in the fresh
    // batch (unreachable from this stream's own crash windows under
    // the atomic publish), the drop roles must fall back to the
    // within-batch rule (greater id drops) — NOT name the fresh doc as
    // the arriving side of a collision with itself or its batchmate
    val t3 = s"november oscar papa quebec romeo sierra tango uniform $pad"
    val fresh = Seq((3L, t3), (5L, t3.replace("november", "zulu")))
      .toDF("doc_id", "text")
    val fb = graft.streaming.NearDupStream.bucketRowsOf(fresh).localCheckpoint(true)
    val roles = graft.streaming.NearDupStream.collisionCandidatesWithRoles(fb, Some(fb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(roles.forall(r => r._1 != r._2), s"self-candidates leaked: $roles")
    assert(roles.forall(r => r._3 == r._2), s"own rows must take the within-batch drop rule: $roles")
  }

  test("st10 gate form matches the batch composition on the fixture corpus") {
    val got = Curation.streamedCurate(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty)
    assert(got.map(_._3).sum > 0)
    // independent mirror: batch-rule kept set over the same corpus
    import spark.implicits._
    val all = Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(graft.operators.TextOps.tokens(col("text"))).cast("long"))
      .filter(col("n_tokens") >= Curation.MinTokens)
    val ex = all.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
          .orderBy(col("doc_id"))))
      .filter(col("rk") === 1).drop("rk").localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("curate_gate_mirror").toFile
    ex.select(col("doc_id"), col("text")).write.mode("overwrite")
      .parquet(tmp.getAbsolutePath + "/documents.parquet")
    val drops = Dedup.minhashLshPairs(spark, tmp.getAbsolutePath)
      .select(col("b_id")).collect().map(_.getLong(0)).toSet
    val want = ex.filter(!col("doc_id").isin(drops.toSeq: _*))
      .withColumn("split",
        when(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("int") % Curation.EvalBuckets === 0, lit("eval")).otherwise(lit("train")))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("lang"), col("split"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    rmTree(tmp)
  }
}
