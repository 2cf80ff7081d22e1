package graft

import org.apache.spark.sql.functions._
import graft.streaming.NearDupStream
import graft.operators.Dedup

/** The stream-accumulated pair table must equal the batch MinHash-LSH
  * tier as a set at any micro-batching (pair discovery is arrival-order
  * invariant — a pair is found when its later member arrives), and the
  * three landed artifacts (pairs / buckets / docs) must each be their
  * own replay ledger: redelivery publishes nothing, a killed multi-
  * artifact publish is completed, not duplicated, by the retry. The
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
    def files(sub: String) = new java.io.File(s"$idx/$sub").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val before = Seq("pairs", "buckets", "docs").map(files)
    val q2 = NearDupStream.minhashIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp2")
    try q2.processAllAvailable() finally q2.stop()
    assert(Seq("pairs", "buckets", "docs").map(files) === before,
      "redelivery published files")
    assert(pairsOf(idx) === want)
    rmTree(tmp)
  }

  test("st9 kill between appends: the retry completes the publish without duplicating any artifact") {
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
    // crash batch 1 between its appends: the pairs artifact lands, then
    // the query dies before buckets and docs publish — the torn state a
    // killed three-artifact publish leaves behind
    NearDupStream.neardupIngestFaultHook = pairs => {
      if (!pairs.isEmpty) {
        pairs.write.mode("append").parquet(s"$idx/pairs")
        throw new RuntimeException("injected mid-publish crash")
      }
    }
    try {
      val q = NearDupStream.minhashIngest(spark, incoming, idx,
        tmp.getAbsolutePath + "/cp")
      intercept[Exception] { try q.processAllAvailable() finally q.stop() }
    } finally NearDupStream.neardupIngestFaultHook = _ => ()
    // torn state is real: the pair landed, batch 1's docs did not
    assert(pairsOf(idx).map(p => (p._1, p._2)) === Seq((0L, 10L)))
    val docsMid = spark.read.parquet(s"$idx/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(docsMid === Set(0L), s"crash fixture must leave batch 1 unlanded, got $docsMid")
    // restart on the SAME checkpoint: batch 1 redelivers in full; each
    // artifact's own anti-join drops what already landed and appends
    // only the rest — content equals a clean run, nothing doubled
    val q2 = NearDupStream.minhashIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp")
    try q2.processAllAvailable() finally q2.stop()
    val want = batchPairs(b0.unionByName(b1), tmp.getAbsolutePath + "/corpus")
    assert(pairsOf(idx) === want, "retry must not re-append the landed pair")
    val docs = spark.read.parquet(s"$idx/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(docs === Seq(0L, 10L, 11L), "docs must land exactly once each")
    val bucketDups = spark.read.parquet(s"$idx/buckets")
      .groupBy(col("doc_id"), col("band")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(bucketDups === 0L, "bucket rows must not duplicate across the retry")
    rmTree(tmp)
  }

  test("st9 kill in the buckets→docs window: the retry must not mint self-pairs from its own landed bucket rows") {
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
    // crash batch 1 AFTER its pairs and buckets appends, BEFORE the
    // docs append: the retry re-enters with the batch still fresh but
    // its own bucket rows already in the landed index — the window
    // where fresh×landed collisions can degenerate into (x, x)
    NearDupStream.neardupPreDocsFaultHook = fresh => {
      val ids = fresh.select(col("doc_id")).collect().map(_.getLong(0)).toSet
      if (ids.contains(10L))
        throw new RuntimeException("injected crash before the docs append")
    }
    try {
      val q = NearDupStream.minhashIngest(spark, incoming, idx,
        tmp.getAbsolutePath + "/cp")
      intercept[Exception] { try q.processAllAvailable() finally q.stop() }
    } finally NearDupStream.neardupPreDocsFaultHook = _ => ()
    // torn state is real: batch 1's pair and bucket rows landed, docs did not
    assert(pairsOf(idx).map(p => (p._1, p._2)) === Seq((0L, 10L)))
    val bucketDocsMid = spark.read.parquet(s"$idx/buckets")
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(bucketDocsMid === Set(0L, 10L, 11L),
      s"crash fixture must leave batch 1's buckets landed, got $bucketDocsMid")
    val docsMid = spark.read.parquet(s"$idx/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(docsMid === Set(0L), s"crash fixture must leave batch 1's docs unlanded, got $docsMid")
    // restart on the SAME checkpoint: batch 1 redelivers in full; its
    // own landed bucket rows must produce NO self-candidates, and the
    // already-landed pair must not re-append
    val q2 = NearDupStream.minhashIngest(spark, incoming, idx,
      tmp.getAbsolutePath + "/cp")
    try q2.processAllAvailable() finally q2.stop()
    val got = pairsOf(idx)
    assert(got.forall(p => p._1 != p._2),
      s"self-pairs poisoned the pairs ledger: $got")
    val want = batchPairs(b0.unionByName(b1), tmp.getAbsolutePath + "/corpus")
    assert(got === want, "retry diverged from the batch tier")
    val docs = spark.read.parquet(s"$idx/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(docs === Seq(0L, 10L, 11L), "docs must land exactly once each")
    val bucketDups = spark.read.parquet(s"$idx/buckets")
      .groupBy(col("doc_id"), col("band")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(bucketDups === 0L, "bucket rows must not duplicate across the retry")
    rmTree(tmp)
  }

  test("st9 gate form equals the batch MinHash-LSH tier on the fixture corpus") {
    val got = Dedup.streamedNearDupPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = Dedup.minhashLshPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
  }
}
