package graft

import org.apache.spark.sql.functions._
import graft.streaming.CorpusStream

/** The streaming d8 twin: dedup-at-the-door corpus ingest. The planted
  * scenario exercises the CROSS-BATCH case that distinguishes the
  * stream from per-batch classification: a doc landed by batch 1 must
  * mark its batch-2 re-arrival dup_of_landed, which only happens if
  * the landed state actually flows through storage between batches. */
class CorpusStreamSpec extends SparkSpec {

  test("streaming ingest lands exactly the new docs, dedup state crosses batches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_corpus_stream").toString

    Seq((1L, "alpha base doc"), (2L, "beta base doc"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/base")
    // two source files → two micro-batches (maxFilesPerTrigger=1).
    // file ordering follows modification time; write b1 first.
    Seq((10L, "fresh doc ten"), (11L, "alpha base doc"), // 11: dup of base
        (12L, "twelve twin"), (13L, "twelve twin"))      // 13: dup in batch
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$tmp/incoming/b1")
    Thread.sleep(1100) // distinct mtimes so b1 is batch 0, b2 batch 1
    Seq((20L, "fresh doc ten"),      // dup of doc 10 — landed by BATCH 1
        (21L, "fresh doc twentyone"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$tmp/incoming/b2")
    // the file source walks the dir recursively via glob
    val q = CorpusStream.corpusIngestStreaming(spark, s"$tmp/incoming/*",
      s"$tmp/base", s"$tmp/sink", "corpus_ingest_spec")
    q.awaitTermination()

    val landed = spark.read.parquet(s"$tmp/sink/batch_*")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(landed === Set(10L, 12L, 21L),
      "sink must hold exactly first-arrival fresh docs")

    val log = spark.read.parquet(s"$tmp/sink/log_*")
      .select("doc_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(log === Map(
      10L -> "new", 11L -> "dup_of_landed",
      12L -> "new", 13L -> "dup_in_batch",
      20L -> "dup_of_landed", // proves batch-1 landing reached batch 2
      21L -> "new"))
  }

  test("crash-retried epoch re-lands identically and never reads landed text") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_corpus_retry").toString
    Seq((1L, "alpha base doc"), (2L, "beta base doc"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/base")
    Seq((10L, "fresh doc ten"), (11L, "alpha base doc"),
        (12L, "twelve twin"), (13L, "twelve twin"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$tmp/incoming/b1")
    Thread.sleep(1100)
    Seq((20L, "fresh doc ten"), (21L, "fresh doc twentyone"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$tmp/incoming/b2")
    val q1 = CorpusStream.corpusIngestStreaming(spark, s"$tmp/incoming/*",
      s"$tmp/base", s"$tmp/sink", "corpus_retry_spec_run1")
    q1.awaitTermination()
    // the manager deregisters a finished AvailableNow query
    // asynchronously; drain before reusing the checkpoint
    q1.stop()
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(spark.streams.active.isEmpty, "run1 did not deregister")

    def docsIn(dir: String) = spark.read.parquet(dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(docsIn(s"$tmp/sink/batch_1") === Set(21L))
    // the maintained index has folded base (2) + batch 0 (2) + batch 1 (1)
    val idx1 = spark.read.parquet(s"$tmp/sink/index_1").head()
    assert(idx1.getAs[Long]("n_landed") === 5L)

    // simulate the round-6 loss scenario: epoch 1's sink writes all
    // completed but the checkpoint commit was lost in a crash — the
    // restart re-runs foreachBatch(1) against a sink that already
    // contains batch_1/digests_1/index_1 (its own output)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$tmp/sink/_checkpoint/commits/1"))
    java.nio.file.Files.deleteIfExists( // the local-FS checksum twin
      java.nio.file.Paths.get(s"$tmp/sink/_checkpoint/commits/.1.crc"))
    // prove classification never touches landed TEXT: empty out
    // batch_0's parquet (its digests_0 stays) — any text re-read of
    // the landed corpus would now fail or mis-classify doc 20
    val b0 = new java.io.File(s"$tmp/sink/batch_0")
    b0.listFiles().filter(_.getName.endsWith(".parquet")).foreach(_.delete())

    CorpusStream.corpusIngestStreaming(spark, s"$tmp/incoming/*",
      s"$tmp/base", s"$tmp/sink", "corpus_retry_spec_run2").awaitTermination()

    // round 6 would have marked 21 dup_of_landed (against its own
    // output) and overwritten batch_1 empty — permanent loss
    assert(docsIn(s"$tmp/sink/batch_1") === Set(21L),
      "crash-retry must re-land the identical batch")
    val log1 = spark.read.parquet(s"$tmp/sink/log_1")
      .select("doc_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(log1 === Map(20L -> "dup_of_landed", 21L -> "new"))
    val idx1b = spark.read.parquet(s"$tmp/sink/index_1").head()
    assert(idx1b.getAs[Long]("n_landed") === 5L,
      "retried epoch must rebuild the same index state")
  }
}
