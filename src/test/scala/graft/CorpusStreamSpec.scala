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
}
