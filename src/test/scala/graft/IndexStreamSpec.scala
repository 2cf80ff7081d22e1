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
}
