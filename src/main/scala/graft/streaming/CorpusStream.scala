package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of the d8 incremental dedup: corpus ingest with
  * dedup AT THE DOOR. Documents arrive as files; every micro-batch is
  * classified against the landed corpus (base + everything previous
  * batches landed) through `Dedup.incrementalDedupOf`'s bloom-probe +
  * broadcast-verify path, and only `new` docs land. A doc that
  * re-arrives in a LATER batch is caught because the earlier batch's
  * landing changed the corpus the bloom is built over — cross-batch
  * dedup state lives in storage, not executor memory, so it survives
  * restarts and is shared by any other reader.
  *
  * Idempotence: each batch lands under a deterministic
  * `batch_<epochId>` directory in OVERWRITE mode, so a foreachBatch
  * re-run after a crash rewrites the same files instead of appending
  * duplicates (the streamingMergeUpsert discipline, directory-level).
  * A classification LOG (doc_id, status, epoch) lands the same way —
  * the reference's update_log analog for the streaming path.
  *
  * At 100 TB the per-batch cost is d8's: one bloom fold over the
  * landed digest index + a map-side probe of the increment — the
  * landed corpus is never hash-shuffled per batch (see
  * Dedup.incrementalDedupOf's scaladoc; the rebuild-per-batch bloom
  * becomes an incrementally-maintained one in a production index).
  */
object CorpusStream {

  /** Start the ingest stream over `incomingDir` (parquet files with
    * (doc_id, text)), classifying against `baseDir` ∪ previously
    * landed batches under `sinkDir`. Returns the started query;
    * landed docs appear under `sinkDir/batch_*`, the status log under
    * `sinkDir/log_*`. */
  def corpusIngestStreaming(spark: SparkSession, incomingDir: String,
      baseDir: String, sinkDir: String,
      queryName: String = "corpus_ingest",
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val schema = spark.read.parquet(incomingDir).schema
    val base = spark.read.parquet(baseDir).select(col("doc_id"), col("text"))

    def landedSoFar(): DataFrame = {
      val fs = new java.io.File(sinkDir)
      val batchDirs = Option(fs.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
        .map(_.getAbsolutePath)
      if (batchDirs.isEmpty) base
      else base.unionByName(
        spark.read.parquet(batchDirs: _*).select(col("doc_id"), col("text")))
    }

    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(incomingDir)
      .select(col("doc_id"), col("text"))
      .writeStream
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val statuses = graft.operators.Dedup
          .incrementalDedupOf(landedSoFar(), batch)
        val newDocs = batch.join(
          statuses.filter(col("status") === "new").select(col("doc_id")),
          Seq("doc_id"), "leftsemi")
        newDocs.write.mode("overwrite").parquet(s"$sinkDir/batch_$epochId")
        statuses.withColumn("epoch", lit(epochId))
          .write.mode("overwrite").parquet(s"$sinkDir/log_$epochId")
        ()
      }
      .start()
  }
}
