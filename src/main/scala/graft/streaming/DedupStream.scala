package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming EXACT dedup at ingest — the training-pipeline pattern the
  * batch tier (d1/u3/d8) runs periodically, run CONTINUOUSLY instead:
  * document files arrive, each micro-batch keeps only content digests
  * the survivor table has never seen, and the survivor table is
  * immediately consumable by every downstream stage (curation,
  * indexing, packing). The reference dedups in periodic batch jobs
  * (dedupe_donors.py's full-table pass); at 100 TB re-scanning the
  * corpus per arrival is the non-starter that makes ingest-time dedup
  * the production shape.
  *
  * The SURVIVOR TABLE IS THE LEDGER (the st6/v9d discipline applied to
  * dedup): each batch (1) collapses within-batch duplicates to the
  * min-doc_id row per digest — one aggregate, batch-sized; (2)
  * anti-joins the landed survivor digests — the authority that
  * survives restarts because it is the OUTPUT itself, not streaming
  * state; (3) appends the fresh rows. So a retried batch (offset
  * uncommitted), a restart, or a FULL redelivery under a fresh
  * checkpoint publishes nothing — already-landed digests anti-join
  * away, and a KILLED append's partial task commits are completed,
  * not duplicated, by the retry (the landed half drops in the
  * anti-join, only the missing rows append — spec-asserted).
  *
  * First-wins semantics, stated honestly: "first" is ARRIVAL order —
  * what ingest-time dedup means in production (the earliest-ingested
  * copy is kept; a later arrival is by definition the duplicate). The
  * gate form arranges arrival order = doc_id order (range-split
  * files), which makes the result equal the batch tier's min-doc_id
  * winner and therefore exactly oracle-expressible; under arbitrary
  * arrival orders the WINNER ROW within a digest group differs while
  * the digest SET — what dedup exists to bound — is arrival-invariant.
  *
  * At 100 TB: the anti-join is digest-to-digest (never text bytes —
  * the survivor read prunes to the digest column), batch-sized on the
  * probe side; the survivor table is append-only parquet that
  * compaction (s16b's verb) can re-layout without changing semantics.
  */
object DedupStream {

  // Test seam: invoked with each micro-batch's FRESH rows BEFORE the
  // append. A spec lands a partial slice and throws — the killed-
  // append state (some task commits visible, batch unacknowledged).
  // Identity in production.
  private[graft] var dedupIngestFaultHook: DataFrame => Unit = _ => ()

  /** Start the ingest stream: parquet document files (doc_id, text,
    * lang, source) arriving under `incomingDir` dedup-append into the
    * survivor table at `survivorsPath` (doc_id, text, lang, source,
    * digest), one file per micro-batch. */
  def exactDedupIngest(spark: SparkSession, incomingDir: String,
      survivorsPath: String, checkpoint: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      queryName: String =
        "dedup_ingest_" + java.util.UUID.randomUUID().toString.take(8)): StreamingQuery = {
    spark.readStream.schema(schema.getOrElse(spark.read.parquet(incomingDir).schema))
      .option("maxFilesPerTrigger", 1)
      .parquet(incomingDir)
      .writeStream
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dedupAppend(batch.sparkSession, batch, survivorsPath)
      }
      .start()
  }

  /** The per-batch verb, shared with the scale probe: collapse
    * within-batch duplicates, drop digests the survivor table has
    * seen, append only the fresh rows. Freshness is decided through
    * the [[LedgerIndex]] bloom sidecar (round-13 verdict task #1):
    * digests the bloom has never seen pass with ZERO survivor bytes
    * read; only bloom hits trigger one landed pass — the survivor
    * DIGEST COLUMN (parquet projection, never text bytes) streamed
    * past a broadcast of the candidate set, never hash-shuffled — so
    * per-batch cost no longer grows with the corpus (the 300× ladder's
    * measured term was this anti-join shuffling the survivor digests
    * every batch). The increment merges into the sidecar BEFORE the
    * append (bloom-ahead: a crash mid-append leaves landed rows INSIDE
    * the bloom, so the retry verifies instead of re-appending — the
    * reverse order would duplicate). */
  private[graft] def dedupAppend(s: SparkSession, batch: DataFrame,
      survivorsPath: String): Unit = {
    // within-batch first-wins: min(struct) orders by doc_id first
    // (unique), one partial-agged aggregate
    // no pin here: filterFresh pins the flagged frame itself (one
    // materialization covers the bloom split's three consumers)
    val winners = batch
      .withColumn("digest", md5(col("text")))
      .groupBy(col("digest"))
      .agg(min(struct(col("doc_id"), col("text"), col("lang"),
        col("source"))).as("w"))
      .select(col("w.doc_id"), col("w.text"), col("w.lang"),
        col("w.source"), col("digest"))
    val root = new org.apache.hadoop.fs.Path(survivorsPath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val hasLanded = fs.exists(root) && fs.listStatus(root).exists { st =>
      !st.getPath.getName.startsWith("_")
    }
    val idx = LedgerIndex.readOrRebuild(s, survivorsPath,
      if (hasLanded) Some(s.read.parquet(survivorsPath).select(col("digest")))
      else None, "digest")
    // filterFresh returns its own pin — no re-checkpoint (round-15)
    val pinned = idx match {
      case Some(i) if hasLanded => LedgerIndex.filterFresh(winners, "digest",
        i, s.read.parquet(survivorsPath).select(col("digest")))
      case _ => winners.localCheckpoint(true)
    }
    // bloom-AHEAD of the table mutation (see scaladoc ordering note)
    if (!pinned.isEmpty)
      LedgerIndex.mergeIncrement(s, survivorsPath,
        pinned.select(col("digest")), "digest", idx)
    dedupIngestFaultHook(pinned)
    // a fully-duplicate (replayed) batch is a TRUE no-op — no empty
    // files, no publish (the bm25IndexAppend rule)
    if (!pinned.isEmpty) pinned.write.mode("append").parquet(survivorsPath)
  }
}
