package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Streaming NEAR-dup discovery at ingest — d3's MinHash-LSH tier run
  * CONTINUOUSLY (the st8 discipline extended from exact digests to the
  * banded similarity space). Documents arrive; each micro-batch
  * computes signatures for its own rows only, collides its band
  * buckets against the LANDED bucket index, exactly verifies the
  * candidates, and appends three artifacts: the discovered pairs, the
  * batch's bucket rows, and the batch's docs. The batch tier
  * ([[Dedup.minhashLshPairs]], reference dedupe_donors.py's periodic
  * full-table pass) re-signatures the corpus per run; at 100 TB the
  * production shape is this one — per-arrival work is batch-sized map
  * compute plus keyed index probes, never a corpus re-scan.
  *
  * Once-discovery across batches needs no bookkeeping: a pair is found
  * when its LATER member arrives (the earlier member is already in the
  * bucket index, the later one is not yet — the g2b "count at the
  * minimum new corner" argument, with arrival order as the age).
  * Within a batch, a_id < b_id on the self-collision plus a distinct
  * across bands counts each pair once.
  *
  * EVERY ARTIFACT IS ITS OWN LEDGER (the v9d/st6/st8 rule, applied
  * per-artifact because this verb publishes three): pairs anti-join
  * the landed pairs on (a_id, b_id), bucket rows anti-join the landed
  * buckets on doc_id, docs anti-join the landed docs on doc_id. A
  * retried batch, a restart, or a full redelivery under a fresh
  * checkpoint therefore publishes NOTHING (isEmpty-guarded — no empty
  * files), and a crash between the three appends is completed, not
  * duplicated, by the retry regardless of which subset landed. The
  * docs landing doubles as the verify corpus: exact-Jaccard
  * verification reads old-side texts from it semi-joined to the
  * (tiny) candidate id set — candidate-sized, never a scan.
  *
  * Determinism: the signature, banding, and verify functions are the
  * batch tier's own (same seeds, same md5-band buckets, same hashed
  * shingle verify), so the accumulated pair table equals
  * [[Dedup.minhashLshPairs]] as a SET at any micro-batching and under
  * any arrival order — pair discovery is order-dependent only in
  * WHICH batch finds a pair, never in whether or what it finds. The
  * gate form (`st9_neardup_stream`) shares d3's oracle SQL verbatim.
  */
object NearDupStream {

  // Test seam: invoked with each micro-batch's fresh-pair frame BEFORE
  // any append. A spec lands a partial slice of the batch's artifacts
  // and throws — the killed-append state. Identity in production.
  private[graft] var neardupIngestFaultHook: DataFrame => Unit = _ => ()

  // Test seam #2: invoked with the batch's fresh docs AFTER the pairs
  // and buckets appends, BEFORE the docs append — the torn window where
  // the batch's own bucket rows are landed but its docs are not (the
  // window whose retry reaches the n_id == o_id self-collision path in
  // [[collisionCandidates]]). Identity in production.
  private[graft] var neardupPreDocsFaultHook: DataFrame => Unit = _ => ()

  /** Start the ingest stream: parquet document files arriving under
    * `incomingDir` maintain the LSH index rooted at `indexPath`
    * (`docs/`, `buckets/`, `pairs/`), one file per micro-batch. */
  def minhashIngest(spark: SparkSession, incomingDir: String,
      indexPath: String, checkpoint: String, threshold: Double = 0.8,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      queryName: String =
        "neardup_ingest_" + java.util.UUID.randomUUID().toString.take(8)): StreamingQuery = {
    spark.readStream.schema(schema.getOrElse(spark.read.parquet(incomingDir).schema))
      .option("maxFilesPerTrigger", 1)
      .parquet(incomingDir)
      .writeStream
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        neardupAppend(batch.sparkSession, batch, indexPath, threshold)
      }
      .start()
  }

  private[streaming] def readIfExists(s: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty) Some(s.read.parquet(path)) else None
  }

  /** (doc_id, band, bucket) rows for a (doc_id, text, ...) frame — the
    * batch tier's exact signature and banding functions, map-side.
    * Docs too short to signature (null sig) emit no rows. */
  private[graft] def bucketRowsOf(docs: DataFrame): DataFrame = {
    val rowsPerBand = Dedup.MinHashK / Dedup.LshBands
    val seedsA = (0 until Dedup.MinHashK).map(Dedup.seedA)
    val seedsB = (0 until Dedup.MinHashK).map(Dedup.seedB)
    val sigs = docs.select(col("doc_id"),
        graft.functions.MinHashSig(Dedup.shingles(col("text")),
          seedsA, seedsB, Dedup.MinHashP).as("sig"))
      .filter(col("sig").isNotNull)
    val bandBucket = (0 until Dedup.LshBands).map { b =>
      md5(concat_ws(",",
        (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*))
    }
    sigs.select(col("doc_id"),
      posexplode(array(bandBucket: _*)).as(Seq("band", "bucket")))
  }

  /** Candidate pairs (a_id < b_id, distinct) for a batch's bucket rows:
    * fresh×landed collisions (keyed probe of the index — at scale the
    * bucket table partitions by (band, bucket)) plus fresh×fresh within
    * the batch. Shared by the st9 and st10 ingest verbs. */
  private[graft] def collisionCandidates(freshBuckets: DataFrame,
      landedBuckets: Option[DataFrame]): DataFrame = {
    val within = freshBuckets.select(col("doc_id").as("a_id"), col("band"), col("bucket"))
      .join(freshBuckets.select(col("doc_id").as("b_id"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
    val all = landedBuckets match {
      case Some(lb) => within.unionByName(
        freshBuckets.select(col("doc_id").as("n_id"), col("band"), col("bucket"))
          .join(lb.select(col("doc_id").as("o_id"), col("band"), col("bucket")),
            Seq("band", "bucket"))
          // n_id == o_id is reachable on exactly one path: a retried
          // batch whose BUCKETS landed but whose docs did not (crash in
          // the buckets→docs window), where the batch's own bucket rows
          // are now in the landed index. Without this guard those rows
          // become (x,x) self-candidates that verify at jaccard 1.0 and
          // poison the pairs ledger permanently.
          .filter(col("n_id") =!= col("o_id"))
          .select(least(col("n_id"), col("o_id")).as("a_id"),
            greatest(col("n_id"), col("o_id")).as("b_id")))
      case None => within
    }
    all.distinct()
  }

  /** Like [[collisionCandidates]] but preserving WHICH side of each
    * collision is the ARRIVING doc: returns (a_id, b_id, drop_id)
    * where (a_id < b_id) canonicalizes the pair for verification and
    * drop_id names the doc an ingest-time curation rule discards —
    * the greater id within a batch (simultaneous arrival, batch c1's
    * rule) and the ARRIVING side against the landed corpus regardless
    * of id order (the landed copy was already served). Landed bucket
    * rows whose doc is still in the fresh batch — reachable only via
    * a retried partial publish where buckets landed before the
    * arrival ledger — are excluded from the landed side, so a retry
    * reaches the same drop decisions as a clean run (those pairs
    * appear on the within-batch path with the within-batch rule). */
  private[graft] def collisionCandidatesWithRoles(freshBuckets: DataFrame,
      landedBuckets: Option[DataFrame]): DataFrame = {
    val within = freshBuckets.select(col("doc_id").as("a_id"), col("band"), col("bucket"))
      .join(freshBuckets.select(col("doc_id").as("b_id"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("b_id").as("drop_id"))
    val all = landedBuckets match {
      case Some(lb) =>
        val freshIds = freshBuckets.select(col("doc_id")).distinct()
        val genuinelyLanded = lb.join(freshIds, Seq("doc_id"), "left_anti")
        within.unionByName(
          freshBuckets.select(col("doc_id").as("n_id"), col("band"), col("bucket"))
            .join(genuinelyLanded.select(col("doc_id").as("o_id"), col("band"), col("bucket")),
              Seq("band", "bucket"))
            .select(least(col("n_id"), col("o_id")).as("a_id"),
              greatest(col("n_id"), col("o_id")).as("b_id"),
              col("n_id").as("drop_id")))
      case None => within
    }
    // drop_id is a function of the pair and its path, and the two paths
    // are disjoint (within needs both sides fresh; landed excludes fresh
    // docs), so distinct keeps exactly one row per canonical pair
    all.distinct()
  }

  /** Exact-Jaccard verification of `cand` over texts drawn from the
    * batch plus the landed corpus, candidate-sized (the texts frame
    * semi-joins the broadcast candidate ids before shingling). */
  private[graft] def verifyOverTexts(cand: DataFrame, freshTexts: DataFrame,
      landedTexts: Option[DataFrame], threshold: Double): DataFrame = {
    val candIds = cand.select(col("a_id").as("doc_id"))
      .union(cand.select(col("b_id").as("doc_id"))).distinct()
    val texts = landedTexts
      .map(d => freshTexts.unionByName(d.select(col("doc_id"), col("text"))))
      .getOrElse(freshTexts)
    val hashed = texts.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("gram"))
      .select(col("doc_id"), Dedup.md5Long(col("gram")).as("gram_h"))
    Dedup.verifyCandidates(cand, hashed, threshold)
  }

  /** The per-batch verb, shared with the scale probe. */
  private[graft] def neardupAppend(s: SparkSession, batch: DataFrame,
      indexPath: String, threshold: Double): Unit = {
    val docsPath = s"$indexPath/docs"
    val bucketsPath = s"$indexPath/buckets"
    val pairsPath = s"$indexPath/pairs"

    // fresh rows: the docs landing is the arrival ledger (doc_id only
    // crosses the anti-join — the landed read prunes to one column)
    val landedDocs = readIfExists(s, docsPath)
    val fresh = landedDocs
      .map(d => batch.join(d.select(col("doc_id")), Seq("doc_id"), "left_anti"))
      .getOrElse(batch)
      .select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    if (fresh.isEmpty) return // replayed batch: publish NOTHING

    // batch-sized signature map — the batch tier's exact functions
    val freshBuckets = bucketRowsOf(fresh).localCheckpoint(true)

    // candidates: fresh×landed collisions + fresh×fresh, distinct
    // across bands; the landed pair set anti-joins away anything
    // already discovered (only reachable via a partially-published
    // retry)
    val landedBuckets = readIfExists(s, bucketsPath)
    val cand0 = collisionCandidates(freshBuckets, landedBuckets)
    val landedPairs = readIfExists(s, pairsPath)
    val cand = landedPairs
      .map(lp => cand0
        .join(lp.select(col("a_id"), col("b_id")), Seq("a_id", "b_id"), "left_anti"))
      .getOrElse(cand0)
      .localCheckpoint(true)

    // exact verify over candidate docs only: new texts from the batch,
    // old texts from the landed docs semi-joined by the candidate ids
    val newPairs =
      if (cand.isEmpty) cand.withColumn("jaccard", lit(0.0d))
      else verifyOverTexts(cand, fresh, landedDocs, threshold)
    val pairsPinned = newPairs.localCheckpoint(true)

    neardupIngestFaultHook(pairsPinned)

    // bucket rows get their own ledger guard: a retry after a partial
    // publish re-enters with `fresh` unchanged (docs land last), so
    // already-landed bucket rows must drop here, not re-append
    val bucketsToWrite = landedBuckets
      .map(lb => freshBuckets.join(lb.select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti"))
      .getOrElse(freshBuckets)
      .localCheckpoint(true)

    if (!pairsPinned.isEmpty) pairsPinned.write.mode("append").parquet(pairsPath)
    if (!bucketsToWrite.isEmpty) bucketsToWrite.write.mode("append").parquet(bucketsPath)
    neardupPreDocsFaultHook(fresh)
    // the arrival ledger lands LAST: any earlier crash leaves the batch
    // fresh, and each artifact's own anti-join completes the publish
    fresh.write.mode("append").parquet(docsPath)
  }
}
