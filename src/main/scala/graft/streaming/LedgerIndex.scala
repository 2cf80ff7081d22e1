package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Bloom-fronted ledger reads for the ingest streams — the round-13
  * verdict's one measured growth term closed. st8/st9/st10 each read a
  * landed ledger per micro-batch to decide batch freshness (survivor
  * digests, the docs arrival authority, the exact table); as plain
  * anti-joins those reads SHUFFLE a corpus-cardinality column every
  * batch, so a continuously-running ingest stream pays a corpus-shaped
  * cost per arrival (the 300× ladder measured st8 itself growing 3×
  * from 100× to 300×). This sidecar applies d8's discipline
  * ([[Dedup.DigestIndex]]: one `BloomFilterAggregate` fold, probed
  * map-side via `BloomFilterMightContain`) to the streams' ledgers,
  * MAINTAINED incrementally (the CorpusStream merge rule) instead of
  * re-folded:
  *
  *  - the index lives in a `_ledger_index` sidecar dir next to the
  *    ledger (underscore → invisible to parquet discovery);
  *  - per batch, keys the bloom has NEVER seen are definitely fresh
  *    (no false negatives) with ZERO landed bytes read; only the
  *    possibly-seen candidates (true re-arrivals + ~1% FPs) trigger
  *    one landed pass — the ledger's key column STREAMED past a
  *    broadcast of the candidate set, never hash-shuffled — and a
  *    batch with no candidates (the steady all-fresh state) touches
  *    the ledger not at all;
  *  - the increment merges into the sidecar BEFORE the batch's rows
  *    land (bloom-AHEAD ordering): a crash between the index write
  *    and the landing leaves bloom entries for rows that never landed,
  *    which the exact verify against the authoritative ledger corrects
  *    on retry (extra FPs, never a false negative). The reverse order
  *    would let a crash mid-landing leave landed rows OUTSIDE the
  *    bloom — "definitely fresh" re-appends, i.e. duplicates.
  *  - a missing sidecar (a crashed write — the tmp+rename protocol
  *    never leaves a torn file — or a pre-sidecar ledger) REBUILDS by
  *    folding the ledger's key column once — the per-compaction-cycle
  *    rebuild the d8 scaladoc names; `n_landed` may drift upward
  *    across retries (the bloom OR is idempotent, the count is
  *    advisory sizing input only).
  *
  * At 100 TB the sidecar is exactly the compact digest index the d8
  * scaladoc says the sink maintains: ~1.2 GB per 10^9 keys at 1% FP,
  * shipped once per batch, amortized across partitions. */
private[graft] object LedgerIndex {

  val Dir = "_ledger_index"
  private val FileName = "index.bin"

  // Per-path in-process memo of the last index read/written: the
  // streams are single-writer per ledger (one query owns a
  // checkpoint), so within one process the memo always equals the
  // file and the per-batch read disappears. A PRESENCE check (one
  // metadata call) still runs per batch so an externally-dropped
  // sidecar (the rebuild spec, an operator reset) is honored.
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Dedup.DigestIndex]()

  private def fsOf(s: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  private def filePath(root: String) =
    new org.apache.hadoop.fs.Path(s"$root/$Dir", FileName)

  /** Read the sidecar under `root/_ledger_index`; None when absent or
    * torn (the tmp+rename write makes a present file complete by
    * construction). Driver-side raw I/O — NO Spark job: the sidecar
    * is one bloom blob, and a per-batch parquet read/write of it
    * measured as three extra job barriers per micro-batch on the 300×
    * ladder (the exact fixed-stack tax the one-barrier commit
    * removed in round 12). */
  def read(s: SparkSession, root: String): Option[Dedup.DigestIndex] = {
    val p = filePath(root)
    val fs = fsOf(s, root)
    if (!fs.exists(p)) { memo.remove(root); None }
    else Option(memo.get(root)).orElse {
      val in = new java.io.DataInputStream(fs.open(p))
      try {
        val n = in.readLong(); val expected = in.readLong()
        val len = in.readInt()
        val bloom = if (len < 0) null else {
          val b = new Array[Byte](len); in.readFully(b); b
        }
        val idx = Dedup.DigestIndex(n, expected, bloom)
        memo.put(root, idx)
        Some(idx)
      } finally in.close()
    }
  }

  private def write(s: SparkSession, root: String,
      idx: Dedup.DigestIndex): Unit = {
    val fs = fsOf(s, root)
    val p = filePath(root)
    fs.mkdirs(p.getParent)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, s"$FileName.tmp")
    val out = new java.io.DataOutputStream(fs.create(tmp, true))
    try {
      out.writeLong(idx.nLanded); out.writeLong(idx.expectedItems)
      if (idx.bloom == null) out.writeInt(-1)
      else { out.writeInt(idx.bloom.length); out.write(idx.bloom) }
    } finally out.close()
    // tmp + OVERWRITE-rename (FileContext — the FileSystem.rename
    // contract won't replace an existing dst, and a delete-then-rename
    // window would leave NO sidecar on a crash in between, forcing a
    // full ledger-column refold at the next batch): a crash leaves
    // either the old complete file or the new complete file, never a
    // torn one and never neither (missing → rebuild)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, s.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    memo.put(root, idx)
    ()
  }

  /** Sidecar FP rate: sized so a typical all-fresh batch has NO bloom
    * hits at all (P(any FP in a B-doc batch) ≈ B × fpp), because a
    * single hit costs one streamed pass of the ledger's key column —
    * the read the sidecar exists to skip. ~24 bits/key ≈ 3 MB per 2^20
    * keys. d8's 1% sizing is for a classify tier that always verifies;
    * here the common case must VERIFY NOTHING. */
  val SidecarFpp = 1e-5

  private def sized(n: Long): Long =
    math.max(Dedup.IndexExpectedItems, java.lang.Long.highestOneBit(
      math.max(1L, 2L * n - 1L)) * 2L)

  /** The sidecar's current index, REBUILT from the authoritative
    * ledger key frame when absent (a dropped sidecar, a crashed write
    * — one fold, the compaction-cycle rebuild) and RESIZED one tier up
    * when the ledger outgrew its sizing (an overfull bloom degrades
    * toward always-hit, which silently reinstates the per-batch
    * ledger read). `landedKeys` is by-name: a first-batch call with
    * no ledger never evaluates it. */
  def readOrRebuild(s: SparkSession, root: String,
      landedKeys: => Option[DataFrame], keyCol: String): Option[Dedup.DigestIndex] = {
    def rebuild(lk: DataFrame): Dedup.DigestIndex = {
      val keys = lk.select(col(keyCol).as("digest"))
      val idx = Dedup.digestIndexOf(keys, sized(keys.count()), SidecarFpp)
      write(s, root, idx)
      idx
    }
    read(s, root) match {
      case Some(idx) if idx.nLanded > idx.expectedItems =>
        landedKeys.map(rebuild).orElse(Some(idx))
      case Some(idx) => Some(idx)
      case None => landedKeys.map(rebuild)
    }
  }

  /** Keys-per-batch bound under which the increment merges by a
    * DRIVER-SIDE put of collected xxhash64 values (one bounded collect,
    * 8 bytes/key) instead of a distributed bloom fold: folding a tiny
    * increment still allocates and ships full-width bit arrays (12 MB
    * per buffer at 4M-key sizing), which the 300× ladder measured as
    * the streams' residual per-batch slope. Batches past the bound
    * (bulk landings) take the distributed fold once. */
  private val DriverPutMax = 100000L

  /** Merge a batch increment's keys into the sidecar and write it —
    * call BEFORE the batch's rows land (bloom-ahead ordering, see
    * object scaladoc). The fold is batch-sized; a FIRST landing (no
    * current index) sizes from its own count, so a bulk bootstrap
    * doesn't start life overfull. */
  def mergeIncrement(s: SparkSession, root: String, freshKeys: DataFrame,
      keyCol: String, current: Option[Dedup.DigestIndex]): Unit = {
    val keys = freshKeys.select(col(keyCol).as("digest"))
    // ONE job for the common path: collect up to the bound + 1 hashes
    // (8 bytes each); an overflow row routes to the distributed fold
    val hashes = keys.select(xxhash64(col("digest")).as("h"))
      .limit((DriverPutMax + 1).toInt)
      .collect().map(_.getLong(0)) // BOUNDED by DriverPutMax + 1
    val merged =
      if (hashes.length <= DriverPutMax) {
        val n = hashes.length.toLong
        val (bf, expected, baseN) = current match {
          case Some(cur) if cur.bloom != null =>
            (org.apache.spark.util.sketch.BloomFilter
              .readFrom(new java.io.ByteArrayInputStream(cur.bloom)),
              cur.expectedItems, cur.nLanded)
          case Some(cur) => // empty-corpus index: same sizing lineage
            (org.apache.spark.util.sketch.BloomFilter.create(cur.expectedItems,
              Dedup.bloomBitsFor(cur.expectedItems, SidecarFpp)),
              cur.expectedItems, cur.nLanded)
          case None =>
            val e = sized(n)
            (org.apache.spark.util.sketch.BloomFilter.create(e,
              Dedup.bloomBitsFor(e, SidecarFpp)), e, 0L)
        }
        hashes.foreach(bf.putLong)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        Dedup.DigestIndex(baseN + n, expected, bos.toByteArray)
      } else current match { // bulk landing: the distributed fold, once
        case Some(cur) =>
          Dedup.mergeIndexes(cur,
            Dedup.digestIndexOf(keys, cur.expectedItems, SidecarFpp))
        case None => Dedup.digestIndexOf(keys, sized(keys.count()), SidecarFpp)
      }
    write(s, root, merged)
  }

  /** Batch rows whose `keyCol` is NOT in the landed ledger: bloom
    * misses pass with zero landed bytes read; bloom hits are exactly
    * verified — the ledger's key column streamed ONCE past a broadcast
    * of the (candidate-sized) hit set, never hash-shuffled — and
    * unconfirmed FPs pass too. `landedKeys` must be the authoritative
    * ledger (same keyCol); it is BY-NAME so a no-hit batch never even
    * constructs the frame (eager construction costs a per-batch file
    * listing + schema inference over the ledger dir). A batch with no
    * bloom hits skips the landed read entirely — the steady all-fresh
    * state is flat in the corpus size.
    *
    * The returned frame is ALWAYS pinned (localCheckpoint'ed): in the
    * common no-hit path the flagged pin itself is returned, and the
    * hit path pins its (batch-sized) union — so callers must not
    * re-checkpoint the result (round-15: the old shape materialized
    * the batch TWICE per micro-batch, once here and once in the
    * caller's own pin — pure fixed-cost stack). */
  def filterFresh(batch: DataFrame, keyCol: String,
      index: Dedup.DigestIndex, landedKeys: => DataFrame): DataFrame = {
    if (index.bloom == null) return batch.localCheckpoint(true)
    val pinned = batch.localCheckpoint(true)
    // DRIVER-side bloom probe for bounded batches (round-15, the 1000×
    // rung): the bloom grows with the LEDGER (~6 MB/M keys at 1e-5 —
    // a 5M-doc corpus carries ~30-50 MB), and shipping it as a plan
    // literal re-serializes it into a task binary EVERY batch, a
    // per-batch cost proportional to corpus size — the exact shape the
    // sidecar exists to kill. The bloom is already in driver memory
    // (the read memo), and a micro-batch is small, so collect the
    // batch's ≤DriverPutMax key hashes off the pin (8 bytes each) and
    // probe locally: zero bloom bytes ship, and the common all-fresh
    // batch decides with ONE bounded collect. Hit rows (true
    // re-arrivals + ~1e-5 FPs) verify exactly against the ledger as
    // before, keyed through an InSet flag (hash-set per row, never an
    // In-expression tree). Batches past the bound — the bulk
    // bootstrap, where the whole corpus arrives as one "batch" — take
    // the one-literal-ship distributed flag, once.
    val hashes = pinned.select(xxhash64(col(keyCol)).as("h"))
      .limit((DriverPutMax + 1).toInt)
      .collect().map(_.getLong(0)) // BOUNDED by DriverPutMax + 1
    if (hashes.length <= DriverPutMax) {
      val bf = org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(index.bloom))
      val hitHashes = hashes.filter(bf.mightContainLong)
      if (hitHashes.isEmpty) pinned // no candidates: the ledger is never opened
      else {
        val hitCol = xxhash64(col(keyCol)).isInCollection(hitHashes.toSeq)
        val hits = pinned.filter(hitCol)
        val confirmed = landedKeys.select(col(keyCol))
          .join(broadcast(hits.select(col(keyCol)).distinct()),
            Seq(keyCol), "left_semi")
          .distinct() // candidate-bounded
        pinned.filter(!hitCol)
          .unionByName(hits.join(broadcast(confirmed), Seq(keyCol), "left_anti"))
          .localCheckpoint(true) // batch-sized
      }
    } else {
      import org.apache.spark.sql.GraftShims.{toCol, toExpr}
      import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
      val might: Column = toCol(BloomFilterMightContain(
        toExpr(lit(index.bloom)), toExpr(xxhash64(col(keyCol)))))
      // ONE literal ship: the flag materializes once; every downstream
      // consumer filters the stored flag
      val flagged = pinned.withColumn("__might", might).localCheckpoint(true)
      val hits = flagged.filter(col("__might"))
      val out =
        if (hits.isEmpty) flagged
        else {
          val confirmed = landedKeys.select(col(keyCol))
            .join(broadcast(hits.select(col(keyCol)).distinct()),
              Seq(keyCol), "left_semi")
            .distinct()
          flagged.filter(!col("__might"))
            .unionByName(hits.join(broadcast(confirmed), Seq(keyCol), "left_anti"))
            .localCheckpoint(true)
        }
      out.drop("__might")
    }
  }
}
