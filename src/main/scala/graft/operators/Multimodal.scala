package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Vectors

/** Multimodal-asset plumbing: opaque binary payloads + typed metadata.
  *
  * The pattern for image/audio/video at 100 TB: assets travel as
  * `binary` columns next to a metadata struct; decode/feature-extract
  * runs per-partition close to the data. The real decode libraries are
  * not in this container (per the build contract), so the decoder here
  * is a DETERMINISTIC STUB — md5-derived pseudo-features — while the
  * Spark-side plumbing (binary column, metadata struct, batch-shaped
  * partition processing, schema) is real and oracle-checked.
  *
  * Swap `stubDecode` for a mapInPandas/mapPartitions call into a real
  * decoder (PIL/ffmpeg) without touching the surrounding plan.
  */
object Multimodal {

  /** Documents re-cast as binary assets: payload = UTF-8 bytes of the
    * text (stand-in for image bytes), meta = typed struct. */
  def assets(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir).select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source"),
        col("lang"),
        col("n_chars").as("payload_chars")).as("meta"))
  }

  /** The stub decoder's format derivation — digest nibbles 9-10 mod
    * the format table. Shared by m1 and m5 so the decode definition
    * cannot drift between the stats and retrieval paths. */
  private[operators] def formatOf(digest: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(
      typedLit(Seq("jpeg", "png", "webp", "tiff")),
      (conv(substring(digest, 9, 2), 16, 10).cast("int") % 4) + 1)

  /** M1: "decode" each asset into pseudo image features. Every feature
    * derives from md5(payload) so the stub is deterministic and
    * portable: width/height/format mod-mapped from digest nibbles. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val digest = md5(col("payload"))
    assets(spark, dir)
      .withColumn("digest", digest)
      .select(
        col("asset_id"),
        col("meta.source").as("source"),
        length(col("payload")).as("n_bytes"),
        (conv(substring(col("digest"), 1, 4), 16, 10).cast("int") % 1920).as("width"),
        (conv(substring(col("digest"), 5, 4), 16, 10).cast("int") % 1080).as("height"),
        formatOf(col("digest")).as("format"))
      .orderBy(col("asset_id"))
  }

  /** Decoded-asset record produced by the batch decoder. */
  case class AssetFeatures(
      asset_id: Long, source: String, n_bytes: Int,
      width: Int, height: Int, format: String,
      frame_offsets: Seq[Int])

  /** M1b: the mapPartitions batch-decode path — the Scala analog of
    * mapInPandas for real decoder libraries.
    *
    * Column expressions (decodeFeatures) work for hash-derived stubs,
    * but a real image/audio decoder is a native library call that wants
    * batches: amortized init (one decoder per partition, not per row)
    * and vectorized input. This operator keeps that shape: per
    * partition, the "decoder" initializes once, rows are pulled through
    * it in groups of `batchSize`, and each batch produces typed records
    * (including a frame-sample list, the video-shaped output). The stub
    * decode is the same md5 derivation as decodeFeatures, so the two
    * paths are asserted equal in MultimodalSpec — swapping in PIL/ffmpeg
    * changes only the function body.
    */
  def decodeFeaturesBatched(spark: SparkSession, dir: String, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val in = assets(spark, dir).select(
      col("asset_id"), col("payload"), col("meta.source").as("source"))
      .as[(Long, Array[Byte], String)]

    val decoded = in.mapPartitions { rows =>
      // per-partition decoder init (a real decoder opens its context here)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { case (id, payload, source) =>
          val hex = md.digest(payload).map("%02x".format(_)).mkString
          def nib(from: Int, len: Int): Int =
            java.lang.Long.parseLong(hex.substring(from, from + len), 16).toInt
          val width = nib(0, 4) % 1920
          val height = nib(4, 4) % 1080
          val format = Seq("jpeg", "png", "webp", "tiff")(nib(8, 2) % 4)
          // frame sampling stub: 4 deterministic offsets into the payload
          val frames = (0 until 4).map(i => nib(10 + i, 4) % math.max(payload.length, 1))
          AssetFeatures(id, source, payload.length, width, height, format, frames)
        }
      }
    }
    // driver-facing output must not carry array columns (the driver's
    // pandas row-sort crashes on them) — render offsets as a csv string;
    // the typed Seq form is exercised in MultimodalSpec
    decoded.toDF()
      .withColumn("frame_offsets", concat_ws(",", col("frame_offsets").cast("array<string>")))
      .orderBy(col("asset_id"))
  }

  /** M2: corpus statistics per (source, format) — the sanity rollup a
    * multimodal ingestion pipeline runs before training. */
  def formatStats(spark: SparkSession, dir: String): DataFrame = {
    decodeFeatures(spark, dir)
      .groupBy(col("source"), col("format"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("width")).as("max_width"))
      .orderBy(col("source"), col("format"))
  }

  /** m3 quality bars: text admission (t2's quality_ppm, at the fixture
    * median so the gate bites) and embedding-coherence admission
    * (cosine-to-label-centroid, in ppm). */
  val PairTextMinPpm = 300000L
  val PairCosineMinPpm = 100000L

  /** m3: PAIRED-modality curation — the cross-modal gate a
    * text+embedding corpus (CLIP-style pairs, caption+image, RAG
    * passages) runs before training: keep a pair only when BOTH
    * modalities pass — the text side by t2's quality score, the
    * embedding side by coherence with its label block (cosine to the
    * label centroid — an off-centroid vector under a high-quality
    * caption is exactly the mispaired-asset smell).
    *
    * Determinism/portability: centroids are per-dim means of
    * FLOORED-ppm values — every addend is an integer-valued double, so
    * the sum is exact in any order (the v6 Lloyd discipline) and one
    * double division ends the derivation; the cosine then accumulates
    * left-to-right (VecDot ≡ DuckDB list_reduce, proven by v1/v5/v6).
    *
    * Scale shape: centroid build is a posexplode + partial-agged
    * (label, dim) sum — k×dim rows through the exchange, the Lloyd
    * shuffle bound — re-assembled per label and BROADCAST (k rows)
    * into the pair scan; the text score is map-side; the rollup is a
    * |labels|-group agg. One wide exchange total. Per-class counts +
    * kept_id_sum pin the full confusion split in the hash compare. */
  def pairedCuration(spark: SparkSession, dir: String,
      textMinPpm: Long = PairTextMinPpm,
      cosineMinPpm: Long = PairCosineMinPpm): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin(TextOps.Stopwords.map(lit): _*)))
    val docs = documents(spark, dir)
      .withColumn("n_tokens", nTok)
      .withColumn("quality_ppm",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(floor(
            (least(col("n_tokens"), lit(100)) / lit(100.0) * 0.5
              + nStop / col("n_tokens").cast("double") * 0.5) * lit(1000000.0))))
      .select(col("doc_id"), col("quality_ppm"))
    val e = embeddings(spark, dir).select(col("vec_id"), col("label"), col("embedding"))
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(floor(col("v").cast("double") * 1000000.0)).as("s"),
        count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), (col("s") / col("n")).as("cv")))),
        x => x.getField("cv")).as("centroid"))
    val pairs = e.join(broadcast(cent), Seq("label"))
      .withColumn("cos_ppm",
        floor(Vectors.cosine(col("embedding"), col("centroid")) * lit(1000000.0)))
      .join(docs, col("vec_id") === col("doc_id"))
      .withColumn("q_ok", col("quality_ppm") >= textMinPpm)
      .withColumn("v_ok", col("cos_ppm") >= cosineMinPpm)
    pairs.groupBy(col("label"))
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("q_ok") && col("v_ok"), 1)).as("n_kept"),
        count(when(!col("q_ok") && col("v_ok"), 1)).as("n_text_reject"),
        count(when(col("q_ok") && !col("v_ok"), 1)).as("n_vec_reject"),
        count(when(!col("q_ok") && !col("v_ok"), 1)).as("n_both_reject"),
        sum(when(col("q_ok") && col("v_ok"), col("doc_id"))).as("kept_id_sum"))
      .orderBy(col("label"))
  }

  /** m4 banding geometry: 60-bit block hash split into 4 bands of 15
    * bits, candidates verified at hamming ≤ 3. The threshold is chosen
    * BELOW the band count on purpose: ≤3 differing bits across 4 bands
    * leave at least one band untouched (pigeonhole), so the banding is
    * provably LOSSLESS for the admitted pairs — every qualifying pair
    * is a candidate, never just probably (the j11b/v2c discipline:
    * blocking must be an optimization, not a semantics change). */
  val PhashBits = 60
  val PhashBands = 4
  val PhashBandBits = 15 // PhashBits / PhashBands
  val PhashMaxHamming = 3

  /** M4: perceptual near-dup pairs over the asset payloads — the
    * image-dedup tier of the multimodal pipeline (blockhash/aHash
    * family): hash each decoded sample stream with
    * [[graft.functions.BlockHash60]], generate candidates by exact
    * match on any 15-bit band, verify hamming over the full hash.
    * Catches payloads the EXACT tiers miss (any localized edit flips
    * few blocks) without text semantics — it runs on bytes, which is
    * the property the image/audio swap-in needs.
    *
    * Scale shape: hashing is map-side (one pass per payload); the
    * band self-join is on constant-size keys (the d3/d4 discipline —
    * never all-pairs); verification is bit_count over candidate rows
    * only. */
  def phashPairs(spark: SparkSession, dir: String): DataFrame =
    phashPairsOf(documents(spark, dir).select(col("doc_id"), col("text")))

  /** The m4 QUERY surface: per-hamming rollup of the qualifying pairs,
    * one row per admitted distance 0..maxHamming with pair count and
    * an id-sum membership pin (the s19/e3 discipline). Always
    * |maxHamming+1| rows — a corpus with no perceptual dups reports
    * zero counts rather than an empty frame, so "nothing found" is a
    * positive, hash-checked verdict (sf0.001/sf0.01 contain only
    * permuted near-dups, which an alignment-sensitive hash correctly
    * rejects; sf0.1's 8 exact-dup pairs land in the hamming-0 row). */
  def phashNeardupRollup(spark: SparkSession, dir: String): DataFrame = {
    val pairs = phashPairs(spark, dir)
    val frame = spark.range(0, PhashMaxHamming + 1L)
      .select(col("id").cast("int").as("hamming"))
    frame.join(
        pairs.groupBy(col("hamming"))
          .agg(count(lit(1)).as("n"), sum(col("a_id") + col("b_id")).as("s")),
        Seq("hamming"), "left")
      .select(col("hamming"),
        coalesce(col("n"), lit(0L)).as("n_pairs"),
        coalesce(col("s"), lit(0L)).as("pair_id_sum"))
      .orderBy(col("hamming"))
  }

  /** M5: cross-modal retrieval over the binary asset table — a text
    * query searches the IMAGE corpus (CLIP-style shared space), with
    * the candidate set restricted by DECODED metadata (format=jpeg):
    * the filtered-ANN composition (v11) applied to multimodal serving.
    * The encoder is the deterministic [[graft.functions.StubEmbed]]
    * over the decoded payload (a real deployment swaps in an image
    * tower; the Spark shape — binary column in, metadata filter,
    * embed, broadcast query, cosine top-k — is exactly this plan).
    * Oracle-checked end to end: the decode filter chains m1's digest
    * derivation and the retrieval chains stubSearchSql over the
    * filtered relation, so the hash proves decode + filter + embed +
    * rank as one pipeline. */
  def crossmodalSearch(spark: SparkSession, dir: String,
      query: String = Similarity.DefaultQuery, k: Int = 10): DataFrame = {
    val q = spark.range(1)
      .select(graft.functions.StubEmbed(lit(query)).as("q_embedding"))
    assets(spark, dir)
      .withColumn("format", formatOf(md5(col("payload"))))
      .filter(col("format") === "jpeg")
      .withColumn("text", decode(col("payload"), "UTF-8"))
      .withColumn("embedding", graft.functions.StubEmbed(col("text")))
      .crossJoin(broadcast(q))
      .withColumn("sim", Vectors.cosine(col("embedding"), col("q_embedding")))
      .orderBy(desc("sim"), col("asset_id")).limit(k)
      .select(col("asset_id"), col("meta.source").as("source"), col("format"),
        length(col("payload")).as("n_bytes"), round(col("sim"), 6).as("sim_r"))
      .orderBy(col("asset_id"))
  }

  private[graft] def phashPairsOf(input: DataFrame): DataFrame = {
    import graft.operators.CacheOps.{materializeAndRelease, shared}
    val hashed = shared(input
      .filter(length(col("text")) > 0)
      .repartition(col("doc_id")) // see Dedup.ngramJaccardPairs
      .select(col("doc_id"),
        graft.functions.BlockHash60(col("text"), PhashBits).as("h")))
    val bandArr = array((0 until PhashBands).map(k =>
      struct(lit(k).as("band"),
        (shiftright(col("h"), k * PhashBandBits) % lit(1 << PhashBandBits)).as("bv"))): _*)
    val bands = hashed.select(col("doc_id"), col("h"), explode(bandArr).as("s"))
      .select(col("doc_id"), col("h"), col("s.band").as("band"), col("s.bv").as("bv"))
    val cands = bands.select(col("band"), col("bv"), col("doc_id").as("a_id"), col("h").as("ha"))
      .join(bands.select(col("band"), col("bv"), col("doc_id").as("b_id"), col("h").as("hb")),
        Seq("band", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("ha"), col("hb"))
      .distinct()
    val result = cands
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .filter(col("hamming") <= PhashMaxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
    materializeAndRelease(result, hashed)
  }

  private[graft] val FrameSampleStep = 4

  /** M6: frame sampling over "video" assets — the pre-training pass a
    * video corpus runs to turn opaque payloads into a bounded set of
    * frame records (every K-th frame), each carrying a deterministic
    * per-frame signature for downstream dedup/indexing. The decode is
    * the stub seam (frame count and signatures derive from the payload
    * digest — swapping in ffmpeg changes only those two expressions);
    * the Spark plumbing is real: map-only project → explode, t9's
    * chunking shape, pipelining into any consumer with no shuffle
    * before a downstream aggregate.
    *
    * Scale shape: output rows = Σ ceil(n_frames / step) — corpus-
    * linear with a constant factor the step controls; no exchange at
    * all in this query (the sort is the gate's determinism order). */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val digest = md5(col("payload"))
    assets(spark, dir)
      .withColumn("digest", digest)
      .withColumn("n_frames",
        (conv(substring(col("digest"), 13, 2), 16, 10).cast("int") % 24 + 8)
          .cast("long"))
      .select(col("asset_id"), col("n_frames"), col("digest"),
        explode(expr(s"sequence(0L, n_frames - 1, ${FrameSampleStep}L)"))
          .as("frame_idx"))
      .select(col("asset_id"), col("n_frames"), col("frame_idx"),
        substring(md5(concat(col("digest"), lit(":"),
          col("frame_idx").cast("string"))), 1, 8).as("frame_sig"))
      .orderBy(col("asset_id"), col("frame_idx"))
  }
}
