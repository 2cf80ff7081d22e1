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
        element_at(
          typedLit(Seq("jpeg", "png", "webp", "tiff")),
          (conv(substring(col("digest"), 9, 2), 16, 10).cast("int") % 4) + 1).as("format"))
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
}
