package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

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
}
