package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.StringSim

/** Scalar-function surface (SURVEY §2.7 F1-F18) exercised as queries.
  *
  * All pure column expressions — codegen'd, no UDFs — so these fuse into
  * whichever scan/join pipeline uses them at scale.
  */
object Scalars {

  /** F1+F5: name parse "Last, First" → parts, then CONCAT full name
    * (ingest_politicians.py:124-136; app.py:69). A two-part name is
    * synthesized from name+segment, split on the first ', '. */
  def nameParse(spark: SparkSession, dir: String): DataFrame = {
    customer(spark, dir)
      .withColumn("full", concat_ws(", ", col("c_name"), col("c_mktsegment")))
      .select(
        col("c_custkey"),
        element_at(split(col("full"), ", ", 2), 1).as("last_name"),
        element_at(split(col("full"), ", ", 2), 2).as("first_name"),
        concat_ws(" ", element_at(split(col("full"), ", ", 2), 2),
          element_at(split(col("full"), ", ", 2), 1)).as("display_name"))
      .orderBy(col("c_custkey"))
  }

  /** F2: normalize_name — upper, strip '.'/',', trim
    * (ingest_fec_links.py:34-43). Noise is injected first so the
    * normalization provably does work. */
  def normalizeNames(spark: SparkSession, dir: String): DataFrame = {
    supplier(spark, dir)
      .withColumn("noisy", concat(lit("  "), lower(col("s_name")), lit(" .,")))
      .select(col("s_suppkey"), col("noisy"),
        StringSim.normalizeName(col("noisy")).as("normalized"))
      .orderBy(col("s_suppkey"))
  }

  /** F11+F13+P8: MMddyyyy date coercion with bad→null→drop semantics
    * (ingest_bulk_donations.py:141-147). Every 10th key gets a
    * deterministically corrupted date; try_to_date nulls it; na.drop
    * removes it — the reference's errors='coerce' + dropna pipeline. */
  def dateCoerce(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir)
      .withColumn("date_str",
        when(col("o_orderkey") % 10 === 0,
          concat(lit("99"), substring(date_format(col("o_orderdate"), "MMddyyyy"), 3, 6)))
          .otherwise(date_format(col("o_orderdate"), "MMddyyyy")))
      .withColumn("parsed", try_to_date(col("date_str"), "MMddyyyy"))
      .na.drop(Seq("parsed"))
      .groupBy(year(col("parsed")).as("yr"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("yr"))
  }

  /** F10+F15: string truncation for previews (hydrate_vectors.py:80-106
    * title[:1000]) and ISO date serialization (main.py:248). */
  def truncateAndFormat(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .select(
        col("doc_id"),
        substring(col("text"), 1, 100).as("preview"),
        length(col("text")).as("text_len"))
      .orderBy(col("doc_id"))
  }

  /** F14+F15: day bucketing serialized as ISO strings (app.py:176 +
    * isoformat). */
  def dailyCounts(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("total_value"))
      .orderBy(col("day"))
  }
}
