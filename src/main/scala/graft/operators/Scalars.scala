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
    * deterministically corrupted date; try_to_date nulls it; the null
    * GROUP is dropped after the rollup — row-identical to the
    * reference's errors='coerce' + dropna (bad dates are the only null
    * source, and they all land in the single yr IS NULL group), but
    * the round-17 sweep caught `na.drop` being pushed below the
    * projection, re-evaluating the whole format+parse chain in the
    * filter — 2× the per-row date work (guide §4.4 class, the d3
    * MinHashSig lesson on a builtin chain). Filtering the aggregated
    * year costs one comparison per GROUP instead. */
  def dateCoerce(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir)
      .withColumn("date_str",
        when(col("o_orderkey") % 10 === 0,
          concat(lit("99"), substring(date_format(col("o_orderdate"), "MMddyyyy"), 3, 6)))
          .otherwise(date_format(col("o_orderdate"), "MMddyyyy")))
      .withColumn("parsed", try_to_date(col("date_str"), "MMddyyyy"))
      .groupBy(year(col("parsed")).as("yr"))
      .agg(count(lit(1)).as("n"))
      // the `n < 0` disjunct is never true (count ≥ 0): it exists to
      // reference the AGGREGATE output, which pins the filter above
      // the Aggregate — a bare `yr IS NOT NULL` is a grouping-key
      // predicate, which PushDownPredicates moves back below the
      // projection and re-duplicates the parse chain per row
      .filter(col("yr").isNotNull || col("n") < 0)
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

  /** F3: literal-map lookup — the reference's 56-entry state-name→code
    * dict (ingest_politicians.py:31-51) as element_at over a map
    * literal; unknown keys null out and are kept visible (the reference
    * skips them). */
  def mapLookup(spark: SparkSession, dir: String): DataFrame = {
    val regionCode = typedLit(Map(
      "AFRICA" -> "AF", "AMERICA" -> "AM", "ASIA" -> "AS",
      "EUROPE" -> "EU", "MIDDLE EAST" -> "ME"))
    val n = nation(spark, dir)
    val r = region(spark, dir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"),
        element_at(regionCode, col("r_name")).as("region_code"))
      .orderBy(col("n_nationkey"))
  }

  /** F16/X4: term-list folding — min start / max end over a collected
    * array per entity (ingest_politicians.py:147-188 folds member terms;
    * here: each user's event days fold to first/last seen). */
  def termFold(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .groupBy(col("user_id"))
      .agg(collect_list(date_format(col("ts"), "yyyy-MM-dd")).as("days"))
      .select(col("user_id"),
        array_min(col("days")).as("first_day"),
        array_max(col("days")).as("last_day"),
        size(col("days")).cast("bigint").as("n_events")) // bigint like the oracle's COUNT
      .orderBy(col("user_id"))
  }

  /** W4: multi-key sort with null-defaulting rank (metrics.py:635 sorts
    * members by (party!='majority', rank??999)). Nulls are manufactured
    * with nullif and defaulted with coalesce — nulls sort last via the
    * 999 sentinel, exactly the reference's ?? 999. */
  def multiKeySortNulls(spark: SparkSession, dir: String): DataFrame = {
    supplier(spark, dir)
      .withColumn("rank_raw", nullif(col("s_suppkey") % 7, lit(0)))
      .withColumn("rank_eff", coalesce(col("rank_raw"), lit(999)))
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("rank_eff"))
      .orderBy(col("rank_eff"), col("s_nationkey"), col("s_suppkey"))
  }

  /** F14+F15: day bucketing serialized as ISO strings (app.py:176 +
    * isoformat). */
  def dailyCounts(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"),
        // decimal sum internally; double emitted (driver-render parity)
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy(col("day"))
  }
}
