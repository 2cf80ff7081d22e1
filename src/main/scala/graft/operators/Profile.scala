package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** The REST/dashboard entry point re-shaped for Spark (SURVEY §3.2).
  *
  * The reference's per-politician metrics endpoint issues 6-8
  * independent SQL round-trips (existence check, sum, by-type, top-10,
  * counts — metrics.py:17-129) plus N+1 lazy joins. Here the whole
  * profile is ONE plan: each metric is a grouped aggregate over a
  * shared scan, joined back on the entity key — Catalyst reuses the
  * scans, and the round-trips become shared shuffle stages.
  */
object Profile {

  /** E1: full entity profile for a scope — per customer: financial
    * (total/count/avg over orders), activity (line items through
    * orders), dimension attributes (nation/region). */
  def customerProfile(spark: SparkSession, dir: String, segment: String = "BUILDING"): DataFrame = {
    val c = customer(spark, dir).filter(col("c_mktsegment") === segment)
    val o = orders(spark, dir)
    val l = lineitem(spark, dir)
    val n = nation(spark, dir)

    val financial = o.groupBy(col("o_custkey")).agg(
      sum(col("o_totalprice").cast("decimal(18,2)")).as("total_spend"),
      count(lit(1)).as("n_orders"))

    val oKeys = o.select(col("o_orderkey"), col("o_custkey"))
    val activity = l.join(oKeys, l("l_orderkey") === oKeys("o_orderkey"))
      .groupBy(oKeys("o_custkey").as("a_custkey"))
      .agg(count(lit(1)).as("n_items"))

    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(financial, c("c_custkey") === financial("o_custkey"), "left")
      .join(activity, c("c_custkey") === activity("a_custkey"), "left")
      .select(
        c("c_custkey"), c("c_name"), n("n_name"),
        // decimal internally; double in the emitted column (driver-render
        // parity — see Relational.moneyOut)
        coalesce(col("total_spend"), lit(0).cast("decimal(18,2)")).cast("double").as("total_spend"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_items"), lit(0L)).as("n_items"))
      .orderBy(col("c_custkey"))
  }

  /** E2/E2b: ANALYZE-style column statistics for ANY frame — per
    * column: rows, nulls, distinct count (exact or approx), min/max —
    * the sweep every pipeline runs before and after an ingest to catch
    * schema drift, null storms, and key collisions. The reference's
    * self-verification prints per-run row counters (update_donations
    * .py's summaries); this is the per-COLUMN generalization a 100 TB
    * corpus needs, schema-driven so any table profiles without code
    * (round 6 hardcoded `documents` and its four columns).
    *
    * ONE scan: all per-column aggregates ride a single pass, then the
    * 1-row wide aggregate unpivots to a row per column via an inline
    * array — driver traffic is #columns rows, never data. min/max
    * aggregate in the NATIVE type and cast to string after
    * (lexicographic min of a numeric string would be wrong). Exact
    * distincts plan as one Expand — rows × #columns before the partial
    * agg, the standard trade; `approx = true` swaps every distinct for
    * `approx_count_distinct` (HLL partials, no Expand) — the wide-
    * table tier, where an exact sweep's Expand multiplies a 100 TB
    * scan by column count. Non-atomic columns (array/map/struct) are
    * skipped: min/max is undefined for them. */
  def profileOf(df: DataFrame, approx: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val cols = df.schema.fields.filter(f => f.dataType match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _ => true
    }).map(_.name).toSeq
    require(cols.nonEmpty, "profileOf: no atomic columns to profile")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_n"),
        (if (approx) approx_count_distinct(col(c)) else countDistinct(col(c)))
          .as(s"${c}_nd"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
    }
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("column_name"),
          col("n_rows"),
          (col("n_rows") - col(s"${c}_n")).as("n_null"),
          col(s"${c}_nd").as("n_distinct"),
          coalesce(col(s"${c}_min"), lit("")).as("min_val"),
          coalesce(col(s"${c}_max"), lit("")).as("max_val"))
      }: _*)).as("c"))
      .select(col("c.*"))
      .orderBy(col("column_name"))
  }

  /** E2: the profiler over the corpus gate's four reference columns
    * (n_chars is itself a derived stat, not profiled). */
  def corpusProfile(spark: SparkSession, dir: String): DataFrame =
    profileOf(graft.Tables.documents(spark, dir)
      .select("doc_id", "lang", "source", "text"))

  /** E2b: the generic profiler over `orders` — long keys, strings, a
    * TIMESTAMP, and money, exercising the type-driven min/max path.
    * Money is pre-cast to DECIMAL(18,2): decimal min/max/distinct
    * render engine-portably where raw double formatting does not (the
    * moneyOut discipline; exact for cent-denominated prices). */
  def ordersProfile(spark: SparkSession, dir: String): DataFrame =
    profileOf(orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority")))

  /** E4: the §3.1 dashboard fan-out as ONE multi-metric query. The
    * reference dashboard issues 10+ independent BigQuery round-trips
    * for one filtered scope — financial (app.py:120-196), legislative
    * (app.py:199-262), voting (app.py:265-311), committee membership
    * (app.py:314-331) — every one re-stating the same politician
    * filter join. Here the scope is resolved ONCE into a cached frame
    * and all four metric families compute from it in a single plan:
    * the round-trips become shared subtrees of one union, and the
    * scope scan runs once (PlanSpec asserts it).
    *
    * Family mapping onto the fixture schema: financial = order totals
    * by priority (donations by donor_type); activity = line items
    * through the scope's orders by return flag (bills via
    * sponsorship); voting = the scope users' event breakdown by type
    * (vote positions); membership = scope headcount + balance by
    * nation (committee member counts).
    *
    * Output: tall (family, item, n, amount) — the shape a dashboard
    * renderer consumes and the driver can hash (strings + BIGINT +
    * moneyOut DOUBLE), totally ordered.
    *
    * Scale shape: the scope frame broadcasts into each fact-side join
    * (a dashboard scope is a filter result, small by construction);
    * each family is one partial-agg exchange over its OWN fact table;
    * the union concatenates four ≤|groups| frames — no shuffle of any
    * fact table beyond its grouped aggregate, no repeated scope
    * resolution. */
  def dashboard(spark: SparkSession, dir: String, segment: String = "BUILDING"): DataFrame = {
    val (result, cached) = dashboardFrames(spark, dir, segment)
    CacheOps.materializeAndRelease(result, cached: _*)
  }

  /** The un-materialized (result, cached frames) pair — PlanSpec
    * asserts the single-scope-scan shape before checkpointing erases
    * it; callers must release every cached frame. */
  private[graft] def dashboardFrames(spark: SparkSession, dir: String,
      segment: String): (DataFrame, Seq[DataFrame]) = {
    val scope = CacheOps.shared(customer(spark, dir)
      .filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"), col("c_nationkey"),
        col("c_acctbal").cast("decimal(18,2)").as("c_acctbal")))
    val keys = scope.select(col("c_custkey"))

    // ONE scoped-orders frame for both order-keyed families (round 16,
    // guide §2.4 shared work): the financial and activity legs each
    // scanned orders and re-ran the same broadcast semi against the
    // scope keys; the shared persisted frame scans and joins once. Both
    // legs' groupBys are unchanged, so the emitted rows are identical.
    val scopedOrders = CacheOps.shared(orders(spark, dir)
      .join(broadcast(keys), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice")))
    val financial = scopedOrders
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("amt"))
      .select(lit("financial").as("family"), col("o_orderpriority").as("item"),
        col("n"), col("amt").cast("double").as("amount"))

    val o = scopedOrders.select(col("o_orderkey"))
    val activity = lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("amt"))
      .select(lit("activity").as("family"), col("l_returnflag").as("item"),
        col("n"), col("amt").cast("double").as("amount"))

    val voting = events(spark, dir)
      .join(broadcast(keys), col("user_id") === col("c_custkey"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("amt"))
      .select(lit("voting").as("family"), col("event_type").as("item"),
        col("n"), col("amt").cast("double").as("amount"))

    val membership = scope
      .join(broadcast(nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("c_acctbal")).as("amt"))
      .select(lit("membership").as("family"), col("n_name").as("item"),
        col("n"), col("amt").cast("double").as("amount"))

    val result = financial.unionByName(activity)
      .unionByName(voting).unionByName(membership)
      .orderBy(col("family"), col("item"))
    (result, Seq(scope, scopedOrders))
  }

  /** One referential audit row: child rows, orphans (child keys with
    * no parent), and the orphan key-sum pinning exact membership. */
  private def fkAudit(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.select(col(childKey).as("k"))
      .join(parent.select(col(parentKey).as("k")), Seq("k"), "left_anti")
    val totals = child.agg(count(lit(1)).as("n_child_rows"))
    val o = orphans.agg(count(lit(1)).as("n_orphans"),
      coalesce(sum(col("k")), lit(0L)).as("orphan_key_sum"))
    totals.crossJoin(o).select(lit(name).as("relation"),
      col("n_child_rows"), col("n_orphans"), col("orphan_key_sum"))
  }

  /** E3: referential-integrity audit — the trust-but-verify sweep a
    * pipeline runs over its foreign keys before training or serving
    * (the reference enforces these as Postgres FK constraints,
    * app/models.py; at corpus scale constraints don't exist, audits
    * do). Three native relations (clean by construction in the
    * fixture — the audit PROVES it, all-zero rows are the point) plus
    * the adversarial one: the CURRENT corpus' doc_ids against the s19
    * next release, where every release-deleted document becomes a
    * dangling reference — the stale-manifest smell after a corpus
    * swap.
    *
    * Scale shape: each relation is one anti join — parent sides that
    * are small broadcast (Catalyst decides from stats); the big-big
    * pair (lineitem → orders) hash-shuffles both sides on the key,
    * which is the honest cost of auditing a fact-to-fact edge. The
    * four audits are independent subtrees of one plan (one job),
    * each reduced to a 1-row aggregate before the union. */
  def integrityAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    val v2 = SnapshotDiff.nextRelease(Tables.documents(spark, dir))
    Seq(
      fkAudit("events.user_id->customer", Tables.events(spark, dir), "user_id",
        Tables.customer(spark, dir), "c_custkey"),
      fkAudit("lineitem.l_orderkey->orders", Tables.lineitem(spark, dir), "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey"),
      fkAudit("orders.o_custkey->customer", Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey"),
      fkAudit("v1.doc_id->next_release", Tables.documents(spark, dir), "doc_id",
        v2, "doc_id"))
      .reduce(_ unionByName _)
      .orderBy(col("relation"))
  }

  /** e5: feed-volume anomaly screen — the monitoring query every
    * ingest pipeline runs before trusting a day's data: per
    * (event_type, day) arrival counts, with days whose volume deviates
    * more than 2σ from the type's own distribution flagged. A source
    * that silently halves (upstream outage) or doubles (replay bug)
    * trips the flag before the bad day pollutes downstream tables.
    *
    * The 2σ rule is evaluated WITHOUT floats: |x−μ| > 2σ with
    * μ = Σx/n, σ² = (n·Σx² − (Σx)²)/n² is equivalent to
    * (n·x − Σx)² > 4·(n·Σx² − (Σx)²) — all integer products, carried
    * in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so the comparison is
    * exact on both engines at any daily volume, and the whole monitor
    * hash-checks.
    *
    * Scale shape: one partial-agged shuffle collapses the feed to
    * |types × days| rows; the stats window runs over that tiny frame,
    * never the raw events. */
  def volumeAnomaly(spark: SparkSession, dir: String): DataFrame =
    volumeAnomalyOf(graft.Tables.events(spark, dir))

  private[graft] def volumeAnomalyOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val daily = events
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type"))
    daily
      .withColumn("nd", count(lit(1)).over(w).cast(d38))
      .withColumn("x", col("n_events").cast(d38))
      .withColumn("sx", sum(col("n_events")).over(w).cast(d38))
      .withColumn("sxx",
        sum((col("n_events") * col("n_events")).cast(d38)).over(w))
      .select(col("event_type"), col("day"), col("n_events"),
        ((col("nd") * col("x") - col("sx")) * (col("nd") * col("x") - col("sx")) >
          (col("nd") * col("sxx") - col("sx") * col("sx")) * 4).as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }
}
