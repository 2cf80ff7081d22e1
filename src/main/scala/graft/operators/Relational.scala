package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Relational core: filters, joins, aggregations, windows, sorts, dedup.
  *
  * Each method realizes one operator family from SURVEY.md §2 over the
  * star-schema fixtures (FIXTURES.md §B role mapping). Scale notes are
  * per-operator; global conventions:
  *
  *  - money aggregates go through DecimalType(18,2) so sums are exact and
  *    order-independent (reference uses NUMERIC(12,2), models.py:56) — a
  *    double sum would be shuffle-order dependent and break oracle parity;
  *  - every emitted frame is totally ordered (tie-break on a key column),
  *    because reference top-k/pagination is tie-unstable (SURVEY §7.4-3);
  *  - dimension sides of joins are marked `broadcast` when they are
  *    bounded (region=5, nation=25 rows at every SF) — at 100 TB the fact
  *    side never shuffles for these joins.
  */
object Relational {

  /** o_totalprice as an exact decimal. */
  private def money(c: Column): Column = c.cast("decimal(18,2)")

  /** Final rendering of a money/ratio column: the aggregation itself runs
    * in exact decimal (order-independent), but the EMITTED column is a
    * double. The driver hashes rendered values after a pandas round-trip
    * where DuckDB decimals become float64 ('53982.7') while Spark parquet
    * decimals stay Decimal ('53982.70') — a representational mismatch.
    * decimal→double is correctly rounded in both engines (verified
    * bit-equal), so the doubles hash identically. */
  private def moneyOut(c: Column): Column = c.cast("double")

  /** W1+J2: top-10 customers by total spend within a region scope.
    * Reference: top-10 donors by SUM(amount), metrics.py:63-67,
    * app.py:155-170; 3-way join app.py:138-152.
    *
    * Scale: region/nation broadcast (no shuffle on orders for the scope
    * join); the groupBy shuffles on c_custkey once; top-10 plans as
    * TakeOrderedAndProject (no global sort).
    */
  def topkCustomersByRegion(spark: SparkSession, dir: String, regionName: String = "EUROPE"): DataFrame = {
    val o = orders(spark, dir)
    val c = customer(spark, dir)
    val n = nation(spark, dir)
    val r = region(spark, dir)
    val scopedCust = c
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(r("r_name") === regionName)
      .select(c("c_custkey"), c("c_name"))
    o.join(scopedCust, o("o_custkey") === scopedCust("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(moneyOut(sum(money(col("o_totalprice")))).as("total_amount"))
      .orderBy(desc("total_amount"), col("c_custkey"))
      .limit(10)
  }

  /** A1: scalar SUM with null default (reference `COALESCE(SUM(amount),0)`,
    * metrics.py:50, app.py:127-135). Single-row output; partial aggregation
    * makes this one shuffle of 32 partial rows regardless of input size. */
  def scalarSumCoalesce(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .agg(moneyOut(coalesce(sum(money(col("o_totalprice"))), lit(0).cast("decimal(18,2)"))).as("total_amount"))
  }

  /** A2: group-by SUM — donations by donor_type (metrics.py:53-56). */
  def sumByGroup(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(moneyOut(sum(money(col("o_totalprice")))).as("total_amount"))
      .orderBy(col("o_orderpriority"))
  }

  /** A3: group-by COUNT — votes by vote_position (metrics.py:88-93). */
  def countByGroup(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** A5: COUNT(DISTINCT) per group (app.py:142, app_old.py:139).
    * Exact distinct expands to a two-phase aggregate; at 100 TB swap for
    * approx_count_distinct when a 2% error is acceptable. */
  def countDistinctPerGroup(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"))
  }

  /** A6: multi-aggregate per group — per-donor COUNT DISTINCT/SUM/AVG
    * (app_old.py:134-155). AVG derived as sum/count in decimal, rounded,
    * so both engines compute the identical value. */
  def multiAggPerSupplier(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(money(col("l_extendedprice"))).as("total_price"),
        count(lit(1)).as("n_lines"))
      .withColumn("avg_price",
        moneyOut((col("total_price") / col("n_lines")).cast("decimal(18,2)")))
      .select(col("l_suppkey"), col("n_orders"), moneyOut(col("total_price")).as("total_price"), col("avg_price"))
      .orderBy(col("l_suppkey"))
  }

  /** A7: monthly timeline — DATE_TRUNC(date, MONTH) × type SUM
    * (app.py:174-188). Calendar tumbling window, batch flavor.
    * Month rendered as a yyyy-MM-dd string: a DATE-typed output column
    * round-trips as datetime.date on the Spark side but datetime64 on the
    * DuckDB side ('1995-01-01' vs '1995-01-01 00:00:00'), so date-typed
    * driver-facing outputs never hash-match. */
  def monthlyTimeline(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir)
      .groupBy(
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month"),
        col("o_orderstatus"))
      .agg(moneyOut(sum(money(col("o_totalprice")))).as("total_amount"))
      .orderBy(col("month"), col("o_orderstatus"))
  }

  /** A8: incremental frontier — MAX over int extracted from an id string
    * (update_bills.py:79-91: highest bill number per congress+type). */
  def frontierMax(spark: SparkSession, dir: String): DataFrame = {
    customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(max(regexp_extract(col("c_name"), "[0-9]+", 0).cast("int")).as("max_id"))
      .orderBy(col("c_mktsegment"))
  }

  /** A9: percentage-of-total per group (metrics.py:59-60, app.py:427-429).
    * Computed with an empty-frame window total — one extra exchange of the
    * already-aggregated (tiny) frame, never of the fact table. */
  def pctOfTotal(spark: SparkSession, dir: String): DataFrame = {
    val perStatus = orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(sum(money(col("o_totalprice"))).as("total_amount"))
    perStatus
      .withColumn("grand_total", sum(col("total_amount")).over(Window.partitionBy()))
      .withColumn("pct",
        moneyOut((col("total_amount") * lit(100) / col("grand_total")).cast("decimal(18,6)")))
      .select(col("o_orderstatus"), moneyOut(col("total_amount")).as("total_amount"), col("pct"))
      .orderBy(col("o_orderstatus"))
  }

  /** J2: 3-way equi join + aggregate — revenue per market segment
    * (donations ⋈ politicians ⋈ donors shape, app.py:138-152).
    * lineitem⋈orders shuffles on orderkey; customer joins in on custkey.
    * At scale: bucket lineitem+orders by orderkey to kill the big shuffle. */
  def threeWayRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitem(spark, dir)
    val o = orders(spark, dir)
    val c = customer(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(moneyOut(sum(money(col("l_extendedprice")))).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  /** J3: join-then-filter on the joined table (metrics.py:74-84 — votes
    * scoped by bill congress). Catalyst pushes the filter below the join:
    * the filtered side shrinks before shuffling. */
  def joinThenFilter(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitem(spark, dir)
    val o = orders(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .filter(o("o_orderstatus") === "F")
      .groupBy(o("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"), moneyOut(sum(money(col("l_extendedprice")))).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** J4: scope semi-join — facts restricted to an id-set from a prior
    * query (metrics.py:157-160). left_semi keeps it one plan, no
    * duplicate-row risk, and the scope side can broadcast. */
  def scopeSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val scope = customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    orders(spark, dir)
      .join(broadcast(scope), col("o_custkey") === scope("c_custkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), moneyOut(sum(money(col("o_totalprice")))).as("total_amount"))
      .orderBy(col("o_orderstatus"))
  }

  /** J5: IN-subquery semi join (app_old.py:227-253) — customers having at
    * least one finished order. */
  def semiInSubquery(spark: SparkSession, dir: String): DataFrame = {
    val finished = orders(spark, dir).filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    customer(spark, dir)
      .join(finished, col("c_custkey") === finished("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** J8: left anti join — parts never ordered (update_cosponsors.py:64-71
    * "bills with no cosponsor rows"). */
  def antiNeverOrdered(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
      .select(col("l_partkey"))
    part(spark, dir)
      .join(l, col("p_partkey") === l("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
      .orderBy(col("p_partkey"))
  }

  /** J9: hierarchy join — child → parent (committees self-FK,
    * models.py:126-131); nation→region plays the role. Both sides tiny →
    * broadcast. */
  def hierarchyJoin(spark: SparkSession, dir: String): DataFrame = {
    val n = nation(spark, dir)
    val r = region(spark, dir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .select(n("n_nationkey"), n("n_name"), r("r_name").as("parent_name"))
      .orderBy(col("n_nationkey"))
  }

  /** J9b: TRUE self-join hierarchy — ONE relation joined to itself on a
    * self-referencing parent key, the committees→parent shape
    * (models.py:126-131; parent navigation metrics.py:553-556) that the
    * two-table nation⋈region proxy above never exercises (self-join
    * alias resolution, same scan on both sides). The hierarchy is
    * derived in-plan over `part`: every p_partkey divisible by 10 is a
    * root (parent NULL, like top-level committees); others point at
    * their decade root. Output is the per-parent child rollup, i.e. the
    * reference's subcommittee count per committee.
    *
    * Scale: a self equi-join on the parent key — both sides partition on
    * the same key, and Spark reuses the one scan (ReusedExchange) for
    * the two branches. */
  def selfHierarchy(spark: SparkSession, dir: String): DataFrame = {
    val h = part(spark, dir).select(
      col("p_partkey").as("id"),
      when(col("p_partkey") % 10 === 0, lit(null).cast("bigint"))
        .otherwise(col("p_partkey") - (col("p_partkey") % 10)).as("parent_id"),
      col("p_name").as("name"))
    val c = h.as("c")
    val p = h.as("p")
    c.join(p, col("c.parent_id") === col("p.id"))
      .groupBy(col("p.id"), col("p.name"))
      .agg(count(lit(1)).as("n_children"), min(col("c.id")).as("first_child"))
      .select(col("id").as("parent_id"), col("name").as("parent_name"),
        col("n_children"), col("first_child"))
      .orderBy(col("parent_id"))
  }

  /** P7: multi-term case-insensitive keyword LIKE filter
    * (app_old.py:130-155). */
  def keywordLike(spark: SparkSession, dir: String): DataFrame = {
    part(spark, dir)
      .filter(lower(col("p_name")).contains("widget") || lower(col("p_name")).contains("bolt"))
      .select(col("p_partkey"), col("p_name"), col("p_type"))
      .orderBy(col("p_partkey"))
  }

  /** P4-P6: dynamic conjunctive predicate builder (metrics.py:38-47,
    * app.py:94-117) — Column predicates reduced with &&, never SQL string
    * splicing (the reference's injection-prone pattern, SURVEY §7.4-6). */
  def dynamicFilter(spark: SparkSession, dir: String,
      segment: Option[String] = Some("MACHINERY"),
      minBal: Option[Double] = Some(1000.0),
      nations: Seq[Int] = Seq(1, 3, 5, 7)): DataFrame = {
    val preds = Seq(
      segment.map(s => col("c_mktsegment") === s),
      minBal.map(b => col("c_acctbal") >= b),
      if (nations.nonEmpty) Some(col("c_nationkey").isin(nations: _*)) else None
    ).flatten
    val cond = preds.reduceOption(_ && _).getOrElse(lit(true))
    customer(spark, dir)
      .filter(cond)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** P8: null guards — COALESCE(x,'Unknown') + drop-null semantics
    * (app.py:128,272; ingest_bulk_donations.py:147). Fixture data is
    * dense, so nulls are manufactured with nullif to exercise the path. */
  def nullGuards(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir)
      .withColumn("status_or_unknown",
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("Unknown")))
      .groupBy(col("status_or_unknown"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("status_or_unknown"))
  }

  /** W2: per-group argmax via ranking window — the fuzzy-link "best match
    * per politician" shape (ingest_fec_links.py:122-137). Deterministic
    * tie-break on the key column. */
  def argmaxPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(desc("c_acctbal"), col("c_custkey"))
    customer(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** W3: recent-N sort (app.py:239-252 "ORDER BY date DESC LIMIT n").
    * Plans as TakeOrderedAndProject — no global sort at scale. */
  def recentN(spark: SparkSession, dir: String, n: Int = 20): DataFrame = {
    events(spark, dir)
      .orderBy(desc("ts"), col("event_id"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .limit(n)
  }

  /** W4+W5: ordered pagination (main.py:84-87). The reference paginates
    * unordered (nondeterministic, SURVEY §7.4-3); we total-order first. */
  def pagination(spark: SparkSession, dir: String, skip: Int = 100, pageSize: Int = 50): DataFrame = {
    customer(spark, dir)
      .orderBy(col("c_custkey"))
      .select(col("c_custkey"), col("c_name"))
      .offset(skip)
      .limit(pageSize)
  }

  /** A12/§3.1: pivot — the reference pivots is_original_cosponsor
    * counts client-side (app.py:230-236, 427-452); in-plan it is
    * groupBy().pivot() with an EXPLICIT value list (never let pivot
    * scan for distinct values at 100 TB — that is an extra job over the
    * full table). Pivot count yields null for absent combinations;
    * coalesce to 0 to match the oracle's FILTER counts. */
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def pivotCounts(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .count()
    EventTypes.foldLeft(pivoted) { (df, t) =>
      df.withColumn(t, coalesce(col(t), lit(0L)))
    }.orderBy(col("user_id"))
  }

  /** A14: exact per-group percentiles — defined as the k-th smallest
    * value with k = ceil(p·n) (the discrete/"disc" percentile), NOT an
    * interpolating percentile: interpolation formulas differ across
    * engines, while "k-th smallest" is engine-portable and well-defined
    * under ties (the VALUE at rank k is unique even when the row order
    * among equal values is not). One window pass (rank + group size
    * share a shuffle on the group key), then a conditional-aggregate
    * pivot — the distribution readout a dashboard quantile panel needs
    * without a second scan. */
  def groupPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(col("l_returnflag"))
    val ranked = lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"))
      .withColumn("rn", row_number().over(byGroup.orderBy(col("l_quantity"))))
      .withColumn("cnt", count(lit(1)).over(byGroup))
    def pick(p: Double) =
      max(when(col("rn") === ceil(col("cnt") * lit(p)), col("l_quantity")))
    ranked.groupBy(col("l_returnflag"))
      .agg(max(col("cnt")).as("n"),
        pick(0.5).cast("double").as("p50"),
        pick(0.9).cast("double").as("p90"),
        pick(0.99).cast("double").as("p99"))
      .orderBy(col("l_returnflag"))
  }

  /** A13: ROLLUP — month × status totals with subtotal and grand-total
    * rows in one pass (the super-aggregate the reference approximates
    * with its "Both congresses" re-query, app.py:110-113). Spark plans
    * rollup as Expand + one hash aggregate — one shuffle regardless of
    * how many grouping levels. Null group keys mark subtotals; ordering
    * puts them last deterministically. */
  def rollupTimeline(spark: SparkSession, dir: String): DataFrame = {
    // subtotal rows carry null group keys; serialize month to a string
    // with an 'ALL' sentinel so the output has no null-typed date
    // column (null-date representation differs across arrow/pandas
    // consumers and would make value-identical frames compare unequal)
    orders(spark, dir)
      .rollup(
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_raw"),
        col("o_orderstatus"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("total_amount"),
        count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("month_raw"), lit("ALL")).as("month"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        moneyOut(col("total_amount")).as("total_amount"), col("n_orders"))
      .orderBy(col("month"), col("o_orderstatus"))
  }

  /** A15: CUBE super-aggregate — every subtotal combination of
    * (status, priority) in one pass, completing the a12 pivot / a13
    * rollup family. Spark plans CUBE as a single Expand + one hash
    * aggregate: each input row fans to 2^k grouping sets BUT the
    * partial aggregate collapses them per task before the one exchange
    * — the same map-side-combine argument as any groupBy, so the
    * shuffle carries |groups|·2^k rows, not |input|·2^k. */
  def cubeTotals(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("total_amount"),
        count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        moneyOut(col("total_amount")).as("total_amount"), col("n_orders"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  /** W7: moving average + period-over-period delta — the trend frame
    * every timeline dashboard derives from the daily rollup. The
    * 7-row trailing mean is emitted in FLOOR'D CENTS (sum of exact
    * cent longs, double-divided by the exact count, floored) — the
    * repo's ppm convention, because a decimal division's half-tie
    * rounding is NOT portable across engines; the delta subtracts two
    * exact decimals. Scale: the window partitions by nothing ONLY
    * because its input is the already-aggregated daily series (|days|
    * rows, not |orders|) — the aggregate shrinks first, then the
    * sequential window runs over the tiny result; windowing the raw
    * fact table unpartitioned would serialize the corpus. */
  def movingAverage(spark: SparkSession, dir: String): DataFrame = {
    val daily = orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("day_total"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val trailing = w.rowsBetween(-6, 0)
    daily
      .withColumn("ma7_cents",
        floor(sum((col("day_total") * 100).cast("long")).over(trailing)
          .cast("double") / count(lit(1)).over(trailing)).cast("long"))
      .withColumn("delta",
        col("day_total") - lag(col("day_total"), 1).over(w))
      .select(col("day"), moneyOut(col("day_total")).as("day_total"),
        col("ma7_cents"),
        moneyOut(coalesce(col("delta"), lit(0).cast("decimal(18,2)"))).as("delta"))
      .orderBy(col("day"))
  }

  /** W5b: keyset pagination — the scale-correct form of W5. OFFSET
    * pagination sorts globally and discards `skip` rows per page; the
    * keyset form (`WHERE key > last_seen ORDER BY key LIMIT n`) pushes
    * a range predicate to the scan and reads only the page. At 100 TB
    * deep OFFSET is unusable; keyset stays O(page). */
  def keysetPagination(spark: SparkSession, dir: String, afterKey: Long = 100L, pageSize: Int = 50): DataFrame = {
    customer(spark, dir)
      .filter(col("c_custkey") > afterKey)
      .orderBy(col("c_custkey"))
      .select(col("c_custkey"), col("c_name"))
      .limit(pageSize)
  }

  /** Relative-tolerance gate column: |approx − exact| ≤ tol·|exact|.
    * Evaluated per engine over ITS OWN sketch, so the emitted boolean
    * is hash-comparable even though sketch internals are not. */
  private def withinPct(approx: Column, exact: Column, tol: Double): Column =
    abs(approx.cast("double") - exact.cast("double")) <= abs(exact.cast("double")) * tol

  /** A5b: approximate distinct + approximate percentiles — the 100 TB
    * form of A5/A14. Exact COUNT(DISTINCT) needs a full dedup shuffle
    * per group; HLL sketches merge in constant space (same for t-digest
    * quantiles vs a full sort).
    *
    * Oracle design (round-8 verdict #4): raw sketch estimates are
    * engine-specific, so the HASHED columns are the exact values plus
    * per-estimate TOLERANCE verdicts — each engine checks its own
    * sketch against its own exact aggregate (≤5% relative error) and
    * emits the boolean. A hash match therefore proves both engines'
    * sketches sit inside the same tolerance of the same exact values —
    * a real accuracy oracle, not a rows-only count. The exact
    * aggregates ride the same grouped pass and exist for the gate;
    * the sketch columns are what a 100 TB caller would keep
    * (ScaleOpsSpec additionally pins the raw estimates within 5%). */
  def approxDistinctPerGroup(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        expr("percentile(l_extendedprice, array(0.5, 0.95))").as("qe"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").as("qa"))
      .select(col("l_returnflag"), col("exact_orders"),
        withinPct(col("approx_orders"), col("exact_orders"), 0.05).as("distinct_ok"),
        withinPct(element_at(col("qa"), 1), element_at(col("qe"), 1), 0.05).as("p50_ok"),
        withinPct(element_at(col("qa"), 2), element_at(col("qe"), 2), 0.05).as("p95_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** U1: union + distinct (ingest_bulk_donations.py:61-63 — two cycle
    * files concatenated then deduped). */
  def unionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val a = o.filter(col("o_orderstatus") === "F")
    val b = o.filter(col("o_orderpriority") === "1-URGENT")
    a.unionByName(b).distinct()
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  /** U2: keep-last dedup needs an explicit order column
    * (ingest_fec_links.py:76-81 drop_duplicates keep='last'): per order,
    * keep the highest line number. */
  def keepLastDedup(spark: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is not unique in the fixtures — the full
    // tie-break chain makes the kept row deterministic on both engines.
    // max(struct(...)) picks the lexicographic-max row in one aggregate
    // with map-side partial combine: only one surviving row per key
    // crosses the exchange. (A struct buffer plans as SortAggregate, not
    // HashAggregate — but the sort is per map task, pre-shuffle; the
    // row_number() window formulation shuffles EVERY row and then sorts,
    // which is the part that doesn't survive a 100× scale-up.)
    lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(struct(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))).as("last"))
      .select(col("l_orderkey"), col("last.l_linenumber"), col("last.l_partkey"))
      .orderBy(col("l_orderkey"))
  }

  /** U3: dedup on a derived composite key (donor_uid = NAME|ZIP|EMPLOYER,
    * ingest_bulk_donations.py:98-102), made deterministic by keeping the
    * minimum surrogate key per uid rather than an arbitrary row. */
  def dedupDerivedKey(spark: SparkSession, dir: String): DataFrame = {
    part(spark, dir)
      .withColumn("uid", concat_ws("|",
        coalesce(col("p_brand"), lit("")),
        coalesce(col("p_type"), lit("")),
        col("p_size").cast("string")))
      .groupBy(col("uid"))
      .agg(min(col("p_partkey")).as("first_partkey"), count(lit(1)).as("n_members"))
      .orderBy(col("uid"))
  }
}
