package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join: match each point row to the interval(s)
  * containing it — the lookup shape behind rate cards, tier tables,
  * IP-geo ranges, and histogram bucketing. The reference expresses it
  * as SQL BETWEEN joins against config tables (the dashboard's
  * donation-size tiers, app/dashboard.py-style bucketing); here it is
  * an operator with two physical forms chosen by interval-table size.
  *
  * Two forms, same semantics, same oracle:
  *
  *  - j12 `bandRollup`: broadcast non-equi join. Catalyst plans a
  *    BroadcastNestedLoopJoin — each point row tests |intervals|
  *    predicates in codegen. Right when the interval table is small
  *    (tens..thousands): zero shuffle, scan-bound, the plan you want
  *    for a rate card at 100 TB of points.
  *
  *  - j12b `bandRollupBucketed`: bucket-expansion EQUI join. Every
  *    interval explodes to the fixed-width buckets it covers; points
  *    map to ONE bucket (`floor(p/w)`); the join becomes an equi join
  *    on bucket with a residual `lo <= p < hi` filter. This is the
  *    scale path when the interval side is itself big (millions of
  *    ranges — IP-geo): an NLJ is O(points × intervals), while the
  *    bucketed form shuffles both sides by bucket and meets only
  *    co-bucketed candidates — O(points + intervals × spread + hits).
  *    Bucket width trades expansion (wide intervals explode to hi/w
  *    rows) against candidate precision (points meet intervals sharing
  *    a bucket); set it near the median interval width. Skewed buckets
  *    (one bucket covering a hot range) split under AQE like any
  *    skewed equi key.
  *
  * The fixture intervals are deliberately non-uniform and NOT aligned
  * to the bucket width, so the residual filter and partial-bucket
  * expansion are exercised, not vacuous.
  */
object RangeJoin {

  /** Non-uniform, non-aligned price bands over orders.o_totalprice
    * (fixture range ≈ [1k, 500k]) — a rate-card-like reference table.
    * (label, lo inclusive, hi exclusive); contiguous and
    * non-overlapping, so each order lands in exactly one band. */
  val PriceBands: Seq[(String, Double, Double)] = Seq(
    ("p0_under_1k", 0.0, 1000.0),
    ("p1_1k_10k", 1000.0, 10000.0),
    ("p2_10k_60k", 10000.0, 60000.0),
    ("p3_60k_150k", 60000.0, 150000.0),
    ("p4_150k_300k", 150000.0, 300000.0),
    ("p5_300k_plus", 300000.0, 600000.0))

  /** Bucket width for the equi-join form — intentionally not a divisor
    * of the band bounds above. */
  val BucketWidth = 25000.0

  private def bandsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    PriceBands.toDF("band", "lo", "hi")
  }

  private def rollup(joined: DataFrame): DataFrame =
    joined.groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"),
        // decimal sum internally, double emitted (oracle-render parity)
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"))
      .orderBy(col("band"))

  /** j12: broadcast non-equi range join, rolled up per band. */
  def bandRollup(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val joined = orders.join(broadcast(bandsDf(spark)),
      col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
    rollup(joined)
  }

  /** j12b: bucket-expansion equi range join — identical result through
    * the plan shape that survives a LARGE interval table. The interval
    * side explodes to its covering buckets (sequence over floor(lo/w)
    * .. floor((hi-ulp)/w) — hi is exclusive, so an aligned hi starts no
    * extra bucket); the point side computes one bucket; they equi-join
    * on it and the residual BETWEEN trims partial-bucket misses. */
  def bandRollupBucketed(spark: SparkSession, dir: String,
      width: Double = BucketWidth,
      broadcastIntervals: Boolean = true): DataFrame = {
    val expanded = bandsDf(spark)
      .withColumn("bucket", explode(sequence(
        floor(col("lo") / width).cast("long"),
        // last bucket containing a value STRICTLY below hi:
        // ceil(hi/w)-1 (exact — an aligned hi starts no extra bucket)
        (ceil(col("hi") / width) - 1).cast("long"))))
    val orders = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("bucket", floor(col("o_totalprice") / width).cast("long"))
    // broadcastIntervals=false is the genuinely-large interval table
    // path: both sides hash-shuffle on bucket (the fixture table is
    // tiny, but the spec pins that the plan really is a shuffled equi
    // join, since that claim is the whole point of the bucketed form)
    val rhs = if (broadcastIntervals) broadcast(expanded)
      else expanded.hint("shuffle_merge")
    val joined = orders.join(rhs, Seq("bucket"))
      .filter(col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
    rollup(joined)
  }
}
