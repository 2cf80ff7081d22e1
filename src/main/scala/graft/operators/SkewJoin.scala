package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY §4 scale notes).
  *
  * When one join key carries a disproportionate share of rows (a hot
  * politician, a viral document), the task holding that key becomes the
  * straggler. AQE's skew-join split handles sort-merge cases
  * post-shuffle; salting is the plan-level fix that also covers
  * aggregations: the fact side spreads each key across `salts`
  * sub-keys, the dimension side replicates each row `salts` times, and
  * the join key becomes (key, salt).
  *
  * The transform is semantics-preserving for equi-joins: every fact row
  * still meets exactly one copy of its dimension row.
  */
object SkewJoin {

  /** Salted equi-join: `facts ⋈ dim` on `key`, fact rows scattered
    * across `salts` partitions per key. `dim` must be the smaller side
    * (it is replicated ×salts). */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = facts
      // deterministic spread: hash the full row content, not rand()
      .withColumn("__salt", pmod(hash(facts.columns.map(col): _*), lit(salts)))
    val saltDf = dim.sparkSession.range(salts)
      .select(col("id").cast("int").as("__salt"))
    val replicated = dim.crossJoin(saltDf)
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Driver-gated form (j6b): the orders⋈customer revenue rollup run
    * THROUGH the salted join. Salting is semantics-preserving, so the
    * oracle is the plain SQL join — a hash match proves the scatter/
    * replicate transform loses and duplicates nothing, which is exactly
    * the property that matters before pointing it at a skewed 100 TB
    * key distribution. */
  def saltedSegmentRevenue(spark: org.apache.spark.sql.SparkSession, dir: String,
      salts: Int = 8): DataFrame = {
    val facts = graft.Tables.orders(spark, dir)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val dim = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    saltedJoin(facts, dim, "custkey", salts)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_amount"))
      .orderBy(col("c_mktsegment"))
  }

  /** Salted aggregation: two-phase groupBy where phase 1 aggregates
    * (key, salt) partials and phase 2 combines per key — the manual
    * form of partial aggregation for aggregates Spark cannot partially
    * evaluate (e.g. exact distinct via sets). For built-in sums/counts
    * Spark already does this; the utility exists for custom buffers. */
  def saltedSum(facts: DataFrame, key: String, valueCol: String, salts: Int): DataFrame = {
    // salt must spread INDEPENDENTLY of the aggregated value: a hot key
    // whose values are constant would otherwise land on one salt and
    // keep the straggler. Round-robin over a per-row id is fine for
    // associative aggregates (the phase-2 combine is order-free).
    facts
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
