package graft

import graft.operators.RangeJoin

/** j12/j12b range join: both physical forms agree with each other (the
  * gate additionally hash-checks both against one DuckDB BETWEEN-join
  * oracle) and plan the shapes their scaladocs claim. */
class RangeJoinSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

  test("broadcast and bucketed forms produce identical band rollups") {
    val nlj = rows(RangeJoin.bandRollup(spark, sfDir))
    val bucketed = rows(RangeJoin.bandRollupBucketed(spark, sfDir))
    assert(nlj.nonEmpty)
    assert(nlj === bucketed)
    // bands are contiguous and cover the fixture price range: every
    // order lands in exactly one band
    val total = Tables.orders(spark, sfDir).count()
    assert(nlj.map(_._2).sum === total)
  }

  test("bucket width does not change the bucketed result") {
    // non-divisor widths exercise partial-bucket expansion + residual
    val a = rows(RangeJoin.bandRollupBucketed(spark, sfDir, width = 7000.0))
    val b = rows(RangeJoin.bandRollupBucketed(spark, sfDir, width = 130000.0))
    assert(a === b)
  }

  test("non-broadcast bucketed form shuffles both sides and still agrees") {
    val shuffled = RangeJoin.bandRollupBucketed(spark, sfDir, broadcastIntervals = false)
    val p = shuffled.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"),
      s"large-interval-table path must plan a shuffled equi join:\n$p")
    assert(rows(shuffled) === rows(RangeJoin.bandRollup(spark, sfDir)))
  }

  test("j12 plans a broadcast non-equi join; j12b an equi hash join") {
    val nljPlan = RangeJoin.bandRollup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(nljPlan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast NLJ for the small-interval form:\n$nljPlan")
    val bucketPlan = RangeJoin.bandRollupBucketed(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(bucketPlan.contains("BroadcastHashJoin"),
      s"expected equi hash join for the bucketed form:\n$bucketPlan")
    assert(!bucketPlan.contains("BroadcastNestedLoopJoin") &&
      !bucketPlan.contains("CartesianProduct"),
      s"bucketed form must not fall back to NLJ:\n$bucketPlan")
  }
}
