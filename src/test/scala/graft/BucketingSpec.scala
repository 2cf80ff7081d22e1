package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

class BucketingSpec extends SparkSpec {

  test("same-bucketed join plans without any Exchange (co-located)") {
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    Bucketing.writeBucketed(o, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(l.withColumnRenamed("l_orderkey", "lb_orderkey"),
      "lineitem_b", "lb_orderkey", 4)

    // force the sort-merge path (tiny sf0.001 tables would broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = Bucketing.colocatedJoin(spark, "lineitem_b", "orders_b",
      "lb_orderkey", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    // correctness: same row count as the shuffle join
    val shuffleCount = l.join(o, l("l_orderkey") === o("o_orderkey")).count()
    assert(joined.count() === shuffleCount)
  }
}
