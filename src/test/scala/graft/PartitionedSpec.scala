package graft

import org.apache.spark.sql.functions._
import graft.operators.Partitioned

/** Time-partitioned layout: correctness of the partitioned round-trip,
  * idempotence of dynamic partition overwrite, and the plan contract —
  * the incremental predicate must prune PARTITIONS (directory listing),
  * not just rows. Note Spark infers the `day=` partition value back as
  * DATE (partitionColumnTypeInference), so reads cast it for string
  * comparisons.
  */
class PartitionedSpec extends SparkSpec {

  private lazy val base: String =
    java.nio.file.Files.createTempDirectory("graft_part").toString + "/events_by_day"

  private def dayStr = date_format(col("day"), "yyyy-MM-dd")

  test("partitioned write round-trips every row and derives day from ts") {
    val ev = Tables.events(spark, sfDir)
    Partitioned.writeEventsByDay(ev, base)
    val back = spark.read.parquet(base)
    assert(back.count() === ev.count())
    val mismatched = back
      .filter(dayStr =!= date_format(col("ts"), "yyyy-MM-dd")).count()
    assert(mismatched === 0, "partition value must equal the row's event day")
  }

  test("incremental read prunes partitions, not just rows") {
    val ev = Tables.events(spark, sfDir)
    Partitioned.writeEventsByDay(ev, base)
    val days = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .distinct().orderBy(col("d")).collect().map(_.getString(0))
    assert(days.length >= 3, "fixture should span several days")
    val since = days(days.length / 2)

    val inc = Partitioned.readEventsSince(spark, base, since)
    // value contract: identical to a row filter over the full table
    val expected = ev.filter(date_format(col("ts"), "yyyy-MM-dd") >= since).count()
    assert(inc.count() === expected)

    // plan contract: the day predicate lands in PartitionFilters
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("(day"),
      s"day predicate not a partition filter:\n$plan")

    // physical contract: poison a PRUNED partition with a corrupt file.
    // A scan that still touched that directory would fail reading the
    // footer; the pruned incremental read must keep working. Schema is
    // passed explicitly because INFERENCE also reads a footer — and may
    // sample the poisoned directory regardless of any later pruning.
    val schema = spark.read.parquet(base).schema
    val dayType = schema("day").dataType
    val poison = java.nio.file.Paths.get(base, s"day=${days.head}", "junk.parquet")
    java.nio.file.Files.write(poison, "not a parquet file".getBytes)
    try {
      val pruned = spark.read.schema(schema).parquet(base)
        .filter(col("day") >= lit(since).cast(dayType))
      assert(pruned.count() === expected,
        "pruned read must never open files in skipped partitions")
      // and the poison is potent: an unpruned scan of that partition fails
      intercept[Exception] {
        spark.read.schema(schema).parquet(base)
          .filter(col("day") === lit(days.head).cast(dayType)).count()
      }
    } finally java.nio.file.Files.delete(poison)
  }

  test("dynamic partition overwrite rewrites only the replayed day") {
    val ev = Tables.events(spark, sfDir)
    Partitioned.writeEventsByDay(ev, base)
    val total = spark.read.parquet(base).count()
    val replayDay = spark.read.parquet(base).select(dayStr.as("d")).distinct()
      .orderBy(col("d")).collect().map(_.getString(0)).head
    // re-load ONE day (idempotent replay): table total must not change
    val oneDay = ev.filter(date_format(col("ts"), "yyyy-MM-dd") === replayDay)
    Partitioned.writeEventsByDay(oneDay, base)
    assert(spark.read.parquet(base).count() === total,
      "replaying one day must overwrite only that partition")
  }
}
