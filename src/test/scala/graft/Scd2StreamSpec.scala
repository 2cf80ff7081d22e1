package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Scd2
import graft.streaming.Scd2Stream

/** Streaming SCD2 maintenance must converge to EXACTLY the dimension
  * the batch rebuild produces — per-batch apply (seeded open versions,
  * immutable closed history) is an implementation detail the final
  * table may not reveal. Also pins the incremental core in isolation
  * (split-apply ≡ rebuild) and checkpoint-replay idempotence. */
class Scd2StreamSpec extends SparkSpec {

  private def ts(m: Int): Timestamp = new Timestamp(1700000000000L + m * 60000L)

  // update feed: user 1 changes k three times with a no-op straddling
  // the batch boundary (the collapse-across-batches case), user 2
  // appears only in the second half, user 3 only in the first
  private def half1 = Seq(
    (101L, ts(0), 1L, "click", 0.0, """{"k": 5}"""),
    (102L, ts(10), 1L, "click", 0.0, """{"k": 6}"""),
    (301L, ts(4), 3L, "click", 0.0, """{"k": 1}"""),
    (999L, ts(5), 9L, "view", 0.0, """{"k": 0}""") // non-update noise
  )
  private def half2 = Seq(
    (103L, ts(20), 1L, "click", 0.0, """{"k": 6}"""), // no-op vs open version
    (104L, ts(30), 1L, "click", 0.0, """{"k": 7}"""),
    (201L, ts(25), 2L, "click", 0.0, """{"k": 9}""")
  )
  private def toDF(rows: Seq[(Long, Timestamp, Long, String, Double, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def collectDim(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getTimestamp(3), Option(r.getTimestamp(4)))).toSeq

  test("applyUpdates over split batches equals the full rebuild") {
    val empty = toDF(Seq.empty)
    val dim0 = Scd2.applyUpdates(
      Scd2.scd2Of(empty), Scd2.updates(toDF(half1)))
    val dim1 = Scd2.applyUpdates(dim0, Scd2.updates(toDF(half2)))
    assert(collectDim(dim1) === collectDim(Scd2.scd2Of(toDF(half1 ++ half2))))
    // the straddling no-op (event 103) must NOT have opened a version
    assert(!collectDim(dim1).exists(_._4 == ts(20)))
  }

  test("streaming maintenance converges to the batch dimension and replays idempotently") {
    val root = java.nio.file.Files.createTempDirectory("graft_scd2_stream").toString
    val src = s"$root/feed"
    // two files, per-user event-time ordered across them (the feed
    // contract); written one at a time so discovery order is the
    // landing order with maxFilesPerTrigger=1
    toDF(half1).coalesce(1).write.mode("append").parquet(src)
    toDF(half2).coalesce(1).write.mode("append").parquet(src)
    val got = Scd2Stream.scd2MaintenanceStreaming(spark, src, s"$root/state")
    val expected = collectDim(Scd2.scd2Of(toDF(half1 ++ half2)))
    assert(collectDim(got) === expected)
    // replay with the same checkpoint: no new batches, same dimension
    val again = Scd2Stream.scd2MaintenanceStreaming(spark, src, s"$root/state")
    assert(collectDim(again) === expected)
  }

  test("fixture feed: streaming maintenance equals the batch build end to end") {
    val root = java.nio.file.Files.createTempDirectory("graft_scd2_fx").toString
    val src = s"$root/feed"
    // split the fixture's events at the median ts — both halves keep
    // per-user internal order, and half1 < half2 everywhere
    val ev = Tables.events(spark, sfDir)
    val midUs = ev.select(percentile_approx(unix_micros(col("ts")), lit(0.5), lit(10000)))
      .collect()(0).getLong(0)
    ev.filter(unix_micros(col("ts")) <= midUs).coalesce(1).write.mode("append").parquet(src)
    ev.filter(unix_micros(col("ts")) > midUs).coalesce(1).write.mode("append").parquet(src)
    val got = Scd2Stream.scd2MaintenanceStreaming(spark, src, s"$root/state")
    assert(collectDim(got) === collectDim(Scd2.scd2Of(ev)))
  }
}
