package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Incremental, MergeOps}

/** Write-semantics suite: MERGE/insert-ignore invariants (S10/S11, I4
  * idempotence) and the physical write modes (S12 overwrite, S13 append)
  * on temp Parquet tables. */
class MergeSpec extends SparkSpec {

  test("merge covers all keys; actions partition the keyspace") {
    val merged = MergeOps.mergeUpsert(spark, sfDir)
    val actions = merged.groupBy("merge_action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(actions.keySet.subsetOf(Set("updated", "inserted", "unchanged")))
    assert(actions.getOrElse("updated", 0L) > 0)
    assert(actions.getOrElse("inserted", 0L) > 0)
    // no key appears twice
    val n = merged.count()
    assert(merged.select("user_id", "event_type").distinct().count() === n)
  }

  test("insert-ignore emits no key that already existed (I4 idempotence)") {
    val ev = Tables.events(spark, sfDir)
    val existing = ev.filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
      .select("user_id", "event_type").distinct()
    val inserted = MergeOps.insertIgnore(spark, sfDir).select("user_id", "event_type")
    assert(inserted.join(existing, Seq("user_id", "event_type"), "left_semi").count() === 0)
    // re-applying against existing ∪ inserted yields nothing new (replay-safe)
    val after = existing.unionByName(inserted).distinct()
    val replay = ev.filter(col("ts") >= lit("2024-01-25 00:00:00").cast("timestamp"))
      .select("user_id", "event_type").distinct()
      .join(after, Seq("user_id", "event_type"), "left_anti")
    assert(replay.count() === 0)
  }

  test("watermark filter keeps only the trailing window") {
    val ev = Tables.events(spark, sfDir)
    val frontier = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val total = Incremental.watermarkFilter(spark, sfDir)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val expected = ev.filter(
      col("ts") >= lit(frontier).cast("timestamp") - expr("INTERVAL 7 DAYS")).count()
    assert(total === expected)
  }

  test("S12 overwrite replaces, S13 append accumulates") {
    val dir = Files.createTempDirectory("graft_write").toString
    val df = Tables.nation(spark, sfDir)
    df.write.mode("overwrite").parquet(s"$dir/t")
    df.write.mode("overwrite").parquet(s"$dir/t")
    assert(spark.read.parquet(s"$dir/t").count() === df.count())
    df.write.mode("append").parquet(s"$dir/t")
    assert(spark.read.parquet(s"$dir/t").count() === 2 * df.count())
  }

  test("join-based MERGE written to parquet is idempotent end-to-end") {
    val dir = Files.createTempDirectory("graft_merge").toString
    val merged = MergeOps.mergeUpsert(spark, sfDir).drop("merge_action")
    merged.write.mode("overwrite").parquet(s"$dir/state")
    val v1 = spark.read.parquet(s"$dir/state")
    // replaying the same incoming batch against the merged state changes nothing
    val incoming = merged.select(
      col("user_id").as("i_user"), col("event_type").as("i_type"),
      col("n_events").as("i_n"), col("total_value").as("i_total"))
    val replayed = v1.join(incoming,
        col("user_id") === col("i_user") && col("event_type") === col("i_type"), "full_outer")
      .select(
        coalesce(col("i_user"), col("user_id")).as("user_id"),
        coalesce(col("i_type"), col("event_type")).as("event_type"),
        coalesce(col("i_n"), col("n_events")).as("n_events"),
        coalesce(col("i_total"), col("total_value")).as("total_value"))
    assert(replayed.exceptAll(v1).count() === 0)
    assert(v1.exceptAll(replayed).count() === 0)
  }
}
