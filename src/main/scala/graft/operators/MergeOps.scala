package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** ETL write semantics on immutable storage (SURVEY §2.1 S10-S13).
  *
  * The reference's sinks are Postgres upserts; on Parquet the same
  * semantics are join-based and idempotent (I4): re-running a merge with
  * the same incoming batch yields the same table.
  *
  * Fixture realization: a per-user running aggregate "table" maintained
  * from the events stream, split at a fixed cutoff into existing
  * (before) vs incoming (after).
  *
  * Scale notes: MERGE shuffles both sides on the key once; when the
  * incoming batch is small relative to the base (the usual incremental
  * case), broadcast the incoming side and rewrite only affected
  * partitions (partition the base table by a stable key hash). The
  * insert-ignore anti join broadcasts the existing-key set when it fits.
  */
object MergeOps {

  // Disjoint snapshot/incoming windows: keys present in both → updated,
  // only after → inserted, only before → unchanged — all three MERGE
  // branches are exercised at every SF.
  val SnapshotEnd = "2024-01-03 00:00:00"
  val IncomingStart = "2024-01-25 00:00:00"

  private def perKey(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"), col("event_type")).agg(
      count(lit(1)).as("n_events"),
      sum(col("value").cast("decimal(18,2)")).as("total_value"))

  /** S10: upsert MERGE — update wins, untouched rows carry over
    * (pg_insert .. on_conflict_do_update, ingest_politicians.py:214-232).
    * Output adds merge_action for observability ('updated'/'inserted'/
    * 'unchanged'), mirroring the reference's per-run counters. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val existing = perKey(ev.filter(col("ts") < lit(SnapshotEnd).cast("timestamp")))
      .select(col("user_id").as("e_user"), col("event_type").as("e_type"),
        col("n_events").as("e_n"), col("total_value").as("e_total"))
    val incoming = perKey(ev.filter(col("ts") >= lit(IncomingStart).cast("timestamp")))
      .select(col("user_id").as("i_user"), col("event_type").as("i_type"),
        col("n_events").as("i_n"), col("total_value").as("i_total"))

    existing.join(incoming,
        col("e_user") === col("i_user") && col("e_type") === col("i_type"), "full_outer")
      .select(
        coalesce(col("i_user"), col("e_user")).as("user_id"),
        coalesce(col("i_type"), col("e_type")).as("event_type"),
        coalesce(col("i_n"), col("e_n")).as("n_events"),
        // decimal internally; double emitted (driver-render parity)
        coalesce(col("i_total"), col("e_total")).cast("double").as("total_value"),
        when(col("e_user").isNotNull && col("i_user").isNotNull, lit("updated"))
          .when(col("e_user").isNull, lit("inserted"))
          .otherwise(lit("unchanged")).as("merge_action"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** S14: column UPDATE sink — `UPDATE t SET col=… WHERE key=…`
    * (ingest_bill_summaries.py:153-171 fills missing summaries). The
    * narrow-merge form: left join incoming, coalesce ONLY the updated
    * column, every other column carried through unchanged. Updated here:
    * each user/type's total re-priced from the incoming window; rows
    * with no incoming match keep their old total and update_status
    * marks which path each row took. */
  def columnUpdate(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val base = perKey(ev.filter(col("ts") < lit(SnapshotEnd).cast("timestamp")))
    val incoming = perKey(ev.filter(col("ts") >= lit(IncomingStart).cast("timestamp")))
      .select(col("user_id"), col("event_type"), col("total_value").as("new_total"))
    base.join(incoming, Seq("user_id", "event_type"), "left")
      .select(
        col("user_id"), col("event_type"),
        col("n_events"), // untouched column carries over
        coalesce(col("new_total"), col("total_value")).cast("double").as("total_value"),
        when(col("new_total").isNotNull, lit("updated")).otherwise(lit("kept"))
          .as("update_status"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** S11: insert-ignore — first-writer-wins; only keys absent from the
    * existing table land (on_conflict_do_nothing,
    * ingest_bulk_donations.py:112-117). Anti join against existing keys. */
  def insertIgnore(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    // Natural key is (user_id, event_type); the snapshot/incoming windows
    // are disjoint so every SF yields both ignored and inserted keys.
    val existingKeys = ev.filter(col("ts") < lit(SnapshotEnd).cast("timestamp"))
      .select(col("user_id"), col("event_type")).distinct()
    ev.filter(col("ts") >= lit(IncomingStart).cast("timestamp"))
      .join(existingKeys, Seq("user_id", "event_type"), "left_anti")
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).as("first_seen"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("event_type"))
  }
}
