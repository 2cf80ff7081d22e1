package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Incremental/watermark processing (SURVEY §2.8).
  *
  * The reference is micro-batch incremental: an `update_log` table
  * records the last successful run per table (update_donations.py:37-65)
  * and each run processes only records newer than the watermark
  * (update_donations.py:184-186 skips old transactions).
  *
  * Scale notes: the watermark predicate lands on the Parquet scan as a
  * pushed min/max row-group filter — an incremental run over a 100 TB
  * time-partitioned table reads only the new partitions. The watermark
  * itself is a single-row aggregate (partial agg → 1 row per partition).
  */
object Incremental {

  /** I1: the update_log row a run would append — per-table watermark
    * state (table_name, last_update, records_updated). */
  def updateLogEntry(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir).agg(
      max(col("ts")).as("last_update"),
      count(lit(1)).as("records_updated"))
      .select(lit("events").as("table_name"), col("last_update"), col("records_updated"))
  }

  /** I2: watermark filter — process only the trailing 7 days relative to
    * the frontier (reference default now-7d, update_donations.py:57-65).
    * The frontier is computed in-plan (scalar agg broadcast into the
    * filter), not collected to the driver. */
  def watermarkFilter(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val frontier = ev.agg(max(col("ts")).as("frontier"))
    ev.crossJoin(broadcast(frontier))
      .filter(col("ts") >= col("frontier") - expr("INTERVAL 7 DAYS"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("ts")).as("min_ts"))
      .orderBy(col("event_type"))
  }
}
