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

  /** I3: frontier probing loop — the reference discovers new roll-call /
    * bill ids by probing sequentially past the stored frontier until K
    * consecutive ids are absent (update_votes.py:59-92,
    * update_bills.py:443-509). Engine-side analog: probe a BATCH of
    * candidate keys per round with one range scan (not one driver
    * round-trip per id — the N+1 anti-pattern), advance the frontier to
    * the highest hit, and stop once `maxMisses` consecutive keys past
    * the frontier came up empty. The per-round result is a 1-row scalar
    * aggregate — the only driver-side value is the frontier itself,
    * which is exactly the state the loop exists to maintain. `source`
    * is the acquisition seam: production wraps the paginated REST
    * probe; any keyed DataFrame works here.
    *
    * Returns the discovered frontier (highest existing key). Ids beyond
    * a gap wider than `maxMisses` are not discovered — the reference
    * makes the same trade to bound probing of a sparse id space. */
  def probeFrontier(source: DataFrame, keyCol: String, startFrontier: Long,
      batchSize: Int = 20, maxMisses: Int = 10): Long = {
    require(batchSize > 0 && maxMisses > 0,
      s"batchSize/maxMisses must be positive ($batchSize/$maxMisses)")
    var frontier = startFrontier
    var misses = 0
    while (misses < maxMisses) {
      val lo = frontier + misses + 1
      val hi = lo + batchSize - 1
      // fetch the batch's PRESENT keys (≤ batchSize ids — tiny), then
      // replay them in sequential-probe order: a max()-only probe would
      // accept a hit BEYOND an intra-batch gap wider than maxMisses,
      // making the result depend on how batches happen to align.
      val present = source.filter(col(keyCol).between(lo, hi))
        .select(col(keyCol)).collect().map(_.getLong(0)).toSet
      var id = lo
      while (id <= hi && misses < maxMisses) {
        if (present(id)) { frontier = id; misses = 0 } else misses += 1
        id += 1
      }
    }
    frontier
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
