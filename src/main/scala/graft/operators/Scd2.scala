package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) construction and point-in-time
  * lookup over the event log — the warehouse-side dual of the
  * reference's keep-last master tables (ingest_politicians.py keeps
  * only the CURRENT row per candidate; an SCD2 build keeps every
  * version with its validity interval, which is what an auditable
  * donations/voting timeline actually needs).
  *
  * 100 TB plan: both operators are keyed by the dimension's natural
  * key (`user_id`). The build is ONE hash exchange on that key
  * followed by per-key windows (version numbering, interval close) —
  * no whole-table window, no self-join. The point-in-time join is a
  * plain hash equi-join on the same key with the interval predicate
  * as a residual; fanout per probe row is the entity's version count
  * (bounded, typically small), never a time-band cross product. The
  * dimension side is the small one by construction (change rows only,
  * no-op updates collapsed), so at scale it broadcasts.
  */
object Scd2 {

  /** The attribute feed: `click` events carry `props = {"k": <int>}` —
    * treated as updates to the user's `k` attribute, ordered by
    * (ts, event_id) so timestamp ties resolve deterministically. */
  private[graft] def updates(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))

  private def byUser: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  /** i6: build the SCD2 dimension. No-op updates (same `k` as the
    * previous version) are collapsed FIRST — true SCD2 discipline:
    * a version row exists only where the attribute actually changed —
    * then each surviving change opens an interval `[valid_from,
    * valid_to)` closed by the next change (NULL = current version).
    *
    * Two window passes over the same (user_id → ts, event_id) sort:
    * Catalyst plans ONE exchange + one sort, with the lag-collapse
    * filter and the lead/row_number close in the same sorted scan. */
  def scd2Build(spark: SparkSession, dir: String): DataFrame =
    scd2Of(graft.Tables.events(spark, dir))

  private[graft] def scd2Of(events: DataFrame): DataFrame = {
    val changed = updates(events)
      .withColumn("prev_k", lag(col("k"), 1).over(byUser))
      .filter(col("prev_k").isNull || col("k") =!= col("prev_k"))
    changed
      .withColumn("version", row_number().over(byUser))
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      .select(col("user_id"), col("version").cast("int").as("version"),
        col("k"), col("ts").as("valid_from"), col("valid_to"))
      .orderBy(col("user_id"), col("version"))
  }

  /** i6b: point-in-time attribute lookup — each `purchase` event is
    * annotated with the `k` version valid at its timestamp
    * (`valid_from <= ts < valid_to`, open-ended current version).
    * Purchases before the user's first change (or for users with no
    * changes) keep NULLs: at scale those are the "dimension lagging
    * the fact feed" rows a pipeline must surface, not drop.
    *
    * SCD2 intervals are disjoint per user by construction, so the
    * equi-join on user_id plus the residual interval predicate yields
    * AT MOST one match per purchase — a left join, not an argmax. */
  def pointInTime(spark: SparkSession, dir: String): DataFrame =
    pointInTimeOf(graft.Tables.events(spark, dir))

  /** Incremental SCD2 maintenance: apply one batch of updates to an
    * already-built dimension (the per-micro-batch core of
    * [[graft.streaming.Scd2Stream]], and the shape a warehouse MERGE
    * runs nightly). Closed versions are immutable and pass through
    * untouched; each user's OPEN version re-enters the window as a
    * seed row (sentinel event_id sorts it first at ts ties), so the
    * no-op collapse and interval close treat resumed history and new
    * updates identically — a batch whose first update repeats the open
    * version's `k` collapses into it, exactly as the full rebuild
    * would.
    *
    * Ordering contract (standard for streaming SCD2): updates arrive
    * in event-time order per user ACROSS batches — every batch ts ≥
    * the user's open `valid_from`. Late (out-of-order) updates need
    * the changelog-replica path, not in-place maintenance.
    *
    * Scale shape: |open versions| + |batch| shuffle once on user_id;
    * closed history is never read into the window. */
  private[graft] def applyUpdates(dim: DataFrame, upd: DataFrame): DataFrame = {
    val closed = dim.filter(col("valid_to").isNotNull)
    val open = dim.filter(col("valid_to").isNull)
    val seed = open.select(col("user_id"), col("valid_from").as("ts"),
      lit(Long.MinValue).as("event_id"), col("k"), col("version"))
    val incoming = upd
      .select(col("user_id"), col("ts"), col("event_id"), col("k"))
      .withColumn("version", lit(null).cast("int"))
    val all = seed.unionByName(incoming)
    val perUser = Window.partitionBy(col("user_id"))
    val changed = all
      .withColumn("prev_k", lag(col("k"), 1).over(byUser))
      .filter(col("prev_k").isNull || col("k") =!= col("prev_k"))
    val renum = changed
      .withColumn("rn", row_number().over(byUser))
      // the surviving seed (if any) carries the user's version base;
      // new users start at 1
      .withColumn("seedv", max(col("version")).over(perUser))
      .withColumn("version",
        (coalesce(col("seedv"), lit(1)) + col("rn") - 1).cast("int"))
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      .select(col("user_id"), col("version"), col("k"),
        col("ts").as("valid_from"), col("valid_to"))
    closed.unionByName(renum)
      .orderBy(col("user_id"), col("version"))
  }

  private[graft] def pointInTimeOf(events: DataFrame): DataFrame = {
    val dim = scd2Of(events)
      .select(col("user_id").as("d_user_id"), col("version"),
        col("k"), col("valid_from"), col("valid_to"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    purchases
      .join(dim,
        purchases("user_id") === dim("d_user_id") &&
          dim("valid_from") <= purchases("ts") &&
          (dim("valid_to").isNull || purchases("ts") < dim("valid_to")),
        "left")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("version").as("k_version"), col("k").as("k_at_purchase"))
      .orderBy(col("event_id"))
  }

  /** j13: interval-OVERLAP join — every attribute version active at
    * any point during each of the user's activity sessions (the
    * temporal-join shape i6b's point lookup can't express: a long
    * session spans MULTIPLE versions and must report all of them —
    * which scopes were in force while the user was active).
    *
    * Sessions are st2's 5-minute-gap windows ([session_start,
    * last_event], both endpoints event instants, so both inclusive);
    * versions are i6's [valid_from, valid_to) intervals. Overlap:
    * valid_from ≤ last_event AND (valid_to IS NULL OR valid_to >
    * session_start). Left join keeps version-less sessions (activity
    * before the first attribute change) as NULLs — the i6b rule.
    *
    * Scale shape: both sides are per-user frames keyed on user_id —
    * the overlap predicate rides the equi join as a residual, fanout
    * = versions overlapping the session (bounded by version count),
    * never a time-band cross product. Sessionization itself is the
    * same partial-agged session_window st2 runs. */
  def sessionVersions(spark: SparkSession, dir: String): DataFrame =
    sessionVersionsOf(graft.Tables.events(spark, dir))

  private[graft] def sessionVersionsOf(events: DataFrame): DataFrame = {
    val sessions = events
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("last_event"))
      .select(col("user_id"), col("session_start"), col("last_event"))
    val dim = scd2Of(events)
      .select(col("user_id").as("d_user_id"), col("version"),
        col("k"), col("valid_from"), col("valid_to"))
    sessions
      .join(dim,
        sessions("user_id") === dim("d_user_id") &&
          dim("valid_from") <= sessions("last_event") &&
          (dim("valid_to").isNull || dim("valid_to") > sessions("session_start")),
        "left")
      .select(col("user_id"), col("session_start"), col("last_event"),
        col("version"), col("k"))
      .orderBy(col("user_id"), col("session_start"), col("version"))
  }
}
