package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral analytics over the events table — the funnel / cohort
  * shapes every product-analytics surface serves (the reference's
  * dashboard timelines are the time-bucket half; these are the
  * per-user sequential half).
  *
  * Both operators reduce to aggregations keyed by user_id, so the
  * 100 TB plan is: one hash exchange on user_id, every later stage
  * joining or re-aggregating on the SAME key (co-partitioned, no new
  * exchange under AQE's exchange reuse), then a tiny rollup. No
  * windows over the raw event stream, no sessionize-then-explode —
  * per-user state is a handful of timestamps.
  */
object Behavior {

  /** a17: strict-order funnel view → click → purchase. A user advances
    * to a stage only with an event STRICTLY after their previous
    * stage's entry time: t₁ = min ts(view), t₂ = min ts(click > t₁),
    * t₃ = min ts(purchase > t₂). Emitted as per-stage reach counts
    * (users are monotone across stages by construction).
    *
    * Three min-aggregates on one key; the stage-N filter needs
    * stage-(N-1)'s time, so the dependency is inherently sequential —
    * but each pass is a partial-agged min on the already-partitioned
    * key, not a sort. (A single-pass form exists via max_by sequences,
    * but three co-partitioned aggs of a 150-byte state beat sorting
    * every user's full event history at scale.) */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    def firstOf(t: String): DataFrame = ev.filter(col("event_type") === t)
    val t1 = firstOf("view").groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = firstOf("click").join(t1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = firstOf("purchase").join(t2, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val stages = Seq(("1_view", t1), ("2_view_click", t2), ("3_view_click_purchase", t3))
    stages.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_users"), sum(col("user_id")).as("user_id_sum"))
        .select(lit(name).as("stage"), col("n_users"), col("user_id_sum"))
    }.reduce(_ unionByName _).orderBy(col("stage"))
  }

  /** a18: weekly retention cohorts. Cohort = the epoch-week of the
    * user's FIRST event of any type; retention cell (cohort, offset) =
    * distinct users of that cohort active offset weeks later. Weeks are
    * epoch-aligned (floor(epoch_days / 7)) — deterministic and
    * engine-portable, no session-timezone week-of-year semantics.
    *
    * Shape: first-event min on user_id, broadcast-join the (user →
    * cohort) frame back to events (it is |users| rows — at 100 TB this
    * is the one frame worth a shuffle join instead; same plan
    * otherwise), distinct on (cohort, offset, user), then the rollup.
    * user_id_sum pins cell membership in the hash compare. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir).select(col("user_id"), col("ts"))
    val week = (c: org.apache.spark.sql.Column) =>
      floor(unix_micros(c) / lit(604800000000L)).cast("long")
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"), week(col("first_ts")).as("cohort_week"))
    ev.join(cohorts, Seq("user_id"))
      .select(col("user_id"), col("cohort_week"),
        (week(col("ts")) - col("cohort_week")).as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"), sum(col("user_id")).as("user_id_sum"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
