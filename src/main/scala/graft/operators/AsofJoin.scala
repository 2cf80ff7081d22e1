package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J11: as-of / interval join over event time — for every purchase
  * event, the most recent view by the same user within a bounded
  * look-back horizon (attribution: "which impression led to this
  * conversion"). The reference's analytics join donations to the
  * politician dimension on static keys; the as-of form is its
  * event-time analog and the one join family Spark has no single
  * operator for — composed here from what Catalyst CAN plan well.
  *
  * Plan shape: equi join on user_id (sort-merge / shuffled hash — the
  * range predicates ride along as a residual filter, so there is no
  * cartesian anywhere), then the w2 argmax pattern (row_number over
  * p_id, latest view wins, event-id tie-break) picks the as-of match.
  * A LEFT join keeps unmatched purchases — attribution must report
  * "no prior view", not drop the row.
  *
  * The BOUNDED horizon is the scale decision: an unbounded as-of join
  * fans out each purchase to the user's whole view history (years of
  * events at 100 TB); the 10-minute band caps fanout at the per-user
  * event rate × horizon, and it is also exactly what makes the
  * STREAMING twin possible — Spark's stream-stream join requires a
  * time-range constraint to bound state (EventsStream.
  * viewPurchaseJoinStreaming; equivalence asserted in
  * EventsStreamSpec).
  *
  * Null-free output contract (driver-render parity): unmatched
  * purchases emit v_id = -1 and gap_s = -1 rather than nulls — a
  * nullable BIGINT degrades to float64 under the pandas load path,
  * changing the rendered hash.
  */
object AsofJoin {

  val HorizonMinutes = 10

  def viewBeforePurchase(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
    purchases
      .join(views,
        col("user_id") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr(s"INTERVAL $HorizonMinutes MINUTES"),
        "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p_id"))
          .orderBy(desc_nulls_last("v_ts"), desc_nulls_last("v_id"))))
      .filter(col("rn") === 1)
      .select(col("p_id"), col("user_id"), col("p_ts"),
        coalesce(col("v_id"), lit(-1L)).as("v_id"),
        coalesce(expr("(unix_micros(p_ts) - unix_micros(v_ts)) div 1000000"),
          lit(-1L)).as("gap_s"))
      .orderBy(col("p_id"))
  }

  /** J11b: the time-BUCKETED as-of join — [[viewBeforePurchase]] with a
    * horizon-width time bucket as a SECOND equi key (the j7b
    * adjacent-band trick). SMJ does not exploit the band's
    * monotonicity, so in the plain form a hot user's purchases pair
    * with that user's WHOLE view history before the residual filter
    * prunes — residual pairs grow with rate × history. Bucketing by
    * `floor(epoch / horizon)` and probing buckets b and b−1 (provably
    * lossless: a view within the 1-horizon look-back band lies in the
    * purchase's bucket or the one before, never earlier) shrinks the
    * equi-join cells to rate × horizon — per-pair work is then
    * independent of history length. The purchase side explodes into
    * its two probe buckets (2× a filtered side, cheap); a view matches
    * through exactly ONE probe (it has one bucket), so no dedup is
    * needed beyond the argmax the operator already runs; unmatched
    * probes surface as null rows that sort last and are dropped by
    * rn=1 — unmatched PURCHASES still emit their -1 sentinel row.
    * Driver-gated against j11's ORACLE VERBATIM: hash equality proves
    * the bucket blocking loses nothing. */
  def viewBeforePurchaseBucketed(spark: SparkSession, dir: String): DataFrame = {
    val horizonUs = HorizonMinutes * 60L * 1000000L
    val e = graft.Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withColumn("probe", explode(array(
        expr(s"unix_micros(p_ts) div $horizonUs"),
        expr(s"unix_micros(p_ts) div $horizonUs - 1"))))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
      .withColumn("probe", expr(s"unix_micros(v_ts) div $horizonUs"))
    purchases
      .join(views,
        col("user_id") === col("v_user") &&
          purchases("probe") === views("probe") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr(s"INTERVAL $HorizonMinutes MINUTES"),
        "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p_id"))
          .orderBy(desc_nulls_last("v_ts"), desc_nulls_last("v_id"))))
      .filter(col("rn") === 1)
      .select(col("p_id"), col("user_id"), col("p_ts"),
        coalesce(col("v_id"), lit(-1L)).as("v_id"),
        coalesce(expr("(unix_micros(p_ts) - unix_micros(v_ts)) div 1000000"),
          lit(-1L)).as("gap_s"))
      .orderBy(col("p_id"))
  }

  /** J11c: the TRUE as-of operator — [[viewBeforePurchase]]'s exact
    * semantics through the custom `AsofMergeJoin` logical plan +
    * `AsofMergeExec` physical merge (graft.plans). Same exchanges as
    * the SMJ forms (hash on user, sort by time) but the per-key work
    * is O(views + purchases) instead of the band-residual's O(views ×
    * purchases) pair enumeration, and no argmax window runs at all —
    * the merge emits exactly one row per purchase. Driver-gated
    * against j11's oracle VERBATIM, so hash equality proves the
    * custom operator implements the declarative band-join + argmax
    * semantics bit-for-bit. */
  def viewBeforePurchaseMerged(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
    graft.plans.AsofMerge.joinBackward(
        purchases, views,
        leftKeys = Seq("user_id"), rightKeys = Seq("v_user"),
        leftTime = "p_ts", rightTime = "v_ts", rightTieBreak = "v_id",
        horizonUs = HorizonMinutes * 60L * 1000000L,
        rightPayload = Seq("v_id", "v_ts"))
      .select(col("p_id"), col("user_id"), col("p_ts"),
        coalesce(col("v_id"), lit(-1L)).as("v_id"),
        coalesce(expr("(unix_micros(p_ts) - unix_micros(v_ts)) div 1000000"),
          lit(-1L)).as("gap_s"))
      .orderBy(col("p_id"))
  }
}
