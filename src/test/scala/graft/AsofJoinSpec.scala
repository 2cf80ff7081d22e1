package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** J11 semantics pinned against a driver-side brute force: for every
  * purchase, the match must be THE latest same-user view inside the
  * horizon (event-id tie-break), and unmatched purchases must survive
  * with the -1 sentinels. */
class AsofJoinSpec extends SparkSpec {

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  test("as-of match is the latest same-user view within the horizon") {
    val events = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        micros(r.getAs[java.sql.Timestamp]("ts"))))
    val horizon = AsofJoin.HorizonMinutes * 60L * 1000000L
    val views = events.filter(_._3 == "view")
    val purchases = events.filter(_._3 == "purchase")
    assert(purchases.nonEmpty && views.nonEmpty)

    val expected = purchases.map { case (pId, user, _, pTs) =>
      val best = views
        .filter { case (_, u, _, vTs) => u == user && vTs <= pTs && vTs >= pTs - horizon }
        .sortBy { case (vId, _, _, vTs) => (vTs, vId) }
        .lastOption
      pId -> best.map { case (vId, _, _, vTs) => (vId, (pTs - vTs) / 1000000L) }
        .getOrElse((-1L, -1L))
    }.toMap

    val got = AsofJoin.viewBeforePurchase(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got.size === purchases.length, "one output row per purchase")
    assert(got === expected)
    // the fixture must exercise BOTH branches, or the test proves little
    assert(got.values.exists(_._1 >= 0), "no matched purchase in fixture")
    assert(got.values.exists(_._1 == -1L), "no unmatched purchase in fixture")
  }

  test("custom as-of merge operator (j11c) equals the plain band join exactly") {
    val plain = AsofJoin.viewBeforePurchase(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    val merged = AsofJoin.viewBeforePurchaseMerged(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(merged.length === plain.length, "row count diverged")
    assert(merged.toSeq === plain.toSeq)
  }

  test("j11c plans the custom AsofMergeExec — no SMJ pair enumeration, no argmax window") {
    val p = AsofJoin.viewBeforePurchaseMerged(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsofMerge"), s"custom operator not planned:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fell back to a band-residual SMJ:\n$p")
    assert(!p.contains("Window"), s"an argmax window survived — the merge should emit rn=1 directly:\n$p")
    // the operator's declared requirements must have materialized as the
    // standard hash exchanges + in-partition sorts (same shape SMJ pays)
    assert(p.contains("Exchange hashpartitioning"), s"no hash exchange under the merge:\n$p")
    assert(p.contains("Sort ["), s"no in-partition sort under the merge:\n$p")
  }

  test("as-of merge null contract: right nulls filtered, left null key unmatched, null left time loud") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.plans.AsofMerge
    val lSchema = StructType(Seq(
      StructField("p_id", LongType, nullable = false),
      StructField("p_user", LongType, nullable = true),
      StructField("p_ts", LongType, nullable = true)))
    // v_id deliberately NON-nullable: the unmatched-left row must still
    // project a null payload (the r7 resultProj nullability fix), not a
    // garbage primitive read
    val rSchema = StructType(Seq(
      StructField("v_user", LongType, nullable = true),
      StructField("v_ts", LongType, nullable = true),
      StructField("v_id", LongType, nullable = false)))
    def df(schema: StructType, rows: Row*) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val right = df(rSchema,
      Row(1L, 100L, 10L),    // valid view for user 1
      Row(1L, null, 11L),    // null right time: dropped by the guard
      Row(null, 120L, 12L))  // null right key: dropped by the guard
    val left = df(lSchema,
      Row(1L, 1L, 150L),     // must match v_id=10, not the null-time row
      Row(2L, null, 150L),   // null left key: survives unmatched
      Row(3L, 9L, 160L))     // user with no views: unmatched
    val out = AsofMerge.joinBackward(left, right,
      Seq("p_user"), Seq("v_user"), "p_ts", "v_ts", "v_id",
      horizonUs = 1000L, rightPayload = Seq("v_id"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out === Map(1L -> 10L, 2L -> -1L, 3L -> -1L))

    // a null LEFT time is a contract violation — loud, never epoch-0
    val badLeft = df(lSchema, Row(1L, 1L, null))
    val ex = intercept[Exception] {
      AsofMerge.joinBackward(badLeft, right,
        Seq("p_user"), Seq("v_user"), "p_ts", "v_ts", "v_id",
        horizonUs = 1000L, rightPayload = Seq("v_id")).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(t =>
      String.valueOf(t.getMessage).contains("null left time")),
      s"expected loud null-time failure, got: $ex")
  }

  test("bucketed as-of join (j11b) equals the plain band join exactly") {
    // the 2-probe bucket blocking must lose nothing: a view inside the
    // 1-horizon band lies in the purchase's bucket or the previous one
    val plain = AsofJoin.viewBeforePurchase(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    val bucketed = AsofJoin.viewBeforePurchaseBucketed(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(bucketed.length === plain.length, "row count diverged")
    assert(bucketed.toSeq === plain.toSeq)
  }
}
