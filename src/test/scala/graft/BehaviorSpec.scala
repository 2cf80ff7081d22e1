package graft

import org.apache.spark.sql.functions._
import graft.operators.Behavior

class BehaviorSpec extends SparkSpec {

  private lazy val evs: Array[(Long, String, Long)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("funnel stages equal a driver-side brute force and are monotone") {
    val byUser = evs.groupBy(_._1)
    def firstAfter(u: Long, t: String, after: Long): Option[Long] = {
      val ts = byUser(u).filter(e => e._2 == t && e._3 > after).map(_._3)
      if (ts.isEmpty) None else Some(ts.min)
    }
    val s1 = byUser.keys.flatMap(u => firstAfter(u, "view", Long.MinValue).map(u -> _)).toMap
    val s2 = s1.flatMap { case (u, t1) => firstAfter(u, "click", t1).map(u -> _) }
    val s3 = s2.flatMap { case (u, t2) => firstAfter(u, "purchase", t2).map(u -> _) }
    val got = Behavior.funnelStages(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("1_view") === ((s1.size.toLong, s1.keys.sum)))
    assert(got("2_view_click") === ((s2.size.toLong, s2.keys.sum)))
    assert(got("3_view_click_purchase") === ((s3.size.toLong, s3.keys.sum)))
    assert(s1.size >= s2.size && s2.size >= s3.size, "stage reach must be monotone")
  }

  test("strictly-after semantics: same-timestamp events do not advance the funnel") {
    import spark.implicits._
    val t0 = 1700000000000000L
    val df = Seq(
      (1L, "view", t0), (1L, "click", t0),           // simultaneous: no advance
      (2L, "view", t0), (2L, "click", t0 + 1),        // advances
      (2L, "purchase", t0 + 1),                       // simultaneous with click: no advance
      (3L, "view", t0), (3L, "click", t0 + 1), (3L, "purchase", t0 + 2))
      .toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    df.select("user_id", "event_type", "ts").withColumn("event_id", col("user_id"))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Behavior.funnelStages(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("1_view") === 3L)
    assert(got("2_view_click") === 2L)      // users 2 and 3
    assert(got("3_view_click_purchase") === 1L) // user 3 only
  }

  test("retention cohorts: week-0 cell covers every user; offsets non-negative") {
    val rows = Behavior.retentionCohorts(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "offsets must be non-negative")
    val users = evs.map(_._1).distinct.length.toLong
    val week0 = rows.filter(_._2 == 0L).map(_._3).sum
    assert(week0 === users, "every user is active in their cohort week 0")
  }
}
