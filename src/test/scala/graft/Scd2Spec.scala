package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** SCD2 semantics pinned on a planted update/fact feed plus a
  * driver-side brute-force mirror over the real fixture: version rows
  * exist only where the attribute CHANGED, intervals tile each user's
  * timeline with no gaps or overlaps, and the point-in-time join
  * recovers exactly the version whose interval contains the fact. */
class Scd2Spec extends SparkSpec {

  private def ts(m: Int): Timestamp = new Timestamp(1700000000000L + m * 60000L)

  private def plantedEvents = {
    import spark.implicits._
    Seq(
      // user 1: k 5 -> 5 (no-op, collapses) -> 7; purchases straddle
      (101L, ts(0), 1L, "click", 0.0, """{"k": 5}"""),
      (102L, ts(10), 1L, "click", 0.0, """{"k": 5}"""),
      (103L, ts(20), 1L, "click", 0.0, """{"k": 7}"""),
      (104L, ts(5), 1L, "purchase", 9.0, """{"k": 0}"""),
      (105L, ts(20), 1L, "purchase", 9.0, """{"k": 0}"""), // AT the boundary
      (106L, ts(25), 1L, "purchase", 9.0, """{"k": 0}"""),
      // user 2: purchase BEFORE any click -> null version
      (201L, ts(30), 2L, "click", 0.0, """{"k": 9}"""),
      (202L, ts(3), 2L, "purchase", 9.0, """{"k": 0}"""),
      // user 3: purchases but never a click -> null version
      (301L, ts(1), 3L, "purchase", 9.0, """{"k": 0}"""),
      // user 4: same-ts clicks, event_id breaks the tie
      (402L, ts(2), 4L, "click", 0.0, """{"k": 2}"""),
      (401L, ts(2), 4L, "click", 0.0, """{"k": 1}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("scd2 build: no-op collapse, interval tiling, tie-break") {
    val dim = Scd2.scd2Of(plantedEvents).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getTimestamp(3), Option(r.getTimestamp(4))))
    assert(dim.toSeq === Seq(
      (1L, 1, 5, ts(0), Some(ts(20))), // the ts(10) no-op never opened a version
      (1L, 2, 7, ts(20), None),
      (2L, 1, 9, ts(30), None),
      (4L, 1, 1, ts(2), Some(ts(2))), // zero-width: tie resolved by event_id
      (4L, 2, 2, ts(2), None)
    ))
    // intervals tile: per user, valid_from(v+1) == valid_to(v)
    dim.groupBy(_._1).foreach { case (_, vs) =>
      vs.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, _, _, Some(to)), (_, _, _, from, _)) =>
          assert(to === from)
        case _ => ()
      }
    }
  }

  test("point-in-time join annotates each purchase with the covering version") {
    val pit = Scd2.pointInTimeOf(plantedEvents).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        if (r.isNullAt(4)) None else Some(r.getInt(4))))
    assert(pit.toSeq === Seq(
      (104L, Some(1), Some(5)), // inside v1
      (105L, Some(2), Some(7)), // AT v2's valid_from: boundary is inclusive-left
      (106L, Some(2), Some(7)),
      (202L, None, None), // before user 2's first version
      (301L, None, None) // user 3 has no versions at all
    ))
  }

  test("session-version overlap (j13): a session spanning versions reports all of them") {
    import org.apache.spark.sql.functions._
    // one session (1-min gaps) crossing two k-changes -> 3 versions
    // overlap it; a later isolated session sits inside version 3 only;
    // user 5 has sessions but no clicks -> NULL row per session
    val planted = {
      import spark.implicits._
      Seq(
        (1L, ts(0), 6L, "view", 0.0, "{}"),
        (2L, ts(1), 6L, "click", 0.0, """{"k": 1}"""),
        (3L, ts(2), 6L, "click", 0.0, """{"k": 2}"""),
        (4L, ts(3), 6L, "click", 0.0, """{"k": 3}"""),
        (5L, ts(4), 6L, "view", 0.0, "{}"),
        (6L, ts(60), 6L, "view", 0.0, "{}"), // isolated later session
        (7L, ts(9), 5L, "view", 0.0, "{}")
      ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    val got = Scd2.sessionVersionsOf(planted).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        if (r.isNullAt(4)) None else Some(r.getInt(4)))).toSeq
    assert(got === Seq(
      (5L, ts(9), None, None),
      (6L, ts(0), Some(1), Some(1)),
      (6L, ts(0), Some(2), Some(2)),
      (6L, ts(0), Some(3), Some(3)),
      (6L, ts(60), Some(3), Some(3))))
  }

  test("fixture scd2 matches a driver-side brute force") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) Int.MinValue else r.getInt(4)))
    val expected = ev.filter(_._4 == "click")
      .groupBy(_._3).toSeq.flatMap { case (uid, rows) =>
        val ordered = rows.sortBy(r => (r._2.getTime, r._1))
        val changed = ordered.zip(Int.MinValue.toString +: ordered.map(_._5.toString))
          .collect { case (r, prev) if prev != r._5.toString => r }
        changed.zipWithIndex.map { case (r, i) =>
          (uid, i + 1, r._5,
            r._2, changed.lift(i + 1).map(_._2))
        }
      }.sortBy(t => (t._1, t._2))
    val got = Scd2.scd2Of(Tables.events(spark, sfDir)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getTimestamp(3), Option(r.getTimestamp(4))))
    assert(got.toSeq === expected)
    // and every purchase's annotation is the covering interval's k
    val dimByUser = expected.groupBy(_._1)
    val gotPit = Scd2.pointInTimeOf(Tables.events(spark, sfDir)).collect()
    gotPit.foreach { r =>
      val (uid, t) = (r.getLong(1), r.getTimestamp(2))
      val cover = dimByUser.getOrElse(uid, Seq.empty)
        .find(v => !v._4.after(t) && v._5.forall(to => t.before(to)))
      assert((if (r.isNullAt(4)) None else Some(r.getInt(4))) === cover.map(_._3),
        s"purchase ${r.getLong(0)} of user $uid")
    }
    assert(gotPit.length === ev.count(_._4 == "purchase"))
  }
}
