package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profile, SnapshotDiff}

class ProfileAuditSpec extends SparkSpec {

  test("integrity audit: clean relations report zero; planted deletions are caught exactly") {
    val rows = Profile.integrityAudit(spark, sfDir01)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.size === 4)
    Seq("events.user_id->customer", "lineitem.l_orderkey->orders",
      "orders.o_custkey->customer").foreach { rel =>
      assert(rows(rel)._2 === 0L && rows(rel)._3 === 0L, s"$rel must be clean")
      assert(rows(rel)._1 > 0L)
    }
    // the planted relation: orphans == exactly the release-deleted docs
    val deleted = SnapshotDiff.releaseDiff(spark, sfDir01)
      .filter(col("op") === "deleted")
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    val (nDel, idSum) = deleted
    assert(rows("v1.doc_id->next_release")._2 === nDel)
    assert(rows("v1.doc_id->next_release")._3 === idSum,
      "orphan membership must equal the release's deleted set")
  }

  test("volume anomaly: planted spike trips the 2σ gate, steady days don't") {
    import spark.implicits._
    def ts(day: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-03-${day}%02d 12:00:00")
    // 'view': 9 steady days of 10 events + one day of 100 — the spike
    // and ONLY the spike must flag. 'click': constant volume, σ = 0,
    // nothing flags. One event_id per row; values/props irrelevant.
    val rows =
      (1 to 9).flatMap(d => (1 to 10).map(i =>
        (d * 1000L + i, ts(d), i.toLong, "view", 0.0, "{}"))) ++
      (1 to 100).map(i => (10000L + i, ts(10), i.toLong, "view", 0.0, "{}")) ++
      (1 to 5).flatMap(d => (1 to 7).map(i =>
        (20000L + d * 100 + i, ts(d), i.toLong, "click", 0.0, "{}")))
    val got = Profile.volumeAnomalyOf(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    val (clicks, views) = got.partition(_._1 == "click")
    assert(clicks.length === 5 && clicks.forall(!_._4), "constant volume must not flag")
    assert(views.length === 10)
    assert(views.filter(_._4).map(_._2).toSeq === Seq("2024-03-10"),
      "exactly the planted spike day flags")
    // driver mirror of the exact integer rule over the fixture
    val fx = Profile.volumeAnomaly(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    fx.groupBy(_._1).foreach { case (_, days) =>
      val n = BigInt(days.length)
      val sx = days.map(d => BigInt(d._3)).sum
      val sxx = days.map(d => BigInt(d._3) * BigInt(d._3)).sum
      days.foreach { d =>
        val lhs = (n * BigInt(d._3) - sx).pow(2)
        val rhs = (n * sxx - sx * sx) * 4
        assert(d._4 === (lhs > rhs), s"${d._1} ${d._2}")
      }
    }
  }
}
