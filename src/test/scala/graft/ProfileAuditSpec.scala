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
}
