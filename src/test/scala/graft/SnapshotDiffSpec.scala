package graft

import org.apache.spark.sql.functions._
import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {

  test("diff classifies inserted/deleted/updated/unchanged, null-safe") {
    import spark.implicits._
    val old = Seq(
      (1L, Option("a"), Option("x")),
      (2L, Option("b"), Option("y")),
      (3L, Option("c"), Option("z")),
      (4L, None: Option[String], Option("w")),
      (5L, Option(""), Option("v"))).toDF("id", "t", "s")
    val neu = Seq(
      (1L, Option("a"), Option("x")),    // unchanged
      (2L, Option("B"), Option("y")),    // updated
      (4L, Option(""), Option("w")),     // updated: null -> "" must differ
      (5L, Option(""), Option("v")),     // unchanged
      (6L, Option("n"), Option("u"))).toDF("id", "t", "s") // inserted; 3 deleted
    val got = SnapshotDiff.diff(old, neu, Seq("id"), Seq("t", "s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "updated", 3L -> "deleted",
      4L -> "updated", 5L -> "unchanged", 6L -> "inserted"))
  }

  test("diff and apply work over composite keys") {
    import spark.implicits._
    val old = Seq((1L, "a", "x", 10), (1L, "b", "y", 20), (2L, "a", "z", 30))
      .toDF("k1", "k2", "v", "w")
    val neu = Seq((1L, "a", "x", 10), (1L, "b", "Y", 21), (3L, "c", "n", 40))
      .toDF("k1", "k2", "v", "w")
    val keys = Seq("k1", "k2"); val vals = Seq("v", "w")
    val got = SnapshotDiff.diff(old, neu, keys, vals)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    assert(got === Map((1L, "a") -> "unchanged", (1L, "b") -> "updated",
      (2L, "a") -> "deleted", (3L, "c") -> "inserted"))
    val applied = SnapshotDiff.applyChanges(old,
      SnapshotDiff.changelog(old, neu, keys, vals), keys, vals)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    val expected = neu.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(applied === expected)
  }

  test("digest has no field-boundary ambiguity") {
    import spark.implicits._
    val old = Seq((1L, "ab", "c")).toDF("id", "t", "s")
    val neu = Seq((1L, "a", "bc")).toDF("id", "t", "s")
    val got = SnapshotDiff.diff(old, neu, Seq("id"), Seq("t", "s"))
      .collect().map(_.getString(1)).toSeq
    assert(got === Seq("updated"), "shifted field boundary must read as a change")
  }

  test("changelog -> apply reconstructs the new snapshot row-for-row") {
    val keys = Seq("doc_id"); val vals = Seq("text", "lang", "source")
    val v1 = Tables.documents(spark, sfDir01)
    val v2 = SnapshotDiff.nextRelease(v1)
    val log = SnapshotDiff.changelog(v1, v2, keys, vals)
    // the log carries ONLY changes — its size is the change volume
    val opsN = SnapshotDiff.releaseDiff(spark, sfDir01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(log.count() ===
      opsN("deleted") + opsN("inserted") + opsN("updated"))
    val applied = SnapshotDiff.applyChanges(v1, log, keys, vals)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    val expected = v2.select((keys ++ vals).map(org.apache.spark.sql.functions.col): _*)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(applied === expected)
  }

  test("release diff accounts for every row of both snapshots") {
    val v1 = Tables.documents(spark, sfDir01)
    val v2 = SnapshotDiff.nextRelease(v1)
    val ops = SnapshotDiff.releaseDiff(spark, sfDir01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // old = deleted + updated + unchanged; new = inserted + updated + unchanged
    assert(ops.getOrElse("deleted", 0L) + ops.getOrElse("updated", 0L)
      + ops.getOrElse("unchanged", 0L) === v1.count())
    assert(ops.getOrElse("inserted", 0L) + ops.getOrElse("updated", 0L)
      + ops.getOrElse("unchanged", 0L) === v2.count())
    assert(ops.values.forall(_ > 0), s"every op class should occur at sf0.01: $ops")
  }
}
