package graft

import graft.streaming.VersionedState

/** The copy-on-write + commit-marker crash protocol shared by
  * ChangelogStream, Scd2Stream, and EventsStream.streamingMergeUpsert —
  * unit-level, exercising exactly the crash WINDOWS the scaladoc
  * argues about (an unmarked version dir, a mid-GC interleaving),
  * which the end-to-end stream specs can't reach deterministically. */
class VersionedStateSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val tempDirs = scala.collection.mutable.ArrayBuffer.empty[java.io.File]

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"vstate_$tag").toFile
    tempDirs += d
    d.getAbsolutePath
  }

  // deleteOnExit only removes EMPTY dirs — clean the marker/parquet
  // trees when the suite ends
  override def afterAll(): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rec)
      f.delete(); ()
    }
    tempDirs.foreach(rec)
    super.afterAll()
  }

  private def mkVersion(state: VersionedState, id: Long): Unit = {
    val dir = new java.io.File(state.versionPath(id))
    dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.getAbsolutePath, "part-0"), s"v$id")
  }

  test("a crash between version write and marker leaves the version invisible and rewritable") {
    val dir = freshDir("unmarked")
    val st = new VersionedState(spark, dir, "spec")
    // simulate the crash: v_5 data landed, marker never written
    mkVersion(st, 5L)
    assert(st.committed().isEmpty,
      "an unmarked version dir must not be resolvable")
    // the replaying writer re-runs batch 5: rewrite succeeds, marker lands
    mkVersion(st, 5L)
    st.writeMarker(5L)
    assert(st.committed() === Seq(5L))
  }

  test("writeMarker refuses a pre-existing marker (protocol violation is loud)") {
    val dir = freshDir("dupmark")
    val st = new VersionedState(spark, dir, "spec")
    mkVersion(st, 1L)
    st.writeMarker(1L)
    // the caller's committed-batch skip should have prevented this; if
    // it didn't, silent overwrite would hide a replay-accounting bug
    intercept[Exception] { st.writeMarker(1L) }
  }

  test("GC keeps the two newest versions and deletes marker-first") {
    val dir = freshDir("gc")
    val st = new VersionedState(spark, dir, "spec")
    Seq(0L, 1L, 2L, 3L).foreach { id => mkVersion(st, id); st.writeMarker(id) }
    st.gcOldVersions()
    assert(st.committed() === Seq(2L, 3L), "retention must keep exactly the 2 newest")
    // invariant after GC: every surviving marker points at readable data,
    // and no GC'd version's data outlives a marker claiming it
    st.committed().foreach { id =>
      assert(new java.io.File(st.versionPath(id)).exists(),
        s"marker $id points at deleted data — the exact lie marker-first GC prevents")
    }
    assert(!new java.io.File(st.versionPath(0L)).exists())
    assert(!new java.io.File(st.versionPath(1L)).exists())
  }

  test("a mid-GC crash (marker deleted, data orphaned) never yields a resolvable half-version") {
    val dir = freshDir("gccrash")
    val st = new VersionedState(spark, dir, "spec")
    Seq(1L, 2L, 3L).foreach { id => mkVersion(st, id); st.writeMarker(id) }
    // simulate the crash window inside gcOldVersions: marker for v_1
    // removed, data still on disk (the order the protocol mandates)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_committed_1"), false)
    assert(st.committed() === Seq(2L, 3L),
      "orphaned data must be invisible once its marker is gone")
    // readers resolve the newest committed version and find real data
    val newest = st.committed().last
    assert(new java.io.File(st.versionPath(newest)).exists())
  }

  test("ensureInitial seeds exactly once") {
    val dir = freshDir("seed")
    val st = new VersionedState(spark, dir, "spec")
    var writes = 0
    st.ensureInitial { p => writes += 1; new java.io.File(p).mkdirs() }
    st.ensureInitial { p => writes += 1; new java.io.File(p).mkdirs() }
    assert(writes === 1, "initial state must seed only when nothing is committed")
    assert(st.committed() === Seq(-1L))
  }
}
