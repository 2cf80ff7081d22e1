package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session —
  * getOrCreate dedupes across suites run in the same forked JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  // one root for every fixture path — suites that need a different SF
  // derive from here instead of hardcoding a machine layout. The env
  // override mirrors Bench/Verify's SPARK_GRAFT_SF_DIR convention
  // (which points at one SF dir; this is its parent).
  val testDataRoot: String = sys.env.get("SPARK_GRAFT_SF_DIR")
    .map(d => new java.io.File(d).getParent)
    .getOrElse("/root/testdata")
  val sfDir = s"$testDataRoot/sf0.001"
  val sfDir01 = s"$testDataRoot/sf0.01"

  /** Recursive tree delete for temp fixtures — one copy for every
    * suite (deleteOnExit only removes empty dirs). */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rmTree)
    f.delete(); ()
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // static conf: one long session runs hundreds of distinct plans;
      // the 100-entry default evicts generated classes between reuses
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
