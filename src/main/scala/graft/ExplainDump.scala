package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries into a directory —
  * the optimization rounds' evidence artifact (`plans/r{N}/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.ExplainDump <outDir> <suffix> <q1,q2,...>
  * (data dir from SPARK_GRAFT_SF_DIR, defaults to sf0.1 — plan SHAPE is
  * SF-independent except broadcast-threshold choices, and the bench runs
  * at sf0.1, so plans are dumped there too). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, names) = args.take(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.withScratch(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    // Queries whose public frame is eagerly materialized
    // (materializeAndRelease) explain as a bare ExistingRDD scan; for
    // those, "<name>__internal" dumps the un-materialized INTERNAL
    // frame the query computes — the plan the optimization evidence is
    // about (round 16).
    val internal: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      // caches leak in the dump process (it exits right after) — the
      // hook stays signature-agnostic across the change it evidences
      "e4_dashboard__internal" -> ((s, d) =>
        graft.operators.Profile.dashboardFrames(s, d, "BUILDING")._1)
    )
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = internal.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      System.err.println(s"[explain] wrote $outDir/${name}_$suffix.txt (${plan.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
