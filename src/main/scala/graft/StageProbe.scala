package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level diagnostic for the ingest-stream ladder: times each
  * stage of DedupStream.dedupAppend at a given corpus factor so a
  * ladder slope is ATTRIBUTED, not guessed (round 14 used it to find,
  * in order: the per-batch parquet sidecar jobs, the bloom literal
  * shipping once per stage, and the probe fixture's own corpus sort
  * hiding inside the timed window). Committed so SCALE.md's verb-level
  * flatness claim stays reproducible.
  *
  * Usage: runMain graft.StageProbe [baseDir] [factor] */

object StageProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 300
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.withScratch(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outRoot = Tables.scratchDir.getOrElse(System.getProperty("java.io.tmpdir")) +
      s"/graft_stageprobe_${ProcessHandle.current().pid()}"
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val v = f
      System.err.println(f"[stage] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      v
    }
    try {
      val dir = ScaleProbe.buildCorpus(spark, baseDir, k, outRoot)
      val p = s"$outRoot/dedupst"
      timed("landing (full corpus dedupAppend)") {
        graft.streaming.DedupStream.dedupAppend(spark,
          Tables.documents(spark, dir), p)
      }
      (1 to 3).foreach { rep =>
        val shift = 1000000000000L * rep
        val batch = Tables.documents(spark, dir)
          .orderBy(col("doc_id")).limit(500)
          .withColumn("doc_id", col("doc_id") + shift)
          .withColumn("text", concat(col("text"), lit(s" [b$shift]")))
          .localCheckpoint(true)
        System.err.println(s"--- rep $rep ---")
        val winners = timed("winners agg + pin") {
          batch.withColumn("digest", md5(col("text")))
            .groupBy(col("digest"))
            .agg(min(struct(col("doc_id"), col("text"), col("lang"),
              col("source"))).as("w"))
            .select(col("w.doc_id"), col("w.text"), col("w.lang"),
              col("w.source"), col("digest"))
            .localCheckpoint(true)
        }
        val idx = timed("readOrRebuild") {
          graft.streaming.LedgerIndex.readOrRebuild(spark, p,
            Some(spark.read.parquet(p).select(col("digest"))), "digest")
        }
        val fresh = timed("filterFresh + pin") {
          graft.streaming.LedgerIndex.filterFresh(winners, "digest",
            idx.get, spark.read.parquet(p).select(col("digest")))
            .localCheckpoint(true)
        }
        timed("isEmpty") { fresh.isEmpty }
        timed("mergeIncrement") {
          graft.streaming.LedgerIndex.mergeIncrement(spark, p,
            fresh.select(col("digest")), "digest", idx)
        }
        timed("append write") {
          fresh.write.mode("append").parquet(p)
        }
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(outRoot))
      spark.stop()
    }
  }
}
