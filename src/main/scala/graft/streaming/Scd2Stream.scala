package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.Tables
import graft.operators.Scd2

/** Streaming SCD2 maintenance — the dimension stays continuously
  * current as update events land, instead of being rebuilt per
  * release. Each micro-batch's `click` updates are applied through
  * [[Scd2.applyUpdates]] (seeded by the open versions, closed history
  * untouched), and the resulting dimension lands copy-on-write as
  * `v_<batchId>` with a commit marker dropped only after the write
  * completes — ChangelogStream's protocol verbatim: a crash leaves
  * either no new version (replay rewrites it) or an unmarked one
  * (ignored and rewritten), never a half-applied dimension; marked
  * batchIds are skipped so checkpoint replays are idempotent.
  *
  * Ordering contract (inherited from applyUpdates): update files land
  * in per-user event-time order — the natural property of a
  * time-partitioned feed. Late data needs the changelog-replica path.
  *
  * Scale: per batch, |open versions| + |batch updates| shuffle once on
  * user_id. Closed versions are rewritten per landing here (local
  * fixture scale); production splits the closed partition out and
  * appends, the MergeOps partition-scoped discipline. */
object Scd2Stream {

  private val DimSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("version", IntegerType),
    StructField("k", IntegerType),
    StructField("valid_from", TimestampType),
    StructField("valid_to", TimestampType)))

  def scd2MaintenanceStreaming(spark: SparkSession, srcDir: String,
      stateDir: String, maxFilesPerTrigger: Int = 1): DataFrame = {
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def marker(id: Long) = new org.apache.hadoop.fs.Path(statePath, s"_committed_$id")
    def committed(): Seq[Long] = {
      val statuses =
        try fs.listStatus(statePath)
        catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] }
      statuses.map(_.getPath.getName).collect {
        case n if n.startsWith("_committed_") => n.stripPrefix("_committed_").toLong
      }.toSeq.sorted
    }
    def writeMarker(id: Long): Unit = fs.create(marker(id), false).close()
    def versionPath(id: Long) = s"$stateDir/v_$id"

    // v_-1: the empty dimension, committed before the stream runs
    if (committed().isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], DimSchema)
        .write.mode("overwrite").parquet(versionPath(-1L))
      writeMarker(-1L)
    }

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)

    val q = stream.writeStream
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!committed().contains(batchId)) {
          val cur = spark.read.schema(DimSchema).parquet(versionPath(committed().last))
          val upd = Scd2.updates(Tables.normalizeEventTs(batch))
          val next = Scd2.applyUpdates(cur, upd)
          next.write.mode("overwrite").parquet(versionPath(batchId))
          writeMarker(batchId)
          // GC old versions marker-last (ChangelogStream's rule)
          committed().dropRight(2).foreach { old =>
            fs.delete(new org.apache.hadoop.fs.Path(versionPath(old)), true)
            if (!fs.delete(marker(old), false))
              System.err.println(s"[scd2-stream] WARNING: stale marker _committed_$old not deleted")
          }
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.schema(DimSchema).parquet(versionPath(committed().last))
      .orderBy(col("user_id"), col("version"))
  }
}
