package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables

/** Structured Streaming variant of the incremental pipeline (SURVEY §2.8).
  *
  * The reference processes micro-batches against a watermark table
  * (update_donations.py:37-65); the streaming formulation replaces the
  * hand-rolled watermark with `withWatermark` + event-time windows and
  * the checkpoint with Spark's offset tracking. The batch and streaming
  * flavors share the same aggregation so results are comparable
  * (asserted in EventsStreamSpec).
  */
object EventsStream {

  /** Tumbling 1-hour event-time aggregate — batch flavor. Window start
    * is epoch-aligned, so it equals date_trunc('hour', ts) and stays
    * oracle-checkable. */
  def windowedCountsBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("total_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** The same aggregate as a streaming query over the events parquet,
    * 10-minute watermark, complete-mode memory sink (bounded: one row
    * per hour×type). Synchronous for tests: processAllAvailable drains
    * the source, then the in-memory table is returned. */
  def windowedCountsStreaming(spark: SparkSession, dir: String, queryName: String = "events_stream"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // FileStreamSource wants a directory: stream the sf dir, globbed to
    // the events table file.
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "10 minutes")
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("total_value"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName).orderBy(col("hour_start"), col("event_type"))
  }
}
