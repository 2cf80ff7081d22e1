package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location (SURVEY §4: the counterpart of the
  * reference's secondary indexes for lookup joins).
  *
  * At 100 TB the dominant cost of lineitem⋈orders-shaped joins is
  * shuffling both fact tables on the join key. Writing both sides
  * bucketed by that key (same bucket count) lets Spark plan a
  * SortMergeJoin with NO Exchange on either side — the join runs
  * bucket-to-bucket. This is the storage-layout decision a 100 TB
  * deployment makes once at ingestion time; BucketingSpec asserts the
  * exchange-free plan.
  */
object Bucketing {

  /** Write df as a bucketed managed table (Parquet). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit = {
    df.write
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Co-located equi-join of two same-bucketed tables. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
