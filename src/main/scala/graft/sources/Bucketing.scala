package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables — the storage-level half of the shuffle story.
  * A fact table bucketed (and sorted) by its join/aggregation key is
  * co-located on disk: every subsequent join or aggregation on that key
  * reads the buckets directly and skips the exchange entirely. At 100 TB
  * this converts the single biggest recurring cost of a star-schema
  * pipeline (re-shuffling the fact table for every query) into a one-time
  * write-side cost — the same trade the reference's fixed
  * hash-partitioned intermediate files make, expressed through Spark's
  * bucketing metadata so Catalyst proves the partitioning instead of the
  * pipeline author asserting it.
  */
object Bucketing {

  /** Write `df` as a parquet managed table bucketed and sorted by `key`.
    * Bucket count should approximate (table size / target partition
    * size) at the deployment scale. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Equi-join two tables bucketed on `key`: with matching bucket counts
    * Catalyst plans a SortMergeJoin with NO Exchange on either side
    * (asserted in BucketingSpec). */
  def joinBucketed(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
