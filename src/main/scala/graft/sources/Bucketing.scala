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

  /** Compaction/layout planner — the write-side sizing pass a 100 TB
    * corpus store runs before (re)materializing a partition tree: per
    * partition key, the file count that lands each file nearest
    * `targetBytes` (the small-files problem is this number being wrong
    * in either direction: thousands of KB-files drown the scan in task
    * overhead and open-costs, one mega-file serializes the readers).
    * One bounded aggregation over the corpus — the plan is a few rows
    * per partition key, which the writer turns into
    * `repartition(n_files)` per partition before the write. Char counts
    * stand in for encoded bytes here; a deployment multiplies by its
    * measured encoding ratio. */
  def fileLayoutPlan(docs: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0)
    import org.apache.spark.sql.functions._
    docs.select(col("source"), length(col("text")).cast("long").as("b"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("b")).as("total_chars"))
      .withColumn("n_files",
        greatest(lit(1L), ceil(col("total_chars").cast("double") / targetBytes)))
      .withColumn("docs_per_file",
        ceil(col("n_docs").cast("double") / col("n_files")))
      .select("source", "n_docs", "total_chars", "n_files", "docs_per_file")
  }
}
