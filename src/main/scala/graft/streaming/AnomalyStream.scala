package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.events.Events

/** [[graft.events.Events.hourlyAnomaly]] as a CONTINUOUS volume monitor —
  * the third leg of the streaming monitoring trio ([[DriftStream]] watches
  * the value distribution, [[NoveltyStream]] watches content novelty, this
  * watches event VOLUME): every arriving event shard folds into a running
  * hourly count log, and the whole gap-filled series re-scores after each
  * delivery, so a delivery that spikes (or silences) an hour alarms as it
  * lands.
  *
  * State shape: the running log is the (hour, event_type, cnt, sum_value)
  * grid — metadata-sized regardless of event volume (the
  * [[CmsStream]] fixed-state property: hours × types, not events) — kept
  * as a parquet table re-aggregated per batch via dynamic partition
  * overwrite keyed by ingest batch: a checkpoint-replayed batch overwrites
  * its own partition, so counts never double (the replay-idempotence
  * contract every foreachBatch deployment here shares). Scoring re-runs
  * the BATCH operator over the folded grid — stream-equals-batch by
  * construction, pinned in StreamingSpec. */
object AnomalyStream {

  /** One shard's hourly partial counts. */
  private def partial(batch: DataFrame): DataFrame =
    Events.hourlyByType(batch)

  /** Start the monitor: each shard appends its hourly partials under
    * `logDir` (partitioned by ingest batch, replay-idempotent) and writes
    * the re-scored anomaly table for the full folded series under
    * `scoreDir`. */
  def monitor(stream: DataFrame, logDir: String, scoreDir: String,
              checkpoint: String, window: Int = 24, minHist: Int = 12,
              zThreshold: Double = 3.0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        partial(batch)
          .withColumn("ingest_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch")
          .parquet(logDir)
        val spark = batch.sparkSession
        scoreFolded(spark, logDir, window, minHist, zThreshold)
          .write.mode("overwrite").parquet(scoreDir)
      }
      .start()

  /** Fold the per-batch hourly partials (sums add — exactly mergeable)
    * and score the gap-filled series with the batch operator's algebra.
    * The fold output feeds [[Events.hourlyAnomaly]]'s internal chain via
    * a synthetic event-free path: we reconstruct the hourly table and
    * reuse the same windowed scoring by calling the batch operator on a
    * table already shaped like its intermediate. */
  def scoreFolded(spark: SparkSession, logDir: String, window: Int = 24,
                  minHist: Int = 12, zThreshold: Double = 3.0): DataFrame = {
    val folded = spark.read.parquet(logDir)
      .groupBy("hour", "event_type")
      .agg(sum(col("cnt")).as("cnt"),
        round(sum(col("sum_value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"))
    Events.hourlyAnomalyFromHourly(folded, window, minHist, zThreshold)
  }

  /** The latest anomaly table. */
  def scores(spark: SparkSession, scoreDir: String): DataFrame =
    spark.read.parquet(scoreDir)
}
