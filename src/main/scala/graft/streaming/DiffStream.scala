package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** [[graft.pipelines.CorpusDiff]] as CONTINUOUS ingest — the deployment
  * shape of an incrementally refreshed corpus: the previous snapshot is
  * digested ONCE into a build-once (doc_id, h_prev) parquet table, and
  * every arriving shard of the NEW snapshot diffs against it as it lands,
  * emitting its `added` / `changed` rows (a shard can't witness
  * `removed` — absence is only defined over the complete new snapshot, so
  * removal detection stays with the batch [[graft.pipelines.CorpusDiff
  * .diff]]; this monitor is the per-delivery delta feed the incremental
  * index ingest paths consume).
  *
  * Same stream-STATIC shape as [[DriftStream]]/[[QualityStream]] (static
  * side re-read per micro-batch; a rebase republishes via the staged
  * two-rename swap of [[graft.sources.Sinks.publishSwap]], and the
  * per-batch read retries across the rename window) and the
  * same `foreachBatch` + dynamic-partition-overwrite replay idempotence.
  * The static side is digest-projected at build time, so the per-batch
  * join ships 32-byte hashes — never old document bodies. */
object DiffStream {

  /** Digest the previous snapshot under `dir`: (doc_id, h_prev). */
  def buildBase(prev: DataFrame, dir: String): Unit =
    graft.sources.Sinks.publishSwap(dir) { staging =>
      prev.select(col("doc_id"), md5(col("text")).as("h_prev"))
        .write.mode("overwrite").parquet(staging)
    }

  def readBase(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** One shard's delta vs the base digests: (doc_id, status) with status
    * in {added, changed}; unchanged rows drop. */
  def deltaBatch(batch: DataFrame, base: DataFrame): DataFrame =
    batch.select(col("doc_id"), md5(col("text")).as("h_cur"))
      .join(base, Seq("doc_id"), "left")
      .withColumn("status",
        when(col("h_prev").isNull, "added")
          .when(col("h_prev") =!= col("h_cur"), "changed"))
      .filter(col("status").isNotNull)
      .select("doc_id", "status")

  /** Start the monitor: every shard dropped under the watched source
    * logs its delta rows under `outDir`, keyed by micro-batch id. */
  def monitor(stream: DataFrame, baseDir: String, outDir: String,
              checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // readRetry: survive the two-rename window of a concurrent
        // publishSwap rebase (batch write is dynamic-overwrite idempotent).
        // The base digest table is corpus-sized — it cannot be collected
        // eagerly like QualityStream's one-row model, and a swap can bite
        // at ACTION time (delisted files), so the whole idempotent batch
        // is the retry unit — but with attempts = 2: the rename window is
        // microseconds, one retry covers it, and a deterministic batch
        // failure (corrupt shard, schema drift) costs one extra run
        // instead of four.
        graft.sources.Sinks.readRetry(attempts = 2) {
          deltaBatch(batch, readBase(batch.sparkSession, baseDir))
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(outDir)
        }
      }
      .start()

  /** The accumulated per-shard delta log. */
  def deltaLog(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
