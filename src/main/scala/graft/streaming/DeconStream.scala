package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** [[graft.dedup.Dedup.decontaminateSubstring]] as a CONTINUOUS ingest
  * gate — the deployment shape of exact-substring decontamination: the
  * benchmark side is anchored ONCE ([[Dedup.substringAnchors]], persisted
  * as parquet alongside the benchmark corpus), and every incoming
  * document shard is checked against it as it lands, so a verbatim
  * benchmark leak is flagged before the document enters the corpus.
  *
  * Same stream-STATIC join pattern as [[NoveltyStream]]: the static side
  * is a plain DIRECTORY re-read (fresh file listing) per micro-batch —
  * no watermark, no join state — and a benchmark refresh is an atomic
  * swap of the parquet directory
  * ([[graft.sources.Sinks.publishSwap]]). A document arrives
  * WHOLE inside one shard, so the report is per-batch-atomic via
  * `foreachBatch`; replayed batches overwrite their own `ingest_batch`
  * partition (the [[DedupStream]] idempotence contract).
  *
  * Geometry contract: `minLen`/`k`/`w` must match the persisted
  * benchmark anchors' build — the serve path re-checks coverage but
  * cannot see what geometry built the anchor table. */
object DeconStream {

  /** One micro-batch's report — THE SAME algebra as the batch serve path
    * ([[Dedup.decontaminateSubstringAgainst]]), so stream and batch
    * cannot drift. */
  def gateBatch(batch: DataFrame, benchAnchors: DataFrame, benchDocs: DataFrame,
                minLen: Int = 30, k: Int = 24, w: Int = 7): DataFrame =
    Dedup.decontaminateSubstringAgainst(batch, benchAnchors, benchDocs, minLen, k, w)

  /** Start the gate: document shards dropped under the
    * [[DedupStream.readStream]] source are checked against the static
    * benchmark anchors and the per-doc contamination reports append
    * (idempotently) under `outDir`. Clean documents produce no row —
    * the downstream corpus writer anti-joins this table.
    *
    * The benchmark sides come in as DIRECTORIES, re-read inside every
    * micro-batch: a DataFrame captured at start() would pin its file
    * listing, so the first batch after a publishSwap benchmark refresh
    * would scan deleted files and kill the query. The anchor table is
    * benchmark-sized (not collectable like a one-row model) and a swap
    * can bite at action time, so the whole idempotent batch is the
    * retry unit, with attempts = 2 — one retry covers the microsecond
    * rename window without re-running real failures four times. */
  def gate(stream: DataFrame, benchAnchorsDir: String, benchDocsDir: String,
           outDir: String, checkpoint: String,
           minLen: Int = 30, k: Int = 24, w: Int = 7): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.Sinks.readRetry(attempts = 2) {
          val s = batch.sparkSession
          gateBatch(batch, s.read.parquet(benchAnchorsDir),
              s.read.parquet(benchDocsDir), minLen, k, w)
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(outDir)
        }
      }
      .start()

  /** The accumulated contamination table (partition column dropped —
    * consumers see the exact batch-query schema). */
  def flagged(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("ingest_batch")
}
