package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.dedup.Dedup

/** [[graft.dedup.Dedup.noveltyScores]] as a CONTINUOUS triage job — the
  * deployment shape of novelty scoring: the reference shingle table is
  * built once from the trusted corpus ([[Dedup.referenceShingles]],
  * persisted as parquet), and every incoming document shard is scored
  * against it as it lands, so low-novelty re-crawls are flagged before
  * they enter the expensive dedup/curation stages.
  *
  * This is the stream-STATIC join pattern (vs [[EventsStream]]'s
  * stream-stream interval join): the static side is a plain table the
  * engine re-reads per micro-batch — no watermark, no join state to
  * bound, and a reference refresh is just an atomic swap of the parquet
  * directory. Like [[DedupStream]], a document arrives WHOLE inside one
  * shard, so scoring is per-batch-atomic via `foreachBatch` — a
  * streaming `groupBy(doc_id)` would hold every doc ever seen as
  * permanent store state for no benefit.
  *
  * Replay idempotence: scores land in the micro-batch's own
  * `ingest_batch` partition under dynamic partition overwrite, so a
  * checkpoint-replayed batch overwrites itself instead of appending
  * duplicate score rows — the exact contract [[DedupStream]] pins. */
object NoveltyStream {

  /** One micro-batch's scores — THE SAME algebra as the batch query
    * ([[Dedup.noveltyAgainst]]), so stream and batch cannot drift. */
  def scoreBatch(batch: DataFrame, refShingles: DataFrame, k: Int = 3): DataFrame =
    Dedup.noveltyAgainst(batch, refShingles, k)

  /** Start the triage job: document shards dropped under the
    * [[DedupStream.readStream]] source are scored against the static
    * `refShingles` table and appended (idempotently) under `outDir`. */
  def triage(stream: DataFrame, refShingles: DataFrame, outDir: String,
             checkpoint: String, k: Int = 3): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scoreBatch(batch, refShingles, k)
          .withColumn("ingest_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch")
          .parquet(outDir)
      }
      .start()

  /** The accumulated score table (partition column dropped — consumers
    * see the exact batch-query schema). */
  def scores(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("ingest_batch")
}
