package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.dedup.Dedup

/** The dedup index ([[graft.dedup.Dedup.writeDedupIndex]]) maintained as a
  * CONTINUOUS ingestion job: document shards drop into a directory, each
  * micro-batch computes minhash signatures + shingle sets for ONLY the new
  * docs, and appends them to the persisted index tables — the old corpus is
  * never re-hashed, exactly the incremental contract the batch
  * `dedup_jaccard_incremental` query proves one step of. Serving is
  * unchanged: [[graft.dedup.Dedup.jaccardVerifyFromIndex]] over the live
  * parquet tables.
  *
  * Why `foreachBatch` with batch-local aggregation, not a streaming
  * groupBy: a document arrives WHOLE inside one shard, so its signature
  * only needs rows of its own micro-batch — per-entity-atomic ingest.
  * A streaming `groupBy(doc_id)` would instead accumulate every doc ever
  * seen as permanent store state (doc-count-unbounded, the wrong tool);
  * batch-local aggregation keeps state at zero and the shuffle inside the
  * micro-batch, which is vocabulary-of-the-shard-sized.
  *
  * Exactly-once without a transactional sink: both index tables are
  * partitioned by `ingest_batch` and written with DYNAMIC partition
  * overwrite, so a replayed micro-batch (failure between the two writes,
  * restart from checkpoint) overwrites its own partition instead of
  * appending duplicates — idempotent per batch, which together with the
  * file-source checkpoint gives end-to-end exactly-once. */
object DedupStream {

  /** documents.parquet shard schema (streaming sources need it declared). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming source over a directory of document parquet shard drops;
    * `maxFilesPerTrigger=1` makes one shard = one micro-batch in tests. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)

  /** Start the index-maintenance job writing under `indexDir` (the same
    * `minhash_sigs` / `shingle_sets` layout the batch index uses, plus the
    * idempotence partition column). */
  def ingest(stream: DataFrame, indexDir: String, checkpoint: String,
             k: Int = 3, numHashes: Int = 16): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, indexDir, batchId, k, numHashes)
      }
      .start()

  /** One micro-batch's index writes — REPLAY-IDEMPOTENT: each table write
    * lands in the batch's own `ingest_batch` partition under dynamic
    * partition overwrite, so running the same batchId twice replaces the
    * partition instead of appending duplicates (pinned in StreamingSpec). */
  def appendBatch(batch: DataFrame, indexDir: String, batchId: Long,
                  k: Int = 3, numHashes: Int = 16): Unit = {
    def appendIdempotent(df: DataFrame, table: String): Unit =
      df.withColumn("ingest_batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .parquet(s"$indexDir/$table")
    appendIdempotent(Dedup.minhashSignatures(batch, k, numHashes), "minhash_sigs")
    appendIdempotent(Dedup.shingleSets(batch, k), "shingle_sets")
  }

  /** The live index tables as DataFrames (ingest partition column dropped —
    * serve plans see the exact batch-index schema). */
  def sigs(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/minhash_sigs").drop("ingest_batch")
  def sets(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/shingle_sets").drop("ingest_batch")

  // ------------------------------------------------- winnow index ingest

  /** The winnow fingerprint index ([[graft.dedup.Dedup.writeWinnowIndex]])
    * under the same continuous-ingest contract: fingerprints are a pure
    * per-document function, so each micro-batch computes ONLY its own
    * shard's (doc_id, fp) rows and appends them replay-idempotently;
    * serving is [[graft.dedup.Dedup.winnowOverlapFrom]] over the live
    * table, and ingest-equals-rebuild is pinned in StreamingSpec (the
    * streaming deployment of the batch `dedup_winnow_incremental`
    * contract). */
  def ingestWinnow(stream: DataFrame, indexDir: String, checkpoint: String,
                   k: Int = 3, w: Int = 4): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendWinnowBatch(batch, indexDir, batchId, k, w)
      }
      .start()

  /** One micro-batch's winnow writes — replay-idempotent via the same
    * dynamic-partition-overwrite-on-`ingest_batch` scheme as
    * [[appendBatch]]. */
  def appendWinnowBatch(batch: DataFrame, indexDir: String, batchId: Long,
                        k: Int = 3, w: Int = 4): Unit =
    Dedup.winnowFingerprints(batch, k, w)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(s"$indexDir/winnow_fp")

  /** The live winnow fingerprint table (serve-schema view). */
  def winnowFp(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/winnow_fp").drop("ingest_batch")

  /** The substring-anchor index ([[graft.dedup.Dedup.writeSubstringIndex]])
    * under the same continuous-ingest contract: anchors are a pure
    * per-document function, so each micro-batch computes only its own
    * shard's (doc_id, pos, h) rows and appends them replay-idempotently;
    * serving is [[graft.dedup.Dedup.substringMatchesFrom]] over the live
    * table (the extension step reads document text from the caller's
    * corpus store, never from the index). Ingest-equals-rebuild pinned in
    * StreamingSpec — the streaming deployment of the batch
    * `dedup_substring_incremental` contract. */
  def ingestSubstring(stream: DataFrame, indexDir: String, checkpoint: String,
                      k: Int = 24, w: Int = 7): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendSubstringBatch(batch, indexDir, batchId, k, w)
      }
      .start()

  /** One micro-batch's anchor writes — replay-idempotent via the same
    * dynamic-partition-overwrite-on-`ingest_batch` scheme as
    * [[appendBatch]]. */
  def appendSubstringBatch(batch: DataFrame, indexDir: String, batchId: Long,
                           k: Int = 24, w: Int = 7): Unit =
    Dedup.substringAnchors(batch, k, w)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(s"$indexDir/substring_anchors")

  /** The live substring-anchor table (serve-schema view). */
  def substringAnchorsTable(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/substring_anchors").drop("ingest_batch")
}
