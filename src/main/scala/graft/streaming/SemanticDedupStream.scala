package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.dedup.Dedup

/** The SemDeDup ingest GATE deployed continuously — the
  * [[MultimodalDedupStream]] pattern for the embedding modality: the
  * index ([[Dedup.writeSemanticGateIndex]] — trained centroids + kept
  * representatives with their cell assignments) is built once and
  * published staged, and every arriving embedding shard assigns to its
  * cell (narrow literal-centroid map), joins ONLY that cell's kept
  * representatives, and flags semantic near-duplicate arrivals with
  * their best kept match before they enter the corpus.
  *
  * The centroid model is tiny (nClusters rows) and re-read + collected
  * per micro-batch — a publishSwap retrain is picked up by the next
  * batch, the [[QualityStream]] one-row-model contract — while the kept
  * table joins as a DataFrame directory re-read (the [[DeconStream]]
  * contract). Per-batch atomic via foreachBatch; replayed batches
  * overwrite their own `ingest_batch` partition. */
object SemanticDedupStream {

  /** embeddings.parquet shard schema (streaming sources need it declared). */
  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Streaming source over a directory of embedding parquet shard drops. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)

  /** One micro-batch of the gate — THE SAME algebra as the batch
    * registry query (`dedup_semantic_stream_gate`), so stream and batch
    * cannot drift. */
  def gateBatch(batch: DataFrame, kept: DataFrame,
                cents: Seq[(Int, Array[Double])], minCos: Double = 0.4): DataFrame =
    Dedup.semanticMatchesAgainst(batch, kept, cents, minCos)

  /** Start the gate over the persisted index at `indexDir`
    * (`.../centroids` + `.../kept`): flagged arrivals append
    * (idempotently) under `outDir`; clean arrivals produce no row. */
  def gate(stream: DataFrame, indexDir: String, outDir: String,
           checkpoint: String, minCos: Double = 0.4): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.Sinks.readRetry(attempts = 2) {
          val s = batch.sparkSession
          val cents = graft.similarity.Ann.readIvfModel(s, s"$indexDir/centroids")
          gateBatch(batch, s.read.parquet(s"$indexDir/kept"), cents, minCos)
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(outDir)
        }
      }
      .start()

  /** The accumulated gate reports (partition column dropped). */
  def flagged(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("ingest_batch")
}
