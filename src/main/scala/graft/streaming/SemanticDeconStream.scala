package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.Dedup

/** SEMANTIC decontamination as a CONTINUOUS ingest gate — the
  * [[DeconStream]] deployment for the embedding modality, completing
  * the decon family's stream symmetry (lexical substring decon gates in
  * [[DeconStream]]; the paraphrase leak it cannot see gates here): the
  * benchmark index is built ONCE
  * ([[Dedup.writeSemanticDeconIndex]] — centroids trained on the
  * benchmark side + its cell-assigned vectors) and every arriving
  * embedding shard assigns to cells as a narrow literal-centroid map
  * and joins ONLY its cell's benchmark vectors, flagging each
  * semantically contaminated arrival with its best benchmark match
  * before it enters the corpus. The batch registry twin is
  * `decontaminate_semantic_indexed` — the SAME
  * [[Dedup.semanticDeconMatches]] algebra over the same persisted
  * index, so stream and batch cannot drift.
  *
  * The centroid model is tiny and re-read per micro-batch (a
  * publishSwap benchmark refresh is picked up by the next batch — the
  * [[QualityStream]] one-row-model contract); the assigned benchmark
  * table joins as a directory re-read (the [[DeconStream]] contract).
  * Per-batch atomic via foreachBatch; replayed batches overwrite their
  * own `ingest_batch` partition. */
object SemanticDeconStream {

  /** One micro-batch of the gate. Clean arrivals produce no row; the
    * downstream corpus writer anti-joins this table. */
  def gateBatch(batch: DataFrame, benchAssigned: DataFrame,
                cents: Seq[(Int, Array[Double])], minCos: Double = 0.4): DataFrame =
    Dedup.semanticDeconMatches(batch, benchAssigned, cents, minCos)

  /** Start the gate over the persisted benchmark index at `indexDir`
    * (`.../centroids` + `.../bench`): flagged arrivals append
    * (idempotently) under `outDir` as (vec_id, match_id, cos). */
  def gate(stream: DataFrame, indexDir: String, outDir: String,
           checkpoint: String, minCos: Double = 0.4): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.Sinks.readRetry(attempts = 2) {
          val s = batch.sparkSession
          val cents = graft.similarity.Ann.readIvfModel(s, s"$indexDir/centroids")
          gateBatch(batch, s.read.parquet(s"$indexDir/bench"), cents, minCos)
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(outDir)
        }
      }
      .start()

  /** The accumulated contamination table (partition column dropped). */
  def flagged(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("ingest_batch")
}
