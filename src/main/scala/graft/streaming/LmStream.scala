package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.text.TextAnalysis

/** The Kneser-Ney LM ([[graft.text.TextAnalysis.lmScoreKn]]) as a
  * CONTINUOUS perplexity ingest gate — the CCNet deployment end to end:
  * the LM trains ONCE batch-side on a reference corpus and persists as
  * the bigram-type table ([[TextAnalysis.writeKnModel]], staged
  * publish), and every incoming shard's documents score against it as
  * they land. Documents are flagged when their mean bigram log-prob
  * falls below `minLp` — OR when NONE of their bigrams exist in the
  * model (zero coverage: the inner scoring join yields no rows, which
  * is the score a fluency filter must treat as worst-case, not
  * missing-at-random; encoding garbage and wrong-language text land
  * here).
  *
  * Model lifecycle nuance vs [[QualityStream]]/[[TokenizerStream]]:
  * this model is a TABLE joined distributively, not a bounded
  * driver-side collect, so the `readRetry` budget wraps the whole
  * per-batch score+write instead of an eager model read — safe because
  * the `foreachBatch` + dynamic-partition-overwrite write is
  * replay-idempotent per `ingest_batch` (a retried batch overwrites
  * its own partition). */
object LmStream {

  /** Train on `docs` and persist the bigram-type model under `dir`. */
  def buildModel(docs: DataFrame, dir: String): Unit =
    TextAnalysis.writeKnModel(docs, dir)

  /** Score one shard against a persisted model and attach the gate
    * column — the batch serve algebra
    * ([[TextAnalysis.lmScoreKnWith]]) left-joined back onto the shard
    * so zero-coverage documents surface with a flag instead of
    * silently dropping out of the scored set. */
  def scoreBatch(batch: DataFrame, modelDir: String, minLp: Double,
                 discount: Double = 0.75): DataFrame =
    batch.select(col("doc_id"), col("lang"))
      .join(TextAnalysis.lmScoreKnWith(batch, modelDir, discount),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logprob"),
        (col("avg_logprob").isNull || col("avg_logprob") < minLp)
          .as("low_fluency"))

  /** Start the gate: every shard dropped under the watched source is
    * scored and logged under `outDir`, keyed by micro-batch id. */
  def monitor(stream: DataFrame, modelDir: String, outDir: String,
              checkpoint: String, minLp: Double,
              discount: Double = 0.75): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.Sinks.readRetry() {
          scoreBatch(batch, modelDir, minLp, discount)
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(outDir)
        }
      }
      .start()

  /** The accumulated per-shard score log. */
  def scoreLog(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
