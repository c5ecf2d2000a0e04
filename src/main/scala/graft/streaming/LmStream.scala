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
  * falls below `minLp` — OR when the fraction of their bigrams the
  * model has seen falls below `minCoverage` (the KN average runs over
  * SEEN bigrams only, so coverage is the signal that catches garbage
  * carrying one fluent-looking seen bigram among hundreds of unseen
  * ones; zero coverage — no seen bigrams at all — is the worst case
  * and always flags, since the score itself comes back NULL).
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
    * silently dropping out of the scored set.
    *
    * The KN score averages over model-SEEN bigrams only, so a garbage
    * document with ONE seen bigram among hundreds would read as a
    * fluent 1-bigram text — the gate therefore also computes
    * `coverage` = seen / total bigrams (the total is a row-local token
    * count, no extra pass) and flags anything under `minCoverage`:
    * wrong-language and encoding-garbage text lands at low coverage
    * long before its seen-bigram average looks bad. */
  def scoreBatch(batch: DataFrame, modelDir: String, minLp: Double,
                 discount: Double = 0.75,
                 minCoverage: Double = 0.5): DataFrame =
    batch.select(col("doc_id"), col("lang"),
        greatest(size(graft.ops.Normalize.tokensCol(col("text"))) - 1, lit(0))
          .cast("long").as("n_total_bigrams"))
      .join(TextAnalysis.lmScoreKnWith(batch, modelDir, discount),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        col("n_total_bigrams"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logprob"),
        round(when(col("n_total_bigrams") > 0,
          coalesce(col("n_bigrams"), lit(0L)).cast("double") / col("n_total_bigrams"))
          .otherwise(lit(0.0)), 6).as("coverage"))
      .withColumn("low_fluency",
        col("avg_logprob").isNull || col("avg_logprob") < minLp ||
        col("coverage") < minCoverage)

  /** Start the gate: every shard dropped under the watched source is
    * scored and logged under `outDir`, keyed by micro-batch id. */
  def monitor(stream: DataFrame, modelDir: String, outDir: String,
              checkpoint: String, minLp: Double,
              discount: Double = 0.75,
              minCoverage: Double = 0.5): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // attempts = 2: the retry wraps the ENTIRE per-batch score+write, so
        // it exists only to survive the publisher's two-rename swap window
        // — a deterministic batch failure (corrupt shard, schema drift)
        // must not re-run the heavy scoring job five times. Matches the
        // DiffStream/DeconStream discipline for the same table-model shape.
        graft.sources.Sinks.readRetry(attempts = 2) {
          scoreBatch(batch, modelDir, minLp, discount, minCoverage)
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
