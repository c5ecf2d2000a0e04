package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.text.LangIdClassifier

/** The TRAINED language-ID classifier ([[LangIdClassifier]]) as a
  * CONTINUOUS ingest gate — the CCNet-style deployment: the multinomial
  * NB model trains ONCE batch-side, persists as two parquet tables
  * (`/priors`: classes rows, `/weights`: classes × vocab rows — the
  * [[LangIdClassifier.writeModel]] publishSwap lifecycle), and every
  * arriving shard scores under the published model as it lands.
  *
  * Two outputs per micro-batch, both replay-idempotent (each batch
  * overwrites its own `ingest_batch` partition — the [[DedupStream]]
  * contract):
  *
  *  - '''scores''' (`outDir/scores`): one row per arrival —
  *    (doc_id, lang, lang_pred, score), the exact
  *    [[LangIdClassifier.predictWith]] algebra with the labeled column
  *    carried through the same narrow projection (zero joins, zero
  *    shuffles beyond the shard write);
  *  - '''drift''' (`outDir/drift`): the per-batch labeled × predicted
  *    contingency table — [[LangIdClassifier.confusionWith]]'s algebra,
  *    so off-diagonal mass per shard IS the retrain signal a production
  *    crawl monitors (a delivery whose language mix shifts, or a model
  *    gone stale, shows up as rising off-diagonal counts batch by batch).
  *
  * The model is re-read per micro-batch inside `readRetry` (bounded
  * collects — classes + classes × vocab rows), so a batch-side retrain
  * republished through [[graft.sources.Sinks.publishSwap]] refreshes
  * serving mid-stream without a restart: the swap's two renames are the
  * only race window, and the retry survives it (pinned in
  * StreamingSpec, which republishes a different model between shards). */
object LangIdStream {

  /** Train on `docs` and persist under `dir` (priors + weights tables,
    * staged publish). Returns the trained model. */
  def buildModel(docs: DataFrame, dir: String, vocabSize: Int = 128,
                 trainMod: Int = 4): LangIdClassifier.LangIdModel = {
    val m = LangIdClassifier.train(docs, vocabSize, trainMod)
    LangIdClassifier.writeModel(m, dir, docs.sparkSession)
    m
  }

  /** Score one shard under a served model: (doc_id, lang, lang_pred,
    * score) — the batch predict path with the label carried through. */
  def scoreBatch(batch: DataFrame, model: LangIdClassifier.LangIdModel): DataFrame =
    LangIdClassifier.predictWith(batch, model, keep = Seq("lang"))
      .select(col("doc_id"), col("lang"), col("lang_pred"), col("score"))

  /** One shard's labeled × predicted contingency rows — the per-batch
    * drift report ([[LangIdClassifier.confusionWith]]'s algebra). */
  def driftBatch(batch: DataFrame, model: LangIdClassifier.LangIdModel): DataFrame =
    LangIdClassifier.confusionWith(batch, model)

  /** Start the gate over document shard drops ([[DedupStream]]'s
    * schema): per-arrival scores under `outDir/scores`, per-batch drift
    * tables under `outDir/drift`, both keyed by micro-batch. */
  def gate(stream: DataFrame, modelDir: String, outDir: String,
           checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // retry around the MODEL READ only (readModel's collects are the
        // publishSwap race surface); scoring itself never re-runs on a
        // transient-read budget — the QualityStream rationale
        val model = graft.sources.Sinks.readRetry() {
          LangIdClassifier.readModel(batch.sparkSession, modelDir)
        }
        def writeIdempotent(df: DataFrame, dir: String): Unit =
          df.withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(dir)
        // an EMPTY micro-batch (a trigger with no new files) writes no
        // parquet data files, so the drift read-back below would fail
        // schema inference on a first-batch-empty stream and kill the
        // query — both outputs are trivially empty, skip the batch
        if (!batch.isEmpty) {
          writeIdempotent(scoreBatch(batch, model), s"$outDir/scores")
          // drift derives from the scores partition JUST WRITTEN — the
          // shard never re-scores for its contingency table (driftBatch
          // from scratch would run the whole scoring projection twice per
          // micro-batch), and reading back the committed partition keeps
          // the two outputs consistent even across a replayed batch
          writeIdempotent(
            batch.sparkSession.read.parquet(s"$outDir/scores")
              .filter(col("ingest_batch") === batchId)
              .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n")),
            s"$outDir/drift")
        }
      }
      .start()

  /** The accumulated per-arrival score log (batch-query schema). */
  def scoreLog(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/scores").drop("ingest_batch")

  /** The accumulated per-batch drift log — `ingest_batch` KEPT here:
    * the monitor's whole point is the per-shard time axis. */
  def driftLog(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/drift")
}
