package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.text.QualityClassifier

/** [[graft.text.QualityClassifier]] as a CONTINUOUS ingest gate — the
  * deployment shape of a learned quality filter: the model is trained
  * ONCE batch-side (on a curated sample) and persisted as a one-row
  * parquet weight table, and every incoming document shard is scored as
  * it lands — the "keep or quarantine" decision that runs before a
  * low-quality delivery enters the corpus.
  *
  * Same stream-STATIC shape as [[DriftStream]] (the static model side is
  * re-read per micro-batch, so a retrain refreshes serving without a
  * restart via [[graft.sources.Sinks.publishSwap]] — the new weight row
  * materializes fully in a staging directory and replaces the serving
  * path as two renames, so a racing reader can hit only a microsecond
  * rename window, never a half-written model — and the per-batch read is
  * wrapped in `readRetry` so even that window is survived), and the same
  * `foreachBatch` + dynamic-partition-overwrite replay idempotence: a
  * checkpoint-replayed batch overwrites its own `ingest_batch`
  * partition.
  *
  * The model is ONE row of |features| doubles, attached by
  * `crossJoin(broadcast(...))` — scoring stays a shuffle-free map over
  * the shard, identical algebra to the batch
  * [[QualityClassifier.scoreWith]] path (the weights ride as data columns
  * instead of plan literals; the left-associated dot order is the same). */
object QualityStream {

  /** Train on `docs` and persist the weight row under `dir`. */
  def buildModel(docs: DataFrame, dir: String,
                 iters: Int = 8, ridge: Double = 1e-3): Seq[Double] = {
    val feats = QualityClassifier.features(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = QualityClassifier.train(feats, iters, ridge)
    feats.unpersist()
    val spark = docs.sparkSession
    import spark.implicits._
    graft.sources.Sinks.publishSwap(dir) { staging =>
      Seq((w(0), w(1), w(2), w(3), w(4))).toDF("w0", "w1", "w2", "w3", "w4")
        .coalesce(1).write.mode("overwrite").parquet(staging)
    }
    w
  }

  def readModel(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Score one shard against the weight row: (doc_id, label, score, pred)
    * — the same round-6 sigmoid + threshold-on-rounded algebra as
    * [[QualityClassifier.scoreWith]]. */
  def scoreBatch(batch: DataFrame, model: DataFrame): DataFrame = {
    val z: Column = col("w0") + col("w1") * col("pr") + col("w2") * col("sr") +
      col("w3") * col("ttr") + col("w4") * col("lt")
    QualityClassifier.features(batch)
      .crossJoin(broadcast(model))
      .select(col("doc_id"), col("label"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("score"))
      .withColumn("pred", when(col("score") >= 0.5, 1L).otherwise(0L))
  }

  /** Start the gate: every shard dropped under the watched source is
    * scored and logged under `outDir`, keyed by micro-batch id. */
  def gate(stream: DataFrame, modelDir: String, outDir: String,
           checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // readRetry around the MODEL READ ONLY, with the one-row model
        // collected eagerly inside it: the retry then covers both points
        // a concurrent publishSwap can bite (listing during the rename
        // window AND a post-swap scan of delisted files), while the
        // scoring job itself — which can fail for real, deterministic
        // reasons — never re-runs on a transient-read budget.
        val model = graft.sources.Sinks.readRetry() {
          val df = readModel(batch.sparkSession, modelDir)
          val rows = df.collect()
          batch.sparkSession.createDataFrame(
            java.util.Arrays.asList(rows: _*), df.schema)
        }
        scoreBatch(batch, model)
          .withColumn("ingest_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch")
          .parquet(outDir)
      }
      .start()

  /** The accumulated per-shard score log. */
  def scoreLog(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
