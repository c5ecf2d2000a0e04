package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.text.TextAnalysis

/** The unigram tokenizer ([[graft.text.TextAnalysis.tokenizeUnigram]]) as
  * a CONTINUOUS ingest monitor — the deployment shape of a
  * tokenizer-health gate: the piece model is trained ONCE batch-side and
  * persisted ([[TextAnalysis.writeUnigramModel]], staged publish), and
  * every incoming shard's documents are Viterbi-tokenized as they land.
  * Documents whose pieces_per_word blows past `maxPpw` are flagged:
  * text the trained tokenizer cannot segment into learned pieces
  * (encoding garbage, binary spill, wrong-script content) explodes
  * toward one piece per CODEPOINT, and catching it at ingest is cheaper
  * than discovering it as a training-time token-count anomaly.
  *
  * Same stream-static lifecycle as [[QualityStream]]: the model is
  * re-read per micro-batch inside `readRetry` (a concurrent republish is
  * survived), ships as a plan-side reference object in the compiled DP
  * expression — identical algebra to the batch serve path — and the
  * `foreachBatch` + dynamic-partition-overwrite write is
  * replay-idempotent per `ingest_batch`. */
object TokenizerStream {

  /** Train on `docs` and persist the piece model under `dir`. */
  def buildModel(docs: DataFrame, dir: String, vocabSize: Int = 160,
                 maxPieceLen: Int = 4): Unit =
    TextAnalysis.writeUnigramModel(docs, dir, vocabSize, maxPieceLen)

  /** Tokenize one shard against a piece model and flag the unsegmentable
    * tail — the same [[TextAnalysis.tokenizeUnigramWith]] algebra with
    * the gate column attached. */
  def tokenizeBatch(batch: DataFrame, model: Seq[(String, Long)],
                    maxPpw: Double, maxPieceLen: Int = 4): DataFrame =
    TextAnalysis.tokenizeUnigramWith(batch, model, maxPieceLen)
      .withColumn("gibberish", col("pieces_per_word") > maxPpw)

  /** Start the monitor: every shard dropped under the watched source is
    * tokenized and logged under `outDir`, keyed by micro-batch id. */
  def monitor(stream: DataFrame, modelDir: String, outDir: String,
              checkpoint: String, maxPpw: Double = 3.0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // readRetry around the bounded MODEL read only (the QualityStream
        // discipline): the tokenize job itself never re-runs on a
        // transient-read budget
        val model = graft.sources.Sinks.readRetry() {
          TextAnalysis.readUnigramModel(batch.sparkSession, modelDir)
        }
        tokenizeBatch(batch, model, maxPpw)
          .withColumn("ingest_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch")
          .parquet(outDir)
      }
      .start()

  /** The accumulated per-shard token log. */
  def tokenLog(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
