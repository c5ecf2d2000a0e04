package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.similarity.Pca

/** [[graft.similarity.Pca.driftEmbeddingPca]] as a CONTINUOUS ingest
  * monitor — the embedding leg beside [[DriftStream]]'s scalar one: the
  * trusted corpus trains the PCA model ONCE (persisted via
  * [[Pca.writePcaModel]]) and fixes per-component quantile edges and
  * reference bin proportions (this object's [[buildReference]], staged
  * publish), and every incoming shard projects onto the same axes and
  * scores one PSI row PER COMPONENT against that static reference as it
  * lands. A new encoder version or a shifted content mix moves the
  * high-variance axes first — this catches it at delivery time, before
  * the drifted vectors poison ANN indexes and semantic-dedup cells.
  *
  * Same stream-static discipline as [[DriftStream]]: reference tables
  * are metadata-sized (k edge rows, k·nBins proportion rows) and re-read
  * per micro-batch inside `readRetry` (a concurrent republish is
  * survived), the bin universe is the FULL 0..nBins-1 grid — including
  * reference bins with zero mass, which tied quantile edges can
  * produce — so batch-missing bins clamp pq to eps and
  * reference-missing bins clamp pr to eps: both penalize instead of
  * silently dropping mass on either side, and the
  * `foreachBatch` + dynamic-partition-overwrite write is
  * replay-idempotent per `ingest_batch`. */
object EmbDriftStream {

  /** Build the static reference under `dir` (staged publish):
    * `dir/edges` (pc → round-6 quantile edge array) and `dir/bins`
    * (pc, bin → reference proportion), both from one projection pass
    * of the trusted corpus. */
  def buildReference(emb: DataFrame, model: Seq[Pca.Component], dir: String,
                     nBins: Int = 10): Unit = {
    require(nBins >= 2 && nBins <= 1000, s"nBins out of [2, 1000]: $nBins")
    val qs = (1 until nBins).map(i => i.toDouble / nBins).mkString(", ")
    graft.sources.Sinks.publishSwap(dir) { staging =>
      val lng = Pca.pcaLong(emb, model)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edgesDf = lng.groupBy("pc")
        .agg(expr(s"transform(percentile(x, array($qs)), v -> round(v, 6))").as("le"))
      edgesDf.coalesce(1).write.mode("overwrite").parquet(s"$staging/edges")
      val binned = lng.join(broadcast(edgesDf), Seq("pc"))
        .select(col("pc"), size(expr("filter(le, v -> x > v)")).cast("long").as("bin"))
        .groupBy("pc", "bin").agg(count(lit(1L)).as("rn"))
      // write the FULL 0..nBins-1 grid, not just occupied bins: tied
      // quantile edges can leave reference bins empty, and a drifted
      // shard landing in such a bin must still be representable —
      // pr = 0 there, clamped to eps at score time like pq
      val grid = edgesDf.select(col("pc"),
        explode(sequence(lit(0L), lit((nBins - 1).toLong))).as("bin"))
      grid.join(binned, Seq("pc", "bin"), "left")
        .join(broadcast(binned.groupBy("pc").agg(sum("rn").as("rt"))), Seq("pc"))
        .select(col("pc"), col("bin"),
          (coalesce(col("rn"), lit(0L)) / col("rt")).as("pr"))
        .coalesce(1).write.mode("overwrite").parquet(s"$staging/bins")
      lng.unpersist()
    }
  }

  def edges(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/edges")

  def refBins(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/bins")

  /** One micro-batch's per-component PSI against the static reference —
    * k rows of (pc, n_rows, psi). Identical ε-clamp, reference-grid, and
    * DECIMAL term-accumulation semantics as the batch operator. */
  def psiBatch(batch: DataFrame, model: Seq[Pca.Component], edgesDf: DataFrame,
               bins: DataFrame, eps: Double = 1e-4): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val binned = Pca.pcaLong(batch, model)
      .join(broadcast(edgesDf), Seq("pc"))
      .select(col("pc"), size(expr("filter(le, v -> x > v)")).cast("long").as("bin"))
      .groupBy("pc", "bin").agg(count(lit(1L)).as("cn"))
    val tot = binned.groupBy("pc").agg(sum("cn").as("ct"))
    bins.join(broadcast(tot), Seq("pc"))
      .join(binned, Seq("pc", "bin"), "left")
      .select(col("pc"), greatest(col("pr"), lit(eps)).as("pr"),
        greatest(coalesce(col("cn"), lit(0L)) / col("ct"), lit(eps)).as("pq"),
        coalesce(col("cn"), lit(0L)).as("cn"))
      .groupBy("pc")
      .agg(sum("cn").as("n_rows"),
        round(sum(((col("pq") - col("pr")) * log(col("pq") / col("pr")))
          .cast("decimal(28,18)")).cast("double"), 6).as("psi"))
  }

  /** Start the monitor: each shard dropped under the watched source
    * scores k per-component PSI rows, written idempotently under
    * `outDir` keyed by micro-batch id. The model and reference are
    * re-read per batch (refresh = republish; `readRetry` survives the
    * two-rename publish window). */
  def monitor(stream: DataFrame, modelDir: String, refDir: String,
              outDir: String, checkpoint: String,
              eps: Double = 1e-4): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // attempts = 2: the retry wraps the ENTIRE per-batch score+write, so
        // it exists only to survive the publisher's two-rename swap window
        // — a deterministic batch failure (corrupt shard, schema drift)
        // must not re-run the heavy scoring job five times. Matches the
        // DiffStream/DeconStream discipline for the same table-model shape.
        graft.sources.Sinks.readRetry(attempts = 2) {
          val model = Pca.readPcaModel(spark, modelDir)
          psiBatch(batch, model, edges(spark, refDir), refBins(spark, refDir), eps)
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(outDir)
        }
      }
      .start()

  /** The accumulated per-delivery drift log (k rows per shard). */
  def driftLog(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
