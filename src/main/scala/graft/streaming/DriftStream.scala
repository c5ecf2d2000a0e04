package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** [[graft.ops.TableProfile.driftPsiQuantile]] as a CONTINUOUS ingest
  * monitor — the deployment shape of drift scoring: the reference
  * distribution (quantile bin edges + per-bin proportions) is built ONCE
  * from the trusted corpus and persisted as parquet, and every incoming
  * document shard scores ONE PSI row against it as it lands — the
  * "is this delivery in-distribution" gate that runs before a drifted
  * drop contaminates downstream mixture weights.
  *
  * Same stream-STATIC shape as [[NoveltyStream]] (static side re-read
  * per micro-batch, refresh = atomic directory swap; no watermark, no
  * join state), and the same `foreachBatch` + dynamic-partition-
  * overwrite replay idempotence: a checkpoint-replayed batch overwrites
  * its own `ingest_batch` partition instead of appending a duplicate
  * score row.
  *
  * The reference tables are metadata-sized by construction — one edge
  * row and `nBins` proportion rows regardless of corpus size — so the
  * per-batch work is: bin the shard against a broadcast edge row
  * (array-local), one bounded groupBy(bin) count, and an nBins-row PSI
  * fold with the [[graft.ops.TableProfile.driftPsi]] ε-clamp and
  * DECIMAL(28,18) term-accumulation discipline. */
object DriftStream {

  /** Build the static reference under `dir`: `dir/edges` (one row with
    * the round-6 quantile edge array) and `dir/bins` (bin → reference
    * proportion). `exact = true` uses the exact percentile (test/oracle
    * parity); the default is the approx_percentile sketch — the 100 TB
    * form, since the reference build is itself a corpus-sized job. */
  def buildReference(docs: DataFrame, column: String, dir: String,
                     nBins: Int = 10, exact: Boolean = false,
                     accuracy: Int = 10000): Unit = {
    val qs = (1 until nBins).map(i => i.toDouble / nBins).mkString(", ")
    val pctl =
      if (exact) s"percentile(x, array($qs))"
      else s"cast(approx_percentile(x, array($qs), $accuracy) as array<double>)"
    val base = docs.filter(col(column).isNotNull)
      .select(round(col(column).cast("double"), 6).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edgesDf = base.agg(expr(s"transform($pctl, v -> round(v, 6))").as("le"))
    edgesDf.coalesce(1).write.mode("overwrite").parquet(s"$dir/edges")
    val binned = base.crossJoin(broadcast(edgesDf))
      .select(size(expr("filter(le, v -> x > v)")).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1L)).as("rn"))
    // write the FULL 0..nBins-1 grid, not just occupied bins: heavily
    // tied reference values collapse quantile edges and leave bins
    // empty, and a drifted shard landing in such a bin must still be
    // representable — pr = 0 there, clamped to eps at score time
    val grid = edgesDf.select(
      explode(sequence(lit(0L), lit((nBins - 1).toLong))).as("bin"))
    grid.join(binned, Seq("bin"), "left")
      .crossJoin(broadcast(binned.agg(sum("rn").as("rt"))))
      .select(col("bin"), (coalesce(col("rn"), lit(0L)) / col("rt")).as("pr"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/bins")
    base.unpersist()
  }

  def edges(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/edges")

  def refBins(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/bins")

  /** One micro-batch's PSI against the static reference — a single
    * (n_rows, psi) row. The bin universe is the FULL 0..nBins-1 grid
    * (including reference bins with zero mass, which collapsed quantile
    * edges can produce), so batch-missing bins clamp `pc` to `eps` and
    * reference-missing bins clamp `pr` to `eps` — both penalize instead
    * of silently dropping mass on either side. */
  def psiBatch(batch: DataFrame, column: String, edgesDf: DataFrame,
               bins: DataFrame, eps: Double = 1e-4): DataFrame = {
    val binned = batch.filter(col(column).isNotNull)
      .select(round(col(column).cast("double"), 6).as("x"))
      .crossJoin(broadcast(edgesDf))
      .select(size(expr("filter(le, v -> x > v)")).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1L)).as("cn"))
    val tot = binned.agg(sum("cn").as("ct"))
    bins.crossJoin(broadcast(tot))
      .join(binned, Seq("bin"), "left")
      .select(greatest(col("pr"), lit(eps)).as("pr"),
        greatest(coalesce(col("cn"), lit(0L)) / col("ct"), lit(eps)).as("pc"),
        coalesce(col("cn"), lit(0L)).as("cn"))
      .agg(sum("cn").as("n_rows"),
        round(sum(((col("pc") - col("pr")) * log(col("pc") / col("pr")))
          .cast("decimal(28,18)")).cast("double"), 6).as("psi"))
  }

  /** Start the monitor: each shard dropped under the watched source
    * scores one PSI row, written idempotently under `outDir` keyed by
    * its micro-batch id. */
  def monitor(stream: DataFrame, column: String, refDir: String,
              outDir: String, checkpoint: String,
              eps: Double = 1e-4): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        psiBatch(batch, column, edges(spark, refDir), refBins(spark, refDir), eps)
          .withColumn("ingest_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch")
          .parquet(outDir)
      }
      .start()

  /** The accumulated per-delivery drift log (one row per shard). */
  def driftLog(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
