package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Normalize, Ranks}

/** Deterministic corpus-sampling and batch-shaping operators.
  *
  * Nothing here ever calls `rand()`: randomness derives from md5 of the
  * row's own key, so reruns, task retries, and the DuckDB oracle agree row
  * for row — the same content-stable discipline as `sample_stratified` and
  * the corpus shuffle. */
object Sampling {

  /** Weighted sampling WITHOUT replacement via priority sampling (the
    * exponential-jitter form of Efraimidis–Spirakis A-ES): each row draws
    * u ∈ (0,1) from its content hash, gets priority −ln(u)/w — an
    * Exponential(rate w) variate, so the k smallest priorities are a
    * weight-proportional sample — and the global k-smallest runs as
    * `orderBy.limit` = TakeOrderedAndProject (bounded per-partition heaps,
    * no full sort, no single-partition window). One narrow map + one
    * bounded top-k: the 100 TB shape for "give me 1M docs sampled by
    * quality weight".
    *
    * Priorities round to 9 digits before ranking (magnitudes sit around
    * 1e-5..1e-1 for corpus-scale weights, so 9 digits keeps full sampling
    * resolution while making the k-boundary engine-identical; ties break
    * by doc_id). Non-positive weights drop out — they have no sampling
    * mass. */
  def weightedSample(df: DataFrame, weight: Column, k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    // 28-bit md5 prefix of the id -> u uniform on (0,1), zero excluded so
    // ln(u) is finite
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
      .cast("double") + 1.0) / lit((1L << 28).toDouble + 1.0)
    df.select(col("doc_id"), weight.cast("double").as("w"))
      .filter(col("w") > 0)
      .withColumn("priority", round(-log(u) / col("w"), 9))
      .orderBy(col("priority"), col("doc_id")).limit(k)
  }

  /** Length-bucketed batch assignment — the padding-minimizing batching a
    * training job runs before packing: docs sort by token count (doc_id
    * tiebreak makes the order total) and consecutive runs of `batchSize`
    * become one batch, so each batch pads only to its own max length.
    *
    * The global order statistic uses the scale-safe content-bucketed
    * [[graft.ops.Ranks.globalRank]] — NEVER a single-partition window over
    * the corpus — so the plan stays parallel at any corpus size while
    * staying bit-identical to the SQL `row_number() OVER (ORDER BY
    * n_tokens, doc_id)` the oracle runs. Returns (doc_id, n_tokens,
    * batch). */
  def batchByLength(docs: DataFrame, batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    val tc = docs.select(col("doc_id"),
      size(Normalize.tokensCol(col("text"))).cast("long").as("n_tokens"))
    Ranks.globalRank(tc, Seq((col("n_tokens"), true), (col("doc_id"), true)), "rank")
      .withColumn("batch", expr(s"(rank - 1) div CAST($batchSize AS BIGINT)"))
      .select("doc_id", "n_tokens", "batch")
  }
}
