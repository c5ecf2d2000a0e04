package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Normalize

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw document
  * by how much more likely its hashed-unigram features are under a TARGET
  * distribution than under the RAW corpus distribution, then keep the
  * docs whose mean log-ratio is positive (more target-like than not).
  * The feature space is `buckets` hash buckets — fixed-size regardless of
  * vocabulary, which is the property that makes the method run at 100 TB:
  * the "model" is a `buckets`-row table, never a vocabulary-sized one.
  *
  * Plan shape: two corpus scans (build the bucket model, then score) —
  * deliberately NOT a persist of the corpus-sized token stream; the model
  * table is tiny and broadcasts, the totals are a single broadcast row,
  * and the per-doc rollup is the only shuffle in the scoring pass.
  *
  * Parity: the bucket hash is the first 8 hex digits of md5 (the same
  * engine-shared scheme as the minhash family), the smoothed log-ratio
  * `ln((c_t+1)/(n_t+B)) − ln((c_r+1)/(n_r+B))` is computed once per
  * bucket, and the per-doc sum accumulates DECIMAL(28,18) terms (exactly
  * associative — partition order can't wiggle the double sum). */
object Dsir {

  /** Hash bucket of a token: first 8 md5 hex digits mod `buckets` —
    * a 32-bit non-negative value on both engines. */
  def bucketOf(w: Column, buckets: Int): Column =
    conv(substring(md5(w), 1, 8), 16, 10).cast("long") % buckets

  /** Per-document importance weights against a boolean target predicate
    * (e.g. `col("lang") === "en"` with a curated English slice as the
    * target). Emits every corpus doc: (doc_id, n_tokens, avg_logratio,
    * selected); tokenless docs come back with weight 0 and
    * `selected = false`. */
  def importanceWeights(docs: DataFrame, isTarget: Column,
                        buckets: Int = 1024): DataFrame = {
    val tok = docs.select(col("doc_id"), isTarget.as("is_t"),
        explode(Normalize.tokensCol(col("text"))).as("w"))
      .select(col("doc_id"), col("is_t"), bucketOf(col("w"), buckets).as("b"))
    // bucket model: target and raw occurrence counts per bucket — at most
    // `buckets` rows after one well-spread aggregation
    val model = tok.groupBy("b").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val totals = model.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val scored = model.crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("ct") + 1).cast("double") / (col("nt") + buckets).cast("double")) -
         log((col("cr") + 1).cast("double") / (col("nr") + buckets).cast("double"))).as("lr"))
    // scoring pass: every token occurrence looks its bucket up in the
    // broadcast model, then one per-doc rollup
    val perDoc = tok
      .join(broadcast(scored), Seq("b"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        round(sum(col("lr").cast("decimal(28,18)")).cast("double") / count(lit(1)), 6)
          .as("avg_logratio"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("avg_logratio"), lit(0.0)).as("avg_logratio"))
      .withColumn("selected", col("avg_logratio") > 0.0)
  }
}
