package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** The one-row "ANALYZE corpus" report a pipeline runs before anything
  * else touches a new drop: size, source/language cardinalities,
  * exact-duplicate mass, and the quality-score quartiles — enough to
  * decide whether the batch is worth the expensive dedup/curation stages
  * and which knobs (mixture weights, quality threshold) need retuning.
  *
  * Scale shape: three corpus scans, each the cheapest plan for its
  * signals — (1) a grouping-free aggregate with a SINGLE distinct
  * (md5(text)) so the two-phase distinct rewrite applies without an
  * Expand; (2) a (source, lang) aggregation whose output is
  * cardinality-bounded metadata, from which both cardinalities derive
  * (the Expand from the double countDistinct runs over that tiny table,
  * never the corpus); (3) the tokenizing quality scan feeding the exact
  * percentiles (swap in approx_percentile at 100 TB — the documented
  * sketch-twin trade). All three attach by broadcast cross join. */
object CorpusReport {

  def report(docs: DataFrame): DataFrame = {
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      countDistinct(md5(col("text"))).as("n_distinct_texts"))
    val cards = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .agg(countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"))
    val quart = docs
      .select(TextAnalysis.quality(col("text")).getField("quality").as("q"))
      .agg(
        round(expr("percentile(q, 0.25)"), 6).as("p25_quality"),
        round(expr("percentile(q, 0.5)"), 6).as("p50_quality"),
        round(expr("percentile(q, 0.75)"), 6).as("p75_quality"))
    base.crossJoin(broadcast(cards)).crossJoin(broadcast(quart))
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("total_chars"),
        round(col("total_chars") / col("n_docs"), 6).as("mean_chars"),
        (col("n_docs") - col("n_distinct_texts")).as("n_dup_docs"),
        col("p25_quality"), col("p50_quality"), col("p75_quality"))
  }
}
