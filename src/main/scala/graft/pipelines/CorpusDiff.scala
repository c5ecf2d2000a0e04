package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the incremental-ingest primitive of a
  * continuously refreshed training corpus: given two versions of the
  * documents table, classify every doc_id as `added` (only in the new
  * snapshot), `removed` (only in the old), or `changed` (present in both
  * with different content). Downstream incremental operators (the winnow /
  * substring-anchor / jaccard `*_incremental` ingest paths, profile
  * deltas) consume exactly this delta instead of re-reading the corpus.
  *
  * Scale shape: each side is projected to (doc_id, md5(text)) BEFORE the
  * join — the shuffle carries 32-byte digests, never document bodies —
  * then one full-outer sort-merge join on doc_id (the corpus's natural
  * well-spread key). Unchanged documents (the overwhelming majority of a
  * production delta) are dropped inside the joined projection, so the
  * output is delta-sized. md5 is the repo-wide parity hash (both engines
  * compute identical digests).
  */
object CorpusDiff {

  /** (doc_id, status) for every document that differs between snapshots;
    * status ∈ {added, removed, changed}. */
  def diff(prev: DataFrame, cur: DataFrame): DataFrame = {
    val p = prev.select(col("doc_id"), md5(col("text")).as("h_prev"))
    val c = cur.select(col("doc_id"), md5(col("text")).as("h_cur"))
    p.join(c, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h_prev").isNull, "added")
          .when(col("h_cur").isNull, "removed")
          .when(col("h_prev") =!= col("h_cur"), "changed"))
      .filter(col("status").isNotNull)
      .select("doc_id", "status")
  }

  /** One-row delta summary: counts per status + the unchanged remainder —
    * the monitoring face of [[diff]] (a refresh that suddenly "changes"
    * half the corpus is a pipeline bug, not an edit wave). Computed off
    * the same digest join so the two views can't disagree. */
  def diffStats(prev: DataFrame, cur: DataFrame): DataFrame = {
    val p = prev.select(col("doc_id"), md5(col("text")).as("h_prev"))
    val c = cur.select(col("doc_id"), md5(col("text")).as("h_cur"))
    p.join(c, Seq("doc_id"), "full_outer")
      .agg(
        sum(when(col("h_prev").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("h_cur").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("h_prev").isNotNull && col("h_cur").isNotNull &&
          col("h_prev") =!= col("h_cur"), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("h_prev") === col("h_cur"), 1L).otherwise(0L)).as("n_unchanged"))
  }
}
