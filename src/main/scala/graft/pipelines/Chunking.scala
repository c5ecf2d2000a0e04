package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the RAG / context-window prep
  * step between raw documents and embedding or packing: each document is
  * cut into `window`-token chunks whose starts advance by `stride`
  * tokens (stride < window ⇒ consecutive chunks overlap by
  * `window - stride` tokens, the standard retrieval-recall trade).
  *
  * Semantics, pinned by the oracle:
  *  - chunk starts are 0, stride, 2·stride, … while start < n_tokens;
  *  - the last chunk may be short (whatever tokens remain), never
  *    dropped — a trailing remainder is real text;
  *  - EVERY document emits at least one chunk: an empty/whitespace-only
  *    doc yields chunk 0 with `n_tokens = 0` and empty text, so the
  *    operator is row-preserving on the corpus (no silent doc loss, the
  *    same contract as passage dedup's short-doc pass-through).
  *
  * Scale shape: tokenization, start generation and slicing are all
  * array-local inside one projection — zero shuffles, zero joins; the
  * output is (doc_id, chunk_id) keyed and ~(n_tokens/stride)× the input
  * rows, which is the explode the downstream embed/pack stage wants to
  * parallelize over anyway.
  */
object Chunking {

  /** Emits (doc_id, chunk_id, n_tokens, chunk_text); tokens are raw
    * whitespace splits (chunking must not alter text — cleaning is
    * [[graft.pipelines.CleanCorpus]]'s job, upstream). */
  def chunkDocuments(docs: DataFrame, window: Int = 64, stride: Int = 32): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    docs.select(col("doc_id"), toks.as("toks"))
      // sequence's upper bound is inclusive -> greatest(n-1, 0) generates
      // starts < n, and exactly [0] for an empty doc
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(stride))).as("start"))
      .select(col("doc_id"),
        expr(s"CAST(start AS BIGINT) div ${stride}L").as("chunk_id"),
        size(slice(col("toks"), col("start") + 1, lit(window))).cast("long").as("n_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(window)), " ").as("chunk_text"))
  }
}
