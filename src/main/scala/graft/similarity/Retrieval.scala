package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — reciprocal-rank fusion (RRF; Cormack,
  * Clarke & Buettcher 2009, "Reciprocal Rank Fusion outperforms Condorcet
  * and individual Rank Learning Methods") of a lexical BM25 ranking and a
  * semantic embedding-cosine ranking:
  *
  *   rrf(d) = Σ_lists 1 / (rrfK + rank_list(d))
  *
  * over the union of both top-N lists (a document present in only one
  * list contributes that one term). This is the retrieval pattern
  * production decontamination/audit tooling runs against a training
  * corpus: the lexical half catches exact-term matches the embedding
  * model smooths over, the semantic half catches paraphrases BM25 can't
  * see, and the rank-based (score-free) fusion needs no cross-system
  * score calibration.
  *
  * Scale shape: each half is its own bounded top-N primitive —
  * [[graft.text.TextAnalysis.bm25TopK]] (query-term filter BEFORE any
  * shuffle, broadcast stats, TakeOrderedAndProject top-N) and a
  * brute-cosine scan against a literal query vector (zero joins; swap in
  * [[Ann.ivfTopKWith]]'s cell-probed scan at 100 TB — the fusion algebra
  * is oblivious to which engine produced the ranks). The fusion itself
  * touches only the two ≤N-row rank lists: a full-outer equi-join plus a
  * rank window over ≤2N rows of metadata — bounded however large the
  * corpus. All scores round to 6 digits BEFORE ranking, ranks break ties
  * on doc_id, so the fused order is engine-identical.
  */
object Retrieval {

  /** Fused top-`k`: (doc_id, rank_lex, rank_sem, rrf, rank); rank_lex /
    * rank_sem are NULL for documents absent from that half's top-`nPer`.
    * The query is expressed BOTH ways, as production hybrid search does:
    * `query` terms for the lexical half and a query EMBEDDING for the
    * semantic half (here the designated `queryVecId` document's vector —
    * the testdata stand-in for embedding the query text — shipped as a
    * literal model row, never a join side; the query document itself is
    * excluded from the semantic candidates). */
  def hybridRrf(docs: DataFrame, emb: DataFrame, query: Seq[String],
                queryVecId: Long = 0L, nPer: Int = 50, rrfK: Int = 60,
                k: Int = 15, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "hybridRrf needs at least one lexical query term")
    require(nPer >= 1 && rrfK >= 1 && k >= 1, s"nPer/rrfK/k must be >= 1: $nPer/$rrfK/$k")

    // lexical half: BM25 top-nPer, re-ranked under the same (score desc,
    // doc_id) order that bounded the list — the window sits above the
    // BM25 aggregate over ≤nPer rows
    val lex = graft.text.TextAnalysis.bm25TopK(docs, query, k1, b, nPer)
      .withColumn("rank_lex", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("rank_lex"))

    // semantic half: ONE bounded model row collected driver-side; its
    // norm is the same left-to-right fold the in-plan dot uses, so the
    // literal equals what the oracle recomputes in SQL
    val qRows = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").cast("array<double>").as("qv")).collect()
    require(qRows.nonEmpty, s"no embedding for query vec_id=$queryVecId")
    val qv = qRows.head.getSeq[Double](0)
    val qNrm = math.sqrt(qv.foldLeft(0.0)((acc, x) => acc + x * x))
    require(qNrm > 0, s"query vec_id=$queryVecId has zero norm — no cosine is defined")
    val qvCol = array(qv.map(lit(_)): _*)
    val sem = emb
      .select(col("vec_id").as("doc_id"), col("embedding").cast("array<double>").as("nv"))
      .withColumn("n_nrm", sqrt(Ann.dot(col("nv"), col("nv"))))
      .filter(col("n_nrm") > 0 && col("doc_id") =!= queryVecId)
      .withColumn("cos", round(Ann.dot(col("nv"), qvCol) / (col("n_nrm") * lit(qNrm)), 6))
      .orderBy(col("cos").desc, col("doc_id").asc).limit(nPer)
      .withColumn("rank_sem", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("rank_sem"))

    // rank-algebra fusion over the union of the two bounded lists
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_lex")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_sem")), lit(0.0)), 6))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank_lex", "rank_sem", "rrf", "rank")
  }
}
