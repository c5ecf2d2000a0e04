package graft

import graft.collocations.Collocations
import org.apache.spark.sql.functions._

/** PQ/ADC similarity search, chunking, and temperature-mix specs. */
class PqSpec extends SparkSpec {

  import graft.similarity.Pq

  test("pq finds same-cluster neighbors on clustered data") {
    import spark.implicits._
    // 40 vectors in 4 tight clusters on orthogonal axis dims (0/10/20/30),
    // interleaved ids so per-subspace Lloyd init sees multiple clusters
    val emb = (0 until 40).map { i =>
      val cluster = i % 4
      val v = Array.fill(64)(0.0f)
      v(cluster * 10) = 1.0f
      v(cluster * 10 + 1) = 0.05f * (i / 4)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val top = Pq.pqTopK(emb, m = 4, codes = 8, iters = 2, stride = 10, k = 3).collect()
    assert(top.map(_.getLong(0)).toSet == Set(0L, 10L, 20L, 30L))
    // in-cluster ADC ~1, cross-cluster ~0 (disjoint support dims): every
    // reported neighbor must share the query's cluster
    top.foreach { r =>
      assert(r.getLong(1) % 4 == r.getLong(0) % 4,
        s"query ${r.getLong(0)} got cross-cluster neighbor ${r.getLong(1)} (adc=${r.getDouble(2)})")
    }
  }

  test("pq is deterministic across runs and stashes the model it used") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run() = Pq.pqTopK(emb, m = 4, codes = 8, iters = 2, stride = 100, k = 5, trainStride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(x => (x._1, x._2))
    val a = run()
    val modelA = Pq.lastPqModel.get
    val b = run()
    assert(a.nonEmpty && (a sameElements b), "PQ results must be bit-identical across runs")
    val modelB = Pq.lastPqModel.get
    // deterministic Lloyd: retrained codebooks are bit-identical too
    assert(modelA._1.flatten.map(c => c._2.toSeq) == modelB._1.flatten.map(c => c._2.toSeq))
    // the dynamic oracle exists once a query has run
    assert(OracleSqlExt.annPqSqlFromLastModel.isDefined)
  }

  test("pq sampled training still separates clusters (the 100 TB shape)") {
    import spark.implicits._
    val emb = (0 until 40).map { i =>
      val cluster = i % 4
      val v = Array.fill(64)(0.0f)
      v(cluster * 10) = 1.0f
      v(cluster * 10 + 1) = 0.05f * (i / 4)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    // trainStride 3 is coprime with the id%4 layout -> sample sees every cluster
    val top = Pq.pqTopK(emb, m = 4, codes = 8, iters = 2, stride = 10, k = 3, trainStride = 3).collect()
    top.foreach { r =>
      assert(r.getLong(1) % 4 == r.getLong(0) % 4,
        s"sampled training: query ${r.getLong(0)} got cross-cluster ${r.getLong(1)}")
    }
  }

  test("opq composes PCA reduce with PQ and keeps same-cluster neighbors") {
    import spark.implicits._
    // same 4-orthogonal-cluster layout: after PCA to 16 dims the cluster
    // axes dominate the spectrum, so reduced-space ADC must still pair
    // queries with their own cluster
    val emb = (0 until 40).map { i =>
      val cluster = i % 4
      val v = Array.fill(64)(0.0f)
      v(cluster * 10) = 1.0f
      v(cluster * 10 + 1) = 0.05f * (i / 4)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val top = Pq.opqTopK(emb, kDim = 16, m = 4, codes = 8, iters = 2, stride = 10, k = 3).collect()
    assert(top.map(_.getLong(0)).toSet == Set(0L, 10L, 20L, 30L))
    top.foreach { r =>
      assert(r.getLong(1) % 4 == r.getLong(0) % 4,
        s"opq: query ${r.getLong(0)} got cross-cluster neighbor ${r.getLong(1)}")
    }
    // dedicated stash: the OPQ run must never overwrite plain PQ's slot
    assert(Pq.lastOpqModel.isDefined)
    val (pcaModel, books, subDim, _, _) = Pq.lastOpqModel.get
    assert(pcaModel.length == 16 && books.length == 4 && subDim == 4)
  }

  test("quant recall eval reports one labeled row per method with sane bounds") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = Pq.quantRecallEval(emb, kDim = 16, m = 4, codes = 8, iters = 2,
        stride = 100, k = 5, trainStride = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(rows.keySet == Set("pq", "opq"))
    rows.foreach { case (m, (nT, nA, nHit, recall, tMean, aMean)) =>
      assert(nT > 0 && nA > 0, s"$m: empty eval")
      assert(nHit <= math.min(nT, nA), s"$m: hits exceed a side")
      assert(recall >= 0.0 && recall <= 1.0, s"$m: recall out of range")
      // truth maximizes original cosine by definition
      assert(tMean >= aMean - 1e-9, s"$m: truth mean below approx mean")
    }
    // both methods are judged against the SAME truth
    assert(rows("pq")._1 == rows("opq")._1)
    assert(OracleSqlExt.annQuantRecallEvalSqlFromModel.isDefined)
  }

  test("chunking semantics: overlap, short tail, empty doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"), // 5 tokens
      (2L, ""),          // empty
      (3L, "  \t ")      // whitespace-only
    ).toDF("doc_id", "text")
    val out = graft.pipelines.Chunking.chunkDocuments(docs, window = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(x => (x._1, x._2))
    assert(out.toSeq == Seq(
      (1L, 0L, 3L, "a b c"),
      (1L, 1L, 3L, "c d e"),  // stride 2 < window 3 -> 1-token overlap
      (1L, 2L, 1L, "e"),      // short tail kept
      (2L, 0L, 0L, ""),       // empty doc still emits chunk 0
      (3L, 0L, 0L, "")))
  }

  test("chunking is row-preserving per doc and covers every token") {
    val docs = Collocations.documents(spark, "/root/testdata/sf0.001")
    val out = graft.pipelines.Chunking.chunkDocuments(docs, window = 64, stride = 32)
    assert(out.select("doc_id").distinct().count() == docs.count())
    // non-overlap coverage check at stride == window: token counts add up
    val exact = graft.pipelines.Chunking.chunkDocuments(docs, window = 32, stride = 32)
      .groupBy("doc_id").agg(sum("n_tokens").as("n"))
    val toks = docs.select(col("doc_id"),
      size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).cast("long").as("n"))
    assert(exact.join(toks, "doc_id").filter(exact("n") =!= toks("n")).count() == 0)
  }

  test("temperature mix: probabilities sum to 1 and alpha<1 upweights small sources") {
    import spark.implicits._
    val docs = Seq.tabulate(10)(i => (i.toLong, "x", if (i == 0) "small" else "big", 100L))
      .toDF("doc_id", "text", "source", "n_chars")
    val out = graft.text.TextAnalysis.temperatureMix(docs)
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    val Seq(big, small) = out.toSeq.map(x => x)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-6, s"p_alpha must sum to 1: $out")
    assert(small._4 > 1.0, s"alpha=0.5 must upweight the small source: $small")
    assert(big._4 < 1.0, s"alpha=0.5 must downweight the big source: $big")
    // shares: 100 vs 900 chars -> sqrt weights 10 vs 30 -> p = .25/.75
    assert(small._2 == 0.1 && big._2 == 0.9)
    assert(small._3 == 0.25 && big._3 == 0.75)
  }
}
