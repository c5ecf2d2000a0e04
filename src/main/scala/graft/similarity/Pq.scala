package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization (PQ) similarity search — the memory-side scale
  * path the sign/IVF quantizers in [[Ann]] don't cover: instead of
  * pruning WHICH vectors get scored, PQ compresses HOW each vector is
  * stored. Vectors are split into `m` subspaces; each subspace gets its
  * own small k-means codebook; a vector is stored as `m` byte-sized code
  * ids (here 4 ints vs 64 doubles — the 100 TB move that turns an
  * embedding corpus into something that fits an executor cache).
  * Queries stay full-precision and score candidates by ADC (asymmetric
  * distance computation): per query, the dot of each of its subvectors
  * with every codebook centroid is precomputed into a lookup table, so
  * scoring a candidate is `m` array lookups + adds — no float dot at
  * scan time.
  *
  * Spark shapes, per stage:
  *  - TRAIN: per-subspace Lloyd on the deterministic `vec_id %
  *    trainStride == 0` sample (content-stable, no rand()), DECIMAL
  *    means — bit-stable codebooks across runs/retries, the same
  *    discipline as [[Ann.ivfCentroids]].
  *  - ENCODE: a narrow shuffle-free map — codes come from literal
  *    codebook expressions (`argmin ||x-c||² = argmax (x·c − c·c/2)`,
  *    smallest-cid ties), so vectors never move to be encoded.
  *  - SCORE: the bounded probe set ships as a literal model WITH its
  *    per-probe LUTs precomputed driver-side (the serve-a-model shape of
  *    [[Ann.bruteForceTopK]]); candidates explode the probe array
  *    locally and rank with the partial+final window top-k.
  *
  * Training is not SQL-mirrorable (iterative float means), but encode +
  * ADC GIVEN the trained codebooks is — the oracle gate injects the
  * collected model into a generated DuckDB query
  * ([[graft.OracleSqlExt.annPqSql]]), exactly the IVF pattern. Scores
  * are approximate inner products (ADC reconstructs `dot(q, x)` from
  * code centroids); recall vs the exact brute force is pinned in PqSpec.
  */
object Pq {

  import graft.functions.VectorFunctions.dot

  /** One subspace's codebook: (cid, centroid, c·c/2). The half-norm is
    * computed ONCE driver-side and shipped as the same literal to both
    * engines, so the argmin is bit-identical by construction. */
  type Codebook = Seq[(Int, Array[Double], Double)]

  /** The most recently trained model: (codebooks, subDim, stride, k).
    * Verify runs queries before dumping oracle SQL, and training is
    * deterministic, so the stashed model is exactly the one the dumped
    * result used (the [[Ann.lastIvfModel]] contract). */
  @volatile private[graft] var lastPqModel: Option[(Seq[Codebook], Int, Int, Int)] = None

  /** Same fold order as the codegen'd [[graft.functions.DotProduct]]
    * (s = 0.0; s += a(i)*b(i) left-to-right) — LUT literals computed
    * here must be bit-identical to what either engine would compute. */
  private[similarity] def dotScalar(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private def halfNormSq(arr: Array[Double]): Double = dotScalar(arr, arr) / 2

  /** Nearest code for a subvector — array-local argmax over literal
    * centroid scores with deterministic smallest-cid ties (the
    * `greatest(struct(score, -cid))` pattern from [[Ann.ivfCell]]). */
  def nearestCode(v: Column, cb: Codebook): Column = {
    val structs = cb.map { case (cid, arr, half) =>
      struct((dot(v, array(arr.map(lit(_)): _*)) - lit(half)).as("s"), lit(-cid).as("negcid"))
    }
    (-greatest(structs: _*).getField("negcid")).cast("int")
  }

  /** Deterministic Lloyd for ALL `m` subspaces JOINTLY under L2
    * assignment: init = first `k` sample subvectors by vec_id per
    * subspace; means through DECIMAL sums (bit-stable across
    * partitionings — and, being order-free sums over exactly the same
    * per-(subspace, cell, dim) value sets, bit-identical to the previous
    * one-subspace-at-a-time trainer, so every stashed model and dynamic
    * oracle is unchanged); a cell that empties keeps its previous
    * centroid instead of silently shrinking the codebook.
    *
    * Joint-ness is the perf point: one init collect + one grouped
    * collect PER ITERATION for the whole model, vs `m` of each — at
    * sf0.1 the per-job overhead dominated PQ/OPQ/eval floors (each
    * `codebooks` call ran m·iters = 8 shuffle jobs; the eval ran two
    * calls). Every row computes its m cell ids array-locally, the
    * posexplode keys each value by (subspace, cell, dim), and a single
    * well-spread m·codes·subDim-group aggregate updates every centroid. */
  private def lloydJoint(sample: DataFrame, m: Int, subDim: Int,
                         k: Int, iters: Int): Seq[Codebook] = {
    val init = sample.orderBy("vec_id").limit(k)
      .select((0 until m).map(s => slice(col("fv"), s * subDim + 1, subDim).as(s"v$s")): _*)
      .collect()
    require(init.length == k,
      s"training sample has only ${init.length} vectors for $k codes: lower trainStride")
    var cents: Seq[Seq[(Int, Array[Double])]] = (0 until m).map { s =>
      init.toSeq.zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](s).toArray) }
    }
    for (_ <- 0 until iters) {
      val cbs = cents.map(_.map { case (cid, arr) => (cid, arr, halfNormSq(arr)) })
      val cids = array((0 until m).map(s =>
        nearestCode(slice(col("fv"), s * subDim + 1, subDim), cbs(s))): _*)
      val sub = expr(s"dim DIV $subDim")
      val updated = sample
        .select(cids.as("cids"), posexplode(col("fv")).as(Seq("dim", "x")))
        .select(sub.cast("int").as("s"),
          element_at(col("cids"), sub.cast("int") + 1).as("cid"),
          pmod(col("dim"), lit(subDim)).as("d"), col("x"))
        .groupBy("s", "cid", "d")
        .agg((sum(col("x").cast("decimal(28,14)")) / count(lit(1))).cast("double").as("mu"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getDouble(3))))
        .groupBy(_._1).map { case ((s, cid), rows) =>
          val arr = new Array[Double](rows.map(_._2._1).max + 1)
          rows.foreach { case (_, (d, mu)) => arr(d) = mu }
          (s, cid) -> arr
        }
      cents = cents.zipWithIndex.map { case (book, s) =>
        book.map { case (cid, old) => (cid, updated.getOrElse((s, cid), old)) }
      }
    }
    cents.map(_.map { case (cid, arr) => (cid, arr, halfNormSq(arr)) })
  }

  /** Train the `m` per-subspace codebooks on the strided sample. Lloyd
    * aggregates a posexplode of every training subvector per iteration —
    * at corpus scale, train on the sample and encode the full set (the
    * [[Ann.ivfCentroids]] trainStride contract). */
  def codebooks(emb: DataFrame, m: Int, codes: Int, iters: Int,
                trainStride: Int, subDim: Int): Seq[Codebook] = {
    val sample = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("fv"))
      .filter(pmod(col("vec_id"), lit(trainStride.toLong)) === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try lloydJoint(sample, m, subDim, codes, iters)
    finally sample.unpersist()
  }

  /** PQ/ADC approximate top-k: every vector is encoded to `m` code ids
    * by a shuffle-free map against the literal codebooks; the strided
    * probe set (bounded, loud failure above `maxProbes`) ships with
    * driver-precomputed LUTs; scoring is `m` lookups + adds per
    * (probe, candidate); ranks break ties by n_id. Emits
    * (q_id, n_id, adc) with adc = round(Σ_s lut[s][code_s], 6). */
  def pqTopK(emb: DataFrame, m: Int = 4, codes: Int = 8, iters: Int = 2,
             stride: Int = 100, k: Int = 5, trainStride: Int = 1,
             maxProbes: Int = 4096): DataFrame = {
    val base = emb.select(col("vec_id").as("n_id"), col("embedding").cast("array<double>").as("v"))
    val dims = base.select(size(col("v")).as("n")).limit(1).collect()
    if (dims.isEmpty) {
      return emb.sparkSession.emptyDataFrame
        .select(lit(0L).as("q_id"), lit(0L).as("n_id"), lit(0.0).as("adc"))
        .limit(0)
    }
    val dim = dims.head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m

    val books = codebooks(emb, m, codes, iters, trainStride, subDim)
    lastPqModel = Some((books, subDim, stride, k))
    adcTopK(emb, books, subDim, stride, k, maxProbes)
  }

  /** The ADC serve path GIVEN trained codebooks — shared by the plain PQ,
    * the OPQ composition (which calls it in the reduced space) and the
    * recall eval, so the three surfaces cannot drift apart. Encode is a
    * shuffle-free map against the literal books; the bounded probe set
    * ships with driver-precomputed LUTs; scoring is m lookups + adds. */
  private[similarity] def adcTopK(emb: DataFrame, books: Seq[Codebook], subDim: Int,
                                  stride: Int, k: Int, maxProbes: Int): DataFrame = {
    val m = books.length
    val base = emb.select(col("vec_id").as("n_id"), col("embedding").cast("array<double>").as("v"))
    val probes = Ann.queries(emb, stride).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    require(probes.length <= maxProbes,
      s"${probes.length} probes exceed maxProbes=$maxProbes: raise stride for this corpus")
    if (probes.isEmpty) {
      return emb.sparkSession.emptyDataFrame
        .select(lit(0L).as("q_id"), lit(0L).as("n_id"), lit(0.0).as("adc"))
        .limit(0)
    }
    // per-probe ADC lookup tables, computed once driver-side: lut(s)(c)
    // = dot(q_sub_s, centroid_{s,c}) — the literal model each task uses
    val probeStructs = probes.map { case (qid, qv) =>
      val lut = (0 until m).map { s =>
        val qsub = qv.slice(s * subDim, (s + 1) * subDim)
        books(s).map { case (_, cent, _) => dotScalar(qsub, cent) }
      }
      struct(lit(qid).as("q_id"),
        array(lut.map(sc => array(sc.map(lit(_)): _*)): _*).as("lut"))
    }
    val encoded = base.select(col("n_id"),
      array((0 until m).map(s => nearestCode(slice(col("v"), s * subDim + 1, subDim), books(s))): _*)
        .as("codes"))
    val scored = encoded
      .select(col("n_id"), col("codes"), explode(array(probeStructs: _*)).as("q"))
      .filter(col("n_id") =!= col("q.q_id"))
      .withColumn("adc", round(
        (0 until m).map(s =>
          element_at(element_at(col("q.lut"), s + 1), element_at(col("codes"), s + 1) + 1))
          .reduce(_ + _), 6))
    graft.ops.TopK.topKPerGroup(
      scored.select(col("q.q_id").as("q_id"), col("n_id"), col("adc")),
      Seq(col("q_id")),
      Seq(col("adc").desc, col("n_id").asc), k)
  }

  /** OPQ model stash: (pca components, codebooks, subDim, stride, k) —
    * DEDICATED slot, never shared with `ann_pq_topk`'s. */
  @volatile private[graft] var lastOpqModel:
    Option[(Seq[Pca.Component], Seq[Codebook], Int, Int, Int)] = None

  /** OPQ-style composed index — the production reduce-then-quantize
    * pattern (Ge et al.'s OPQ simplified to its PCA initialization, the
    * form most deployments ship): rotate/reduce every vector with a
    * trained PCA model FIRST, then product-quantize in the reduced
    * space. The PCA rotation decorrelates dimensions so the independent
    * per-subspace codebooks waste fewer centroids on correlated axes,
    * and the PQ codes shrink with kDim (here kDim/m-wide subvectors vs
    * dim/m) — the memory story compounds: 64 doubles → kDim round-6
    * doubles → m code ids. Both halves are shipped parts
    * ([[Pca.pcaTrain]]/[[Pca.pcaProject]], [[codebooks]]/[[adcTopK]]);
    * this is pure composition, serving from the same narrow-map encode +
    * literal-LUT probe shape — zero extra shuffles over plain PQ.
    * ADC scores approximate the REDUCED-space inner product; retrieval
    * quality vs plain PQ is measured by [[quantRecallEval]]. */
  def opqTopK(emb: DataFrame, kDim: Int = 16, m: Int = 4, codes: Int = 8,
              iters: Int = 2, stride: Int = 100, k: Int = 5,
              trainStride: Int = 1, maxProbes: Int = 4096): DataFrame = {
    require(kDim % m == 0, s"reduced dim $kDim not divisible by m=$m subspaces")
    val subDim = kDim / m
    val pcaModel = Pca.pcaTrain(emb, kDim, trainStride)
    val reduced = Pca.pcaProject(emb, pcaModel)
      .select(col("vec_id"), array(pcaModel.map(c => col(s"pc${c.pc}")): _*).as("embedding"))
    val books = codebooks(reduced, m, codes, iters, trainStride, subDim)
    lastOpqModel = Some((pcaModel, books, subDim, stride, k))
    adcTopK(reduced, books, subDim, stride, k, maxProbes)
  }

  /** Dedicated stash for [[quantRecallEval]]'s dynamic oracle:
    * (pca components, opq books, opq subDim, pq books, pq subDim,
    * stride, k). */
  @volatile private[graft] var lastQuantRecallModel:
    Option[(Seq[Pca.Component], Seq[Codebook], Int, Seq[Codebook], Int, Int, Int)] = None

  /** One recall row for `picks` against `truth`, both keyed (q_id, n_id):
    * picks re-scored by ORIGINAL round-6 cosine (the metric truth ranks
    * by), counts/means as exact integer micros — the
    * [[Pca.pcaRecallEval]] discipline with a method label. */
  private def recallRow(truth: DataFrame, picks: DataFrame, orig: DataFrame,
                        method: String): DataFrame = {
    import graft.functions.VectorFunctions.dot
    val rescored = broadcast(picks)
      .join(orig.select(col("vec_id").as("q_id"), col("ov").as("qv"), col("on").as("qn")), Seq("q_id"))
      .join(orig.select(col("vec_id").as("n_id"), col("ov").as("nv"), col("on").as("nn")), Seq("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("acos"))
    val joined = truth.join(rescored, Seq("q_id", "n_id"), "full_outer")
    val micros = (c: Column) => round(c * lit(1000000L)).cast("long")
    joined.agg(
        count(col("tcos")).as("n_truth"),
        count(col("acos")).as("n_approx"),
        count(when(col("tcos").isNotNull && col("acos").isNotNull, lit(1))).as("n_hit"),
        sum(micros(col("tcos"))).as("tsum"),
        sum(micros(col("acos"))).as("asum"))
      .select(lit(method).as("method"), col("n_truth"), col("n_approx"), col("n_hit"),
        round(when(col("n_truth") > 0,
          col("n_hit").cast("double") / col("n_truth")).otherwise(lit(0.0)), 6).as("recall"),
        round(when(col("n_truth") > 0,
          col("tsum").cast("double") / lit(1e6) / col("n_truth")).otherwise(lit(0.0)), 6)
          .as("truth_mean_cos"),
        round(when(col("n_approx") > 0,
          col("asum").cast("double") / lit(1e6) / col("n_approx")).otherwise(lit(0.0)), 6)
          .as("approx_mean_cos"))
  }

  /** The quantizer decision table: plain-PQ and OPQ recall side by side
    * against the exact brute-force truth — the measure-before-commit row
    * a 100 TB deployment reads before choosing its index (the
    * [[Pca.pcaRecallEval]] / Ann.recallEval pattern, extended to compare
    * TWO methods in one report). Zero-norm originals leave the eval
    * entirely (no defined cosine on the truth side), so both chains and
    * the truth run over the same guarded corpus and the rows are
    * comparable. Everything downstream of training is bounded: truth and
    * both pick sets are stride-bounded literal-probe top-k tables. */
  def quantRecallEval(emb: DataFrame, kDim: Int = 16, m: Int = 4,
                      codes: Int = 8, iters: Int = 2, stride: Int = 100,
                      k: Int = 5, trainStride: Int = 1,
                      maxProbes: Int = 4096): DataFrame = {
    import graft.functions.VectorFunctions.dot
    require(kDim % m == 0, s"reduced dim $kDim not divisible by m=$m subspaces")
    val ovec = col("embedding").cast("array<double>")
    val nz = emb.filter(sqrt(dot(ovec, ovec)) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dim = nz.select(size(ovec).as("n")).limit(1).collect().head.getInt(0)
      require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
      val truth = Ann.bruteForceTopK(nz, stride, k)
        .select(col("q_id"), col("n_id"), col("cos").as("tcos"))
      val pqBooks = codebooks(nz, m, codes, iters, trainStride, dim / m)
      val pcaModel = Pca.pcaTrain(nz, kDim, trainStride)
      val reduced = Pca.pcaProject(nz, pcaModel)
        .select(col("vec_id"), array(pcaModel.map(c => col(s"pc${c.pc}")): _*).as("embedding"))
      val opqBooks = codebooks(reduced, m, codes, iters, trainStride, kDim / m)
      lastQuantRecallModel =
        Some((pcaModel, opqBooks, kDim / m, pqBooks, dim / m, stride, k))
      val orig = nz.select(col("vec_id"), ovec.as("ov"))
        .withColumn("on", sqrt(dot(col("ov"), col("ov"))))
      val pqRow = recallRow(truth,
        adcTopK(nz, pqBooks, dim / m, stride, k, maxProbes).select("q_id", "n_id"),
        orig, "pq")
      val opqRow = recallRow(truth,
        adcTopK(reduced, opqBooks, kDim / m, stride, k, maxProbes).select("q_id", "n_id"),
        orig, "opq")
      val out = pqRow.union(opqRow)
      out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      out
    } finally nz.unpersist()
  }
}
