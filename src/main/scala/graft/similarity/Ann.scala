package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The query set is broadcast, so the big side streams once with no
  *    shuffle; per-pair work is an array-local fold.
  *  - [[bucketedTopK]]: the scale path — a deterministic sign-bit coarse
  *    quantizer (IVF-style). Vectors shuffle once by bucket key; candidate
  *    generation touches only same-bucket vectors, turning O(N*Q) into
  *    O(N*Q / 2^bits) at the cost of recall. At 100 TB you'd add
  *    multi-probe (flip one sign) to recover recall; the plumbing is
  *    identical.
  *
  * Dot products use the codegen'd [[graft.functions.DotProduct]]
  * expression — a left-to-right primitive fold that the DuckDB oracle
  * mirrors with `list_reduce` — bit-identical doubles, so scores round
  * identically and ranks agree.
  */
object Ann {

  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot(a, b)

  def cosine(a: Column, b: Column): Column = graft.functions.VectorFunctions.cosine(a, b)

  /** Deterministic query subset: every `stride`-th vector, with the norm
    * precomputed once per vector. `cos = dot / (norm_a * norm_b)` is the
    * identical double to computing `sqrt(dot(x,x))` per pair (same inputs,
    * same ops), so this costs one dot per pair instead of three while
    * staying bit-compatible with the oracle. */
  def queries(emb: DataFrame, stride: Int): DataFrame =
    emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("q_vec"))
      .withColumn("q_nrm", sqrt(dot(col("q_vec"), col("q_vec"))))
      // zero-norm vectors have no cosine: drop them here so Spark's NaN
      // (> any threshold, sorts first) never diverges from the oracle's
      // NULL (dropped) — mirrored by the norm guards in the oracle CTEs
      .filter(col("q_nrm") > 0)

  private def candidates(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").as("n_id"), col("embedding").cast("array<double>").as("n_vec"))
      .withColumn("n_nrm", sqrt(dot(col("n_vec"), col("n_vec"))))
      .filter(col("n_nrm") > 0)

  /** Exact top-k neighbors per query (self excluded), deterministic ties.
    *
    * The strided probe set is bounded (n/stride rows), so it ships as a
    * literal MODEL, not a join side — collected once and exploded
    * array-locally against the scan, the same serve-a-model shape as the
    * IVF centroids. The corpus side therefore never joins at all: the plan
    * is scan → explode(literal probes) → score → top-k, and the q_nrm /
    * cos doubles are bit-identical to the join form (same inputs, same
    * fold order). */
  def bruteForceTopK(emb: DataFrame, stride: Int = 100, k: Int = 5,
                     maxProbes: Int = 4096): DataFrame = {
    val probes = queries(emb, stride).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)
    // the literal-model shape is only valid for a BOUNDED probe set —
    // n/stride grows with the corpus, so fail loudly before building an
    // unanalyzable million-literal plan (raise stride, or probe in
    // batches, rather than maxProbes)
    require(probes.length <= maxProbes,
      s"${probes.length} probes exceed maxProbes=$maxProbes: raise stride for this corpus")
    if (probes.isEmpty) {
      // explode(array()) yields a NullType the q.* extraction can't
      // resolve; return the typed empty result the join form produced
      return emb.sparkSession.emptyDataFrame
        .select(lit(0L).as("q_id"), lit(0L).as("n_id"), lit(0.0).as("cos"))
        .limit(0)
    }
    val probeStructs = probes.map { case (id, vec, nrm) =>
      struct(lit(id).as("q_id"), array(vec.map(lit(_)): _*).as("q_vec"), lit(nrm).as("q_nrm"))
    }
    val scored = candidates(emb)
      .select(col("n_id"), col("n_vec"), col("n_nrm"),
        explode(array(probeStructs: _*)).as("q"))
      .filter(col("n_id") =!= col("q.q_id"))
      .withColumn("cos",
        round(dot(col("q.q_vec"), col("n_vec")) / (col("q.q_nrm") * col("n_nrm")), 6))
    graft.ops.TopK.topKPerGroup(
      scored.select(col("q.q_id").as("q_id"), col("n_id"), col("cos")),
      Seq(col("q_id")),
      Seq(col("cos").desc, col("n_id").asc), k)
  }

  /** Sign-bit bucket over the first `bits` dimensions (1-based elements). */
  def bucket(vec: Column, bits: Int): Column =
    concat((1 to bits).map(i => when(element_at(vec, i) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** Approximate top-k: candidates restricted to the query's bucket. */
  def bucketedTopK(emb: DataFrame, stride: Int = 100, k: Int = 5, bits: Int = 6): DataFrame = {
    val cand = candidates(emb).withColumn("bkt", bucket(col("n_vec"), bits))
    val q = queries(emb, stride).withColumn("bkt", bucket(col("q_vec"), bits))
    val scored = cand.join(broadcast(q), Seq("bkt"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", round(dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm")), 6))
    graft.ops.TopK.topKPerGroup(
      scored.select(col("q_id"), col("bkt"), col("n_id"), col("cos")),
      Seq(col("q_id")),
      Seq(col("cos").desc, col("n_id").asc), k)
  }

  /** The query's bucket plus every one-bit-flip neighbor bucket (probes =
    * bits + 1) — multi-probe recovers most of the recall lost to the
    * coarse quantizer at (bits+1)/2^bits of brute-force cost, the standard
    * production trade. Sign boundaries are where near-neighbors land in
    * adjacent buckets; probing them catches those misses. */
  def probeBuckets(vec: Column, bits: Int): Column = {
    val exact = bucket(vec, bits)
    val flips = (1 to bits).map { i =>
      concat((1 to bits).map { j =>
        val b = when(element_at(vec, j) >= 0, lit("1")).otherwise(lit("0"))
        if (i == j) when(element_at(vec, j) >= 0, lit("0")).otherwise(lit("1")) else b
      }: _*)
    }
    array((exact +: flips): _*)
  }

  // ------------------------------------------------------------------ IVF

  /** Nearest trained cell for a vector column — an ARRAY-LOCAL argmax
    * against the driver-side centroid model, zero shuffle, smallest-cid
    * ties. Vectors never move to be assigned — the property that makes
    * IVF indexing a narrow map at 100 TB. Implemented as the compiled
    * [[graft.functions.IvfCellExpr]] (model = one reference object, plan
    * O(1) nodes): the earlier `greatest` over k literal-dot structs
    * carried O(k·dim) plan nodes, which blew past codegen method limits
    * around k≈80 and fell back to per-row interpreted struct compares —
    * measured 672 s vs sub-second for one 20k-vector assignment. Same
    * bit-exact left-to-right dots and tie rule; the injected-literal
    * oracle SQL is unchanged. */
  def ivfCell(v: Column, cents: Seq[(Int, Array[Double])]): Column =
    graft.functions.IvfCell.cellCol(v, cents)

  /** K-means centroids for IVF, trained with deterministic Lloyd
    * iterations: init = the first `nCells` vectors by vec_id; assignment
    * maximizes dot product (codegen'd); means are computed through
    * DECIMAL sums so they are bit-stable across partitionings and runs —
    * float averages would make cell boundaries (and therefore results)
    * run-dependent. Returns the (cell, centroid) model — a k x dim
    * artifact collected to the driver, which is how a serving system
    * ships it.
    *
    * @param trainStride Lloyd iterations aggregate a posexplode of every
    *   TRAINING vector (N_train × dim rows shuffled per iteration) — at
    *   corpus scale, train on the deterministic `vec_id % trainStride == 0`
    *   sample and assign the full set. The sample is content-stable (no
    *   rand()), so centroids are identical across runs and retries; k-means
    *   only needs the sample's distribution, and assignment stays a
    *   narrow full-corpus map either way. Must leave ≥ nCells vectors. */
  def ivfCentroids(emb: DataFrame, nCells: Int = 16, iters: Int = 2,
                   trainStride: Int = 1): Seq[(Int, Array[Double])] = {
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(pmod(col("vec_id"), lit(trainStride.toLong)) === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Seq[(Int, Array[Double])] = base.orderBy("vec_id").limit(nCells).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
    // over-striding must fail loudly, not quietly serve a collapsed index
    require(cents.length == nCells,
      s"training sample has only ${cents.length} vectors for $nCells cells: lower trainStride")
    for (_ <- 0 until iters) {
      val dims = base.select(ivfCell(col("v"), cents).as("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cid", "dim")
        .agg((sum(col("x").cast("decimal(28,14)")) / count(lit(1))).cast("double").as("mu"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      cents = dims.groupBy(_._1).toSeq.map { case (cid, rows) =>
        val arr = new Array[Double](rows.map(_._2).max + 1)
        rows.foreach { case (_, d, mu) => arr(d) = mu }
        (cid, arr)
      }.sortBy(_._1)
    }
    base.unpersist()
    cents
  }

  /** The most recently trained IVF model: (centroids, stride, k, probes).
    * TRAINING is not SQL-mirrorable (iterative float means), but
    * assignment + probing + scoring GIVEN the trained centroids is — so
    * the oracle gate injects the collected model back into a generated
    * DuckDB query as literal arrays ([[graft.OracleSqlExt.annIvfSql]]).
    * Verify runs every query before dumping oracle SQL, and Lloyd training
    * is deterministic (content-stable sample, DECIMAL means), so the
    * stashed model is exactly the one the dumped result used. */
  @volatile private[graft] var lastIvfModel: Option[(Seq[(Int, Array[Double])], Int, Int, Int)] = None

  /** SEPARATE stash for the serve-only `ann_ivf_indexed` registry entry
    * (written only by that entry, read only by its oracle): sharing one
    * slot between the rebuild and indexed twins would silently gate one
    * query against the other's model if their hyperparameters ever
    * drift — each entry's dynamic oracle must reflect exactly the model
    * that entry's plan used. */
  @volatile private[graft] var lastIvfModelIndexed: Option[(Seq[(Int, Array[Double])], Int, Int, Int)] = None

  /** SEPARATE stash for `ann_recall_eval` (same one-slot-per-entry rule
    * as [[lastIvfModelIndexed]]): the eval may sweep geometries the
    * serving entries don't use. */
  @volatile private[graft] var lastRecallEvalModel: Option[(Seq[(Int, Array[Double])], Int, Int, Int)] = None

  /** IVF approximate top-k: vectors are indexed by their nearest trained
    * centroid (one equi-join key per vector); each query probes its
    * `probes` best cells. Unlike the data-oblivious sign quantizer, the
    * cells follow the data distribution — the standard
    * train-once/serve-many ANN shape. Scoring math given the trained
    * centroids is oracle-gated via [[lastIvfModel]]; recall vs brute
    * force is asserted in TextAndAnnSpec. */
  def ivfTopK(emb: DataFrame, stride: Int = 100, k: Int = 5,
              nCells: Int = 16, iters: Int = 2, probes: Int = 2,
              trainStride: Int = 1): DataFrame = {
    val cents = ivfCentroids(emb, nCells, iters, trainStride)
    lastIvfModel = Some((cents, stride, k, probes))
    ivfTopKWith(emb, cents, stride, k, probes)
  }

  /** Persist trained IVF centroids under `dir` as (cid, cv) — the ANN
    * index's build-once/serve-many model artifact (the
    * [[graft.text.TextAnalysis.writeBpeModel]] lifecycle: a retrain
    * republishes via the staged delete+rename of
    * [[graft.sources.Sinks.publishSwap]]). */
  def writeIvfModel(emb: DataFrame, dir: String, nCells: Int = 16,
                    iters: Int = 2, trainStride: Int = 1): Unit = {
    val cents = ivfCentroids(emb, nCells, iters, trainStride)
    val spark = emb.sparkSession
    import spark.implicits._
    graft.sources.Sinks.publishSwap(dir) { staging =>
      cents.map { case (cid, arr) => (cid, arr.toSeq) }.toDF("cid", "cv")
        .coalesce(1).write.mode("overwrite").parquet(staging)
    }
  }

  /** Read a persisted centroid model back in cid order — a bounded model
    * collect (nCells rows), never data. */
  def readIvfModel(spark: org.apache.spark.sql.SparkSession,
                   dir: String): Seq[(Int, Array[Double])] =
    spark.read.parquet(dir).orderBy("cid").collect()
      .map(r => (r.getAs[Int]("cid"), r.getAs[Seq[Double]]("cv").toArray)).toSeq

  /** APPLY-only twin of [[ivfTopK]] for a given centroid model — the
    * serve path. Stashing is the CALLER's job (the rebuild entry stashes
    * to [[lastIvfModel]], the indexed entry to [[lastIvfModelIndexed]]),
    * so each registry entry's dynamic oracle reflects exactly the
    * centroids its own plan used. */
  def ivfTopKWith(emb: DataFrame, cents: Seq[(Int, Array[Double])],
                  stride: Int = 100, k: Int = 5, probes: Int = 2): DataFrame = {
    // indexing is a narrow map: each vector gets its cell from the
    // literal centroid model, no join, no shuffle
    val cand = candidates(emb).withColumn("cid", ivfCell(col("n_vec"), cents))
    // the (tiny) query set probes its `probes` best cells: explode the
    // per-cell scores array-locally and rank within the row's own cells
    val q = queries(emb, stride)
      .select(col("q_id"), col("q_vec"), col("q_nrm"),
        explode(array(cents.map { case (cid, arr) =>
          struct(dot(col("q_vec"), array(arr.map(lit(_)): _*)).as("d"), lit(cid).as("cid"))
        }: _*)).as("dc"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("dc.d").desc, col("dc.cid").asc)))
      .filter(col("rk") <= probes)
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("dc.cid").as("cid"))
    val scored = cand.join(broadcast(q), Seq("cid"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", round(dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm")), 6))
    graft.ops.TopK.topKPerGroup(
      scored.select(col("q_id"), col("n_id"), col("cos")).distinct(),
      Seq(col("q_id")),
      Seq(col("cos").desc, col("n_id").asc), k)
  }

  /** The REPORT run before committing an IVF geometry to the full
    * corpus — the ANN twin of [[graft.dedup.Dedup.blockingEval]]: exact
    * brute-force top-k truth vs the (nCells, probes) serve path, as ONE
    * row of (n_truth, n_approx, n_hit, recall, truth_mean_cos,
    * approx_mean_cos). `recall` is the fraction of true neighbors the
    * probed cells surface; the mean-cos pair is the quality gap that
    * tells you whether the misses even matter (a recall of 0.9 whose
    * replacement neighbors score within epsilon is a fine trade; the
    * same recall with a wide gap is not).
    *
    * Scale shape: truth is the bounded strided probe set against one
    * corpus scan (the [[bruteForceTopK]] literal-model plan — the truth
    * side is n/stride x n, run on a sample before committing, exactly
    * the blockingEval contract); the approx side is the production
    * [[ivfTopKWith]] plan; the comparison joins two (probes x k)-sized
    * top-k tables — metadata-sized, broadcast territory. Mean cosines
    * aggregate as exact integer micros (cos is already rounded to 6dp)
    * so partition-order float drift can't perturb the report. */
  def recallEval(emb: DataFrame, stride: Int = 100, k: Int = 5,
                 nCells: Int = 16, iters: Int = 2, probes: Int = 2,
                 trainStride: Int = 1): DataFrame = {
    val cents = ivfCentroids(emb, nCells, iters, trainStride)
    lastRecallEvalModel = Some((cents, stride, k, probes))
    val truth = bruteForceTopK(emb, stride, k)
      .select(col("q_id"), col("n_id"), col("cos").as("tcos"))
    val approx = ivfTopKWith(emb, cents, stride, k, probes)
      .select(col("q_id"), col("n_id"), col("cos").as("acos"))
    val joined = truth.join(approx, Seq("q_id", "n_id"), "full_outer")
    val micros = (c: Column) => round(c * lit(1000000L)).cast("long")
    joined.agg(
        count(col("tcos")).as("n_truth"),
        count(col("acos")).as("n_approx"),
        count(when(col("tcos").isNotNull && col("acos").isNotNull, lit(1))).as("n_hit"),
        sum(micros(col("tcos"))).as("tsum"),
        sum(micros(col("acos"))).as("asum"))
      .select(col("n_truth"), col("n_approx"), col("n_hit"),
        round(when(col("n_truth") > 0,
          col("n_hit").cast("double") / col("n_truth")).otherwise(lit(0.0)), 6).as("recall"),
        round(when(col("n_truth") > 0,
          col("tsum").cast("double") / lit(1e6) / col("n_truth")).otherwise(lit(0.0)), 6)
          .as("truth_mean_cos"),
        round(when(col("n_approx") > 0,
          col("asum").cast("double") / lit(1e6) / col("n_approx")).otherwise(lit(0.0)), 6)
          .as("approx_mean_cos"))
  }

  /** The most recently trained semantic-sort centroid model, with each
    * centroid's norm precomputed driver-side — the norm ships as the SAME
    * literal to both engines (the PQ `half` trick), so the cosine
    * division is bit-identical by construction. */
  @volatile private[graft] var lastSortModel: Option[Seq[(Int, Array[Double], Double)]] = None

  /** Semantic curriculum ordering — the in-context-pretraining layout:
    * cluster the corpus by trained IVF centroid, order each cluster by
    * similarity to its own centroid (most-central first), and assign a
    * GLOBAL contiguous 1-based position, so reading the output in `pos`
    * order visits semantically adjacent documents adjacently instead of
    * in random ingest order.
    *
    * Scale shape: training is the bounded-sample Lloyd of
    * [[ivfCentroids]]; assignment and own-centroid cosine are NARROW maps
    * against the literal model (no join, no shuffle to assign — the
    * [[ivfCell]] property); the global position comes from
    * [[graft.ops.Ranks.globalRank]] over (cid, cos desc, vec_id) — a
    * sketch-partitioned two-pass rank, never a single-partition window
    * over data. Zero-norm vectors have no cosine and are dropped, same
    * contract as every ANN path.
    *
    * Returns (vec_id, cid, cos, pos). */
  def semanticSort(emb: DataFrame, nCells: Int = 16, iters: Int = 2,
                   trainStride: Int = 1): DataFrame = {
    val cents = ivfCentroids(emb, nCells, iters, trainStride)
    val withNorm = cents.map { case (cid, arr) =>
      (cid, arr, math.sqrt(arr.map(x => x * x).sum))
    }
    lastSortModel = Some(withNorm)
    graft.ops.Ranks.globalRank(
      assignedWithOwnCos(emb, withNorm),
      Seq((col("cid"), true), (col("cos"), false), (col("vec_id"), true)), out = "pos")
      .drop("_n_total")
  }

  /** (vec_id, cid, cos): cluster assignment + round-6 cosine to the
    * row's OWN centroid — shared by [[semanticSort]] and
    * [[diverseBatches]]. The cosine is a when-chain over the literal
    * model keyed on the already-computed cid (nCells branches, one
    * 64-dim literal dot each — same plan-size class as ivfCell). */
  private def assignedWithOwnCos(emb: DataFrame,
                                 withNorm: Seq[(Int, Array[Double], Double)]): DataFrame = {
    val cents = withNorm.map { case (cid, arr, _) => (cid, arr) }
    val assigned = candidates(emb).withColumn("cid", ivfCell(col("n_vec"), cents))
    val cosOwn = withNorm.foldRight(lit(null).cast("double")) {
      case ((cid, arr, cn), acc) =>
        when(col("cid") === cid,
          dot(col("n_vec"), array(arr.map(lit(_)): _*)) / (col("n_nrm") * lit(cn)))
          .otherwise(acc)
    }
    assigned.select(col("n_id").as("vec_id"), col("cid"), round(cosOwn, 6).as("cos"))
  }

  /** The most recently trained diversity-batch model (+ batch size). */
  @volatile private[graft] var lastDiverseModel: Option[(Seq[(Int, Array[Double], Double)], Int)] = None

  /** Diversity batching — [[semanticSort]]'s complement: compose
    * training batches that SPREAD across semantic clusters instead of
    * concentrating within one (the anti-curriculum a contrastive or
    * mixing-sensitive run wants). Round-robin by within-cluster rank:
    * rank each vector inside its cluster (most-central first), order
    * globally by (rank, cid) and chunk into `batchSize` rows — while
    * every cluster still has unconsumed members at a rank, consecutive
    * rows cycle through clusters, so a batch draws from as many
    * clusters as it has rows.
    *
    * Scale shape: assignment + cosine are the narrow literal-model maps;
    * the within-cluster rank is a window PARTITIONED on cid (nCells
    * partitions, each corpus/nCells — never a global window over data);
    * the global chunk position is the two-pass [[graft.ops.Ranks
    * .globalRank]]. Returns (vec_id, cid, rk, pos, batch_id). */
  def diverseBatches(emb: DataFrame, batchSize: Int = 8, nCells: Int = 16,
                     iters: Int = 2, trainStride: Int = 1): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1: $batchSize")
    val cents = ivfCentroids(emb, nCells, iters, trainStride)
    val withNorm = cents.map { case (cid, arr) =>
      (cid, arr, math.sqrt(arr.map(x => x * x).sum))
    }
    lastDiverseModel = Some((withNorm, batchSize))
    val ranked = assignedWithOwnCos(emb, withNorm)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cid")
          .orderBy(col("cos").desc, col("vec_id").asc)).cast("long"))
      .select("vec_id", "cid", "rk")
    graft.ops.Ranks.globalRank(ranked,
      Seq((col("rk"), true), (col("cid"), true)), out = "pos")
      .withColumn("batch_id", expr(s"(pos - 1) div $batchSize"))
      .drop("_n_total")
  }

  /** The most recently trained cluster-cap model: (centroids, cap). */
  @volatile private[graft] var lastClusterCapModel: Option[(Seq[(Int, Array[Double])], Int)] = None

  /** Cluster-balanced corpus cap — the curation step between SemDeDup's
    * within-cluster dedup and D4's density pruning: assign every vector
    * to its trained cluster and keep at most `cap` per cluster
    * (deterministic keep order: vec_id ASC), so no single mode of the
    * embedding distribution can dominate the training mix. Over-dense
    * clusters (boilerplate, templated content) are truncated; rare
    * clusters pass through whole — `cell_n` rides along so the caller
    * can see exactly how much each cluster was cut.
    *
    * Scale shape: training is the bounded-sample Lloyd; assignment is
    * the narrow literal-model map (no join); the only shuffle is the
    * cid-PARTITIONED window (nCells partitions, each corpus/nCells —
    * grow nCells with the corpus exactly like [[graft.dedup.Dedup
    * .semanticDedup]]'s knob, which also keeps the per-cluster cap
    * meaningful). Returns kept rows (vec_id, cid, rk, cell_n). */
  def clusterCapSample(emb: DataFrame, cap: Int = 20, nCells: Int = 16,
                       iters: Int = 2, trainStride: Int = 1): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    val cents = ivfCentroids(emb, nCells, iters, trainStride)
    lastClusterCapModel = Some((cents, cap))
    clusterCapSampleWith(emb, cents, cap)
  }

  /** APPLY-only twin of [[clusterCapSample]] for a given centroid model
    * — the serve path (stashing is the caller's job, the ivfTopKWith
    * discipline). */
  def clusterCapSampleWith(emb: DataFrame, cents: Seq[(Int, Array[Double])],
                           cap: Int): DataFrame = {
    val byCell = org.apache.spark.sql.expressions.Window.partitionBy("cid")
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), ivfCell(col("v"), cents).as("cid"))
      .withColumn("rk", row_number().over(byCell.orderBy("vec_id")).cast("long"))
      .withColumn("cell_n", count(lit(1)).over(byCell).cast("long"))
      .filter(col("rk") <= cap)
      .select(col("vec_id"), col("cid").cast("long").as("cid"),
        col("rk"), col("cell_n"))
  }

  /** The most recently trained prototypicality model:
    * (centroids-with-norms, loP, hiP). */
  @volatile private[graft] var lastProtoModel: Option[(Seq[(Int, Array[Double], Double)], Double, Double)] = None

  /** D4-style prototypicality pruning (Tirumala et al. 2023): flag each
    * vector by its cosine to its OWN trained centroid — the densest core
    * (`cos >= hi` quantile) is semantic-duplication risk the D4 recipe
    * prunes before re-clustering, and the far tail (`cos <= lo`) is the
    * off-manifold noise slice; the middle keeps. Both thresholds are the
    * corpus's OWN quantiles of the round-6 cosine (the
    * [[graft.text.TextAnalysis.qualityGate]] dynamic-threshold form),
    * rounded to 6 digits before comparing so the boundary sets are
    * engine-identical; swap exact `percentile` for `approx_percentile`
    * at 100 TB (the documented sketch-twin trade).
    *
    * Scale shape: training is the bounded-sample Lloyd; assignment +
    * own-centroid cosine are narrow literal-model maps (no join); the
    * thresholds are one grouping-free aggregate broadcast against the
    * scored scan. Returns (vec_id, cid, cos, flag). */
  def prototypicality(emb: DataFrame, nCells: Int = 16, iters: Int = 2,
                      trainStride: Int = 1, loP: Double = 0.1,
                      hiP: Double = 0.9): DataFrame = {
    require(0 < loP && loP < hiP && hiP < 1,
      s"need 0 < loP < hiP < 1; got $loP, $hiP")
    val cents = ivfCentroids(emb, nCells, iters, trainStride)
    val withNorm = cents.map { case (cid, arr) =>
      (cid, arr, math.sqrt(arr.map(x => x * x).sum))
    }
    lastProtoModel = Some((withNorm, loP, hiP))
    // scored feeds both the quantile aggregate and the flag projection;
    // persist so the corpus is scanned+assigned once. The cache backs
    // the (corpus-sized) RESULT, so it stays alive — the documented
    // qualityGate/tfidf caller-owned-cache trade: the session owner
    // releases it (Verify/Bench clear the cache between queries)
    val scored = assignedWithOwnCos(emb, withNorm)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thr = scored.agg(
      round(expr(s"percentile(cos, $loP)"), 6).as("lo"),
      round(expr(s"percentile(cos, $hiP)"), 6).as("hi"))
    scored.crossJoin(broadcast(thr))
      .select(col("vec_id"), col("cid"), col("cos"),
        when(col("cos") >= col("hi"), "prototype")
          .when(col("cos") <= col("lo"), "outlier")
          .otherwise("keep").as("flag"))
  }

  /** The most recently trained hard-negative model:
    * (centroids, stride, k, bits). */
  @volatile private[graft] var lastHardNegModel: Option[(Seq[(Int, Array[Double])], Int, Int, Int)] = None

  /** Hard-negative mining — the contrastive-training data op: each
    * query's top-k most SIMILAR candidates drawn from a DIFFERENT
    * trained semantic cluster. High cosine makes the pair hard; the
    * cluster boundary is the (proxy) negative label — the standard
    * in-batch-negatives upgrade for embedding training.
    *
    * Composition of two existing serve shapes: sign-LSH multi-probe
    * candidate generation ([[multiProbeTopK]] — candidates restricted to
    * the query's probe buckets, never all pairs) with the literal-model
    * cluster assignment of [[ivfCell]] on BOTH sides (narrow maps, no
    * join to assign). The cross-cluster filter runs inside the bucket
    * join, so same-cluster easy negatives never reach the ranker.
    * DYNAMIC oracle: the trained centroids inject as literals, like
    * ann_ivf_topk. */
  def hardNegatives(emb: DataFrame, stride: Int = 100, k: Int = 5, bits: Int = 6,
                    nCells: Int = 16, iters: Int = 2, trainStride: Int = 1): DataFrame = {
    val cents = ivfCentroids(emb, nCells, iters, trainStride)
    lastHardNegModel = Some((cents, stride, k, bits))
    val cand = candidates(emb)
      .withColumn("bkt", bucket(col("n_vec"), bits))
      .withColumn("cid", ivfCell(col("n_vec"), cents))
    val q = queries(emb, stride)
      .withColumn("qcid", ivfCell(col("q_vec"), cents))
      .withColumn("bkt", explode(probeBuckets(col("q_vec"), bits)))
    val scored = cand.join(broadcast(q), Seq("bkt"))
      .filter(col("n_id") =!= col("q_id") && col("cid") =!= col("qcid"))
      .withColumn("cos", round(dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm")), 6))
    graft.ops.TopK.topKPerGroup(
      scored.select(col("q_id"), col("n_id"), col("cos")).distinct(),
      Seq(col("q_id")),
      Seq(col("cos").desc, col("n_id").asc), k)
  }

  /** KNN self-join: EVERY vector gets its k approximate nearest
    * neighbors — the all-pairs form of [[multiProbeTopK]], the shape a
    * training pipeline needs for graph-based curation (semantic dedup
    * clusters, diversity sampling, label propagation).
    *
    * The query side IS the corpus, so the broadcast/literal-model tricks
    * of the serve-path operators do not apply: both sides shuffle once on
    * the bucket key and the join runs bucket-local. Per-bucket work is
    * O(N²/2^bits) with multi-probe fan-out (bits+1 probes per vector)
    * recovering boundary recall — `bits` is the scale knob: size
    * 2^bits ≫ partitions so buckets stay memory-sized, and a skewed sign
    * pattern (e.g. all-positive corpora) calls for more bits or salted
    * sub-bucketing, exactly the AQE-skew/salting note on the other
    * bucketed joins. */
  def knnJoin(emb: DataFrame, k: Int = 5, bits: Int = 6): DataFrame = {
    val cand = candidates(emb).withColumn("bkt", bucket(col("n_vec"), bits))
    val q = candidates(emb)
      .select(col("n_id").as("q_id"), col("n_vec").as("q_vec"), col("n_nrm").as("q_nrm"))
      .withColumn("bkt", explode(probeBuckets(col("q_vec"), bits)))
    knnScoreRank(cand, q, Seq("bkt"), k)
  }

  /** Shared tail of the KNN self-joins: bucket join, self-pair filter,
    * cosine, probe-dedup, partial+final top-k — ONE definition so the
    * plain and salted variants can never diverge in scoring/ranking. */
  private def knnScoreRank(cand: DataFrame, q: DataFrame,
                           joinKeys: Seq[String], k: Int): DataFrame = {
    val scored = cand.join(q, joinKeys)
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", round(dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm")), 6))
    // a neighbor can surface through several probes -> dedup before rank
    graft.ops.TopK.topKPerGroup(
      scored.select(col("q_id"), col("n_id"), col("cos")).distinct(),
      Seq(col("q_id")),
      Seq(col("cos").desc, col("n_id").asc), k)
  }

  /** Skew-safe [[knnJoin]]: identical pairs, bounded per-task work.
    *
    * The plain bucket join's 100 TB hazard is a HOT bucket — a skewed
    * sign pattern (an all-positive embedding model collapses the whole
    * corpus into one bucket) turns the bucket-local O(n_b²) into one
    * task owning the entire join. The standard salted-join rewrite from
    * [[graft.ops.Salt]] applies cleanly here: the candidate side of each
    * bucket splits `salts` ways by a content-stable key (`n_id mod
    * salts` — never partition-dependent), the query side replicates
    * across all salts, and the join keys on (bkt, salt). Every
    * same-bucket (query, neighbor) pair still meets exactly once — the
    * neighbor's salt is a function of its id, and the query visits every
    * salt — so the result is row-identical to [[knnJoin]] (the registry
    * gates BOTH against the same oracle SQL, proving the rewrite
    * invisible), while the hot bucket's work spreads over `salts` tasks
    * at the cost of replicating the (id, vec, norm) query rows. */
  def knnJoinSalted(emb: DataFrame, k: Int = 5, bits: Int = 6,
                    salts: Int = 8): DataFrame = {
    val cand = candidates(emb).withColumn("bkt", bucket(col("n_vec"), bits))
      .withColumn("salt", pmod(col("n_id"), lit(salts.toLong)))
    val q = candidates(emb)
      .select(col("n_id").as("q_id"), col("n_vec").as("q_vec"), col("n_nrm").as("q_nrm"))
      .withColumn("bkt", explode(probeBuckets(col("q_vec"), bits)))
      .withColumn("salt", explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    knnScoreRank(cand, q, Seq("bkt", "salt"), k)
  }

  /** Multi-probe approximate top-k: candidates from the query's bucket and
    * all one-bit-flip buckets. */
  def multiProbeTopK(emb: DataFrame, stride: Int = 100, k: Int = 5, bits: Int = 6): DataFrame = {
    val cand = candidates(emb).withColumn("bkt", bucket(col("n_vec"), bits))
    val q = queries(emb, stride)
      .withColumn("bkt", explode(probeBuckets(col("q_vec"), bits)))
    val scored = cand.join(broadcast(q), Seq("bkt"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", round(dot(col("q_vec"), col("n_vec")) / (col("q_nrm") * col("n_nrm")), 6))
    // a neighbor can surface through several probes -> dedup before rank
    graft.ops.TopK.topKPerGroup(
      scored.select(col("q_id"), col("n_id"), col("cos")).distinct(),
      Seq(col("q_id")),
      Seq(col("cos").desc, col("n_id").asc), k)
  }
}
