package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dot

/** Principal-component analysis over the embedding column — the
  * dimensionality-reduction step a 100 TB pipeline runs BEFORE
  * clustering/ANN/dedup when the raw dimension is wasteful (OPQ-style
  * rotation, whitening for SemDeDup, 2-D corpus maps all start here).
  *
  * Deployment shape mirrors the IVF family ([[Ann.ivfCentroids]]):
  * TRAIN on a deterministic `vec_id % trainStride == 0` sample with
  * every corpus-side statistic an exact DECIMAL aggregate (bit-stable
  * across partitionings and retries — float sums would make the
  * principal axes run-dependent), SOLVE the bounded dim×dim
  * eigenproblem driver-side (cyclic Jacobi, fixed rotation order, so
  * the eigenvectors are a pure function of the covariance), and APPLY
  * as a narrow array-local map: each vector's projection is k
  * left-to-right literal dot products, zero joins, zero shuffles —
  * vectors never move to be projected.
  *
  * Oracle discipline is the trained-model one: training (iterative
  * float rotations) is not SQL-mirrorable, but projection GIVEN the
  * model is — the run stashes the components and the generated DuckDB
  * query re-projects with the SAME literal arrays and the SAME
  * `list_reduce` fold order, so engine and oracle produce bit-identical
  * doubles before round-6.
  */
object Pca {

  /** One principal component: 0-based rank (by descending eigenvalue),
    * the unit-norm axis, its eigenvalue (= population variance of the
    * training sample along the axis), and the mean-centering offset
    * `dot(mean, comp)` precomputed driver-side so BOTH engines project
    * as `dot(v, comp) - offset` — one literal subtraction instead of a
    * per-dimension centering that would double the fold length. */
  final case class Component(pc: Int, comp: Array[Double], eigval: Double,
                             offset: Double, trace: Double)

  /** Train a k-component PCA model. Population covariance (divide by n,
    * not n−1 — the convention under which eigenvalue == empirical
    * variance of the projection, the identity
    * `embedding_pca_variance` gates). Raw second moments and dimension
    * sums aggregate as DECIMALs in ONE pass each over the sample
    * (map-side combined, outputs bounded by dim²), and
    * `cov = S2/n − mu·muᵀ` assembles driver-side in a fixed order.
    *
    * @param trainStride like IVF: the moment pass shuffles
    *   N_train × dim(dim+1)/2 cells — at corpus scale train on the
    *   content-stable sample (no rand(), so the model is identical
    *   across runs and retries) and project the full set; PCA only
    *   needs the sample's second moments. */
  def pcaTrain(emb: DataFrame, k: Int = 4, trainStride: Int = 1): Seq[Component] = {
    val base = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(pmod(col("vec_id"), lit(trainStride.toLong)) === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dimSums = base.select(posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("i").agg(
          sum(col("x").cast("decimal(38,14)")).as("s"),
          count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getDecimal(1).doubleValue(), r.getLong(2)))
      require(dimSums.nonEmpty, "pcaTrain: empty training sample — lower trainStride")
      val d = dimSums.map(_._1).max + 1
      val n = dimSums.head._3
      require(n >= 2, s"pcaTrain: need >= 2 training vectors, got $n")
      require(k >= 1 && k <= d, s"pcaTrain: k=$k outside [1, $d]")
      val mu = new Array[Double](d)
      dimSums.foreach { case (i, s, cnt) =>
        require(cnt == n, s"pcaTrain: ragged embedding dimension at $i ($cnt vs $n)")
        mu(i) = s / n
      }
      // upper-triangle raw moments S2[i][j] = sum_v v_i * v_j: explode each
      // vector to (i, x, tail-slice), pair x against every later element
      // array-locally, DECIMAL-sum per (i, j) — bounded d(d+1)/2 output rows
      val cells = base
        .select(col("v"), posexplode(col("v")).as(Seq("i", "x")))
        .select(col("i"), col("x"),
          posexplode(slice(col("v"), col("i") + 1, size(col("v")) - col("i"))).as(Seq("dj", "y")))
        .select(col("i"), (col("i") + col("dj")).as("j"),
          (col("x") * col("y")).cast("decimal(38,14)").as("p"))
        .groupBy("i", "j").agg(sum(col("p")).as("s"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2).doubleValue())).toMap
      val cov = Array.tabulate(d, d) { (i, j) =>
        val (a, b) = if (i <= j) (i, j) else (j, i)
        cells((a, b)) / n - mu(i) * mu(j)
      }
      val (eigvals, eigvecs) = jacobiEigen(cov)
      // rank by descending eigenvalue, lower original index on ties;
      // canonical sign: the largest-|component| entry (lowest index on
      // ties) is positive, so the axis direction is a pure function of
      // the data, not of rotation history
      val order = (0 until d).sortBy(c => (-eigvals(c), c)).take(k)
      val trace = eigvals.sum // = total variance (rotation preserves it)
      order.zipWithIndex.map { case (c, rank) =>
        val raw = Array.tabulate(d)(i => eigvecs(i)(c))
        val pivot = raw.indices.maxBy(i => (math.abs(raw(i)), -i))
        val comp = if (raw(pivot) < 0) raw.map(-_) else raw
        Component(rank, comp, eigvals(c), dotD(mu, comp), trace)
      }
    } finally base.unpersist()
  }

  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Cyclic-by-rows Jacobi eigensolver for a symmetric matrix — the
    * textbook rotation (Golub & Van Loan §8.5) with a FIXED (p, q)
    * sweep order and a fixed sweep cap, so the result is deterministic.
    * Returns (eigenvalues, eigenvector columns); dim is bounded (the
    * embedding width), so O(d³) per sweep is driver-trivial. */
  private def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until d; j <- i + 1 until d) s += a(i)(j) * a(i)(j)
      s
    }
    var sweep = 0
    while (sweep < 64 && off() > 1e-20) {
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        val apq = a(p)(q)
        if (math.abs(apq) > 1e-300) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
          val t = {
            val s = if (theta >= 0) 1.0 else -1.0
            s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (j <- 0 until d) {
            val apj = a(p)(j); val aqj = a(q)(j)
            a(p)(j) = c * apj - s * aqj
            a(q)(j) = s * apj + c * aqj
          }
          for (i <- 0 until d) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Project every vector onto the model's components — the serve path:
    * k literal left-to-right dots minus the precomputed mean offset,
    * each rounded to 6dp. A narrow map (no joins, no shuffles); columns
    * `pc0..pc{k-1}`. */
  /** The single projection expression both surfaces share: one literal
    * left-to-right dot minus the precomputed mean offset, round-6. */
  private def projCol(m: Component): org.apache.spark.sql.Column =
    round(dot(col("embedding").cast("array<double>"),
      array(m.comp.map(lit(_)): _*)) - lit(m.offset), 6).as(s"pc${m.pc}")

  def pcaProject(emb: DataFrame, model: Seq[Component]): DataFrame = {
    require(model.nonEmpty, "pcaProject: empty model")
    emb.select(col("vec_id") +: model.map(projCol): _*)
  }

  /** Train-and-project in one call (the rebuild registry entry).
    * Stashing is the CALLER's job — each registry entry stashes to its
    * OWN slot so its dynamic oracle reflects exactly the model its plan
    * used. */
  def pca(emb: DataFrame, k: Int = 4, trainStride: Int = 1): (Seq[Component], DataFrame) = {
    val model = pcaTrain(emb, k, trainStride)
    (model, pcaProject(emb, model))
  }

  /** The spectrum report gating the TRAINING math end to end: per
    * component, the empirical mean and population variance of the
    * full-corpus projection, aggregated as exact integer micros (the
    * projections are already round-6, so both engines sum identical
    * integers — no accumulation-order drift), beside the model's own
    * eigenvalue and explained-variance share as literals. When
    * trainStride == 1 the empirical variance EQUALS the eigenvalue (to
    * Jacobi tolerance + micro rounding) — a wrong covariance, a wrong
    * eigensolve, or a wrong projection all break the match. */
  def pcaVariance(emb: DataFrame, model: Seq[Component]): DataFrame = {
    val proj = pcaProject(emb, model)
    val pairs = model.map(m => struct(lit(m.pc).as("pc"), col(s"pc${m.pc}").as("p")))
    val micros = (c: Column) => round(c * lit(1000000L)).cast("long")
    val eigCol = model.foldLeft(lit(null).cast("double")) { (acc, m) =>
      when(col("pc") === m.pc, lit(math.rint(m.eigval * 1e6) / 1e6)).otherwise(acc)
    }
    val shareCol = model.foldLeft(lit(null).cast("double")) { (acc, m) =>
      when(col("pc") === m.pc, lit(math.rint(m.eigval / m.trace * 1e6) / 1e6)).otherwise(acc)
    }
    proj.select(explode(array(pairs: _*)).as("s"))
      .select(col("s.pc").as("pc"), micros(col("s.p")).as("mi"))
      .groupBy("pc").agg(
        count(lit(1)).as("n"),
        sum(col("mi").cast("decimal(38,0)")).as("s1"),
        sum((col("mi") * col("mi")).cast("decimal(38,0)")).as("s2"))
      .select(col("pc"), col("n"),
        round(col("s1").cast("double") / col("n") / lit(1e6), 6).as("mean_pc"),
        round((col("s2").cast("double") / col("n")
          - (col("s1").cast("double") / col("n")) * (col("s1").cast("double") / col("n")))
          / lit(1e12), 6).as("var_pc"),
        round(eigCol, 6).as("eigval"),
        round(shareCol, 6).as("explained_frac"))
      .orderBy("pc")
  }

  /** The (pc, x) long form of a projection — k rows per vector, shared
    * by the batch drift operator and the streaming monitor. `keep`
    * columns pass through unchanged (the batch operator carries its
    * group column), so the two surfaces can never diverge on the
    * projection itself. */
  def pcaLong(emb: DataFrame, model: Seq[Component],
              keep: Seq[String] = Nil): DataFrame = {
    require(model.nonEmpty, "pcaLong: empty model")
    emb.select(keep.map(col) ++ model.map(projCol): _*)
      .select(keep.map(col) :+ explode(array(model.map(m =>
        struct(lit(m.pc).as("pc"), col(s"pc${m.pc}").as("x"))): _*)).as("s"): _*)
      .select(col("s.pc").as("pc") +: keep.map(col) :+ col("s.x").as("x"): _*)
  }

  /** Embedding drift — the vector-space monitoring leg the scalar PSI
    * can't see: project every vector onto the persisted principal axes
    * and run the [[graft.ops.TableProfile.driftPsiQuantile]] algebra per
    * component — per (pc, group), the population-stability index of the
    * group's projection distribution against the pooled reference, with
    * exact per-pc quantile edges. A drifting embedding source (new
    * encoder version, shifted content mix) moves along the HIGH-variance
    * axes first, which is exactly where this looks; raw-dimension PSI
    * would dilute the signal across d noisy coordinates.
    *
    * Scale shape: projection is the narrow literal map, the long form is
    * k rows per vector (k = model size, not d), edges are k bounded rows
    * broadcast back, and PSI runs over the bounded (pc × group × bin)
    * count table — same DECIMAL(28,18) term accumulation as the scalar
    * drift ops so partition order can't wiggle the sum. */
  def driftEmbeddingPca(emb: DataFrame, model: Seq[Component],
                        groupCol: String = "label", nBins: Int = 10,
                        eps: Double = 1e-4): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"nBins out of [2, 1000]: $nBins")
    require(eps > 0, s"eps must be positive, got $eps")
    val longF = pcaLong(emb, model, keep = Seq(groupCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qs = (1 until nBins).map(i => i.toDouble / nBins).mkString(", ")
    val edges = longF.groupBy("pc")
      .agg(expr(s"transform(percentile(x, array($qs)), v -> round(v, 6))").as("le"))
    val binned = longF.join(broadcast(edges), Seq("pc"))
      .select(col("pc"), col(groupCol),
        size(expr("filter(le, v -> x > v)")).cast("long").as("bin"))
      .groupBy("pc", groupCol, "bin").agg(count(lit(1L)).as("cn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ref = binned.groupBy("pc", "bin").agg(sum("cn").as("rn"))
    val rt = ref.groupBy("pc").agg(sum("rn").as("rt"))
    val refP = ref.join(broadcast(rt), Seq("pc"))
      .select(col("pc"), col("bin"), (col("rn") / col("rt")).as("pr"))
    val curTot = binned.groupBy("pc", groupCol).agg(sum("cn").as("ct"))
    val out = curTot.join(broadcast(refP), Seq("pc"))
      .join(binned, Seq("pc", groupCol, "bin"), "left")
      .select(col("pc"), col(groupCol), col("pr"),
        greatest(coalesce(col("cn"), lit(0L)) / col("ct"), lit(eps)).as("pq"))
      .withColumn("term",
        ((col("pq") - col("pr")) * log(col("pq") / col("pr"))).cast("decimal(28,18)"))
      .groupBy("pc", groupCol)
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"),
        count(lit(1L)).as("n_bins"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize the bounded result, then release upstream
    longF.unpersist(); binned.unpersist()
    out
  }

  /** Dedicated model stash for the `drift_embedding` registry entry. */
  @volatile private[graft] var lastDriftModel: Option[Seq[Component]] = None

  /** The reduce-then-index decision table — [[pcaVariance]] says how
    * much variance the projection keeps, THIS says what that costs in
    * retrieval quality: exact top-k in ORIGINAL space (truth) vs exact
    * top-k in the REDUCED space, with the reduced picks re-scored by
    * their original cosine, as one report row of counts, recall, and
    * the truth-vs-approx original-cosine means (exact integer micros —
    * the [[Ann.recallEval]] discipline). Run before committing a
    * component count for a 100 TB reduce-then-index ANN deployment.
    *
    * Scale shape: both probe sets are bounded literal models (the
    * [[Ann.bruteForceTopK]] contract — stride bounds them); the reduced
    * chain scores k-wide arrays, not d-wide; the original-cosine
    * re-score joins the tiny approx pair set back to the corpus
    * broadcast. Truth's per-query top-k maximizes original cosine by
    * definition, so truth_mean_cos >= approx_mean_cos always —
    * spec-pinned. */
  def pcaRecallEval(emb: DataFrame, model: Seq[Component],
                    stride: Int = 100, k: Int = 5): DataFrame = {
    import graft.functions.VectorFunctions.dot
    val truth = Ann.bruteForceTopK(emb, stride, k)
      .select(col("q_id"), col("n_id"), col("cos").as("tcos"))
    // reduced-space brute force: same literal-probe shape over the
    // round-6 projections. TWO guards: vectors with no defined ORIGINAL
    // cosine leave the eval entirely (a zero vector still projects to
    // -offset, so the original guard must come first), and zero-norm
    // PROJECTIONS drop like the original chain's zero-norm vectors (a
    // nonzero vector can project to zero when it lies in the discarded
    // subspace)
    val ovec = col("embedding").cast("array<double>")
    val asVec = array(model.map(m => col(s"pc${m.pc}")): _*)
    // the reduced chain IS Ann.bruteForceTopK over the projected frame
    // (same literal-probe model, norm guards, round-6 scoring,
    // deterministic tie-break, maxProbes require, and the empty-probe
    // typed-empty return) — one definition, so the two spaces' chains
    // cannot drift apart
    val proj = pcaProject(emb.filter(sqrt(dot(ovec, ovec)) > 0), model)
      .select(col("vec_id"), asVec.as("embedding"))
    val approx = Ann.bruteForceTopK(proj, stride, k)
      .select(col("q_id"), col("n_id"))
    // re-score the reduced picks by their ORIGINAL cosine — the metric
    // the truth side ranks by, so the two means are comparable
    val orig = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("ov"))
      .withColumn("on", sqrt(dot(col("ov"), col("ov"))))
    val rescored = broadcast(approx)
      .join(orig.select(col("vec_id").as("q_id"), col("ov").as("qv"), col("on").as("qn")), Seq("q_id"))
      .join(orig.select(col("vec_id").as("n_id"), col("ov").as("nv"), col("on").as("nn")), Seq("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("acos"))
    val joined = truth.join(rescored, Seq("q_id", "n_id"), "full_outer")
    val micros = (c: org.apache.spark.sql.Column) => round(c * lit(1000000L)).cast("long")
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

  /** Dedicated model stash for the `ann_pca_recall_eval` entry. */
  @volatile private[graft] var lastPcaRecallModel: Option[Seq[Component]] = None

  /** Persist the PCA model under `dir` (staged publish) — one row per
    * component; the build-once half of the serve-many lifecycle. */
  def writePcaModel(emb: DataFrame, dir: String, k: Int = 4,
                    trainStride: Int = 1): Unit = {
    val model = pcaTrain(emb, k, trainStride)
    val spark = emb.sparkSession
    import spark.implicits._
    graft.sources.Sinks.publishSwap(dir) { staging =>
      model.map(m => (m.pc, m.comp.toSeq, m.eigval, m.offset, m.trace))
        .toDF("pc", "comp", "eigval", "offset", "trace")
        .coalesce(1).write.mode("overwrite").parquet(staging)
    }
  }

  /** Read a persisted PCA model back in pc order — a bounded k×dim
    * artifact, read once per serve. */
  def readPcaModel(spark: org.apache.spark.sql.SparkSession,
                   dir: String): Seq[Component] =
    spark.read.parquet(dir).orderBy("pc").collect()
      .map(r => Component(r.getAs[Int]("pc"), r.getAs[Seq[Double]]("comp").toArray,
        r.getAs[Double]("eigval"), r.getAs[Double]("offset"),
        r.getAs[Double]("trace"))).toSeq

  /** Most recently trained model per registry entry (one slot per entry
    * — the [[Ann.lastIvfModelIndexed]] discipline, so no entry ever
    * gates against another entry's model). */
  @volatile private[graft] var lastPcaModel: Option[Seq[Component]] = None
  @volatile private[graft] var lastPcaVarianceModel: Option[Seq[Component]] = None
  @volatile private[graft] var lastPcaModelIndexed: Option[Seq[Component]] = None
}
