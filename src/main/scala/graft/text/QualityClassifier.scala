package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** TRAINED quality classifier — the learned counterpart of the fixed
  * heuristic in [[TextAnalysis.quality]]. Modern curation pipelines
  * (CCNet's fasttext LM filter, the DCLM-baseline fasttext classifier,
  * GPT-3's logistic-regression quality filter over a curated-positive /
  * random-web-negative split) LEARN the quality boundary from weak labels
  * instead of hand-tuning it. This is that operator as deterministic
  * ridge-Newton (IRLS) logistic regression over engine-computable
  * document features, with weak labels derived from corpus metadata
  * (here: `lang = 'en'` as the curated-positive proxy — the English
  * stopword ratio is genuinely discriminative, so the learner has signal).
  *
  * Scale shape (the [[graft.similarity.Ann.ivfCentroids]] contract):
  *  - the feature table is ONE shuffle-free pass over the corpus (pure
  *    per-document Column algebra), persisted once and reused by every
  *    Newton iteration;
  *  - each iteration is a single grouping-free aggregation (map-side
  *    partial sums) collecting ONE bounded row (k gradients + k(k+1)/2
  *    Hessian cells) to the driver — the same bounded-model `.collect()`
  *    as Lloyd iterations, never data rows;
  *  - at 100 TB you train on a deterministic SAMPLE and apply the
  *    resulting literal weights to the full corpus — scoring is again a
  *    shuffle-free map, so the apply path is an embarrassingly parallel
  *    scan with full pushdown.
  *
  * Cross-engine determinism: gradient and Hessian sums are
  * DECIMAL(28,18)-cast per term (exactly associative, so Spark's partitioning can't change the
  * result — the [[TextAnalysis.lmScore]] discipline); the trained weights
  * are stashed and injected into the DuckDB oracle as double literals
  * (the ann_ivf_topk pattern: training isn't SQL-mirrorable, scoring
  * given the model is). Scores round to 6 digits, killing the <=1-ulp
  * `exp`/`ln` drift.
  */
object QualityClassifier {

  /** Feature names, in weight order (index 0 = bias). */
  val featureNames: Seq[String] = Seq("bias", "punct_ratio", "stop_ratio", "ttr", "log_tokens")

  /** Last trained weight vector, stashed by [[score]]/[[eval]] for the
    * dynamic oracle. */
  @volatile var lastWeights: Option[Seq[Double]] = None

  /** Per-document features + weak label, one shuffle-free projection:
    * (doc_id, label, pr, sr, ttr, lt). pr/sr/ttr are exact ratios of
    * longs (bit-identical across engines); lt = ln(1+n_tokens) has <=1
    * ulp drift that dies in the round-6 score. */
  def features(docs: DataFrame): DataFrame = {
    val tl    = TextAnalysis.toks(col("text"))
    val nTok  = size(tl).cast("long")
    val nChar = length(col("text")).cast("long")
    docs.select(
      col("doc_id"),
      when(col("lang") === "en", 1L).otherwise(0L).as("label"),
      when(nChar > 0, TextAnalysis.punctCount(col("text")) / nChar).otherwise(lit(0.0)).as("pr"),
      when(nTok > 0, TextAnalysis.stopTokenCount(tl) / nTok).otherwise(lit(0.0)).as("sr"),
      when(nTok > 0, size(array_distinct(tl)).cast("long") / nTok).otherwise(lit(0.0)).as("ttr"),
      log(lit(1L) + nTok).as("lt"))
  }

  /** w·x for a literal weight vector — left-associated adds in weight
    * order, the SAME evaluation order the oracle SQL writes, so both
    * engines round identically at every step. */
  private def dot(w: Seq[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("pr") + lit(w(2)) * col("sr") +
      lit(w(3)) * col("ttr") + lit(w(4)) * col("lt")

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Deterministic ridge-regularized Newton/IRLS on the logistic loss.
    * `feats` must be [[features]]-shaped; pass a persisted frame — every
    * iteration re-reads it. Per iteration, ONE grouping-free aggregation
    * computes the gradient g_j = Σ (y_i − p_i)·x_ij and the Hessian's
    * upper triangle H_jk = Σ p_i(1−p_i)·x_ij·x_ik (5 + 15 cells for 5
    * features — bounded model state, the Lloyd-collect pattern), the
    * driver solves the 5×5 system (H + λnI)·d = g and steps w += d.
    * Newton is affine-invariant, so no feature standardization is needed
    * (plain GD here oscillates on the ~10x-spread raw scales), and the
    * ridge keeps the step defined when classes are linearly separable
    * (the unregularized MLE diverges). Quadratic convergence: ~10
    * iterations reach machine precision where first-order GD needs
    * hundreds. Every aggregated term casts to DECIMAL(28,18) BEFORE its
    * sum — exactly associative, so partitioning cannot perturb the
    * trained model. Returns weights in [[featureNames]] order. */
  def train(feats: DataFrame, iters: Int = 8, ridge: Double = 1e-3): Seq[Double] = {
    require(iters >= 1 && ridge > 0, s"iters >= 1 and ridge > 0 required; got $iters, $ridge")
    val k = featureNames.size
    val xs: Seq[Column] = Seq(lit(1.0), col("pr"), col("sr"), col("ttr"), col("lt"))
    var w = Seq.fill(k)(0.0)
    var n = 0.0
    var it = 0
    while (it < iters) {
      val p = sigmoid(dot(w))
      val grads = xs.zipWithIndex.map { case (x, j) =>
        sum(((col("label") - col("p")) * x).cast("decimal(28,18)")).as(s"g$j")
      }
      val upper = for (j <- 0 until k; l <- j until k) yield (j, l)
      val hess = upper.map { case (j, l) =>
        sum((col("p") * (lit(1.0) - col("p")) * xs(j) * xs(l)).cast("decimal(28,18)"))
          .as(s"h${j}_$l")
      }
      val aggs = grads ++ hess :+ count(lit(1L)).as("n")
      val row = feats.select(col("label"), col("pr"), col("sr"), col("ttr"), col("lt"),
          p.as("p"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()(0) // ONE bounded row: k gradients + k(k+1)/2 Hessian cells
      require(row.getLong(aggs.size - 1) > 0, "cannot train on an empty corpus")
      n = row.getLong(aggs.size - 1).toDouble
      val g = Array.tabulate(k)(j => row.getDecimal(j).doubleValue())
      val h = Array.ofDim[Double](k, k)
      upper.zipWithIndex.foreach { case ((j, l), i) =>
        val v = row.getDecimal(k + i).doubleValue()
        h(j)(l) = v; h(l)(j) = v
      }
      (0 until k).foreach(j => h(j)(j) += ridge * n)
      val d = solve(h, g)
      w = w.zipWithIndex.map { case (wj, j) => wj + d(j) }
      it += 1
    }
    w
  }

  /** Gaussian elimination with partial pivoting on a k×k SPD-ish system —
    * driver-side, deterministic (fixed operation order on doubles). */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val k = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (c <- 0 until k) {
      val piv = (c until k).maxBy(r => math.abs(a(r)(c)))
      val tmp = a(c); a(c) = a(piv); a(piv) = tmp
      val tb = b(c); b(c) = b(piv); b(piv) = tb
      require(math.abs(a(c)(c)) > 1e-300, "singular Newton system despite ridge")
      for (r <- c + 1 until k) {
        val f = a(r)(c) / a(c)(c)
        for (cc <- c until k) a(r)(cc) -= f * a(c)(cc)
        b(r) -= f * b(c)
      }
    }
    val x = new Array[Double](k)
    for (r <- k - 1 to 0 by -1) {
      var s = b(r)
      for (cc <- r + 1 until k) s -= a(r)(cc) * x(cc)
      x(r) = s / a(r)(r)
    }
    x
  }

  /** Train-then-score: (doc_id, label, score, pred) for every document,
    * score = round(sigmoid(w·x), 6), pred = score >= 0.5 — the rounded
    * value is what's thresholded, so the decision boundary is
    * engine-identical. Stashes the weights for the oracle.
    *
    * `trainMod` > 1 trains on the deterministic doc_id % trainMod == 0
    * slice and applies the weights to the FULL corpus — the
    * [[graft.similarity.Ann.ivfTopK]] `trainStride` shape, and the form
    * to run at 100 TB (the Newton passes see a bounded sample; serving
    * stays a full-corpus shuffle-free map). */
  def score(docs: DataFrame, iters: Int = 8, ridge: Double = 1e-3,
            trainMod: Int = 1): DataFrame = {
    require(trainMod >= 1, s"trainMod >= 1 required; got $trainMod")
    val feats = features(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val trainFeats =
      if (trainMod == 1) feats
      else feats.filter(pmod(col("doc_id"), lit(trainMod)) === 0)
    val w = train(trainFeats, iters, ridge)
    lastWeights = Some(w)
    scoreWith(feats, w)
  }

  /** Apply-only path: score a [[features]]-shaped frame with LITERAL
    * weights — the shuffle-free 100 TB serve plan (train on a sample,
    * apply everywhere). */
  def scoreWith(feats: DataFrame, w: Seq[Double]): DataFrame = {
    require(w.size == featureNames.size, s"expected ${featureNames.size} weights, got ${w.size}")
    feats.select(col("doc_id"), col("label"),
        round(sigmoid(dot(w)), 6).as("score"))
      .withColumn("pred", when(col("score") >= 0.5, 1L).otherwise(0L))
  }

  /** Attach the rounded quality score to an arbitrary frame with a `text`
    * column, under LITERAL weights — the label-free mid-pipeline form of
    * [[scoreWith]] (identical feature expressions, identical rounded
    * sigmoid), so a trained gate composes into a cleanup ladder as one
    * more shuffle-free row-local stage. Keeps every input column and adds
    * `score`. */
  def scoreTextWith(df: DataFrame, w: Seq[Double]): DataFrame = {
    require(w.size == featureNames.size, s"expected ${featureNames.size} weights, got ${w.size}")
    val tl    = TextAnalysis.toks(col("text"))
    val nTok  = size(tl).cast("long")
    val nChar = length(col("text")).cast("long")
    df.withColumn("pr",
        when(nChar > 0, TextAnalysis.punctCount(col("text")) / nChar).otherwise(lit(0.0)))
      .withColumn("sr",
        when(nTok > 0, TextAnalysis.stopTokenCount(tl) / nTok).otherwise(lit(0.0)))
      .withColumn("ttr",
        when(nTok > 0, size(array_distinct(tl)).cast("long") / nTok).otherwise(lit(0.0)))
      .withColumn("lt", log(lit(1L) + nTok))
      .withColumn("score", round(sigmoid(dot(w)), 6))
      .drop("pr", "sr", "ttr", "lt")
  }

  /** Calibration report over the trained scorer: documents bucket by
    * score decile (bin = min(floor(score·nBins), nBins−1) on the ROUNDED
    * score, so the bin boundary is engine-identical) and each bin reports
    * its size, empirical positive rate, mean predicted score, and the
    * |mean − rate| calibration gap — the reliability-diagram table a
    * production filter is QA'd with. The mean accumulates
    * DECIMAL(28,18)-cast scores (order-independent) and divides once at
    * the end; pos_rate is an exact ratio of longs. */
  def calibration(docs: DataFrame, nBins: Int = 10, iters: Int = 8,
                  ridge: Double = 1e-3, trainMod: Int = 1): DataFrame =
    calibrationScored(score(docs, iters, ridge, trainMod), nBins)

  /** [[calibration]] over an already-scored frame — lets a caller score
    * once and derive every report (the registry's per-process weight
    * cache rides this). */
  def calibrationScored(scored: DataFrame, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins >= 2 required; got $nBins")
    scored
      .withColumn("bin",
        least(floor(col("score") * nBins).cast("long"), lit(nBins - 1L)))
      .groupBy("bin")
      .agg(count(lit(1L)).as("n"),
        sum(col("label")).as("n_pos"),
        sum(col("score").cast("decimal(28,18)")).as("s"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"),
        round(col("s").cast("double") / col("n"), 6).as("mean_score"))
      .withColumn("gap", round(abs(col("mean_score") - col("pos_rate")), 6))
  }

  /** One-row eval report over the trained scorer: confusion counts,
    * accuracy / precision / recall / F1 (round-6). Counts are exact
    * longs; the ratios are single divisions of longs — bit-identical
    * across engines. */
  def eval(docs: DataFrame, iters: Int = 8, ridge: Double = 1e-3,
           trainMod: Int = 1): DataFrame =
    evalScored(score(docs, iters, ridge, trainMod))

  /** One-row ROC-AUC over an already-scored frame, threshold-free — the
    * rank statistic the 0.5-threshold [[eval]] metrics miss (a filter is
    * deployed at a TUNED threshold, so ranking quality is the number
    * that matters). Computed exactly as the tie-averaged Mann-Whitney
    * rank sum: group by the (round-6) score — the tied-group table is
    * bounded by the score domain (≤ 1e6 + 1 rows) regardless of corpus
    * size — take the scale-safe [[graft.ops.Ranks.globalCumSum]] in
    * score order, and fold the per-group average ranks into
    * `s2 = 2 · Σ ranks(positives)` with every term an integer
    * (DECIMAL(38,0)-summed so 100 TB counts can't overflow); the single
    * final division is the only float op, identical on both engines.
    * Degenerate one-class corpora pin AUC to 0.5. */
  def aucScored(scored: DataFrame): DataFrame = {
    val byScore = scored.groupBy("score")
      .agg(count(lit(1L)).as("n"), sum(col("label")).as("np"))
    val cum = graft.ops.Ranks.globalCumSum(
      byScore, Seq((col("score"), true)), col("n"), out = "cumn")
    cum.agg(
        sum(col("n")).as("n"),
        sum(col("np")).as("n_pos"),
        sum(col("n") - col("np")).as("n_neg"),
        // np is cast to DECIMAL(38,0) BEFORE the multiply: with a heavy
        // tie group at 100 TB row counts, np · 2·cumn exceeds Long range
        // and would wrap silently under non-ANSI eval if the product were
        // computed in LongType and only the result cast. The rank factor
        // is decimal-cast too so the whole term is decimal arithmetic.
        sum(col("np").cast("decimal(38,0)") *
            (lit(2L) * (col("cumn") - col("n")) + col("n") + lit(1L)).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("s2"))
      .select(col("n"), col("n_pos"), col("n_neg"),
        round(when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("s2") - (col("n_pos") * (col("n_pos") + lit(1L))).cast("decimal(38,0)"))
            .cast("double") /
            (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
          .otherwise(lit(0.5)), 6).as("auc"))
  }

  /** [[eval]] over an already-scored frame. */
  def evalScored(scored: DataFrame): DataFrame = {
    scored.agg(
        count(lit(1L)).as("n"),
        sum(when(col("label") === 1 && col("pred") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("label") === 0 && col("pred") === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("label") === 1 && col("pred") === 0, 1L).otherwise(0L)).as("fn"),
        sum(when(col("label") === 0 && col("pred") === 0, 1L).otherwise(0L)).as("tn"))
      .select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
        round((col("tp") + col("tn")).cast("double") / col("n"), 6).as("accuracy"),
        round(when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp"))).otherwise(lit(0.0)), 6).as("precision"),
        round(when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn"))).otherwise(lit(0.0)), 6).as("recall"),
        round(when(lit(2.0) * col("tp") + col("fp") + col("fn") > 0,
          lit(2.0) * col("tp") / (lit(2.0) * col("tp") + col("fp") + col("fn"))).otherwise(lit(0.0)), 6).as("f1"))
  }
}
