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
  * batch-gradient-descent logistic regression over engine-computable
  * document features, with weak labels derived from corpus metadata
  * (here: `lang = 'en'` as the curated-positive proxy — the English
  * stopword ratio is genuinely discriminative, so the learner has signal).
  *
  * Scale shape (the [[graft.similarity.Ann.ivfCentroids]] contract):
  *  - the feature table is ONE shuffle-free pass over the corpus (pure
  *    per-document Column algebra), persisted once and reused by every
  *    GD iteration;
  *  - each iteration is a single grouping-free aggregation (map-side
  *    partial sums) collecting ONE bounded row (|features|+1 values) to
  *    the driver — the same bounded-model `.collect()` as Lloyd
  *    iterations, never data rows;
  *  - at 100 TB you train on a deterministic SAMPLE and apply the
  *    resulting literal weights to the full corpus — scoring is again a
  *    shuffle-free map, so the apply path is an embarrassingly parallel
  *    scan with full pushdown.
  *
  * Cross-engine determinism: gradients sum DECIMAL(28,18)-cast per-doc
  * terms (exactly associative, so Spark's partitioning can't change the
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

  /** Deterministic batch gradient descent on the logistic loss.
    * `feats` must be [[features]]-shaped; pass a persisted frame — every
    * iteration re-reads it. GD runs in STANDARDIZED feature space (one
    * extra decimal-summed moments pass for per-feature mean/std — raw
    * scales differ by ~10x, so unscaled GD needs a per-feature step),
    * then the weights are back-transformed to raw-feature space:
    * w_j = u_j/σ_j, w_0 = u_0 − Σ u_j μ_j/σ_j. The returned vector
    * scores RAW features — the serving formula (and its SQL mirror)
    * never sees the standardization. Returns weights in
    * [[featureNames]] order. */
  def train(feats: DataFrame, iters: Int = 80, lr: Double = 1.0): Seq[Double] = {
    require(iters >= 1 && lr > 0, s"iters >= 1 and lr > 0 required; got $iters, $lr")
    val raw: Seq[Column] = Seq(col("pr"), col("sr"), col("ttr"), col("lt"))
    // per-feature moments, decimal-cast per term so the sums are exactly
    // associative — partitioning cannot perturb the trained model
    val momentAggs = raw.zipWithIndex.flatMap { case (x, j) =>
      Seq(sum(x.cast("decimal(28,18)")).as(s"s$j"),
        sum((x * x).cast("decimal(28,18)")).as(s"q$j"))
    } :+ count(lit(1L)).as("n")
    val mrow = feats.agg(momentAggs.head, momentAggs.tail: _*).collect()(0)
    require(mrow.getLong(2 * raw.size) > 0, "cannot train on an empty corpus")
    val n = mrow.getLong(2 * raw.size).toDouble
    val (mu, sd) = raw.indices.map { j =>
      val m = mrow.getDecimal(2 * j).doubleValue() / n
      val v = mrow.getDecimal(2 * j + 1).doubleValue() / n - m * m
      if (v < 1e-18) (0.0, 1.0) else (m, math.sqrt(v)) // constant feature: identity
    }.unzip
    val xs: Seq[Column] = lit(1.0) +: raw.zipWithIndex.map { case (x, j) =>
      (x - lit(mu(j))) / lit(sd(j))
    }
    var u = Seq.fill(featureNames.size)(0.0)
    var it = 0
    while (it < iters) {
      // residual r_i = sigmoid(u·x'_i) − y_i; gradient_j = Σ r_i x'_ij / n.
      val z = xs.zip(u).map { case (x, uj) => x * lit(uj) }.reduce(_ + _)
      val r = (sigmoid(z) - col("label")).as("r")
      val aggs = xs.zipWithIndex.map { case (x, j) =>
        sum((col("r") * x).cast("decimal(28,18)")).as(s"g$j")
      }
      val row = feats.select(col("label"), col("pr"), col("sr"), col("ttr"), col("lt"), r)
        .agg(aggs.head, aggs.tail: _*)
        .collect()(0) // ONE row of |features| values — bounded model state
      u = u.zipWithIndex.map { case (uj, j) =>
        uj - lr * row.getDecimal(j).doubleValue() / n
      }
      it += 1
    }
    // back-transform: u·x' = (u0 − Σ u_j μ_j/σ_j) + Σ (u_j/σ_j)·x_j
    val wj = raw.indices.map(j => u(j + 1) / sd(j))
    val w0 = u(0) - raw.indices.map(j => u(j + 1) * mu(j) / sd(j)).sum
    w0 +: wj
  }

  /** Train-then-score: (doc_id, label, score, pred) for every document,
    * score = round(sigmoid(w·x), 6), pred = score >= 0.5 — the rounded
    * value is what's thresholded, so the decision boundary is
    * engine-identical. Stashes the weights for the oracle. */
  def score(docs: DataFrame, iters: Int = 80, lr: Double = 1.0): DataFrame = {
    val feats = features(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val w = train(feats, iters, lr)
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

  /** One-row eval report over the trained scorer: confusion counts,
    * accuracy / precision / recall / F1 (round-6). Counts are exact
    * longs; the ratios are single divisions of longs — bit-identical
    * across engines. */
  def eval(docs: DataFrame, iters: Int = 80, lr: Double = 1.0): DataFrame = {
    val scored = score(docs, iters, lr)
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
