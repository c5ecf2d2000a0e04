package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED language identification — multinomial Naive Bayes over
  * character bigrams, the fastText-langid shape every production
  * pretraining pipeline runs (CCNet, C4, and their descendants gate on
  * a trained char-n-gram classifier, not on hand-written profiles; the
  * heuristic [[TextAnalysis.langScores]] stays as the zero-training
  * baseline and drift reference).
  *
  * Training is deterministic and bounded-model, the
  * [[QualityClassifier]] lifecycle: a doc_id-stride sample labels char
  * bigrams with the corpus's `lang` column, the vocabulary caps at the
  * top-`vocabSize` bigrams by total count (deterministic order:
  * count desc, bigram asc), and Laplace-smoothed log-probabilities
  * QUANTIZE ONCE driver-side to integer micro-nats (the
  * tokenize_unigram template — both engines then sum identical
  * integers, so scores are bit-exact and argmax ties cannot split the
  * engines; ties break to the lexicographically smallest class).
  *
  * Scoring is a NARROW map: the model enters the plan as class-keyed
  * literal maps (vocabSize entries each), each document folds its own
  * bigram array through `aggregate` + `element_at`, and the argmax is
  * an array_min over (-score, class) structs — zero shuffles, zero
  * joins, the 100 TB apply path (the model is ~classes × vocabSize
  * longs; broadcastable trivially, literal here). */
object LangIdClassifier {

  /** (classes sorted asc, per-class prior micro-nats, per-class
    * bigram→weight micro-nats). */
  final case class LangIdModel(classes: Seq[String],
                               priors: Map[String, Long],
                               weights: Map[String, Map[String, Long]])

  /** Dynamic-oracle stashes — one per registry entry (the
    * [[graft.dedup.Dedup.lastSemanticModelIndexed]] rationale). */
  @volatile var lastLangIdModel: Option[LangIdModel] = None
  @volatile var lastLangIdModelIndexed: Option[LangIdModel] = None
  @volatile var lastLangIdModelEval: Option[LangIdModel] = None

  /** Character bigrams of `text` as an array column (positions
    * 1..len-1, 2-char slices — spaces and punctuation carry signal and
    * stay in). Guarded: Spark's `sequence(1, len-1)` DESCENDS for
    * len < 2 (it infers step −1), so short texts must short-circuit to
    * the empty array. */
  def bigramsCol(text: Column): Column =
    when(length(text) >= 2,
      transform(sequence(lit(1), length(text) - 1), i => text.substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))

  /** Train on the doc_id % `trainMod` == 0 sample. Bounded collects
    * only: the vocab (vocabSize rows), the (class × vocab) count grid,
    * and the per-class doc counts. Smoothing: P(b|c) =
    * (n_cb + 1) / (n_c + V) with n_c the class's total VOCAB-bigram
    * occurrences and V = vocabSize (out-of-vocabulary bigrams score
    * zero on every class — the capped-vocab NB convention, so an
    * unseen bigram never tilts the argmax). */
  def train(docs: DataFrame, vocabSize: Int = 128, trainMod: Int = 4): LangIdModel = {
    val sample = docs.filter(pmod(col("doc_id"), lit(trainMod.toLong)) === 0)
      .select(col("lang"), bigramsCol(col("text")).as("bgs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sample.select(col("lang"), explode(col("bgs")).as("b"))
      .groupBy("lang", "b").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = counts.groupBy("b").agg(sum(col("n")).as("tot"))
      .orderBy(col("tot").desc, col("b").asc).limit(vocabSize)
      .collect().map(_.getString(0)).toSeq
    val grid = collectVocabGrid(counts, vocab).toMap
    val docCounts = sample.groupBy("lang").agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.unpersist(); sample.unpersist()
    val classes = docCounts.keys.toSeq.sorted
    val nTrain = docCounts.values.sum
    val v = vocabSize.toDouble
    val priors = classes.map { c =>
      c -> math.round(1e6 * math.log(docCounts(c).toDouble / nTrain))
    }.toMap
    val weights = classes.map { c =>
      val nC = vocab.map(b => grid.getOrElse((c, b), 0L)).sum.toDouble
      c -> vocab.map { b =>
        b -> math.round(1e6 * math.log((grid.getOrElse((c, b), 0L) + 1.0) / (nC + v)))
      }.toMap
    }.toMap
    LangIdModel(classes, priors, weights)
  }

  /** The train path's ONLY grid collect: the vocab filter runs
    * SERVER-side (an In predicate over ≤vocabSize literals, pushed
    * below the aggregate's exchange) so at most classes × vocabSize
    * rows ever reach the driver — the distinct char-bigram space of a
    * CJK-heavy crawl is unbounded and must never be collected raw.
    * Exposed for the spec pinning that bound. */
  private[graft] def collectVocabGrid(counts: DataFrame,
                                      vocab: Seq[String]): Array[((String, String), Long)] =
    counts.filter(col("b").isin(vocab: _*)).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))

  /** Score + argmax under a trained model: (doc_id, lang_pred, score)
    * with score the winning class's integer micro-nat total. One
    * narrow projection — model as literal maps, per-doc array fold,
    * struct-min argmax (highest score, smallest class on ties). */
  def predictWith(docs: DataFrame, model: LangIdModel): DataFrame =
    predictWith(docs, model, Nil)

  /** As above, carrying `keep` columns of `docs` through the same
    * single narrow projection — the eval path attaches its label here
    * instead of re-scanning the corpus and self-joining on doc_id
    * (which would shuffle the full corpus to re-attach a column this
    * projection already holds).
    *
    * Scoring runs through the codegen'd
    * [[graft.functions.LangIdScoresExpr]]: one code point pass per
    * document, each consecutive pair probed ONCE into an O(1)
    * open-addressed table whose hits add the bigram's per-class weight
    * vector onto a prior-seeded accumulator (the higher-order-function
    * fold evaluates its lambdas interpreted per element and measured
    * 10-45× slower — see the expression's scaladoc). Identical integer
    * totals in classes-sorted order; the argmax is first-max over that
    * array, so the smallest-class tie-break and the SQL oracle are
    * unchanged. */
  def predictWith(docs: DataFrame, model: LangIdModel,
                  keep: Seq[String]): DataFrame = {
    val classes = model.classes
    val vocabKeys = model.weights.valuesIterator
      .foldLeft(Set.empty[String])(_ ++ _.keySet).toSeq.sorted
    val packed = new graft.functions.LangIdScore.Packed(
      classes.map(model.priors).toArray,
      vocabKeys.toArray,
      vocabKeys.map(b => classes.map(c => model.weights(c).getOrElse(b, 0L)).toArray).toArray)
    // null text scores priors-only (the bigramsCol `when` branch's
    // behavior), so the expression sees an empty string, never a null
    val scores = graft.functions.LangIdScore.langidScores(
      coalesce(col("text"), lit("")), packed)
    val kept = keep.map(col)
    docs.select(col("doc_id") +: kept :+ scores.as("sc"): _*)
      .select(col("doc_id") +: kept :+
        element_at(typedLit(classes),
          array_position(col("sc"), array_max(col("sc"))).cast("int")).as("lang_pred") :+
        array_max(col("sc")).as("score"): _*)
  }

  /** The labeled × predicted contingency table under the trained model
    * — the [[TextAnalysis.langConfusion]] twin for the trained path
    * (off-diagonal mass on a fresh crawl = the retrain signal). The
    * label rides the predict projection itself — no join, no second
    * scan; the whole eval is one narrow pass + one aggregate. */
  def confusionWith(docs: DataFrame, model: LangIdModel): DataFrame =
    predictWith(docs, model, keep = Seq("lang"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))

  /** Persist the model as two parquet tables (`$dir/priors`:
    * (class, w0); `$dir/weights`: (class, b, w)) — staged publish, the
    * build-once/serve-many lifecycle every model-bearing family ships. */
  def writeModel(model: LangIdModel, dir: String,
                 spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    graft.sources.Sinks.publishSwap(s"$dir/priors") { staging =>
      model.classes.map(c => (c, model.priors(c))).toDF("class", "w0")
        .coalesce(1).write.mode("overwrite").parquet(staging)
    }
    graft.sources.Sinks.publishSwap(s"$dir/weights") { staging =>
      model.classes.flatMap(c => model.weights(c).toSeq.sortBy(_._1)
          .map { case (b, w) => (c, b, w) })
        .toDF("class", "b", "w")
        .coalesce(1).write.mode("overwrite").parquet(staging)
    }
  }

  /** Read a persisted model back (bounded collects — the tables are
    * classes + classes × vocabSize rows). */
  def readModel(spark: org.apache.spark.sql.SparkSession, dir: String): LangIdModel = {
    val priors = spark.read.parquet(s"$dir/priors").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = spark.read.parquet(s"$dir/weights").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (c, rows) =>
        c -> rows.map(t => t._2 -> t._3).toMap
      }
    LangIdModel(priors.keys.toSeq.sorted, priors, weights)
  }
}
