package graft

import org.apache.spark.sql.functions._
import graft.text.QualityClassifier

class QualityClassifierSpec extends SparkSpec {

  test("Newton training separates a linearly separable synthetic corpus") {
    import spark.implicits._
    // positives: English-looking (stopword-heavy) docs labeled en;
    // negatives: stopword-free docs labeled de — sr alone separates them
    val docs = ((0 until 30).map(i => (i.toLong, s"the cat and the dog is on a mat $i", "en")) ++
      (30 until 60).map(i => (i.toLong, s"katze hund matte fenster tisch stuhl $i", "de")))
      .toDF("doc_id", "text", "lang")
    val scored = QualityClassifier.score(docs)
    val acc = scored.agg(avg(when(col("label") === col("pred"), 1.0).otherwise(0.0)))
      .collect()(0).getDouble(0)
    assert(acc >= 0.95, s"expected near-perfect separation, accuracy was $acc")
    // the stop-ratio weight must have learned the positive direction
    val w = QualityClassifier.lastWeights.get
    assert(w(2) > 0, s"stop_ratio weight should be positive, got ${w(2)}")
  }

  test("training is deterministic: identical weights across repeated runs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val feats = QualityClassifier.features(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w1 = QualityClassifier.train(feats, iters = 6)
    val w2 = QualityClassifier.train(feats.repartition(7), iters = 6)
    feats.unpersist()
    assert(w1 == w2, s"weights must be partition-invariant: $w1 vs $w2")
  }

  test("real-corpus eval is consistent and at least majority-competitive") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ev = QualityClassifier.eval(docs).collect()(0)
    val n = ev.getAs[Long]("n")
    assert(n == docs.count())
    assert(ev.getAs[Long]("tp") + ev.getAs[Long]("fp") +
      ev.getAs[Long]("fn") + ev.getAs[Long]("tn") == n)
    // the synthetic corpus's lang signal is weak by construction, so the
    // converged model may land AT the majority rate — but it must never
    // collapse to the all-positive minority predictor (the divergence
    // failure mode this spec guards against)
    val majority = math.max(
      ev.getAs[Long]("tp") + ev.getAs[Long]("fn"),  // positives
      ev.getAs[Long]("fp") + ev.getAs[Long]("tn")). // negatives
      toDouble / n
    val acc = ev.getAs[Double]("accuracy")
    assert(acc >= majority - 0.02, s"accuracy $acc far below majority baseline $majority")
  }

  test("calibration bins partition the corpus and agree with the scored table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cal = QualityClassifier.calibration(docs, trainMod = 4).collect()
    assert(cal.map(_.getAs[Long]("n")).sum == docs.count())
    assert(cal.map(_.getAs[Long]("bin")).distinct.length == cal.length)
    cal.foreach { r =>
      val (n, nPos) = (r.getAs[Long]("n"), r.getAs[Long]("n_pos"))
      assert(nPos >= 0 && nPos <= n)
      val gap = r.getAs[Double]("gap")
      assert(gap >= 0 && gap <= 1)
      assert(math.abs(gap -
        math.abs(r.getAs[Double]("mean_score") - r.getAs[Double]("pos_rate"))) < 1e-6)
    }
  }

  test("auc: tie-averaged rank-sum on a hand-computed case, bounds, degenerate 0.5") {
    import spark.implicits._
    // pairs: (.9+,.8-) win, (.9+,.1-) win, (.8+,.8-) tie=0.5, (.8+,.1-)
    // win -> U = 3.5, AUC = 3.5 / (2*2) = 0.875
    val scored = Seq(
      (1L, 1L, 0.9), (2L, 0L, 0.8), (3L, 1L, 0.8), (4L, 0L, 0.1))
      .toDF("doc_id", "label", "score")
    val r = QualityClassifier.aucScored(scored).collect().head
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_pos") == 2L
      && r.getAs[Long]("n_neg") == 2L)
    assert(math.abs(r.getAs[Double]("auc") - 0.875) < 1e-9)
    // perfect separation -> 1.0; inverted -> 0.0
    val perfect = Seq((1L, 1L, 0.9), (2L, 1L, 0.8), (3L, 0L, 0.2), (4L, 0L, 0.1))
      .toDF("doc_id", "label", "score")
    assert(QualityClassifier.aucScored(perfect).collect().head.getAs[Double]("auc") == 1.0)
    val inverted = Seq((1L, 0L, 0.9), (2L, 1L, 0.1)).toDF("doc_id", "label", "score")
    assert(QualityClassifier.aucScored(inverted).collect().head.getAs[Double]("auc") == 0.0)
    // one-class corpus pins 0.5 instead of dividing by zero
    val oneClass = Seq((1L, 1L, 0.9), (2L, 1L, 0.1)).toDF("doc_id", "label", "score")
    assert(QualityClassifier.aucScored(oneClass).collect().head.getAs[Double]("auc") == 0.5)
    // the trained scorer on real data ranks better than chance
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val auc = QualityClassifier.aucScored(
      QualityClassifier.score(docs, trainMod = 4)).collect().head.getAs[Double]("auc")
    assert(auc > 0.5 && auc <= 1.0, s"trained AUC $auc should beat chance")
  }

  test("scoreWith is a pure literal-weight map: no shuffle in the serve plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val served = QualityClassifier.scoreWith(
      QualityClassifier.features(docs), Seq(0.1, -2.0, 3.0, -0.5, 0.2))
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val shuffles = physicalPlan(served).collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, "literal-weight scoring must be shuffle-free")
    assert(served.count() == docs.count())
  }
}
