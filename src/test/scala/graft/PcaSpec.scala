package graft

import org.apache.spark.sql.functions._
import graft.similarity.Pca

/** PCA: planted-axis recovery, eigenvalue == projection variance,
  * orthonormality, partitioning-independence of the trained model, and
  * the persisted-model serve round-trip. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** dim-6 corpus with a planted dominant axis u and a weaker axis w
    * (orthogonal), plus a constant mean shift — deterministic, no RNG. */
  private def planted() = {
    val u = Array(0.5, 0.5, 0.5, 0.5, 0.0, 0.0)
    val w = Array(0.5, -0.5, 0.5, -0.5, 0.0, 0.0)
    val mean = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    // full grid product of two MEAN-ZERO coefficient lists — independence
    // by construction, so cov(a, b) = 0 exactly and the principal axes
    // are u and w themselves; var(a) = 5/3 >> var(b) = 0.06
    val as = (-4 to 4).map(_ * 0.5)
    val bs = Seq(-0.3, 0.0, 0.3)
    val rows = for { (a, ia) <- as.zipWithIndex; (b, ib) <- bs.zipWithIndex } yield {
      val v = Array.tabulate(6)(d => (mean(d) + a * u(d) + b * w(d)).toFloat)
      ((ia * 3 + ib).toLong, v.toSeq)
    }
    (u, w, rows.toDF("vec_id", "embedding"))
  }

  test("pca recovers the planted dominant axis, orthonormal components, ranked eigenvalues") {
    val (u, w, emb) = planted()
    val model = Pca.pcaTrain(emb, k = 3, trainStride = 1)
    assert(model.map(_.pc) == Seq(0, 1, 2))
    // eigenvalues descend
    assert(model.sliding(2).forall(p => p.head.eigval >= p.last.eigval - 1e-12))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    // pc0 is the planted dominant axis, pc1 the weak one (sign-canonical,
    // so compare |cos|)
    assert(math.abs(cos(model(0).comp, u)) > 0.999, s"pc0 vs u: ${cos(model(0).comp, u)}")
    assert(math.abs(cos(model(1).comp, w)) > 0.999, s"pc1 vs w: ${cos(model(1).comp, w)}")
    // orthonormal
    model.foreach(m => assert(math.abs(math.sqrt(m.comp.map(x => x * x).sum) - 1.0) < 1e-9))
    assert(math.abs(model(0).comp.zip(model(1).comp).map { case (x, y) => x * y }.sum) < 1e-9)
    // the planted residual directions carry ~zero variance
    assert(model(2).eigval < 1e-6, s"eig2=${model(2).eigval}")
    // canonical sign: largest-|x| entry positive
    model.foreach { m =>
      val p = m.comp.indices.maxBy(i => (math.abs(m.comp(i)), -i))
      assert(m.comp(p) >= 0)
    }
  }

  test("projection variance equals the eigenvalue at trainStride=1; means are ~0") {
    val (_, _, emb) = planted()
    val model = Pca.pcaTrain(emb, k = 2, trainStride = 1)
    val rows = Pca.pcaVariance(emb, model).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(rows.keySet == Set(0, 1))
    rows.foreach { case (pc, (n, mean, vr, eig, share)) =>
      assert(n == 27L)
      assert(math.abs(mean) < 1e-4, s"pc$pc mean=$mean")
      assert(math.abs(vr - eig) < 1e-4, s"pc$pc var=$vr eig=$eig")
      assert(share > 0 && share <= 1.0)
    }
    // the two planted axes explain everything: shares sum to ~1
    assert(math.abs(rows.values.map(_._5).sum - 1.0) < 1e-4)
  }

  test("trained model is partitioning-independent (DECIMAL moments + fixed-order Jacobi)") {
    val (_, _, emb) = planted()
    val m1 = Pca.pcaTrain(emb, k = 3, trainStride = 1)
    val m2 = Pca.pcaTrain(emb.repartition(7), k = 3, trainStride = 1)
    m1.zip(m2).foreach { case (a, b) =>
      assert(a.pc == b.pc && a.eigval == b.eigval && a.offset == b.offset
        && a.trace == b.trace && a.comp.sameElements(b.comp),
        s"model drifted across partitionings at pc${a.pc}")
    }
  }

  test("persisted PCA model round-trips: serve equals rebuild on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-pca-model")
    Pca.writePcaModel(emb, dir.toString, k = 4, trainStride = 2)
    val served = Pca.readPcaModel(spark, dir.toString)
    val rebuilt = Pca.pcaTrain(emb, k = 4, trainStride = 2)
    served.zip(rebuilt).foreach { case (a, b) =>
      assert(a.pc == b.pc && a.eigval == b.eigval && a.offset == b.offset
        && a.comp.sameElements(b.comp))
    }
    val x = Pca.pcaProject(emb, served).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getDouble)).toMap
    val y = Pca.pcaProject(emb, rebuilt).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getDouble)).toMap
    assert(x == y, "serve path must reproduce the train-and-project output")
    assert(x.nonEmpty && rebuilt.head.eigval > 0)
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("embedding drift: the shifted group lights up on the axis it shifted along") {
    // three label groups in dim 4: groups 0 and 1 share a distribution,
    // group 2 is translated +5 along the dominant axis u — its pc0 PSI
    // must dwarf the identical groups'; the untouched w axis stays calm
    val u = Array(1.0, 0.0, 0.0, 0.0)
    val w = Array(0.0, 1.0, 0.0, 0.0)
    val as = (-4 to 4).map(_ * 0.5)
    val bs = Seq(-0.3, 0.0, 0.3)
    val rows = for {
      g <- 0 to 2; (a, ia) <- as.zipWithIndex; (b, ib) <- bs.zipWithIndex
    } yield {
      val shift = if (g == 2) 5.0 else 0.0
      val v = Array.tabulate(4)(d => ((a + shift) * u(d) + b * w(d)).toFloat)
      ((g * 27 + ia * 3 + ib).toLong, v.toSeq, g)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val model = Pca.pcaTrain(emb, k = 2, trainStride = 1)
    val r = Pca.driftEmbeddingPca(emb, model).collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> (x.getDouble(2), x.getLong(3))).toMap
    assert(r.keySet == (for (pc <- 0 to 1; g <- 0 to 2) yield (pc, g)).toSet)
    // the shift axis dominates the trained pc0: the shifted group reads
    // worst (the pooled reference makes the unshifted groups drift too —
    // they're missing the far mode — but less), and the two IDENTICAL
    // groups produce identical binned counts, hence identical psi
    assert(r((0, 2))._1 > 2.0, s"shifted group pc0 psi: ${r((0, 2))}")
    assert(r((0, 2))._1 > 1.5 * r((0, 0))._1,
      s"shifted ${r((0, 2))} vs identical ${r((0, 0))}")
    assert(r((0, 0))._1 == r((0, 1))._1,
      s"identical groups must read identically: ${r((0, 0))} vs ${r((0, 1))}")
    // the untouched axis is calm for everyone: every group's b-mix equals
    // the pooled one, so pq == pr bin-for-bin and psi collapses to ~0
    (0 to 2).foreach(g => assert(r((1, g))._1 < 0.1, s"pc1 psi g$g: ${r((1, g))}"))
  }

  test("pca recall eval: sane counts, bounded recall, truth dominates on original cosine") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Pca.pcaTrain(emb, k = 4, trainStride = 2)
    val take = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("n_truth"), r.getAs[Long]("n_approx"), r.getAs[Long]("n_hit"),
        r.getAs[Double]("recall"), r.getAs[Double]("truth_mean_cos"),
        r.getAs[Double]("approx_mean_cos"))
    val r = take(Pca.pcaRecallEval(emb, model, stride = 50, k = 3).collect().head)
    val (nt, na, nh, recall, tm, am) = r
    // no zero-norm vectors in this corpus, so both sides field the same
    // probe and candidate sets: equal counts, hits bounded by either
    assert(nt == na && nt > 0, s"counts: $r")
    assert(nh >= 0 && nh <= nt && recall >= 0.0 && recall <= 1.0)
    // truth's per-query top-k maximizes original cosine by definition,
    // so its mean dominates the reduced picks' re-scored mean
    assert(tm >= am - 1e-6, s"truth $tm must dominate approx $am")
    // deterministic end to end (DECIMAL moments, fixed Jacobi, round-6
    // scoring, deterministic tie-breaks)
    assert(take(Pca.pcaRecallEval(emb, model, stride = 50, k = 3).collect().head) == r)
  }

  test("projection plan is a narrow map: no joins, no shuffles") {
    val (_, _, emb) = planted()
    val model = Pca.pcaTrain(emb, k = 2, trainStride = 1)
    val plan = physicalPlan(Pca.pcaProject(emb, model))
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(shuffles.isEmpty && joins.isEmpty,
      s"projection must stay array-local: $plan")
  }
}
