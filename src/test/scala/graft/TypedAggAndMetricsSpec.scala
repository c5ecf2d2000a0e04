package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAggregator

class TypedAggAndMetricsSpec extends SparkSpec {

  test("typed bounded-heap topK equals the window-based topK") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val parts = spark.read.parquet(s"$sf/part.parquet")

    val typed = parts
      .select(col("p_brand"), col("p_retailprice"), col("p_partkey").cast("string").as("tag"))
      .as[(String, Double, String)]
      .groupByKey(_._1)
      .mapValues { case (_, s, t) => (s, t) }
      .agg(TopKAggregator.topK(3).toColumn)
      .collect().toMap

    val window = graft.ops.TopK.topKPerGroup(
        parts.select(col("p_brand"), col("p_retailprice"), col("p_partkey").cast("string").as("tag")),
        Seq(col("p_brand")), Seq(col("p_retailprice").desc, col("tag").asc), 3)
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getDouble(1), r.getString(2))).toSeq).toMap

    assert(typed.keySet == window.keySet)
    typed.foreach { case (brand, kept) => assert(kept == window(brand), brand) }
  }

  test("observation metrics count pipeline rows inline (Hadoop-counter analog)") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.collocations.Collocations.documents(spark, sf)
    val (df, obs) = graft.ops.Metrics.observed(
      graft.collocations.Collocations.unigrams(docs), "unigrams",
      count(lit(1)).as("rows"), approx_count_distinct(col("w")).as("approx_vocab"))
    val total = df.count()
    val row = obs.get
    assert(row("rows") == total)
    assert(row("approx_vocab").asInstanceOf[Long] > 0)
  }

  test("incremental shingle profile: counters merge exactly; estimates stay in the rsd envelope") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val threeWay = graft.ops.TableProfile.incrementalShingleProfile(Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2)))
      .select(col("source"), col("n_docs"), col("total_chars"),
        hll_sketch_estimate(col("hll")).as("est3"))
    val twoWay = graft.ops.TableProfile.incrementalShingleProfile(Seq(
      docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 =!= 0)))
      .select(col("source"), col("n_docs").as("n_docs_2"), col("total_chars").as("tc_2"),
        hll_sketch_estimate(col("hll")).as("est2"))
    val exact = docs
      .select(col("source"), graft.ops.Normalize.tokensCol(col("text")).as("toks"))
      .select(col("source"), explode(graft.dedup.Dedup.shingleCol(col("toks"), 3)).as("shingle"))
      .groupBy("source").agg(countDistinct(col("shingle")).as("nd"),
        count(lit(1L)).as("occurrences"))
    val whole = docs.groupBy("source")
      .agg(count(lit(1L)).as("n_docs_w"), sum("n_chars").as("tc_w"))
    val rows = threeWay.join(twoWay, "source").join(exact, "source").join(whole, "source").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      // counters: both split layouts must reproduce the whole-corpus values exactly
      assert(r.getAs[Long]("n_docs") == r.getAs[Long]("n_docs_w") &&
        r.getAs[Long]("n_docs_2") == r.getAs[Long]("n_docs_w"), s"$src doc counters must add exactly")
      assert(r.getAs[Long]("total_chars") == r.getAs[Long]("tc_w") &&
        r.getAs[Long]("tc_2") == r.getAs[Long]("tc_w"), s"$src char counters must add exactly")
      // estimates: NOT asserted identical across layouts (HIP vs composite
      // estimator — see incrementalShingleProfile's scaladoc), but both
      // must sit inside the 4*rsd envelope around the exact distinct count
      val nd = r.getAs[Long]("nd").toDouble
      Seq(r.getAs[Long]("est2"), r.getAs[Long]("est3")).foreach(est =>
        assert(math.abs(est - nd) <= 0.065 * nd, s"$src estimate $est out of envelope around $nd"))
    }
  }

  test("source overlap: planted shared shingles yield exact pair counts, sketches in-bound") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // srcA: tokens 1..40 shifted by 0; srcB: shifted by 20 (50% token
    // overlap); srcC: disjoint tokens 1000.. — so (A,B) share shingles,
    // (A,C) and (B,C) share none and must NOT appear
    def doc(id: Long, src: String, off: Int) =
      (id, (off until off + 40).map(i => s"tok$i").mkString(" "), "en", src)
    val docs = Seq(doc(1, "srcA", 0), doc(2, "srcB", 20), doc(3, "srcC", 1000))
      .toDF("doc_id", "text", "lang", "source")
    val rows = graft.ops.TableProfile.sourceOverlap(docs).collect()
    assert(rows.length == 1, s"only the (A,B) pair shares content: ${rows.length} rows")
    val r = rows.head
    assert(r.getAs[String]("a") == "srcA" && r.getAs[String]("b") == "srcB")
    // each doc has 38 distinct 3-shingles; the shared run tok20..tok39
    // (20 tokens) contributes 18 shared shingles
    assert(r.getAs[Long]("exact_a") == 38L && r.getAs[Long]("exact_b") == 38L)
    assert(r.getAs[Long]("inter_exact") == 18L)
    assert(r.getAs[Long]("union_exact") == 58L)
    Seq("a_within_rsd", "b_within_rsd", "union_within_rsd", "inter_within_bound")
      .foreach(c => assert(r.getAs[Boolean](c), s"$c must hold on a tiny exact set"))
  }
}
