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
}
