package graft

import org.apache.spark.sql.functions._
import graft.ops.TopK

class TopKSpec extends SparkSpec {

  test("per-group size bound, descending scores, winners >= losers") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val df = (1 to 500).map(i => (s"g${i % 5}", i.toLong, rnd.nextInt(100).toDouble)).toDF("g", "id", "score")
    val top = TopK.topKPerGroup(df, Seq(col("g")), Seq(col("score").desc, col("id").asc), 10)
    val byGroup = top.collect().groupBy(_.getString(0))
    assert(byGroup.values.forall(_.length == 10))
    byGroup.foreach { case (g, rows) =>
      val scores = rows.map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse, s"group $g not descending")
      val minKept = scores.min
      val dropped = df.filter(col("g") === g).collect().map(_.getDouble(2)).sorted.reverse.drop(10)
      assert(dropped.forall(_ <= minKept))
    }
  }

  test("groups smaller than k emit all rows") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0)).toDF("g", "id", "score")
    assert(TopK.topKPerGroup(df, Seq(col("g")), Seq(col("score").desc, col("id").asc), 10).count() == 3)
  }
}
