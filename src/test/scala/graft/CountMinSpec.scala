package graft

import org.apache.spark.sql.functions._
import graft.ops.CountMin

class CountMinSpec extends SparkSpec {

  import spark.implicits._

  /** Item occurrences with known exact counts: "a" x5, "b" x3, "c" x1,
    * plus 200 distinct one-off fillers to force collisions at width 16. */
  private lazy val items = {
    val heavy = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val filler = (0 until 200).map(i => s"filler_$i")
    (heavy ++ filler).toDF("item")
  }

  test("estimate never undercounts and bounds the sketch size") {
    val cms = CountMin.sketch(items, col("item"), depth = 4, width = 16)
    assert(cms.count() <= 4L * 16, "sketch must stay within depth*width cells")
    val exact = items.groupBy("item").agg(count(lit(1L)).as("exact"))
    val est = CountMin.estimate(cms, exact, col("item"), depth = 4, width = 16)
      .join(exact, "item")
    val rows = est.select(col("item"), col("est"), col("exact")).collect()
    assert(rows.length == 203)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"CMS undercounted ${r.getString(0)}: est ${r.getLong(1)} < exact ${r.getLong(2)}")
    }
    // width 16 << 203 distinct items: collisions must actually occur,
    // otherwise the never-undercount assertion above is vacuous
    assert(rows.exists(r => r.getLong(1) > r.getLong(2)),
      "expected at least one colliding overcount at width 16")
  }

  test("absent item estimates to zero only if its cells are empty; min over rows tightens") {
    // depth 1 vs depth 4 over the same data: the 4-row min can only be
    // tighter (or equal) than any single row for every query item
    val d1 = CountMin.sketch(items, col("item"), depth = 1, width = 16)
    val d4 = CountMin.sketch(items, col("item"), depth = 4, width = 16)
    val q = items.distinct()
    val e1 = CountMin.estimate(d1, q, col("item"), depth = 1, width = 16)
      .withColumnRenamed("est", "est1")
    val e4 = CountMin.estimate(d4, q, col("item"), depth = 4, width = 16)
      .withColumnRenamed("est", "est4")
    e1.join(e4, "item").collect().foreach { r =>
      val (est1, est4) = (r.getAs[Long]("est1"), r.getAs[Long]("est4"))
      assert(est4 <= est1, s"min over 4 rows must not exceed the 1-row estimate: $est4 > $est1")
    }
  }

  test("split-build-then-merge is cell-identical to the direct build") {
    val withId = items.withColumn("id", monotonically_increasing_id())
    val a = CountMin.sketch(withId.filter(col("id") % 2 === 0), col("item"), 4, 16)
    val b = CountMin.sketch(withId.filter(col("id") % 2 =!= 0), col("item"), 4, 16)
    val merged = CountMin.merge(a, b)
    val direct = CountMin.sketch(items, col("item"), 4, 16)
    // exact frame equality both directions (cell sets and counts)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "merged split sketches must equal the single-pass sketch cell for cell")
  }

  test("total mass is conserved: each hash row sums to the occurrence count") {
    val n = items.count()
    val perRow = CountMin.sketch(items, col("item"), depth = 3, width = 8)
      .groupBy("rw").agg(sum("cnt").as("mass")).collect()
    assert(perRow.length == 3)
    perRow.foreach(r => assert(r.getAs[Long]("mass") == n,
      s"row ${r.getAs[Int]("rw")} mass ${r.getAs[Long]("mass")} != $n"))
  }
}
