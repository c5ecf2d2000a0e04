package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import graft.ops.Ranks

/** The distributed rank/ntile rewrite must be bit-identical to the naive
  * single-partition window it replaces — the naive form IS the oracle here,
  * evaluated at test scale where a global window is harmless. */
class RanksSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("globalRank matches row_number over a global order") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    val naive = df.withColumn("rank",
      row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc))
        .cast("long"))
    val fast = Ranks.globalRank(df,
      Seq(col("o_totalprice") -> false, col("o_orderkey") -> true), "rank")
      .drop("_n_total")
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
  }

  test("ntileByRange matches ntile() for even and ragged bucket splits") {
    import spark.implicits._
    // n = 17, k = 5 → first 2 buckets take 4 rows, the rest 3 (ragged);
    // n = 20, k = 5 → even split. Both must match the SQL ntile exactly.
    for (n <- Seq(17, 20); k <- Seq(5, 3)) {
      val df = (1 to n).map(i => (i.toLong, (i * 37 % n).toLong)).toDF("id", "v")
      val naive = df.withColumn("b",
        ntile(k).over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
      val fast = Ranks.ntileByRange(df, k, Seq(col("v") -> false, col("id") -> true), "b")
      assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
        s"ntile mismatch at n=$n k=$k")
    }
  }

  test("ntileByRange with n < k assigns one row per leading bucket") {
    import spark.implicits._
    val df = (1 to 3).map(_.toLong).toDF("id")
    val out = Ranks.ntileByRange(df, 10, Seq(col("id") -> true), "b")
      .select("id", "b").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("ntile_customers plan keeps global windows off data rows") {
    val plan = physicalPlan(SparkEntry.queries("ntile_customers")(spark, sf))
    // every empty-partition window must sit above an aggregation — i.e. it
    // processes per-range-partition METADATA (≤ shuffle partition count
    // rows), never table rows. The old Window.orderBy(ntile) form fails:
    // its global window consumed the raw customer scan.
    val globalWindows = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(globalWindows.nonEmpty, "expected the tiny offsets window in the plan")
    globalWindows.foreach { w =>
      assert(w.child.collect { case a: BaseAggregateExec => a }.nonEmpty,
        s"global window over raw rows (single-partition bottleneck):\n$w")
    }
    // the data path is bucket-repartitioned on the content-derived _pid
    // and the offsets come back broadcast
    val s = plan.toString
    assert(s.contains("hashpartitioning(_pid"), s"expected _pid repartition:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast offsets join:\n$s")
  }
}
