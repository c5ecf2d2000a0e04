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

  test("bucket-of binary search matches the linear count, both directions and ties") {
    import graft.functions.SearchSorted
    val asc = Array(1.0, 3.0, 3.0, 7.0)
    for (v <- Seq(0.0, 1.0, 2.0, 3.0, 5.0, 7.0, 9.0))
      assert(SearchSorted.countBefore(asc, v, asc = true) == asc.count(_ < v), s"asc v=$v")
    val desc = Array(7.0, 3.0, 3.0, 1.0)
    for (v <- Seq(9.0, 7.0, 5.0, 3.0, 2.0, 1.0, 0.0))
      assert(SearchSorted.countBefore(desc, v, asc = false) == desc.count(_ > v), s"desc v=$v")
    // Column path (codegen) agrees with the scalar; a tie maps to the
    // bucket BEFORE the bound, matching the strict comparison
    val got = spark.range(10).select(col("id").cast("double").as("v"))
      .select(col("v"), SearchSorted.bucketOf(col("v"), Array(2.0, 5.0, 8.0), asc = true).as("b"))
      .collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    assert(got(0.0) == 0 && got(2.0) == 0 && got(3.0) == 1 && got(8.0) == 2 && got(9.0) == 3)
  }

  test("globalRank routes NaN with Spark's sort order (largest double)") {
    import spark.implicits._
    // NaN sorts AFTER +Inf in Spark; the bucket router must agree in both
    // directions or NaN rows get wrong global ranks
    val df = Seq(5.0, Double.NaN, 1.0, 3.0, Double.NaN, 2.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    for (asc <- Seq(true, false)) {
      val order = if (asc) Seq(col("v").asc, col("id").asc) else Seq(col("v").desc, col("id").asc)
      val naive = df.withColumn("r", row_number().over(Window.orderBy(order: _*)).cast("long"))
      val fast = Ranks.globalRank(df, Seq(col("v") -> asc, col("id") -> true), "r")
        .drop("_n_total")
      assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty, s"asc=$asc")
    }
  }

  test("non-numeric leading sort key fails loudly at plan build, not by dropping rows") {
    import spark.implicits._
    val df = Seq(("b", 1L), ("a", 2L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Ranks.globalCumSum(df, Seq(col("k") -> true), col("v"))
    }
    assert(e.getMessage.contains("numeric"), e.getMessage)
  }

  test("graft_bucket_of coerces an integer child for interpreted eval") {
    // the SQL surface passes the child through uncast; ImplicitCastInputTypes
    // must make the analyzer insert the DOUBLE cast so interpreted
    // (non-codegen) fallback eval never sees a java.lang.Long
    import org.apache.spark.sql.catalyst.expressions.Literal
    graft.functions.GraftFunctions.register(spark)
    val q = spark.sql("SELECT graft_bucket_of(id, array(3.0D, 7.0D), true) AS b FROM range(10)")
    assert(q.queryExecution.analyzed.toString.toLowerCase.contains("cast(id"),
      s"analyzer did not coerce the BIGINT child:\n${q.queryExecution.analyzed}")
    assert(q.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 0, 0, 1, 1, 1, 1, 2, 2))
    // and two independently-built identical expressions canonicalize equal
    // (bounds as IndexedSeq, not Array) — what CSE / exchange reuse needs
    import graft.functions.SearchSortedCount
    val e1 = SearchSortedCount(Literal(1.0), IndexedSeq(1.0, 2.0), asc = true)
    val e2 = SearchSortedCount(Literal(1.0), IndexedSeq(1.0, 2.0), asc = true)
    assert(e1 == e2 && e1.semanticEquals(e2))
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
    // the bucket binary search must run inside whole-stage codegen, not
    // interpreted eval — asserted on an exchange-free scan+project (an
    // AQE plan hides materialized stage internals from inspection; "*("
    // marks codegen stages)
    val probe = spark.read.parquet(s"$sf/customer.parquet")
      .select(graft.functions.SearchSorted.bucketOf(
        col("c_acctbal").cast("double"), Array(0.0, 1000.0, 5000.0), asc = true).as("b"))
    val ps = probe.queryExecution.executedPlan.toString
    assert(ps.linesIterator.exists(l => l.contains("*(") && l.contains("graft_bucket_of")),
      s"expected graft_bucket_of in a codegen stage:\n$ps")
  }
}
