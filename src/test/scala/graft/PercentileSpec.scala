package graft

import org.apache.spark.sql.functions._

class PercentileSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("percentiles_approx gate: exact columns match the exact twin, sketch booleans all hold") {
    val exact = SparkEntry.queries("percentiles")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val gated = SparkEntry.queries("percentiles_approx")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)),
          (r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap
    assert(gated.keySet == exact.keySet)
    gated.foreach { case (flag, (vals, oks)) =>
      assert(vals == exact(flag), s"$flag: gate's exact columns drifted from the exact twin")
      assert(oks == ((true, true, true)),
        s"$flag: sketch estimate escaped the [p-0.01, p+0.01] envelope: $oks")
    }
  }

  test("approx_percentile sketch tracks the exact percentiles within tolerance (raw, registry-independent)") {
    // the direct sketch-vs-exact comparison the gate booleans summarize —
    // kept raw so a gate refactor can't silently weaken the check
    val both = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_quantity, 0.5, 10000)").cast("double").as("am"),
        expr("percentile(l_quantity, 0.5)").as("m"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)").cast("double").as("a90"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .collect()
    both.foreach { r =>
      def close(a: Double, b: Double) = math.abs(a - b) <= 0.02 * math.max(math.abs(b), 1.0)
      assert(close(r.getDouble(1), r.getDouble(2)) && close(r.getDouble(3), r.getDouble(4)),
        s"${r.getString(0)}: sketch strayed past 2%: $r")
    }
  }

  test("approx_distinct gate: exact columns match the exact twin, HLL booleans all hold") {
    val exact = SparkEntry.queries("distinct_parts")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val gated = SparkEntry.queries("approx_distinct")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)), (r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(gated.keySet == exact.keySet)
    gated.foreach { case (flag, (vals, oks)) =>
      assert(vals == exact(flag), s"$flag: gate's exact counts drifted from distinct_parts")
      assert(oks == ((true, true)), s"$flag: HLL estimate escaped the 4-sigma rsd bound")
    }
  }

  test("approx_count_distinct sketch tracks the exact counts within rsd (raw, registry-independent)") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"),
        approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
        countDistinct(col("l_suppkey")).as("s"),
        approx_count_distinct(col("l_suppkey"), 0.01).as("as"))
      .collect()
    rows.foreach { r =>
      val (p, ap, s, as) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // rsd 0.01 -> allow 5% (5 sigma) slack
      assert(math.abs(ap - p) <= 0.05 * p && math.abs(as - s) <= math.max(0.05 * s, 2.0),
        s"${r.getString(0)}: approx ($ap,$as) vs exact ($p,$s)")
    }
  }
}
