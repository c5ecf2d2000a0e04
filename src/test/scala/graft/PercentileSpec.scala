package graft

class PercentileSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_percentile twin tracks the exact percentiles within tolerance") {
    val exact = SparkEntry.queries("percentiles")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = SparkEntry.queries("percentiles_approx")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (m, p25, p90)) =>
      val (am, a25, a90) = approx(flag)
      // accuracy 10000 on ~6k rows: the sketch is effectively exact up to
      // interpolation (exact percentile interpolates, the sketch returns a
      // data value) — allow 2% relative slack
      def close(a: Double, b: Double) = math.abs(a - b) <= 0.02 * math.max(math.abs(b), 1.0)
      assert(close(am, m) && close(a25, p25) && close(a90, p90),
        s"$flag: approx ($am,$a25,$a90) vs exact ($m,$p25,$p90)")
    }
  }

  test("approx_count_distinct twin tracks the exact distinct counts within rsd") {
    val exact = SparkEntry.queries("distinct_parts")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = SparkEntry.queries("approx_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (p, s)) =>
      val (ap, as) = approx(flag)
      // rsd 0.01 -> allow 5% (5 sigma) slack
      assert(math.abs(ap - p) <= 0.05 * p && math.abs(as - s) <= math.max(0.05 * s, 2.0),
        s"$flag: approx ($ap,$as) vs exact ($p,$s)")
    }
  }
}
