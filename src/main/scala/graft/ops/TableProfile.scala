package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the ANALYZE/data-quality pass a corpus
  * pipeline runs before trusting a new drop: per column, row count, null
  * count, exact distinct count, and min/max.
  *
  * ONE corpus scan: all per-column aggregates run in a single
  * aggregation (multiple DISTINCT aggregates make Catalyst insert an
  * Expand of factor #distinct-columns+1 — the standard exact-distinct
  * plan; at 100 TB swap `countDistinct` for `approx_count_distinct`,
  * the same mergeable-sketch trade the `approx_distinct` registry twin
  * documents), then the 1-row wide result unpivots to one row per
  * column with `stack` — metadata-sized, no second pass.
  *
  * min/max aggregate in the column's native type and cast to string
  * AFTER (integer and varchar renderings are engine-identical; numeric
  * min-then-cast, never lexicographic cast-then-min). */
object TableProfile {

  /** Fixed-width histogram of a numeric column: bin = floor((x - lo)/w),
    * with per-bin count and exact value bounds. One partial+final
    * aggregation keyed on the bin id (bounded cardinality), the
    * distribution companion to [[profile]]'s scalar stats. Rows below
    * `lo` land in negative bins rather than being silently dropped —
    * out-of-range data should be visible in a profiling tool. */
  def histogram(df: DataFrame, column: String, lo: Double, width: Double): DataFrame = {
    require(width > 0, s"bin width must be positive, got $width")
    val x = col(column).cast("double")
    df.filter(x.isNotNull)
      .groupBy(floor((x - lo) / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), min(x).as("lo_val"), max(x).as("hi_val"))
      .select(col("bin"), (lit(lo) + col("bin") * width).as("bin_lo"), col("n"),
        col("lo_val"), col("hi_val"))
  }

  /** Robust (median/MAD) outlier detection on a numeric column — the
    * quality-control filter that survives the heavy tails a mean/stddev
    * z-score is wrecked by: flag rows whose |x − median| exceeds
    * `z` × 1.4826 × MAD (1.4826 scales the MAD to σ under normality).
    *
    * Scale shape: two grouping-free exact-percentile aggregates (median,
    * then the median of deviations), each a single-row broadcast attached
    * by cross join — the corpus streams twice, shuffles never; at 100 TB
    * swap `percentile` for `approx_percentile` (the documented sketch-twin
    * trade). Medians and the threshold round to 6 digits before comparing
    * so the flag boundary is engine-identical. A zero MAD (over half the
    * mass on one value) degrades correctly: any nonzero deviation flags,
    * and `z_score` goes null rather than dividing by zero. */
  def madOutliers(df: DataFrame, column: String, z: Double = 3.0): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    val x = col(column).cast("double")
    val base = df.filter(x.isNotNull).select(col("doc_id"), x.as("x"))
    val med = base.agg(round(expr("percentile(x, 0.5)"), 6).as("med"))
    val dev = base.crossJoin(broadcast(med)).withColumn("dev", abs(col("x") - col("med")))
    val mad = dev.agg(round(expr("percentile(dev, 0.5)"), 6).as("mad"))
    dev.crossJoin(broadcast(mad))
      .filter(round(col("dev"), 6) > round(lit(z) * 1.4826 * col("mad"), 6))
      .select(col("doc_id"), col("x"), round(col("dev"), 6).as("dev"),
        when(col("mad") > 0, round(col("dev") / (lit(1.4826) * col("mad")), 6)).as("z_score"))
  }

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = count(lit(1L)).as("__n") +: columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = columns.map(c =>
      s"'$c', __n, __nn_$c, __nd_$c, __mn_$c, __mx_$c").mkString(", ")
    wide.selectExpr(
      s"stack(${columns.size}, $stackArgs) AS (column, n, n_null, n_distinct, min_val, max_val)")
  }
}
