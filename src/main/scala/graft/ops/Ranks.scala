package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale-safe global order statistics.
  *
  * A bare `Window.orderBy(...)` funnels the whole table through ONE task
  * (Exchange SinglePartition) — correct at sf0.1, a wall at 100 TB. The
  * distributed rewrite here keeps answers bit-identical while every wide
  * stage stays parallel:
  *
  *   1. bucket every row by CONTENT: `_pid` = how many of n−1 literal
  *      quantile bounds (an approx-percentile sketch of the leading sort
  *      key, collected once at plan-build — bounded metadata, the same
  *      serve-a-model shape as the IVF centroids) sort before the row's
  *      key. Any monotone assignment yields exact ranks; bound precision
  *      only affects balance, never the answer;
  *   2. repartition on `_pid` and take the running sum inside each bucket
  *      (the bucket-partitioned window needs no further exchange);
  *   3. aggregate per-bucket totals straight off the scan — one tiny
  *      shuffle of ≤ n partial rows — turn them into cumulative offsets
  *      with a window over those ≤ n metadata rows, and broadcast-join
  *      them back: global = offset(_pid) + local.
  *
  * Because `_pid` is computed from literals, every branch and every task
  * retry derives the identical bucket for a row — correctness does not
  * depend on physical partition ids, exchange reuse, or AQE decisions.
  * (An earlier form keyed on `spark_partition_id()` after
  * `repartitionByRange`; that silently misaligns if the two consumers of
  * the exchange ever observe different layouts.)
  *
  * Sort keys are `(expression, ascending)` pairs; the LEADING key must be
  * numeric (the quantile sketch needs it) and the full key list must be a
  * total order — with ties the ROWS-frame local sum would be
  * partition-placement-dependent.
  */
object Ranks {

  /** Global running sum of `value` over the total order given by `keys`,
    * as `out`; also attaches `_n_total` (the global sum of `value`). */
  def globalCumSum(df: DataFrame, keys: Seq[(Column, Boolean)], value: Column,
                   out: String = "cumsum"): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val (lead, leadAsc) = keys.head
    val sortCols = keys.map { case (c, asc) => if (asc) c.asc else c.desc }
    // the documented "leading key must be numeric" constraint, enforced at
    // plan-build: a non-numeric key whose double cast yields NULL would
    // otherwise get a NULL _pid and be silently DROPPED by the offsets
    // join — fail loudly instead
    val leadType = df.select(lead).schema.head.dataType
    require(leadType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"globalCumSum leading sort key must be numeric, got $leadType: " +
        "the quantile sketch and content bucketing cast it to double")

    // n−1 ascending quantile bounds of the leading key (as doubles — the
    // cast is monotone, and only bucketing uses it; the local sort keeps
    // the exact keys), one small job at plan-build time; a null/empty
    // sketch (empty input) degrades to a single bucket, which is still
    // exact
    val leadD = lead.cast("double")
    val qs = array((1 until n).map(i => lit(i.toDouble / n)): _*)
    val boundsRow = df.select(percentile_approx(leadD, qs, lit(10000)).as("b")).head()
    // drop any NaN the sketch absorbed — NaN rows are routed explicitly
    // below, and a NaN bound would wreck the binary search's ordering
    val bounds: Array[Double] =
      if (boundsRow.isNullAt(0)) Array.empty
      else boundsRow.getSeq[Double](0).filterNot(_.isNaN).toArray

    // monotone content bucket: count of bounds sorting strictly before
    // the key, via the codegen'd binary-search Expression (O(log n) per
    // row, O(1) plan nodes — a compare-and-add Column chain would be an
    // O(n)-deep tree and O(n) per row at cluster partition counts). Nulls
    // go where the default sort order puts them (asc = first bucket,
    // desc = last); NaN is Spark's LARGEST double (sorts after +Inf), so
    // it gets the last asc / first desc bucket — the strict comparisons
    // in the binary search are all false for NaN and would otherwise drop
    // it into bucket 0 regardless of direction.
    val sortedBounds = if (leadAsc) bounds else bounds.reverse
    val pid: Column =
      if (sortedBounds.isEmpty) lit(0)
      else when(lead.isNull, if (leadAsc) lit(0) else lit(sortedBounds.length))
        .when(isnan(leadD), if (leadAsc) lit(sortedBounds.length) else lit(0))
        .otherwise(graft.functions.SearchSorted.bucketOf(leadD, sortedBounds, leadAsc))

    val keyed = df.withColumn("_v", value).withColumn("_pid", pid)
    val local = keyed.repartition(n, col("_pid"))
      .withColumn("_lc", sum(col("_v")).over(Window.partitionBy("_pid").orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // totals come straight off the (column-pruned) scan — the map-side
    // partial aggregation ships ≤ n rows per task
    val totals = keyed.groupBy("_pid").agg(sum(col("_v")).as("_cnt"))
    val byPid = Window.orderBy("_pid")
    val offsets = totals.select(
      col("_pid"),
      coalesce(sum("_cnt").over(byPid.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .as("_off"),
      sum("_cnt").over(byPid.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .as("_n_total"))
    local.join(broadcast(offsets), "_pid")
      .withColumn(out, col("_off") + col("_lc"))
      .drop("_pid", "_v", "_lc", "_off")
  }

  /** Global 1-based rank (row_number over a total order) as `out`: the
    * running count of rows — [[globalCumSum]] of the constant 1. */
  def globalRank(df: DataFrame, keys: Seq[(Column, Boolean)], out: String = "rank"): DataFrame =
    globalCumSum(df, keys, lit(1L), out)

  /** Scale-safe NTILE(k) over a total order, bit-identical to the SQL
    * `ntile(k) OVER (ORDER BY ...)`: the first `n mod k` buckets take
    * `n div k + 1` rows, the rest `n div k`, assigned from the global rank
    * computed by [[globalRank]] — no single-partition window over data.
    * All bucket arithmetic is integer `div`/`pmod`, never double division:
    * a double quotient one ulp above a true integer would mis-assign a
    * row once counts reach 2^53-quotient territory. */
  def ntileByRange(df: DataFrame, k: Int, keys: Seq[(Column, Boolean)],
                   out: String = "ntile"): DataFrame =
    Ranks.globalRank(df, keys, "_r")
      .withColumn("_q", expr(s"_n_total div CAST($k AS BIGINT)"))
      .withColumn("_m", pmod(col("_n_total"), lit(k.toLong)))
      .withColumn("_thresh", col("_m") * (col("_q") + 1)) // rows in the wide buckets
      .withColumn(out,
        when(col("_r") <= col("_thresh"), expr("(_r - 1) div (_q + 1)"))
          // guard: _q = 0 only when n < k, where the branch above covers
          // every row; greatest() keeps the dead branch division legal
          .otherwise(col("_m") + expr("(_r - _thresh - 1) div greatest(_q, CAST(1 AS BIGINT))"))
          + 1L)
      .drop("_r", "_n_total", "_q", "_m", "_thresh")
}
