package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale-safe global order statistics.
  *
  * A bare `Window.orderBy(...)` funnels the whole table through ONE task
  * (Exchange SinglePartition) — correct at sf0.1, a wall at 100 TB. The
  * classic distributed rewrite keeps the answer bit-identical while every
  * wide stage stays parallel:
  *
  *   1. range-partition on the sort key (the same sampled partitioner a
  *      global `ORDER BY` uses — partitions are contiguous key ranges in
  *      order, so partition id IS the coarse rank);
  *   2. rank locally inside each range partition;
  *   3. aggregate one `(partition, count)` row per partition — bounded by
  *      the partition COUNT, i.e. metadata, not data — and turn it into
  *      cumulative offsets with a tiny single-partition window (over ≤ the
  *      shuffle-partition count rows, never over table rows);
  *   4. broadcast-join the offsets back: global rank = offset + local rank.
  *
  * The global rank depends only on the total order, not on where the
  * sampled range bounds land, so the result is deterministic even though
  * the partitioner samples.
  */
object Ranks {

  /** Global running sum of `value` over a total order as `out`, computed
    * without any single-partition pass over data rows. `sortCols` must be a
    * total order (include a tiebreaker key) — with ties the ROWS-frame
    * local sum would make results partition-placement-dependent. Also
    * attaches `_n_total` (the global sum of `value`) for consumers that
    * need it. */
  def globalCumSum(df: DataFrame, sortCols: Seq[Column], value: Column,
                   out: String = "cumsum"): DataFrame = {
    // EXPLICIT partition count, not repartitionByRange(cols…): the offsets
    // join keys on spark_partition_id(), and the window branch and the
    // counts branch each read the range exchange. A column-only
    // repartition is REPARTITION_BY_COL, which AQE may coalesce — and it
    // may coalesce the two reads DIFFERENTLY, silently misaligning the
    // pids the two branches join on. REPARTITION_BY_NUM is never
    // coalesced, so both branches observe the identical layout.
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, sortCols: _*)
      .withColumn("_pid", spark_partition_id()).withColumn("_v", value)
    // both consumers below share the range Exchange (ReusedExchange)
    val local = ranged.withColumn(
      "_lc", sum(col("_v")).over(Window.partitionBy("_pid").orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = ranged.groupBy("_pid").agg(sum(col("_v")).as("_cnt"))
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
  def globalRank(df: DataFrame, sortCols: Seq[Column], out: String = "rank"): DataFrame =
    globalCumSum(df, sortCols, lit(1L), out)

  /** Scale-safe NTILE(k) over a total order, bit-identical to the SQL
    * `ntile(k) OVER (ORDER BY ...)`: the first `n mod k` buckets take
    * `n div k + 1` rows, the rest `n div k`, assigned from the global rank
    * computed by [[globalRank]] — no single-partition window over data. */
  def ntileByRange(df: DataFrame, k: Int, sortCols: Seq[Column], out: String = "ntile"): DataFrame = {
    val r = col("_r")
    val q = (col("_n_total") / k).cast("long")      // floor: counts are non-negative
    val m = pmod(col("_n_total"), lit(k.toLong))
    val thresh = m * (q + 1)                        // rows living in the wide buckets
    Ranks.globalRank(df, sortCols, "_r")
      .withColumn(out,
        when(r <= thresh, (r - 1) / (q + 1))
          // guard: q = 0 only when n < k, where the branch above covers
          // every row; greatest() keeps the dead branch division legal
          .otherwise(m + (r - thresh - 1) / greatest(q, lit(1L)))
          .cast("long") + 1L)
      .drop("_r", "_n_total")
  }
}
