package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with the same key
  * and time <= the left row's time. Spark has no native ASOF JOIN; the
  * idiomatic composition is the union + windowed last-value trick:
  *
  *   1. tag both sides and union them (cheap, no shuffle);
  *   2. one window per key ordered by (time, side) carries the most recent
  *      right-side value forward (`last(..., ignoreNulls = true)`);
  *   3. keep only left rows.
  *
  * This costs exactly ONE shuffle (the window's partitioning on the key) —
  * the same lower bound a native as-of merge join would have — versus a
  * naive range join's quadratic per-key blowup. Right-side rows at the
  * same timestamp sort before left rows, so `time_left == time_right`
  * matches (ASOF's >= semantics). The DuckDB oracle uses its native
  * ASOF JOIN.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     build side, columns disjoint from left's except keys
    * @param keys      equi-join keys
    * @param leftTime  left ordering column (numeric/orderable)
    * @param rightTime right ordering column
    * @param payload   right-side columns to carry (renamed as given) */
  def asofLastBefore(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Map[String, String]): DataFrame = {

    val keyCols = keys.map(col)
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
    val r = right.select((keys.map(col) :+ col(rightTime).as("_t")) ++
        payload.map { case (from, to) => col(from).as(s"_p_$to") }.toSeq: _*)
      .withColumn("_side", lit(0))

    val leftCols = left.columns.map(c => col(c))
    val unioned = l.unionByName(r.select(r.columns.map(col): _*), allowMissingColumns = true)

    // right rows (_side=0) sort before left rows at equal time => inclusive;
    // the payload columns break ties between right rows sharing (key, time)
    // — without them the carried value would be partition-order-dependent
    // (the greatest payload tuple deterministically wins)
    val tieBreak = payload.values.toSeq.sorted.map(to => col(s"_p_$to").asc_nulls_first)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_t").asc +: col("_side").asc +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.values.toSeq.foldLeft(unioned) { (df, to) =>
      df.withColumn(to, last(col(s"_p_$to"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(leftCols ++ payload.values.toSeq.map(col): _*)
  }
}
