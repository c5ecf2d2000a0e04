package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations: two-phase salted aggregation.
  *
  * Spark's partial aggregation already absorbs most key skew map-side, but
  * when a single group's *partial results* still overwhelm one reducer
  * (e.g. one word dominating a decade at 100 TB), the standard rewrite is
  * to salt the key, aggregate, then re-aggregate without the salt. Both
  * phases are hash aggregations on well-spread keys; results are identical
  * to the direct aggregation for any commutative-associative aggregate.
  */
object Salt {

  /** Deterministic per-row salt in [0, buckets). Uses the row's own value
    * hash, so repeated runs produce identical partitioning. */
  def saltCol(on: Column, buckets: Int): Column = pmod(hash(on), lit(buckets))

  /** `df.groupBy(keys).agg(sum(valueCol))`, executed as salted two-phase. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, buckets: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_salt", saltCol(col(valueCol), buckets))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
    salted.groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }

  /** Salted count(*) per key. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltOn: String, buckets: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_salt", saltCol(col(saltOn), buckets))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
    salted.groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("cnt"))
  }
}
