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

  /** Row-unique salt in [0, buckets). A hot key's rows MUST spread
    * regardless of their payload, so the salt hashes a per-row id — a salt
    * derived from the aggregated value would collapse a hot key whose
    * values are constant (1 billion rows of `(A, 1.00)`) into a single
    * (key, salt) group, recreating the exact hot spot the rewrite exists
    * to break. The assignment varies with physical row order, which is
    * irrelevant: any assignment yields the same commutative-associative
    * aggregate. */
  def saltCol(buckets: Int): Column =
    pmod(hash(monotonically_increasing_id()), lit(buckets))

  /** `df.groupBy(keys).agg(sum(valueCol))`, executed as salted two-phase. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, buckets: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_salt", saltCol(buckets))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
    salted.groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }

  /** Salted count(*) per key. */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_salt", saltCol(buckets))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
    salted.groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("cnt"))
  }
}
