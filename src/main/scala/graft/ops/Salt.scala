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

  /** Content-stable salt in [0, buckets): a hash of EVERY input column.
    * Hashing a physical row id (monotonically_increasing_id) would spread
    * perfectly but depends on row order within a partition — after a
    * fetch-failure recomputation the same row can land in a different
    * (key, salt) group than the partials already shipped, double-counting
    * or dropping it. Content hashing re-salts a recomputed row
    * identically, so retries are safe; a hot key still spreads as long as
    * its rows differ in ANY column (payloads, ids, timestamps).
    *
    * Limit: rows identical in EVERY hashed column collapse into one
    * (key, salt) group. If your skew case is billions of byte-identical
    * rows, disambiguate upstream (e.g. carry a source offset column) — no
    * deterministic content salt can split indistinguishable rows.
    *
    * `saltOn` narrows the hash to a discriminating subset (a row key like
    * (l_orderkey, l_linenumber)) — hashing a multi-KB text payload per
    * row to derive a 4-bit salt is pure waste; default (empty) hashes
    * every column as the always-correct fallback. */
  def saltCol(df: DataFrame, buckets: Int, saltOn: Seq[String] = Nil): Column = {
    val cols = if (saltOn.nonEmpty) saltOn else df.columns.toSeq
    pmod(hash(cols.map(col): _*), lit(buckets))
  }

  /** `df.groupBy(keys).agg(sum(valueCol))`, executed as salted two-phase. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, buckets: Int = 16,
                saltOn: Seq[String] = Nil): DataFrame = {
    val salted = df
      .withColumn("_salt", saltCol(df, buckets, saltOn))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
    salted.groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }

  /** Skew-safe inner equi-join on `key`: the (large, skewed) left side is
    * salted content-stably; the right side is replicated `buckets`× so
    * every (key, salt) bucket finds its match. A hot join key's rows then
    * land on `buckets` reducers instead of one. Replication multiplies the
    * RIGHT side — pass the smaller relation there. Row-identical to
    * `left.join(right, key)`: salting only refines the partitioning key.
    * (AQE's skew-join split handles moderate skew automatically; this is
    * the explicit form for the pathological single-key case a plan can't
    * split because one KEY, not one partition, is hot.) */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int = 16, saltOn: Seq[String] = Nil): DataFrame = {
    val l = left.withColumn("_salt", saltCol(left, buckets, saltOn))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted count(*) per key. */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_salt", saltCol(df, buckets))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
    salted.groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("cnt"))
  }
}
