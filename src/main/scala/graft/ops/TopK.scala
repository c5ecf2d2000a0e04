package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded Top-K per group (reference: `Job3.java:56-110` — a size-100
  * min-heap in combiner and reducer). Spark-native form: `row_number()` over
  * a per-group window + `<= k` filter. Spark >= 3.5 rewrites this via
  * `InferWindowGroupLimit` into a partial+final `WindowGroupLimit`, which
  * reproduces the reference combiner's >99.9% shuffle pruning
  * (`StatisticalReport .md:85-116`) automatically: each map task keeps only
  * its local top-k before the exchange. Callers must pass deterministic
  * tie-break columns (the reference heap's order on equal scores is
  * arbitrary).
  */
object TopK {

  def topKPerGroup(df: DataFrame, partitionCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame =
    df.withColumn("rn", row_number().over(Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)))
      .filter(col("rn") <= k)
      .drop("rn")
}
