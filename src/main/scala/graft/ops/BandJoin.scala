package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ε-band self-join: all row pairs with equal keys whose numeric values
  * lie within `eps` of each other. Spark has no native band join — the
  * naive expression (`abs(va - vb) <= eps` as the join condition) plans
  * as a per-key cross product, quadratic in group size. The scale-safe
  * composition is GRID BUCKETING:
  *
  *   1. bucket every value at `floor(value / eps)`;
  *   2. the probe side replicates into its own bucket and both
  *      neighbors (a 3× fan-out, constant — not data-dependent);
  *   3. equi-join on (keys, bucket) — `|va − vb| <= eps` implies the
  *      buckets differ by at most 1, so every qualifying pair meets in
  *      the build row's home bucket EXACTLY once (no distinct needed);
  *   4. the exact band predicate filters inside the equi-join.
  *
  * The shuffle is keyed on (keys, bucket), so pair generation is
  * quadratic only within one ε-wide grid cell — the same locality a
  * native band join would exploit. The classic ε-join from the spatial
  * literature, the 1-D case of grid-file joins.
  */
object BandJoin {

  /** @param df    input relation
    * @param keys  equi-join key columns
    * @param idCol row identity column (output pairs satisfy a < b)
    * @param valueCol numeric column the band predicate applies to
    * @param eps   band half-width (pairs kept at |va − vb| <= eps) */
  def bandJoin(df: DataFrame, keys: Seq[String], idCol: String, valueCol: String,
               eps: Double): DataFrame = {
    // eps = 0 makes floor(va/eps) = ±Infinity and the ANSI long cast throws
    // CAST_OVERFLOW mid-job; a negative eps silently returns garbage. Fail
    // at plan time instead (the require(windowSize >= 2) convention).
    require(eps > 0, s"band half-width eps must be positive, got $eps")
    val lb = floor(col("va") / eps).cast("long")
    val l = df.select(keys.map(col) :+ col(idCol).as("a") :+ col(valueCol).as("va"): _*)
      .withColumn("bkt", explode(array(lb - 1, lb, lb + 1)))
    val r = df.select(keys.map(col) :+ col(idCol).as("b") :+ col(valueCol).as("vb"): _*)
      .withColumn("bkt", floor(col("vb") / eps).cast("long"))
    l.join(r, keys :+ "bkt")
      .filter(col("a") < col("b") && abs(col("va") - col("vb")) <= eps)
      .select(keys.map(col) ++ Seq(col("a"), col("b"), col("va"), col("vb"),
        round(abs(col("va") - col("vb")), 6).as("diff")): _*)
  }
}
