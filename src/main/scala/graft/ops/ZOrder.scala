package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout clustering — the data-layout operator a
  * 100 TB table needs when queries filter on MORE THAN ONE column: a
  * single-column sort gives perfect min/max pruning on that column and
  * none on the others, while interleaving the bits of k columns gives
  * every column ~1/k of the pruning power. Writing a table
  * range-partitioned and sorted by its z-value is what lakehouse
  * `OPTIMIZE ZORDER BY` does; here the curve value is a pure integer
  * `Column` expression (codegen'd, exact on any engine — no floats
  * anywhere), so it composes with `repartitionByRange` + parquet write
  * for the full layout, or with any ordering that wants
  * multi-dimensional locality.
  */
object ZOrder {

  /** Morton code of `cols`: bit `j` of column `i` lands at output bit
    * `j * cols.size + i`. Inputs must already be non-negative and fit in
    * `bits` bits (use [[cell]] to quantize arbitrary ints); with
    * `bits * cols.size <= 62` the result is an exact positive BIGINT. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits > 0 && bits * cols.size <= 62,
      s"${cols.size} cols x $bits bits exceed a 62-bit z-value")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftright(c.cast("long"), j).bitwiseAND(lit(1L)) * lit(1L << (j * n + i))
    terms.reduce(_ + _)
  }

  /** Quantize a non-negative integer column into `2^bits` cells by
    * modulus — the cheap deterministic quantizer for key-like ints
    * (hash-distributed ids). Rank-based quantization (equal-population
    * cells for skewed value columns) is [[Ranks.ntileByRange]]'s job;
    * its output feeds [[zValue]] directly. */
  def cell(c: Column, bits: Int): Column = pmod(c.cast("long"), lit(1L << bits))

  /** The full layout: range-partition by z-value (so each output file
    * owns a contiguous curve segment → tight per-file min/max on every
    * interleaved column) and sort within partitions for row-group-level
    * pruning. `numPartitions` sizes output files, exactly like a
    * lakehouse OPTIMIZE target size. */
  def layout(df: DataFrame, cols: Seq[Column], bits: Int, numPartitions: Int): DataFrame =
    df.withColumn("_zv", zValue(cols, bits))
      .repartitionByRange(numPartitions, col("_zv"))
      .sortWithinPartitions("_zv")
      .drop("_zv")
}
