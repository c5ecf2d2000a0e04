package graft

import org.apache.spark.sql.functions._
import graft.ops.ZOrder

class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits exactly (morton curve)") {
    import spark.implicits._
    // x=5 (101b) occupies even bits -> 1 + 16 = 17; y=3 (011b) odd bits
    // -> 2 + 8 = 10; morton(5,3) = 27
    val df = Seq((5L, 3L)).toDF("x", "y")
    val z = df.select(ZOrder.zValue(Seq(col("x"), col("y")), 3).as("z")).head().getLong(0)
    assert(z == 27L)
    // single column degenerates to identity (within bits)
    val one = Seq(Tuple1(13L)).toDF("x")
      .select(ZOrder.zValue(Seq(col("x")), 4).as("z")).head().getLong(0)
    assert(one == 13L)
  }

  test("zValue refuses to overflow 62 bits") {
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(lit(1L), lit(1L), lit(1L)), 21)
    }
  }

  test("z-order layout touches fewer partitions than lexicographic for a cross-column box") {
    import spark.implicits._
    // 32x32 grid; the box constrains ONLY the second sort column — the
    // worst case for a lexicographic (a, b) layout, which scatters b
    val grid = (for { a <- 0 until 32; b <- 0 until 32 } yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val box = col("b") >= 4 && col("b") <= 7
    val zv = ZOrder.zValue(Seq(col("a"), col("b")), 5)
    def touched(laidOut: org.apache.spark.sql.DataFrame): Long =
      laidOut.select(spark_partition_id().as("pid"), col("a"), col("b"))
        .filter(box).select("pid").distinct().count()
    val zTouched = touched(grid.withColumn("_zv", zv).repartitionByRange(16, col("_zv")))
    val lexTouched = touched(grid.repartitionByRange(16, col("a"), col("b")))
    assert(zTouched < lexTouched,
      s"z-order must localize the b-only box: z=$zTouched lex=$lexTouched")
  }

  test("layout preserves rows and is deterministic") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong % 97, i.toLong % 31)).toDF("a", "b")
    val out = ZOrder.layout(df, Seq(col("a"), col("b")), 7, 8)
    assert(out.count() == 1000)
    assert(out.columns.toSeq == Seq("a", "b"), "the helper column must not leak")
  }
}
