package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch — the mergeable point-frequency sketch (Cormode &
  * Muthukrishnan 2005) a 100 TB token/ngram frequency pass wants when the
  * item space is too wide to groupBy exactly: a depth×width counter grid
  * whose size is FIXED regardless of corpus size, built in one
  * partial+final aggregation over at most depth×width keys, and merged
  * across corpus splits by plain per-cell addition.
  *
  * Estimates never undercount (est >= exact always; collisions only add),
  * and `min` across the depth independent rows bounds the overcount to
  * ~e·N/width with high probability. Both properties are pinned in
  * CountMinSpec; merge-exactness (sum of split sketches == whole-corpus
  * sketch, cell for cell) is additionally driver-gated via the
  * `cms_sketch_merged` registry entry, whose Spark side is the two-phase
  * merged build while its DuckDB oracle is the flat single-pass build.
  *
  * Hashing follows the repo's md5-parity discipline (see
  * [[graft.dedup.Dedup.minhashSignatures]]): ONE md5 per item, its two
  * 28-bit halves (x, y) fed to `depth` affine maps (A_i·x + B_i·y + C_i)
  * mod P mod width — every product < 2^59, exact 64-bit on both engines,
  * so the DuckDB oracle reproduces every cell byte-for-byte. The affine
  * constants are deliberately a DIFFERENT family from minhash's so
  * co-use in one pipeline never correlates bucket collisions with
  * signature collisions.
  *
  * Scale shape: the build is explode(depth probes) → groupBy(row, bucket)
  * — map-side combine collapses to <= depth×width groups per task before
  * the (tiny) shuffle. The estimate side broadcasts the sketch (bounded
  * <= depth×width rows) into the query scan; the corpus itself never
  * re-shuffles to answer point queries.
  */
object CountMin {

  /** Same exact-arithmetic envelope as minhash: products of 28-bit halves
    * by these constants stay < 2^59. */
  val CmsP = 2147483647L // 2^31 - 1
  def cmsA(i: Int): Long = 4L * i + 5
  def cmsB(i: Int): Long = 999983L * (i + 1) + 11
  def cmsC(i: Int): Long = 104729L * i + 13

  /** Row-i bucket for an item whose md5 halves are columns x/y. All terms
    * are non-negative, so `%` and pmod agree (and match DuckDB's `%`). */
  private def bucket(i: Int, width: Int): Column =
    ((lit(cmsA(i)) * col("x") + lit(cmsB(i)) * col("y") + lit(cmsC(i))) % CmsP) % width

  private def halves(df: DataFrame, item: Column): DataFrame =
    df.select(item.as("item"))
      .withColumn("m", md5(col("item")))
      .select(col("item"), graft.dedup.Dedup.md5Half(col("m"), 1).as("x"),
        graft.dedup.Dedup.md5Half(col("m"), 8).as("y"))

  /** Build a depth×width sketch over one input row per item OCCURRENCE.
    * Returns (row, bucket, cnt) for the non-empty cells — at most
    * depth×width rows however large the corpus. Merge sketches from
    * corpus splits by unioning and summing `cnt` per (row, bucket)
    * ([[merge]]). */
  def sketch(items: DataFrame, item: Column, depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of [1,16]: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    val probes = (0 until depth).map(i =>
      struct(lit(i).as("rw"), bucket(i, width).as("bkt")))
    halves(items, item)
      .select(explode(array(probes: _*)).as("rb"))
      .groupBy(col("rb.rw").as("rw"), col("rb.bkt").as("bkt"))
      .agg(count(lit(1L)).as("cnt"))
  }

  /** One row per bigram OCCURRENCE of a text column's cleaned token
    * stream, as the space-joined "w1 w2" string — the item relation the
    * CMS registry entries and the streaming twin ([[graft.streaming
    * .CmsStream]]) both sketch, defined ONCE so batch and stream can
    * never diverge in tokenization. Array-local pair formation
    * ([[Normalize.bigramsCol]]) — zero shuffle to form pairs. */
  def bigramItems(docs: DataFrame, text: Column): DataFrame =
    docs.select(Normalize.tokensCol(text).as("toks"))
      .select(explode(Normalize.bigramsCol(col("toks"))).as("p"))
      .select(concat_ws(" ", col("p.w1"), col("p.w2")).as("item"))

  /** Cell-wise sum of sketches built over disjoint corpus splits — the
    * whole mergeability contract in one aggregation. Exact, not
    * approximate: addition is the sketch's native combine, so the result
    * is cell-identical to a single build over the union (CountMinSpec
    * pins this; `cms_sketch_merged` gates it against the flat oracle). */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("rw", "bkt").agg(sum("cnt").as("cnt"))

  /** Point-frequency estimates for the distinct items of `queries`:
    * est = min over the depth rows of the item's cell count (absent cell
    * = 0). The sketch side is bounded (<= depth×width rows), so it rides
    * a broadcast — the query relation never shuffles. */
  def estimate(cms: DataFrame, queries: DataFrame, item: Column,
               depth: Int = 4, width: Int = 1024): DataFrame = {
    val probes = (0 until depth).map(i =>
      struct(lit(i).as("rw"), bucket(i, width).as("bkt")))
    val ql = halves(queries.select(item.as("q")).distinct(), col("q"))
      .select(col("item"), explode(array(probes: _*)).as("rb"))
      .select(col("item"), col("rb.rw").as("rw"), col("rb.bkt").as("bkt"))
    ql.join(broadcast(cms), Seq("rw", "bkt"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
