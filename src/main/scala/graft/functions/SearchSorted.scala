package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Codegen'd binary search over a literal sorted bounds array: how many of
  * the bounds sort strictly BEFORE the input value (ascending order when
  * `asc`, descending otherwise) — i.e. the bucket index of the value among
  * `bounds.length + 1` range buckets.
  *
  * This exists for [[graft.ops.Ranks]]: the bucket could be written as a
  * chain of n−1 compare-and-add Column expressions, but that builds an
  * O(n)-deep Catalyst tree evaluated in O(n) per ROW — a StackOverflow at
  * the 10k–100k shuffle-partition counts a real cluster runs, and linear
  * work per row regardless. Here the model ships as one reference object
  * (the double[]), the plan stays O(1) nodes, and each row pays
  * O(log n) — the case where a custom Expression genuinely beats what the
  * built-in operators can express. Equal values NEVER count as before, so
  * a run of duplicate bounds (a skewed quantile sketch) maps a tied value
  * to the FIRST bucket of the run — the monotone tie rule Ranks needs.
  */
case class SearchSortedCount(child: Expression, bounds: IndexedSeq[Double], asc: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {

  // The bounds model is an IndexedSeq (value-based equals/hashCode) so two
  // independently built but identical expressions canonicalize equal —
  // an Array field here would make semanticEquals reference-based and
  // silently defeat CSE / exchange reuse. The primitive double[] the hot
  // path needs is derived once per task, not per row.
  @transient private lazy val boundsArr: Array[Double] = bounds.toArray

  override def dataType: DataType = IntegerType
  // Coerce any numeric child to DOUBLE at analysis time: interpreted eval
  // casts input to Double, so an uncast INT child (reachable via the SQL
  // builder) would CCE whenever Spark falls back off codegen.
  override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(DoubleType)
  override def prettyName: String = "graft_bucket_of"

  override def nullSafeEval(input: Any): Any =
    SearchSorted.countBefore(boundsArr, input.asInstanceOf[Double], asc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", boundsArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SearchSorted.countBefore($ref, $c, $asc)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SearchSorted {

  /** Number of `bounds` entries strictly before `v` in sort order.
    * `bounds` must be sorted ascending when `asc`, descending otherwise.
    * Shared by interpreted eval and generated code. */
  def countBefore(bounds: Array[Double], v: Double, asc: Boolean): Int = {
    // lower-bound binary search: first index whose bound does NOT sort
    // strictly before v
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val before = if (asc) bounds(mid) < v else bounds(mid) > v
      if (before) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Bucket index of `v` among the `bounds.length + 1` range buckets. */
  def bucketOf(v: Column, bounds: Array[Double], asc: Boolean): Column =
    GraftSqlBridge.column(
      SearchSortedCount(GraftSqlBridge.expression(v), bounds.toIndexedSeq, asc))
}
