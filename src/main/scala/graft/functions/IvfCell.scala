package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Codegen'd IVF cell assignment: argmax-dot over a literal centroid
  * model, smallest cid on ties, as ONE compiled loop against a k x dim
  * reference matrix.
  *
  * Why an Expression: the composable form (`greatest` over k structs of
  * `(dot(v, array(64 literals)), -cid)`) carries O(k·dim) PLAN NODES.
  * That is fine at k=8 but catastrophic at k=80: the generated code for
  * one projection blows past JVM method limits, whole-stage codegen
  * falls back to interpreted eval, and every row then CONSTRUCTS k
  * literal arrays and evaluates k boxed struct comparisons — measured
  * 672 s for a 20k-vector semantic-dedup assignment that this
  * expression does in under a second. The model rides along as one
  * reference object (the SearchSorted precedent), the plan stays O(1)
  * nodes no matter how large nClusters grows — and "grow nClusters
  * with the corpus" is exactly the knob the semantic-dedup scale story
  * turns.
  *
  * Semantics are bit-identical to the struct form: per-cell dot is the
  * same left-to-right fold as [[DotProduct]] (truncated at the shorter
  * length), strict `>` keeps the FIRST maximal cell, and `cids` is
  * sorted ascending by the trainer — so ties break to the smallest cid,
  * which is what the injected-literal oracle SQL mirrors.
  *
  * `cids`/`cents` are IndexedSeqs (value-based equals) so identical
  * expressions canonicalize equal; the primitive arrays the hot loop
  * needs are derived once per task. */
case class IvfCellExpr(child: Expression, cids: IndexedSeq[Int],
                       cents: IndexedSeq[IndexedSeq[Double]]) extends UnaryExpression {
  require(cids.nonEmpty && cids.length == cents.length,
    s"centroid model mismatch: ${cids.length} ids vs ${cents.length} vectors")

  @transient private lazy val idArr: Array[Int] = cids.toArray
  @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ivf_cell"

  override def nullSafeEval(input: Any): Any =
    IvfCell.cellOf(input.asInstanceOf[ArrayData], idArr, centArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("ivfIds", idArr, "int[]")
    val m = ctx.addReferenceObj("ivfCents", centArr, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.IvfCell.cellOf($c, $ids, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfCell {

  /** Shared by interpreted eval and generated code. */
  def cellOf(v: ArrayData, ids: Array[Int], cents: Array[Array[Double]]): Int = {
    var best = Double.NegativeInfinity
    var bi = 0
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val n = math.min(v.numElements(), c.length)
      var d = 0.0
      var j = 0
      while (j < n) { d += v.getDouble(j) * c(j); j += 1 }
      if (d > best) { best = d; bi = i }
      i += 1
    }
    ids(bi)
  }

  def cellCol(v: Column, cents: Seq[(Int, Array[Double])]): Column =
    GraftSqlBridge.column(IvfCellExpr(GraftSqlBridge.expression(v),
      cents.map(_._1).toIndexedSeq, cents.map(_._2.toIndexedSeq).toIndexedSeq))
}
