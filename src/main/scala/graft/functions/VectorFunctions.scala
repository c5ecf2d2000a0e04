package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The built-in composition `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
  * is semantically right but runs interpreted: higher-order functions
  * allocate a zipped array and evaluate boxed lambdas per element, and
  * Catalyst does no subexpression caching inside lambdas. At 4M pairs x
  * 64 dims that interpretation cost dominated the whole dedup query. This
  * expression is the justified custom-`Expression` case from the build
  * rules: same left-to-right fold (bit-identical to the DuckDB oracle's
  * `list_reduce`), but as a tight primitive loop inside WholeStageCodegen.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, NOT fixed locals: a plan stage with many graft_dot
      // nodes inlines many copies of this snippet into ONE generated
      // function, and fixed `n`/`s`/`i` redefine — janino rejects the
      // class and the whole stage silently falls back to interpreted
      // eval (first seen on the 8-dot PCA recall-eval probe filter)
      val n = ctx.freshName("dotN")
      val s = ctx.freshName("dotS")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $b.getDouble($i); }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Left-to-right dot product (bit-compatible with `list_reduce` fold). */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** cosine = dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))) — same operation
    * order as the oracle SQL. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
