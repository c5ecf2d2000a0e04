package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash over a string's code points:
  * `h_i = (h_{i-1} * 31 + codepoint_i) mod 1_000_000_007`, h_0 = 0.
  *
  * The modulus keeps every intermediate inside a positive 64-bit long
  * (31 * (p-1) + max_codepoint < 2^35), which is what makes the DuckDB
  * oracle reproducible: `list_reduce(list_prepend(0, codes), (a, c) ->
  * (a * 31 + c) % 1000000007)` computes the identical fold with no
  * overflow on either engine. A document fingerprint that, unlike the
  * md5 bag-of-words fingerprint, is order-sensitive — the classic
  * content-defined-chunking / shift-resistant primitive.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  final val Base = 31L
  final val Mod  = 1000000007L

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  def rollingHash(c: Column): Column =
    GraftSqlBridge.column(RollingHashExpr(GraftSqlBridge.expression(c)))
}
