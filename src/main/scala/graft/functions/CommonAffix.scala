package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd common-prefix / common-suffix CHAR lengths of two strings —
  * the maximal-extension primitive of exact-substring deduplication
  * ([[graft.dedup.Dedup.substringMatches]]).
  *
  * Why an Expression and not Column algebra: the composable form
  * (`split` into char arrays + `zip_with` null-safe equality +
  * `array_position` of the first mismatch) is correct but runs on
  * Spark's INTERPRETED higher-order-function path — per-element lambda
  * dispatch plus two char-array materializations per call, and the
  * when/otherwise consumer evaluates the array pipeline more than once.
  * Measured on the sf0.1 candidate stream that's tens of seconds for
  * work that is, physically, a byte compare. This expression is the
  * byte compare: zero allocation (`UTF8String.getByte`, no copy), one
  * pass, inside whole-stage codegen.
  *
  * Exactness on non-ASCII: bytes are compared first, then the match is
  * trimmed BACK to a codepoint boundary before counting chars — valid
  * UTF-8 of the two inputs is byte-identical over the matched range, so
  * lead/continuation structure agrees and the trim is the same cut for
  * both sides. Counting chars = counting non-continuation bytes.
  */
case class CommonPrefixLen(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_common_prefix_len"
  override def nullSafeEval(x: Any, y: Any): Any =
    CommonAffix.prefixLen(x.asInstanceOf[UTF8String], y.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CommonAffix.prefixLen($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** See [[CommonPrefixLen]]; compares from the string ENDS, so the left
  * extension of a match needs no `reverse` round-trips. */
case class CommonSuffixLen(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_common_suffix_len"
  override def nullSafeEval(x: Any, y: Any): Any =
    CommonAffix.suffixLen(x.asInstanceOf[UTF8String], y.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CommonAffix.suffixLen($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CommonAffix {

  @inline private def isCont(b: Byte): Boolean = (b & 0xC0) == 0x80

  /** Chars in the longest common prefix of `x` and `y`. Shared by
    * interpreted eval and generated code. */
  def prefixLen(x: UTF8String, y: UTF8String): Long = {
    val n = math.min(x.numBytes, y.numBytes)
    var p = 0
    while (p < n && x.getByte(p) == y.getByte(p)) p += 1
    // trim a partial codepoint: if the byte AT the mismatch is a
    // continuation, the char straddles the cut — back up to its lead.
    // Identical bytes over [0, p) make this the same cut for x and y.
    if (p < x.numBytes && p < y.numBytes) {
      while (p > 0 && isCont(x.getByte(p))) p -= 1
    }
    var chars = 0L
    var i = 0
    while (i < p) { if (!isCont(x.getByte(i))) chars += 1; i += 1 }
    chars
  }

  /** Chars in the longest common suffix of `x` and `y`. */
  def suffixLen(x: UTF8String, y: UTF8String): Long = {
    val nx = x.numBytes
    val ny = y.numBytes
    val n = math.min(nx, ny)
    var q = 0
    while (q < n && x.getByte(nx - 1 - q) == y.getByte(ny - 1 - q)) q += 1
    // trim forward to a codepoint boundary: the first byte of the
    // matched suffix must be a lead byte (or the match is the whole
    // shorter string, whose start is a boundary by definition)
    if (q < nx && q < ny) {
      while (q > 0 && isCont(x.getByte(nx - q))) q -= 1
    }
    var chars = 0L
    var i = nx - q
    while (i < nx) { if (!isCont(x.getByte(i))) chars += 1; i += 1 }
    chars
  }

  def commonPrefixLen(x: Column, y: Column): Column =
    GraftSqlBridge.column(
      CommonPrefixLen(GraftSqlBridge.expression(x), GraftSqlBridge.expression(y)))

  def commonSuffixLen(x: Column, y: Column): Column =
    GraftSqlBridge.column(
      CommonSuffixLen(GraftSqlBridge.expression(x), GraftSqlBridge.expression(y)))
}
