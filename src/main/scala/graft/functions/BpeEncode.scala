package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy byte-pair-encoding APPLY (Sennrich et al. 2016): encode a word
  * against a trained merge table, returning the subword symbol array.
  * The merge table ships as one reference object inside the expression —
  * the plan stays O(1) nodes regardless of merge count, and every row
  * pays the compiled greedy loop instead of an interpreted per-merge
  * Column chain.
  *
  * Semantics (must stay in lockstep with the recursive-CTE oracle in
  * OracleSqlExt.tokenizeBpeSql): start from single codepoints; repeatedly
  * merge the LEFTMOST occurrence of the LOWEST-RANK applicable pair;
  * stop when no adjacent pair is in the table. One-occurrence-at-a-time
  * is equivalent to the classic all-occurrences-in-rank-order apply:
  * merging can only create pairs involving the NEW symbol, which — being
  * created later in training — always rank after the pair that made
  * them, so the pending-min rank never has to re-run earlier merges.
  *
  * `merges` is an IndexedSeq of "left right" strings in rank order
  * (value-based equals, so identical expressions canonicalize equal —
  * the SearchSorted precedent); the rank map the hot loop needs is
  * derived once per task. */
case class BpeEncodeExpr(child: Expression, merges: IndexedSeq[String])
    extends UnaryExpression {

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var i = 0
    while (i < merges.size) { if (!m.containsKey(merges(i))) m.put(merges(i), i); i += 1 }
    m
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String].toString, rank)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRank", rank, "java.util.HashMap<String, Integer>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeEncode.encode($c.toString(), $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {

  /** Shared by interpreted eval and generated code. */
  def encode(w: String, rank: java.util.HashMap[String, Integer]): ArrayData = {
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    var ci = 0
    while (ci < w.length) {
      val cp = w.codePointAt(ci)
      val n = Character.charCount(cp)
      syms += w.substring(ci, ci + n)
      ci += n
    }
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var pos = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r.intValue() < best) { best = r.intValue(); pos = i }
        i += 1
      }
      if (pos < 0) done = true
      else {
        syms(pos) = syms(pos) + syms(pos + 1)
        syms.remove(pos + 1)
        if (syms.length < 2) done = true
      }
    }
    new GenericArrayData(syms.map(s => UTF8String.fromString(s): Any).toArray)
  }

  def encodeCol(word: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeEncodeExpr(
      GraftSqlBridge.expression(word),
      merges.map { case (a, b) => s"$a $b" }.toIndexedSeq))
}
