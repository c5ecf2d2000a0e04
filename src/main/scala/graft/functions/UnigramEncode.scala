package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer APPLY (Kudo 2018, "Subword Regularization"): the
  * Viterbi-best segmentation of a word under a trained piece model,
  * returning the PIECE COUNT. The model ships as one reference object
  * inside the expression — the plan stays O(1) nodes regardless of
  * vocabulary size, and every row pays the compiled O(len · maxPieceLen)
  * DP instead of an interpreted Column chain (the BpeEncodeExpr /
  * SearchSortedCount pattern).
  *
  * Cross-engine exactness (must stay in lockstep with the recursive-CTE
  * DP in OracleSqlExt.tokenizeUnigramSql): piece log-probabilities are
  * quantized ONCE driver-side to integer micro-nats, and each piece's DP
  * value packs (score, −1 piece) into a single BIGINT as
  * `score * 1024 − 1`. Both engines then run the SAME integer-sum DP —
  * no float log/exp in either hot path, so no cross-engine ULP drift —
  * maximizing `1024 · totalScore − nPieces`, i.e. max total score with a
  * fewest-pieces tie-break (valid while nPieces < 1024; words of ≥ 1024
  * codepoints — possible on the unbounded apply path even though the
  * trainer's word source is capped — short-circuit to the per-codepoint
  * ceiling in BOTH engines instead of wrapping). The
  * best piece count is recovered from the packed value alone
  * (`floorMod(−best, 1024)`), so DP argmax ties — which can differ in
  * PATH but never in packed value — cannot perturb the output.
  *
  * A single codepoint absent from the vocabulary falls back to a pinned
  * UNK value ([[UnigramEncode.unkVal]]) so every word segments: the
  * trainer sees a bounded word SAMPLE while apply runs over every
  * distinct word of the corpus (the Sennrich vocabulary trick), so
  * unseen codepoints are expected at scale, not an error.
  *
  * `pieces`/`vals` are parallel IndexedSeqs (value-based equals, so two
  * identical expressions canonicalize equal — the SearchSorted
  * precedent); the hash map the hot loop needs is derived once per task.
  */
case class UnigramCountExpr(child: Expression, pieces: IndexedSeq[String],
                            vals: IndexedSeq[Long], maxPieceLen: Int)
    extends UnaryExpression {
  require(pieces.length == vals.length, "pieces/vals must be parallel")
  require(maxPieceLen >= 1)

  @transient private lazy val valOf: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    var i = 0
    while (i < pieces.size) {
      if (!m.containsKey(pieces(i))) m.put(pieces(i), vals(i))
      i += 1
    }
    m
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_unigram_count"

  override def nullSafeEval(input: Any): Any =
    UnigramEncode.countPieces(input.asInstanceOf[UTF8String].toString, valOf, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVals", valOf, "java.util.HashMap<String, Long>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramEncode.countPieces($c.toString(), $ref, $maxPieceLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramEncode {

  /** Packed DP value of an unknown single codepoint: −30 nats in
    * micro-nats, packed like every trained piece (`score · 1024 − 1`).
    * Far below any trained piece score (ln of the smallest observable
    * probability at maxVocab=5000 driver-sample scale is ≳ −20 nats), so
    * UNK never outcompetes a real piece — mirrored verbatim by the
    * oracle's CASE fallback. */
  val unkVal: Long = -30000000L * 1024L - 1L

  /** Piece count of the Viterbi-best segmentation. Positions advance by
    * CODEPOINT (matching the oracle's per-character DuckDB slicing and
    * BpeEncode's split). Shared by interpreted eval and generated code. */
  def countPieces(w: String, valOf: java.util.HashMap[String, java.lang.Long],
                  maxPieceLen: Int): Long = {
    if (w.isEmpty) return 0L
    // codepoint boundaries: idx(p) = UTF-16 offset of codepoint p
    val chars = w.length
    var n = 0
    var ci = 0
    while (ci < chars) { ci += Character.charCount(w.codePointAt(ci)); n += 1 }
    // The packed (score·1024 − pieces) encoding can only represent piece
    // counts < 1024, and while the TRAINER's word source is bounded, the
    // apply path runs over every distinct corpus word — a whitespace-free
    // ≥1024-codepoint token (long URL, base64 run) is expected at scale,
    // and floorMod would silently wrap its count. Return the
    // per-codepoint ceiling n instead (the worst legal segmentation —
    // for such junk tokens Viterbi is within noise of it anyway);
    // mirrored by the oracle DP's length(w) >= 1024 CASE.
    if (n >= 1024) return n.toLong
    val idx = new Array[Int](n + 1)
    ci = 0
    var p = 0
    while (p < n) { idx(p) = ci; ci += Character.charCount(w.codePointAt(ci)); p += 1 }
    idx(n) = chars
    val best = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var b = java.lang.Long.MIN_VALUE
      val lmax = if (maxPieceLen < i) maxPieceLen else i
      var l = 1
      while (l <= lmax) {
        val v = valOf.get(w.substring(idx(i - l), idx(i)))
        val pv: Long =
          if (v != null) v.longValue
          else if (l == 1) unkVal
          else java.lang.Long.MIN_VALUE
        if (pv != java.lang.Long.MIN_VALUE) {
          val cand = best(i - l) + pv
          if (cand > b) b = cand
        }
        l += 1
      }
      best(i) = b
      i += 1
    }
    java.lang.Math.floorMod(-best(n), 1024L)
  }

  /** Piece count column for `word` under a trained (piece, packedVal)
    * model. */
  def countCol(word: Column, model: Seq[(String, Long)], maxPieceLen: Int): Column =
    GraftSqlBridge.column(UnigramCountExpr(
      GraftSqlBridge.expression(word),
      model.map(_._1).toIndexedSeq, model.map(_._2).toIndexedSeq, maxPieceLen))
}
