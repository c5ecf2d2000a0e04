package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization — the first transform of every
  * real corpus pipeline (CCNet, C4, and the Gopher preprocessing all
  * canonicalize before hashing/deduping, because "café" with a
  * precomposed U+00E9 and "café" with "e"+U+0301 are different byte
  * strings that must dedup, shingle, and tokenize identically).
  *
  * Why an Expression and not a UDF: the normalize call sits in the
  * per-document hot path upstream of everything keyed on text bytes;
  * as an Expression it stays inside whole-stage codegen with no
  * serialization boundary, and the ASCII fast path below makes the
  * overwhelmingly-common case (English web text) a single byte scan
  * with ZERO allocation — `Normalizer.isNormalized` is only consulted
  * for strings that actually contain multi-byte codepoints, and the
  * String round-trip only happens for strings that actually change.
  *
  * Parity: both this (java.text.Normalizer, ICU-derived tables in the
  * JDK) and DuckDB's `nfc_normalize` (utf8proc) implement UAX #15 NFC;
  * canonical composition is stable across Unicode versions for all
  * assigned codepoints (the composition-version policy), so the two
  * engines agree byte-for-byte.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"
  override def nullSafeEval(x: Any): Any =
    UnicodeNormalize.nfc(x.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormalize.nfc($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnicodeNormalize {

  /** NFC-normalize one string. Pure-ASCII input (no byte with the high
    * bit set) is NFC by construction and returned as-is without
    * decoding; already-normalized non-ASCII returns the input without
    * re-encoding. Shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s // pure ASCII: NFC-invariant
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfcNormalize(c: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(c)))
}
