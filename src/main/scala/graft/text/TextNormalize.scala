package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.UnicodeNormalize

/** Unicode/whitespace canonicalization — the transform every corpus
  * pipeline runs FIRST, because everything downstream (exact-hash and
  * MinHash dedup, shingling, winnowing, tokenization, LM scoring) keys
  * on text bytes: "café" precomposed and "café" decomposed
  * must be the same document, CRLF and LF the same line, and a
  * zero-width space must not split a token.
  *
  * The pipeline is a FIXED operation order (changing it changes
  * results — e.g. NFC must run before any char-class regex so combining
  * marks are already composed); both the engine and the DuckDB oracle
  * ([[graft.OracleSqlExt]] `textNormalizeCtes`) implement exactly this
  * order:
  *
  *  1. Unicode NFC ([[graft.functions.NfcNormalize]], codegen'd,
  *     ASCII fast path)
  *  2. newline canonicalization: CRLF and lone CR → LF
  *  3. zero-width removal: U+200B/200C/200D ZW(N)J and U+FEFF BOM
  *  4. NBSP (U+00A0) → plain space
  *  5. strip remaining C0/DEL control chars, KEEPING \n and \t
  *
  * Everything is row-local string algebra inside whole-stage codegen —
  * zero shuffles, trivially scale-free. Mirrors the normalization
  * steps of CCNet/C4-style preprocessing (reference pipeline has no
  * analogue; extension surface).
  */
object TextNormalize {

  /** The fixed-order normalization chain over a string column. */
  def normalizeText(c: Column): Column = {
    val nfcd = UnicodeNormalize.nfcNormalize(c)
    val nl = regexp_replace(nfcd, "\r\n?", "\n")
    val zw = regexp_replace(nl, "[\u200B\u200C\u200D\uFEFF]", "")
    val sp = translate(zw, "\u00A0", " ")
    regexp_replace(sp, "[\u0000-\u0008\u000B\u000C\u000E-\u001F\u007F]", "")
  }
}
