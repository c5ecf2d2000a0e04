package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-class score vector for the trained language-ID model
  * ([[graft.text.LangIdClassifier]]): one pass over the document's code
  * points, each consecutive pair probed ONCE into an open-addressed
  * long-keyed table (collision-free key = cp1 * 0x110000 + cp2) whose
  * hits add the bigram's per-class integer micro-nat weight vector onto
  * a prior-seeded accumulator.
  *
  * Why an Expression and not the higher-order-function fold: `aggregate`
  * + `zip_with` evaluate their lambdas INTERPRETED per array element,
  * and `element_at` on a literal map is a linear scan — measured on the
  * registry corpus the HOF form costs 3.1 s (and the per-class-fold
  * form 13.4 s) where this expression scores the same corpus in tenths.
  * The scores are the SAME integers in the same class order (priors
  * seeded, out-of-vocabulary pairs add nothing), so the DuckDB oracle
  * and every tie-break are unchanged. Bigrams here = consecutive code
  * point pairs, exactly [[graft.text.LangIdClassifier.bigramsCol]]'s
  * `substr(i, 2)` slices (substr counts code points).
  */
case class LangIdScoresExpr(child: Expression, model: LangIdScore.Packed)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_langid_scores"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(model.score(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("langidModel", model, classOf[LangIdScore.Packed].getName)
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData($m.score($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdScore {

  /** The model packed for the per-row hot path: parallel open-addressed
    * arrays (power-of-two capacity, ≤ 0.25 load factor, linear probing)
    * keyed by the collision-free packed code point pair. Ships to
    * executors once per plan via `addReferenceObj`. */
  final class Packed(val priors: Array[Long], bigrams: Array[String],
                     vecs: Array[Array[Long]]) extends Serializable {
    require(bigrams.length == vecs.length,
      s"${bigrams.length} bigrams vs ${vecs.length} weight vectors")

    // the capacity loop needs a positive power-of-two >= 4*length, and
    // the largest positive power-of-two Int is 2^30 — so length must stay
    // <= 2^28 (`bigrams.length * 4` overflows past that and the loop
    // would spin on a negative/zero bound). Unreachable at the default
    // vocabSize but guarded loudly rather than assumed.
    require(bigrams.length <= (1 << 28),
      s"${bigrams.length} vocab bigrams exceed the 2^28 packed-table bound")
    private val cap: Int = {
      var c = 4
      while (c < bigrams.length * 4) c <<= 1
      c
    }
    private val keys: Array[Long] = Array.fill(cap)(-1L)
    private val slot: Array[Array[Long]] = new Array[Array[Long]](cap)
    locally {
      var i = 0
      while (i < bigrams.length) {
        val b = bigrams(i)
        val cp1 = b.codePointAt(0)
        val n1 = Character.charCount(cp1)
        require(b.length > n1 && b.length == n1 + Character.charCount(b.codePointAt(n1)),
          s"vocab bigram must be exactly two code points: '$b'")
        val k = cp1.toLong * 1114112L + b.codePointAt(n1)
        var h = home(k)
        while (keys(h) >= 0 && keys(h) != k) h = (h + 1) & (cap - 1)
        require(keys(h) != k, s"duplicate vocab bigram: '$b'")
        keys(h) = k
        slot(h) = vecs(i)
        i += 1
      }
    }

    private def home(k: Long): Int =
      (scala.util.hashing.byteswap64(k) & (cap - 1)).toInt

    /** Prior-seeded per-class totals after one code point pass. */
    def score(s: String): Array[Long] = {
      val acc = priors.clone()
      var i = 0
      var prev = -1
      while (i < s.length) {
        val cp = s.codePointAt(i)
        if (prev >= 0) {
          val k = prev.toLong * 1114112L + cp
          var h = home(k)
          var probing = true
          while (probing) {
            val kh = keys(h)
            if (kh == k) {
              val v = slot(h)
              var j = 0
              while (j < v.length) { acc(j) += v(j); j += 1 }
              probing = false
            } else if (kh < 0) probing = false
            else h = (h + 1) & (cap - 1)
          }
        }
        prev = cp
        i += Character.charCount(cp)
      }
      acc
    }
  }

  def langidScores(text: Column, model: Packed): Column =
    GraftSqlBridge.column(LangIdScoresExpr(GraftSqlBridge.expression(text), model))
}
