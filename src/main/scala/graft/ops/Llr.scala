package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Log-Likelihood Ratio over a 2x2 contingency table (reference:
  * `LLR.java:16-47`). Pure `Column` algebra — no UDF — so the whole score
  * stays inside WholeStageCodegen; at 100 TB this runs once per surviving
  * bigram and must not leave the codegen'd projection.
  *
  * Operation order deliberately mirrors the reference (and the DuckDB
  * oracle SQL in [[graft.OracleSql.llrCtes]]) so IEEE-754 results agree to
  * the last ulp modulo the platform `ln`; callers round to 6 decimals for
  * oracle hash parity.
  */
object Llr {

  private def term(k: Column, e: Column): Column =
    when(k === 0 || e <= 0, lit(0.0))
      .otherwise(k.cast("double") * log(k.cast("double") / e))

  /** k11=c12, k12=c1-c12, k21=c2-c12, k22=N-c1-c2+c12; guards → NaN
    * (`LLR.java:23-33`); LLR = 2*Σ k_ij·ln(k_ij/e_ij) with term(k,e)=0 when
    * k==0 or e<=0 (`LLR.java:43-47`). */
  def llr(c1: Column, c2: Column, c12: Column, n: Column): Column = {
    val k11 = c12
    val k12 = c1 - c12
    val k21 = c2 - c12
    val k22 = n - c1 - c2 + c12

    val row1  = (k11 + k12).cast("double")
    val row2  = (k21 + k22).cast("double")
    val col1  = (k11 + k21).cast("double")
    val col2  = (k12 + k22).cast("double")
    val total = row1 + row2

    val e11 = row1 * col1 / total
    val e12 = row1 * col2 / total
    val e21 = row2 * col1 / total
    val e22 = row2 * col2 / total

    val guard = k11 < 0 || k12 < 0 || k21 < 0 || k22 < 0 ||
      n <= 0 || c1 <= 0 || c2 <= 0 || c12 <= 0 || total <= 0

    when(guard, lit(Double.NaN))
      .otherwise(lit(2.0) * (term(k11, e11) + term(k12, e12) + term(k21, e21) + term(k22, e22)))
  }
}
