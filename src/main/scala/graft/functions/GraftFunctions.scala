package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration of the engine's custom Catalyst Expressions,
  * so `spark.sql("... graft_rolling_hash(text) ...")` resolves to the same
  * codegen'd operators the DataFrame API uses.
  *
  * Two entry points, one per deployment style:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.functions
  *    .GraftExtensions` (cluster config — sessions come up with the
  *    functions installed);
  *  - [[register]] for an already-running session (idempotent; what
  *    `SparkEntry` uses, since the driver owns session construction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.specs.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  /** (name, info, builder) for every custom expression. */
  val specs: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_rolling_hash",
      new ExpressionInfo(classOf[RollingHashExpr].getName, "graft_rolling_hash"),
      (es: Seq[Expression]) => RollingHashExpr(es.head)),
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))),
    // graft_bucket_of(value, sorted_bounds, asc): the bounds MODEL must be
    // a literal (it ships as one plan reference object, same as the
    // DataFrame path) — fold it here at resolution time
    ("graft_bucket_of",
      new ExpressionInfo(classOf[SearchSortedCount].getName, "graft_bucket_of"),
      (es: Seq[Expression]) => {
        require(es.length == 3 && es(1).foldable && es(2).foldable,
          "graft_bucket_of(value, sorted_bounds_array, asc) requires literal bounds and direction")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.catalyst.util.ArrayData
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        val bounds = Cast(es(1), ArrayType(DoubleType)).eval()
          .asInstanceOf[ArrayData].toDoubleArray()
        SearchSortedCount(es.head, bounds.toIndexedSeq, es(2).eval().asInstanceOf[Boolean])
      }),
    ("graft_nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc_normalize"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))

  /** Install the functions into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    specs.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
