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
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))

  /** Install the functions into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    specs.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
