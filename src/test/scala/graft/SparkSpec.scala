package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session (one per suite via lazy val; JVM-wide reuse through
  * getOrCreate keeps the whole test run on a single SparkContext). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Physical plan with AQE wrappers unwrapped, so node-level assertions
    * (`plan.collect { case j: ...Exec => }`) see the real operators. */
  def physicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.execution.SparkPlan = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def strip(p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan =
      p match {
        case a: AdaptiveSparkPlanExec => strip(a.executedPlan)
        case other                    => other
      }
    strip(df.queryExecution.executedPlan)
  }
}
