package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev utility: dump plans and count physical node types after execution
  * (where AQE's exchange reuse is visible). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("collocations_e2e")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      df.count()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        counts(p.getClass.getSimpleName) += 1
        p.children.foreach(walk)
        p.subqueries.foreach(walk)
      }
      walk(plan)
      println(s"NODES $n " + counts.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
