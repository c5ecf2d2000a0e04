package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Pipeline telemetry — the Spark-native form of the reference's Hadoop
  * `Counter`s (`Job3.java:46,50,89`; SURVEY §2.10). `df.observe` computes
  * the metric expressions inline during the action with zero extra passes
  * over the data; `Observation.get` blocks until the action completes.
  */
object Metrics {

  /** Attach named metrics to a DataFrame; read them from the returned
    * Observation after any action on the result. */
  def observed(df: DataFrame, name: String, metrics: Column*): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
