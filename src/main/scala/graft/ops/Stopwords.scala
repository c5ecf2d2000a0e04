package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stopword filtering (reference: `Stopwords.java:20-48`, applied
  * `Job1.java:144-145,189`). The reference ships per-language stopword files
  * through the Hadoop distributed cache and probes a `HashSet` in each
  * mapper; the Spark-native form is a broadcast `left_anti` join — the list
  * is tiny, so the anti-join is a BroadcastHashJoin with zero shuffle of the
  * corpus side, which is the only strategy that survives at 100 TB.
  */
object Stopwords {

  /** One flat list (the synthetic corpus is English-like for every `lang`
    * tag); a per-language map would broadcast the same way. */
  val words: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "at", "for",
    "is", "are", "was", "be", "by", "with", "as", "it", "this", "that")

  /** SQL literal list for the DuckDB oracle (`w NOT IN (...)`). */
  val sqlList: String = words.map(w => s"'$w'").mkString(", ")

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    words.toDF("sw")
  }

  /** Drop rows whose `wordCol` is a stopword: broadcast anti-join. */
  def anti(in: DataFrame, wordCol: String): DataFrame = {
    val sw = broadcast(df(in.sparkSession))
    in.join(sw, in(wordCol) === sw("sw"), "left_anti")
  }
}
