package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-language stopword filtering (reference: `Stopwords.java:20-48`,
  * applied `Job1.java:144-145,189`). The reference keeps separate
  * English/Hebrew sets, ships them through the Hadoop distributed cache,
  * and routes each record to the set matching its language
  * (`Stopwords.java:26-30`); language itself follows the `NGramUtils`
  * rule — Hebrew corpora are tagged `he`, everything else `en`.
  *
  * The Spark-native form is a broadcast `left_anti` join keyed on
  * (routed-language, word): the combined list is tiny, so the anti-join is
  * a BroadcastHashJoin with zero shuffle of the corpus side — the only
  * strategy that survives at 100 TB.
  */
object Stopwords {

  /** English set (routing default for every non-`he` language — the
    * synthetic corpus is English-like for every lang tag). */
  val en: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "at", "for",
    "is", "are", "was", "be", "by", "with", "as", "it", "this", "that")

  /** Hebrew set, routed to rows whose lang is `he` (reference semantics:
    * `Stopwords.java:20-21`; list content is the standard high-frequency
    * Hebrew function words). */
  val he: Seq[String] = Seq(
    "של", "את", "על", "הוא", "היא", "זה", "אני", "לא", "כי", "עם",
    "הם", "אבל", "או", "גם", "מה", "כל", "אם", "יש", "אין", "כמו")

  /** Back-compat flat list (quality scoring uses the EN set as its
    * language-agnostic stop-ratio proxy). */
  val words: Seq[String] = en

  /** SQL literal list for the DuckDB oracle (`w NOT IN (...)`). */
  val sqlList: String = en.map(w => s"'$w'").mkString(", ")
  val heSqlList: String = he.map(w => s"'$w'").mkString(", ")

  /** The reference's routing rule: `he` gets the Hebrew set, every other
    * language the English one (`NGramUtils.java:51-79`). */
  def route(lang: Column): Column = when(lang === "he", lit("he")).otherwise(lit("en"))

  /** (slang, sw) rows for both sets — the broadcast side. */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (en.map(("en", _)) ++ he.map(("he", _))).toDF("slang", "sw")
  }

  /** Drop rows whose `wordCol` is a stopword of the row's (routed)
    * language: broadcast anti-join on (routed lang, word). `in` must carry
    * a `lang` column. */
  def anti(in: DataFrame, wordCol: String): DataFrame =
    antiWith(in, wordCol, Map("en" -> en, "he" -> he))

  /** [[anti]] with caller-supplied per-language sets — the runtime-file
    * deployment path: `antiWith(df, "w", Map("en" -> fromFile(...), "he"
    * -> fromFile(...)))`. Languages absent from the map keep all words. */
  def antiWith(in: DataFrame, wordCol: String, sets: Map[String, Seq[String]]): DataFrame = {
    import in.sparkSession.implicits._
    val sw = broadcast(
      sets.toSeq.flatMap { case (l, ws) => ws.map((l, _)) }.toDF("slang", "sw"))
    in.join(sw, in(wordCol) === sw("sw") && route(in("lang")) === sw("slang"), "left_anti")
  }

  /** Load one stopword set from a file with the reference's semantics
    * (`Stopwords.java:23-43`): strip a UTF-8 BOM, drop `#` comment lines
    * and blanks, trim + lowercase each word. Driver-side read of a tiny
    * file, then broadcast — the distributed-cache pattern. */
  def fromFile(path: String): Seq[String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines()
      .map(_.stripPrefix("\uFEFF").trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.toLowerCase)
      .toList
    finally src.close()
  }
}
