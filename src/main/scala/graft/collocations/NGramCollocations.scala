package graft.collocations

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Llr, Normalize, Stopwords, TopK}
import graft.sources.NGramSource

/** Reference-exact collocation pipeline over pre-counted n-gram corpora —
  * the (lang, decade)-grouped, occurrence-weighted form of the reference's
  * 3-job chain (vs. [[Collocations]], which generalizes the same semantics
  * to raw text grouped by lang). Implements the *intended* semantics for
  * the reference's two quirks (SURVEY §2.4): bigram counts are truly summed
  * across years/splits (A3) and N is a global per-(lang,decade) sum (A4).
  */
object NGramCollocations {

  val K = 100

  /** c1 per (lang, decade, w): weighted sum of occurrences — A2. */
  def unigramCounts(uni: DataFrame): DataFrame =
    Stopwords.anti(uni, "w")
      .groupBy(col("lang"), Normalize.toDecade(col("year")).as("decade"), col("w"))
      .agg(sum("occurrences").as("c1"))

  /** c12 per (lang, decade, w1, w2) — A3 with real summation. */
  def bigramCounts(bg: DataFrame): DataFrame =
    Stopwords.anti(Stopwords.anti(bg, "w1"), "w2")
      .groupBy(col("lang"), Normalize.toDecade(col("year")).as("decade"), col("w1"), col("w2"))
      .agg(sum("occurrences").as("c12"))

  /** N per (lang, decade) — A4, global sum over unigram counts. */
  def grandTotalN(uniCounts: DataFrame): DataFrame =
    uniCounts.groupBy("lang", "decade").agg(sum("c1").as("n"))

  /** J1 + J2 + J3 + F3 + P8 + A5/A6: the full scoring chain. The unigram
    * count table (vocabulary-sized) is cached so c1, c2 and N share one
    * corpus pass — see [[Collocations.topCollocations]] for why exchange
    * reuse alone doesn't deduplicate it. */
  def topCollocations(uni: DataFrame, bg: DataFrame, k: Int = K, cache: Boolean = true): DataFrame = {
    val u0 = unigramCounts(uni)
    val u = if (cache) u0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else u0
    val b = bigramCounts(bg)
    val n = grandTotalN(u)
    val scored = b
      .join(u.select(col("lang"), col("decade"), col("w").as("w1"), col("c1")),
        Seq("lang", "decade", "w1"))
      .join(u.select(col("lang"), col("decade"), col("w").as("w2"), col("c1").as("c2")),
        Seq("lang", "decade", "w2"))
      .join(broadcast(n), Seq("lang", "decade"))
      .withColumn("llr_raw", Llr.llr(col("c1"), col("c2"), col("c12"), col("n")))
      .filter(!isnan(col("llr_raw")))
      .withColumn("llr", round(col("llr_raw"), 6))
    TopK.topKPerGroup(
      scored.select(col("lang"), col("decade"), col("w1"), col("w2"), col("llr")),
      Seq(col("lang"), col("decade")),
      Seq(col("llr").desc, col("w1").asc, col("w2").asc),
      k)
  }

  /** Convenience: end-to-end from raw TSV paths (unigram + bigram roots). */
  def fromPaths(spark: SparkSession, unigramPaths: Seq[String], bigramPaths: Seq[String], k: Int = K): DataFrame = {
    val uni = NGramSource.unigrams(NGramSource.read(spark, unigramPaths: _*))
    val bg  = NGramSource.bigrams(NGramSource.read(spark, bigramPaths: _*))
    topCollocations(uni, bg, k)
  }

  /** [[fromPaths]] over the reference's on-disk SequenceFile corpus format
    * (`CollocationExtraction3Jobs.java:67-71`). */
  def fromSequencePaths(spark: SparkSession, unigramPaths: Seq[String], bigramPaths: Seq[String],
                        k: Int = K): DataFrame = {
    val uni = NGramSource.unigrams(NGramSource.readSequence(spark, unigramPaths: _*))
    val bg  = NGramSource.bigrams(NGramSource.readSequence(spark, bigramPaths: _*))
    topCollocations(uni, bg, k)
  }
}
