package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw Google-Books-style n-gram ingestion, format-compatible with the
  * reference (SURVEY §2.1 S1-S3):
  *
  *   - TSV rows `ngram \t year \t occurrences [\t ...]` with extra trailing
  *     fields ignored (`Job1.java:126-138,166-181`);
  *   - language inferred from the input file path — `heb` substring => HE
  *     else EN (`NGramUtils.java:51-79`) — expressed with
  *     `input_file_name()` so it composes with any directory layout;
  *   - malformed rows (unparseable year/occurrence, occ <= 0, missing
  *     fields) dropped, mirroring the reference's try/catch-skip
  *     (`Job1.java:130-138`).
  *
  * Reading as text + `split` (rather than a csv schema) keeps the "ignore
  * trailing fields" semantics and never fails on ragged rows — at 100 TB a
  * malformed shard must degrade to dropped rows, not a job abort. Filters
  * on the parsed columns still push down to the scan for the year/occ
  * predicates after the projection.
  */
object NGramSource {

  val HE = "he"
  val EN = "en"

  /** Parse one or more TSV paths into (lang, ngram, year, occurrences). */
  def read(spark: SparkSession, paths: String*): DataFrame =
    parse(spark.read.text(paths: _*)
      .withColumn("lang",
        when(lower(input_file_name()).contains("heb"), lit(HE)).otherwise(lit(EN))))

  /** The corpus the reference actually points at ships as Hadoop
    * SequenceFiles of (LongWritable offset, Text tsv-line) — the format
    * `CollocationExtraction3Jobs.java:67-71` wires via
    * `SequenceFileInputFormat` with `Mapper<LongWritable, Text, ...>`
    * (`Job1.java:113,124`). Same parse chain as [[read]]; each path gets
    * its language from its own name, mirroring the reference's per-path
    * `MultipleInputs` registration. */
  def readSequence(spark: SparkSession, paths: String*): DataFrame = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import spark.implicits._
    val tagged = paths.map { p =>
      val lang = if (p.toLowerCase.contains("heb")) HE else EN
      spark.sparkContext.sequenceFile(p, classOf[LongWritable], classOf[Text])
        // Hadoop reuses the Writable instances across records — the value
        // must be copied out (toString) before the iterator advances
        .map(_._2.toString)
        .toDF("value").withColumn("lang", lit(lang))
    }
    parse(tagged.reduce(_ unionByName _))
  }

  /** Shared TSV-line parse: (lang, value) → (lang, ngram, year,
    * occurrences), malformed rows dropped. */
  private[graft] def parse(raw: DataFrame): DataFrame = {
    val f = split(col("value"), "\t")
    // try_element_at / try_cast, not element_at / cast: Spark 4 ANSI mode
    // makes the plain forms *throw* on ragged rows or malformed numbers;
    // the reference's semantics are drop-the-row.
    raw.select(
        col("lang"),
        try_element_at(f, lit(1)).as("ngram"),
        try_element_at(f, lit(2)).try_cast("int").as("year"),
        try_element_at(f, lit(3)).try_cast("long").as("occurrences"))
      .filter(col("ngram").isNotNull && col("year").isNotNull &&
        col("occurrences").isNotNull && col("occurrences") > 0)
  }

  /** 1-gram view: (lang, w, year, occurrences), token cleaned, empties
    * dropped (`Job1.java:139-145`). */
  def unigrams(df: DataFrame): DataFrame =
    df.withColumn("w", graft.ops.Normalize.cleanToken(col("ngram")))
      .filter(length(col("w")) > 0)
      .select("lang", "w", "year", "occurrences")

  /** 2-gram view: (lang, w1, w2, year, occurrences). The ngram splits on
    * `\s+`, needs >= 2 tokens, takes the first two (`Job1.java:170-186`);
    * each is cleaned and the row dropped if either cleans to empty. */
  def bigrams(df: DataFrame): DataFrame = {
    val parts = split(col("ngram"), "\\s+")
    df.filter(size(parts) >= 2)
      .withColumn("w1", graft.ops.Normalize.cleanToken(element_at(parts, 1)))
      .withColumn("w2", graft.ops.Normalize.cleanToken(element_at(parts, 2)))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
      .select("lang", "w1", "w2", "year", "occurrences")
  }
}
