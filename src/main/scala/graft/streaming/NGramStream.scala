package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.NGramSource

/** The reference's batch pipeline as an INCREMENTAL ingestion job: the
  * n-gram corpus arrives as TSV shard drops into a directory (exactly how
  * the real Google Books corpus updates land), and the running
  * (lang, decade, word) occurrence counts stay current without ever
  * re-reading old shards — Structured Streaming's file source tracks
  * processed files, and the aggregation state IS the count table.
  *
  * Same parse/clean chain as the batch path ([[NGramSource.parse]],
  * cleanToken, toDecade), so every micro-batch applies byte-identical
  * row semantics: the StreamingSpec twin test pins that counts after
  * each incremental drop equal the BATCH engine re-run on the union of
  * all shards so far — the contract that makes incremental ingestion
  * trustworthy.
  *
  * Scale notes: this is a streaming aggregation WITHOUT watermark —
  * correct here because the key domain is (lang, decade, vocabulary),
  * the same bounded domain the batch shuffle groups by, so state size is
  * vocabulary-bounded, not time-unbounded; output mode `complete`/
  * `update` serves the running table. Partial aggregation runs before
  * the state-store shuffle exactly as in the batch plan. Language rides
  * on each file's NAME (the reference's per-path convention), read from
  * `input_file_name()` per micro-batch. */
object NGramStream {

  /** Streaming source over a directory of reference-format TSV shards;
    * `maxFilesPerTrigger=1` makes one shard = one micro-batch in tests. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    NGramSource.parse(
      spark.readStream.option("maxFilesPerTrigger", "1").text(dir)
        // language rides on the file's BASENAME (the reference's shard
        // naming) — matching on the whole path would classify every shard
        // as Hebrew whenever the watch DIRECTORY's path contains 'heb'
        .withColumn("lang",
          when(lower(element_at(split(input_file_name(), "/"), -1)).contains("heb"),
            lit(NGramSource.HE)).otherwise(lit(NGramSource.EN))))

  /** Running occurrence-weighted unigram counts per (lang, decade, w) —
    * the incremental form of the batch A2 aggregation. */
  def unigramCounts(stream: DataFrame): DataFrame =
    NGramSource.unigrams(stream)
      .withColumn("decade", graft.ops.Normalize.toDecade(col("year")))
      .groupBy("lang", "decade", "w")
      .agg(sum(col("occurrences")).as("c1"))
}
