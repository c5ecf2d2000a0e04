package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) ingestion for the documents table —
  * the interchange format crawl/curation pipelines actually hand a
  * training-data engine, next to the parquet the testdata ships.
  *
  * Scale rules baked in:
  *   - the schema is EXPLICIT, never inferred — `inferSchema` runs a full
  *     extra pass over the corpus before the first real job;
  *   - malformed lines DROP instead of aborting (`mode=DROPMALFORMED`),
  *     the same degrade-don't-abort policy as [[NGramSource]]: at 100 TB a
  *     corrupt shard must cost rows, not the job;
  *   - JSON is a row format — every query parses whole lines, so the
  *     column pruning parquet gives is lost. Land JSONL once, convert to
  *     parquet ([[Sinks.writeParquet]]), and query the parquet.
  */
object DocumentSource {

  /** documents-table schema (TESTDATA.md): matches the parquet layout so
    * either source feeds the same operators. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readJsonl(spark: SparkSession, paths: String*): DataFrame =
    spark.read.schema(schema).option("mode", "DROPMALFORMED").json(paths: _*)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
