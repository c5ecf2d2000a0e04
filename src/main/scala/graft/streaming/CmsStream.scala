package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The count-min sketch as CONTINUOUS ingestion: document shards drop
  * into a directory and the running depth×width counter grid stays
  * current without re-reading old shards — the streaming deployment of
  * the batch `cms_sketch_merged` mergeability proof (each micro-batch's
  * cell deltas add into the aggregation state, which is exactly the
  * cell-wise sketch sum).
  *
  * This is the sketch's headline streaming property: a streaming
  * aggregation over an UNBOUNDED key domain (open vocabulary — new
  * bigrams arrive forever) whose state is nonetheless FIXED-SIZE, <=
  * depth×width cells regardless of corpus or vocabulary growth, with no
  * watermark needed. Contrast [[NGramStream]], whose running count table
  * is safe only because the n-gram key domain is vocabulary-bounded;
  * the CMS form stays bounded even when the key domain is not.
  *
  * Item semantics are [[graft.ops.CountMin.bigramItems]] — the SAME
  * definition the batch registry entries sketch — so StreamingSpec can
  * pin the running grid cell-identical to the batch engine re-run on the
  * union of all shards after every drop. */
object CmsStream {

  /** Pruned read schema: only `text` leaves the parquet scan — the other
    * document columns never enter the stream. */
  val schema: StructType = StructType(Seq(StructField("text", StringType)))

  /** Streaming source over a directory of document parquet shards;
    * `maxFilesPerTrigger=1` makes one shard = one micro-batch in tests. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)

  /** The running sketch: [[graft.ops.CountMin.sketch]] applied verbatim
    * to the stream — explode(depth probes) is stateless and array-local;
    * the groupBy(rw, bkt) count is the only stateful operator, its state
    * the bounded cell grid itself. Serve with outputMode complete (the
    * grid IS the result) or update (changed cells only). */
  def runningSketch(stream: DataFrame, depth: Int = 4, width: Int = 256): DataFrame =
    graft.ops.CountMin.sketch(
      graft.ops.CountMin.bigramItems(stream, col("text")), col("item"), depth, width)
}
