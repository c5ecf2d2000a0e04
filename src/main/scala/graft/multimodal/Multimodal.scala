package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction running per-partition.
  *
  * The Spark-side shape is the real deliverable — schema (binary payload +
  * metadata struct), partition-parallel decode via `mapPartitions` over a
  * typed Dataset (one decoder instantiation per partition, the same batch
  * shape a JNI/FFI image decoder needs), and deterministic, testable
  * feature output. The actual media codec is STUBBED ([[FakeCodec]]) — the
  * container has no image/audio libraries — with a deterministic
  * byte-level "decoder" so tests and the oracle can verify the plumbing
  * end-to-end.
  *
  * At 100 TB: payloads stay columnar (never collected), decode is a narrow
  * map (zero shuffle), and feature extraction emits fixed-width columns
  * that downstream operators aggregate/join as usual.
  */
object Multimodal {

  case class Payload(doc_id: Long, payload: Array[Byte])
  case class Features(doc_id: Long, n_bytes: Long, checksum: Long, head_byte: Int)

  /** Attach a binary payload + metadata struct to each document. The
    * payload here is the UTF-8 encoding of `text` (a stand-in for image /
    * audio bytes); `meta` carries the typed metadata a real pipeline would
    * (mime, size). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** STUB codec — deterministic byte-level features standing in for a real
    * image/audio decode. Replace `decode` with the FFI call in production. */
  object FakeCodec {
    def decode(p: Payload): Features = {
      val bytes = p.payload
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      Features(p.doc_id, bytes.length.toLong, sum, if (bytes.nonEmpty) bytes(0) & 0xff else -1)
    }
  }

  /** Partition-parallel decode: one codec per partition, streaming rows —
    * the batch shape a real decoder (JNI, subprocess) needs. */
  def decodeFeatures(docs: DataFrame): Dataset[Features] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs).select("doc_id", "payload").as[Payload]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map(FakeCodec.decode)
      }
  }
}
