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

  /** STUB codec — deterministic features standing in for a real
    * image/audio decode; replace `decode` with the FFI call in
    * production. `n_bytes` is the raw payload size; `checksum`/
    * `head_byte` are computed over the decoded text's CODEPOINTS, not
    * UTF-8 bytes — the DuckDB oracle's `unicode(substr(...))` speaks
    * codepoints, and a byte-level sum would silently diverge on the
    * first non-ASCII document. */
  object FakeCodec {
    def decode(p: Payload): Features = {
      val s = new String(p.payload, java.nio.charset.StandardCharsets.UTF_8)
      var sum = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        sum += cp
        i += Character.charCount(cp)
      }
      Features(p.doc_id, p.payload.length.toLong, sum,
        if (s.nonEmpty) s.codePointAt(0) else -1)
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

  // -------------------------------------------------- frame sample / resize
  //
  // Video-style operators over the payload, byte-offset plumbing only (a
  // real deployment swaps the per-frame feature for the FFI decode): both
  // are pure Column algebra — array-local, zero shuffle, codegen-friendly
  // — because sampling and resizing are OFFSET arithmetic; only the codec
  // itself needs the mapPartitions batch shape above. The payload here is
  // the ASCII text (byte == char, same convention the decode oracle uses),
  // and the per-frame feature is the codegen'd rolling hash.

  /** Evenly-spaced frame sampling: `nFrames` windows of `frameLen` bytes
    * at offsets i * (len div nFrames). Emits one row per (doc, frame) with
    * the frame's offset, length and rolling-hash feature. */
  def sampleFrames(docs: DataFrame, nFrames: Int = 8, frameLen: Int = 16): DataFrame = {
    val stride = floor(col("n").cast("double") / nFrames).cast("long")
    val frames = docs
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("n"))
      .select(col("doc_id"), col("text"), col("n"),
        explode(transform(sequence(lit(0), lit(nFrames - 1)),
          i => (i * stride + 1).as("off"))).as("off"))
      .select(col("doc_id"), col("off"),
        col("text").substr(col("off").cast("int"), lit(frameLen)).as("frame"))
    frames.select(col("doc_id"), col("off"),
      length(col("frame")).cast("long").as("f_len"),
      graft.functions.RollingHash.rollingHash(col("frame")).as("f_hash"))
  }

  /** Nearest-neighbor byte "resize" to `target` samples: keep every
    * (len div target)-th byte. Emits the resized length + rolling-hash
    * feature (the real pixel resample replaces the char picks). */
  def resize(docs: DataFrame, target: Int = 32): DataFrame = {
    val n = length(col("text")).cast("long")
    val base = docs.select(col("doc_id"), col("text"), n.as("n"))
      .select(col("doc_id"), col("text"),
        greatest(floor(col("n").cast("double") / target).cast("long"), lit(1L)).as("stride"))
    val resized = base.select(col("doc_id"),
      concat_ws("", transform(sequence(lit(0), lit(target - 1)),
        j => col("text").substr((j * col("stride") + 1).cast("int"), lit(1)))).as("r"))
    resized.select(col("doc_id"),
      length(col("r")).cast("long").as("r_len"),
      graft.functions.RollingHash.rollingHash(col("r")).as("r_hash"))
  }
}
