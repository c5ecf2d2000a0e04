package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction running per-partition.
  *
  * The Spark-side shape is the deliverable — schema (binary payload +
  * metadata struct), partition-parallel decode via `mapPartitions` over a
  * typed Dataset (one decoder instantiation per partition, the same batch
  * shape a JNI/FFI image decoder needs), and deterministic, testable
  * feature output. The codec is a REAL container parse: payloads are
  * binary PPM (P6) images — a genuine image format whose header is
  * `P6\n<width> <height>\n<maxval>\n` followed by width*height*3 raw RGB
  * bytes — and [[parsePpm]] decodes header fields and pixel statistics
  * from the actual bytes. A production deployment swaps the per-pixel
  * statistic for the FFI resample/feature call through the identical
  * plumbing.
  *
  * At 100 TB: payloads stay columnar (never collected), decode is a narrow
  * map (zero shuffle), and feature extraction emits fixed-width columns
  * that downstream operators aggregate/join as usual.
  */
object Multimodal {

  case class Payload(doc_id: Long, payload: Array[Byte])
  case class PpmFeatures(doc_id: Long, valid: Boolean, width: Int, height: Int,
                         maxval: Int, n_pix: Long, pix_sum: Long)

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

  /** Build a REAL binary PPM (P6) payload per document: dimensions derive
    * from doc_id (width 2-6, height 2-4), pixel bytes are the document's
    * ASCII-sanitized text right-padded/truncated to exactly
    * width*height*3 bytes. The sanitization (non-printable/non-ASCII →
    * '?') keeps byte == codepoint so the DuckDB oracle can re-derive the
    * pixel plane with string functions. Everything is Column algebra —
    * array-local, zero shuffle. */
  def withPpmPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("_w", (pmod(col("doc_id"), lit(5L)) + 2).cast("int"))
      .withColumn("_h", (pmod(col("doc_id"), lit(3L)) + 2).cast("int"))
      .withColumn("_ascii", regexp_replace(col("text"), "[^\\x20-\\x7e]", "?"))
      .withColumn("_px", expr("rpad(_ascii, _w * _h * 3, 'x')"))
      .select(col("doc_id"),
        encode(concat(lit("P6\n"), col("_w").cast("string"), lit(" "),
          col("_h").cast("string"), lit("\n255\n"), col("_px")), "UTF-8").as("payload"))

  /** Parsed P6 header: dimensions, maxval, and the byte offset where the
    * pixel plane starts (validated to be exactly 3·w·h bytes long). */
  private[graft] case class PpmHeader(w: Int, h: Int, maxval: Int, pixOff: Int)

  /** REAL P6 header parse over raw bytes — magic check, whitespace-
    * delimited ascii header ints, single separator byte, exact pixel-plane
    * length. Throws IllegalArgumentException on malformed input; callers
    * route that to a `valid = false` row rather than poisoning the batch —
    * the per-record error routing a production decoder needs. */
  private def parsePpmHeader(bytes: Array[Byte]): PpmHeader = {
    var i = 0
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\t' || b == '\r'
    def fail(msg: String) = throw new IllegalArgumentException(msg)
    def skipWs(): Unit = while (i < bytes.length && isWs(bytes(i))) i += 1
    def parseInt(): Int = {
      var v = 0; var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      if (!any) fail(s"expected integer at byte $i")
      v
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') fail("not a P6 ppm")
    i = 2
    skipWs(); val w = parseInt()
    skipWs(); val h = parseInt()
    // zero-dimension images satisfy every later length identity (0 == 0)
    // but put the pixel-reading callers (phash/resample/frames) one index
    // past the plane — reject here so a degenerate header routes to
    // valid = false, never an ArrayIndexOutOfBoundsException that escapes
    // the IllegalArgumentException-only catches and kills the task
    if (w <= 0 || h <= 0) fail(s"degenerate dimensions ${w}x$h")
    skipWs(); val maxval = parseInt()
    if (i >= bytes.length || !isWs(bytes(i))) fail("missing header separator")
    i += 1
    if (bytes.length - i != 3 * w * h)
      fail(s"pixel plane has ${bytes.length - i} bytes, expected ${3 * w * h}")
    PpmHeader(w, h, maxval, i)
  }

  private[graft] def parsePpm(id: Long, bytes: Array[Byte]): PpmFeatures =
    try {
      val hd = parsePpmHeader(bytes)
      var sum = 0L; var j = hd.pixOff
      while (j < bytes.length) { sum += bytes(j) & 0xff; j += 1 }
      PpmFeatures(id, valid = true, hd.w, hd.h, hd.maxval, hd.w.toLong * hd.h, sum)
    } catch {
      case _: IllegalArgumentException => PpmFeatures(id, valid = false, -1, -1, -1, 0L, 0L)
    }

  /** Partition-parallel decode: one codec per partition, streaming rows —
    * the batch shape a real decoder (JNI, subprocess) needs. The emitted
    * header fields and pixel checksum come from parsing the payload
    * BYTES, not from re-deriving the generator's inputs — the oracle
    * re-derives them independently, so the gate proves the full
    * encode → binary → parse round trip. */
  def decodePpm(docs: DataFrame): Dataset[PpmFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPpmPayload(docs).select("doc_id", "payload").as[Payload]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map(p => parsePpm(p.doc_id, p.payload))
      }
  }

  // ------------------------------------------------------------- audio/WAV

  case class WavFeatures(doc_id: Long, valid: Boolean, channels: Int,
                         sample_rate: Int, bits: Int, n_samples: Long, pcm_sum: Long)

  /** Build a REAL canonical 44-byte RIFF/WAVE header + 8-bit PCM payload
    * per document: channels = doc_id%2+1, sample rate 11025 Hz, bits 8,
    * an even data length 2*((doc_id%41)+4) ∈ [8, 90], PCM bytes from the
    * ASCII-sanitized text. All multi-byte header fields are little-endian
    * as the format requires; every variable byte value stays < 0x80 by
    * construction (11025 = 0x2B11, 22050 = 0x5622, chunk ≤ 126) so the
    * chr()-built string encodes byte-per-byte in UTF-8. Column algebra
    * only — array-local, zero shuffle. */
  def withWavPayload(docs: DataFrame): DataFrame = {
    def le16(lo: Column, hi: Column) = concat(expr_chr(lo), expr_chr(hi))
    def le32(lo: Column, hi: Column) =
      concat(expr_chr(lo), expr_chr(hi), expr_chr(lit(0)), expr_chr(lit(0)))
    docs
      .withColumn("_ch", (pmod(col("doc_id"), lit(2L)) + 1).cast("int"))
      .withColumn("_dl", ((pmod(col("doc_id"), lit(41L)) + 4) * 2).cast("int"))
      .withColumn("_br", col("_ch") * 11025)
      .withColumn("_ascii", regexp_replace(col("text"), "[^\\x20-\\x7e]", "?"))
      .withColumn("_pcm", expr("rpad(_ascii, _dl, 'x')"))
      .select(col("doc_id"), encode(concat(
        lit("RIFF"), le32(col("_dl") + 36, lit(0)),
        lit("WAVE"), lit("fmt "), le32(lit(16), lit(0)),
        le16(lit(1), lit(0)),                                   // PCM format
        le16(col("_ch"), lit(0)),
        le32(lit(0x11), lit(0x2B)),                             // 11025 Hz
        le32(pmod(col("_br"), lit(256)), floor(col("_br") / 256).cast("int")),
        le16(col("_ch"), lit(0)),                               // block align
        le16(lit(8), lit(0)),                                   // bits
        lit("data"), le32(col("_dl"), lit(0)),
        col("_pcm")), "UTF-8").as("payload"))
  }

  private def expr_chr(c: Column): Column = {
    // char() builds the single-byte codepoint; all generated values < 0x80
    org.apache.spark.sql.functions.chr(c)
  }

  /** Validated canonical WAV header: fmt fields plus the data-chunk
    * length (PCM bytes start at offset 44). */
  private[graft] case class WavHeader(ch: Int, rate: Int, bits: Int,
                                      align: Int, dataLen: Int)

  /** REAL RIFF/WAVE header parse over raw bytes — magic checks,
    * little-endian fields, canonical fmt chunk (PCM, 16-byte), exact
    * data-chunk length. Throws IllegalArgumentException on malformed
    * input; callers route that to `valid = false` rows, same contract as
    * [[parsePpmHeader]]. */
  private def parseWavHeader(bytes: Array[Byte]): WavHeader = {
    def fail(msg: String) = throw new IllegalArgumentException(msg)
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int, s: String): Boolean = new String(bytes, i, 4, "US-ASCII") == s
    if (bytes.length < 44) fail("shorter than a canonical WAV header")
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) fail("not RIFF/WAVE")
    if (le32(4) != bytes.length - 8) fail("chunk size != file size - 8")
    if (!tag(12, "fmt ") || le32(16) != 16) fail("missing canonical fmt chunk")
    if (le16(20) != 1) fail("not PCM")
    val ch = le16(22); val rate = le32(24); val bits = le16(34)
    // all-zero fields satisfy every consistency identity below (0 == 0)
    // and would reach the n_samples division — reject them explicitly
    // so a degenerate header routes to valid=false, never a task-killing
    // ArithmeticException
    if (ch <= 0 || rate <= 0 || bits <= 0 || bits % 8 != 0) fail("degenerate fmt fields")
    if (le32(28) != rate * ch * (bits / 8)) fail("inconsistent byte rate")
    val align = le16(32)
    if (align != ch * (bits / 8)) fail("inconsistent block align")
    if (!tag(36, "data")) fail("missing data chunk")
    val dataLen = le32(40)
    if (bytes.length - 44 != dataLen) fail(s"data chunk has ${bytes.length - 44} bytes, declared $dataLen")
    // a zero-length data chunk satisfies the identities but leaves the
    // fingerprint's frame reads out of bounds — the [[parsePpmHeader]]
    // zero-dimension rule
    if (dataLen <= 0) fail("empty data chunk")
    WavHeader(ch, rate, bits, align, dataLen)
  }

  /** REAL RIFF/WAVE parser over raw bytes — header validation via
    * [[parseWavHeader]] + unsigned PCM byte sum. Malformed payloads route
    * to `valid = false` rows, same error contract as [[parsePpm]]. */
  private[graft] def parseWav(id: Long, bytes: Array[Byte]): WavFeatures =
    try {
      val hd = parseWavHeader(bytes)
      var sum = 0L; var j = 44
      while (j < bytes.length) { sum += bytes(j) & 0xff; j += 1 }
      WavFeatures(id, valid = true, hd.ch, hd.rate, hd.bits,
        hd.dataLen.toLong / hd.align, sum)
    } catch {
      case _: IllegalArgumentException => WavFeatures(id, valid = false, -1, -1, -1, 0L, 0L)
    }

  /** Partition-parallel audio decode — same batch shape as [[decodePpm]],
    * second container format: the features come from parsing the BYTES
    * (magic, endianness, chunk lengths), the oracle re-derives them from
    * the generator's inputs, and parity proves the round trip. */
  def decodeWav(docs: DataFrame): Dataset[WavFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withWavPayload(docs).select("doc_id", "payload").as[Payload]
      .mapPartitions(it => it.map(p => parseWav(p.doc_id, p.payload)))
  }

  // ------------------------------------------------- audio fingerprint

  case class WavFingerprint(doc_id: Long, valid: Boolean, afp: Long)

  /** Number of energy frames behind the 60-bit audio fingerprint. */
  private[graft] val AudioFpFrames = 61

  /** Frame-energy audio fingerprint over the DECODED PCM samples: parse
    * the RIFF/WAVE payload bytes ([[parseWavHeader]] — magic, endianness,
    * exact chunk lengths), split the data chunk into 61 nearest-neighbor
    * frames (frame i covers bytes [i·n/61, max((i+1)·n/61, i·n/61 + 1)) —
    * never empty, exact partition cells once n ≥ 61), sum each frame's
    * unsigned bytes, then bit k (k < 60) is the sign of the energy delta
    * between frames σ(k+1) and σ(k) under the fixed permutation
    * σ(k) = 37·k mod 61.
    *
    * The permuted comparison schedule is the scale-critical choice,
    * chosen by measurement: ADJACENT-frame deltas tie structurally on
    * short payloads (two empty/identical neighbor frames compare 0 > 0
    * for every document alike), which collapses unrelated fingerprints —
    * measured on the sf0.1 corpus, adjacent deltas put 105,739 unrelated
    * pairs inside hamming 3 where the permuted schedule leaves 403. Since
    * 37 and 61 are coprime, σ is a permutation and each frame feeds
    * exactly two comparisons, so a LOCAL perturbation still flips ≤ 2
    * bits — the near-dup robustness a perceptual fingerprint exists for.
    * 60 bits pack into one non-negative BIGINT, reusing the 4×15-bit
    * pigeonhole banding of the simhash/phash pairings. Malformed payloads
    * route to `valid = false`. */
  private[graft] def audioFpWav(id: Long, bytes: Array[Byte]): WavFingerprint =
    try {
      val hd = parseWavHeader(bytes)
      val n = hd.dataLen
      val nf = AudioFpFrames
      val e = new Array[Long](nf)
      var i = 0
      while (i < nf) {
        // Long arithmetic: i * n overflows Int for dataLen >= ~35.8 MB
        // (Int.MaxValue / 60 — a ~3.5-minute 16-bit stereo WAV), and the
        // negative offset would escape the IllegalArgumentException-only
        // catch as an ArrayIndexOutOfBoundsException, killing the task
        // for a WELL-FORMED input instead of routing it to valid=false
        val s = (i.toLong * n / nf).toInt
        val t = math.max(((i + 1).toLong * n / nf).toInt, s + 1)
        var sum = 0L; var j = s
        while (j < t) { sum += bytes(44 + j) & 0xff; j += 1 }
        e(i) = sum
        i += 1
      }
      var fp = 0L
      var k = 0
      while (k < nf - 1) {
        if (e((k + 1) * 37 % nf) > e(k * 37 % nf)) fp |= 1L << k
        k += 1
      }
      WavFingerprint(id, valid = true, fp)
    } catch {
      case _: IllegalArgumentException => WavFingerprint(id, valid = false, 0L)
    }

  /** Partition-parallel audio fingerprint — the same narrow-map batch
    * shape as [[decodeWav]] (one codec per partition, zero shuffle,
    * fixed-width output): the fingerprint comes from parsing the payload
    * BYTES while the oracle re-derives the frame energies from the
    * generator's inputs, so parity proves encode → binary → parse →
    * frame-energy → sign-delta end to end. */
  def audioFingerprint(docs: DataFrame): Dataset[WavFingerprint] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withWavPayload(docs).select("doc_id", "payload").as[Payload]
      .mapPartitions(it => it.map(p => audioFpWav(p.doc_id, p.payload)))
  }

  // ------------------------------------------------- video fingerprint

  /** Parsed VID0 header: frame count, frame dims, plane offset. */
  private[graft] case class VideoHeader(nf: Int, w: Int, h: Int, off: Int)

  /** Number of frames in the video container AND the fingerprint's
    * comparison schedule — 61 frames give 60 sign-delta bits under the
    * same coprime permutation as [[AudioFpFrames]]. */
  private[graft] val VideoFrames = 61

  /** Build a REAL multi-frame video container per document:
    * `VID0\n<nf> <w> <h>\n` then nf grayscale frames of w·h bytes each
    * (the document's ASCII-sanitized text right-padded to the full frame
    * stream). Frame dims derive from doc_id like the P6 payload; byte ==
    * codepoint so the DuckDB oracle re-derives the frame stream with
    * string functions. Pure Column algebra — array-local, zero shuffle. */
  def withVideoPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("_w", (pmod(col("doc_id"), lit(5L)) + 2).cast("int"))
      .withColumn("_h", (pmod(col("doc_id"), lit(3L)) + 2).cast("int"))
      .withColumn("_ascii", regexp_replace(col("text"), "[^\\x20-\\x7e]", "?"))
      .withColumn("_px", expr(s"rpad(_ascii, _w * _h * $VideoFrames, 'x')"))
      .select(col("doc_id"),
        encode(concat(lit(s"VID0\n$VideoFrames "),
          col("_w").cast("string"), lit(" "), col("_h").cast("string"),
          lit("\n"), col("_px")), "UTF-8").as("payload"))

  /** REAL VID0 header parse over raw bytes — magic check, ascii header
    * ints, single separator byte, exact frame-stream length. Same
    * malformed-routes-to-valid=false contract as [[parsePpmHeader]]. */
  private def parseVideoHeader(bytes: Array[Byte]): VideoHeader = {
    var i = 0
    def fail(msg: String) = throw new IllegalArgumentException(msg)
    def parseInt(): Int = {
      var v = 0; var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      if (!any) fail(s"expected integer at byte $i")
      v
    }
    if (bytes.length < 5 || bytes(0) != 'V' || bytes(1) != 'I' ||
        bytes(2) != 'D' || bytes(3) != '0' || bytes(4) != '\n')
      fail("not a VID0 container")
    i = 5
    val nf = parseInt()
    if (i >= bytes.length || bytes(i) != ' ') fail("missing nf separator"); i += 1
    val w = parseInt()
    if (i >= bytes.length || bytes(i) != ' ') fail("missing w separator"); i += 1
    val h = parseInt()
    if (i >= bytes.length || bytes(i) != '\n') fail("missing header terminator"); i += 1
    // a zero-frame or zero-dim container satisfies the length identity
    // (0 == 0) but breaks every frame read — reject like the P6 rule;
    // < 2 frames define no delta at all
    if (nf < 2 || w <= 0 || h <= 0) fail(s"degenerate geometry $nf x ${w}x$h")
    if (bytes.length - i != nf * w * h)
      fail(s"frame stream has ${bytes.length - i} bytes, expected ${nf * w * h}")
    VideoHeader(nf, w, h, i)
  }

  case class VideoFingerprint(doc_id: Long, valid: Boolean, vfp: Long)

  /** TEMPORAL video fingerprint over the DECODED frame stream — the
    * [[audioFpWav]] recipe applied to the frame axis: parse the VID0
    * container (magic, geometry, exact stream length), sample
    * [[VideoFrames]] = 61 frames by nearest neighbor (frame ⌊i·nf/61⌋ —
    * identity when nf = 61, the generator's shape), sum each sampled
    * frame's unsigned luminance bytes, then bit k (k < 60) is the sign of
    * the energy delta between frames σ(k+1) and σ(k) under the fixed
    * coprime permutation σ(k) = 37·k mod 61.
    *
    * The same robustness contract as the audio fingerprint, on frames
    * instead of byte cells: each frame feeds exactly two comparisons, so
    * a LOCALLY perturbed sequence (one re-encoded frame, a replaced
    * scene, a re-padded tail) flips ≤ 2 bits — inside the band join's
    * hamming-3 recall — while unrelated sequences diverge across the
    * permuted schedule. 60 bits pack into one non-negative BIGINT,
    * reusing the guarded 4×15-bit pigeonhole banding. Malformed payloads
    * route to `valid = false`. */
  private[graft] def videoFpBytes(id: Long, bytes: Array[Byte]): VideoFingerprint =
    try {
      val hd = parseVideoHeader(bytes)
      val fl = hd.w * hd.h
      val nf = VideoFrames
      val e = new Array[Long](nf)
      var i = 0
      while (i < nf) {
        // Long arithmetic: the audioFpWav overflow rule
        val f = (i.toLong * hd.nf / nf).toInt
        var sum = 0L
        var j = hd.off + f * fl
        val end = j + fl
        while (j < end) { sum += bytes(j) & 0xff; j += 1 }
        e(i) = sum
        i += 1
      }
      var fp = 0L
      var k = 0
      while (k < nf - 1) {
        if (e((k + 1) * 37 % nf) > e(k * 37 % nf)) fp |= 1L << k
        k += 1
      }
      VideoFingerprint(id, valid = true, fp)
    } catch {
      case _: IllegalArgumentException => VideoFingerprint(id, valid = false, 0L)
    }

  /** Partition-parallel video fingerprint — the same narrow-map batch
    * shape as [[audioFingerprint]] (one codec per partition, zero
    * shuffle, fixed-width output): the fingerprint comes from parsing the
    * payload BYTES while the oracle re-derives the frame energies from
    * the generator's inputs, so parity proves encode → binary → parse →
    * frame-energy → sign-delta end to end. */
  def videoFingerprint(docs: DataFrame): Dataset[VideoFingerprint] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withVideoPayload(docs).select("doc_id", "payload").as[Payload]
      .mapPartitions(it => it.map(p => videoFpBytes(p.doc_id, p.payload)))
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

  // ------------------------------------------------- real pixel resample

  case class PpmResized(doc_id: Long, valid: Boolean, r_w: Int, r_h: Int,
                        r_sum: Long, r_hash: Long)

  /** REAL nearest-neighbor pixel resample over the DECODED P6 plane: the
    * payload bytes are parsed ([[parsePpmHeader]] — magic, dims, exact
    * plane length), then each target pixel (x', y') reads source pixel
    * (⌊x'·w/tw⌋, ⌊y'·h/th⌋) — the standard nearest-neighbor index map —
    * accumulating the resized plane's unsigned byte sum and its order-
    * sensitive rolling hash ((a·31+byte) mod 1e9+7, row-major RGB order).
    * Malformed payloads route to `valid = false`, same contract as
    * [[parsePpm]]. */
  private[graft] def resamplePpm(id: Long, bytes: Array[Byte],
                                 tw: Int, th: Int): PpmResized =
    try {
      val hd = parsePpmHeader(bytes)
      var sum = 0L; var hash = 0L
      var y = 0
      while (y < th) {
        val sy = y * hd.h / th
        var x = 0
        while (x < tw) {
          val sx = x * hd.w / tw
          val base = hd.pixOff + (sy * hd.w + sx) * 3
          var c = 0
          while (c < 3) {
            val b = bytes(base + c) & 0xff
            sum += b
            hash = (hash * 31 + b) % 1000000007L
            c += 1
          }
          x += 1
        }
        y += 1
      }
      PpmResized(id, valid = true, tw, th, sum, hash)
    } catch {
      case _: IllegalArgumentException => PpmResized(id, valid = false, -1, -1, 0L, 0L)
    }

  /** Partition-parallel decode + resample — the full image pipeline stage
    * (parse container → pixel op → fixed-width features) in one narrow
    * map, zero shuffle. The oracle re-derives the resampled plane from the
    * GENERATOR's inputs while this side works from the payload BYTES, so
    * parity proves encode → binary → parse → resample end to end. */
  def resizePpm(docs: DataFrame, targetW: Int = 3, targetH: Int = 2): Dataset[PpmResized] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(targetW > 0 && targetH > 0, s"target dims must be positive: ${targetW}x$targetH")
    withPpmPayload(docs).select("doc_id", "payload").as[Payload]
      .mapPartitions(it => it.map(p => resamplePpm(p.doc_id, p.payload, targetW, targetH)))
  }

  case class PpmFrame(doc_id: Long, frame_idx: Int, src_row: Int,
                      row_sum: Long, row_hash: Long, valid: Boolean)

  /** REAL frame sampling over the DECODED plane: `nFrames` evenly-spaced
    * PIXEL ROWS (row ⌊i·h/n⌋ — the video-frame analog of [[resamplePpm]]'s
    * nearest-neighbor map), each emitting its unsigned byte sum and
    * order-sensitive rolling hash. One row per (doc, frame); a malformed
    * payload emits a single sentinel `valid = false` row instead of
    * killing the batch. */
  private[graft] def framesPpm(id: Long, bytes: Array[Byte], nFrames: Int): Iterator[PpmFrame] =
    try {
      val hd = parsePpmHeader(bytes)
      (0 until nFrames).iterator.map { i =>
        val sy = i * hd.h / nFrames
        val base = hd.pixOff + sy * hd.w * 3
        var sum = 0L; var hash = 0L
        var j = 0
        while (j < hd.w * 3) {
          val b = bytes(base + j) & 0xff
          sum += b
          hash = (hash * 31 + b) % 1000000007L
          j += 1
        }
        PpmFrame(id, i, sy, sum, hash, valid = true)
      }
    } catch {
      case _: IllegalArgumentException =>
        Iterator.single(PpmFrame(id, -1, -1, 0L, 0L, valid = false))
    }

  /** Partition-parallel decode + frame-sample — same narrow-map batch
    * shape as [[resizePpm]]; the oracle re-derives the sampled rows from
    * the generator's inputs, parity proving the full byte round trip. */
  def sampleFramesPpm(docs: DataFrame, nFrames: Int = 2): Dataset[PpmFrame] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(nFrames > 0, s"nFrames must be positive: $nFrames")
    withPpmPayload(docs).select("doc_id", "payload").as[Payload]
      .flatMap(p => framesPpm(p.doc_id, p.payload, nFrames))
  }

  // ------------------------------------------------- perceptual hash

  case class PpmPhash(doc_id: Long, valid: Boolean, phash: Long)

  /** dHash over the DECODED, resampled luminance plane: parse the P6
    * payload bytes, nearest-neighbor-resample to a (gw+1) × gh luminance
    * grid (lum = r + g + b — an integer, no division, so both engines
    * compare identical ints), then bit k (k = y·gw + x) is set iff
    * lum(x+1, y) > lum(x, y) — the classic difference hash: invariant to
    * global brightness shifts and robust to small pixel noise, exactly
    * what byte-identical hashing (dedup_exact on the payload) cannot
    * give. gw·gh = 60 bits packs into one non-negative BIGINT, reusing
    * the 4×15-bit pigeonhole banding proven by [[graft.dedup.Dedup]]'s
    * simhash pairing. Malformed payloads route to `valid = false`. */
  private[graft] def phashPpm(id: Long, bytes: Array[Byte],
                              gw: Int, gh: Int): PpmPhash =
    try {
      val hd = parsePpmHeader(bytes)
      val tw = gw + 1
      val lum = new Array[Int](gh * tw)
      var y = 0
      while (y < gh) {
        val sy = y * hd.h / gh
        var x = 0
        while (x < tw) {
          val sx = x * hd.w / tw
          val base = hd.pixOff + (sy * hd.w + sx) * 3
          lum(y * tw + x) = (bytes(base) & 0xff) + (bytes(base + 1) & 0xff) +
            (bytes(base + 2) & 0xff)
          x += 1
        }
        y += 1
      }
      var ph = 0L
      var k = 0
      while (k < gw * gh) {
        val yy = k / gw
        val xx = k % gw
        if (lum(yy * tw + xx + 1) > lum(yy * tw + xx)) ph |= 1L << k
        k += 1
      }
      PpmPhash(id, valid = true, ph)
    } catch {
      case _: IllegalArgumentException => PpmPhash(id, valid = false, 0L)
    }

  /** Partition-parallel perceptual hash — the same narrow-map batch shape
    * as [[decodePpm]] (one codec per partition, zero shuffle, fixed-width
    * output): the hash comes from parsing the payload BYTES while the
    * oracle re-derives the grid from the generator's inputs, so parity
    * proves encode → binary → parse → resample → hash end to end. */
  def imagePhash(docs: DataFrame, gw: Int = 10, gh: Int = 6): Dataset[PpmPhash] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(gw >= 1 && gh >= 1 && gw * gh <= 60,
      s"phash grid must fit 60 bits: ${gw}x$gh")
    withPpmPayload(docs).select("doc_id", "payload").as[Payload]
      .mapPartitions(it => it.map(p => phashPpm(p.doc_id, p.payload, gw, gh)))
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
