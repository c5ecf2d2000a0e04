package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Normalize

/** Deduplication operators for an LLM training-data pipeline, designed for
  * 100 TB from the start:
  *
  *  - exact dedup: hash-groupBy on a content hash — one shuffle keyed by
  *    the hash (near-perfectly distributed);
  *  - MinHash + LSH near-dedup: the scale path. Signatures are computed
  *    array-locally per document; only (band, band-signature) keys shuffle,
  *    so the self-join touches candidate buckets, never the full cross
  *    product;
  *  - n-gram Jaccard via an inverted shingle index: exact similarity for
  *    verification of LSH candidates (quadratic only within a shingle's
  *    posting list — at scale, cap posting-list length / use it solely to
  *    verify LSH candidates);
  *  - SimHash: 60-bit fingerprints, near-dups collide in banded prefixes;
  *  - embedding cosine near-dup: brute force here, LSH/IVF bucketing in
  *    [[graft.similarity.Ann]] as the scale path.
  *
  * All hashes are md5-based so the DuckDB oracle can reproduce them
  * byte-for-byte (both engines implement standard md5; the minimum of hex
  * strings is a valid minhash order).
  */
object Dedup {

  // ------------------------------------------------------------ exact

  /** Exact-duplicate groups: (text_hash, n_docs, keep_id). `keep_id` is the
    * smallest doc_id — the canonical survivor. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))

  // ------------------------------------------------------------ shingles

  /** Distinct word k-shingles from an already-materialized token array.
    * IMPORTANT: `t` must be a plain column reference, not the tokenizing
    * expression itself — Catalyst does no subexpression caching inside
    * higher-order-function lambdas, so an inlined tokenizer would be
    * re-evaluated for every `element_at` of every shingle (measured 44s vs
    * ~1s on sf0.1). CollapseProject keeps the two-step projection below
    * un-inlined because the reference is non-cheap and multiply-used. */
  def shingleCol(t: Column, k: Int): Column = {
    val n = size(t)
    when(n >= k,
      array_distinct(transform(sequence(lit(1), n - k + 1),
        i => concat_ws(" ", (0 until k).map(j => element_at(t, i + j)): _*))))
  }

  /** (doc_id, shingle) exploded rows; docs with < k tokens drop out. */
  def shingles(docs: DataFrame, k: Int = 3): DataFrame =
    docs.select(col("doc_id"), Normalize.tokensCol(col("text")).as("toks"))
      .select(col("doc_id"), explode(shingleCol(col("toks"), k)).as("shingle"))

  // ------------------------------------------------------------ minhash

  /** Affine-family constants for the n-th minhash: h_i = (A_i*x + B_i*y +
    * C_i) mod P over the two 28-bit halves (x, y) of ONE md5 per shingle —
    * the classic single-hash minhash family. Every product stays < 2^59,
    * so the arithmetic is exact 64-bit on both engines. */
  val MinhashP = 2147483647L // 2^31 - 1
  def minhashA(i: Int): Long = 2 * i + 3L
  def minhashB(i: Int): Long = 1000003L * (i + 1) + 7
  def minhashC(i: Int): Long = 7919L * i + 1

  /** MinHash signature: h_i(doc) = min over shingles of the affine hash
    * above, as BIGINT columns h0..h{n-1}.
    *
    * Two deliberate shapes: ONE md5 per shingle (16 separate salted md5s
    * cost 16x the hashing), and numeric minima (string min() aggs fall
    * back to sort-based aggregation — longs keep the 16-way agg in a
    * fixed-width HashAggregate buffer). The md5 and its two halves are
    * materialized in their own projections so the 16 affine expressions
    * reference plain columns (no re-hash per expression). */
  def minhashSignatures(docs: DataFrame, k: Int = 3, numHashes: Int = 16): DataFrame = {
    val halves = shingles(docs, k)
      .select(col("doc_id"), md5(col("shingle")).as("m"))
      .select(col("doc_id"),
        conv(substring(col("m"), 1, 7), 16, 10).cast("long").as("x"),
        conv(substring(col("m"), 8, 7), 16, 10).cast("long").as("y"))
    val aggs = (0 until numHashes).map { i =>
      min((lit(minhashA(i)) * col("x") + lit(minhashB(i)) * col("y") + lit(minhashC(i))) % MinhashP).as(s"h$i")
    }
    halves.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH bucketing: split the signature into `bands` bands of `rowsPerBand`
    * hashes; band key = md5 of the concatenated band. Emits
    * (doc_id, band, sig). */
  def lshBuckets(docs: DataFrame, k: Int = 3, bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val sigs = minhashSignatures(docs, k, bands * rowsPerBand)
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      struct(lit(b).as("band"), md5(concat_ws("|", cols: _*)).as("sig"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Candidate near-duplicate pairs (a < b) sharing at least one LSH
    * bucket. The join is keyed on (band, sig): only same-bucket docs meet. */
  def lshCandidates(docs: DataFrame, k: Int = 3, bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    // persist: both sides of the self-join reference this subtree, and
    // lambda-bearing plans don't canonicalize equal for exchange reuse —
    // without the cache the whole shingle+minhash chain runs twice. The
    // bucket table is (docs x bands) rows of (long, int, hex) — tiny.
    val buckets = lshBuckets(docs, k, bands, rowsPerBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = buckets.select(col("band"), col("sig"), col("doc_id").as("a"))
    val r = buckets.select(col("band"), col("sig"), col("doc_id").as("b"))
    l.join(r, Seq("band", "sig")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  // ------------------------------------------------------------ jaccard

  /** Exact shingle-Jaccard for all pairs sharing >= 1 shingle, via an
    * inverted index self-join (a < b). Returns (a, b, inter, na, nb,
    * jaccard rounded to 6). */
  def jaccardPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.0): DataFrame = {
    // the shingle index is referenced three times (both join sides +
    // per-doc counts); materialize it once — the single-DAG equivalent of
    // writing the inverted index to a table, which is what a 100 TB
    // pipeline does with it anyway
    val sh = shingles(docs, k).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val inter = sh.select(col("shingle"), col("doc_id").as("a"))
      .join(sh.select(col("shingle"), col("doc_id").as("b")), Seq("shingle"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    val j = inter
      .join(counts.select(col("doc_id").as("a"), col("nsh").as("na")), Seq("a"))
      .join(counts.select(col("doc_id").as("b"), col("nsh").as("nb")), Seq("b"))
      .withColumn("jaccard", round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
    j.filter(col("jaccard") >= threshold)
      .select("a", "b", "inter", "na", "nb", "jaccard")
  }

  // ------------------------------------------------------------ simhash

  /** 60-bit SimHash over token md5s (15 hex chars x 4 bits — 60 bits keeps
    * the fingerprint in a positive BIGINT for oracle parity). Each token
    * occurrence votes +1/-1 per bit; fingerprint bit = (vote sum >= 0). */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(Normalize.tokensCol(col("text"))).as("w"))
      .withColumn("h", md5(col("w")))
    // nibble value of hex char j (1-based) in h: 0..15
    def nib(j: Int): Column = conv(substring(col("h"), j, 1), 16, 10).cast("long")
    val votes = (0 until 60).map { bit =>
      val j = bit / 4 + 1     // hex char index
      val b = bit % 4         // bit within nibble
      val bitVal = (nib(j).divide(lit(1L << b)).cast("long")) % 2
      sum(bitVal * 2 - 1).as(s"v$bit")
    }
    val agg = tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val fp = (0 until 60).map { bit =>
      when(col(s"v$bit") >= 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-duplicate pairs (a < b) within `maxHamming` bit flips,
    * found without an O(n^2) comparison: the 60-bit fingerprint splits
    * into 4 bands of 15 bits, and by pigeonhole any pair within hamming
    * distance 3 agrees on at least one full band — so an equi self-join on
    * (band, band-bits) surfaces every qualifying pair, then an exact
    * `bit_count(xor)` filter removes false candidates. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = simhash(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = fp.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), (shiftright(col("simhash"), 15 * b) % 32768L).as("bits"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"), col("bb.bits").as("bits"))
    val l = banded.select(col("band"), col("bits"), col("doc_id").as("a"), col("simhash").as("sh_a"))
    val r = banded.select(col("band"), col("bits"), col("doc_id").as("b"), col("simhash").as("sh_b"))
    l.join(r, Seq("band", "bits")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Connected components over the near-duplicate candidate graph —
    * iterative min-label propagation to a fixpoint. Greedy drop-the-larger
    * dedup ([[graft.pipelines.CleanCorpus]]) over-deletes on chains
    * (a~b, b~c deletes b and c even if a!~c); component labeling keeps
    * exactly one doc per transitive group.
    *
    * The loop is the standard large-graph pattern: each round joins the
    * label table to the (small, bidirectional) edge list and takes the min
    * neighbor label; rounds needed = graph diameter in the worst case,
    * O(log n) on near-dup graphs (tiny star-shaped clusters). Each round
    * materializes the label table so the lineage doesn't grow unboundedly.
    * Returns (doc_id, component) for every vertex of the pair graph.  */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("component", col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst").withColumnRenamed("component", "n_comp"), Seq("dst"))
        .groupBy(col("src").as("doc_id")).agg(min(col("n_comp")).as("n_comp"))
      val updated = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("component"), coalesce(col("n_comp"), col("component"))).as("component"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val changed = updated.join(labels.withColumnRenamed("component", "old"), Seq("doc_id"))
        .filter(col("component") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      it += 1
    }
    labels
  }

  // --------------------------------------------------- embedding near-dup

  /** Top-N globally-closest embedding pairs by cosine (brute-force a < b;
    * the LSH/IVF scale path lives in [[graft.similarity.Ann]]). */
  def closestEmbeddingPairs(emb: DataFrame, topN: Int = 20): DataFrame = {
    import graft.similarity.Ann.dot
    // norms once per vector, not per pair — bit-identical cosine, 3x fewer
    // dot products across the O(n^2) pair space
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val l = base.select(col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val r = base.select(col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    l.join(r, col("a") < col("b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .select(col("a"), col("b"), col("cos"))
      .orderBy(col("cos").desc, col("a").asc, col("b").asc)
      .limit(topN)
  }
}
