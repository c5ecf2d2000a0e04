package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.Dedup
import graft.text.{QualityClassifier, TextAnalysis, TextNormalize}

/** The pretrain ladder's GATE HALF deployed as a continuous ingest job —
  * what a production crawl runs on every arriving shard BEFORE the batch
  * ladder ([[graft.pipelines.PretrainCorpus]]) ever sees it:
  *
  *   1. the ROW-LOCAL cleaning chain (NFC canonicalization → C4 line
  *      rules → persisted-boilerplate line filter → PII scrub — one
  *      narrow projection plus one broadcast line list, zero shuffles);
  *   2. the TRAINED quality-classifier gate under the persisted weight
  *      row ([[QualityStream]]'s one-row-model contract);
  *   3. the exact-substring benchmark decontamination flag against the
  *      persisted anchor index ([[DeconStream]]'s contract);
  *   4. the near-duplicate flag against the persisted minhash index
  *      ([[Dedup.jaccardMatchesAgainst]] — arrivals fingerprint once,
  *      nothing indexed is re-shingled).
  *
  * The CORPUS-GLOBAL ladder stages split by their serve shape: the
  * boilerplate stage's document frequencies are computed BATCH-SIDE at
  * index build and the gate only applies the published line table (a
  * per-shard gate cannot see corpus df — and without this filter every
  * arrival would decon-flag on the shared banner lines the batch ladder
  * strips before its own decon stage); keep-canonical dedup's pair
  * graph and the token budget's global allocation stay in the periodic
  * batch rebuild outright. The gate's job is the per-arrival
  * admit/reject decision and its audit row.
  *
  * Per-batch atomic via foreachBatch; replayed batches overwrite their
  * own `ingest_batch` partition (the [[DedupStream]] idempotence
  * contract). Index and model directories are re-read per micro-batch so
  * a [[graft.sources.Sinks.publishSwap]] refresh never kills the query. */
object PretrainStream {

  /** Last (weights, threshold) the batch gate twin ran with, stashed for
    * its dynamic oracle (the [[graft.pipelines.PretrainCorpus.lastGate]]
    * pattern). */
  @volatile var lastIngestGate: Option[(Seq[Double], Double)] = None

  /** NFC canonicalization + C4 line rules — the row-local prefix shared
    * by the index build and serving (one narrow projection). */
  def nfcC4(docs: DataFrame, minLineWords: Int = 3): DataFrame =
    docs.select(col("doc_id"), col("source"),
      array_join(
        TextAnalysis.c4KeptLines(
          split(TextNormalize.normalizeText(col("text")), "\n"), minLineWords),
        "\n").as("text"))

  /** Boilerplate-line filter over a post-C4 relation — the ladder's
    * corpus-global boilerplate stage served from its PERSISTED line
    * table (the batch side computes document frequencies; the gate only
    * APPLIES the published list — a per-shard gate cannot see corpus
    * df, and this is exactly how it gets the stage anyway). The line
    * table collapses to one broadcast array row, so the filter stays a
    * narrow map; matching is on the TRIMMED form, kept lines pass
    * byte-identical (the scrubBoilerplateLines contract). */
  def applyBoilerplate(postC4: DataFrame, blLines: DataFrame): DataFrame = {
    val bl = blLines.agg(collect_list(col("line")).as("bl"))
    postC4.crossJoin(broadcast(bl))
      .select(col("doc_id"), col("source"),
        array_join(
          filter(split(col("text"), "\n"),
            x => !array_contains(col("bl"), trim(x))),
          "\n").as("text"))
  }

  /** The PII scrub step (row-local). */
  def piiClean(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("source"),
      TextAnalysis.scrub(col("text")).as("text"))

  /** The full row-local cleaning chain of the pretrain ladder — NFC →
    * C4 → persisted-boilerplate filter → PII, the ladder's stage order
    * with the one corpus-global stage index-served. */
  def cleanChain(docs: DataFrame, blLines: DataFrame,
                 minLineWords: Int = 3): DataFrame =
    piiClean(applyBoilerplate(nfcC4(docs, minLineWords), blLines))

  /** One micro-batch's gate decisions — one row PER ARRIVAL:
    * (doc_id, source, score, quality_pass, decon_flag, dup_flag,
    * dup_match_id, dup_jaccard, keep) with keep = passes quality AND not
    * contaminated AND not a near-dup of the indexed corpus. Flags are
    * computed independently (an audit row reports every gate's verdict,
    * not just the first rejection).
    *
    * The decon flag checks the PRE-PII text deliberately: the scrub
    * replaces unique identifiers with shared tokens (`<EMAIL>`/`<NUM>`),
    * which MANUFACTURES verbatim ≥minLen overlaps between unrelated
    * documents that both merely contained contact lines — measured on
    * the gate fixture: 88/250 arrivals false-flag on the scrubbed
    * contact-line suffix vs the 10 true leak plants. The batch ladder
    * is immune (its decon stage CUTS spans, so a manufactured span just
    * loses a scrub token), but an admit/reject gate must not reject on
    * a scrub artifact. Quality and the dup check stay on the post-PII
    * text — the representation the ladder's own gate and dedup stages
    * read. THE SAME algebra as the batch registry query
    * (`pipeline_ingest_gate`), so stream and batch cannot drift.
    * Returns a persisted (shard-sized) frame; caller unpersists. */
  def gateBatch(batch: DataFrame, w: Seq[Double], thr: Double,
                blLines: DataFrame, benchAnchors: DataFrame, benchDocs: DataFrame,
                indexSigs: DataFrame, indexSets: DataFrame,
                minLineWords: Int = 3, minLen: Int = 30,
                anchorK: Int = 24, anchorW: Int = 7,
                k: Int = 3, numHashes: Int = 16,
                bands: Int = 4, rowsPerBand: Int = 4,
                dupThreshold: Double = 0.5): DataFrame = {
    val preScrub = applyBoilerplate(nfcC4(batch, minLineWords), blLines)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cleaned = piiClean(preScrub)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Intermediates release in a finally so a failed (and later retried)
    // micro-batch never strands MEMORY_AND_DISK caches in a long-running
    // stream — each retry starts from a clean executor cache.
    var deconRep: DataFrame = null
    var dupRep: DataFrame = null
    try {
      val scored = QualityClassifier.scoreTextWith(cleaned, w)
        .select(col("doc_id"), col("source"), col("score"))
      deconRep = Dedup.decontaminateSubstringAgainst(
        preScrub.select("doc_id", "text"), benchAnchors, benchDocs, minLen, anchorK, anchorW)
      dupRep = Dedup.jaccardMatchesAgainst(
        cleaned.select("doc_id", "text"), indexSigs, indexSets,
        k, numHashes, bands, rowsPerBand, dupThreshold)
      val out = scored
        .join(deconRep.select(col("doc_id")).distinct()
          .withColumn("decon_flag", lit(1)), Seq("doc_id"), "left")
        .join(dupRep.select(col("doc_id"), col("match_id").as("dup_match_id"),
            col("jaccard").as("dup_jaccard"))
          .withColumn("dup_flag", lit(1)), Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"), col("score"),
          when(col("score") >= thr, 1).otherwise(0).as("quality_pass"),
          coalesce(col("decon_flag"), lit(0)).as("decon_flag"),
          coalesce(col("dup_flag"), lit(0)).as("dup_flag"),
          col("dup_match_id"), col("dup_jaccard"))
        .withColumn("keep",
          (col("quality_pass") === 1 && col("decon_flag") === 0 &&
            col("dup_flag") === 0).cast("int"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try { out.count(); out }
      catch { case t: Throwable => out.unpersist(); throw t }
    } finally {
      if (deconRep != null) deconRep.unpersist()
      if (dupRep != null) dupRep.unpersist()
      cleaned.unpersist(); preScrub.unpersist()
    }
  }

  /** Build the full gate index under `dir` from the raw page table:
    * `/boilerplate` — trimmed post-C4 lines (≥ `bpMinLineChars` chars)
    * with per-doc-distinct df ≥ `bpMinDf` over the admitted corpus +
    * benchmark (the batch side owns the corpus-frequency computation;
    * the gate only applies the list); `/dedup` — minhash signatures +
    * shingle sets of the admitted corpus' POST-PII pages (the
    * representation the ladder's dedup stage reads); `/bench` +
    * `/anchors` — the benchmark's PRE-PII pages and their substring
    * anchors (see [[gateBatch]] on why decon reads pre-PII text).
    * Staged publish per table. */
  def writeGateIndex(pages: DataFrame, dir: String,
                     benchPred: org.apache.spark.sql.Column,
                     corpusPred: org.apache.spark.sql.Column,
                     minLineWords: Int = 3, bpMinDf: Long = 3,
                     bpMinLineChars: Int = 10,
                     anchorK: Int = 24, anchorW: Int = 7,
                     k: Int = 3, numHashes: Int = 16): Unit = {
    val base = nfcC4(pages, minLineWords)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.sources.Sinks.publishSwap(s"$dir/boilerplate") { staging =>
      base.filter(corpusPred || benchPred)
        .select(col("doc_id"), explode(split(col("text"), "\n")).as("raw"))
        .select(col("doc_id"), trim(col("raw")).as("line"))
        .filter(length(col("line")) >= bpMinLineChars)
        .distinct()
        .groupBy("line").agg(count(lit(1)).as("df"))
        .filter(col("df") >= bpMinDf)
        .select("line")
        .coalesce(1).write.mode("overwrite").parquet(staging)
    }
    val spark = pages.sparkSession
    val bpF = applyBoilerplate(base, spark.read.parquet(s"$dir/boilerplate"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.writeDedupIndex(piiClean(bpF).filter(corpusPred), s"$dir/dedup", k, numHashes)
    val bench = bpF.filter(benchPred)
    graft.sources.Sinks.publishSwap(s"$dir/bench") { staging =>
      bench.write.mode("overwrite").parquet(staging)
    }
    graft.sources.Sinks.publishSwap(s"$dir/anchors") { staging =>
      Dedup.substringAnchors(bench, anchorK, anchorW)
        .write.mode("overwrite").parquet(staging)
    }
    bpF.unpersist()
    base.unpersist()
  }

  /** Start the gate over document shard drops: per-arrival audit rows
    * append (idempotently) under `outDir`. `gateIndexDir` is the
    * [[graft.dedup.Dedup.writeDedupIndex]]-shaped corpus index under
    * `/dedup` plus the `/boilerplate` line table and the benchmark
    * `/anchors` + `/bench` tables; `modelDir` holds the classifier's
    * one-row weight table. */
  def gate(stream: DataFrame, modelDir: String, thr: Double,
           gateIndexDir: String, outDir: String, checkpoint: String,
           minLineWords: Int = 3, minLen: Int = 30,
           dupThreshold: Double = 0.5): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.Sinks.readRetry(attempts = 2) {
          val s = batch.sparkSession
          // Weights read BY NAME — a schema evolution or column reorder
          // in the persisted model must fail loudly, never silently
          // misassign an ordinal to the wrong feature.
          val wRow = QualityStream.readModel(s, modelDir)
            .select("w0", "w1", "w2", "w3", "w4").collect()(0)
          val w = (0 until 5).map(wRow.getDouble)
          val o = gateBatch(batch, w, thr,
            s.read.parquet(s"$gateIndexDir/boilerplate"),
            s.read.parquet(s"$gateIndexDir/anchors"),
            s.read.parquet(s"$gateIndexDir/bench"),
            s.read.parquet(s"$gateIndexDir/dedup/minhash_sigs"),
            s.read.parquet(s"$gateIndexDir/dedup/shingle_sets"),
            minLineWords, minLen, dupThreshold = dupThreshold)
          // finally-release: a failed write attempt must not strand the
          // gate frame's cache into the retry.
          try {
            o.withColumn("ingest_batch", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("ingest_batch")
              .parquet(outDir)
          } finally o.unpersist()
          ()
        }
      }
      .start()

  /** The accumulated gate audit log (partition column dropped —
    * consumers see the exact batch-query schema). */
  def auditLog(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("ingest_batch")
}
