package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.{TextAnalysis, TextNormalize}

/** The composed pretraining-corpus flagship — ONE lazy DAG running the
  * full cleanup ladder a 100 TB pretraining corpus actually gets, in the
  * order the stages depend on each other:
  *
  *   1. Unicode canonicalization ([[TextNormalize.normalizeText]] — NFC
  *      first, because every later stage keys on text bytes);
  *   2. C4 line rules (row-local structural line cuts);
  *   3. cross-document boilerplate-line scrub (corpus-frequency cuts the
  *      LOCAL rules can't see — and a prerequisite for dedup: shared
  *      banners would otherwise glue unrelated documents into one LSH
  *      component);
  *   4. keep-canonical near-dup dedup (transitive-closure-exact, min-id
  *      survivor — meaningful only AFTER the scrubs, which is the point
  *      of composing);
  *   5. exact-substring benchmark decontamination scrub (benchmark docs
  *      leave the training corpus here; leaked verbatim spans are cut
  *      from the survivors);
  *   6. token-budget sampling (α-mix allocation, deterministic
  *      content-ordered whole-document prefixes per source);
  *   7. sequence packing (greedy offset bins over the FINAL text).
  *
  * Every stage is a shipped primitive operator; this file only wires
  * them. Per-stage telemetry rides the single final action as `observe`
  * nodes (the pipeline_counters machinery — zero extra corpus passes):
  * documents and characters surviving each stage, the numbers a corpus
  * owner reads per release.
  *
  * The input page is derived deterministically from existing columns
  * (the pageText/messyText pattern — testdata documents are single-line
  * unique ASCII, so the dirt each stage exists to remove is planted
  * reproducibly, and every stage is LIVE on the gate corpus): a
  * corpus-wide banner (survives C4, dies at boilerplate), a per-source
  * nav line (dies at C4), the real body with a decomposed-accent NFC
  * probe and a terminal period (survives the scrubs), an exact-dup pair
  * body for doc_id % 50 ∈ {7, 8} (pair df = 2 stays under the
  * boilerplate threshold, so the pair reaches dedup intact), a
  * uniquely-prefixed benchmark leak line for doc_id % 50 == 11 and for
  * every benchmark doc (unique trimmed line survives boilerplate; the
  * shared ≥ 30-char sentence is exactly what decontamination cuts), and
  * a doc_id-gated footer (df = n/3, dies at boilerplate). Mirrored
  * verbatim by the oracle's `pp` CTE.
  */
object PretrainCorpus {

  /** The verbatim benchmark sentence planted on both sides of the
    * decontamination boundary (68 chars ≥ the minLen=30 contract). */
  val LeakSentence = "this exact benchmark passage leaked verbatim into the training corpus"

  /** Last (weights, threshold) the v2 gate ran with, stashed for the
    * dynamic oracle (the [[graft.text.QualityClassifier.lastWeights]]
    * pattern: training isn't SQL-mirrorable, gating given the model is). */
  @volatile var lastGate: Option[(Seq[Double], Double)] = None

  /** The derived dirty page (requires doc_id, source, text in scope). */
  private[graft] def dirtyPage: Column = {
    val pairId = (floor(col("doc_id") / lit(50)) * 50).cast("long")
    val body = concat(
      when(pmod(col("doc_id"), lit(50)).isin(7, 8),
        concat(lit("duplicate payload "), pairId.cast("string"),
          lit(" quick brown fox jumps tonight")))
        .otherwise(col("text")),
      // DECOMPOSED e + combining acute: stage 1 composes it
      lit(" cafe\u0301."))
    concat_ws("\n",
      lit("Subscribe to our newsletter today!"),
      concat(lit("Navigation for "), col("source"), lit(": home | about | contact")),
      body,
      when(pmod(col("doc_id"), lit(50)) === 11 || col("source") === "src0",
        concat(lit("Ref "), col("doc_id").cast("string"), lit(": "),
          lit(LeakSentence), lit(".")))
        .otherwise(lit(null).cast("string")),
      when(pmod(col("doc_id"), lit(3)) === 0,
        lit("(c) Example Site - all rights reserved."))
        .otherwise(lit(null).cast("string")))
  }

  /** The v2 dirty page — [[dirtyPage]] with two changes that make the
    * quality + PII stages composable without destabilizing the later
    * plants: every planted doc_id is LETTERS-encoded (translate digits →
    * a-j), because the PII stage's `[0-9]{3,}` rule would otherwise
    * rewrite all ≥ 3-digit pair bodies to one corpus-wide "duplicate
    * payload <NUM> …" mega-cluster (whose LSH bucket the engine caps at
    * [[graft.dedup.Dedup.MaxLshBucketSize]] but the oracle's closure does
    * not — a scale-dependent parity landmine) and collapse the leak
    * lines' unique prefixes; and a planted per-doc PII line (email +
    * phone digits, doc_id % 3 == 1, never on the exact-dup pair docs so
    * the pair stays byte-identical) makes the scrub LIVE on the gate
    * corpus while remaining unique per document after scrubbing (the
    * letters token). Mirrored verbatim by the v2 oracle's `pp` CTE. */
  private[graft] def dirtyPageV2: Column = {
    val pairId = (floor(col("doc_id") / lit(50)) * 50).cast("long")
    val idLetters = translate(col("doc_id").cast("string"), "0123456789", "abcdefghij")
    val pairLetters = translate(pairId.cast("string"), "0123456789", "abcdefghij")
    val body = concat(
      when(pmod(col("doc_id"), lit(50)).isin(7, 8),
        concat(lit("duplicate payload "), pairLetters,
          lit(" quick brown fox jumps tonight")))
        .otherwise(col("text")),
      // DECOMPOSED e + combining acute: stage 1 composes it (the v1 NFC probe)
      lit(" cafe\u0301."))
    concat_ws("\n",
      lit("Subscribe to our newsletter today!"),
      concat(lit("Navigation for "), col("source"), lit(": home | about | contact")),
      body,
      when(!pmod(col("doc_id"), lit(50)).isin(7, 8) && pmod(col("doc_id"), lit(3)) === 1,
        concat(lit("Contact u"), idLetters, lit(" at user"), col("doc_id").cast("string"),
          lit("@example.com or call 555"), col("doc_id").cast("string"), lit("0 now.")))
        .otherwise(lit(null).cast("string")),
      when(pmod(col("doc_id"), lit(50)) === 11 || col("source") === "src0",
        concat(lit("Ref "), idLetters, lit(": "),
          lit(LeakSentence), lit(".")))
        .otherwise(lit(null).cast("string")),
      when(pmod(col("doc_id"), lit(3)) === 0,
        lit("(c) Example Site - all rights reserved."))
        .otherwise(lit(null).cast("string")))
  }

  /** The staged chain plus its per-stage observations. */
  private case class Staged(packed: DataFrame, obs: Seq[(String, Observation)])

  /** Dev-only stage timing (SPARK_GRAFT_STAGE_TIMES=1): each stage
    * boundary is an eager localCheckpoint, so wall time between cuts IS
    * the stage cost (guide §1.5 — label the jobs, measure first). The
    * job description labels the stage in the UI/event log either way. */
  private val stageTimes = sys.env.contains("SPARK_GRAFT_STAGE_TIMES")
  private def cut(df: DataFrame, stage: String): DataFrame = {
    val sc = df.sparkSession.sparkContext
    sc.setJobDescription(s"pretrain: $stage")
    val t0 = System.nanoTime()
    val out = df.localCheckpoint()
    if (stageTimes)
      println(f"PP_STAGE $stage%-10s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    sc.setJobDescription(null)
    out
  }

  /** Dev-only timing of the EAGER builder calls (pair graphs, closure
    * labels) that materialize at call time, before any stage cut. */
  private def timed[T](stage: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val out = f
    if (stageTimes)
      println(f"PP_EAGER $stage%-10s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    out
  }

  private def obsOn(df: DataFrame, name: String, metrics: Column*): (DataFrame, Observation) =
    graft.ops.Metrics.observed(df, name, metrics: _*)

  private def build(docs: DataFrame, benchPred: Column, minLineWords: Int,
                    bpMinDf: Long, bpMinLineChars: Int, minLen: Int,
                    budgetTokens: Long, windowSize: Long,
                    gate: Option[(Seq[Double], Double)] = None,
                    imageDedup: Boolean = false,
                    avDedup: Boolean = false): Staged = {
    require(!avDedup || imageDedup,
      "audio/video keep-canonical composes on top of the image stage (v4 ⊃ v3)")
    val (page, oPage) = obsOn(
      docs.select(col("doc_id"), col("source"),
        (if (gate.isDefined) dirtyPageV2 else dirtyPage).as("text")),
      "graft_pp_input", count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
    val (normed, oNfc) = obsOn(
      page.select(col("doc_id"), col("source"),
        TextNormalize.normalizeText(col("text")).as("text")),
      "graft_pp_nfc", sum(length(col("text"))).as("chars"))
    val (c4, oC4) = obsOn(
      normed.select(col("doc_id"), col("source"),
        array_join(TextAnalysis.c4KeptLines(split(col("text"), "\n"), minLineWords), "\n")
          .as("text")),
      "graft_pp_c4", sum(length(col("text"))).as("chars"))
    // STAGE BOUNDARIES CUT LINEAGE (localCheckpoint = the local analog
    // of the write-shard/read-shard staging a production pipeline does
    // between stages): downstream stage functions reference their input
    // several times (dedup labels, the decon match/cut joins, the
    // budget's allocation + running sum), so without the cut the
    // ANALYZED plan size multiplies per stage and every downstream
    // action pays exponentially growing driver-side analysis — measured
    // at sf0.1: 10 s -> 33 s -> 127 s per successive action with plain
    // persist, 4-5 s total with the cuts. The eager checkpoint also
    // fires each stage's observe metrics exactly once.
    val c4p = cut(c4, "c4")
    val (bp, oBp) = obsOn(
      TextAnalysis.scrubBoilerplateLines(c4p.select("doc_id", "text"),
          minDf = bpMinDf, minLineChars = bpMinLineChars)
        .select(col("doc_id"), col("clean_text").as("text"))
        .join(c4p.select("doc_id", "source"), Seq("doc_id")),
      "graft_pp_bp", sum(length(col("text"))).as("chars"))
    val bpp = cut(bp, "bp")
    // OPTIONAL v2 stages between the scrubs and dedup: PII scrub (emails
    // + long digit runs — row-local regex), then the TRAINED quality
    // classifier gate under literal weights (shuffle-free scoring, the
    // 100 TB apply path). Benchmark docs bypass the gate: they are the
    // decontamination REFERENCE set, not corpus members — quality-
    // filtering them away would silently disable the decon stage.
    val (preDedup, extraObs) = gate match {
      case None => (bpp, Seq.empty[(String, Observation)])
      case Some((w, thr)) =>
        val (pii, oPii) = obsOn(
          bpp.select(col("doc_id"), col("source"),
            TextAnalysis.scrub(col("text")).as("text")),
          "graft_pp_pii", sum(length(col("text"))).as("chars"))
        val piip = cut(pii, "pii")
        val (qg, oQg) = obsOn(
          graft.text.QualityClassifier.scoreTextWith(piip, w)
            .filter(benchPred || col("score") >= lit(thr))
            .drop("score"),
          "graft_pp_quality", count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
        (cut(qg, "quality"), Seq("pii" -> oPii, "quality" -> oQg))
    }
    // OPTIONAL v3 stage between the quality gate and TEXT dedup:
    // perceptual IMAGE keep-canonical — each document's image payload
    // fingerprints (narrow partition-parallel decode, zero shuffle),
    // near-duplicate images pair through the guarded pigeonhole band
    // join, and every connected group keeps its min-id member. A real
    // multimodal corpus dedups the re-encoded/re-hosted images BEFORE
    // paying text dedup's shuffles on pages that only differ by wrapper.
    // Closure over the guarded star+representative pairs labels exactly
    // the uncapped clique graph (the bandedHammingPairs invariant), and
    // the oracle mirrors pairs + closure verbatim.
    val (preDedup2, imgObs) =
      if (!imageDedup) (preDedup, Seq.empty[(String, Observation)])
      else {
        val fps = graft.multimodal.Multimodal.imagePhash(preDedup).toDF()
          .filter(col("valid")).select(col("doc_id"), col("phash"))
        val pairs = timed("img_pairs")(Dedup.imagePhashPairsFrom(fps))
        val comps = timed("img_comps")(Dedup.connectedComponents(pairs))
        val (img, oImg) = obsOn(
          preDedup.join(
            comps.filter(col("component") =!= col("doc_id")).select("doc_id"),
            Seq("doc_id"), "left_anti"),
          "graft_pp_image", count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
        // the eager checkpoint materializes the survivors, so the pair
        // graph's and label table's builder-owned caches release here
        val imgp = cut(img, "image")
        pairs.unpersist()
        comps.unpersist()
        (imgp, Seq("image" -> oImg))
      }
    // OPTIONAL v4 stages: perceptual AUDIO then temporal VIDEO
    // keep-canonical, CASCADED after the image stage (each stage
    // fingerprints only the previous stage's survivors — the point of
    // staging is to never pay a later modality's decode on a document an
    // earlier one already collapsed). Same shape as the image stage:
    // narrow partition-parallel fingerprint, guarded pigeonhole band
    // join, closure, min-id survivor — the ingest GATE audits exactly
    // these three modalities (PretrainStream.gateBatch), so the ladder
    // that BUILDS a corpus and the gate that POLICES it now apply the
    // same dedup standard (the r17 verdict's asymmetry, closed).
    val (preDedup3, avObs) =
      if (!avDedup) (preDedup2, Seq.empty[(String, Observation)])
      else {
        val afps = graft.multimodal.Multimodal.audioFingerprint(preDedup2).toDF()
          .filter(col("valid")).select(col("doc_id"), col("afp"))
        val apairs = timed("aud_pairs")(Dedup.audioFingerprintPairsFrom(afps))
        val acomps = timed("aud_comps")(Dedup.connectedComponents(apairs))
        val (aud, oAud) = obsOn(
          preDedup2.join(
            acomps.filter(col("component") =!= col("doc_id")).select("doc_id"),
            Seq("doc_id"), "left_anti"),
          "graft_pp_audio", count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
        val audp = cut(aud, "audio")
        apairs.unpersist()
        acomps.unpersist()
        val vfps = graft.multimodal.Multimodal.videoFingerprint(audp).toDF()
          .filter(col("valid")).select(col("doc_id"), col("vfp"))
        val vpairs = timed("vid_pairs")(Dedup.videoFingerprintPairsFrom(vfps))
        val vcomps = timed("vid_comps")(Dedup.connectedComponents(vpairs))
        val (vid, oVid) = obsOn(
          audp.join(
            vcomps.filter(col("component") =!= col("doc_id")).select("doc_id"),
            Seq("doc_id"), "left_anti"),
          "graft_pp_video", count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
        val vidp = cut(vid, "video")
        vpairs.unpersist()
        vcomps.unpersist()
        (vidp, Seq("audio" -> oAud, "video" -> oVid))
      }
    val (deduped, oDed) = obsOn(
      preDedup3.join(timed("keepCanon")(Dedup.keepCanonical(preDedup3.select("doc_id", "text"))).select("doc_id"),
        Seq("doc_id")),
      "graft_pp_dedup", count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
    val dedp = cut(deduped, "dedup")
    val (decon, oDec) = obsOn(
      Dedup.scrubContaminated(dedp, benchPred, minLen)
        .select(col("doc_id"), col("clean_text").as("text"))
        .join(dedp.select("doc_id", "source"), Seq("doc_id")),
      "graft_pp_decon", count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
    val dcp = cut(decon, "decon")
    val (sampled, oSmp) = obsOn(
      TextAnalysis.sampleTokenBudget(dcp, budgetTokens),
      "graft_pp_sample", count(lit(1)).as("n"), sum(col("doc_tokens")).as("tokens"))
    val kept = dcp.join(sampled.select("doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("source"), length(col("text")).cast("long").as("n_chars"))
    val keptCut = cut(kept, "sample")
    val (packed, oPk) = obsOn(
      Packing.packSequences(keptCut.select("doc_id", "n_chars"), windowSize)
        .join(keptCut.select("doc_id", "source"), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("n_chars"), col("bin")),
      "graft_pp_packed", max(col("bin")).as("max_bin"))
    Staged(packed, Seq("input" -> oPage, "nfc" -> oNfc, "c4" -> oC4,
      "bp" -> oBp) ++ extraObs ++ imgObs ++ avObs ++ Seq("dedup" -> oDed,
      "decon" -> oDec, "sample" -> oSmp, "packed" -> oPk))
  }

  /** The end-to-end corpus: (doc_id, source, n_chars, bin) — the packed
    * training sequences of the fully cleaned, decontaminated, sampled
    * corpus. */
  def pipeline(docs: DataFrame, benchPred: Column = col("source") === "src0",
               minLineWords: Int = 3, bpMinDf: Long = 3, bpMinLineChars: Int = 10,
               minLen: Int = 30, budgetTokens: Long = 20000L,
               windowSize: Long = 2048L): DataFrame =
    build(docs, benchPred, minLineWords, bpMinDf, bpMinLineChars, minLen,
      budgetTokens, windowSize).packed

  /** Run the pipeline once and return the per-stage telemetry as ONE
    * report row — document and character survival per stage plus the two
    * headline cuts, every count an `observe` riding the single packing
    * action. The composed twin of `pipeline_counters`. */
  def report(docs: DataFrame, benchPred: Column = col("source") === "src0",
             minLineWords: Int = 3, bpMinDf: Long = 3, bpMinLineChars: Int = 10,
             minLen: Int = 30, budgetTokens: Long = 20000L,
             windowSize: Long = 2048L): DataFrame = {
    val st = build(docs, benchPred, minLineWords, bpMinDf, bpMinLineChars,
      minLen, budgetTokens, windowSize)
    st.packed.count()
    val m = st.obs.toMap
    def g(stage: String, key: String): Long = {
      val v = m(stage).get(key)
      if (v == null) 0L else v.asInstanceOf[Number].longValue
    }
    // `max_bin` over an EMPTY packed output observes null — that means 0
    // bins, not bin 0 + 1: null-coercing through g() would fabricate
    // n_bins = 1 on a corpus where every document died before packing
    val nBins = {
      val v = m("packed").get("max_bin")
      if (v == null) 0L else v.asInstanceOf[Number].longValue + 1
    }
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((g("input", "n"), g("input", "chars"), g("nfc", "chars"),
        g("c4", "chars"), g("bp", "chars"),
        g("dedup", "n"), g("dedup", "chars"),
        g("decon", "n"), g("decon", "chars"),
        g("sample", "n"), g("sample", "tokens"),
        nBins))
      .toDF("n_docs", "chars_raw", "chars_nfc", "chars_c4", "chars_bp",
        "docs_dedup", "chars_dedup", "docs_decon", "chars_decon",
        "docs_sampled", "tokens_sampled", "n_bins")
      // ratio denominators guard the degenerate empty-input case
      // explicitly (NULL, mirrored by the oracle's CASE) rather than
      // relying on either engine's divide-by-zero convention
      .select(col("*"),
        when(col("chars_raw") > 0,
          round(lit(1.0) - col("chars_bp").cast("double") / col("chars_raw"), 6))
          .otherwise(lit(null).cast("double")).as("scrub_char_cut"),
        when(col("n_docs") > 0,
          round(lit(1.0) - col("docs_dedup").cast("double") / col("n_docs"), 6))
          .otherwise(lit(null).cast("double")).as("dedup_doc_cut"))
  }

  /** The v2 ladder — [[pipeline]] with the PII scrub and the TRAINED
    * quality-classifier gate (literal `gateWeights`, threshold on the
    * round-6 score) composed between the boilerplate scrub and dedup,
    * the order a production cleanup actually runs them: scrub PII before
    * anything persists downstream artifacts, gate quality before paying
    * for dedup's shuffles on documents that won't ship. Same output
    * shape. */
  def pipelineV2(docs: DataFrame, gateWeights: Seq[Double],
                 gateThreshold: Double = 0.2,
                 benchPred: Column = col("source") === "src0",
                 minLineWords: Int = 3, bpMinDf: Long = 3, bpMinLineChars: Int = 10,
                 minLen: Int = 30, budgetTokens: Long = 20000L,
                 windowSize: Long = 2048L): DataFrame =
    build(docs, benchPred, minLineWords, bpMinDf, bpMinLineChars, minLen,
      budgetTokens, windowSize, Some((gateWeights, gateThreshold))).packed

  /** [[report]] for the v2 ladder: two more survival columns (post-PII
    * chars, post-gate docs/chars) and the quality cut headline; the
    * dedup cut reads against the gate's output — its actual input. */
  def reportV2(docs: DataFrame, gateWeights: Seq[Double],
               gateThreshold: Double = 0.2,
               benchPred: Column = col("source") === "src0",
               minLineWords: Int = 3, bpMinDf: Long = 3, bpMinLineChars: Int = 10,
               minLen: Int = 30, budgetTokens: Long = 20000L,
               windowSize: Long = 2048L): DataFrame = {
    val st = build(docs, benchPred, minLineWords, bpMinDf, bpMinLineChars,
      minLen, budgetTokens, windowSize, Some((gateWeights, gateThreshold)))
    st.packed.count()
    val m = st.obs.toMap
    def g(stage: String, key: String): Long = {
      val v = m(stage).get(key)
      if (v == null) 0L else v.asInstanceOf[Number].longValue
    }
    val nBins = {
      val v = m("packed").get("max_bin")
      if (v == null) 0L else v.asInstanceOf[Number].longValue + 1
    }
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((g("input", "n"), g("input", "chars"), g("nfc", "chars"),
        g("c4", "chars"), g("bp", "chars"), g("pii", "chars"),
        g("quality", "n"), g("quality", "chars"),
        g("dedup", "n"), g("dedup", "chars"),
        g("decon", "n"), g("decon", "chars"),
        g("sample", "n"), g("sample", "tokens"),
        nBins))
      .toDF("n_docs", "chars_raw", "chars_nfc", "chars_c4", "chars_bp",
        "chars_pii", "docs_quality", "chars_quality",
        "docs_dedup", "chars_dedup", "docs_decon", "chars_decon",
        "docs_sampled", "tokens_sampled", "n_bins")
      .select(col("*"),
        when(col("chars_raw") > 0,
          round(lit(1.0) - col("chars_bp").cast("double") / col("chars_raw"), 6))
          .otherwise(lit(null).cast("double")).as("scrub_char_cut"),
        when(col("n_docs") > 0,
          round(lit(1.0) - col("docs_quality").cast("double") / col("n_docs"), 6))
          .otherwise(lit(null).cast("double")).as("quality_doc_cut"),
        when(col("docs_quality") > 0,
          round(lit(1.0) - col("docs_dedup").cast("double") / col("docs_quality"), 6))
          .otherwise(lit(null).cast("double")).as("dedup_doc_cut"))
  }

  /** The v3 (MULTIMODAL) ladder — [[pipelineV2]] with perceptual IMAGE
    * keep-canonical composed between the quality gate and text dedup:
    * near-duplicate image payloads (re-encodes, re-hosts) collapse to
    * their min-id page before text dedup pays its shuffles. Same output
    * shape. */
  def pipelineV3(docs: DataFrame, gateWeights: Seq[Double],
                 gateThreshold: Double = 0.2,
                 benchPred: Column = col("source") === "src0",
                 minLineWords: Int = 3, bpMinDf: Long = 3, bpMinLineChars: Int = 10,
                 minLen: Int = 30, budgetTokens: Long = 20000L,
                 windowSize: Long = 2048L): DataFrame =
    build(docs, benchPred, minLineWords, bpMinDf, bpMinLineChars, minLen,
      budgetTokens, windowSize, Some((gateWeights, gateThreshold)),
      imageDedup = true).packed

  /** [[reportV2]] for the v3 ladder: two more survival columns
    * (post-image-dedup docs/chars) and the image-cut headline; the text
    * dedup cut reads against the image stage's output — its actual
    * input. */
  def reportV3(docs: DataFrame, gateWeights: Seq[Double],
               gateThreshold: Double = 0.2,
               benchPred: Column = col("source") === "src0",
               minLineWords: Int = 3, bpMinDf: Long = 3, bpMinLineChars: Int = 10,
               minLen: Int = 30, budgetTokens: Long = 20000L,
               windowSize: Long = 2048L): DataFrame = {
    val st = build(docs, benchPred, minLineWords, bpMinDf, bpMinLineChars,
      minLen, budgetTokens, windowSize, Some((gateWeights, gateThreshold)),
      imageDedup = true)
    st.packed.count()
    val m = st.obs.toMap
    def g(stage: String, key: String): Long = {
      val v = m(stage).get(key)
      if (v == null) 0L else v.asInstanceOf[Number].longValue
    }
    val nBins = {
      val v = m("packed").get("max_bin")
      if (v == null) 0L else v.asInstanceOf[Number].longValue + 1
    }
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((g("input", "n"), g("input", "chars"), g("nfc", "chars"),
        g("c4", "chars"), g("bp", "chars"), g("pii", "chars"),
        g("quality", "n"), g("quality", "chars"),
        g("image", "n"), g("image", "chars"),
        g("dedup", "n"), g("dedup", "chars"),
        g("decon", "n"), g("decon", "chars"),
        g("sample", "n"), g("sample", "tokens"),
        nBins))
      .toDF("n_docs", "chars_raw", "chars_nfc", "chars_c4", "chars_bp",
        "chars_pii", "docs_quality", "chars_quality",
        "docs_image", "chars_image",
        "docs_dedup", "chars_dedup", "docs_decon", "chars_decon",
        "docs_sampled", "tokens_sampled", "n_bins")
      .select(col("*"),
        when(col("chars_raw") > 0,
          round(lit(1.0) - col("chars_bp").cast("double") / col("chars_raw"), 6))
          .otherwise(lit(null).cast("double")).as("scrub_char_cut"),
        when(col("n_docs") > 0,
          round(lit(1.0) - col("docs_quality").cast("double") / col("n_docs"), 6))
          .otherwise(lit(null).cast("double")).as("quality_doc_cut"),
        when(col("docs_quality") > 0,
          round(lit(1.0) - col("docs_image").cast("double") / col("docs_quality"), 6))
          .otherwise(lit(null).cast("double")).as("image_doc_cut"),
        when(col("docs_image") > 0,
          round(lit(1.0) - col("docs_dedup").cast("double") / col("docs_image"), 6))
          .otherwise(lit(null).cast("double")).as("dedup_doc_cut"))
  }

  /** The v4 (FULL-MULTIMODAL) ladder — [[pipelineV3]] with AUDIO and
    * VIDEO keep-canonical cascaded after the image stage, so the ladder
    * dedups every perceptual modality the ingest gate audits
    * ([[graft.streaming.PretrainStream]]'s image/audio/video near-dup
    * flags): a corpus built by this ladder and then policed by the gate
    * applies ONE dedup standard. Same output shape. */
  def pipelineV4(docs: DataFrame, gateWeights: Seq[Double],
                 gateThreshold: Double = 0.2,
                 benchPred: Column = col("source") === "src0",
                 minLineWords: Int = 3, bpMinDf: Long = 3, bpMinLineChars: Int = 10,
                 minLen: Int = 30, budgetTokens: Long = 20000L,
                 windowSize: Long = 2048L): DataFrame =
    build(docs, benchPred, minLineWords, bpMinDf, bpMinLineChars, minLen,
      budgetTokens, windowSize, Some((gateWeights, gateThreshold)),
      imageDedup = true, avDedup = true).packed

  /** [[reportV3]] for the v4 ladder: four more survival columns
    * (post-audio and post-video docs/chars) and the per-modality cut
    * headlines; the text dedup cut reads against the video stage's
    * output — its actual input. */
  def reportV4(docs: DataFrame, gateWeights: Seq[Double],
               gateThreshold: Double = 0.2,
               benchPred: Column = col("source") === "src0",
               minLineWords: Int = 3, bpMinDf: Long = 3, bpMinLineChars: Int = 10,
               minLen: Int = 30, budgetTokens: Long = 20000L,
               windowSize: Long = 2048L): DataFrame = {
    val st = build(docs, benchPred, minLineWords, bpMinDf, bpMinLineChars,
      minLen, budgetTokens, windowSize, Some((gateWeights, gateThreshold)),
      imageDedup = true, avDedup = true)
    st.packed.count()
    val m = st.obs.toMap
    def g(stage: String, key: String): Long = {
      val v = m(stage).get(key)
      if (v == null) 0L else v.asInstanceOf[Number].longValue
    }
    val nBins = {
      val v = m("packed").get("max_bin")
      if (v == null) 0L else v.asInstanceOf[Number].longValue + 1
    }
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((g("input", "n"), g("input", "chars"), g("nfc", "chars"),
        g("c4", "chars"), g("bp", "chars"), g("pii", "chars"),
        g("quality", "n"), g("quality", "chars"),
        g("image", "n"), g("image", "chars"),
        g("audio", "n"), g("audio", "chars"),
        g("video", "n"), g("video", "chars"),
        g("dedup", "n"), g("dedup", "chars"),
        g("decon", "n"), g("decon", "chars"),
        g("sample", "n"), g("sample", "tokens"),
        nBins))
      .toDF("n_docs", "chars_raw", "chars_nfc", "chars_c4", "chars_bp",
        "chars_pii", "docs_quality", "chars_quality",
        "docs_image", "chars_image",
        "docs_audio", "chars_audio",
        "docs_video", "chars_video",
        "docs_dedup", "chars_dedup", "docs_decon", "chars_decon",
        "docs_sampled", "tokens_sampled", "n_bins")
      .select(col("*"),
        when(col("chars_raw") > 0,
          round(lit(1.0) - col("chars_bp").cast("double") / col("chars_raw"), 6))
          .otherwise(lit(null).cast("double")).as("scrub_char_cut"),
        when(col("n_docs") > 0,
          round(lit(1.0) - col("docs_quality").cast("double") / col("n_docs"), 6))
          .otherwise(lit(null).cast("double")).as("quality_doc_cut"),
        when(col("docs_quality") > 0,
          round(lit(1.0) - col("docs_image").cast("double") / col("docs_quality"), 6))
          .otherwise(lit(null).cast("double")).as("image_doc_cut"),
        when(col("docs_image") > 0,
          round(lit(1.0) - col("docs_audio").cast("double") / col("docs_image"), 6))
          .otherwise(lit(null).cast("double")).as("audio_doc_cut"),
        when(col("docs_audio") > 0,
          round(lit(1.0) - col("docs_video").cast("double") / col("docs_audio"), 6))
          .otherwise(lit(null).cast("double")).as("video_doc_cut"),
        when(col("docs_video") > 0,
          round(lit(1.0) - col("docs_dedup").cast("double") / col("docs_video"), 6))
          .otherwise(lit(null).cast("double")).as("dedup_doc_cut"))
  }
}
