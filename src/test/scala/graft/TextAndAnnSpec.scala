package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis
import graft.similarity.Ann
import graft.multimodal.Multimodal

class TextAndAnnSpec extends SparkSpec {

  test("token stats: whitespace vs bpe-ish counts") {
    import spark.implicits._
    val r = Seq((1L, "Hello, world! x2")).toDF("doc_id", "text")
      .select(TextAnalysis.wsTokenCount(col("text")).as("ws"),
        TextAnalysis.bpeTokenCount(col("text")).as("bpe"))
      .collect().head
    assert(r.getLong(0) == 3L)
    // Hello , world ! x 2 -> 6
    assert(r.getLong(1) == 6L)
  }

  test("quality: ratios and bounded score") {
    import spark.implicits._
    val q = Seq((1L, "the cat!!! sat")).toDF("doc_id", "text")
      .select(TextAnalysis.quality(col("text")).as("q")).select("q.*").collect().head
    assert(q.getAs[Long]("n_tokens") == 3L)
    assert(q.getAs[Double]("punct_ratio") > 0 && q.getAs[Double]("punct_ratio") < 1)
    assert(q.getAs[Double]("stop_ratio") > 0.33 && q.getAs[Double]("stop_ratio") < 0.34)
    val s = q.getAs[Double]("quality")
    assert(s > 0 && s < 1)
  }

  test("fingerprint is invariant to token order and duplication") {
    import spark.implicits._
    val fps = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha alpha"), (3L, "alpha beta delta"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("trained langid recovers planted classes; ties break to smallest class; serve equals rebuild") {
    import spark.implicits._
    import graft.text.LangIdClassifier
    // three classes with disjoint bigram alphabets; doc_id % 4 == 0 rows
    // are the training sample, the rest are held out
    def doc(i: Long, s: String) = (i, s * 10, s match {
      case "ax " => "aa"; case "bx " => "bb"; case _ => "cc"
    })
    val rows = (0L until 24L).map(i => doc(i, Seq("ax ", "bx ", "cx ")((i % 3).toInt))) :+
      ((100L, "", "aa")) // empty text: zero bigrams -> pure prior argmax
    val docs = rows.toDF("doc_id", "text", "lang")
    val m = LangIdClassifier.train(docs, vocabSize = 16)
    assert(m.classes == Seq("aa", "bb", "cc"))
    val pred = LangIdClassifier.predictWith(docs, m).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 24L).foreach { i =>
      val want = Seq("aa", "bb", "cc")((i % 3).toInt)
      assert(pred(i) == want, s"doc $i: got ${pred(i)}, want $want")
    }
    // empty text scores priors only; 'aa' has the extra empty-text train
    // doc (doc 100 itself is % 4 == 0) so its prior wins — and on exact
    // prior ties the struct-min breaks to the smallest class name
    assert(pred(100L) == "aa")
    // confusion table is the exact contingency of the per-doc argmax
    val conf = LangIdClassifier.confusionWith(docs, m).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf(("aa", "aa")) == 9L && conf(("bb", "bb")) == 8L && conf(("cc", "cc")) == 8L)
    // persisted model round-trips exactly and serves identical predictions
    val dir = java.nio.file.Files.createTempDirectory("graft-langid-model").toString
    LangIdClassifier.writeModel(m, dir, spark)
    val served = LangIdClassifier.readModel(spark, dir)
    assert(served == m, "persisted model must round-trip bit-exactly (integer weights)")
    val predServed = LangIdClassifier.predictWith(docs, served).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(predServed == pred)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("trained langid: grid collect is bounded to classes × vocab; eval plan joins nothing") {
    import spark.implicits._
    import graft.text.LangIdClassifier
    // A corpus whose distinct char-bigram space far exceeds the vocab cap
    // (every doc contributes unique bigrams) — the CJK-crawl shape where
    // a raw collect of the count grid would pull the whole space to the
    // driver. The guarded collect must stay ≤ classes × vocabSize rows.
    val docs = (0L until 40L).map { i =>
      (i, s"u${i}q${i}z${i} shared shared shared", if (i % 2 == 0) "aa" else "bb")
    }.toDF("doc_id", "text", "lang")
    val vocabSize = 8
    val sample = docs.filter(pmod(col("doc_id"), lit(4L)) === 0)
      .select(col("lang"), LangIdClassifier.bigramsCol(col("text")).as("bgs"))
    val counts = sample.select(col("lang"), explode(col("bgs")).as("b"))
      .groupBy("lang", "b").agg(count(lit(1)).as("n"))
    val vocab = counts.groupBy("b").agg(sum(col("n")).as("tot"))
      .orderBy(col("tot").desc, col("b").asc).limit(vocabSize)
      .collect().map(_.getString(0)).toSeq
    val nClasses = docs.select("lang").distinct().count()
    assert(counts.count() > nClasses * vocabSize,
      "fixture must have an oversized distinct-bigram space or the bound proves nothing")
    val grid = LangIdClassifier.collectVocabGrid(counts, vocab)
    assert(grid.length <= nClasses * vocabSize,
      s"collected ${grid.length} rows; driver bound is ${nClasses * vocabSize}")
    val vset = vocab.toSet
    assert(grid.forall { case ((_, b), _) => vset(b) })
    // The eval (confusion) is ONE narrow projection + one aggregate:
    // the label rides predictWith's own select, so the physical plan
    // must contain no join of any kind.
    val m = LangIdClassifier.train(docs, vocabSize = vocabSize)
    val plan = LangIdClassifier.confusionWith(docs, m)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"confusion eval must not join — the label is carried by the projection:\n$plan")
  }

  test("codegen'd langid scorer matches the bigram-fold semantics, astral code points included") {
    import spark.implicits._
    import graft.text.LangIdClassifier
    // Texts with surrogate pairs: Spark's substr counts CODE POINTS, so
    // "a😀b" yields bigrams ("a😀", "😀b") — the packed scorer's
    // codePointAt walk must agree or astral-heavy corpora (emoji, CJK
    // extension planes) silently mis-score. Mixed scripts + empty text
    // cover the prior-only path.
    val docs = Seq(
      (1L, "a😀b😀a", "xx"),
      (2L, "ααββ中文", "yy"),
      (3L, "", "xx"),
      (4L, "a😀b plain tail", "yy")).toDF("doc_id", "text", "lang")
    val m = LangIdClassifier.train(docs, vocabSize = 8, trainMod = 1)
    val got = LangIdClassifier.predictWith(docs, m).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // reference: the fold recomputed driver-side from bigramsCol's own
    // output (Spark substr semantics), per-class integer sums, first-max
    val bgs = docs.select(col("doc_id"), LangIdClassifier.bigramsCol(col("text")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for ((id, bl) <- bgs) {
      val scores = m.classes.map(c =>
        c -> (m.priors(c) + bl.map(b => m.weights(c).getOrElse(b, 0L)).sum))
      // argmax with ties to the smallest class (classes are sorted asc
      // and the engine takes the FIRST max)
      val expect = scores.filter(_._2 == scores.map(_._2).max).minBy(_._1)
      assert(got(id) == expect,
        s"doc $id: expression gave ${got(id)}, fold reference gives $expect (raw $scores)")
    }
  }

  test("langid is deterministic and respects profile-order tie-break") {
    import spark.implicits._
    // empty text -> all scores 0 -> first profile lang (de) wins the tie
    val r = Seq((1L, "zzz qqq"), (2L, "this thing weighs everything"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.predictedLang(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r(1L) == "de")  // no signature hits anywhere -> tie -> profile order
    assert(r(2L) == "en")  // th/ing-heavy
  }

  test("rolling hash: order-sensitive, matches scalar reference, codegen == interpreted") {
    import spark.implicits._
    import graft.functions.RollingHash
    def scalar(s: String): Long = s.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    val rows = Seq((1L, "ab"), (2L, "ba"), (3L, ""), (4L, "the quick brown fox"))
    val got = rows.toDF("doc_id", "text")
      .select(col("doc_id"), RollingHash.rollingHash(col("text")).as("rh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, s) => assert(got(id) == scalar(s), s) }
    assert(got(1L) != got(2L), "order-sensitive")
    assert(got(3L) == 0L)
  }

  test("vocab coverage is monotone, correctly ranked, and totals 1.0 when k covers the vocab") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa aa bb bb cc", "en"),
      (2L, "aa bb dd", "en")
    ).toDF("doc_id", "text", "lang")
    val rows = graft.text.TextAnalysis.vocabCoverage(docs, k = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // counts: aa=4, bb=3, cc=1, dd=1 (tie broken by token asc)
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1L, "aa", 4L), (2L, "bb", 3L), (3L, "cc", 1L), (4L, "dd", 1L)))
    val cov = rows.map(_._4)
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b }, "coverage must be monotone")
    assert(cov.last == 1.0, s"k >= vocab must cover everything, got ${cov.last}")
    assert(cov.head == math.round(4.0 / 9.0 * 1e6) / 1e6)
  }

  test("perplexity buckets split on the corpus's own terciles, head above tail") {
    import spark.implicits._
    // 9 docs over a shared bigram model; repeated common phrases score
    // higher (more probable bigrams) than one-off word salads
    val docs = (1L to 6L).map(i => (i, "the cat sat on the mat and the cat ran", "en")) ++
      Seq((7L, "zeta quark lattice morphism groupoid sheaf", "en"),
          (8L, "banana piano thunder velvet crayon orbit", "en"),
          (9L, "the cat sat on the mat and the cat ran", "en"))
    val b = graft.text.TextAnalysis.perplexityBuckets(docs.toDF("doc_id", "text", "lang"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(b.size == 9, "every doc with bigrams gets a bucket")
    val byBucket = b.values.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    // ordering: every head score >= every middle score >= every tail score
    for (h <- byBucket.getOrElse("head", Nil); m <- byBucket.getOrElse("middle", Nil))
      assert(h >= m, s"head $h < middle $m")
    for (m <- byBucket.getOrElse("middle", Nil); t <- byBucket.getOrElse("tail", Nil))
      assert(m >= t, s"middle $m < tail $t")
    // the common-phrase clones sit in head, the word salads in tail
    assert(b(1L)._2 == "head" && b(7L)._2 != "head" && b(8L)._2 != "head", s"got $b")
  }

  test("bpe pair counts weight by word frequency and count within-word repeats") {
    import spark.implicits._
    // vocab: abab (wc 2 across docs), ab (wc 3), cd (wc 1)
    val docs = Seq(
      (1L, "abab ab ab"),
      (2L, "abab ab cd")
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.bpePairCounts(docs, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ab: 2 per "abab" occurrence (positions 1,3) x2 + 1 per "ab" x3 = 7
    // ba: 1 per "abab" x2 = 2; cd: 1
    assert(pairs == Map("ab" -> 7L, "ba" -> 2L, "cd" -> 1L), s"got $pairs")
  }

  test("bpe training learns the expected merges in order") {
    import spark.implicits._
    val docs = Seq((1L, "abab ab ab"), (2L, "abab ab cd")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, numMerges = 3)
    // iteration 1: (a,b) wc 7 -> "ab". After merging, "abab" -> [ab, ab],
    // "ab" -> [ab]; iteration 2: (ab,ab) wc 2 -> "abab"; iteration 3:
    // (c,d) wc 1 is the only pair left
    assert(merges == Seq(("a", "b"), ("ab", "ab"), ("c", "d")), s"got $merges")
  }

  test("bpe encode is greedy by rank, leftmost on ties, non-overlapping") {
    val rank = new java.util.HashMap[String, Integer]()
    rank.put("a b", 0); rank.put("ab ab", 1); rank.put("c d", 2)
    def enc(w: String) = graft.functions.BpeEncode.encode(w, rank)
      .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(enc("ababab") == Seq("abab", "ab")) // rank 0 thrice, then rank 1 leftmost
    assert(enc("abcd") == Seq("ab", "cd"))
    assert(enc("xyz") == Seq("x", "y", "z"))   // nothing applicable
    assert(enc("a") == Seq("a"))
    // "aaa" with (a,a) unknown: untouched even though chars repeat
    assert(enc("aaa") == Seq("a", "a", "a"))
  }

  test("tokenize_bpe counts: real subword totals per doc, words compressed by the table") {
    import spark.implicits._
    val docs = Seq((1L, "abab ab ab"), (2L, "abab ab cd")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenizeBpe(docs, numMerges = 3).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // after 3 merges: abab -> 1 symbol, ab -> 1, cd -> 1
    assert(r == Map(1L -> ((3L, 3L)), 2L -> ((3L, 3L))), s"got $r")
    // zero merges: every word splits to chars
    val r0 = TextAnalysis.tokenizeBpe(docs, numMerges = 0).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r0 == Map(1L -> 8L, 2L -> 8L), s"got $r0") // 4+2+2 and 4+2+2 chars
  }

  test("lang confusion table conserves doc counts and agrees with the per-doc argmax") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the thing that sang this morning", "en"),
      (2L, "le chou et le loup sous les nuages", "fr"),
      (3L, "der reiche eichenwald bei der kirche", "de"),
      (4L, "los osos en la colina del este", "es")
    ).toDF("doc_id", "text", "lang")
    val conf = TextAnalysis.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf.values.sum == 4L, s"counts must conserve docs: $conf")
    // cross-check each cell against the per-doc argmax
    val perDoc = docs.select(col("lang"), TextAnalysis.predictedLang(col("text")).as("p"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(conf == perDoc, s"confusion cells must equal grouped argmax: $conf vs $perDoc")
  }

  test("gopher rules: each signal fires on its adversarial doc, clean prose passes") {
    import spark.implicits._
    val prose = (("the quick brown fox jumps over that lazy dog and friends " * 5) +
      "be to of have with great energy every single morning run").trim
    val docs = Seq(
      (1L, prose),                                       // passes everything
      (2L, "short text"),                                // word-count floor
      (3L, "- one\n- two\n- three\n- four"),             // bullet lines
      (4L, "a b...\nc d...\ne f..."),                    // ellipsis line ends
      (5L, "# # # # the of and")                         // symbol ratio
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("pass_gopher"), s"prose should pass: ${r(1L)}")
    assert(r(1L).getAs[Long]("n_req_stops") >= 2)
    assert(!r(2L).getAs[Boolean]("pass_gopher") && r(2L).getAs[Long]("n_words") == 2)
    assert(r(3L).getAs[Double]("bullet_frac") == 1.0)
    assert(r(4L).getAs[Double]("ellipsis_frac") == 1.0)
    assert(r(5L).getAs[Double]("symbol_ratio") > 0.1 && !r(5L).getAs[Boolean]("pass_gopher"))
    // mean word length is the length-weighted mean of whitespace words
    assert(r(2L).getAs[Double]("mean_word_len") == 4.5) // "short"(5) "text"(4)
  }

  test("c4 rules: line retention, sentence gate, page tells; scrub rewrite") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Good line one is here.\nshort line\nAnother good line stays!\nThis has javascript in it.\nNo terminal punct here"),
      (2L, "lorem ipsum dolor sit amet.\nA perfectly fine line here."),
      (3L, "code { return; }\nA fine line is here."),
      (4L, "One. Two! Three? Four. Five sentences in one line, really."),
      (5L, "nothing here")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.c4Rules(docs)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    // doc1: terminal-punct keeps lines 1+3; the javascript line and the
    // punct-less lines drop; only 2 sentences -> fails the >=5 gate
    assert(r(1L).getAs[Long]("n_lines") == 5 && r(1L).getAs[Long]("n_kept") == 2)
    assert(r(1L).getAs[Long]("n_sentences") == 2 && !r(1L).getAs[Boolean]("pass_c4"))
    assert(r(2L).getAs[Boolean]("has_lorem") && !r(2L).getAs[Boolean]("pass_c4"))
    assert(r(3L).getAs[Boolean]("has_brace") && r(3L).getAs[Long]("n_kept") == 1)
    // doc4: one kept line carrying 3 periods + 1 bang + 1 question = 5
    assert(r(4L).getAs[Long]("n_sentences") == 5 && r(4L).getAs[Boolean]("pass_c4"))
    // doc5: nothing survives -> zero counts, empty rewrite (not NULL)
    assert(r(5L).getAs[Long]("n_kept") == 0 && r(5L).getAs[Long]("n_sentences") == 0)
    val s = TextAnalysis.scrubC4Lines(docs)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("clean_text")).toMap
    assert(s(1L) == "Good line one is here.\nAnother good line stays!")
    assert(s(5L) == "")
  }

  test("tokenizer eval: totals equal the per-doc tokenizers' sums; ratios derive exactly") {
    import spark.implicits._
    val docs = graft.collocations.Collocations.documents(spark, "/root/testdata/sf0.001")
    val merges = TextAnalysis.bpeTrain(docs, numMerges = 8)
    val pieces = TextAnalysis.unigramTrain(docs, vocabSize = 60)
    val r = TextAnalysis.tokenizerEval(docs, merges, pieces).collect()
    assert(r.length == 1)
    val row = r.head
    val (nw, nc, nb, nu) = (row.getAs[Long]("n_words"), row.getAs[Long]("n_chars"),
      row.getAs[Long]("n_bpe_tokens"), row.getAs[Long]("n_unigram_tokens"))
    // totals must equal the per-doc serve paths' own sums
    val b = TextAnalysis.tokenizeBpeWith(docs, merges)
      .agg(sum("n_words"), sum("n_bpe_tokens")).collect().head
    assert(b.getLong(0) == nw && b.getLong(1) == nb)
    val u = TextAnalysis.tokenizeUnigramWith(docs, pieces)
      .agg(sum("n_unigram_tokens")).collect().head
    assert(u.getLong(0) == nu)
    // every ratio derives from the same integer totals
    def r6(x: Double) = // Spark round() semantics: HALF_UP on the decimal
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("chars_per_word") == r6(nc.toDouble / nw))
    assert(row.getAs[Double]("bpe_per_word") == r6(nb.toDouble / nw))
    assert(row.getAs[Double]("pieces_per_word") == r6(nu.toDouble / nw))
    assert(row.getAs[Double]("chars_per_bpe_token") == r6(nc.toDouble / nb))
    assert(row.getAs[Double]("chars_per_piece") == r6(nc.toDouble / nu))
    // sanity: merging compresses (BPE tokens <= chars) and both
    // tokenizers segment every word into >= 1 piece
    assert(nb <= nc && nb >= nw && nu >= nw)
  }

  test("mix token budget: sqrt allocation, epoch arithmetic, repeat cap") {
    import spark.implicits._
    // sqrt(160) = 4*sqrt(10), so p = 4/5 vs 1/5 EXACTLY — every number
    // below is hand-checkable integer arithmetic
    val docs = Seq(
      (1L, ("w " * 160).trim, "a_big"),
      (2L, ("w " * 10).trim, "b_small")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.mixTokenBudget(docs, budgetTokens = 400L)
      .collect().map(x => x.getAs[String]("source") -> x).toMap
    val b = r("a_big"); val s = r("b_small")
    assert(b.getAs[Long]("avail_tokens") == 160 && s.getAs[Long]("avail_tokens") == 10)
    assert(b.getAs[Double]("p_alpha") == 0.8 && s.getAs[Double]("p_alpha") == 0.2)
    // big: 320 of 400, 2 epochs, under the 4-epoch cap
    assert(b.getAs[Long]("target_tokens") == 320 && b.getAs[Double]("epochs") == 2.0)
    assert(!b.getAs[Boolean]("over_cap") && b.getAs[Long]("alloc_tokens") == 320)
    // small: 80 target over 10 available = 8 epochs -> capped at 4*10
    assert(s.getAs[Long]("target_tokens") == 80 && s.getAs[Double]("epochs") == 8.0)
    assert(s.getAs[Boolean]("over_cap") && s.getAs[Long]("alloc_tokens") == 40)
  }

  test("sample token budget: prefix fits the allocation, content-deterministic across partitionings") {
    val docs = graft.collocations.Collocations.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.sampleTokenBudget(docs, budgetTokens = 1000L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val alloc = TextAnalysis.mixTokenBudget(docs, budgetTokens = 1000L).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("alloc_tokens"), r.getAs[Long]("n_docs"))).toMap
    val bySrc = out.groupBy(_._2)
    bySrc.foreach { case (src, rows) =>
      // the inclusive running total never exceeds the source's grant, and
      // the max cum equals the kept token sum (the two-level cumsum is
      // internally consistent)
      assert(rows.map(_._4).max <= alloc(src)._1, s"$src overdrawn")
      assert(rows.map(_._4).max == rows.map(_._3).sum, s"$src cumsum inconsistent")
    }
    // the budget is far below availability: every source is cut mid-corpus
    assert(bySrc.forall { case (src, rows) => rows.length < alloc(src)._2 },
      "a 1000-token budget must cut every source")
    // content-keyed order: the selected SET is partitioning-independent
    val out2 = TextAnalysis.sampleTokenBudget(docs.repartition(7), budgetTokens = 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == out2.toSet, "sample must be a pure function of content")
  }

  test("html extraction: blocks drop whole, entities decode in order, whitespace collapses") {
    import spark.implicits._
    val cases = Seq(
      // markup inside a script STRING vanishes with its block; code `<` too
      (1L, "<body><script>var t = \"<p>leak</p>\"; if (1 < 2) {}</script><p>Real text.</p></body>",
        "Real text."),
      // style + multi-line comment + tag-as-space word separation
      (2L, "<style>p{color:red}</style><h1>Title</h1><!-- x\ny --><p>Body</p>", "Title Body"),
      // entity order: &amp;lt; is the LITERAL string "&lt;", not a tag
      (3L, "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f &amp;lt; &amp; g</p>",
        "a <b> \"c\" 'd' e f &lt; & g"),
      // two script blocks: lazy matching removes each, not the span between
      (4L, "<script>a</script>keep<script>b</script>", "keep"),
      // whitespace runs and tag boundaries collapse to single spaces
      (5L, "<div>x</div>\n\n   <div>y</div>", "x y"),
      // real crawls shout: mixed-case block tags must drop whole too
      (6L, "<SCRIPT>var leak = 1;</SCRIPT><Style>p{}</STYLE><p>ok</p>", "ok")
    ).toDF("doc_id", "html", "want")
    val got = cases.select(col("doc_id"), col("want"),
        TextAnalysis.extractHtmlText(col("html")).as("got")).collect()
    got.foreach(r => assert(r.getString(2) == r.getString(1),
      s"doc ${r.getLong(0)}: '${r.getString(2)}' != '${r.getString(1)}'"))
  }

  test("boilerplate lines: cross-doc frequency detection and byte-preserving scrub") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The Banner Line Here\nunique body one\nok"),
      (2L, "The Banner Line Here\nunique body two is longer\nok"),
      (3L, "  The Banner Line Here  \nunique body three\nFooter Line Repeats\nok"),
      (4L, "Footer Line Repeats\nunique body four")
    ).toDF("doc_id", "text")
    // detection keys on the TRIMMED form (doc 3's padded banner counts);
    // "ok" repeats in 3 docs but sits under the 10-char floor
    val bp = TextAnalysis.boilerplateLines(docs, minDf = 2, minLineChars = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bp == Map("The Banner Line Here" -> 3L, "Footer Line Repeats" -> 2L), s"$bp")
    val s = TextAnalysis.scrubBoilerplateLines(docs, minDf = 2, minLineChars = 10)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(s(1L) == (("unique body one\nok", 3L, 2L)))
    assert(s(2L) == (("unique body two is longer\nok", 3L, 2L)))
    // the padded banner was REMOVED via its trimmed form; survivors keep
    // their original bytes and order
    assert(s(3L) == (("unique body three\nok", 4L, 2L)))
    assert(s(4L) == (("unique body four", 2L, 1L)))
  }

  test("dsir importance weights separate target-like from raw-like docs") {
    import spark.implicits._
    // target slice speaks 'alpha beta'; raw background speaks 'zeta eta'.
    // A raw doc written in target vocabulary must score positive; one in
    // background vocabulary must score negative.
    val target = (1L to 20L).map(i => (i, "alpha beta alpha beta gamma", "en"))
    val raw = (21L to 40L).map(i => (i, "zeta eta zeta eta theta", "de"))
    val probes = Seq((100L, "alpha beta gamma alpha", "de"), (101L, "zeta eta theta zeta", "de"))
    val docs = (target ++ raw ++ probes).toDF("doc_id", "text", "lang")
    val w = graft.pipelines.Dsir.importanceWeights(docs, col("lang") === "en")
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(w(100L).getAs[Double]("avg_logratio") > 0 && w(100L).getAs[Boolean]("selected"),
      s"target-vocab probe should be selected: ${w(100L)}")
    assert(w(101L).getAs[Double]("avg_logratio") < 0 && !w(101L).getAs[Boolean]("selected"),
      s"background-vocab probe should be rejected: ${w(101L)}")
    // row-preserving: every corpus doc comes back exactly once
    assert(w.size == docs.count())
  }

  test("token entropy: uniform maxes at ln(distinct), constant is 0, empty docs survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb aa bb", "en"),        // two tokens, uniform -> ln 2
      (2L, "aa aa aa aa", "en"),        // one token -> 0
      (3L, "aa bb cc dd", "en"),        // four tokens, uniform -> ln 4
      (4L, "aa aa aa bb", "en"),        // skewed: ln 4 - (3 ln 3)/4
      (5L, "?!", "en")                  // cleans to zero tokens -> 0, row kept
    ).toDF("doc_id", "text", "lang")
    val got = graft.text.TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def r6(x: Double): Double = math.round(x * 1e6) / 1e6
    assert(got(1L) == ((4L, 2L, r6(math.log(2)))))
    assert(got(2L) == ((4L, 1L, 0.0)))
    assert(got(3L) == ((4L, 4L, r6(math.log(4)))))
    assert(got(4L) == ((4L, 2L, r6(math.log(4) - 3 * math.log(3) / 4))))
    assert(got(5L) == ((0L, 0L, 0.0)))
    // the quality ordering the signal exists for: skewed < uniform at
    // equal length, and wider uniform vocab > narrower
    assert(got(4L)._3 < got(1L)._3 && got(1L)._3 < got(3L)._3)
  }

  test("bm25 ranks by tf with length normalization and rewards rarer terms") {
    import graft.text.TextAnalysis
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark", "en"),            // high tf, short doc
      (2L, "spark " + Seq.fill(50)("filler").mkString(" "), "en"), // one hit, long doc
      (3L, "merge merge", "en"),                  // rare term (df=1)
      (4L, "nothing relevant here", "en")
    ).toDF("doc_id", "text", "lang")
    val top = TextAnalysis.bm25TopK(docs, query = Seq("spark", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.map(_._1).toSet == Set(1L, 2L, 3L), "no-hit docs must not appear")
    val score = top.toMap
    assert(score(1L) > score(2L), "same term: higher tf in a shorter doc must score higher")
    // doc 3's term is rarer (df=1 vs df=2) AND doc 3 is short: it must
    // beat the long single-hit doc 2
    assert(score(3L) > score(2L))
    // BM25 saturates: tripling tf must score below 3x the single-hit part
    // of an equal-length doc; check via the closed form at k1=1.2, b=0.75
    val n = 4.0; val avgdl = (3 + 51 + 2 + 3) / 4.0
    def idf(df: Double) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def part(tf: Double, dl: Double, df: Double) =
      idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert(math.abs(score(1L) - math.round(part(3, 3, 2) * 1e6) / 1e6) < 1e-9,
      s"doc 1 must match the closed form: ${score(1L)} vs ${part(3, 3, 2)}")
    assert(math.abs(score(3L) - math.round(part(2, 2, 1) * 1e6) / 1e6) < 1e-9)
  }

  test("brute-force ANN returns the true nearest neighbor with ties broken by id") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Ann.bruteForceTopK(emb, stride = 4, k = 3).collect()  // queries: vec_id 0
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(top.map(_._2).toSeq == Seq(1L, 2L, 3L))
    assert(top.head._3 > 0.99)
  }

  test("bucketed ANN only searches within the sign bucket") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 1.0f)),
      (1L, Array(0.9f, 0.8f)),    // same bucket "11"
      (2L, Array(-1.0f, 1.0f))    // different bucket
    ).toDF("vec_id", "embedding")
    val top = Ann.bucketedTopK(emb, stride = 3, k = 5, bits = 2).collect()
    assert(top.map(_.getLong(2)).toSet == Set(1L), "bucket must exclude vec 2")
  }

  test("multi-probe recall >= single-bucket recall against brute-force truth") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth  = pairs(Ann.bruteForceTopK(emb, stride = 100, k = 5))
    val single = pairs(Ann.bucketedTopK(emb, stride = 100, k = 5, bits = 6))
    val multi  = pairs(Ann.multiProbeTopK(emb, stride = 100, k = 5, bits = 6))
    val recallS = (single intersect truth).size.toDouble / truth.size
    val recallM = (multi intersect truth).size.toDouble / truth.size
    assert(recallM >= recallS, s"multi-probe recall $recallM < single $recallS")
    // absolute recall is data-dependent: these are RANDOM 64-dim vectors,
    // so true top-5 neighbors are barely above the cosine noise floor and
    // any bucketing loses most of them; monotonicity is the real property
    assert(recallM > 0.1, s"multi-probe recall unexpectedly low: $recallM")
  }

  test("knn join gives every probed vector neighbors and agrees with multiProbe on the strided subset") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val knn = Ann.knnJoin(emb, k = 5, bits = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // all-pairs: (almost) every vector is a query — not just the stride
    val qids = knn.map(_._1).toSet
    assert(qids.size > 400, s"expected most of the 500 vectors as queries, got ${qids.size}")
    assert(knn.groupBy(_._1).values.forall(_.length <= 5))
    // on the strided queries, knnJoin is EXACTLY multiProbeTopK: same
    // buckets, same probes, same scoring, same ranking
    val multi = Ann.multiProbeTopK(emb, stride = 100, k = 5, bits = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val knnStrided = knn.filter(_._1 % 100 == 0).toSet
    assert(knnStrided == multi, "knnJoin must reduce to multiProbeTopK on the strided subset")
    // and the self-join must never pair a vector with itself
    assert(knn.forall { case (q, n, _) => q != n })
  }

  test("salted knn join is row-identical to the plain form, including on a one-bucket corpus") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(Ann.knnJoinSalted(emb)) == rows(Ann.knnJoin(emb)))
    // adversarial skew: all-positive vectors collapse every sign bucket
    // to "111111" — the exact hot-bucket case the salting exists for
    val hot = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => 0.1f + 0.01f * ((i + d) % 7))))
      .toDF("vec_id", "embedding")
    val plain = rows(Ann.knnJoin(hot, k = 3, bits = 4))
    assert(plain.nonEmpty && rows(Ann.knnJoinSalted(hot, k = 3, bits = 4, salts = 5)) == plain)
  }

  test("ivf recovers brute-force neighbors on clustered data") {
    import spark.implicits._
    // 40 vectors in 4 tight clusters around orthogonal axes, interleaved
    // ids so the first-nCells init sees one vector per cluster
    val emb = (0 until 40).map { i =>
      val cluster = i % 4
      val v = Array.fill(64)(0.0f)
      v(cluster * 10) = 1.0f
      v(cluster * 10 + 1) = 0.05f * (i / 4)   // small in-cluster spread
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val brute = graft.similarity.Ann.bruteForceTopK(emb, stride = 10, k = 3).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivf = graft.similarity.Ann.ivfTopK(emb, stride = 10, k = 3,
      nCells = 4, iters = 2, probes = 1).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(ivf.keySet == brute.keySet)
    brute.foreach { case (q, bs) =>
      val overlap = (bs intersect ivf(q)).size
      assert(overlap >= 2, s"query $q: ivf ${ivf(q)} vs brute $bs")
    }
    // sampled training (the 100 TB shape): stride 3 is coprime with the
    // id%4 cluster layout, so the sample still sees every cluster — recall
    // must hold with centroids trained on a third of the vectors
    val sampled = graft.similarity.Ann.ivfTopK(emb, stride = 10, k = 3,
      nCells = 4, iters = 2, probes = 1, trainStride = 3).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(sampled.keySet == brute.keySet)
    brute.foreach { case (q, bs) =>
      assert((bs intersect sampled(q)).size >= 2,
        s"query $q (sampled training): ivf ${sampled(q)} vs brute $bs")
    }
  }

  test("recallEval reports perfect recall at probes=nCells and bounded counts below it") {
    import spark.implicits._
    val emb = (0 until 40).map { i =>
      val cluster = i % 4
      val v = Array.fill(64)(0.0f)
      v(cluster * 10) = 1.0f
      v(cluster * 10 + 1) = 0.05f * (i / 4)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    // probing every cell IS brute force: recall must read exactly 1.0
    // and the mean-cos gap must vanish
    val full = graft.similarity.Ann.recallEval(emb, stride = 10, k = 3,
      nCells = 4, iters = 2, probes = 4).collect().head
    assert(full.getLong(0) > 0)
    assert(full.getLong(0) == full.getLong(1) && full.getLong(1) == full.getLong(2),
      s"probes=nCells must match truth exactly: $full")
    assert(full.getDouble(3) == 1.0, s"recall: $full")
    assert(full.getDouble(4) == full.getDouble(5), s"mean-cos gap at full probes: $full")
    // one probe on 4 tight clusters: hits bounded by both sides, recall
    // in (0, 1], and — because every probed cell holds >= k candidates
    // here, so both sides carry exactly k rows per query — the
    // cell-restricted approx mean cos can never exceed the truth mean
    val one = graft.similarity.Ann.recallEval(emb, stride = 10, k = 3,
      nCells = 4, iters = 2, probes = 1).collect().head
    assert(one.getLong(2) <= math.min(one.getLong(0), one.getLong(1)), s"$one")
    assert(one.getDouble(3) > 0.0 && one.getDouble(3) <= 1.0, s"$one")
    assert(one.getLong(0) == one.getLong(1), s"per-query counts diverged: $one")
    assert(one.getDouble(5) <= one.getDouble(4) + 1e-9,
      s"approx mean cos above truth mean: $one")
    // the run stashes its OWN model slot and the oracle map serves it
    assert(graft.similarity.Ann.lastRecallEvalModel.isDefined)
    val sql = OracleSqlExt.annRecallEvalSqlFromModel.get
    assert(sql.contains("n_truth") && sql.contains("FULL JOIN"), sql)
    assert(SparkEntry.oracleSql.get("ann_recall_eval").contains(sql))
  }

  test("running ivfTopK stashes the trained model and yields a centroid-literal oracle") {
    import spark.implicits._
    val emb = (0 until 40).map { i =>
      val v = Array.fill(64)(0.0f); v((i % 4) * 10) = 1.0f; (i.toLong, v)
    }.toDF("vec_id", "embedding")
    graft.similarity.Ann.ivfTopK(emb, stride = 10, k = 3, nCells = 4, iters = 1, probes = 2).count()
    val model = graft.similarity.Ann.lastIvfModel
    assert(model.isDefined)
    val (cents, stride, k, probes) = model.get
    assert(cents.length == 4 && stride == 10 && k == 3 && probes == 2)
    assert(cents.forall(_._2.length == 64))
    val sql = OracleSqlExt.annIvfSqlFromLastModel.get
    // one literal DOUBLE[] row per trained centroid, and the invocation's
    // own parameters baked into the probes/top-k predicates
    assert("::DOUBLE\\[\\] AS cv".r.findAllIn(sql).size == 4, sql)
    assert(sql.contains("rn <= 2") && sql.contains("rn <= 3") && sql.contains("% 10 = 0"), sql)
    // the oracle map picks the dynamic entry up once the query has run
    assert(SparkEntry.oracleSql.get("ann_ivf_topk").contains(sql))
  }

  test("frame sampling and resize are deterministic offset plumbing") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKL")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(docs, nFrames = 4, frameLen = 8).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toList.sorted
    // len 48, stride 12 -> offsets 1,13,25,37, each frame 8 chars
    assert(frames.map(_._1) == List(1L, 13L, 25L, 37L))
    assert(frames.forall(_._2 == 8L))
    val resized = Multimodal.resize(docs, target = 16).collect().head
    assert(resized.getLong(1) == 16L)  // 48 div 16 = stride 3 -> 16 picks
    // picks are chars at 1,4,7,... -> deterministic hash
    val expected = "adgjmpsvy147ADGJ"
    assert(resized.getLong(2) == graft.functions.RollingHash.compute(expected))
  }

  test("ppm decode parses header fields and pixel checksum from the real bytes") {
    import spark.implicits._
    // doc_id 7 -> width 7%5+2 = 4, height 7%3+2 = 3 -> 36 pixel bytes;
    // "AB" pads with 'x' to 36
    val f = Multimodal.decodePpm(Seq((7L, "AB", "en")).toDF("doc_id", "text", "lang"))
      .collect().head
    assert(f.valid && f.width == 4 && f.height == 3 && f.maxval == 255)
    assert(f.n_pix == 12L)
    assert(f.pix_sum == 65L + 66L + 34L * 'x'.toLong)
    // non-ASCII sanitizes to '?' before entering the pixel plane, keeping
    // byte == codepoint for the oracle's string-function mirror
    val g = Multimodal.decodePpm(Seq((8L, "éA", "fr")).toDF("doc_id", "text", "lang"))
      .collect().head
    assert(g.valid && g.width == 5 && g.height == 4)
    assert(g.pix_sum == '?'.toLong + 65L + (60L - 2L) * 'x'.toLong)
  }

  test("ppm parser reads the actual payload: tampering bytes changes the result") {
    import spark.implicits._
    val payload = Multimodal.withPpmPayload(Seq((7L, "AB", "en")).toDF("doc_id", "text", "lang"))
      .select("payload").collect().head.getAs[Array[Byte]](0)
    val base = Multimodal.parsePpm(7L, payload)
    assert(base.valid && base.pix_sum == 65L + 66L + 34L * 'x'.toLong)
    // flip one pixel byte -> checksum moves by exactly the delta
    val tampered = payload.clone()
    tampered(tampered.length - 1) = 'y'.toByte
    val t = Multimodal.parsePpm(7L, tampered)
    assert(t.valid && t.pix_sum == base.pix_sum + ('y' - 'x'))
    // corrupt the magic -> routed to a valid=false row, not an exception
    val bad = payload.clone(); bad(1) = '5'.toByte
    val b = Multimodal.parsePpm(7L, bad)
    assert(!b.valid && b.width == -1)
    // truncate the pixel plane -> length check fails loudly per record
    val short = java.util.Arrays.copyOf(payload, payload.length - 1)
    assert(!Multimodal.parsePpm(7L, short).valid)
  }

  test("ppm pixel resample applies the nearest-neighbor index map over the decoded plane") {
    import spark.implicits._
    // doc_id 7 -> 4x3 source; "AB" pads with 'x' to 36 pixel bytes. Target
    // 3x2: y'∈{0,1} -> sy∈{0,1}; x'∈{0,1,2} -> sx∈{0,1,2} — so the sample
    // reads pixels (0,0),(0,1),(0,2),(1,0),(1,1),(1,2); only (0,0) holds
    // non-pad bytes [65,66,120]
    val r = Multimodal.resizePpm(Seq((7L, "AB", "en")).toDF("doc_id", "text", "lang"),
      targetW = 3, targetH = 2).collect().head
    assert(r.valid && r.r_w == 3 && r.r_h == 2)
    assert(r.r_sum == 65L + 66L + 120L + 5L * 3L * 120L)
    // the hash is the order-sensitive fold over exactly those bytes
    val expectBytes = Seq(65, 66, 120) ++ Seq.fill(15)(120)
    val expectHash = expectBytes.foldLeft(0L)((a, b) => (a * 31 + b) % 1000000007L)
    assert(r.r_hash == expectHash, s"hash ${r.r_hash} != folded $expectHash")

    // the resample reads the BYTES: tampering a sampled pixel moves the sum
    val payload = Multimodal.withPpmPayload(Seq((7L, "AB", "en")).toDF("doc_id", "text", "lang"))
      .select("payload").collect().head.getAs[Array[Byte]](0)
    val tampered = payload.clone()
    tampered(payload.length - 36) = 'y'.toByte // pixel (0,0) red byte: 'A' -> 'y'
    val t = Multimodal.resamplePpm(7L, tampered, 3, 2)
    assert(t.r_sum == r.r_sum + ('y' - 'A'))
    // a tampered NON-sampled pixel is invisible — the map reads 6 of 12 pixels
    val skipped = payload.clone()
    skipped(payload.length - 1) = 'z'.toByte // pixel (2,3): sy never reaches row 2
    assert(Multimodal.resamplePpm(7L, skipped, 3, 2).r_sum == r.r_sum)
    // malformed payloads route to valid=false, same contract as parsePpm
    val bad = payload.clone(); bad(1) = '5'.toByte
    assert(!Multimodal.resamplePpm(7L, bad, 3, 2).valid)
  }

  test("ppm frame sampling reads evenly-spaced pixel rows from the decoded plane") {
    import spark.implicits._
    // doc_id 7 -> 4x3; nFrames=2 samples rows ⌊0·3/2⌋=0 and ⌊1·3/2⌋=1;
    // row 0 carries [65,66,x*10], row 1 is all pad
    val frames = Multimodal.sampleFramesPpm(Seq((7L, "AB", "en")).toDF("doc_id", "text", "lang"),
      nFrames = 2).collect().sortBy(_.frame_idx)
    assert(frames.length == 2 && frames.forall(_.valid))
    assert(frames.map(_.src_row).toSeq == Seq(0, 1))
    val row0 = Seq(65, 66) ++ Seq.fill(10)(120)
    assert(frames(0).row_sum == row0.map(_.toLong).sum)
    assert(frames(0).row_hash == row0.foldLeft(0L)((a, b) => (a * 31 + b) % 1000000007L))
    assert(frames(1).row_sum == 12L * 120L)
    // malformed payload -> single sentinel row, not an exception
    val bad = "P5garbage".getBytes("US-ASCII")
    val sentinel = Multimodal.framesPpm(9L, bad, 2).toSeq
    assert(sentinel == Seq(Multimodal.PpmFrame(9L, -1, -1, 0L, 0L, valid = false)))
  }

  test("wav decode parses the RIFF header and PCM checksum from the real bytes") {
    import spark.implicits._
    // doc_id 7 -> channels 2, data length 2*((7%41)+4) = 22; "AB" pads to 22
    val payload = Multimodal.withWavPayload(Seq((7L, "AB", "en")).toDF("doc_id", "text", "lang"))
      .select("payload").collect().head.getAs[Array[Byte]](0)
    assert(payload.length == 44 + 22, s"canonical header + data, got ${payload.length}")
    val f = Multimodal.parseWav(7L, payload)
    assert(f.valid && f.channels == 2 && f.sample_rate == 11025 && f.bits == 8)
    assert(f.n_samples == 11L && f.pcm_sum == 65L + 66L + 20L * 'x'.toLong)
    // tamper one PCM byte -> checksum moves by exactly the delta
    val tampered = payload.clone(); tampered(tampered.length - 1) = 'y'.toByte
    assert(Multimodal.parseWav(7L, tampered).pcm_sum == f.pcm_sum + ('y' - 'x'))
    // corrupt the declared data length -> loud per-record invalidation
    val badLen = payload.clone(); badLen(40) = (badLen(40) + 1).toByte
    assert(!Multimodal.parseWav(7L, badLen).valid)
    // corrupt the RIFF magic -> valid=false, not an exception
    val badMagic = payload.clone(); badMagic(0) = 'X'.toByte
    assert(!Multimodal.parseWav(7L, badMagic).valid)
    // inconsistent byte rate (real headers carry redundancy) -> invalid
    val badRate = payload.clone(); badRate(28) = (badRate(28) + 1).toByte
    assert(!Multimodal.parseWav(7L, badRate).valid)
    // all-zero fmt fields satisfy every 0==0 consistency identity
    // (byte rate 0==0, block align 0==0, data length 0==0) and would
    // reach the n_samples division — must route to valid=false, never
    // an ArithmeticException. Build the degenerate header exactly: all
    // magics and sizes valid, channels/rate/bits/align all zero.
    val z = new Array[Byte](44)
    System.arraycopy("RIFF".getBytes("US-ASCII"), 0, z, 0, 4)
    z(4) = 36 // chunk size = file size - 8
    System.arraycopy("WAVE".getBytes("US-ASCII"), 0, z, 8, 4)
    System.arraycopy("fmt ".getBytes("US-ASCII"), 0, z, 12, 4)
    z(16) = 16 // canonical fmt chunk size
    z(20) = 1  // PCM
    System.arraycopy("data".getBytes("US-ASCII"), 0, z, 36, 4)
    assert(!Multimodal.parseWav(7L, z).valid)
  }

  test("payload schema carries binary column + typed metadata") {
    import spark.implicits._
    val df = Multimodal.withPayload(Seq((7L, "xy", "en")).toDF("doc_id", "text", "lang"))
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.select("meta.n_bytes").collect().head.getLong(0) == 2L)
  }

  test("oov rate counts occurrences outside the top-v vocabulary, ties broken by token") {
    import spark.implicits._
    // counts: a=6, b=1, c=1 — at v=2 the tie between b and c resolves to
    // b (token asc), so doc 1's single c is the only OOV occurrence
    val docs = Seq((1L, "a a b c"), (2L, "a a a a")).toDF("doc_id", "text")
    val r = graft.text.TextAnalysis.oovRate(docs, v = 2)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("n_oov"), x.getAs[Double]("oov_rate"))).toMap
    assert(r(1L) == ((4L, 1L, 0.25)), s"doc 1: ${r(1L)}")
    assert(r(2L) == ((4L, 0L, 0.0)), s"doc 2: ${r(2L)}")
  }

  test("zipf fit recovers the exact slope of a synthetic power law") {
    import spark.implicits._
    // counts 16/8/4/2 for tokens a/b/c/d: ln(c) = ln(16) - r'·ln(2) where
    // rank follows 1..4 — not exactly linear in ln(rank), but the OLS on
    // (ln r, ln c) is deterministic; pin direction and fit-quality bounds
    // plus the exact n
    val docs = Seq((1L, ("a " * 16 + "b " * 8 + "c " * 4 + "d " * 2).trim))
      .toDF("doc_id", "text")
    val r = graft.text.TextAnalysis.vocabZipf(docs, k = 10).collect().head
    assert(r.getAs[Long]("n") == 4L)
    val (slope, r2) = (r.getAs[Double]("slope"), r.getAs[Double]("r2"))
    assert(slope < -0.5, s"head-heavy corpus must fit a steep negative slope: $slope")
    assert(r2 > 0.8 && r2 <= 1.0, s"fit quality: $r2")
    // a flat (all-equal-count) vocabulary has zero covariance: slope 0
    val flat = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val f = graft.text.TextAnalysis.vocabZipf(flat, k = 10).collect().head
    assert(f.getAs[Double]("slope") == 0.0, s"flat vocab: ${f.getAs[Double]("slope")}")
  }

  test("hard negatives always cross the cluster boundary and rank below unrestricted neighbors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val hn = graft.similarity.Ann.hardNegatives(emb, stride = 20, k = 3, trainStride = 4)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"), r.getAs[Double]("cos")))
    assert(hn.nonEmpty)
    // recompute assignments through the same stashed model and check
    // every returned pair crosses the boundary
    val (cents, _, _, _) = graft.similarity.Ann.lastHardNegModel.get
    val assign = emb.select(col("vec_id"),
        graft.similarity.Ann.ivfCell(col("embedding").cast("array<double>"), cents).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    hn.foreach { case (q, n, _) =>
      assert(assign(q) != assign(n), s"pair ($q, $n) shares cluster ${assign(q)}")
    }
    // a cross-cluster top-1 can never beat the unrestricted top-1
    val unrestricted = graft.similarity.Ann.multiProbeTopK(emb, stride = 20, k = 1)
      .collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Double]("cos")).toMap
    val hardTop = hn.groupBy(_._1).map { case (q, rows) => q -> rows.map(_._3).max }
    hardTop.foreach { case (q, c) =>
      unrestricted.get(q).foreach(u =>
        assert(c <= u, s"query $q: hard-negative cos $c exceeds unrestricted $u"))
    }
  }

  test("diverse batches spread clusters; curriculum chunks concentrate them") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bs = 8
    val div = graft.similarity.Ann.diverseBatches(emb, batchSize = bs, trainStride = 4)
      .collect().map(r => (r.getAs[Long]("batch_id"), r.getAs[Int]("cid"), r.getAs[Long]("pos")))
    // pos is a contiguous permutation; batch chunking follows pos exactly
    assert(div.map(_._3).sorted.toSeq == (1L to div.length).toSeq)
    div.foreach { case (b, _, p) => assert(b == (p - 1) / bs, s"batch must chunk pos: $b $p") }
    def meanDistinctClusters(batches: Map[Long, Array[Int]]): Double = {
      val full = batches.filter(_._2.length == bs)
      full.values.map(_.distinct.length.toDouble).sum / full.size
    }
    val divSpread = meanDistinctClusters(
      div.groupBy(_._1).map { case (b, rows) => b -> rows.map(_._2) })
    // curriculum = same corpus chunked in semantic_sort (cluster-major) order
    val cur = graft.similarity.Ann.semanticSort(emb, trainStride = 4)
      .collect().map(r => ((r.getAs[Long]("pos") - 1) / bs, r.getAs[Int]("cid")))
    val curSpread = meanDistinctClusters(
      cur.groupBy(_._1).map { case (b, rows) => b -> rows.map(_._2) })
    assert(divSpread > 2 * curSpread,
      s"round-robin batches must span far more clusters: diverse $divSpread vs curriculum $curSpread")
    // while every cluster still has unconsumed members, a full batch
    // draws bs DISTINCT clusters — true for the earliest batch
    val first = div.filter(_._1 == 0L).map(_._2)
    assert(first.distinct.length == first.length,
      s"batch 0 must be fully cluster-diverse: ${first.toSeq}")
  }

  test("semantic sort: contiguous global positions, clusters contiguous, most-central first") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = graft.similarity.Ann.semanticSort(emb, trainStride = 4)
      .orderBy("pos").collect()
    assert(rows.nonEmpty)
    // pos is a contiguous 1..n permutation
    assert(rows.map(_.getAs[Long]("pos")).toSeq == (1L to rows.length).toSeq)
    // reading in pos order: cid never decreases (each cluster is one
    // contiguous block), and within a cluster cos never increases
    rows.sliding(2).foreach { case Array(a, b) =>
      val (ca, cb) = (a.getAs[Int]("cid"), b.getAs[Int]("cid"))
      assert(ca <= cb, s"cluster blocks must be contiguous: cid $ca then $cb")
      if (ca == cb)
        assert(a.getAs[Double]("cos") >= b.getAs[Double]("cos"),
          s"within cluster $ca, similarity must be non-increasing")
    }
    // every vector appears exactly once (no drops beyond zero-norm, none here)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    assert(rows.length == emb.count())
    // determinism: a second run (fresh training) reproduces the layout
    val again = graft.similarity.Ann.semanticSort(emb, trainStride = 4)
      .orderBy("pos").collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("pos")))
    assert(again.toSeq == rows.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("pos"))).toSeq)
  }

  test("persisted IVF model round-trips: serve equals rebuild") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-model")
    graft.similarity.Ann.writeIvfModel(emb, dir.toString, trainStride = 4)
    val served = graft.similarity.Ann.readIvfModel(spark, dir.toString)
    val fresh = graft.similarity.Ann.ivfCentroids(emb, trainStride = 4)
    assert(served.map(_._1) == fresh.map(_._1))
    served.zip(fresh).foreach { case ((_, a), (_, b)) => assert(a.toSeq == b.toSeq) }
    val a = graft.similarity.Ann.ivfTopKWith(emb, served, stride = 50, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = graft.similarity.Ann.ivfTopK(emb, stride = 50, k = 3, trainStride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b, "serve path must reproduce the train-and-apply output")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("persisted BPE model round-trips: serve equals rebuild") {
    val docs = graft.collocations.Collocations.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-model")
    TextAnalysis.writeBpeModel(docs, dir.toString, numMerges = 10)
    val served = TextAnalysis.readBpeModel(spark, dir.toString)
    assert(served == TextAnalysis.bpeTrain(docs, numMerges = 10),
      "read-back merge table must equal a fresh deterministic train")
    val a = TextAnalysis.tokenizeBpeWith(docs, served)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = TextAnalysis.tokenizeBpe(docs, numMerges = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b, "serve path must reproduce the train-and-apply output")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("kneser-ney: hand-computed probabilities, continuation backoff, domain") {
    import spark.implicits._
    // bigrams: (a,b):3 (b,a):2 (a,c):1 -> ctx(a)=4 n1f(a)=2, ctx(b)=2
    // n1f(b)=1; n1r(a)=n1r(b)=n1r(c)=1; n1a=3
    val docs = Seq(
      (1L, "a b a b", "en"),
      (2L, "a b a c", "en"),
      (3L, "solo", "en")) // <2 tokens: excluded like lmScore
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.lmScoreKn(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(!r.contains(3L))
    val pAB = (3 - 0.75) / 4 + 0.75 * 2 / 4 * (1.0 / 3)  // 0.6875
    val pBA = (2 - 0.75) / 2 + 0.75 * 1 / 2 * (1.0 / 3)  // 0.75
    val pAC = (1 - 0.75) / 4 + 0.75 * 2 / 4 * (1.0 / 3)  // 0.1875
    val exp1 = (2 * math.log(pAB) + math.log(pBA)) / 3
    val exp2 = (math.log(pAB) + math.log(pBA) + math.log(pAC)) / 3
    assert(r(1L)._1 == 3L && math.abs(r(1L)._2 - exp1) < 1e-6, s"${r(1L)} vs $exp1")
    assert(r(2L)._1 == 3L && math.abs(r(2L)._2 - exp2) < 1e-6, s"${r(2L)} vs $exp2")
    // the rarer continuation scores lower than the frequent one
    assert(r(2L)._2 < r(1L)._2)

    // persisted-model round-trip: serve equals rebuild, and scoring a
    // disjoint shard against the model uses ONLY seen bigrams
    val dir = java.nio.file.Files.createTempDirectory("graft-kn")
    TextAnalysis.writeKnModel(docs, dir.toString)
    val served = TextAnalysis.lmScoreKnWith(docs, dir.toString).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(served == r, "serve path must equal the train-and-score path")
    val shard = Seq((9L, "a b zz", "en")).toDF("doc_id", "text", "lang")
    val s9 = TextAnalysis.lmScoreKnWith(shard, dir.toString).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // (a,b) seen, (b,zz) unseen -> 1 scored bigram at p(b|a)
    assert(s9(9L)._1 == 1L && math.abs(s9(9L)._2 - math.log(pAB)) < 1e-6)

    // COUNT-PRUNED serve (minCount=2 drops the singleton type (a,c)):
    // statistics re-derive from the survivors — ctx(a)=3, n1f(a)=1,
    // n1r over survivors, n1a=2 — and the coverage drop is REPORTED:
    // doc 2 keeps its row with 2/3 scored, never silently shrinks
    val pr = TextAnalysis.lmScoreKnPruned(docs, dir.toString, minCount = 2).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3),
        if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toMap
    val pAB2 = (3 - 0.75) / 3 + 0.75 * 1 / 3 * (1.0 / 2)
    val pBA2 = (2 - 0.75) / 2 + 0.75 * 1 / 2 * (1.0 / 2)
    assert(pr(1L)._1 == 3L && pr(1L)._2 == 3L && pr(1L)._3 == 1.0)
    assert(math.abs(pr(1L)._4.get - (2 * math.log(pAB2) + math.log(pBA2)) / 3) < 1e-6)
    assert(pr(2L) == ((2L, 3L, 0.666667,
      pr(2L)._4)), s"pruned coverage must be reported: ${pr(2L)}")
    assert(math.abs(pr(2L)._4.get - (math.log(pAB2) + math.log(pBA2)) / 2) < 1e-6)
    // a doc whose every bigram was pruned still has a row: NULL score,
    // coverage 0 — the not-silent contract
    val orphan = Seq((8L, "q q", "en")).toDF("doc_id", "text", "lang")
    val po = TextAnalysis.lmScoreKnPruned(orphan, dir.toString, minCount = 2).collect()
    assert(po.length == 1 && po.head.getLong(1) == 0L &&
      po.head.getDouble(3) == 0.0 && po.head.isNullAt(4))
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("trigram kneser-ney: hand-computed probabilities, backoff chain, pruned coverage") {
    import spark.implicits._
    // trigram types: (a,b,c):2 (b,c,a):1 (c,a,b):1 (a,b,d):1
    val docs = Seq(
      (1L, "a b c a b c", "en"),
      (2L, "a b d", "en"),
      (3L, "x y", "en")) // <3 tokens: no trigram, excluded
      .toDF("doc_id", "text", "lang")
    val D = 0.75
    // stats read off the type table:
    //   ctx(a,b)=3 n1f12(a,b)=2; ctx(b,c)=ctx(c,a)=1, n1f12=1
    //   cont23: every (w2,w3) type has exactly 1 distinct predecessor
    //   m2(b)=2 n1f2(b)=2; m2(c)=m2(a)=1, n1f2=1
    //   n1r3 = 1 for every w3; n1a = 4 distinct (w2,w3) types
    def pc(n1r23: Double, m2: Double, n1f2: Double, n1r3: Double) =
      (n1r23 - D) / m2 + D * n1f2 / m2 * (n1r3 / 4.0)
    val pABC = (2 - D) / 3 + D * 2 / 3 * pc(1, 2, 2, 1)
    val pBCA = (1 - D) / 1 + D * 1 / 1 * pc(1, 1, 1, 1)
    val pCAB = (1 - D) / 1 + D * 1 / 1 * pc(1, 1, 1, 1)
    val pABD = (1 - D) / 3 + D * 2 / 3 * pc(1, 2, 2, 1)
    val r = TextAnalysis.lmScoreKn3(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(!r.contains(3L))
    val exp1 = (2 * math.log(pABC) + math.log(pBCA) + math.log(pCAB)) / 4
    assert(r(1L)._1 == 4L && math.abs(r(1L)._2 - exp1) < 1e-6, s"${r(1L)} vs $exp1")
    assert(r(2L)._1 == 1L && math.abs(r(2L)._2 - math.log(pABD)) < 1e-6)
    // the rarer continuation scores lower
    assert(r(2L)._2 < r(1L)._2)

    // persisted-model round-trip + disjoint shard uses only seen trigrams
    val dir = java.nio.file.Files.createTempDirectory("graft-kn3")
    TextAnalysis.writeKn3Model(docs, dir.toString)
    val served = TextAnalysis.lmScoreKn3With(docs, dir.toString).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(served == r, "serve path must equal the train-and-score path")
    val shard = Seq((9L, "a b c zz", "en")).toDF("doc_id", "text", "lang")
    val s9 = TextAnalysis.lmScoreKn3With(shard, dir.toString).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // (a,b,c) seen, (b,c,zz) unseen -> 1 scored trigram at p(c|a,b)
    assert(s9(9L)._1 == 1L && math.abs(s9(9L)._2 - math.log(pABC)) < 1e-6)

    // COUNT-PRUNED serve (minCount=2 keeps only (a,b,c)): statistics
    // re-derive from the lone survivor — ctx(a,b)=2, n1f12=1, every
    // continuation stat 1, n1a=1 — so p'(c|a,b) = 0.625 + 0.375 = 1.0
    // exactly; coverage is REPORTED (doc 1: 2/4, doc 2: 0/1 with NULL)
    val pr = TextAnalysis.lmScoreKn3Pruned(docs, dir.toString, minCount = 2).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3),
        if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toMap
    assert(pr(1L)._1 == 2L && pr(1L)._2 == 4L && pr(1L)._3 == 0.5)
    assert(math.abs(pr(1L)._4.get - 0.0) < 1e-6, s"ln(1.0) trigrams: ${pr(1L)}")
    assert(pr(2L) == ((0L, 1L, 0.0, None)), s"all-pruned doc keeps its row: ${pr(2L)}")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("cluster cap: at most cap per cluster, rare clusters whole, deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = Ann.clusterCapSample(emb, cap = 5, nCells = 4).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.nonEmpty)
    val byCell = r.groupBy(_._2)
    byCell.foreach { case (cid, rows) =>
      assert(rows.length <= 5, s"cell $cid kept ${rows.length} > cap")
      val cellN = rows.head._4
      assert(rows.forall(_._4 == cellN))
      // under-cap cells pass through whole; capped cells keep exactly cap
      if (cellN <= 5) assert(rows.length == cellN.toInt)
      else assert(rows.length == 5)
      // keep order is the vec_id-ascending prefix: ranks are 1..kept
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val r2 = Ann.clusterCapSample(emb, cap = 5, nCells = 4).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSet == r2.toSet, "run-to-run deterministic")
  }

  test("unigram DP: max packed score with fewest-pieces tie-break, UNK fallback") {
    import graft.functions.UnigramEncode
    // hand-built packed model: score("ab") = -1e6 micro-nats, singles -2e6
    // each — "abab" best = [ab, ab] (2 pieces, score -2e6) beats
    // [a,b,a,b] (score -8e6); count must read 2
    def packed(scoreMicroNats: Long): Long = scoreMicroNats * 1024L - 1L
    val m = new java.util.HashMap[String, java.lang.Long]()
    m.put("ab", packed(-1000000L))
    m.put("a", packed(-2000000L))
    m.put("b", packed(-2000000L))
    assert(UnigramEncode.countPieces("abab", m, 4) == 2L)
    assert(UnigramEncode.countPieces("aab", m, 4) == 2L)   // a + ab
    assert(UnigramEncode.countPieces("a", m, 4) == 1L)
    assert(UnigramEncode.countPieces("", m, 4) == 0L)
    // unknown codepoint segments via the pinned UNK value, never throws
    assert(UnigramEncode.countPieces("axb", m, 4) == 3L)
    // fewest-pieces tie-break: make [ab] and [a,b] score equal — the
    // packed -1-per-piece term must pick the single piece
    val t = new java.util.HashMap[String, java.lang.Long]()
    t.put("ab", packed(-4000000L))
    t.put("a", packed(-2000000L))
    t.put("b", packed(-2000000L))
    assert(UnigramEncode.countPieces("ab", t, 4) == 1L)
    // ≥1024-codepoint words (long URLs / base64 runs on the unbounded
    // apply path) exceed the packed counter's modulus — the guard must
    // return the per-codepoint ceiling, never a wrapped count. 1025 of
    // "a": wrapped floorMod would read 1, the guard reads 1025.
    assert(UnigramEncode.countPieces("a" * 1025, m, 4) == 1025L)
    assert(UnigramEncode.countPieces("a" * 1023, m, 4) == 1023L) // below guard: DP still exact
  }

  test("unigram training is deterministic and the model segments its own corpus") {
    val docs = graft.collocations.Collocations.documents(spark, "/root/testdata/sf0.001")
    val m1 = TextAnalysis.unigramTrain(docs, vocabSize = 40, maxPieceLen = 3)
    val m2 = TextAnalysis.unigramTrain(docs, vocabSize = 40, maxPieceLen = 3)
    assert(m1 == m2, "two trains over the same corpus must be identical")
    assert(m1.exists(_._1.length > 1), "training must retain multi-char pieces")
    val r = TextAnalysis.tokenizeUnigramWith(docs, m1, maxPieceLen = 3).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (nw, np) = (row.getLong(1), row.getLong(2))
      assert(np >= nw, "every word is at least one piece")
      assert(np > 0)
    }
  }

  test("persisted unigram model round-trips: serve equals rebuild") {
    val docs = graft.collocations.Collocations.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-unigram-model")
    TextAnalysis.writeUnigramModel(docs, dir.toString, vocabSize = 40)
    val served = TextAnalysis.readUnigramModel(spark, dir.toString)
    assert(served == TextAnalysis.unigramTrain(docs, vocabSize = 40),
      "read-back model must equal a fresh deterministic train")
    val a = TextAnalysis.tokenizeUnigramWith(docs, served)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = TextAnalysis.tokenizeUnigram(docs, vocabSize = 40)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b, "serve path must reproduce the train-and-apply output")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("keywords: rare terms outrank common ones, k bounds per doc, ties break on term") {
    import spark.implicits._
    // "common" appears in every doc (idf ~ 0); each doc also has unique terms
    val docs = Seq(
      (1L, "common rare1 rare1 rare2", "en"),
      (2L, "common other1 other2 other3", "en"),
      (3L, "common filler filler filler", "en"))
      .toDF("doc_id", "text", "lang")
    val rows = TextAnalysis.keywords(docs, k = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk"), r.getAs[String]("w")))
    assert(rows.count(_._1 == 1L) == 2)
    // doc 1: rare1 (tf=2) beats rare2 (tf=1) beats common (idf=0)
    assert(rows.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq == Seq("rare1", "rare2"))
    // doc 2: other1/other2 tie on score -> lexicographic term order
    assert(rows.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq == Seq("other1", "other2"))
    rows.groupBy(_._1).foreach { case (_, rs) => assert(rs.length <= 2) }
  }

  test("gopher repetition battery: planted loops score high, clean text scores zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, ("spam ham " * 12).trim, "en"),                    // pure 2-token loop
      (2L, "one two three four five six seven eight", "en"),  // no repeats at all
      (3L, ("alpha beta gamma delta epsilon " * 4).trim, "en")) // repeated 5-gram
      .toDF("doc_id", "text", "lang")
    val m = TextAnalysis.repetitionNgrams(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: "spam ham" occurs 12x of 23 bigrams; every bigram duplicated
    assert(m(1L).getAs[Double]("top2_frac") > 0.4)
    assert(m(1L).getAs[Double]("dup5_frac") == 1.0, "saturated loop must cap at 1.0")
    // doc 2: nothing repeats — every dup share is exactly zero
    Seq("dup5_frac", "dup8_frac", "dup10_frac").foreach { c =>
      assert(m(2L).getAs[Double](c) == 0.0, s"$c on clean text")
    }
    // and its top-2 share is exactly one bigram's char mass: every bigram
    // has c=1, so the order encode tie-breaks to the LONGEST bigram
    // ("seven eight", 10 chars) over the 32 total token chars
    assert(m(2L).getAs[Double]("top2_frac") == 0.3125)
    // doc 3: the 5-gram loop repeats 4x -> dup5 coverage well above half
    assert(m(3L).getAs[Double]("dup5_frac") > 0.5)
    // short doc: fewer tokens than n emits zero, not null/crash
    val tiny = Seq((9L, "just two", "en")).toDF("doc_id", "text", "lang")
    val r9 = TextAnalysis.repetitionNgrams(tiny).collect().head
    assert(r9.getAs[Double]("top4_frac") == 0.0 && r9.getAs[Double]("dup10_frac") == 0.0)
  }

  test("unicode normalization pins every rule and is idempotent") {
    import spark.implicits._
    import graft.text.TextNormalize.normalizeText
    val acute = 0x0301.toChar; val eAcute = 0x00E9.toChar
    val nbsp = 0x00A0.toChar; val zwsp = 0x200B.toChar; val bel = 0x0007.toChar
    val rows = Seq(
      1L -> s"cafe$acute",              // decomposed -> composed
      2L -> s"caf$eAcute",              // precomposed: NFC fixpoint
      3L -> "a\r\nb\rc\nd",             // CRLF and CR -> LF
      4L -> s"x${zwsp}y${nbsp}z",       // zero-width dropped, NBSP -> space
      5L -> s"k${bel}eep\tme\n",        // BEL stripped, TAB and LF kept
      6L -> "plain ascii")
    val out = rows.toDF("id", "t")
      .select(col("id"), normalizeText(col("t")).as("n"),
        normalizeText(normalizeText(col("t"))).as("nn"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(1L)._1 == s"caf$eAcute" && out(2L)._1 == s"caf$eAcute")
    assert(out(3L)._1 == "a\nb\nc\nd")
    assert(out(4L)._1 == "xy z")
    assert(out(5L)._1 == "keep\tme\n")
    assert(out(6L)._1 == "plain ascii")
    // idempotent: a normalized corpus re-normalizes to itself
    assert(out.values.forall { case (n, nn) => n == nn })
    // null-safe through the codegen'd NFC expression
    val nul = Seq((1L, Option.empty[String])).toDF("id", "t")
      .select(normalizeText(col("t"))).collect().head
    assert(nul.isNullAt(0))
  }

  test("prototypicality flags quantile-sized core and tail slices, deterministically") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = graft.similarity.Ann.prototypicality(emb, trainStride = 4)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"), r.getAs[String]("flag")))
    val n = rows.length
    assert(n == emb.count())
    val byFlag = rows.groupBy(_._3).view.mapValues(_.length).toMap
    // lo=0.1 / hi=0.9 quantile cuts with >= / <= semantics: each flagged
    // slice holds at least its quantile mass and cannot swallow the corpus
    assert(byFlag.getOrElse("outlier", 0) >= n / 10 - 1, s"flags: $byFlag")
    assert(byFlag.getOrElse("prototype", 0) >= n / 10 - 1, s"flags: $byFlag")
    assert(byFlag.getOrElse("keep", 0) >= n / 2, s"flags: $byFlag")
    // flag is monotone in cos: every prototype >= every keep >= every outlier
    val protoMin = rows.filter(_._3 == "prototype").map(_._2).min
    val keepCos = rows.filter(_._3 == "keep").map(_._2)
    val outMax = rows.filter(_._3 == "outlier").map(_._2).max
    assert(keepCos.max <= protoMin, "a keep row above the prototype floor")
    assert(outMax <= keepCos.min, "an outlier row above the keep floor")
    // fresh training reproduces the same flags
    val again = graft.similarity.Ann.prototypicality(emb, trainStride = 4)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"), r.getAs[String]("flag")))
    assert(again.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
  }
}
