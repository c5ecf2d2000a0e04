package graft

import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.ops.{Normalize, Salt}
import graft.functions.RollingHash

/** Property-based invariants (scalacheck generators, sampled batches —
  * same pattern as LlrSpec) for the scalar kernels and rewrites whose
  * correctness the whole engine leans on. */
class PropertySpec extends SparkSpec {

  // NOTE: no '_' in the idempotence generator — cleanToken is deliberately
  // NOT idempotent across underscores, faithfully to the reference: the
  // POS-cut (strip at first '_' when idx>0) runs BEFORE edge-stripping, so
  // a leading underscore protects later ones on the first pass but not on
  // a second (`NGramUtils.java:29-39` order of operations; asserted below).
  private val tokenGen: Gen[String] = for {
    core <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('(', ')', '-', '.', '!', 'ä', 'ש')))
    pre  <- Gen.listOf(Gen.oneOf(' ', '\t'))
  } yield (pre ++ core).mkString

  private def cleanBatch(ts: Seq[String]): Seq[String] = {
    import spark.implicits._
    ts.toDF("t").select(Normalize.cleanToken(col("t")).as("c")).collect().map(_.getString(0)).toSeq
  }

  test("cleanToken is idempotent (sans POS markers) with lowercase alphanumeric edges") {
    val tokens = Gen.listOfN(300, tokenGen).sample.get
    val once = cleanBatch(tokens)
    val twice = cleanBatch(once)
    assert(once == twice, "cleanToken must be idempotent on underscore-free input")
    once.filter(_.nonEmpty).foreach { c =>
      assert(Character.isLetterOrDigit(c.head) && Character.isLetterOrDigit(c.last),
        s"edges must be alphanumeric: '$c'")
      assert(c == c.toLowerCase, s"must be lowercased: '$c'")
    }
  }

  test("ntileByRange equals the SQL ntile on random multisets with tied leading keys") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // heavy duplication in the leading key (values drawn from a tiny
    // domain) forces ties to land ON the quantile bounds — the edge the
    // monotone content-bucketing must absorb; id is the unique tiebreak
    val caseGen = for {
      n <- Gen.choose(1, 60)
      k <- Gen.choose(1, 7)
      vs <- Gen.listOfN(n, Gen.choose(0L, 5L))
      asc <- Gen.oneOf(true, false)
    } yield (vs, k, asc)
    Gen.listOfN(8, caseGen).sample.get.foreach { case (vs, k, asc) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val sort = if (asc) Seq(col("v").asc, col("id").asc) else Seq(col("v").desc, col("id").asc)
      val naive = df.withColumn("b", ntile(k).over(Window.orderBy(sort: _*)).cast("long"))
      val fast = graft.ops.Ranks.ntileByRange(df, k, Seq(col("v") -> asc, col("id") -> true), "b")
      assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
        s"ntile mismatch: n=${vs.size} k=$k asc=$asc vs=$vs")
    }
  }

  test("globalCumSum equals the naive global running sum on random data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val caseGen = for {
      n <- Gen.choose(1, 50)
      vs <- Gen.listOfN(n, Gen.choose(-100L, 100L))
    } yield vs
    Gen.listOfN(5, caseGen).sample.get.foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val naive = df.withColumn("c",
        sum("v").over(Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val fast = graft.ops.Ranks.globalCumSum(df, Seq(col("id") -> true), col("v"), "c")
        .drop("_n_total")
      assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
        s"cumsum mismatch for $vs")
    }
  }

  test("cleanToken keeps the reference's leading-underscore POS quirk") {
    // '_ab_NOUN': leading underscore is NOT a cut point (idx must be > 0
    // on the trimmed string), so the POS tag survives pass 1 and only the
    // edge-strip removes the lead underscore; pass 2 then cuts at '_NOUN'.
    assert(cleanBatch(Seq("_ab_noun")) == Seq("ab_noun"))
    assert(cleanBatch(Seq("ab_noun")) == Seq("ab"))
    assert(cleanBatch(cleanBatch(Seq("_ab_noun"))) == Seq("ab"))
  }

  test("salted sum equals the direct group-by sum for arbitrary data") {
    import spark.implicits._
    val rows = Gen.listOfN(500,
      Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(-10000L, 10000L))).sample.get
    val df = rows.toDF("k", "v").withColumn("v", col("v").cast("decimal(18,2)"))
    val direct = df.groupBy("k").agg(sum("v").as("s")).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Salt.saltedSum(df, Seq("k"), "v", buckets = 7).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted == direct)
  }

  test("rolling hash obeys the fold recurrence under one-char concatenation") {
    val cases = Gen.listOfN(300, Gen.zip(Gen.alphaNumStr.map(_.take(40)), Gen.alphaNumChar)).sample.get
    cases.foreach { case (s, c) =>
      val expected = (RollingHash.compute(s) * RollingHash.Base + c.toLong) % RollingHash.Mod
      assert(RollingHash.compute(s + c) == expected)
    }
  }

  test("toDecade truncates to the containing decade for any positive year") {
    import spark.implicits._
    val years = Gen.listOfN(300, Gen.chooseNum(1, 2999)).sample.get
    val out = years.toDF("y").select(Normalize.toDecade(col("y")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    years.zip(out).foreach { case (y, d) =>
      assert(d == (y / 10) * 10 && d <= y && y - d < 10)
    }
  }

  // random corpora: texts drawn from a tiny vocabulary so duplicate and
  // near-duplicate structure actually occurs at every sample size
  private def corpusGen(maxDocs: Int): Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, maxDocs)
    texts <- Gen.listOfN(n,
      Gen.chooseNum(0, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd", "ee")).map(_.mkString(" "))))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("keepCanonical partitions any corpus: survivors + removals = corpus, disjointly") {
    import spark.implicits._
    Seq(17, 40).foreach { size =>
      val corpus = corpusGen(size).sample.get
      val docs = corpus.map { case (i, t) => (i, t, "en") }.toDF("doc_id", "text", "lang")
      val kept = graft.dedup.Dedup.keepCanonical(docs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every doc is either a survivor or counted removed in exactly one
      // survivor's favor — nothing lost, nothing double-counted
      assert(kept.keySet.size + kept.values.sum == corpus.size.toLong,
        s"partition violated: ${kept.size} survivors + ${kept.values.sum} removed != ${corpus.size}")
      // canonical choice: no removed doc has an id smaller than its survivor
      val labels = graft.dedup.Dedup.lshComponents(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      labels.foreach { case (d, c) => assert(c <= d && kept.contains(c) == true) }
    }
  }

  test("cluster size histogram conserves the corpus for arbitrary inputs") {
    import spark.implicits._
    Seq(17, 40).foreach { size =>
      val corpus = corpusGen(size).sample.get
      val docs = corpus.map { case (i, t) => (i, t, "en") }.toDF("doc_id", "text", "lang")
      val hist = graft.dedup.Dedup.clusterSizeHistogram(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // every doc lands in exactly one cluster; n_docs is size * count
      assert(hist.map(_._3).sum == corpus.size.toLong,
        s"doc totals not conserved: $hist vs ${corpus.size}")
      hist.foreach { case (cs, nc, nd) =>
        assert(cs >= 1 && nc >= 1 && nd == cs * nc, s"inconsistent row: ($cs, $nc, $nd)")
      }
      assert(hist.map(_._1).distinct.length == hist.length, s"duplicate size rows: $hist")
    }
  }

  test("novelty is bounded in [0,1], zero for clones, and conserves incoming docs") {
    import spark.implicits._
    val corpus = corpusGen(40).sample.get
    val docs = corpus.map { case (i, t) => (i, t, "en") }.toDF("doc_id", "text", "lang")
    val scores = graft.dedup.Dedup.noveltyScores(docs, col("doc_id") % 2 === 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val incoming = corpus.filter(_._1 % 2 == 1)
    assert(scores.map(_._1).toSet == incoming.map(_._1).toSet,
      "one score row per incoming doc")
    scores.foreach { case (id, nsh, nseen, nov) =>
      assert(nov >= 0.0 && nov <= 1.0 && nseen <= nsh, s"out-of-bounds row: ($id, $nsh, $nseen, $nov)")
    }
    // a doc whose text equals some reference doc's text must score 0
    val refTexts = corpus.filter(_._1 % 2 == 0).map(_._2).toSet
    val cloneIds = incoming.filter(d => refTexts.contains(d._2)).map(_._1).toSet
    scores.filter(s => cloneIds.contains(s._1) && s._2 > 0)
      .foreach(s => assert(s._4 == 0.0, s"reference clone must have novelty 0: $s"))
  }

  test("corpusShuffle is a permutation for arbitrary corpora, stable under row order") {
    import spark.implicits._
    val corpus = corpusGen(50).sample.get
    val docs = corpus.map { case (i, t) => (i, t, "en") }.toDF("doc_id", "text", "lang")
    val pos = graft.pipelines.CleanCorpus.corpusShuffle(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pos.keySet == corpus.map(_._1).toSet)
    assert(pos.values.toSeq.sorted == (1L to corpus.size).toSeq)
    // content-keyed order can't depend on input row order or partitioning
    val shuffled = corpus.reverse.map { case (i, t) => (i, t, "en") }
      .toDF("doc_id", "text", "lang").repartition(7)
    val pos2 = graft.pipelines.CleanCorpus.corpusShuffle(shuffled).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pos2 == pos)
  }

  test("common prefix/suffix byte compares equal the string-walk reference on arbitrary unicode") {
    import org.apache.spark.unsafe.types.UTF8String
    def refPrefix(x: String, y: String): Long = {
      val xs = x.codePoints().toArray; val ys = y.codePoints().toArray
      var i = 0
      while (i < math.min(xs.length, ys.length) && xs(i) == ys(i)) i += 1
      i.toLong
    }
    // 1-, 2-, 3-byte UTF-8 chars plus a 4-byte supplementary codepoint
    // (as its full surrogate PAIR, so inputs stay valid UTF-8)
    val charGen = Gen.oneOf(Gen.alphaNumChar.map(_.toString), Gen.const("ä"),
      Gen.const("ש"), Gen.const("中"), Gen.const(" "), Gen.const("𐍈"))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val pairs = Gen.listOfN(300, Gen.zip(strGen, strGen)).sample.get
    // exercise shared prefixes too, not just random pairs
    val shared = pairs.map { case (a, b) => (a + b, a + b.reverse) }
    (pairs ++ shared).foreach { case (x, y) =>
      val u = UTF8String.fromString(x); val v = UTF8String.fromString(y)
      assert(graft.functions.CommonAffix.prefixLen(u, v) == refPrefix(x, y),
        s"prefix mismatch on ${x.codePoints().toArray.toSeq} vs ${y.codePoints().toArray.toSeq}")
      assert(graft.functions.CommonAffix.suffixLen(u, v) == refPrefix(x.reverse, y.reverse),
        s"suffix mismatch on $x vs $y")
    }
  }

  test("winnow anchors equal the naive window-min reference for arbitrary geometry") {
    def refAnchors(s: String, k: Int, w: Int): Seq[(Long, Long)] = {
      val cps = s.codePoints().toArray
      val nk = cps.length - k + 1
      if (nk < 1) return Seq.empty
      val hs = (0 until nk).map(i =>
        RollingHash.compute(new String(cps, i, k)))
      val nw = math.max(nk - w + 1, 1)
      (0 until nw).map { i =>
        val win = hs.slice(i, math.min(i + w, nk))
        val m = win.min
        val pos = i + win.indexOf(m) // leftmost min
        (pos + 1L, m)
      }.distinct
    }
    val textGen = Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ', 'ä')).map(_.mkString)
    val cases = Gen.listOfN(200,
      Gen.zip(textGen, Gen.chooseNum(2, 6), Gen.chooseNum(1, 5))).sample.get
    cases.foreach { case (s, k, w) =>
      val got = graft.functions.WinnowAnchor.compute(s, k, w)
        .toObjectArray(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("h", org.apache.spark.sql.types.LongType))))
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == refAnchors(s, k, w),
        s"anchor mismatch for '$s' k=$k w=$w: $got vs ${refAnchors(s, k, w)}")
    }
  }

  test("bpe encode is a fixpoint and concatenation-preserving for arbitrary merge tables") {
    import org.apache.spark.sql.types.StringType
    val wordGen = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString).suchThat(_.nonEmpty)
    val mergeGen = Gen.listOfN(6, Gen.zip(
      Gen.oneOf("a", "b", "c", "ab", "cd"), Gen.oneOf("a", "b", "d", "ab")))
    val cases = Gen.listOfN(200, Gen.zip(wordGen, mergeGen)).sample.get
    cases.foreach { case (w, merges) =>
      val rank = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        val key = a + " " + b
        if (!rank.containsKey(key)) rank.put(key, i)
      }
      val syms = graft.functions.BpeEncode.encode(w, rank)
        .toObjectArray(StringType).map(_.toString).toSeq
      // concatenation preserved: the symbols spell the word exactly
      assert(syms.mkString == w, s"'$w' -> $syms loses bytes")
      // fixpoint: no adjacent pair is still mergeable
      syms.sliding(2).foreach { p =>
        if (p.length == 2)
          assert(!rank.containsKey(p(0) + " " + p(1)),
            s"'$w' -> $syms still has mergeable pair $p under $merges")
      }
    }
  }

  test("pca on arbitrary corpora: orthonormal axes, trace preserved, spectrum bounds variance") {
    import spark.implicits._
    import graft.similarity.Pca
    val corpusGen = for {
      n <- Gen.choose(6, 24)
      d <- Gen.choose(3, 6)
      rows <- Gen.listOfN(n, Gen.listOfN(d, Gen.choose(-8, 8).map(_ * 0.25)))
    } yield rows
    Gen.listOfN(6, corpusGen).sample.get.foreach { rows =>
      val d = rows.head.length
      val emb = rows.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding")
      val model = Pca.pcaTrain(emb, k = d, trainStride = 1)
      // orthonormal axes
      model.foreach(m =>
        assert(math.abs(math.sqrt(m.comp.map(x => x * x).sum) - 1.0) < 1e-8))
      for (a <- model; b <- model if a.pc < b.pc)
        assert(math.abs(a.comp.zip(b.comp).map { case (x, y) => x * y }.sum) < 1e-8,
          s"pc${a.pc} not orthogonal to pc${b.pc}")
      // full-rank spectrum sums to the trace (rotation preserves variance)
      assert(math.abs(model.map(_.eigval).sum - model.head.trace) < 1e-8 * (1 + model.head.trace))
      // eigenvalues descend and are (numerically) non-negative
      assert(model.sliding(2).forall(p => p.head.eigval >= p.last.eigval - 1e-12))
      assert(model.forall(_.eigval > -1e-9))
      // each projection's empirical variance equals its eigenvalue
      // (float32 input quantization + round-6 projections + micro sums
      // keep this within ~1e-4)
      Pca.pcaVariance(emb, model).collect().foreach { r =>
        assert(math.abs(r.getDouble(3) - r.getDouble(4)) < 1e-3,
          s"pc${r.getInt(0)}: var ${r.getDouble(3)} vs eig ${r.getDouble(4)}")
      }
    }
  }
}
