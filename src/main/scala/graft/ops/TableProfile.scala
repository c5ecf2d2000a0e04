package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the ANALYZE/data-quality pass a corpus
  * pipeline runs before trusting a new drop: per column, row count, null
  * count, distinct count (exact, or exact + in-bound HLL sketch in
  * [[profileApprox]]), and min/max. See [[profile]] for why the plan is
  * one narrow single-distinct aggregate PER COLUMN rather than one wide
  * Expand-based multi-distinct aggregate.
  *
  * min/max aggregate in the column's native type and cast to string
  * AFTER (integer and varchar renderings are engine-identical; numeric
  * min-then-cast, never lexicographic cast-then-min). */
object TableProfile {

  /** Fixed-width histogram of a numeric column: bin = floor((x - lo)/w),
    * with per-bin count and exact value bounds. One partial+final
    * aggregation keyed on the bin id (bounded cardinality), the
    * distribution companion to [[profile]]'s scalar stats. Rows below
    * `lo` land in negative bins rather than being silently dropped —
    * out-of-range data should be visible in a profiling tool. */
  def histogram(df: DataFrame, column: String, lo: Double, width: Double): DataFrame = {
    require(width > 0, s"bin width must be positive, got $width")
    val x = col(column).cast("double")
    df.filter(x.isNotNull)
      .groupBy(floor((x - lo) / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), min(x).as("lo_val"), max(x).as("hi_val"))
      .select(col("bin"), (lit(lo) + col("bin") * width).as("bin_lo"), col("n"),
        col("lo_val"), col("hi_val"))
  }

  /** Robust (median/MAD) outlier detection on a numeric column — the
    * quality-control filter that survives the heavy tails a mean/stddev
    * z-score is wrecked by: flag rows whose |x − median| exceeds
    * `z` × 1.4826 × MAD (1.4826 scales the MAD to σ under normality).
    *
    * Scale shape: two grouping-free median aggregates (median, then the
    * median of deviations), each a single-row broadcast attached by cross
    * join — the corpus streams twice, shuffles never. The LIBRARY DEFAULT
    * is `approx_percentile` (`exact = false`): a grouping-free EXACT
    * percentile funnels every value of the column into one task's memory
    * — a driver of OOM at 100 TB — where the sketch is a fixed-size
    * mergeable partial. `exact = true` is the oracle-parity twin the
    * registry gates (and [[madOutliersChecked]] proves the sketch sits
    * inside the exact quantile envelope on the same data). Medians and
    * the threshold round to 6 digits before comparing so the flag
    * boundary is engine-identical. A zero MAD (over half the mass on one
    * value) degrades correctly: any nonzero deviation flags, and
    * `z_score` goes null rather than dividing by zero. */
  def madOutliers(df: DataFrame, column: String, z: Double = 3.0,
                  exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    def median(c: String): Column =
      if (exact) expr(s"percentile($c, 0.5)")
      else expr(s"approx_percentile($c, 0.5, $accuracy)").cast("double")
    val x = col(column).cast("double")
    val base = df.filter(x.isNotNull).select(col("doc_id"), x.as("x"))
    val med = base.agg(round(median("x"), 6).as("med"))
    val dev = base.crossJoin(broadcast(med)).withColumn("dev", abs(col("x") - col("med")))
    val mad = dev.agg(round(median("dev"), 6).as("mad"))
    dev.crossJoin(broadcast(mad))
      .filter(round(col("dev"), 6) > round(lit(z) * 1.4826 * col("mad"), 6))
      .select(col("doc_id"), col("x"), round(col("dev"), 6).as("dev"),
        when(col("mad") > 0, round(col("dev") / (lit(1.4826) * col("mad")), 6)).as("z_score"))
  }

  /** [[madOutliers]] flagged rows (exact boundary) plus envelope booleans
    * `med_ok` / `mad_ok` asserting each `approx_percentile` sketch
    * estimate lies inside the exact [0.49, 0.51] quantile envelope — the
    * same gate shape as the `percentiles_approx` registry twin: the
    * sketch VALUE is engine-specific, its in-bound-ness is deterministic
    * on fixed data, so only a genuine sketch regression can flip a
    * boolean. */
  def madOutliersChecked(df: DataFrame, column: String, z: Double = 3.0,
                         accuracy: Int = 10000): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    def withinEnvelope(c: String): Column =
      expr(s"approx_percentile($c, 0.5, $accuracy)").cast("double")
        .between(expr(s"percentile($c, 0.49)"), expr(s"percentile($c, 0.51)"))
    val x = col(column).cast("double")
    val base = df.filter(x.isNotNull).select(col("doc_id"), x.as("x"))
    val med = base.agg(round(expr("percentile(x, 0.5)"), 6).as("med"),
      withinEnvelope("x").as("med_ok"))
    val dev = base.crossJoin(broadcast(med)).withColumn("dev", abs(col("x") - col("med")))
    val mad = dev.agg(round(expr("percentile(dev, 0.5)"), 6).as("mad"),
      withinEnvelope("dev").as("mad_ok"))
    dev.crossJoin(broadcast(mad))
      .filter(round(col("dev"), 6) > round(lit(z) * 1.4826 * col("mad"), 6))
      .select(col("doc_id"), col("x"), round(col("dev"), 6).as("dev"),
        when(col("mad") > 0, round(col("dev") / (lit(1.4826) * col("mad")), 6)).as("z_score"),
        col("med_ok"), col("mad_ok"))
  }

  /** Per-column 1-row aggregate: n_null / exact distinct / min / max.
    * ONE distinct aggregate per subtree keeps Catalyst on the
    * partial-distinct path — no Expand — and the parquet scan prunes to
    * exactly this column. */
  private def colAgg(df: DataFrame, c: String): DataFrame =
    df.agg(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c"))

  /** One 1-row aggregate subtree PER COLUMN, attached by broadcast cross
    * join (the scalar-attach idiom) — NOT one wide multi-distinct
    * aggregate: k exact countDistincts in a single agg make Catalyst
    * insert an Expand of factor k+1, replicating every corpus row k+1
    * times through the hash aggregate (measured 3.0 s at sf0.1; this
    * shape: ~1 s). Per-column subtrees read ONE pruned parquet column
    * each and run as independent narrow jobs — at 100 TB, k columnar
    * scans beat one (k+1)x-replicated scan, and each single-distinct agg
    * stays partial+final with no row expansion. The 1-row wide result
    * unpivots with `stack` — metadata-sized, no second pass. */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val wide = columns.foldLeft(df.agg(count(lit(1L)).as("__n")))(
      (acc, c) => acc.crossJoin(broadcast(colAgg(df, c))))
    val stackArgs = columns.map(c =>
      s"'$c', __n, __nn_$c, __nd_$c, __mn_$c, __mx_$c").mkString(", ")
    wide.selectExpr(
      s"stack(${columns.size}, $stackArgs) AS (column, n, n_null, n_distinct, min_val, max_val)")
  }

  /** [[profile]] plus the mergeable-sketch twin of the distinct count:
    * each row also carries `nd_within_rsd`, asserting the HLL estimate
    * lies within 4·rsd of the exact count (4σ of the configured relative
    * standard deviation — deterministic on fixed data, the same gate
    * shape as the `approx_distinct` registry twin). At 100 TB the sketch
    * IS the answer (a fixed-size partial that merges without shuffling
    * distinct keys).
    *
    * All sketches compute in ONE separate distinct-free aggregate — NOT
    * inside the per-column exact aggs: a single-distinct agg plans as
    * partial-agg-keyed-on-the-distinct-column, so a sketch placed there
    * is materialized and merged once PER DISTINCT KEY (measured 5.1 s vs
    * 1.2 s at sf0.1); standalone, each partition contributes exactly one
    * partial sketch. The row count rides in the SAME distinct-free
    * aggregate (count is as mergeable as the sketches), saving the
    * dedicated count(*) scan the exact [[profile]] still pays. */
  def profileApprox(df: DataFrame, columns: Seq[String], rsd: Double = 0.01): DataFrame = {
    val apAggs = count(lit(1L)).as("__n") +:
      columns.map(c => approx_count_distinct(col(c), rsd).as(s"__ad_$c"))
    val approx = df.agg(apAggs.head, apAggs.tail: _*)
    val wide = columns.foldLeft(approx)(
      (acc, c) => acc.crossJoin(broadcast(colAgg(df, c))))
    val stackArgs = columns.map(c =>
      s"'$c', __n, __nn_$c, __nd_$c, " +
        s"abs(__ad_$c - __nd_$c) <= ${4 * rsd} * __nd_$c, __mn_$c, __mx_$c").mkString(", ")
    wide.selectExpr(
      s"stack(${columns.size}, $stackArgs) AS (column, n, n_null, n_distinct, nd_within_rsd, min_val, max_val)")
  }

  /** Incremental per-group corpus profile from MERGEABLE partials — the
    * shape a 100 TB corpus wants for profiling that must survive new data
    * drops: each split (a day's ingest, one source's delivery) reduces to
    * a bounded per-group partial of (doc count, char sum, DataSketches
    * HLL sketch of its distinct k-shingles), and partials combine by
    * re-aggregation — sums add, sketches `hll_union_agg` — without ever
    * rereading earlier splits. The counters are EXACTLY mergeable; the
    * sketch union's register state is a deterministic function of the
    * value set, so the merged ESTIMATE stays inside the same rsd envelope
    * as a direct build (~1.6% at the default lgK 12; the
    * `profile_incremental` entry gates |est − exact| <= 4·rsd·exact).
    *
    * Deliberately NOT claimed: estimate EQUALITY with a direct build.
    * DataSketches sketches that saw raw updates carry a HIP (historical
    * inverse probability) accumulator and estimate from it; a union
    * result is flagged out-of-order and estimates from the registers
    * (composite estimator). The two can differ by a count or two on the
    * same value set — and whether a "direct" hll_sketch_agg retains HIP
    * depends on how many partition partials Spark happened to merge, so
    * any equality assertion would be partition-layout-dependent.
    * TypedAggAndMetricsSpec pins what IS sound: counters merge exactly,
    * and 2-way vs 3-way split estimates agree within the rsd envelope.
    *
    * Scale shape per split: one groupBy(group) over doc rows for the
    * counters plus one over exploded shingles for the sketch, joined on
    * the (low-cardinality) group key — both partial+final HashAggregates;
    * the join is group-cardinality-sized, never corpus-sized. */
  def incrementalShingleProfile(splits: Seq[DataFrame], groupCol: String = "source",
                                k: Int = 3): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    def partial(df: DataFrame): DataFrame = {
      val stats = df.groupBy(groupCol)
        .agg(count(lit(1L)).as("n_docs"), sum("n_chars").as("total_chars"))
      // tokens -> shingles projected in two steps (see Dedup.shingleCol's
      // CollapseProject note); group key rides along so no corpus join
      val sk = df.select(col(groupCol), graft.ops.Normalize.tokensCol(col("text")).as("toks"))
        .select(col(groupCol), explode(graft.dedup.Dedup.shingleCol(col("toks"), k)).as("shingle"))
        .groupBy(groupCol)
        .agg(hll_sketch_agg(col("shingle")).as("hll"))
      stats.join(sk, Seq(groupCol), "left")
    }
    splits.map(partial).reduce(_ unionByName _)
      .groupBy(groupCol)
      .agg(sum("n_docs").as("n_docs"), sum("total_chars").as("total_chars"),
        hll_union_agg(col("hll")).as("hll"))
  }

  /** Distribution drift per group — Population Stability Index of each
    * group's distribution of `column` against the whole relation as the
    * reference: PSI = Σ_bins (p_group − p_ref)·ln(p_group / p_ref) over
    * fixed-width bins, the standard "did this source's length/score
    * distribution move" monitor a corpus pipeline runs on every new
    * delivery (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 major shift).
    *
    * Group proportions for bins the group never hit clamp to `eps`
    * (the grid is every group × every REFERENCE bin, so missing bins
    * contribute a penalty instead of silently dropping); reference
    * proportions are never zero by construction (groups partition the
    * reference). Terms accumulate in DECIMAL(28,18) before the final
    * round(·, 6) — the same exact-associative-sum contract as the LM
    * score, so the result is engine-identical regardless of add order.
    *
    * Scale shape: ONE corpus pass — the (group × bin) count aggregation —
    * cached at its bounded |groups| × |bins| size; the reference
    * distribution, per-group totals, and PSI terms are all
    * re-aggregations of that cached table (groups partition the
    * reference, so the pooled bin counts are exactly the per-group sums).
    * Nothing downstream of the first aggregation exceeds
    * |groups| × |bins| rows. */
  def driftPsi(df: DataFrame, column: String, groupCol: String,
               lo: Double = 0.0, width: Double = 50.0, eps: Double = 1e-4): DataFrame = {
    require(width > 0, s"bin width must be positive, got $width")
    val x = col(column).cast("double")
    psiOverGroupBins(
      df.filter(x.isNotNull)
        .select(col(groupCol), floor((x - lo) / width).cast("long").as("bin"))
        .groupBy(groupCol, "bin").agg(count(lit(1L)).as("cn")),
      groupCol, eps)
  }

  /** [[driftPsi]] with REFERENCE-QUANTILE bins — the standard industry
    * PSI form: bin edges are the pooled distribution's own `nBins`-iles,
    * so every reference bin holds ~1/nBins of the mass and the score is
    * scale-free (fixed-width bins under- or over-resolve as the value
    * range drifts; quantile bins adapt). Values and edges both round to
    * 6 digits before the strict `>` comparisons, so bin boundaries are
    * engine-identical (the quality-gate discipline); bin id =
    * |{edges < x}| via an array-local filter over the single broadcast
    * edge row.
    *
    * The LIBRARY DEFAULT computes edges with `approx_percentile`
    * (`exact = false`): a grouping-free exact percentile funnels the
    * whole column into one task — the [[madOutliers]] 100 TB note.
    * `exact = true` is the oracle-parity twin the registry gates. */
  def driftPsiQuantile(df: DataFrame, column: String, groupCol: String,
                       nBins: Int = 10, eps: Double = 1e-4,
                       exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"nBins out of [2, 1000]: $nBins")
    val qs = (1 until nBins).map(i => i.toDouble / nBins).mkString(", ")
    val pctl =
      if (exact) s"percentile(x, array($qs))"
      else s"cast(approx_percentile(x, array($qs), $accuracy) as array<double>)"
    val base = df.filter(col(column).isNotNull)
      .select(col(groupCol), round(col(column).cast("double"), 6).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = base.agg(expr(s"transform($pctl, v -> round(v, 6))").as("le"))
    val out = psiOverGroupBins(
      base.crossJoin(broadcast(edges))
        .select(col(groupCol), size(expr("filter(le, v -> x > v)")).cast("long").as("bin"))
        .groupBy(groupCol, "bin").agg(count(lit(1L)).as("cn")),
      groupCol, eps)
    base.unpersist() // out is already materialized by psiOverGroupBins
    out
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic per group — PSI's
    * standard companion: the maximum absolute gap between each group's
    * binned CDF and the pooled reference CDF. Where PSI integrates
    * mass-weighted log-ratios (sensitive to relative shifts in thin
    * bins), KS reports the single worst cumulative displacement — the
    * two disagree exactly when a drift is concentrated vs diffuse, which
    * is why monitors run both.
    *
    * Same one-corpus-scan shape as [[driftPsi]] (the shared group×bin
    * count table; reference = per-group sums). Cumulative counts are
    * EXACT integer window sums over the bounded bin axis (windows
    * partitioned per group over ≤ |bins| rows — never over data); each
    * CDF value is then one double division, so the statistic is
    * engine-identical without any decimal scaffolding. */
  def driftKs(df: DataFrame, column: String, groupCol: String,
              lo: Double = 0.0, width: Double = 50.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(width > 0, s"bin width must be positive, got $width")
    val x = col(column).cast("double")
    val cur = df.filter(x.isNotNull)
      .select(col(groupCol), floor((x - lo) / width).cast("long").as("bin"))
      .groupBy(groupCol, "bin").agg(count(lit(1L)).as("cn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ref = cur.groupBy("bin").agg(sum("cn").as("rn"))
    val refC = ref.crossJoin(broadcast(ref.agg(sum("rn").as("rt"))))
      .withColumn("crn", sum("rn").over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val curTot = cur.groupBy(groupCol).agg(sum("cn").as("ct"))
    val out = curTot.crossJoin(broadcast(refC.select(col("bin"), col("crn"), col("rt"))))
      .join(cur, Seq(groupCol, "bin"), "left")
      .withColumn("ccn", sum(coalesce(col("cn"), lit(0L))).over(
        Window.partitionBy(groupCol).orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(groupCol)
      .agg(round(max(abs(col("ccn") / col("ct") - col("crn") / col("rt"))), 6).as("ks"),
        count(lit(1L)).as("n_bins"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    cur.unpersist()
    out
  }

  /** Shared PSI tail over a (group, bin, cn) count table: reference
    * proportions by re-aggregation (groups partition the reference),
    * ε-clamped grid, DECIMAL term accumulation — see [[driftPsi]]. */
  private def psiOverGroupBins(cur0: DataFrame, groupCol: String, eps: Double): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val cur = cur0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ref = cur.groupBy("bin").agg(sum("cn").as("rn"))
    val refP = ref.crossJoin(broadcast(ref.agg(sum("rn").as("rt"))))
      .select(col("bin"), (col("rn") / col("rt")).as("pr"))
    val curTot = cur.groupBy(groupCol).agg(sum("cn").as("ct"))
    val out = curTot.crossJoin(broadcast(refP))
      .join(cur, Seq(groupCol, "bin"), "left")
      .select(col(groupCol), col("pr"),
        greatest(coalesce(col("cn"), lit(0L)) / col("ct"), lit(eps)).as("pc"))
      .withColumn("term",
        ((col("pc") - col("pr")) * log(col("pc") / col("pr"))).cast("decimal(28,18)"))
      .groupBy(groupCol)
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"),
        count(lit(1L)).as("n_bins"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // vocabCoverage lifecycle: materialize the bounded result, release
    // the upstream (group x bin) cache — the caller owns only the result
    out.count()
    cur.unpersist()
    out
  }

  /** Shuffle-key skew diagnostic — the pre-flight a pipeline runs on a
    * prospective join/groupBy key before deciding whether it needs
    * salting or AQE skew handling: the `topK` hottest key values with
    * their absolute count, corpus share, cumulative share, and
    * `hot_ratio` = count ÷ the uniform per-key average (a hot_ratio of 50
    * means one reducer gets 50 partitions' worth of rows).
    *
    * Scale shape: one partial+final count aggregation keyed on the key
    * (the same shuffle the prospective join would pay — measuring it IS
    * the cost model), a single-row stats aggregate, then global top-k via
    * TakeOrderedAndProject. Rank/cumulative windows run over the bounded
    * k-row result only, never over data ([[graft.text.TextAnalysis
    * .vocabCoverage]]'s cache lifecycle, one count pass feeding both the
    * stats and the top-k). */
  def keySkewProfile(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1, s"topK must be >= 1: $topK")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key")).agg(count(lit(1L)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = counts.agg(count(lit(1L)).as("n_keys"), sum("cnt").as("n_rows"))
    val top = counts.orderBy(col("cnt").desc, col("key").asc).limit(topK)
    val ord = Window.orderBy(col("cnt").desc, col("key").asc)
    val out = top
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("cum", sum(col("cnt")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(stats))
      .select(col("rank"), col("key"), col("cnt"),
        round(col("cnt").cast("double") / col("n_rows"), 6).as("share"),
        round(col("cum").cast("double") / col("n_rows"), 6).as("cum_share"),
        round(col("cnt").cast("double") * col("n_keys") / col("n_rows"), 6).as("hot_ratio"),
        col("n_keys"), col("n_rows"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    counts.unpersist()
    out
  }

  /** Cross-source content overlap — "how much do these two deliveries
    * share" — as sketch-based inclusion–exclusion over distinct
    * k-shingles: per ordered source pair (a < b) that shares at least one
    * shingle, the exact per-source / intersection / union cardinalities
    * and Jaccard, plus DataSketches-HLL estimates validated engine-side
    * against their error bounds (the approx_distinct gate pattern: the
    * row carries the exact values — cross-engine-mirrorable — and
    * booleans asserting each estimate sits inside its envelope; a sketch
    * regression flips a boolean and fails the hash compare). At 100 TB
    * the exact columns are the part you drop and the sketches are the
    * point: per-source HLLs are bounded partials, pairwise union is
    * sketch-merge, and the intersection estimate `est_a + est_b −
    * est_union` never touches a posting join.
    *
    * Scale shape: one (source, shingle) distinct shuffle; per-source
    * aggregates are |sources|-sized; exact intersections come from
    * source-set pairs exploded per shingle (≤ C(|sources|,2) per shingle,
    * bounded by the source cardinality, never a shingle posting
    * self-join); every join downstream of the first aggregation is keyed
    * on the tiny source dimension. Zero-intersection pairs don't appear —
    * that keeps the plan equi-join-only (no cartesian pair grid).
    *
    * `rsd` is the lgK-12 relative standard error (~1.6%); bounds use
    * 4·rsd (union: on the exact union; intersection: on the summed
    * magnitudes, since inclusion–exclusion compounds three errors). */
  def sourceOverlap(docs: DataFrame, k: Int = 3, rsd: Double = 0.016): DataFrame = {
    val sh = docs
      .select(col("source"), graft.ops.Normalize.tokensCol(col("text")).as("toks"))
      .select(col("source"), explode(graft.dedup.Dedup.shingleCol(col("toks"), k)).as("shingle"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val per = sh.groupBy("source")
      .agg(count(lit(1L)).as("n"), hll_sketch_agg(col("shingle")).as("sk"))
    // exact pairwise intersections: the sorted source set of each shared
    // shingle explodes into its ordered pairs (bounded per shingle by the
    // source cardinality), then one (a, b)-keyed count
    val ss = sh.groupBy("shingle").agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
    val inter = ss
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + lit(2), size(col("ss"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1L)).as("inter_exact"))
    val pa = per.select(col("source").as("a"), col("n").as("exact_a"), col("sk").as("sk_a"))
    val pb = per.select(col("source").as("b"), col("n").as("exact_b"), col("sk").as("sk_b"))
    val bound = lit(4 * rsd)
    val out = inter.join(pa, Seq("a")).join(pb, Seq("b"))
      .withColumn("union_exact", col("exact_a") + col("exact_b") - col("inter_exact"))
      .withColumn("est_a", hll_sketch_estimate(col("sk_a")))
      .withColumn("est_b", hll_sketch_estimate(col("sk_b")))
      .withColumn("est_union", hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))))
      .select(col("a"), col("b"), col("exact_a"), col("exact_b"),
        col("inter_exact"), col("union_exact"),
        round(col("inter_exact").cast("double") / col("union_exact"), 6).as("jaccard"),
        (abs(col("est_a") - col("exact_a")) <= bound * col("exact_a")).as("a_within_rsd"),
        (abs(col("est_b") - col("exact_b")) <= bound * col("exact_b")).as("b_within_rsd"),
        (abs(col("est_union") - col("union_exact")) <= bound * col("union_exact")).as("union_within_rsd"),
        (abs(col("est_a") + col("est_b") - col("est_union") - col("inter_exact")) <=
          bound * (col("exact_a") + col("exact_b") + col("union_exact"))).as("inter_within_bound"))
      // materialize the <= C(|sources|,2)-row pair table, then release
      // the shingle cache (the hourlyGapFill force-then-unpersist
      // discipline)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    sh.unpersist()
    out
  }
}
