package graft

import org.apache.spark.sql.functions._

/** The carry-forward bench's plan fingerprint is load-bearing: a
  * fingerprint that varies across JVMs silently disables carrying (the
  * 900 s budget then can't certify the registry), while one that
  * over-matches carries stale timings. These tests pin the normalizer's
  * contract per volatile token class (each class was found by diffing
  * full-registry plan dumps from two JVMs) and the fingerprint's
  * same-plan/different-plan behavior on real frames. */
class BenchSpec extends SparkSpec {

  test("normalizePlan scrubs every JVM-volatile token class") {
    // expression ids, plan ids, codegen ids, AQE stage ids
    assert(Bench.normalizePlan("Project [l_orderkey#4711L, name#12]\n [plan_id=40911]") ==
      Bench.normalizePlan("Project [l_orderkey#99L, name#3]\n [plan_id=41378]"))
    assert(Bench.normalizePlan("+- BroadcastQueryStage 14\n +- *(8) HashAggregate(keys=[lang#x") ==
      Bench.normalizePlan("+- BroadcastQueryStage 15\n +- *(9) HashAggregate(keys=[lang#x"))
    // serialized lambda identities + object identity hashes
    assert(Bench.normalizePlan(
      "MapPartitions graft.multimodal.Multimodal$$$Lambda$6777/0x00007fb9cd96aae0@1a2b3c4d, obj#x") ==
      Bench.normalizePlan(
        "MapPartitions graft.multimodal.Multimodal$$$Lambda$6771/0x00007f53ed7712f0@9f8e7d6c, obj#x"))
    // per-process temp paths and file: URIs
    assert(Bench.normalizePlan("Relation [a#x] parquet, location: /tmp/graft-dedup-index123/minhash_sigs") ==
      Bench.normalizePlan("Relation [a#x] parquet, location: /tmp/graft-dedup-index999/minhash_sigs"))
    assert(Bench.normalizePlan("FileScan parquet file:/root/testdata/sf0.1/lineitem.parquet") ==
      Bench.normalizePlan("FileScan parquet file:/root/testdata/sf0.01/lineitem.parquet"))
    // distinct-aggregate gid assignment order: swapped gid numbers AND
    // permuted projection columns reduce to one sorted token multiset
    assert(Bench.normalizePlan(
      "Aggregate [count(a#x) FILTER (WHERE (gid#x = 1)), count(b#x) FILTER (WHERE (gid#x = 2))]") ==
      Bench.normalizePlan(
        "Aggregate [count(b#x) FILTER (WHERE (gid#x = 1)), count(a#x) FILTER (WHERE (gid#x = 2))]"))
    // higher-order-function lambda variable names draw on a
    // session-global fresh-name counter — the number varies with how
    // many lambda-bearing frames were built earlier in the session
    assert(Bench.normalizePlan(
      "Project [filter(toks#x, lambdafunction(isnotnull(lambda x_40#123), lambda x_40#123, false))]") ==
      Bench.normalizePlan(
        "Project [filter(toks#x, lambdafunction(isnotnull(lambda x_57#9), lambda x_57#9, false))]"))
    // ...but DISTINCT variables renumber by first occurrence, not
    // collapse to one token: two plans differing only in WHICH of
    // several lambda variables a body position references must differ
    assert(Bench.normalizePlan(
      "Project [zip_with(a#x, b#x, lambdafunction(lambda l_3#1, lambda l_3#1, lambda r_4#2, false))]") !=
      Bench.normalizePlan(
        "Project [zip_with(a#x, b#x, lambdafunction(lambda r_4#2, lambda l_3#1, lambda r_4#2, false))]"))
    // same reference pattern under different counters still agrees
    assert(Bench.normalizePlan(
      "Project [zip_with(a#x, b#x, lambdafunction(lambda l_3#1, lambda l_3#1, lambda r_4#2, false))]") ==
      Bench.normalizePlan(
        "Project [zip_with(a#x, b#x, lambdafunction(lambda l_88#5, lambda l_88#5, lambda r_91#6, false))]"))
    // line ORDER is normalized, line CONTENT is not
    assert(Bench.normalizePlan("A\nB") == Bench.normalizePlan("B\nA"))
    assert(Bench.normalizePlan("Filter (x#x > 5)") != Bench.normalizePlan("Filter (x#x > 6)"))
    // an InMemoryRelation's cached PHYSICAL subtree (innerChildren,
    // rendered deeper) is a load-volatile AQE snapshot — a placeholder
    // TableCacheQueryStage and its expanded final plan must normalize
    // identically, while nodes at or above the relation's depth survive
    val placeholder =
      """Project [a#x]
        |+- InMemoryRelation [a#x], StorageLevel(disk, memory)
        |      +- TableCacheQueryStage 1
        |+- Filter isnotnull(a#x)""".stripMargin
    val expanded =
      """Project [a#x]
        |+- InMemoryRelation [a#x], StorageLevel(disk, memory)
        |      +- AdaptiveSparkPlan isFinalPlan=true
        |         +- *(1) Filter isnotnull(b#x)
        |            +- Scan parquet [b#x]
        |+- Filter isnotnull(a#x)""".stripMargin
    assert(Bench.normalizePlan(placeholder) == Bench.normalizePlan(expanded))
    assert(Bench.normalizePlan(placeholder).contains("InMemoryRelation"))
    assert(Bench.normalizePlan(placeholder).contains("Filter isnotnull"))
  }

  test("planFingerprint: same logical query twice agrees; different query differs; opaque plans fold srcHash") {
    import spark.implicits._
    // parquet-backed, NOT a LocalRelation: the optimizer folds filters
    // over local data into the relation itself, where row values don't
    // print — a parquet scan keeps predicates visible in the plan text
    def li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // two independent constructions of the same query carry different
    // exprIds — the fingerprint must not see them
    val q1 = li.filter(col("l_quantity") > 10).groupBy("l_returnflag").count()
    val q2 = li.filter(col("l_quantity") > 10).groupBy("l_returnflag").count()
    assert(Bench.planFingerprint(q1, "S") == Bench.planFingerprint(q2, "S"))
    // a semantically different plan must differ
    val q3 = li.filter(col("l_quantity") > 11).groupBy("l_returnflag").count()
    assert(Bench.planFingerprint(q1, "S") != Bench.planFingerprint(q3, "S"))
    // checkpoint-opaque plans (LogicalRDD) fold the source hash: the same
    // frame under two src hashes must differ — any code change re-measures
    val cp = Seq((1L, "a"), (2L, "b")).toDF("id", "v").localCheckpoint()
    assert(Bench.planFingerprint(cp, "S1") != Bench.planFingerprint(cp, "S2"))
    // while a transparent plan ignores it
    assert(Bench.planFingerprint(q1, "S1") == Bench.planFingerprint(q1, "S2"))
    // a ROOT LocalRelation (driver-computed report row — LocalRelation
    // text prints no row values, so the plan is blind to upstream code)
    // also folds the source hash...
    val report = Seq((42L, 0.5)).toDF("n_docs", "cut")
    assert(Bench.planFingerprint(report, "S1") != Bench.planFingerprint(report, "S2"))
    // ...but a LocalRelation merely INSIDE a plan (broadcast literal
    // model / probe set) does not trigger the fold — the surrounding
    // plan text still captures structure
    val probed = li.join(broadcast(Seq((1, "N")).toDF("l_linenumber", "tag")), Seq("l_linenumber"))
      .groupBy("tag").count()
    assert(Bench.planFingerprint(probed, "S1") == Bench.planFingerprint(probed, "S2"))
    // a CACHE-BEARING plan (persist → InMemoryRelation) also folds the
    // source hash: its cached physical subtree is cut as load-volatile,
    // so the remaining text may be blind to the cached query's structure
    val cached = li.filter(col("l_quantity") > 10).persist()
    try {
      cached.count()
      val viaCache = cached.groupBy("l_returnflag").count()
      assert(viaCache.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
        "fixture must actually read through the cache")
      assert(Bench.planFingerprint(viaCache, "S1") != Bench.planFingerprint(viaCache, "S2"))
      assert(Bench.planFingerprint(viaCache, "nosrc") == "")
    } finally cached.unpersist()
    // a bare-classes deployment (missing source tree → "nosrc") must make
    // opaque plans NON-CARRYING, not identically-carrying: the empty
    // fingerprint is the never-carry token everywhere downstream
    assert(Bench.planFingerprint(cp, "nosrc") == "")
    assert(Bench.planFingerprint(report, "nosrc") == "")
    // transparent plans don't need the source hash and still carry
    assert(Bench.planFingerprint(q1, "nosrc").nonEmpty)
  }
}
