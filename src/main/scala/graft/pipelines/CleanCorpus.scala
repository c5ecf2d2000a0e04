package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** The composed training-data cleaning pipeline — the shape a 100 TB
  * pretraining corpus actually runs: quality gate -> exact dedup -> LSH
  * near-dedup. Each stage is one of the engine's primitive operators; the
  * composition stays a single lazy DAG with three shuffles (quality is
  * shuffle-free, exact dedup shuffles on text hash, LSH on band
  * signatures).
  *
  * Survivor policy is deterministic and transitive-closure exact: exact
  * groups keep the smallest doc_id; near-dup clusters are labeled with
  * [[Dedup.connectedComponents]] and each cluster keeps its smallest id —
  * unlike greedy drop-the-larger-of-each-pair, a chain a~b~c keeps `a`
  * instead of deleting both b and c.
  */
object CleanCorpus {

  def clean(docs: DataFrame, minQuality: Double = 0.80): DataFrame = {
    val q = docs
      .select(col("doc_id"), col("text"), col("lang"), TextAnalysis.quality(col("text")).as("q"))
      .filter(col("q.quality") >= minQuality)
      .select("doc_id", "text", "lang")
    // referenced twice (LSH candidate generation + the final anti-join);
    // materialize once — the same "write the cleaned shard, then near-dedup
    // it" staging a production corpus pipeline uses
    val keepOne = q
      .withColumn("rn", row_number().over(Window.partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)))
      .filter(col("rn") === 1).drop("rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // drop every clustered doc that is not its component's representative;
    // lshComponents builds the bucket table once, seeds labels from bucket
    // cliques (~1 propagation round), and releases its own caches
    val dropIds = Dedup.lshComponents(keepOne)
      .filter(col("doc_id") =!= col("component"))
      .select("doc_id")
    keepOne.join(dropIds, Seq("doc_id"), "left_anti").select("doc_id", "lang")
  }

  /** Dedup-aware train/holdout split — the within-corpus analogue of
    * benchmark decontamination: a held-out eval slice is worthless if a
    * near-duplicate of one of its documents stays in training, so any
    * near-dup component that SPANS the split is demoted wholesale to
    * train (eval purity over eval size; a component entirely inside
    * holdout is fine — it leaks nothing).
    *
    * Assignment is a content-stable md5 bucket of doc_id (reruns, the
    * oracle, and every cluster size agree row for row — never rand());
    * spanning detection reuses [[Dedup.lshComponents]], and the leak
    * aggregation runs over the duplicate-graph-sized component table,
    * never the corpus: singleton components cannot span by construction,
    * so the only corpus-wide stages are the bucket map and the final
    * left join of graph labels onto the assignment.
    *
    * Returns (doc_id, component, assigned, split): `assigned` is the raw
    * bucket split, `split` the leak-safe one (they differ exactly on
    * demoted docs). */
  def leakSafeSplit(docs: DataFrame, holdoutPct: Int = 10): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
      .cast("long") % 100
    val assigned = docs.select(col("doc_id"),
      when(bucket < holdoutPct, lit("holdout")).otherwise(lit("train")).as("assigned"))
    val memberSplit = Dedup.lshComponents(docs).join(assigned, Seq("doc_id"))
    val hasTrain = memberSplit.groupBy("component")
      .agg(max(when(col("assigned") === "train", 1).otherwise(0)).as("has_train"))
    val graphFixed = memberSplit.join(hasTrain, Seq("component"))
      .select(col("doc_id"), col("component"), col("has_train"))
    assigned.join(graphFixed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"),
        col("assigned"),
        when(col("assigned") === "holdout" && col("has_train") === 1, lit("train"))
          .otherwise(col("assigned")).as("split"))
  }

  /** Deterministic global training order: every document gets its
    * position in a content-keyed pseudo-random permutation of the whole
    * corpus — the "shuffle the dataset before epoch 0" step of a
    * training pipeline, reproducible across runs, retries and cluster
    * sizes because the order derives from md5 CONTENT hashes, never from
    * `rand()` or physical placement.
    *
    * The order key is (x, y, doc_id): the two 28-bit halves of
    * md5(text) — the same nibble-polynomial parse the minhash chain uses
    * ([[graft.dedup.Dedup.md5Half]]) — with doc_id breaking exact-dup
    * ties into a total order. Ranking is [[graft.ops.Ranks.globalRank]],
    * the content-bucketed distributed rewrite: the corpus never funnels
    * through a single-partition window, every wide stage stays parallel,
    * and at 1000 executors each range bucket sorts locally against
    * broadcast offsets.
    *
    * PRECONDITION: `doc_id` is a key of `docs` — the rank demands a
    * TOTAL order, and doc_id is its tiebreak of last resort; duplicate
    * ids with identical text would make two rows order-equal and their
    * relative positions placement-dependent.
    * Returns (doc_id, pos), pos in [1, N]. */
  def corpusShuffle(docs: DataFrame): DataFrame = {
    val keyed = docs
      .select(col("doc_id"), md5(col("text")).as("m"))
      .select(col("doc_id"),
        Dedup.md5Half(col("m"), 1).as("x"), Dedup.md5Half(col("m"), 8).as("y"))
    graft.ops.Ranks.globalRank(keyed,
        Seq(col("x") -> true, col("y") -> true, col("doc_id") -> true), "pos")
      .select(col("doc_id"), col("pos"))
  }
}
