package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: measure how the flagship pipeline scales when the corpus
  * is multiplied in place (docs unioned m times with shifted ids) —
  * evidence that runtime grows ~linearly with corpus size, i.e. no hidden
  * quadratic join blowup. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 5, 10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    mults.foreach { m =>
      val docs = (0 until m).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
        .reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val n = graft.collocations.Collocations.topCollocations(docs).count()
      println(f"SCALE m=$m%2d docs=${5000 * m}%7d rows=$n%5d  ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.sharedState.cacheManager.clearCache()
      // the multiplied corpus is the adversarial dedup input: every doc
      // gains m-1 exact clones, so LSH cliques (and candidate pairs) grow
      // with m^2 per text — the probe shows the seeded-component path
      // absorbing it
      val t1 = System.nanoTime()
      val kept = graft.pipelines.CleanCorpus.clean(docs).count()
      println(f"SCALE-DEDUP m=$m%2d docs=${5000 * m}%7d kept=$kept%6d  ${(System.nanoTime() - t1) / 1e9}%6.2f s")
      spark.sharedState.cacheManager.clearCache()
      // passage dedup: cloned corpora multiply every passage's occurrence
      // count m-fold, but the plan is explode + hash window + per-doc agg —
      // runtime must stay ~linear in total passages
      val t2 = System.nanoTime()
      val np = graft.dedup.Dedup.passageDupStats(docs, window = 3).count()
      println(f"SCALE-PASSAGE m=$m%2d docs=${5000 * m}%7d rows=$np%7d  ${(System.nanoTime() - t2) / 1e9}%6.2f s")
      spark.sharedState.cacheManager.clearCache()
      // global ntile via range-partitioned rank: the single-partition
      // window this replaces would flatline one core here
      val t3 = System.nanoTime()
      val nt = graft.ops.Ranks.ntileByRange(
          docs.select(col("doc_id"), col("n_chars")), 10,
          Seq(col("n_chars") -> false, col("doc_id") -> true), "decile")
        .groupBy("decile").count().count()
      println(f"SCALE-NTILE m=$m%2d docs=${5000 * m}%7d tiles=$nt%3d  ${(System.nanoTime() - t3) / 1e9}%6.2f s")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
