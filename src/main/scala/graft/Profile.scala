package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual stages of the expensive queries to locate
  * bottlenecks (run with SPARK_GRAFT_SF_DIR, prints name=seconds). */
object Profile {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROFILE $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.collocations.Collocations.documents
    import graft.dedup.Dedup
    val docs = documents(spark, sfDir)

    def clear(): Unit = spark.sharedState.cacheManager.clearCache()

    // warmup
    docs.count(); Dedup.simhash(docs).count()
    clear(); time("simhash")(Dedup.simhash(docs).count())
    clear(); time("simhash_materialize") {
      val fp = Dedup.simhash(docs).persist()
      fp.count()
    }
    time("pairs_from_cached_fp")(Dedup.simhashPairs(docs).count())  // fp NOT same instance; recomputes
    clear(); time("simhashPairs")(Dedup.simhashPairs(docs).count())
    clear(); time("lshComponents")(Dedup.lshComponents(docs).count())
    clear(); time("cleanCorpus")(graft.pipelines.CleanCorpus.clean(docs).count())
    spark.stop()
  }
}
