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

    clear(); time("lshCandidates")(Dedup.lshCandidates(docs).count())
    clear(); time("shingleSets")(Dedup.shingleSets(docs).count())
    clear(); time("shingleSets+persist+2joins") {
      import org.apache.spark.sql.functions._
      val cand = Dedup.lshCandidates(docs)
      val ss = Dedup.shingleSets(docs).persist()
      cand.join(ss.select(col("doc_id").as("a"), col("sl").as("sa"), col("nsh").as("na")), Seq("a"))
        .join(ss.select(col("doc_id").as("b"), col("sl").as("sb"), col("nsh").as("nb")), Seq("b"))
        .count()
    }
    clear(); time("jaccardVerify")(Dedup.jaccardVerify(docs, threshold = 0.3).count())
    spark.stop()
  }
}
