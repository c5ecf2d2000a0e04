package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    time("shingles")(Dedup.shingles(docs).count())
    time("minhashSignatures")(Dedup.minhashSignatures(docs).count())
    time("lshBuckets")(Dedup.lshBuckets(docs).count())
    time("lshCandidates")(Dedup.lshCandidates(docs).count())
    time("jaccard_inter_join") {
      val sh = Dedup.shingles(docs)
      import org.apache.spark.sql.functions._
      sh.select(col("shingle"), col("doc_id").as("a"))
        .join(sh.select(col("shingle"), col("doc_id").as("b")), Seq("shingle"))
        .filter(col("a") < col("b")).count()
    }
    time("jaccardPairs")(Dedup.jaccardPairs(docs, threshold = 0.3).count())
    time("embeddingPairs")(Dedup.closestEmbeddingPairs(emb).count())
    spark.stop()
  }
}
