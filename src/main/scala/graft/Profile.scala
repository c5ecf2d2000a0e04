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

    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    // warmup
    docs.count(); Dedup.simhash(docs).count()

    def simhashVariant(nib: (Column, Int) => Column): Long = {
      val tok = docs.select(col("doc_id"),
        explode(graft.ops.Normalize.tokensCol(col("text"))).as("w"))
        .withColumn("h", md5(col("w")))
        .select(col("doc_id") +: (1 to 15).map(j => nib(col("h"), j).as(s"n$j")): _*)
      val votes = (0 until 60).map { bit =>
        val j = bit / 4 + 1
        val b = bit % 4
        sum(shiftright(col(s"n$j"), b) % 2 * 2 - 1).as(s"v$bit")
      }
      val agg = tok.groupBy("doc_id").agg(votes.head, votes.tail: _*).persist()
      val n = agg.count(); agg.unpersist(); n
    }
    clear(); time("simhash_conv")(simhashVariant((h, j) =>
      conv(substring(h, j, 1), 16, 10).cast("long")))
    clear(); time("simhash_ascii")(simhashVariant { (h, j) =>
      val a = ascii(substring(h, j, 1))
      when(a <= 57, a - 48).otherwise(a - 87).cast("long")
    })
    clear(); time("simhashPairs")(Dedup.simhashPairs(docs).count())

    // minhash md5-parse variants: one 7-char conv per half vs a 7-term
    // ascii-nibble polynomial (same values, different parse cost)
    def minhashVariant(xy: Column => Seq[Column]): Long = {
      val halves = Dedup.shingles(docs, 3)
        .select(col("doc_id"), md5(col("shingle")).as("m"))
        .select(col("doc_id") +: xy(col("m")): _*)
      val aggs = (0 until 16).map { i =>
        min((lit(Dedup.minhashA(i)) * col("x") + lit(Dedup.minhashB(i)) * col("y") +
          lit(Dedup.minhashC(i))) % Dedup.MinhashP).as(s"h$i")
      }
      halves.groupBy("doc_id").agg(aggs.head, aggs.tail: _*).count()
    }
    clear(); time("minhash_conv")(minhashVariant(m => Seq(
      conv(substring(m, 1, 7), 16, 10).cast("long").as("x"),
      conv(substring(m, 8, 7), 16, 10).cast("long").as("y"))))
    // the ascii variant is the SHIPPED parser, not a re-implementation
    clear(); time("minhash_ascii")(minhashVariant(m => Seq(
      Dedup.md5Half(m, 1).as("x"), Dedup.md5Half(m, 8).as("y"))))

    if (args.contains("--substring")) {
      import org.apache.spark.storage.StorageLevel
      clear()
      time("sub_anchors")(Dedup.substringAnchors(docs, 16, 15).count())
      val an = Dedup.substringAnchors(docs, 16, 15).persist(StorageLevel.MEMORY_AND_DISK)
      time("sub_anchors_persist")(an.count())
      time("sub_guard_agg")(an.groupBy("h").agg(count(lit(1)).as("pn"))
        .agg(max(col("pn"))).count())
      val cand = an.select(col("h"), col("doc_id").as("a"), col("pos").as("pa"))
        .join(an.select(col("h"), col("doc_id").as("b"), col("pos").as("pb")), Seq("h"))
        .filter(col("a") < col("b"))
        .select("a", "pa", "b", "pb")
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("sub_candidates")(cand.count())
      import graft.functions.CommonAffix.{commonPrefixLen, commonSuffixLen}
      val withText = cand
        .join(docs.select(col("doc_id").as("a"), col("text").as("ta")), Seq("a"))
        .join(docs.select(col("doc_id").as("b"), col("text").as("tb")), Seq("b"))
        .repartition(32)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("sub_withtext")(withText.count())
      time("sub_extend")(withText
        .withColumn("ext_r", commonPrefixLen(
          col("ta").substr(col("pa").cast("int"), length(col("ta"))),
          col("tb").substr(col("pb").cast("int"), length(col("tb")))))
        .withColumn("ext_l", commonSuffixLen(
          col("ta").substr(lit(1), (col("pa") - 1).cast("int")),
          col("tb").substr(lit(1), (col("pb") - 1).cast("int"))))
        .withColumn("match_len", col("ext_l") + col("ext_r"))
        .filter(col("match_len") >= 30)
        .select(col("a"), col("b"),
          (col("pa") - col("ext_l")).cast("long").as("sa"),
          (col("pb") - col("ext_l")).cast("long").as("sb"),
          col("match_len").cast("long").as("match_len"))
        .distinct().count())
      clear()
      time("sub_full")(Dedup.substringMatches(docs, 30, 16, 15).count())
      for ((kk, ww) <- Seq((20, 11), (24, 7), (26, 5), (28, 3))) {
        clear()
        val a2 = Dedup.substringAnchors(docs, kk, ww).persist(StorageLevel.MEMORY_AND_DISK)
        time(s"sub_anchors_k${kk}_w$ww")(a2.count())
        time(s"sub_cand_k${kk}_w$ww")(
          a2.select(col("h"), col("doc_id").as("a"), col("pos").as("pa"))
            .join(a2.select(col("h"), col("doc_id").as("b"), col("pos").as("pb")), Seq("h"))
            .filter(col("a") < col("b")).count())
        time(s"sub_full_k${kk}_w$ww")(Dedup.substringMatches(docs, 30, kk, ww).count())
        a2.unpersist()
      }
    }
    spark.stop()
  }
}
