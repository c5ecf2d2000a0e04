package graft

/** Results must not depend on the physical join strategy: at small SF the
  * vocabulary joins broadcast, at 100 TB they sort-merge — this pins that
  * both plans compute identical bytes (the flagship's correctness is
  * structural, not an artifact of the broadcast path the gate happens to
  * take locally). */
class JoinStrategySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("flagship results are identical under broadcast and sort-merge strategies") {
    def run(): Seq[String] =
      SparkEntry.queries("collocations_e2e")(spark, sf)
        .collect().map(_.mkString("|")).sorted.toSeq
    val broadcastPlan = run()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val p = SparkEntry.queries("collocations_e2e")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected sort-merge under disabled broadcast:\n$p")
      assert(run() == broadcastPlan, "join strategy changed the result")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
