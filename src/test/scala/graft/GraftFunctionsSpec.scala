package graft

import graft.functions.{GraftFunctions, RollingHash}

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions resolve to the codegen'd expressions") {
    import spark.implicits._
    GraftFunctions.register(spark)
    GraftFunctions.register(spark) // idempotent
    Seq((1L, "hello"), (2L, "")).toDF("id", "t").createOrReplaceTempView("tt")
    val rh = spark.sql("SELECT id, graft_rolling_hash(t) AS h FROM tt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rh(1L) == RollingHash.compute("hello") && rh(2L) == 0L)
    val d = spark.sql("SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(d == 32.0)
    // NFC: 'e' + combining acute composes to precomposed é (the char is
    // inlined into the SQL text: Spark's chr() is byte-valued, not
    // codepoint-valued like DuckDB's)
    val nfc = spark.sql(
      s"SELECT graft_nfc_normalize('cafe${0x0301.toChar}') AS n, graft_nfc_normalize('ascii') AS a")
      .collect().head
    assert(nfc.getString(0) == "caf" + 0x00E9.toChar && nfc.getString(1) == "ascii")
    // literal bounds fold at resolution into the binary-search model;
    // integer literals cast to the double[] the expression carries
    // strictly-before counting: a value EQUAL to a bound stays in the
    // earlier bucket, so ids 0-3 -> 0, 4-7 -> 1, 8-9 -> 2
    val b = spark.sql(
      "SELECT graft_bucket_of(CAST(id AS DOUBLE), array(3, 7), true) AS b FROM range(10)")
      .collect().map(_.getInt(0))
    assert(b.count(_ == 0) == 4 && b.count(_ == 1) == 4 && b.count(_ == 2) == 2)
    // non-literal bounds must be rejected, not silently mis-planned
    intercept[Exception] {
      spark.sql("SELECT graft_bucket_of(CAST(id AS DOUBLE), array(CAST(id AS DOUBLE)), true) FROM range(3)")
        .collect()
    }
  }

  test("registration is session-scoped and installable on fresh sessions") {
    // a new session gets a fresh function registry: the graft functions
    // are absent until registered (GraftExtensions drives the same specs
    // list at session build for spark.sql.extensions deployments)
    val s2 = spark.newSession()
    intercept[Exception] {
      s2.sql("SELECT graft_rolling_hash('abc') AS h").collect()
    }
    GraftFunctions.register(s2)
    val ok = s2.sql("SELECT graft_rolling_hash('abc') AS h").collect().head.getLong(0)
    assert(ok == RollingHash.compute("abc"))
  }
}
