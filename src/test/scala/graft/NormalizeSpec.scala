package graft

import org.apache.spark.sql.functions.col
import graft.ops.Normalize

/** cleanToken edge cases per `NGramUtils.java:29-39` (SURVEY §5.2). */
class NormalizeSpec extends SparkSpec {

  private def clean(in: String*): Seq[String] = {
    import spark.implicits._
    in.toDF("w").select(Normalize.cleanToken(col("w")).as("c")).collect().map(_.getString(0)).toSeq
  }

  test("POS suffix stripped only at idx>0") {
    assert(clean("analysis_NOUN") == Seq("analysis"))
    assert(clean("a_b_c") == Seq("a"))
    // leading underscore: POS strip skipped, then leading punctuation strip eats it
    assert(clean("_foo") == Seq("foo"))
  }

  test("punctuation-edge trimming keeps interior") {
    assert(clean("(hello)", "--x--", "don't") == Seq("hello", "x", "don't"))
  }

  test("lowercase + trim") {
    assert(clean("  HeLLo  ") == Seq("hello"))
  }

  test("punctuation-only and empty become empty string") {
    assert(clean("--", "", "  ", "_") == Seq("", "", "", ""))
  }

  test("unicode letters survive (Hebrew, accents)") {
    assert(clean("שלום_X", "café!") == Seq("שלום", "café"))
  }

  test("BOM-prefixed token is stripped to the word") {
    assert(clean("﻿word") == Seq("word"))
  }

  test("toDecade truncates to decade") {
    import spark.implicits._
    val got = Seq(1994, 2000, 2009).toDF("y")
      .select(Normalize.toDecade(col("y")).as("d")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1990L, 2000L, 2000L))
  }

  test("tokensCol cleans, drops empties; bigramsCol pairs adjacent") {
    import spark.implicits._
    val df = Seq("The (quick) -- fox_V jumps").toDF("text")
    val toks = df.select(Normalize.tokensCol(col("text")).as("t"))
      .collect().head.getSeq[String](0)
    assert(toks == Seq("the", "quick", "fox", "jumps"))
    val pairs = df.select(Normalize.bigramsCol(Normalize.tokensCol(col("text"))).as("p"))
      .selectExpr("transform(p, x -> concat(x.w1, ' ', x.w2)) s")
      .collect().head.getSeq[String](0)
    assert(pairs == Seq("the quick", "quick fox", "fox jumps"))
  }

  test("single-token text yields no bigram rows (explode skips null)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.explode
    val n = Seq("word", "").toDF("text")
      .select(explode(Normalize.bigramsCol(Normalize.tokensCol(col("text")))).as("p"))
      .count()
    assert(n == 0L)
  }
}
