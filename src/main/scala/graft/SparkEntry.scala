package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.collocations.Collocations
import graft.ops.{Normalize, Stopwords}

/** Driver contract — one named query per implemented operator (SURVEY.md
  * §2.11), each paired with DuckDB oracle SQL built in [[OracleSql]] /
  * inline below. Column names and types are aligned between the Spark query
  * and the oracle (the driver sorts columns by name and hash-compares
  * values): counts/sums of integers are BIGINT on both sides, money sums go
  * through DECIMAL(18,2) (exact, order-independent) and are cast to DOUBLE
  * at the end, and every derived double (LLR, ratios) is rounded to 6
  * decimals on both sides.
  */
object SparkEntry {

  private type Q = (SparkSession, String) => DataFrame

  /** (name, spark query, Some(oracle sql)) triples — kept adjacent so the
    * two implementations stay visibly in lockstep. */
  private lazy val registry: Seq[(String, Q, Option[String])] = Seq(

    // ---------------------------------------------------------------- S1/P1
    ("scan_project",
      (s: SparkSession, d: String) =>
        s.read.parquet(s"$d/lineitem.parquet")
          .filter(col("l_quantity") > 45 && col("l_shipdate") < lit("2000-01-01 00:00:00").cast("timestamp"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_quantity > 45 AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'""".stripMargin)),

    // ------------------------------------------------------------------- S2
    ("union_sources",
      (s: SparkSession, d: String) => {
        val c = s.read.parquet(s"$d/customer.parquet")
          .select(col("c_name").as("name"), col("c_nationkey").cast("long").as("nationkey"),
            col("c_acctbal").as("acctbal"), lit("customer").as("kind"))
        val p = s.read.parquet(s"$d/supplier.parquet")
          .select(col("s_name").as("name"), col("s_nationkey").cast("long").as("nationkey"),
            col("s_acctbal").as("acctbal"), lit("supplier").as("kind"))
        c.unionByName(p)
      },
      Some("""SELECT c_name AS name, CAST(c_nationkey AS BIGINT) AS nationkey, c_acctbal AS acctbal, 'customer' AS kind FROM customer
             |UNION ALL
             |SELECT s_name AS name, CAST(s_nationkey AS BIGINT) AS nationkey, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier""".stripMargin)),

    // ---------------------------------------------------------------- P2/P3
    ("filter_predicates",
      (s: SparkSession, d: String) =>
        s.read.parquet(s"$d/events.parquet")
          .withColumn("k", regexp_extract(col("props"), "([0-9]+)", 1).cast("long"))
          .filter(col("k").isNotNull && col("value") > 0)
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"), sum("k").as("sum_k")),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(k) AS BIGINT) AS sum_k
             |FROM (SELECT event_type, value, CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS k FROM events)
             |WHERE k IS NOT NULL AND value > 0
             |GROUP BY event_type""".stripMargin)),

    // ---------------------------------------------------------------- P5/F1
    ("clean_token",
      (s: SparkSession, d: String) =>
        Collocations.tokenized(Collocations.documents(s, d))
          .select(col("lang"), explode(col("toks")).as("w"))
          .groupBy("lang", "w").agg(count(lit(1)).as("cnt")),
      Some(s"""WITH ${OracleSql.toksCte}
              |SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY lang, w""".stripMargin)),

    // ---------------------------------------------------------------- P7/F2
    ("decade_bucket",
      (s: SparkSession, d: String) =>
        s.read.parquet(s"$d/orders.parquet")
          .withColumn("decade", Normalize.toDecade(year(col("o_orderdate"))))
          .groupBy("decade")
          .agg(count(lit(1)).as("cnt"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price")),
      Some("""SELECT CAST(floor(year(o_orderdate) / 10) * 10 AS BIGINT) AS decade,
             |       CAST(count(*) AS BIGINT) AS cnt,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY 1""".stripMargin)),

    // ---------------------------------------------------------------- P6/J4
    ("stopword_anti_join",
      (s: SparkSession, d: String) =>
        Collocations.unigrams(Collocations.documents(s, d)).distinct(),
      Some(s"""WITH ${OracleSql.toksCte}
              |SELECT DISTINCT lang, w FROM toks WHERE w NOT IN (${Stopwords.sqlList})""".stripMargin)),

    // ---------------------------------------------------------------- A1/A2
    ("agg_unigrams",
      (s: SparkSession, d: String) =>
        Collocations.unigramCounts(Collocations.documents(s, d)),
      Some(s"""WITH ${OracleSql.toksCte},
              |${OracleSql.uniCte}
              |SELECT lang, w, c FROM uni""".stripMargin)),

    // ------------------------------------------------------------------- A3
    ("agg_bigrams",
      (s: SparkSession, d: String) =>
        Collocations.bigramCounts(Collocations.documents(s, d)),
      Some(s"""WITH ${OracleSql.toksCte},
              |${OracleSql.bgCte}
              |SELECT lang, w1, w2, c12 FROM bg""".stripMargin)),

    // ------------------------------------------------------------------- A4
    ("agg_grand_total_n",
      (s: SparkSession, d: String) =>
        Collocations.grandTotalN(Collocations.documents(s, d)),
      Some(s"""WITH ${OracleSql.toksCte},
              |${OracleSql.uniCte},
              |${OracleSql.nCte}
              |SELECT lang, n FROM ntab""".stripMargin)),

    // ------------------------------------------------------------------- J1
    ("join_c1",
      (s: SparkSession, d: String) =>
        Collocations.joinedC1(Collocations.documents(s, d)),
      Some(s"""WITH ${OracleSql.toksCte},
              |${OracleSql.uniCte},
              |${OracleSql.bgCte}
              |SELECT bg.lang, bg.w1, bg.w2, bg.c12, u1.c AS c1
              |FROM bg JOIN uni u1 ON bg.lang = u1.lang AND bg.w1 = u1.w""".stripMargin)),

    // ------------------------------------------------------------------- J2
    ("join_c2",
      (s: SparkSession, d: String) =>
        Collocations.joinedC2(Collocations.documents(s, d)),
      Some(s"""WITH ${OracleSql.toksCte},
              |${OracleSql.uniCte},
              |${OracleSql.bgCte}
              |SELECT bg.lang, bg.w1, bg.w2, bg.c12, u1.c AS c1, u2.c AS c2
              |FROM bg
              |JOIN uni u1 ON bg.lang = u1.lang AND bg.w1 = u1.w
              |JOIN uni u2 ON bg.lang = u2.lang AND bg.w2 = u2.w""".stripMargin)),

    // ------------------------------------------------------------------- J3
    ("broadcast_join_n",
      (s: SparkSession, d: String) =>
        Collocations.withN(Collocations.documents(s, d)),
      Some(s"""WITH ${OracleSql.toksCte},
              |${OracleSql.uniCte},
              |${OracleSql.nCte},
              |${OracleSql.bgCte},
              |${OracleSql.joinedCte}
              |SELECT lang, w1, w2, c12, c1, c2, n FROM joined""".stripMargin)),

    // --------------------------------------------------------------- F3/P8
    ("llr_score",
      (s: SparkSession, d: String) =>
        Collocations.scored(Collocations.documents(s, d))
          .select(col("lang"), col("w1"), col("w2"), col("c1"), col("c2"), col("c12"), col("n"), col("llr")),
      Some(s"""${OracleSql.collocationCtes}
              |SELECT lang, w1, w2, c1, c2, c12, n, round(llr_raw, 6) AS llr
              |FROM scored WHERE NOT isnan(llr_raw)""".stripMargin)),

    // ------------------------------------------------------------ A5/A6/O2
    ("topk_window",
      (s: SparkSession, d: String) =>
        graft.ops.TopK.topKPerGroup(
          s.read.parquet(s"$d/part.parquet")
            .select(col("p_brand"), col("p_partkey"), col("p_name"), col("p_retailprice")),
          Seq(col("p_brand")),
          Seq(col("p_retailprice").desc, col("p_partkey").asc), 3),
      Some("""SELECT p_brand, p_partkey, p_name, p_retailprice FROM (
             |  SELECT p_brand, p_partkey, p_name, p_retailprice,
             |         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
             |  FROM part
             |) WHERE rn <= 3""".stripMargin)),

    // ------------------------------------------------------- flagship e2e
    ("collocations_e2e",
      (s: SparkSession, d: String) =>
        Collocations.topCollocations(Collocations.documents(s, d)),
      Some(OracleSql.topCollocationsSql(Collocations.K))),

    // ------------------------------------------- generic agg (TPC-H Q1ish)
    ("pricing_summary",
      (s: SparkSession, d: String) => {
        val dec = (c: String) => col(c).cast("decimal(18,2)")
        s.read.parquet(s"$d/lineitem.parquet")
          .filter(col("l_shipdate") <= lit("2001-09-01 00:00:00").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(dec("l_quantity")).cast("double").as("sum_qty"),
            sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
            sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("double").as("sum_disc_price"),
            sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")) * (lit(1) + dec("l_tax"))).cast("double").as("sum_charge"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
             |  CAST(count(*) AS BIGINT) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin))
  )

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Collocations.topCollocations(Collocations.documents(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, q, _) => n -> q }.toMap

  def oracleSql: Map[String, String] =
    registry.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
