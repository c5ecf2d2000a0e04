package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.events.Events
import graft.streaming.EventsStream

/** Timestamp-unit regression suite for the events operators.
  *
  * The driver has regenerated `events.parquet` with a different `ts`
  * physical type once already (TIMESTAMP(NANOS) read as epoch-nanos BIGINT
  * under `nanosAsLong` → TIMESTAMP(MICROS) read as TIMESTAMP_NTZ), which
  * silently broke every event-time query for a round. This suite writes the
  * same tiny event set in all three unit flavors [[Events.tsMicros]]
  * dispatches on and pins bit-identical results across them — batch AND
  * streaming — so the next regeneration fails HERE with a clear message
  * instead of as a registry-wide analysis error.
  */
class EventsSpec extends SparkSpec {

  import org.apache.spark.sql.Row

  /** (event_id, ts_us, user_id, event_type, value, props) — two users, a
    * session gap, two event types across three hours. Timestamps sit on a
    * realistic 2023 base (not near epoch zero) so the epoch-nanos
    * magnitude guard in [[Events.tsMicrosFor]] sees plausible values,
    * exactly like production data would. */
  private val baseUs = 1700000000L * 1000 * 1000 // 2023-11-14T22:13:20Z
  private val rowsUs: Seq[(Long, Long, Long, String, Double, String)] = {
    val minUs = 60L * 1000 * 1000
    Seq(
      (1L, baseUs + 5 * minUs, 1L, "click", 1.5, "{}"),
      (2L, baseUs + 12 * minUs, 1L, "click", 2.5, "{}"),
      (3L, baseUs + 95 * minUs, 1L, "purchase", 10.0, "{}"),   // >30min gap -> new session
      (4L, baseUs + 7 * minUs, 2L, "error", 0.0, "{}"),
      (5L, baseUs + 130 * minUs, 2L, "click", 3.0, "{}"))
  }

  /** The same events parquet'd with `ts` in each unit flavor, as
    * directories so both the batch readers and the file-stream source can
    * consume them. Each variant round-trips through parquet so the test
    * pins the actual read-back dtypes. (The nanos variant writes a plain
    * BIGINT column — Spark cannot author a TIMESTAMP(NANOS) footer, so
    * this pins the LongType dispatch path, the dtype-equivalent of a
    * legacy `nanosAsLong` read rather than the legacy read itself.) */
  private def variantDirs(): Map[String, String] = {
    import spark.implicits._
    val base = rowsUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def write(tag: String, df: DataFrame): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"events_units_$tag").toString
      df.coalesce(1).write.mode("overwrite").parquet(dir)
      dir
    }
    Map(
      // legacy generation: epoch-nanos BIGINT (what nanosAsLong produced)
      "nanos_long" -> write("nanos", base.withColumn("ts", col("ts") * 1000L)),
      // current generation: TIMESTAMP(MICROS) without UTC adjustment -> NTZ
      "micros_ntz" -> write("ntz",
        base.withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))),
      // UTC-adjusted micros -> TimestampType
      "micros_tz" -> write("tz", base.withColumn("ts", timestamp_micros(col("ts")))))
  }

  private def variants(): Map[String, DataFrame] =
    variantDirs().view.mapValues(spark.read.parquet(_)).toMap

  private def sortedRows(df: DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.toString)

  test("tsMicros reads back each parquet unit flavor as the expected dtype") {
    val vs = variants()
    assert(vs("nanos_long").schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(vs("micros_ntz").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(vs("micros_tz").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    vs.foreach { case (tag, df) =>
      val us = df.select(Events.tsMicros(df).as("us")).orderBy("us")
        .collect().map(_.getLong(0)).toSeq
      assert(us == rowsUs.map(_._2).sorted, s"$tag: ts_us mismatch")
    }
  }

  test("hourlyByType and sessionize are identical across all ts unit flavors") {
    val vs = variants()
    val hourly = vs.view.mapValues(df => sortedRows(Events.hourlyByType(df))).toMap
    val sessions = vs.view.mapValues(df =>
      sortedRows(Events.sessionize(df, gapMinutes = 30))).toMap
    for (tag <- Seq("micros_ntz", "micros_tz")) {
      assert(hourly(tag) == hourly("nanos_long"),
        s"hourlyByType($tag) diverges from the nanos-long baseline")
      assert(sessions(tag) == sessions("nanos_long"),
        s"sessionize($tag) diverges from the nanos-long baseline")
    }
    // and the absolute content is what the fixture implies: 5 events, 4
    // sessions (user 1 splits on the 83-minute gap, user 2 on the 123-minute)
    assert(hourly("nanos_long").map(_.getLong(2)).sum == 5L)
    assert(sessions("nanos_long").size == 4)
  }

  test("streaming hourlyCounts matches batch hourlyByType on every ts unit flavor") {
    // the r10 gotcha: the batch side was dtype-adaptive but the stream
    // source schema pinned one flavor, so a regeneration would have broken
    // only the streaming specs. readStream now discovers the flavor from a
    // footer peek — drive a real file-stream through each variant and pin
    // it against the batch twin.
    variantDirs().foreach { case (tag, dir) =>
      val q = EventsStream.hourlyCounts(EventsStream.readStream(spark, dir))
        .writeStream.outputMode("complete").format("memory").queryName(s"evu_$tag")
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable()
      q.stop()
      val streamed = sortedRows(spark.table(s"evu_$tag"))
      val batch = sortedRows(Events.hourlyByType(spark.read.parquet(dir)))
      assert(streamed == batch, s"$tag: streaming hourly != batch twin")
    }
  }

  test("a REAL TIMESTAMP(NANOS) footer takes the legacy nanosAsLong read path end to end") {
    // the checked-in fixture carries an actual parquet TIMESTAMP(NANOS)
    // logical type (authored with pyarrow — Spark cannot write one), so
    // this exercises the legacy `nanosAsLong` read itself, not just its
    // dtype-equivalent plain-BIGINT twin: dropping the flag from a
    // session builder, or a Spark upgrade changing the legacy read, fails
    // HERE and nowhere else
    val dir = getClass.getResource("/events").getPath
    val df = spark.read.parquet(s"$dir/events_nanos.parquet")
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.LongType,
      s"nanosAsLong read must surface TIMESTAMP(NANOS) as BIGINT, got ${df.schema("ts").dataType}")
    val us = df.select(Events.tsMicros(df).as("us")).orderBy("us")
      .collect().map(_.getLong(0)).toSeq
    assert(us == rowsUs.map(_._2).sorted, "ts_us mismatch on the real NANOS footer")
    // and the operators agree with the dtype-equivalent BIGINT variant
    assert(sortedRows(Events.hourlyByType(df)) ==
      sortedRows(Events.hourlyByType(variants()("nanos_long"))))
  }

  test("the BIGINT branch rejects micros-scale values instead of silently dividing") {
    import spark.implicits._
    // epoch-MICROS magnitudes (~1e15 for 2023 dates) are 1000x below any
    // plausible epoch-nanos value — a regeneration to plain micros BIGINT
    // must fail loudly, not shrink every timestamp 1000x
    val microsScale = rowsUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val e = intercept[Exception] {
      microsScale.select(Events.tsMicros(microsScale).as("us")).collect()
    }
    assert(e.getMessage.contains("epoch-nanos"), s"unexpected error: ${e.getMessage}")
  }

  test("tsMicros rejects an unusable ts dtype with a clear message") {
    import spark.implicits._
    val bad = Seq((1L, "not-a-ts")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Events.tsMicros(bad))
    assert(e.getMessage.contains("ts"))
  }

  test("anomaly: a planted volume spike flags, the flat baseline does not") {
    import spark.implicits._
    def ns(hour: Long, i: Long) = 1700000000000000000L + hour * 3600L * 1000000000L + i * 1000000000L
    // 30 hours of steady 5 events/hour, then one hour with 50 (the spike)
    val steady = for (h <- 0L until 30L; i <- 0L until 5L) yield (h * 100 + i, ns(h, i), 1L, "click")
    val spike = (0L until 50L).map(i => (9000 + i, ns(30, i), 1L, "click"))
    val rows = (steady ++ spike)
      .map { case (eid, t, uid, ty) => (eid, t, uid, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.hourlyAnomaly(rows).collect()
      .map(r => r.getAs[Long]("hour") ->
        ((r.getAs[Boolean]("is_anomaly"), Option(r.getAs[Any]("z"))))).toMap
    val hours = got.keys.toSeq.sorted
    // the first 12 hours are suppressed (cold start), the spike hour flags
    assert(hours.size == 31 - 12, s"expected ${31 - 12} scored hours, got ${hours.size}")
    val spikeHour = hours.max
    assert(got(spikeHour)._1, "the 10x spike must flag")
    // a perfectly flat baseline z-scores as exactly 0 under the 1.0
    // variance floor -> never flags
    hours.filter(_ != spikeHour).foreach { h =>
      assert(!got(h)._1 && got(h)._2 == Some(0.0), s"flat hour $h must not flag: ${got(h)}")
    }
  }

  test("transitions: adjacent pairs per user, probabilities normalize per from-type") {
    import spark.implicits._
    def ns(minute: Long) = 1700000000000000000L + minute * 60L * 1000000000L
    // u1: A -> B -> A ; u2: A -> B. Cross-user adjacency must NOT count.
    val rows = Seq(
      (1L, ns(1), 1L, "A"), (2L, ns(2), 1L, "B"), (3L, ns(3), 1L, "A"),
      (4L, ns(1), 2L, "A"), (5L, ns(2), 2L, "B"))
      .map { case (eid, t, uid, ty) => (eid, t, uid, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.transitions(rows).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p")))).toMap
    assert(got == Map(("A", "B") -> ((2L, 1.0)), ("B", "A") -> ((1L, 1.0))), s"got $got")
  }

  test("retention: day cohorts count returning users, offset 0 pins 1.0") {
    import spark.implicits._
    val day = 86400L * 1000000000L
    val base = 1700006400000000000L // an exact day boundary won't matter; div buckets
    // u1,u2 first seen day 0; u1 returns day 1 and 2, u2 never returns;
    // u3 first seen day 1, returns day 2
    val rows = Seq(
      (1L, base, 1L), (2L, base + day, 1L), (3L, base + 2 * day, 1L),
      (4L, base, 2L),
      (5L, base + day, 3L), (6L, base + 2 * day, 3L))
      .map { case (eid, t, uid) => (eid, t, uid, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.retention(rows, maxPeriods = 3).collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("offset")) ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"), r.getAs[Double]("retention")))).toMap
    val c0 = got.keys.map(_._1).min
    assert(got((c0, 0L)) == ((2L, 2L, 1.0)))      // day-0 cohort: u1, u2
    assert(got((c0, 1L)) == ((1L, 2L, 0.5)))      // only u1 returns next day
    assert(got((c0, 2L)) == ((1L, 2L, 0.5)))
    assert(got((c0 + 1, 0L)) == ((1L, 1L, 1.0)))  // day-1 cohort: u3
    assert(got((c0 + 1, 1L)) == ((1L, 1L, 1.0)))
    assert(!got.contains((c0 + 1, 2L)), "no activity row beyond observed periods")
  }

  test("funnel: ordering and window rules decide who converts") {
    import spark.implicits._
    // realistic epoch-nanos (the BIGINT branch rejects sub-1973 magnitudes)
    def ns(minute: Long) = 1700000000000000000L + minute * 60L * 1000000000L
    // u1 converts fully in order; u2 clicked BEFORE signup (ordering
    // violation); u3 purchased 130min after click (window violation at
    // 1h); u4 never signed up
    val rows = Seq(
      (1L, ns(10), 1L, "signup"), (2L, ns(20), 1L, "click"), (3L, ns(30), 1L, "purchase"),
      (4L, ns(10), 2L, "click"), (5L, ns(20), 2L, "signup"), (6L, ns(30), 2L, "purchase"),
      (7L, ns(10), 3L, "signup"), (8L, ns(20), 3L, "click"), (9L, ns(150), 3L, "purchase"),
      (10L, ns(10), 4L, "click"), (11L, ns(20), 4L, "purchase"))
      .map { case (eid, t, uid, ty) => (eid, t, uid, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.funnel(rows, Seq("signup", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("step") ->
        ((r.getAs[String]("event_type"), r.getAs[Long]("n_users"), r.getAs[Double]("conversion")))).toMap
    // signed up: u1, u2, u3; clicked after signup in-window: u1, u3
    // (u2's click predates signup); purchased after that click in-window:
    // u1 only (u3's purchase is 130min later). But u2's purchase at 30min
    // follows no valid click, so u2 stops at step 1.
    assert(got(1L) == (("signup", 3L, 1.0)), s"got $got")
    assert(got(2L) == (("click", 2L, 0.666667)), s"got $got")
    assert(got(3L) == (("purchase", 1L, 0.333333)), s"got $got")
  }
}
