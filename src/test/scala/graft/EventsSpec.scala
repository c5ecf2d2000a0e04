package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.events.Events

/** Timestamp-unit regression suite for the events operators.
  *
  * The driver has regenerated `events.parquet` with a different `ts`
  * physical type once already (TIMESTAMP(NANOS) read as epoch-nanos BIGINT
  * under `nanosAsLong` → TIMESTAMP(MICROS) read as TIMESTAMP_NTZ), which
  * silently broke every event-time query for a round. This suite writes the
  * same tiny event set in all three unit flavors [[Events.tsMicros]]
  * dispatches on and pins bit-identical results across them, so the next
  * regeneration fails HERE with a clear message instead of as a registry-wide
  * analysis error.
  */
class EventsSpec extends SparkSpec {

  import org.apache.spark.sql.Row

  /** (event_id, ts_us, user_id, event_type, value, props) — two users, a
    * session gap, two event types across three hours. */
  private val rowsUs: Seq[(Long, Long, Long, String, Double, String)] = {
    val minUs = 60L * 1000 * 1000
    Seq(
      (1L, 5 * minUs, 1L, "click", 1.5, "{}"),
      (2L, 12 * minUs, 1L, "click", 2.5, "{}"),
      (3L, 95 * minUs, 1L, "purchase", 10.0, "{}"),   // >30min gap -> new session
      (4L, 7 * minUs, 2L, "error", 0.0, "{}"),
      (5L, 130 * minUs, 2L, "click", 3.0, "{}"))
  }

  /** The same events parquet'd with `ts` in each unit flavor. Each variant
    * round-trips through parquet so the test exercises the actual read
    * types, not just in-memory schemas. */
  private def variants(): Map[String, DataFrame] = {
    import spark.implicits._
    val base = rowsUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def roundTrip(tag: String, df: DataFrame): DataFrame = {
      val dir = java.nio.file.Files.createTempDirectory(s"events_units_$tag").toString
      df.coalesce(1).write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    Map(
      // legacy generation: epoch-nanos BIGINT (what nanosAsLong produced)
      "nanos_long" -> roundTrip("nanos", base.withColumn("ts", col("ts") * 1000L)),
      // current generation: TIMESTAMP(MICROS) without UTC adjustment -> NTZ
      "micros_ntz" -> roundTrip("ntz",
        base.withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))),
      // UTC-adjusted micros -> TimestampType
      "micros_tz" -> roundTrip("tz", base.withColumn("ts", timestamp_micros(col("ts")))))
  }

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

  test("tsMicros rejects an unusable ts dtype with a clear message") {
    import spark.implicits._
    val bad = Seq((1L, "not-a-ts")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Events.tsMicros(bad))
    assert(e.getMessage.contains("ts"))
  }
}
