package graft

import org.apache.spark.sql.functions._
import graft.events.Events
import graft.streaming.EventsStream

/** Structured Streaming twins vs their batch oracles on the sf0.001 events
  * table (read as a one-file streaming source). */
class StreamingSpec extends SparkSpec {

  /** The streaming file source needs a directory; stage the single events
    * file into a temp dir. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("watermarked tumbling-window counts equal the batch window aggregation") {
    val streamed = EventsStream.runWindowedBatch(spark, dir, "win_test")
      .select(unix_micros(col("window.start")).as("w_start"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    val batch = Events.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts_us", Events.tsMicros)
      .groupBy((expr("ts_us div 300000000") * 300000000L).as("w_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(streamed == batch)
  }

  test("sliding-window streaming counts equal the batch covering-window explode") {
    val q = EventsStream.slidingCounts(EventsStream.readStream(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName("slide_test").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("slide_test")
      .select(unix_micros(col("window.start")).as("w_start"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Events.slidingByType(Events.events(spark, "/root/testdata/sf0.001"))
      .select(col("w_start"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    import org.apache.spark.sql.functions._
    // stage the same file twice -> every event arrives twice
    val d = java.nio.file.Files.createTempDirectory("events_dup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"), d.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"), d.resolve("b.parquet"))
    val q = EventsStream.dedupedEvents(EventsStream.readStream(spark, d.toString))
      .writeStream.outputMode("append").format("memory").queryName("dedup_test").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_test").count()
    val want = Events.events(spark, "/root/testdata/sf0.001").count()
    assert(got == want, s"expected $want deduped events, got $got")
  }

  test("stream-stream interval join matches the batch interval join") {
    import org.apache.spark.sql.functions._
    val q = EventsStream.errorsJoinedToRecentPurchases(EventsStream.readStream(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("ssj_test").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ssj_test")
      .select("err_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = Events.events(spark, "/root/testdata/sf0.001").withColumn("ts_us", Events.tsMicros)
    val err = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_us").as("err_ts"), col("event_id").as("err_id"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_us").as("p_ts"), col("event_id").as("p_id"))
    val batch = err.join(pur,
        col("user_id") === col("p_user") &&
          col("p_ts") <= col("err_ts") &&
          col("p_ts") >= col("err_ts") - lit(600000000L))
      .select("err_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
  }

  test("stateful streaming sessionization matches batch sessions (closed sessions)") {
    val closed = EventsStream.sessionize(EventsStream.readStream(spark, dir))
    val q = closed.writeStream.outputMode("append").format("memory").queryName("sess_test").start()
    q.processAllAvailable(); q.stop()
    val streamedSessions = spark.table("sess_test")
      .select(col("user_id"), (col("end_us") - col("start_us")).as("dur"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .groupBy(identity).view.mapValues(_.length).toMap

    val batch = Events.sessionize(Events.events(spark, "/root/testdata/sf0.001"))
    // streaming emits only closed sessions: every user's last batch session stays open
    val lastPerUser = batch.groupBy("user_id").agg(max("session_id").as("session_id"))
    val batchClosed = batch.join(lastPerUser, Seq("user_id", "session_id"), "left_anti")
      .select(col("user_id"), col("duration_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length).toMap

    assert(streamedSessions == batchClosed)
  }
}
