package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: watermarked tumbling-window
  * aggregation and custom sessionization state via
  * `flatMapGroupsWithState`. The reference has no event-time streaming
  * (SURVEY §2.9) — this is the engine-completeness extension, and the
  * batch twins in [[graft.events.Events]] carry the DuckDB oracles.
  *
  * Scale notes: the windowed aggregate is partial-aggregated before the
  * state-store shuffle; the watermark bounds state size (late data beyond
  * 10 minutes is dropped); sessionization state is one small case class
  * per active user, evicted by processing-time timeout.
  */
object EventsStream {

  /** Event schema with `ts` in a given unit flavor. A streaming file
    * source must declare ONE concrete schema up front, but the testdata
    * has shipped `ts` as TIMESTAMP(NANOS)→BIGINT, TIMESTAMP_NTZ and
    * TIMESTAMP across generations — so [[readStream]] discovers the
    * directory's actual flavor from one batch footer peek ([[tsTypeOf]])
    * instead of pinning a compile-time type, mirroring the batch side's
    * [[graft.events.Events.tsMicros]] dispatch. A regeneration to any
    * known flavor breaks neither engine. */
  def schemaFor(tsType: org.apache.spark.sql.types.DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The current testdata generation's flavor (TIMESTAMP(MICROS) without
    * UTC adjustment → TIMESTAMP_NTZ) — the [[readStream]] fallback when a
    * watch directory has no file to peek at yet, and the fixture-writing
    * schema in tests. */
  val schema: StructType = schemaFor(TimestampNTZType)

  /** The directory's actual `ts` dtype from a one-footer batch peek; the
    * current-generation default when the directory is still empty (a
    * stream may start watching before the first file drops — batches read
    * after files arrive still use the discovered-at-start schema, so a
    * producer switching units mid-stream needs a restart, same as any
    * schema change on a file stream). */
  private[graft] def tsTypeOf(spark: SparkSession, dir: String): org.apache.spark.sql.types.DataType =
    try spark.read.parquet(dir).schema("ts").dataType
    catch { case _: org.apache.spark.sql.AnalysisException => TimestampNTZType }

  /** Streaming source over a parquet directory (one file = one batch in
    * tests via `maxFilesPerTrigger`). Normalizes to the two derived
    * columns every downstream streaming operator keys on: `ts_us`
    * (epoch-micros BIGINT, the batch twins' unit, via the SAME dtype
    * dispatch as the batch side — session TZ is UTC so the NTZ cast is
    * the identity on the epoch value) and `event_ts` (TIMESTAMP, what
    * watermarks/window() require). */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val tsType = tsTypeOf(spark, dir)
    spark.readStream.schema(schemaFor(tsType))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("ts_us", graft.events.Events.tsMicrosFor(tsType))
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
  }

  /** Running hourly (hour, event_type) counts — the reference-shaped
    * INCREMENTAL ingestion twin of [[graft.events.Events.hourlyByType]],
    * same contract as [[NGramStream.unigramCounts]]: event files drop into
    * a directory, only new files are read per micro-batch, and the running
    * table must equal the batch engine re-run on everything so far
    * (StreamingSpec pins this after every drop). Same hour-bucket and
    * decimal-sum algebra as the batch path, so the twin is bit-comparable.
    * No watermark: the key domain is (bounded hours × event types), so
    * state is domain-bounded like the ngram vocabulary, not time-unbounded. */
  def hourlyCounts(stream: DataFrame): DataFrame =
    stream
      .groupBy(graft.events.Events.hourBucket(col("ts_us")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Watermarked tumbling 5-minute window per event type. */
  def windowedCounts(stream: DataFrame): DataFrame =
    stream
      .withWatermark("event_ts", "10 minutes")
      .groupBy(window(col("event_ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))

  /** Watermarked sliding window (1 h length / 30 min slide) per event
    * type — the streaming twin of [[graft.events.Events.slidingByType]],
    * which decomposes the same way: each event expands to its covering
    * windows before one partial-aggregated state update. */
  def slidingCounts(stream: DataFrame): DataFrame =
    stream
      .withWatermark("event_ts", "10 minutes")
      .groupBy(window(col("event_ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  case class Ev(user_id: Long, ts_us: Long)
  case class SessionState(start: Long, last: Long, n: Int)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Int)

  /** Gap-based sessionization with explicit state: emits a session when a
    * gap > `gapMinutes` is OBSERVED in the data (streaming twin of
    * [[graft.events.Events.sessionize]] — data-driven closes keep the two
    * bit-comparable, which StreamingSpec pins). Cross-trigger out-of-order
    * events can only extend the current session (`start`/`last` move
    * monotonically via min/max), never corrupt later gap comparisons.
    * NOTE on state: each user holds one small SessionState and nothing is
    * evicted here — a deployment that must bound state for churned users
    * switches to `GroupStateTimeout.EventTimeTimeout` with
    * `setTimeoutTimestamp(last + gap)` and emits on `hasTimedOut`, at the
    * cost of closing idle sessions by watermark instead of by observed
    * gap (the two differ exactly on each user's final session). */
  def sessionize(stream: DataFrame, gapMinutes: Int = 30): Dataset[Session] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000 * 1000
    stream.select(col("user_id"), col("ts_us")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, events: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = events.map(_.ts_us).toSeq.sorted
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          sorted.foreach { t =>
            st match {
              case null => st = SessionState(t, t, 1)
              case s if t - s.last > gapUs =>
                out += Session(userId, s.start, s.last, s.n)
                st = SessionState(t, t, 1)
              case s =>
                // late arrival folds in without moving `last` backwards
                st = SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Streaming exact-dedup: drop repeated event_ids, with a watermark so
    * the seen-keys state is evicted once events age out — the streaming
    * twin of exact deduplication, state bounded like every other stateful
    * operator here. */
  def dedupedEvents(stream: DataFrame): DataFrame =
    stream
      .withWatermark("event_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each error event matched to the same
    * user's purchase events in the preceding 10 minutes. Watermarks on
    * both sides + the time-range predicate bound the join state — the
    * requirements Spark enforces before it will run a stream-stream join
    * at all. */
  def errorsJoinedToRecentPurchases(stream: DataFrame): DataFrame = {
    val errors = stream.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_ts").as("err_ts"), col("event_id").as("err_id"))
      .withWatermark("err_ts", "10 minutes")
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", "10 minutes")
    errors.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") <= col("err_ts") &&
        col("p_ts") >= col("err_ts") - expr("INTERVAL 10 MINUTES"))
      .select("err_id", "user_id", "err_ts", "p_id", "p_ts")
  }

  /** Run the windowed aggregate over a static parquet dir synchronously
    * (memory sink), returning the complete result table. */
  def runWindowedBatch(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q = windowedCounts(readStream(spark, dir))
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
