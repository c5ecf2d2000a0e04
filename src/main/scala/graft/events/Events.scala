package graft.events

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Event-table operators: time bucketing, sessionization, and windowed
  * analytics. Every derivation here first normalizes `ts` to epoch-micros
  * BIGINT (`ts_us`) so both engines operate on identical integers — DuckDB's
  * side is always `epoch_us(ts)`. The parquet `ts` physical type has shipped
  * as both TIMESTAMP(NANOS) (read as epoch-nanos BIGINT under
  * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS) (read as
  * TIMESTAMP / TIMESTAMP_NTZ), so the micros derivation dispatches on the
  * actual column dtype instead of assuming one unit.
  */
object Events {

  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  /** Any plausible epoch-NANOS magnitude (dates after ~1973) exceeds this;
    * epoch-MICROS magnitudes for the same dates are ~1000x smaller. The
    * gap lets the BIGINT branch of [[tsMicrosFor]] verify its unit
    * assumption per row instead of trusting it. */
  private val MinPlausibleNanos = 100_000_000_000_000_000L // 1e17 ns ≈ 1973-03

  /** Epoch-micros from whatever unit `ts` arrived in: nanos BIGINT gets
    * exact integer division (identical to DuckDB's ns->us truncation);
    * timestamp types go through `unix_micros` (session TZ is UTC
    * everywhere in this library, so the NTZ->TZ cast is the identity on
    * the epoch value). */
  def tsMicros(df: DataFrame): Column = tsMicrosFor(df.schema("ts").dataType)

  /** [[tsMicros]] keyed on an externally-discovered dtype — the streaming
    * source ([[graft.streaming.EventsStream.readStream]]) peeks the
    * directory's footer schema and dispatches here, so batch and stream
    * normalize `ts` identically.
    *
    * The BIGINT branch hard-claims epoch-NANOS; a micros-regeneration
    * shipping `ts` as plain epoch-MICROS BIGINT would otherwise shrink
    * every timestamp 1000x silently (the same breakage class the dtype
    * dispatch exists to kill), so values of ambiguous magnitude
    * (< [[MinPlausibleNanos]], i.e. micros-scale for any realistic event
    * date) raise instead of passing through the division. */
  def tsMicrosFor(tsType: DataType): Column = tsType match {
    case LongType =>
      when(col("ts").isNull, lit(null).cast("long"))
        .when(abs(col("ts")) >= MinPlausibleNanos, expr("ts div 1000"))
        .otherwise(raise_error(concat(
          lit("events.ts BIGINT must be epoch-nanos (|ts| >= 1e17); got micros-scale value "),
          col("ts").cast("string"))))
    case TimestampType    => unix_micros(col("ts"))
    case TimestampNTZType => unix_micros(col("ts").cast("timestamp"))
    case other => throw new IllegalArgumentException(
      s"events.ts must be epoch-nanos BIGINT or a timestamp type, got $other")
  }

  /** Tumbling-hour bucket as epoch hours — exact integer floor division on
    * micros (`floor` on the double quotient is exact here: epoch-micros
    * < 2^53, and DuckDB's `//` on BIGINT is the same floor division). */
  def hourBucket(tsUs: Column): Column =
    floor(tsUs.cast("double") / 3600000000L).cast("long")

  /** Hourly per-type aggregate — the batch twin of the Structured
    * Streaming query in [[graft.streaming.EventsStream]]. */
  def hourlyByType(ev: DataFrame): DataFrame =
    ev.withColumn("ts_us", tsMicros(ev))
      .groupBy(hourBucket(col("ts_us")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Gap-filled hourly series: [[hourlyByType]] densified onto each
    * event type's full [min hour, max hour] grid, missing buckets
    * emitted as (cnt = 0, sum_value = 0.0) — the resampling step every
    * time-series consumer (charting, anomaly detection, windowed ML
    * features) needs before treating the series as regular.
    *
    * Scale shape: the grid generates from the per-type (lo, hi) BOUNDS —
    * an aggregate of the already-aggregated hourly table, so the
    * `sequence` explode is per-type metadata (hours-per-type rows, never
    * per-event), and the left join back to the sparse counts is keyed on
    * the same (event_type, hour) the aggregation already produced. A
    * pathological type spanning decades would make hours-per-type large;
    * that is data-shape, not machinery — the explode stays linear in the
    * OUTPUT grid. */
  def hourlyGapFill(ev: DataFrame): DataFrame =
    gapFillHourly(hourlyByType(ev))

  /** [[hourlyGapFill]] from an ALREADY-AGGREGATED hourly table — the
    * entry point streaming deployments use after folding per-batch
    * hourly partials (sums add, so the fold is exactly mergeable). */
  def gapFillHourly(hourly: DataFrame): DataFrame = {
    val sparse = hourly
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grid = sparse.groupBy("event_type")
      .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("hour"))
    val out = grid.join(sparse, Seq("event_type", "hour"), "left")
      .select(col("hour"), col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    sparse.unpersist()
    out
  }

  /** Sliding-window per-type aggregate: window length `lenUs`, slide
    * `slideUs` (len must be a multiple of slide). Each event belongs to
    * len/slide windows; the assignment is an array-local explode of the
    * covering window starts — zero shuffle before the one aggregation,
    * the same shape Structured Streaming uses for sliding windows. */
  def slidingByType(ev: DataFrame, lenUs: Long = 3600000000L, slideUs: Long = 1800000000L): DataFrame = {
    require(lenUs > 0 && slideUs > 0 && lenUs % slideUs == 0,
      s"window length ($lenUs) must be a positive multiple of the slide ($slideUs) — " +
        "a non-multiple would silently truncate to windows of the wrong effective length")
    val k = (lenUs / slideUs).toInt
    val slideBucket = floor(col("ts_us").cast("double") / slideUs).cast("long")
    ev.withColumn("ts_us", tsMicros(ev))
      .withColumn("w_start",
        explode(transform(sequence(lit(0), lit(k - 1)),
          i => (slideBucket - i) * slideUs)))
      .filter(col("w_start") >= 0)
      .groupBy(col("w_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** Sessionization: a new session starts after a gap > `gapMinutes`.
    * Classic lag + cumulative-sum window; at scale this shuffles once on
    * user_id and sorts within partitions (exactly what the window needs —
    * no extra exchange). */
  def sessionize(ev: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000 * 1000
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
    ev.withColumn("ts_us", tsMicros(ev))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, lit(1L)).otherwise(lit(0L)))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))
  }

  /** Trailing-window anomaly scores over the gap-filled hourly series —
    * the volume monitor an event pipeline alarms on: each (type, hour)'s
    * count z-scores against the type's own trailing `window`-hour
    * baseline (ROWS frame EXCLUDING the current hour, over the
    * [[hourlyGapFill]]ed series so silent hours depress the baseline
    * instead of vanishing). Hours with fewer than `minHist` trailing
    * observations are suppressed (cold-start noise).
    *
    * Cross-engine determinism: the frame aggregates are INTEGER sums
    * (count, count²) — exact in any accumulation order, so DuckDB's
    * segment-tree window evaluation and Spark's buffer walk agree
    * bit-for-bit — and mean/variance derive from them in one fixed
    * double expression; z rounds to 6. The variance floors at 1.0
    * event² — counts are integers, so a flatter-than-one-event baseline
    * is "perfectly steady" and must still score a spike (a raw
    * zero-variance guard would mute exactly the loudest anomalies; a
    * flat baseline therefore scores z = 0, never NULL).
    *
    * Scale shape: one event-type-partitioned window over the
    * metadata-sized hourly grid (|types| × hours rows) — the corpus-sized
    * work is the one hourly aggregation [[hourlyGapFill]] already does. */
  def hourlyAnomaly(ev: DataFrame, window: Int = 24, minHist: Int = 12,
                    zThreshold: Double = 3.0): DataFrame =
    hourlyAnomalyFromHourly(hourlyByType(ev), window, minHist, zThreshold)

  /** [[hourlyAnomaly]] from an already-aggregated hourly table (the
    * [[gapFillHourly]] entry point) — shared by the batch query and the
    * [[graft.streaming.AnomalyStream]] fold-and-rescore deployment, so
    * stream scoring IS the batch algebra. */
  def hourlyAnomalyFromHourly(hourly: DataFrame, window: Int = 24, minHist: Int = 12,
                              zThreshold: Double = 3.0): DataFrame = {
    require(window >= 2 && minHist >= 2 && minHist <= window,
      s"need 2 <= minHist <= window; got window=$window minHist=$minHist")
    val w = Window.partitionBy("event_type").orderBy(col("hour").asc)
      .rowsBetween(-window, -1)
    val scored = gapFillHourly(hourly)
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("ss", sum(col("cnt") * col("cnt")).over(w))
      .withColumn("nw", count(lit(1L)).over(w))
      .filter(col("nw") >= minHist)
      .withColumn("mean", col("s").cast("double") / col("nw"))
      .withColumn("varr",
        greatest((col("ss").cast("double") - col("s").cast("double") * col("s") / col("nw")) / col("nw"),
          lit(1.0)))
      .withColumn("z", round((col("cnt") - col("mean")) / sqrt(col("varr")), 6))
    scored.select(col("hour"), col("event_type"), col("cnt"), col("nw").as("n_window"),
      round(col("mean"), 6).as("baseline_mean"), col("z"),
      (abs(col("z")) >= zThreshold).as("is_anomaly"))
  }

  /** Event-type transition matrix — path analysis: for every adjacent
    * pair of events in a user's timeline (ordered by ts, event_id — the
    * [[sessionize]] order), count the (from, to) transitions and each
    * row's share of its `from` type's outgoing edges (round-6 — the
    * empirical Markov transition probability).
    *
    * Scale shape: ONE user-keyed window (user-partitioned lag, the
    * sessionize shape — never a global window), then a bounded
    * |types|² count aggregation; the per-from totals re-aggregate that
    * metadata-sized table. */
  def transitions(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
    val pairs = ev.withColumn("ts_us", tsMicros(ev))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1L)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum(col("n")).as("n_from"))
    pairs.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_from"), 6).as("p"))
  }

  /** Cohort retention — the other classic event analytic: users cohort by
    * the PERIOD (default day) of their first-ever event, and each cohort
    * reports how many of its users were active again `offset` periods
    * later (offset 0 = the cohort period itself, so its rate is 1.0 by
    * construction — a useful self-check row). Rates are exact
    * long-ratios, round-6.
    *
    * Scale shape: one per-user min-aggregation (the cohort table), one
    * user-keyed equi-join back to the event stream projected to (user,
    * period), a (user, cohort, offset)-distinct, then a bounded
    * (cohort × offset) count joined with cohort sizes on the small
    * cohort dimension. */
  def retention(ev: DataFrame, periodUs: Long = 86400000000L,
                maxPeriods: Int = 7): DataFrame = {
    require(periodUs > 0 && maxPeriods >= 1,
      s"periodUs > 0 and maxPeriods >= 1 required; got $periodUs, $maxPeriods")
    val e = ev.withColumn("ts_us", tsMicros(ev))
      .select(col("user_id"), expr(s"ts_us div $periodUs").as("p"))
    val first = e.groupBy("user_id").agg(min(col("p")).as("cohort"))
    val sizes = first.groupBy("cohort").agg(count(lit(1L)).as("cohort_size"))
    val active = e.join(first, Seq("user_id"))
      .select(col("user_id"), col("cohort"), (col("p") - col("cohort")).as("offset"))
      .filter(col("offset") < maxPeriods)
      .distinct()
      .groupBy("cohort", "offset").agg(count(lit(1L)).as("n_active"))
    active.join(sizes, Seq("cohort"))
      .select(col("cohort"), col("offset"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6).as("retention"))
  }

  /** Step-ordered funnel report — the conversion analytic of event
    * pipelines: how many users performed `steps(0)`, then `steps(1)`
    * STRICTLY AFTER it within `windowUs`, then `steps(2)` after that,
    * and so on. Each user's step time is the EARLIEST event satisfying
    * the ordering (first-touch attribution); a user missing a step drops
    * from every later step. Output: one row per step with the users
    * reached and the conversion share vs step 1 (round-6).
    *
    * Scale shape: one filtered per-user min-aggregation per step, chained
    * by user_id equi-joins — every join is keyed on the natural
    * well-spread user dimension and the left side shrinks monotonically
    * (reached-users only); the report rows are single-row aggregates
    * unioned with the step-1 total attached by broadcast. No windows, no
    * self-joins over the raw event stream. */
  def funnel(ev: DataFrame, steps: Seq[String],
             windowUs: Long = 3600000000L): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got $steps")
    require(windowUs > 0, s"windowUs must be positive: $windowUs")
    val e = ev.withColumn("ts_us", tsMicros(ev))
      .select(col("user_id"), col("event_type"), col("ts_us"))
    // reached(i): per-user earliest valid time of step i given step i-1
    val first = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("ts_us")).as("t"))
    // persist each step's (user, t) table: it is users-bounded and feeds
    // BOTH the next step's join and its own count row — without the cache
    // the chained aggregates recompute the whole prefix, so the event
    // stream would be scanned O(steps^2) times instead of once per step
    // (the tfidf caller-owned-cache trade)
    val reached = steps.tail.scanLeft(
      first.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)) { (prev, step) =>
      e.filter(col("event_type") === step)
        .join(prev.select(col("user_id"), col("t").as("t_prev")), Seq("user_id"))
        .filter(col("ts_us") > col("t_prev") && col("ts_us") <= col("t_prev") + windowUs)
        .groupBy("user_id").agg(min(col("ts_us")).as("t"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val counts = reached.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1L)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(steps(i)).as("event_type"), col("n_users"))
    }
    val base = counts.head.select(col("n_users").as("n_base"))
    // materialize the |steps|-row report, then release the step caches —
    // the hourlyGapFill force-then-unpersist discipline, so repeated
    // calls never accumulate orphaned cache entries
    val out = counts.reduce(_ unionByName _)
      .crossJoin(broadcast(base))
      .select(col("step"), col("event_type"), col("n_users"),
        round(when(col("n_base") > 0, col("n_users").cast("double") / col("n_base"))
          .otherwise(lit(0.0)), 6).as("conversion"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    reached.foreach(_.unpersist())
    out
  }
}
