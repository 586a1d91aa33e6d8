package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Num, Tables}

/** X5 `q_sessionize`: gap-based sessionization over the `events` stream table
  * (SURVEY.md §2.11) — the classic two-window idiom: lag() marks session
  * starts, a cumulative sum numbers them, then one groupBy rolls sessions up.
  *
  * The whole program is ONE shuffle on user_id: both windows and the final
  * aggregate share the same partitioning, so Catalyst reuses the exchange
  * (EnsureRequirements sees compatible distributions). At 100 TB the
  * per-user event history sorts within its partition; a hot user (skew)
  * would be handled by AQE skew-split plus a coarse pre-bucketing of ts —
  * noted, not needed at harness scale.
  *
  * Determinism: ordering ties broken by event_id; timestamps compared in
  * exact epoch microseconds; boundary timestamps exported as formatted
  * strings (cross-engine timestamp dtype hashing is not stable — same
  * convention as `q_extract_cast`).
  */
object Sessionize {

  /** Session gap: a new session starts after >24h of user inactivity
    * (matched to the harness data's inter-event gap distribution; the
    * threshold is a runtime parameter in spirit). */
  val GapMicros: Long = 24L * 3600 * 1000000

  /** Adds `session_id` to an events frame — the gap-split assignment (lag
    * marks starts, running sum numbers them) every sessionization consumer
    * shares; a gap-semantics fix here reaches q_sessionize AND
    * q_session_paths (they diverged silently when this logic was inlined
    * twice). */
  def withSessionIds(events: DataFrame, gapMicros: Long): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val isNew = when(
      lag(us, 1).over(byTime).isNull ||
        (us - lag(us, 1).over(byTime)) > gapMicros, 1L).otherwise(0L)
    events.withColumn("session_id", sum(isNew).over(
      byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Core: sessionize any (user_id, ts, event_id) frame with a given gap. */
  def sessionize(events: DataFrame, gapMicros: Long): DataFrame = {
    withSessionIds(events, gapMicros)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        Num.countStar.as("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  def sessionizeQ(spark: SparkSession, sfDir: String): DataFrame =
    sessionize(Tables.events(spark, sfDir), GapMicros)

  val sessionizeOracle: String =
    s"""WITH marked AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${GapMicros}
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), numbered AS (
       |  SELECT user_id, ts,
       |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                      ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM marked)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       |  COUNT(*) AS n_events
       |FROM numbered
       |GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  /** `q_gap_fill`: calendar gap-fill + last-observation-carried-forward —
    * the time-series regularization pass a feature/metrics pipeline runs
    * before windowed training data extraction (every key gets one row per
    * calendar day between its first and last observation, missing days
    * flagged and LOCF-filled).
    *
    * Plan shape: the ONLY data-sized operation is the first two-phase
    * aggregate folding events to (user, day) rows; everything after runs on
    * the calendar-bounded frame (|users| × ≤span rows — at 100 TB of
    * events this is orders of magnitude smaller, e.g. 10M users × 365 days
    * regardless of event volume). The per-key calendar comes from
    * sequence() on the key's own [min, max] span — generated distributed,
    * never a driver-side date table — and LOCF is last(ignoreNulls) over a
    * per-key window (state O(1) per key, keys are the parallelism).
    * Determinism: daily values are exact BIGINT sums of floor(value);
    * date arithmetic is whole-day (both engines truncate the naive
    * timestamp; the session zone is pinned UTC). */
  def gapFillQ(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(sum(floor(col("value")).cast("long")).as("v"))
    val cal = daily.groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
    val locf = Window.partitionBy(col("user_id")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"),
        when(col("v").isNull, 0).otherwise(1).as("observed"),
        last(col("v"), ignoreNulls = true).over(locf).as("v_locf"))
      // date exported as a string: cross-engine date dtypes don't hash
      // alike (same convention as the session timestamps)
      .select(col("user_id"), date_format(col("d"), "yyyy-MM-dd").as("d"),
        col("observed"), col("v_locf"))
      .orderBy(col("user_id"), col("d"))
  }

  val gapFillOracle: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |         CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1),
      |cal AS (
      |  SELECT user_id,
      |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
      |  FROM span)
      |SELECT c.user_id, strftime(c.d, '%Y-%m-%d') AS d,
      |  CASE WHEN dl.v IS NULL THEN 0 ELSE 1 END AS observed,
      |  last_value(dl.v IGNORE NULLS) OVER (
      |    PARTITION BY c.user_id ORDER BY c.d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf
      |FROM cal c LEFT JOIN daily dl ON c.user_id = dl.user_id AND c.d = dl.d
      |ORDER BY c.user_id, c.d""".stripMargin

  /** Journey prefix length and report size for `q_session_paths`. */
  val PathLen = 5
  val PathTopK = 20

  /** `q_session_paths`: top user journeys — each session's first PathLen
    * event types joined into a path string ("signup>view>purchase"), the
    * PathTopK most common paths reported with their frequencies. The
    * product-analytics view of the X70 transition matrix: whole prefixes
    * instead of single hops.
    *
    * Plan: session assignment and the per-session event rank share the
    * sessionize exchange — HashPartitioning(user_id) satisfies the
    * (user_id, session_id) clustering, so ALL three windows and the
    * prefix pivot run on ONE shuffle. The prefix is rank-bounded (rn ≤
    * PathLen) BEFORE the pivot, so no session contributes more than
    * PathLen rows, and the pivot is a fixed-width conditional-max
    * aggregate — never a collected list. Path frequency is a two-phase
    * count on the (types^PathLen)-bounded path domain; top-K via
    * per-partition heap. */
  def sessionPathsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val bySession = Window
      .partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    val prefix = withSessionIds(
      Tables.events(spark, sfDir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
      GapMicros)
      .withColumn("rn", row_number().over(bySession))
      .filter(col("rn") <= PathLen)
    val slots = (1 to PathLen).map(i =>
      max(when(col("rn") === i, col("event_type"))).as(s"e$i"))
    prefix
      .groupBy(col("user_id"), col("session_id"))
      .agg(slots.head, slots.tail: _*)
      .select(concat_ws(">", (1 to PathLen).map(i => col(s"e$i")): _*).as("path"))
      .groupBy(col("path"))
      .agg(Num.countStar.as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(PathTopK)
  }

  val sessionPathsOracle: String = {
    val slots = (1 to PathLen)
      .map(i => s"MAX(CASE WHEN rn = $i THEN event_type END) AS e$i")
      .mkString(",\n       |    ")
    val cols = (1 to PathLen).map(i => s"e$i").mkString(", ")
    s"""WITH marked AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${GapMicros}
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), numbered AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                      ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM marked
       |), ranked AS (
       |  SELECT user_id, session_id, event_type,
       |    ROW_NUMBER() OVER (PARTITION BY user_id, session_id
       |                       ORDER BY ts, event_id) AS rn
       |  FROM numbered
       |), pfx AS (
       |  SELECT user_id, session_id,
       |    $slots
       |  FROM ranked WHERE rn <= ${PathLen} GROUP BY 1, 2)
       |SELECT concat_ws('>', $cols) AS path, COUNT(*) AS n
       |FROM pfx GROUP BY 1
       |ORDER BY n DESC, path LIMIT ${PathTopK}""".stripMargin
  }

  /** X103 `q_concurrency`: peak concurrent sessions per day — the interval
    * sweep-line (capacity planning: "how many sessions were open at once?")
    * computed by a DISTRIBUTED PREFIX SUM, not a global window.
    *
    * A running sum over one global order is the textbook answer and the
    * textbook scale trap: `sum() OVER (ORDER BY t)` with no partition key
    * funnels the whole table through one task. The scan-algorithm answer
    * (Blelloch) is two passes: (1) range-partition the ±1 boundary deltas
    * by (t, d) and fold each partition to its local sum — P scalars, P =
    * partition count; (2) exclusive-scan those P sums on the driver (P
    * values, not data) and broadcast the carry offsets; each partition then
    * emits its running counter seeded by its offset. Wall-clock is two
    * narrow passes over the deltas regardless of cluster width — this IS
    * how prefix aggregation parallelizes on 1000 executors. The carry
    * machinery is the shared scan primitive (`graft.engine.Scan`),
    * instantiated here with the (+, 0) monoid; X112's skyline uses the
    * same primitive with (min, +∞).
    *
    * Correctness notes: the carry pass must see the SAME partition layout
    * the sum pass saw — the sorted deltas are persisted once (DISK_ONLY,
    * same rationale as Materialize) so both passes read identical blocks
    * rather than trusting two range-shuffles to sample identical bounds.
    * Sessions are [start, end] closed: +1 at start, −1 at end+1µs, ties
    * ordered (t, d) so a −1 at instant t lands before a +1 at t and the
    * counter never momentarily double-counts a dead session. Day peaks are
    * the counter's max at that day's boundary events; within an equal
    * (t, d) run the counter's intermediate VALUES are the same set under
    * any tie order, so the per-day max is deterministic. */
  def peakConcurrencyQ(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the session frame feeds BOTH unionAll delta branches — materialized
    // once, or the data-sized sessionization (sort + two windows + agg)
    // executes twice (the multi-consumer rule; exchange reuse alone does
    // not dedupe the window passes)
    val sessions = graft.engine.Materialize.diskBacked(
      withSessionIds(Tables.events(spark, sfDir), GapMicros)
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(unix_micros(col("ts"))).as("s"),
          max(unix_micros(col("ts"))).as("e")))
    val deltas = sessions.select(col("s").as("t"), lit(1L).as("d"))
      .unionAll(sessions.select((col("e") + 1L).as("t"), lit(-1L).as("d")))
    val nPart = spark.sessionState.conf.numShufflePartitions
    val sorted = deltas.repartitionByRange(nPart, col("t"), col("d"))
      .sortWithinPartitions(col("t"), col("d"))
      .select(col("t"), col("d")).as[(Long, Long)]
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // the scan primitive with the (+, 0) monoid: exclusive carry + own
    // delta = the counter value at each boundary instant
    val running = spark.createDataset(
      graft.engine.Scan.exclusivePrefix[(Long, Long), Long](
        sorted.rdd, 0L, _._2, _ + _)
        .map { case (pre, (t, d)) => (t, pre + d) }).toDF("t", "c")
    running
      .groupBy(date_format(timestamp_micros(col("t")), "yyyy-MM-dd").as("day"))
      .agg(max(col("c")).as("peak_concurrent"))
      .orderBy(col("day"))
  }

  val peakConcurrencyOracle: String =
    s"""WITH marked AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${GapMicros}
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), numbered AS (
       |  SELECT user_id, ts,
       |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                      ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM marked
       |), sessions AS (
       |  SELECT user_id, session_id,
       |    MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
       |  FROM numbered GROUP BY 1, 2
       |), deltas AS (
       |  SELECT s AS t, 1 AS d FROM sessions
       |  UNION ALL
       |  SELECT e + 1 AS t, -1 AS d FROM sessions
       |), running AS (
       |  SELECT t, SUM(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS c
       |  FROM deltas)
       |SELECT strftime(make_timestamp(t), '%Y-%m-%d') AS day,
       |  CAST(MAX(c) AS BIGINT) AS peak_concurrent
       |FROM running GROUP BY 1
       |ORDER BY day""".stripMargin

  // `q_disorder`: event-time disorder audit (watermark sizing input)

  /** `q_disorder`: out-of-order-arrival audit — per event type, how many
    * events arrive (by `event_id` ingestion order) with an event time
    * EARLIER than something already seen from the same user, and how far
    * back the worst straggler reaches. This is the measurement that
    * SIZES a streaming watermark (`streaming/Incremental`'s windows
    * currently pin delays by convention; this query derives the
    * empirical delay distribution the convention should come from).
    *
    * Scale shape: ONE user-keyed exchange carries the running event-time
    * maximum (ordered by ingestion id, per user — never a global or
    * per-type ordering, which would funnel the table through a handful
    * of reducers); lateness folds per type in a second bounded
    * aggregate. Lateness is exact integer microseconds → whole seconds
    * by integer division. */
  def disorderQ(spark: SparkSession, sfDir: String): DataFrame = {
    val byArrival = Window.partitionBy(col("user_id"))
      .orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("seen_max", max(col("us")).over(byArrival))
      .withColumn("late_us",
        when(col("seen_max") > col("us"), col("seen_max") - col("us"))
          .otherwise(0L))
      .groupBy(col("event_type"))
      .agg(Num.countStar.as("n_events"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
        expr("max(late_us) div 1000000").as("max_delay_s"),
        expr("(sum(late_us) div 1000000)").as("total_delay_s"))
      .orderBy(col("event_type"))
  }

  val disorderOracle: String =
    """WITH t AS (
      |  SELECT event_type, user_id, event_id,
      |    epoch_us(ts) AS us,
      |    MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen_max
      |  FROM events),
      |l AS (
      |  SELECT event_type,
      |    CASE WHEN seen_max > us THEN seen_max - us ELSE 0 END AS late_us
      |  FROM t)
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_late,
      |  MAX(late_us) // 1000000 AS max_delay_s,
      |  CAST(SUM(late_us) AS BIGINT) // 1000000 AS total_delay_s
      |FROM l GROUP BY 1 ORDER BY event_type""".stripMargin
}
