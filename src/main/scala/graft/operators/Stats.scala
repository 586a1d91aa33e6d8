package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Num, Tables}
import graft.functions.KmvSketch

/** Distribution statistics for the LLM-data-pipeline (SURVEY.md §2.11):
  * exact discrete percentiles and a KMV approximate-distinct sketch. Both
  * extend the reference's report surface (histograms + scalar counts,
  * /root/reference/src/youtube_collector.py:241-268,
  * src/snowflake_loader.py:166-171) to the shapes a corpus-curation job
  * needs at scale.
  */
object Stats {

  /** `q_percentiles`: exact DISCRETE percentiles (p50/p90 as the value at
    * rank ceil(q·n) of the sorted multiset) per event_type over
    * floor(value). Engine quantile builtins differ in interpolation rules
    * across engines, so BOTH sides state the rank-selection definition
    * explicitly — integer arithmetic end to end.
    *
    * Plan: one shuffle on the grouping key; rank + group size come from two
    * window frames over the SAME partitioning (one exchange, one sort), the
    * final groupBy reuses it. At 100 TB a hot key would move to an
    * approx-quantile sketch; the exact-disc form is the oracle-able
    * baseline. Ties share a value, so row_number ties are harmless: the
    * value AT a rank is well-defined. */
  def percentilesQ(spark: SparkSession, sfDir: String): DataFrame = {
    val v = floor(col("value")).cast("long")
    val byV = Window.partitionBy(col("event_type")).orderBy(col("v"))
    val all = Window.partitionBy(col("event_type"))
    Tables.events(spark, sfDir)
      .select(col("event_type"), v.as("v"))
      .withColumn("rn", row_number().over(byV))
      .withColumn("n", count(lit(1)).over(all))
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n_events"),
        min(col("v")).as("min_v"),
        // `/` on Columns is double division; the cast("long") truncation
        // makes it the integer ceil-rank formula (operands are positive).
        max(when(col("rn") === ((col("n") + 1) / 2).cast("long"), col("v")))
          .as("p50"),
        max(when(col("rn") === ((col("n") * 9 + 9) / 10).cast("long"), col("v")))
          .as("p90"),
        max(col("v")).as("max_v"))
      .orderBy(col("event_type"))
  }

  val percentilesOracle: String =
    """WITH t AS (
      |  SELECT event_type, CAST(floor(value) AS BIGINT) AS v FROM events),
      |r AS (
      |  SELECT event_type, v,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM t)
      |SELECT event_type,
      |  MAX(n) AS n_events,
      |  MIN(v) AS min_v,
      |  MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS p50,
      |  MAX(CASE WHEN rn = (n * 9 + 9) // 10 THEN v END) AS p90,
      |  MAX(v) AS max_v
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Sketch size: estimates engage once a group has >= k distinct hashes. */
  val KmvK = 64

  /** `q_kmv_distinct`: approximate COUNT(DISTINCT) per event_type via the
    * KMV sketch (graft.functions.KmvSketch) over 60-bit md5 hashes of
    * event_id. The estimate expression — fewer than k distinct -> exact,
    * else (k-1)·2^60 / h_k — is the SAME double arithmetic on both engines,
    * so the "approximate" result is still bit-exact cross-engine. No exact
    * countDistinct rides along: at scale the exact pass would cost more
    * than the sketch it calibrates (it was dropped in round 4 for exactly
    * that reason); the sketch path is what the bench times. */
  def kmvDistinctQ(spark: SparkSession, sfDir: String): DataFrame = {
    val kmv = udaf(new KmvSketch(KmvK))
    val h = conv(substring(md5(concat(lit("e"), col("event_id"))), 1, 15), 16, 10)
      .cast("long")
    Tables.events(spark, sfDir)
      .select(col("event_type"), h.as("h"))
      .groupBy(col("event_type"))
      .agg(Num.countStar.as("n_rows"),
        kmv(col("h")).as("hs"))
      .select(col("event_type"), col("n_rows"),
        when(size(col("hs")) < KmvK, size(col("hs")).cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) * pow(lit(2.0), 60)
            / element_at(col("hs"), KmvK)).as("est_distinct"))
      .orderBy(col("event_type"))
  }

  /** Tumbling-window width (6 h) — epoch-aligned on both engines. */
  val WindowHours = 6

  /** `q_time_window`: tumbling-window aggregation over the event stream —
    * the BATCH twin of the Structured Streaming rollup in
    * graft.streaming.Incremental (same `window()` grouping, no watermark
    * needed at rest). Spark's window() buckets align to the epoch in the
    * session timezone (pinned UTC), which the oracle reproduces with
    * integer epoch-microsecond arithmetic — no reliance on either engine's
    * time_bucket origin conventions. One shuffle on (window, event_type)
    * with map-side partial aggregation; at 100 TB the window column also
    * serves as the natural partition key for the sink. */
  def timeWindowQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), s"$WindowHours hours"), col("event_type"))
      .agg(Num.countStar.as("n_events"),
        sum(floor(col("value")).cast("long")).as("sum_floor_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("win_end"),
        col("event_type"), col("n_events"), col("sum_floor_value"))
      .orderBy(col("win_start"), col("event_type"))

  val timeWindowOracle: String = {
    val busec = WindowHours * 3600L * 1000000L
    s"""SELECT
       |  strftime(make_timestamp((epoch_us(ts) // ${busec}) * ${busec}),
       |           '%Y-%m-%d %H:%M:%S') AS win_start,
       |  strftime(make_timestamp((epoch_us(ts) // ${busec}) * ${busec} + ${busec}),
       |           '%Y-%m-%d %H:%M:%S') AS win_end,
       |  event_type, COUNT(*) AS n_events,
       |  CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value
       |FROM events
       |GROUP BY 1, 2, 3 ORDER BY win_start, event_type""".stripMargin
  }

  /** Sliding-frame width in trailing buckets (current + 2 preceding). */
  val MovingFrame = 2

  /** `q_moving_sum`: sliding window FRAME analytics — per event_type daily
    * totals with a trailing 3-day moving sum and count (`rowsBetween(-2,
    * currentRow)`), the frame shape the window family was missing next to
    * row_number (no frame) and the unbounded cumulative sum. Integer
    * arithmetic end to end. Plan: the daily aggregate and the frame share
    * one hash partitioning on event_type; within-partition sort by day
    * orders the frame. */
  def movingSumQ(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value")).cast("long")).as("day_total"),
        Num.countStar.as("day_events"))
    val frame = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-MovingFrame, Window.currentRow)
    daily
      .withColumn("moving_total", sum(col("day_total")).over(frame))
      .withColumn("moving_events", sum(col("day_events")).over(frame))
      .select(col("event_type"), col("day").cast("string").as("day"),
        col("day_total"), col("moving_total"), col("moving_events"))
      .orderBy(col("event_type"), col("day"))
  }

  val movingSumOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS day_total,
       |    COUNT(*) AS day_events
       |  FROM events GROUP BY 1, 2)
       |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, day_total,
       |  CAST(SUM(day_total) OVER w AS BIGINT) AS moving_total,
       |  CAST(SUM(day_events) OVER w AS BIGINT) AS moving_events
       |FROM daily
       |WINDOW w AS (PARTITION BY event_type ORDER BY day
       |             ROWS BETWEEN ${MovingFrame} PRECEDING AND CURRENT ROW)
       |ORDER BY event_type, day""".stripMargin

  /** `q_window_analytics`: the analytic window functions the rest of the
    * window family doesn't exercise — LAG (inter-event gap per user, exact
    * integer microseconds), LEAD (next event type), and NTILE (value
    * quartile within the event_type). One frame per partitioning; both
    * window orders are TOTAL (event_id tiebreak), so lag/lead neighbors and
    * ntile bucket boundaries are deterministic cross-engine — ntile's
    * standard ceil/floor bucket sizing then matches row for row. Two
    * shuffles (one per partitioning) + the output sort; at 100 TB each is
    * an ordinary hash-partition-and-sort, with the same skew options as W1
    * (a hot user/event_type salts or pre-aggregates). */
  def windowAnalyticsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val byTypeValue = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("t_us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"),
        coalesce(col("t_us") - lag(col("t_us"), 1).over(byUser), lit(-1L))
          .as("gap_us"),
        coalesce(lead(col("event_type"), 1).over(byUser), lit("(none)"))
          .as("next_event_type"),
        ntile(4).over(byTypeValue).as("value_quartile"))
      .orderBy(col("event_id"))
  }

  val windowAnalyticsOracle: String =
    """SELECT event_id, user_id,
      |  COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER w, -1) AS gap_us,
      |  COALESCE(LEAD(event_type) OVER w, '(none)') AS next_event_type,
      |  NTILE(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
      |    AS value_quartile
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  /** Count-Min Sketch geometry: CmsRows independent hash rows × CmsWidth
    * buckets — 1024 cells total, REGARDLESS of corpus size. */
  val CmsRows = 4
  val CmsWidth = 256

  /** Probe words whose frequencies the sketch estimates (the two Sentiment
    * lexicons — bounded literals, like a heavy-hitter watchlist). */
  def CmsProbes: Seq[String] =
    graft.functions.Sentiment.Default.positive ++
      graft.functions.Sentiment.Default.negative

  /** `q_cms_heavy`: Count-Min Sketch frequency estimation — the heavy-hitter
    * companion to the KMV distinct sketch. The corpus word stream folds into
    * a CmsRows×CmsWidth count matrix (one groupBy whose key space is 1024
    * cells — constant state no matter how many TB of text flow through);
    * each probe word's estimate is min over rows of its bucket's count, the
    * classic CMS upper bound (est ≥ true, overcount only from collisions).
    *
    * Like KMV, the sketch is DETERMINISTIC cross-engine: bucket hashes are
    * the portable 60-bit md5 trick, counts are exact integers, min is min —
    * so the oracle replicates the full pipeline bit for bit. Scale: exact
    * per-word counting (q_word_topk) shuffles a vocabulary-sized aggregate;
    * the CMS shuffles 1024 cells and answers any watchlist by broadcast
    * lookup — the trade a 100 TB heavy-hitter monitor wants. */
  def cmsHeavyQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    def bucket(row: Int, word: org.apache.spark.sql.Column) =
      pmod(conv(substring(md5(concat(lit(s"c${row}_"), word)), 1, 15), 16, 10)
        .cast("long"), lit(CmsWidth))
    val ws = F.filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "")
    val rowBuckets = array((0 until CmsRows).map(d => bucket(d, col("word"))): _*)
    val cms = Tables.documents(spark, sfDir)
      .select(explode(ws).as("word"))
      .select(posexplode(rowBuckets).as(Seq("d", "bucket")))
      .groupBy(col("d"), col("bucket"))
      .agg(Num.countStar.as("cnt"))
    import spark.implicits._
    val probeDf = CmsProbes.toDF("word")
      .select(col("word"), posexplode(rowBuckets).as(Seq("d", "bucket")))
    probeDf.join(broadcast(cms), Seq("d", "bucket"), "left")
      .groupBy(col("word"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
      .orderBy(col("word"))
  }

  val cmsHeavyOracle: String = {
    val probeValues = CmsProbes.map(w => s"('${w}')").mkString(", ")
    s"""WITH words AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |    w -> w <> '')) AS word
       |  FROM documents),
       |cells AS (
       |  SELECT d, CAST(concat('0x', substr(md5('c' || d || '_' || word),1,15))
       |      AS BIGINT) % ${CmsWidth} AS bucket, COUNT(*) AS cnt
       |  FROM words, (SELECT unnest(range(0, ${CmsRows})) AS d)
       |  GROUP BY 1, 2),
       |probes AS (
       |  SELECT word, d, CAST(concat('0x', substr(md5('c' || d || '_' || word),1,15))
       |      AS BIGINT) % ${CmsWidth} AS bucket
       |  FROM (VALUES $probeValues) AS p(word),
       |       (SELECT unnest(range(0, ${CmsRows})) AS d))
       |SELECT p.word, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est_count
       |FROM probes p LEFT JOIN cells c ON p.d = c.d AND p.bucket = c.bucket
       |GROUP BY 1 ORDER BY word""".stripMargin
  }

  val kmvDistinctOracle: String =
    s"""WITH h AS (
       |  SELECT event_type,
       |    CAST(concat('0x', substr(md5('e' || event_id),1,15)) AS BIGINT) AS h
       |  FROM events),
       |g AS (
       |  SELECT event_type, COUNT(*) AS n_rows,
       |    list_sort(list(DISTINCT h)) AS hs
       |  FROM h GROUP BY 1)
       |SELECT event_type, n_rows,
       |  CASE WHEN len(hs) < ${KmvK} THEN CAST(len(hs) AS DOUBLE)
       |       ELSE (${KmvK - 1}.0 * POW(2.0, 60)) / hs[${KmvK}] END AS est_distinct
       |FROM g ORDER BY event_type""".stripMargin
}
