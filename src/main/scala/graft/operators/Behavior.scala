package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Materialize, Num, Tables}

/** Behavioral analytics over the `events` stream table — the funnel /
  * cohort / path reports an analytics warehouse derives from the same
  * event firehose the reference's trending pipeline consumes
  * (/root/reference/src/snowflake_loader.py builds daily engagement
  * reports; these are the standard next three reports in that family).
  *
  * All three share one plan discipline: every window partitions by
  * `user_id` (millions of small partitions — the parallelism, never a
  * funnel), sequential window layers reuse the SAME exchange, and the
  * final rollups run on per-user or per-cell frames that are orders of
  * magnitude smaller than the event volume. Timestamps compare in exact
  * microseconds; counts are exact BIGINTs — no doubles anywhere, so the
  * DuckDB gate hash-matches bit for bit.
  */
object Behavior {

  /** `q_funnel`: ordered-stage conversion — signup → first view at-or-after
    * the signup → first purchase at-or-after that view, per user, counted
    * per stage. The stage timestamps are per-user window minima computed in
    * three sequential window layers over ONE hash exchange on user_id
    * (layer n+1's predicate reads layer n's column, so Catalyst stacks
    * three Window nodes on the same partitioning); the per-user rollup
    * reuses the exchange again, and the final single-row count is a
    * partial-aggregated tree. At 100 TB nothing here sorts or funnels —
    * per-user state is three timestamps. */
  def funnelQ(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val perUser = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_signup",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("t_view",
        min(when(col("event_type") === "view" && col("ts") >= col("t_signup"),
          col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") >= col("t_view"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t_signup")).as("t_signup"),
        max(col("t_view")).as("t_view"),
        max(col("t_purchase")).as("t_purchase"))
    perUser.agg(
      Num.countStar.as("n_users"),
      count(col("t_signup")).as("n_signup"),
      count(col("t_view")).as("n_view_after"),
      count(col("t_purchase")).as("n_purchase_after"))
  }

  val funnelOracle: String =
    """WITH w1 AS (
      |  SELECT user_id, event_type, ts,
      |    MIN(CASE WHEN event_type = 'signup' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t_signup
      |  FROM events),
      |w2 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'view' AND ts >= t_signup
      |                     THEN ts END)
      |    OVER (PARTITION BY user_id) AS t_view FROM w1),
      |w3 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= t_view
      |                     THEN ts END)
      |    OVER (PARTITION BY user_id) AS t_purchase FROM w2),
      |u AS (
      |  SELECT user_id, MAX(t_signup) AS t_signup, MAX(t_view) AS t_view,
      |    MAX(t_purchase) AS t_purchase
      |  FROM w3 GROUP BY 1)
      |SELECT COUNT(*) AS n_users, COUNT(t_signup) AS n_signup,
      |  COUNT(t_view) AS n_view_after, COUNT(t_purchase) AS n_purchase_after
      |FROM u""".stripMargin

  /** Per-step conversion window for `q_window_funnel`, in seconds (24 h —
    * the events table spans ~30 days). */
  val FunnelGapSec = 86400L

  /** `q_window_funnel`: the TIMED variant of `q_funnel` — each stage must
    * land within [`FunnelGapSec`] of the previous stage's timestamp
    * (ClickHouse `windowFunnel` / product-analytics "conversion window"
    * semantics), vs `q_funnel`'s unbounded at-or-after chain. Deterministic
    * earliest-chain rule: each stage binds to the EARLIEST qualifying
    * event after the previous stage; the chain never backtracks (a user
    * who would convert only via a later signup does not count — pinned,
    * documented, and mirrored in the oracle).
    *
    * Scale shape: identical to `q_funnel` — the three stage minima are
    * stacked window layers over ONE user_id hash exchange (layer n+1's
    * predicate reads layer n's column), the per-user rollup reuses the
    * exchange, the stage report is a partial-aggregated single row.
    * Per-user state = three timestamps at any scale. */
  def windowFunnelQ(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val gap = expr(s"INTERVAL ${FunnelGapSec} SECOND")
    val perUser = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_signup",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("t_view",
        min(when(col("event_type") === "view" && col("ts") >= col("t_signup")
          && col("ts") <= col("t_signup") + gap, col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") >= col("t_view")
          && col("ts") <= col("t_view") + gap, col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t_signup")).as("t_signup"),
        max(col("t_view")).as("t_view"),
        max(col("t_purchase")).as("t_purchase"))
    perUser.agg(
      Num.countStar.as("n_users"),
      count(col("t_signup")).as("n_signup"),
      count(col("t_view")).as("n_view_24h"),
      count(col("t_purchase")).as("n_purchase_24h"),
      // total seconds from signup to purchase over full converters —
      // exact integer sum; the mean is the one closing division
      sum(unix_timestamp(col("t_purchase"))
        - unix_timestamp(col("t_signup"))).as("convert_sec_sum"))
      .withColumn("mean_convert_sec",
        col("convert_sec_sum").cast("double")
          / col("n_purchase_24h").cast("double"))
  }

  val windowFunnelOracle: String =
    s"""WITH w1 AS (
       |  SELECT user_id, event_type, ts,
       |    MIN(CASE WHEN event_type = 'signup' THEN ts END)
       |      OVER (PARTITION BY user_id) AS t_signup
       |  FROM events),
       |w2 AS (
       |  SELECT *, MIN(CASE WHEN event_type = 'view' AND ts >= t_signup
       |      AND ts <= t_signup + INTERVAL ${FunnelGapSec} SECOND
       |      THEN ts END)
       |    OVER (PARTITION BY user_id) AS t_view FROM w1),
       |w3 AS (
       |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= t_view
       |      AND ts <= t_view + INTERVAL ${FunnelGapSec} SECOND
       |      THEN ts END)
       |    OVER (PARTITION BY user_id) AS t_purchase FROM w2),
       |u AS (
       |  SELECT user_id, MAX(t_signup) AS t_signup, MAX(t_view) AS t_view,
       |    MAX(t_purchase) AS t_purchase
       |  FROM w3 GROUP BY 1)
       |SELECT COUNT(*) AS n_users, COUNT(t_signup) AS n_signup,
       |  COUNT(t_view) AS n_view_24h, COUNT(t_purchase) AS n_purchase_24h,
       |  CAST(SUM(date_diff('second', t_signup, t_purchase)) AS BIGINT)
       |    AS convert_sec_sum,
       |  CAST(SUM(date_diff('second', t_signup, t_purchase)) AS DOUBLE)
       |    / COUNT(t_purchase) AS mean_convert_sec
       |FROM u""".stripMargin

  /** `q_cohort_retention`: the classic cohort × offset retention matrix —
    * users grouped by the ISO week of their first event, each later active
    * day attributed to its whole-week offset from that first day, cells =
    * distinct active users. The first-event date is a per-user window min
    * (per-user partitions); the matrix rollup is a two-phase
    * count-distinct over (cohort_week, offset_week) — cell count is
    * bounded by weeks², data-independent. Dates export as strings (the
    * cross-engine date-dtype hashing convention). */
  def cohortRetentionQ(spark: SparkSession, sfDir: String): DataFrame = {
    val wU = Window.partitionBy(col("user_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .withColumn("first_d", min(col("d")).over(wU))
      .select(col("user_id"),
        date_format(date_trunc("week", col("first_d")), "yyyy-MM-dd")
          .as("cohort_week"),
        (datediff(col("d"), col("first_d")) / 7).cast("long").as("offset_week"))
      .groupBy(col("cohort_week"), col("offset_week"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("offset_week"))
  }

  val cohortRetentionOracle: String =
    """WITH act AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |    MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_d
      |  FROM events)
      |SELECT strftime(date_trunc('week', first_d), '%Y-%m-%d') AS cohort_week,
      |  (d - first_d) // 7 AS offset_week,
      |  COUNT(DISTINCT user_id) AS n_active
      |FROM act
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** `q_growth_accounting`: the growth-accounting decomposition of weekly
    * actives — every WAU number split into NEW (first week ever),
    * RETAINED (also active the week before), and RESURRECTED (active
    * before, but not last week), plus CHURNED (active last week, gone
    * now) attributed to the week the user went missing — the standard
    * growth-team ledger (Social-Capital-style accounting) beside X84's
    * churn-only view and X107's cumulative counts. Identity per week:
    * WAU_w = new + retained + resurrected, and
    * WAU_w = WAU_{w-1} − churned_w + new_w + resurrected_w — the second
    * law is what the unit test pins.
    *
    * Scale shape: the (user × week) distinct frame folds once; lag/lead
    * per user ride ONE user-keyed exchange; the observation-end guard is
    * a 1-row broadcast (X141); the ledger fold is week-domain-bounded. */
  def growthAccountingQ(spark: SparkSession, sfDir: String): DataFrame = {
    val weekly = Materialize.diskBacked(
      Tables.events(spark, sfDir)
        .select(col("user_id"),
          date_trunc("week", to_date(col("ts"))).cast("date").as("w"))
        .distinct())
    val byU = Window.partitionBy(col("user_id")).orderBy(col("w"))
    val marked = weekly
      .withColumn("prev", lag(col("w"), 1).over(byU))
      .withColumn("next", lead(col("w"), 1).over(byU))
    val statuses = marked.select(col("w"),
      when(col("prev").isNull, "new")
        .when(datediff(col("w"), col("prev")) === 7, "retained")
        .otherwise(lit("resurrected")).as("status"))
    val maxW = weekly.agg(max(col("w")).as("max_w"))
    val churn = marked.crossJoin(broadcast(maxW))
      .filter(col("next").isNull ||
        datediff(col("next"), col("w")) > 7)
      .select(date_add(col("w"), 7).as("w"), col("max_w"))
      .filter(col("w") <= col("max_w"))
      .select(col("w"), lit("churned").as("status"))
    statuses.unionByName(churn)
      .groupBy(date_format(col("w"), "yyyy-MM-dd").as("week"))
      .agg(
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"),
        sum(when(col("status") === "churned", 1L).otherwise(0L))
          .as("n_churned"))
      .orderBy(col("week"))
  }

  val growthAccountingOracle: String =
    """WITH weekly AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS w
      |  FROM events),
      |marked AS (
      |  SELECT user_id, w,
      |    LAG(w) OVER (PARTITION BY user_id ORDER BY w) AS prev,
      |    LEAD(w) OVER (PARTITION BY user_id ORDER BY w) AS next
      |  FROM weekly),
      |statuses AS (
      |  SELECT w, CASE WHEN prev IS NULL THEN 'new'
      |    WHEN w - prev = 7 THEN 'retained'
      |    ELSE 'resurrected' END AS status
      |  FROM marked),
      |mx AS (SELECT MAX(w) AS max_w FROM weekly),
      |churn AS (
      |  SELECT w + 7 AS w, 'churned' AS status
      |  FROM marked, mx
      |  WHERE (next IS NULL OR next - w > 7) AND w + 7 <= max_w),
      |u AS (SELECT * FROM statuses UNION ALL SELECT * FROM churn)
      |SELECT strftime(w, '%Y-%m-%d') AS week,
      |  CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_new,
      |  CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_retained,
      |  CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_resurrected,
      |  CAST(SUM(CASE WHEN status = 'churned' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_churned
      |FROM u GROUP BY 1 ORDER BY week""".stripMargin

  /** `q_cohort_ltv`: cumulative revenue per signup cohort — X69's
    * retention matrix with MONEY in the cells: users grouped by first-
    * event week, purchase revenue attributed to its week offset from
    * that first day, then the running cumulative per cohort — the "LTV
    * curve" a growth team reads next to retention. Revenue is exact
    * cents (DECIMAL sums at both levels); the cumulative window walks
    * the (cohort × offset) matrix frame, bounded by weeks², never the
    * events.
    *
    * Scale shape: one user-keyed window pins first_d (the X69 exchange),
    * the matrix fold is two-phase, and the running sum rides the
    * cohort-partitioned offset order over matrix cells. */
  def cohortLtvQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val wU = Window.partitionBy(col("user_id"))
    val cents = (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
    val cells = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        col("event_type"), cents.as("cents"))
      .withColumn("first_d", min(col("d")).over(wU))
      .filter(col("event_type") === "purchase")
      .select(
        date_format(date_trunc("week", col("first_d")), "yyyy-MM-dd")
          .as("cohort_week"),
        (datediff(col("d"), col("first_d")) / 7).cast("long")
          .as("offset_week"),
        col("cents"))
      .groupBy(col("cohort_week"), col("offset_week"))
      .agg(sum(col("cents").cast(DecimalType(38, 0))).as("rev"))
    val cum = Window.partitionBy(col("cohort_week")).orderBy(col("offset_week"))
    cells
      .withColumn("cum_rev", sum(col("rev")).over(cum))
      .select(col("cohort_week"), col("offset_week"),
        col("rev").cast("long").as("rev_cents"),
        col("cum_rev").cast("long").as("cum_rev_cents"))
      .orderBy(col("cohort_week"), col("offset_week"))
  }

  val cohortLtvOracle: String =
    """WITH act AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_d
      |  FROM events),
      |cells AS (
      |  SELECT strftime(date_trunc('week', first_d), '%Y-%m-%d')
      |      AS cohort_week,
      |    (d - first_d) // 7 AS offset_week,
      |    CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS rev
      |  FROM act WHERE event_type = 'purchase'
      |  GROUP BY 1, 2)
      |SELECT cohort_week, offset_week,
      |  CAST(rev AS BIGINT) AS rev_cents,
      |  CAST(SUM(rev) OVER (PARTITION BY cohort_week ORDER BY offset_week
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_cents
      |FROM cells ORDER BY cohort_week, offset_week""".stripMargin

  /** `q_event_paths`: the first-order journey graph — counts of each
    * (event_type → next event_type) transition across all per-user
    * timelines, with the source's outgoing total beside each edge (the
    * Markov transition numerator/denominator as exact integers; the
    * division is the caller's). One lead() over the per-user ordered
    * window (total order: ts then event_id), then a two-phase count on
    * the ≤ types² edge frame; the per-source totals come from a window
    * over that already-tiny aggregate, not the raw data. */
  def eventPathsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val bySrc = Window.partitionBy(col("src"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(Num.countStar.as("n"))
      .withColumn("src_total", sum(col("n")).over(bySrc))
      .orderBy(col("src"), col("dst"))
  }

  val eventPathsOracle: String =
    """WITH hops AS (
      |  SELECT event_type AS src,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) AS dst
      |  FROM events),
      |edges AS (
      |  SELECT src, dst, COUNT(*) AS n FROM hops
      |  WHERE dst IS NOT NULL GROUP BY 1, 2)
      |SELECT src, dst, n,
      |  CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS src_total
      |FROM edges ORDER BY src, dst""".stripMargin

  /** `q_audience_overlap`: the audience-overlap matrix — for every ordered
    * pair of event types, how many distinct users did BOTH (the
    * segment-intersection report behind "viewers who also purchased"),
    * with each side's audience size for the Jaccard the caller derives.
    *
    * Plan: the corpus folds to the distinct (event_type, user_id) frame
    * first (two-phase, map-side combined — at most |types| rows per user
    * survive); the pair expansion self-joins THAT frame on user_id, so
    * each user contributes at most types² pair rows, and the matrix
    * rollup is bounded by types². The per-type audience sizes come from
    * the same distinct frame and broadcast onto the matrix. */
  def audienceOverlapQ(spark: SparkSession, sfDir: String): DataFrame = {
    // Three consumers (both self-join sides + the sizes rollup) —
    // materialize the distinct frame once instead of re-folding events,
    // pre-partitioned on the overlap key so the self-join below runs
    // exchange-free on both sides.
    val tu = graft.engine.Materialize.diskBacked(
      Tables.events(spark, sfDir)
        .select(col("event_type"), col("user_id")).distinct()
        .repartition(col("user_id")))
    val sizes = tu.groupBy(col("event_type"))
      .agg(Num.countStar.as("n_users"))
    tu.as("a").join(tu.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(Num.countStar.as("overlap"))
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n_users").as("users_a"))), Seq("type_a"))
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n_users").as("users_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("overlap"),
        col("users_a"), col("users_b"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val audienceOverlapOracle: String =
    """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
      |s AS (SELECT event_type, COUNT(*) AS n_users FROM tu GROUP BY 1),
      |m AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    COUNT(*) AS overlap
      |  FROM tu a JOIN tu b ON a.user_id = b.user_id
      |    AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT m.type_a, m.type_b, m.overlap,
      |  sa.n_users AS users_a, sb.n_users AS users_b
      |FROM m JOIN s sa ON sa.event_type = m.type_a
      |       JOIN s sb ON sb.event_type = m.type_b
      |ORDER BY type_a, type_b""".stripMargin

  /** `q_churn`: weekly churn/retention ledger — for each ISO week, how many
    * of its active users stayed active the NEXT week vs. churned. The
    * week-over-week set difference every growth dashboard tracks.
    *
    * Plan: the corpus folds to distinct (user, week) once; the
    * week-vs-next comparison is a self left-join of that frame on
    * (user, week+1) — both sides hash on user, weeks²-free (the join key
    * includes the week, so state is one row per (user, week)); the ledger
    * rollup is weeks-bounded. No window over row-proportional input.
    *
    * The newest week is RIGHT-CENSORED — no following week exists yet, so
    * its retention is unknowable, not zero. It is excluded from the ledger
    * (the max week still contributes as the "next week" of its
    * predecessor) rather than reported as a misleading 100%-churn row. */
  def churnQ(spark: SparkSession, sfDir: String): DataFrame = {
    // MATERIALIZED: uw feeds both join sides (the ledger and its own
    // next-week probe) — the events fold must not run twice (the
    // multi-consumer rule the file's other ledgers follow)
    val uw = graft.engine.Materialize.diskBacked(
      Tables.events(spark, sfDir)
        .select(col("user_id"),
          date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("wk"),
          date_format(date_trunc("week", col("ts")) + expr("interval 7 days"),
            "yyyy-MM-dd").as("wk_next"))
        .distinct())
    val nxt = uw.select(col("user_id"), col("wk").as("wk_next"))
      .withColumn("active_next", lit(1L))
    // Censoring happens AFTER the rollup, on the weeks-bounded ledger: a
    // global max window over <= |weeks| rows is free, needs no extra scan
    // or join of the data-sized frame, and drops exactly the max-week row.
    val allWk = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    uw.join(nxt, Seq("user_id", "wk_next"), "left")
      .groupBy(col("wk"))
      .agg(Num.countStar.as("n_active"),
        coalesce(sum(col("active_next")), lit(0L)).as("n_retained"),
        (Num.countStar - coalesce(sum(col("active_next")), lit(0L)))
          .as("n_churned"))
      .withColumn("max_wk", max(col("wk")).over(allWk))
      .filter(col("wk") < col("max_wk")).drop("max_wk")
      .orderBy(col("wk"))
  }

  val churnOracle: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id,
      |    strftime(date_trunc('week', ts), '%Y-%m-%d') AS wk,
      |    strftime(date_trunc('week', ts) + INTERVAL 7 DAY, '%Y-%m-%d')
      |      AS wk_next
      |  FROM events)
      |SELECT a.wk, COUNT(*) AS n_active,
      |  CAST(COALESCE(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 END), 0)
      |    AS BIGINT) AS n_retained,
      |  COUNT(*) - CAST(COALESCE(SUM(CASE WHEN b.user_id IS NOT NULL
      |    THEN 1 END), 0) AS BIGINT) AS n_churned
      |FROM uw a LEFT JOIN uw b
      |  ON b.user_id = a.user_id AND b.wk = a.wk_next
      |WHERE a.wk < (SELECT MAX(wk) FROM uw)
      |GROUP BY 1 ORDER BY a.wk""".stripMargin

  /** Experiment arms for the A/B report. */
  val AbArms = 2

  /** `q_ab_lift`: deterministic experiment readout — users hash-assigned
    * to AbArms arms (the same split-by-hash discipline as X31's
    * train/val/test split: assignment is a pure function of the id, stable
    * across reruns and machines), each arm reporting exposed users,
    * converters (≥1 purchase), and conversion events; the lift ratio's
    * exact numerators/denominators, division left to the caller.
    *
    * Plan: ONE two-phase aggregate over (arm, user) then (arm) — the
    * assignment is a narrow hash projection at the scan, never a join
    * against an assignment table. */
  def abLiftQ(spark: SparkSession, sfDir: String): DataFrame = {
    val arm = pmod(
      conv(substring(md5(concat(lit("ab"), col("user_id"))), 1, 15), 16, 10)
        .cast("long"), lit(AbArms))
    Tables.events(spark, sfDir)
      .select(arm.as("arm"), col("user_id"),
        (col("event_type") === "purchase").cast("long").as("is_conv"))
      .groupBy(col("arm"), col("user_id"))
      .agg(sum(col("is_conv")).as("conv_events"))
      .groupBy(col("arm"))
      .agg(Num.countStar.as("n_users"),
        sum((col("conv_events") > 0).cast("long")).as("n_converters"),
        sum(col("conv_events")).as("n_conversions"))
      .orderBy(col("arm"))
  }

  val abLiftOracle: String =
    s"""WITH t AS (
       |  SELECT CAST(concat('0x', substr(md5('ab' || user_id), 1, 15))
       |           AS BIGINT) % ${AbArms} AS arm,
       |    user_id,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv
       |  FROM events),
       |u AS (SELECT arm, user_id, SUM(is_conv) AS conv_events
       |      FROM t GROUP BY 1, 2)
       |SELECT arm, COUNT(*) AS n_users,
       |  CAST(SUM(CASE WHEN conv_events > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_converters,
       |  CAST(SUM(conv_events) AS BIGINT) AS n_conversions
       |FROM u GROUP BY 1 ORDER BY arm""".stripMargin

  /** X107 `q_cumulative_users`: daily active / new / cumulative-distinct
    * users — the growth-accounting report whose naive form is a running
    * COUNT(DISTINCT) over an ever-growing window: state grows with the
    * corpus and the work is quadratic in days. The scale-correct
    * decomposition: cumulative distinct users through day d ≡ users whose
    * FIRST event is ≤ d, so (1) fold the firehose once to the distinct
    * (user, day) frame, (2) per-user min(day) = first appearance — both
    * two-phase aggregates on the same user-keyed exchange, (3) count
    * first-appearances per day and prefix-sum them over the DAYS-bounded
    * ledger (the frame is |days| rows — 365/year regardless of event
    * volume — so its single-partition running window is legal by the
    * repo's own bounded-domain rule, same as X22/X47). n_active joins in
    * from the same (user, day) frame; days where only returning users
    * showed up get n_new = 0 via the left join's null-fill. */
  def cumulativeUsersQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the distinct (user, day) frame feeds BOTH the active and first-seen
    // branches — materialized once (the multi-consumer rule)
    val userDay = Materialize.diskBacked(
      Tables.events(spark, sfDir)
        .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .distinct())
    val active = userDay.groupBy(col("day"))
      .agg(Num.countStar.as("n_active"))
    val firstDay = userDay.groupBy(col("user_id"))
      .agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(Num.countStar.as("n_new"))
    val ledger = active.join(firstDay, Seq("day"), "left")
      .select(col("day"), col("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    ledger.withColumn("cum_users",
        sum(col("n_new")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("day"))
  }

  val cumulativeUsersOracle: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events),
      |act AS (SELECT day, COUNT(*) AS n_active FROM ud GROUP BY 1),
      |fst AS (
      |  SELECT day, COUNT(*) AS n_new FROM (
      |    SELECT user_id, MIN(day) AS day FROM ud GROUP BY 1) GROUP BY 1)
      |SELECT a.day, a.n_active,
      |  CAST(COALESCE(f.n_new, 0) AS BIGINT) AS n_new,
      |  CAST(SUM(COALESCE(f.n_new, 0)) OVER (ORDER BY a.day
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      |FROM act a LEFT JOIN fst f USING (day)
      |ORDER BY day""".stripMargin

  /** Trailing window for the rolling-actives ledger, in days (WAU). */
  val WauWindowDays = 7

  /** X109 `q_wau`: trailing-7-day distinct actives per day (WAU) — the
    * sliding COUNT(DISTINCT) that cannot be a window function at scale
    * (per-day distinct state is corpus-sized and non-subtractable).
    * Decomposition: user u is WAU-active on day d iff some activity day
    * of u lies in [d−6, d] — so the distinct (user, day) frame EXPANDS
    * each activity day to the ≤7 window-end days it serves, re-distincts
    * (adjacent activity days serve overlapping windows), and counts per
    * window day. Cost is bounded by 7·|user-days| — a fold of the
    * firehose dwarfs it — and every step is a plain two-phase
    * aggregate/expand, no global order anywhere. The same shape serves
    * MAU (stride 30); for windows long enough that W·|user-days| hurts,
    * the move is per-day user SETS merged by the X62 sketch algebra
    * (exact → approximate trade, same dataflow). Window days are clamped
    * to [first_day + 6, last_day] so every reported day aggregates a FULL
    * 7-day trailing span of real data — a partial leading window would
    * read as artificially depressed WAU. The distinct (user, day) frame
    * feeds both the bounds aggregate and the expansion — materialized
    * once (the multi-consumer rule). */
  def wauQ(spark: SparkSession, sfDir: String): DataFrame = {
    val ud = Materialize.diskBacked(
      Tables.events(spark, sfDir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct())
    val bounds = ud.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    ud.select(col("user_id"),
        explode(sequence(col("day"),
          date_add(col("day"), WauWindowDays - 1))).as("wday"))
      .distinct()
      .join(broadcast(bounds))
      .filter(col("wday") >= date_add(col("lo"), WauWindowDays - 1) &&
        col("wday") <= col("hi"))
      .groupBy(col("wday"))
      .agg(Num.countStar.as("wau"))
      .select(date_format(col("wday"), "yyyy-MM-dd").as("day"), col("wau"))
      .orderBy(col("day"))
  }

  val wauOracle: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
       |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud),
       |w AS (
       |  SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS wday
       |  FROM ud, UNNEST(range(0, ${WauWindowDays})) AS u(i))
       |SELECT strftime(w.wday, '%Y-%m-%d') AS day, COUNT(*) AS wau
       |FROM w, b
       |WHERE w.wday BETWEEN b.lo + ${WauWindowDays - 1} AND b.hi
       |GROUP BY 1 ORDER BY day""".stripMargin

  // `q_streaks`: gaps-and-islands longest consecutive-day streak

  /** `q_streaks`: longest consecutive-DAY activity streak per user, rolled
    * up to a streak-length histogram — the classic gaps-and-islands
    * pattern (engagement/retention's "current streak" metric), distinct
    * from X5's time-gap sessionization: islands are calendar-day runs, so
    * the island id is day_offset − dense_rank(day) per user (constant
    * within a run, jumps at every gap), needing no gap threshold and no
    * lag comparison.
    *
    * Scale shape: events collapse to distinct (user, day) FIRST (one
    * map-side-combined aggregate — user-days, not events); the
    * dense_rank window and both rollups run on that calendar-bounded
    * frame (≤ |days| rows per user), and the report is
    * |distinct streak lengths|-sized. One exchange on user_id serves the
    * window and the per-user max (the shared-partitioning discipline). */
  def streaksQ(spark: SparkSession, sfDir: String): DataFrame =
    streaks(Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct())

  /** Core over any distinct (user_id, day DATE) frame. */
  def streaks(userDays: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    userDays
      .withColumn("island",
        datediff(col("day"), lit("2024-01-01").cast("date"))
          - dense_rank().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(Num.countStar.as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("best"))
      .groupBy(col("best").as("streak_len"))
      .agg(Num.countStar.as("n_users"))
      .orderBy(col("streak_len"))
  }

  val streaksOracle: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |islands AS (
      |  SELECT user_id,
      |    date_diff('day', DATE '2024-01-01', day)
      |      - DENSE_RANK() OVER (PARTITION BY user_id ORDER BY day) AS island
      |  FROM ud),
      |runs AS (
      |  SELECT user_id, island, COUNT(*) AS len
      |  FROM islands GROUP BY 1, 2),
      |best AS (
      |  SELECT user_id, MAX(len) AS best FROM runs GROUP BY 1)
      |SELECT best AS streak_len, COUNT(*) AS n_users
      |FROM best GROUP BY 1 ORDER BY streak_len""".stripMargin

  // `q_activity_bitmap`: bitmap-index retention

  /** Day-offset domain the bitmask covers (bits 0..62 of a BIGINT; the
    * corpus epoch is the generator's start date). Offsets outside the
    * domain are filtered — the documented contract of a single-word
    * bitmap; longer horizons shard the mask by (user, epoch-week) rows. */
  val BitmapEpoch = "2024-01-01"
  val BitmapMaxDay = 62
  /** Day-k retention checkpoints reported. */
  val BitmapRetentionDays: Seq[Int] = Seq(1, 7, 14)

  /** `q_activity_bitmap`: X69's cohort-retention question answered by a
    * BITMAP INDEX instead of k self-joins — the bitmap-index trick every
    * serious analytics store uses for audience/retention math: each
    * user's activity history collapses to ONE 64-bit day-position mask
    * (`bit_or(1 << day_offset)`, a two-phase map-side-combined
    * aggregate), and any cohort intersection ("active day 0 AND day k")
    * is then a bitwise AND over the user-sized mask frame — no joins, no
    * second pass over events, and adding a checkpoint costs one more AND,
    * not one more join. At 100 TB: one shuffle of (user, mask-partial)
    * words replaces k event-table self-joins; the mask frame is the
    * reusable asset (audience overlap, streaks, churn all read it). */
  def activityBitmapQ(spark: SparkSession, sfDir: String): DataFrame = {
    val d = datediff(to_date(col("ts")), lit(BitmapEpoch).cast("date"))
    val masks = Tables.events(spark, sfDir)
      .select(col("user_id"), d.as("d"))
      .filter(col("d") >= 0 && col("d") <= BitmapMaxDay)
      .groupBy(col("user_id"))
      .agg(bit_or(expr("shiftleft(1L, d)")).as("mask"))
    def bitSet(k: Int) = col("mask").bitwiseAND(lit(1L << k)) =!= lit(0L)
    val aggs =
      sum(when(bitSet(0), 1L).otherwise(0L)).as("day0_actives") +:
        BitmapRetentionDays.map(k =>
          sum(when(bitSet(0) && bitSet(k), 1L).otherwise(0L))
            .as(s"retained_d$k"))
    masks.agg(aggs.head, aggs.tail: _*)
  }

  val activityBitmapOracle: String = {
    val checkpoints = BitmapRetentionDays.map(k =>
      s"""CAST(SUM(CASE WHEN (mask & 1) <> 0 AND (mask & ${1L << k}) <> 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS retained_d$k""".stripMargin)
      .mkString(",\n  ")
    s"""WITH masks AS (
       |  SELECT user_id,
       |    bit_or(1::BIGINT << CAST(date_diff('day', DATE '${BitmapEpoch}',
       |      CAST(ts AS DATE)) AS INTEGER)) AS mask
       |  FROM events
       |  WHERE date_diff('day', DATE '${BitmapEpoch}', CAST(ts AS DATE))
       |    BETWEEN 0 AND ${BitmapMaxDay}
       |  GROUP BY 1)
       |SELECT
       |  CAST(SUM(CASE WHEN (mask & 1) <> 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS day0_actives,
       |  $checkpoints
       |FROM masks""".stripMargin
  }

  // `q_cuped`: variance-reduced experiment readout (CUPED)

  /** Boundary between the pre-experiment covariate period and the
    * experiment period (events are a fixed 2024-01 synthetic month). */
  val CupedSplitDate = "2024-01-15"

  /** `q_cuped`: CUPED-adjusted A/B readout (Deng et al., WSDM'13) — the
    * standard variance-reduction layer over X85's raw lift readout: each
    * user's pre-experiment spend X is a covariate for their experiment
    * spend Y, theta = cov(X,Y)/var(X) fit on ALL users (arm-blind, so
    * the adjustment cannot bias the contrast), and each arm reports
    * mean(Y) alongside mean(Y) - theta*(mean(X)_arm - mean(X)) — same
    * expectation, (1-corr^2) of the variance.
    *
    * Scale shape: one shuffle to the per-user ledger (user-keyed
    * aggregate over the firehose), then two tiny reductions off it — the
    * global moment row (broadcast back as a 1-row crossJoin) and the
    * per-arm sums; the firehose is scanned once. Cross-engine: spend is
    * exact cents (DECIMAL), every moment (n, SX, SY, SXX, SXY and the
    * theta numerator/denominator cross-products) is an exact integer in
    * DECIMAL(38,0), and the only doubles are the final pinned-order
    * division chain — the X72 linfit convention applied to covariate
    * adjustment. */
  def cupedQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val arm = pmod(
      conv(substring(md5(concat(lit("cu"), col("user_id"))), 1, 15), 16, 10)
        .cast("long"), lit(AbArms))
    val cents = (col("value").cast(DecimalType(18, 2)) * 100)
      .cast(DecimalType(38, 0))
    val perUser = Tables.events(spark, sfDir)
      .select(arm.as("arm"), col("user_id"),
        when(col("ts") < lit(CupedSplitDate).cast("timestamp"), cents)
          .otherwise(lit(0).cast(DecimalType(38, 0))).as("xc"),
        when(col("ts") >= lit(CupedSplitDate).cast("timestamp"), cents)
          .otherwise(lit(0).cast(DecimalType(38, 0))).as("yc"))
      .groupBy(col("arm"), col("user_id"))
      .agg(sum(col("xc")).cast(DecimalType(38, 0)).as("x"),
        sum(col("yc")).cast(DecimalType(38, 0)).as("y"))
    val moments = perUser.agg(
      Num.countStar.as("n"),
      sum(col("x")).cast(DecimalType(38, 0)).as("sx"),
      sum(col("y")).cast(DecimalType(38, 0)).as("sy"),
      sum(col("x") * col("x")).cast(DecimalType(38, 0)).as("sxx"),
      sum(col("x") * col("y")).cast(DecimalType(38, 0)).as("sxy"))
    perUser.groupBy(col("arm"))
      .agg(Num.countStar.as("n_users"),
        sum(col("x")).cast(DecimalType(38, 0)).as("sxa"),
        sum(col("y")).cast(DecimalType(38, 0)).as("sya"))
      .crossJoin(broadcast(moments))
      .select(col("arm"), col("n_users"),
        (col("sya").cast("double") / lit(100.0) / col("n_users"))
          .as("mean_post"),
        ((col("sya").cast("double") / lit(100.0) / col("n_users"))
          - ((col("n").cast(DecimalType(38, 0)) * col("sxy")
                - col("sx") * col("sy")).cast("double")
             / (col("n").cast(DecimalType(38, 0)) * col("sxx")
                - col("sx") * col("sx")).cast("double"))
            * ((col("sxa").cast("double") / lit(100.0) / col("n_users"))
               - (col("sx").cast("double") / lit(100.0) / col("n"))))
          .as("mean_adjusted"))
      .orderBy(col("arm"))
  }

  val cupedOracle: String =
    s"""WITH e AS (
       |  SELECT CAST(concat('0x', substr(md5('cu' || user_id), 1, 15))
       |           AS BIGINT) % ${AbArms} AS arm,
       |    user_id,
       |    CASE WHEN ts < TIMESTAMP '${CupedSplitDate} 00:00:00'
       |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))
       |      ELSE CAST(0 AS DECIMAL(38,0)) END AS xc,
       |    CASE WHEN ts >= TIMESTAMP '${CupedSplitDate} 00:00:00'
       |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))
       |      ELSE CAST(0 AS DECIMAL(38,0)) END AS yc
       |  FROM events),
       |u AS (
       |  SELECT arm, user_id, CAST(SUM(xc) AS DECIMAL(38,0)) AS x,
       |    CAST(SUM(yc) AS DECIMAL(38,0)) AS y
       |  FROM e GROUP BY 1, 2),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
       |    CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
       |    CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
       |    CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy
       |  FROM u),
       |a AS (
       |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
       |    CAST(SUM(x) AS DECIMAL(38,0)) AS sxa,
       |    CAST(SUM(y) AS DECIMAL(38,0)) AS sya
       |  FROM u GROUP BY 1)
       |SELECT arm, n_users,
       |  CAST(sya AS DOUBLE) / 100.0 / n_users AS mean_post,
       |  (CAST(sya AS DOUBLE) / 100.0 / n_users)
       |    - (CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
       |       / CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE))
       |      * ((CAST(sxa AS DOUBLE) / 100.0 / n_users)
       |         - (CAST(sx AS DOUBLE) / 100.0 / n))
       |    AS mean_adjusted
       |FROM a, m ORDER BY arm""".stripMargin

  // `q_attribution`: conversion credit assignment

  /** `q_attribution`: first-touch vs last-touch conversion attribution —
    * for every purchase, credit (a) the user's most recent preceding
    * non-purchase interaction and (b) their first-ever preceding
    * interaction; purchases with no preceding interaction credit
    * 'direct'. The two models ship as one long-form report
    * (model, channel, n_conversions, revenue), the side-by-side the
    * reference's engagement reports would feed a marketing-mix reader.
    *
    * Scale shape: ONE shuffle on user_id serves both attribution windows
    * (same partition key, frames differ only in direction), then a
    * channels-bounded aggregate per model — the firehose is scanned
    * once, and no self-join (the naive form joins purchases back to the
    * event table) ever materializes. Revenue is exact cents via the
    * sumMoney convention. */
  def attributionQ(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    // MATERIALIZED: the attributed-purchases frame feeds BOTH model
    // rollups — unmaterialized, the scan + user exchange + window
    // subtree executes twice (the multi-consumer rule; PlanSpec counts
    // the exchanges)
    val attributed = Materialize.diskBacked(Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"),
        coalesce(last(touch, ignoreNulls = true).over(byUser), lit("direct"))
          .as("last_touch"),
        coalesce(first(touch, ignoreNulls = true).over(byUser), lit("direct"))
          .as("first_touch"))
      .filter(col("event_type") === "purchase"))
    attributed
      .groupBy(col("last_touch").as("channel"))
      .agg(Num.countStar.as("n_conversions"),
        Num.sumMoney(col("value")).as("revenue"))
      .select(lit("last").as("model"), col("channel"),
        col("n_conversions"), col("revenue"))
      .unionByName(attributed
        .groupBy(col("first_touch").as("channel"))
        .agg(Num.countStar.as("n_conversions"),
          Num.sumMoney(col("value")).as("revenue"))
        .select(lit("first").as("model"), col("channel"),
          col("n_conversions"), col("revenue")))
      .orderBy(col("model"), col("channel"))
  }

  val attributionOracle: String =
    """WITH a AS (
      |  SELECT event_type, value,
      |    COALESCE(last_value(CASE WHEN event_type <> 'purchase'
      |        THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      'direct') AS last_touch,
      |    COALESCE(first_value(CASE WHEN event_type <> 'purchase'
      |        THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      'direct') AS first_touch
      |  FROM events),
      |p AS (SELECT * FROM a WHERE event_type = 'purchase')
      |SELECT 'last' AS model, last_touch AS channel,
      |  CAST(COUNT(*) AS BIGINT) AS n_conversions,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM p GROUP BY 2
      |UNION ALL
      |SELECT 'first', first_touch, CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |FROM p GROUP BY 2
      |ORDER BY model, channel""".stripMargin

  // `q_survival`: discrete survival / hazard table

  /** Interval width for the life table, in days (quarters). */
  val SurvIntervalDays = 90
  /** A customer whose LAST order falls within this many days of the
    * dataset's end is right-censored (lifetime still open), the standard
    * Kaplan-Meier censoring rule for observation-window truncation. */
  val SurvCensorDays = 180

  /** `q_survival`: discrete life table over customer lifetimes (first to
    * last order) — the survival-analysis counterpart of X84's calendar
    * churn ledger: churn counts WHO left each week; the life table says
    * how long a relationship LASTS — per 90-day interval, who was still
    * at risk, who churned there, who aged out of the observation window
    * (right-censored). Per-interval hazard d/n_risk is the
    * Kaplan-Meier ingredient; it ships as exact integer-division ppm —
    * the cumulative survival PRODUCT is left to the caller (it is a
    * rational with an unboundedly growing denominator, exactly the kind
    * of value the cross-engine gate can't pin bit-for-bit; X140's EWMA
    * quantization solved this for a FIXED window, a life table has none).
    *
    * Scale shape: orders fold to per-customer (first, last) in ONE
    * customer-keyed aggregate; the observation end is a 1-row broadcast
    * crossJoin (X141's global-moment pattern, no data-sized window); the
    * life table itself is an INTERVAL-domain histogram (lifetimes/90d —
    * dozens of rows at any scale) and n_risk is a suffix sum walking that
    * domain. Nothing after the first fold is data-sized. */
  def survivalQ(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("first_d"),
        max(to_date(col("o_orderdate"))).as("last_d"))
    val end = Tables.orders(spark, sfDir)
      .agg(max(to_date(col("o_orderdate"))).as("end_d"))
    val hist = perCust.crossJoin(broadcast(end))
      .select(
        (datediff(col("last_d"), col("first_d")) / SurvIntervalDays)
          .cast("long").as("k"),
        (datediff(col("end_d"), col("last_d")) < SurvCensorDays)
          .as("censored"))
      .groupBy(col("k"))
      .agg(sum(when(col("censored"), 0L).otherwise(1L)).as("n_deaths"),
        sum(when(col("censored"), 1L).otherwise(0L)).as("n_censored"))
    val all = Window.partitionBy()
    val after = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("total", sum(col("n_deaths") + col("n_censored")).over(all))
      .withColumn("gone", coalesce(
        sum(col("n_deaths") + col("n_censored")).over(after), lit(0L)))
      .select(col("k"), (col("total") - col("gone")).as("n_risk"),
        col("n_deaths"), col("n_censored"))
      .withColumn("hazard_ppm", expr("(n_deaths * 1000000) div n_risk"))
      .orderBy(col("k"))
  }

  val survivalOracle: String =
    s"""WITH pc AS (
       |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d,
       |    MAX(CAST(o_orderdate AS DATE)) AS last_d
       |  FROM orders GROUP BY 1),
       |e AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS end_d FROM orders),
       |h AS (
       |  SELECT date_diff('day', first_d, last_d) // ${SurvIntervalDays} AS k,
       |    CAST(SUM(CASE WHEN date_diff('day', last_d, end_d)
       |      < ${SurvCensorDays} THEN 0 ELSE 1 END) AS BIGINT) AS n_deaths,
       |    CAST(SUM(CASE WHEN date_diff('day', last_d, end_d)
       |      < ${SurvCensorDays} THEN 1 ELSE 0 END) AS BIGINT) AS n_censored
       |  FROM pc, e GROUP BY 1),
       |w AS (
       |  SELECT k, n_deaths, n_censored,
       |    CAST(SUM(n_deaths + n_censored) OVER () AS BIGINT) AS total,
       |    CAST(COALESCE(SUM(n_deaths + n_censored) OVER (ORDER BY k
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS gone
       |  FROM h)
       |SELECT k, total - gone AS n_risk, n_deaths, n_censored,
       |  (n_deaths * 1000000) // (total - gone) AS hazard_ppm
       |FROM w ORDER BY k""".stripMargin

  // `q_bursts`: above-median activity run census per event type

  /** `q_bursts`: burst census over the daily event series — per event
    * type, the days whose count exceeds the type's own MEDIAN daily
    * count, collapsed into consecutive-day runs (how many bursts, how
    * long the longest) — X136's gaps-and-islands machinery lifted from
    * per-user streaks to the series level, with the threshold derived
    * from the data (exact X22 median) rather than pinned. An exact,
    * reproducible stand-in for Kleinberg burst detection's state machine.
    *
    * Scale shape: events fold to the (type × day) count frame (calendar-
    * bounded forever); the median walks the per-type count histogram; the
    * island key is day_number − rank over the above-median subset of the
    * day frame. Everything after the first fold is day-domain-sized. */
  def burstsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Materialize.diskBacked(
      Tables.events(spark, sfDir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(Num.countStar.as("c"))
        .withColumn("dn", datediff(col("d"), lit("1995-01-01").cast("date"))))
    val byC = Window.partitionBy(col("event_type")).orderBy(col("c"))
    val all = Window.partitionBy(col("event_type"))
    val med = daily
      .groupBy(col("event_type"), col("c")).agg(Num.countStar.as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byC))
      .withColumn("n", sum(col("cnt")).over(all))
      .groupBy(col("event_type"))
      .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col("c")))
        .as("median_c"))
    val byD = Window.partitionBy(col("event_type")).orderBy(col("dn"))
    val runs = daily.join(broadcast(med), Seq("event_type"))
      .filter(col("c") > col("median_c"))
      .withColumn("grp", col("dn") - row_number().over(byD))
      .groupBy(col("event_type"), col("grp"))
      .agg(Num.countStar.as("len"))
    runs.groupBy(col("event_type"))
      .agg(Num.countStar.as("n_bursts"),
        sum(col("len")).as("n_burst_days"),
        max(col("len")).as("longest_burst"))
      .orderBy(col("event_type"))
  }

  val burstsOracle: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c,
      |    date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS dn
      |  FROM events GROUP BY 1, 2, 4),
      |h AS (
      |  SELECT event_type, c, COUNT(*) AS cnt FROM daily GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, c,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM h),
      |med AS (
      |  SELECT event_type,
      |    MIN(CASE WHEN cum >= (n + 1) // 2 THEN c END) AS median_c
      |  FROM w GROUP BY 1),
      |above AS (
      |  SELECT daily.event_type, dn,
      |    dn - ROW_NUMBER() OVER (PARTITION BY daily.event_type
      |      ORDER BY dn) AS grp
      |  FROM daily JOIN med USING (event_type)
      |  WHERE c > median_c),
      |runs AS (
      |  SELECT event_type, grp, COUNT(*) AS len
      |  FROM above GROUP BY 1, 2)
      |SELECT event_type, COUNT(*) AS n_bursts,
      |  CAST(SUM(len) AS BIGINT) AS n_burst_days,
      |  CAST(MAX(len) AS BIGINT) AS longest_burst
      |FROM runs GROUP BY 1 ORDER BY event_type""".stripMargin

  // `q_rfm`: recency/frequency/monetary quintile segmentation

  /** Monetary scoring resolution: customer lifetime spend is quantized to
    * $100 units before the quintile histogram, bounding the threshold
    * window's input by the SPEND DOMAIN (tens of thousands of cells), not
    * the customer count. */
  val RfmMonetaryUnitCents = 10000L

  /** `q_rfm`: RFM (recency / frequency / monetary) customer segmentation —
    * the standard CRM scoring grid, built the exact-percentile way: each
    * metric's quintile thresholds t20..t80 come from a VALUE-HISTOGRAM
    * rank walk (X22's discipline — `ntile(5)` over customers would
    * total-sort a warehouse-scale customer frame through one reducer and
    * tie-break nondeterministically; threshold scoring is deterministic,
    * histogram-bounded, and reproducible cross-engine). Scores: higher
    * spend/orders → higher F/M; more RECENT → higher R (days compare
    * BELOW thresholds). Marquee segments (champions / at-risk /
    * hibernating / new) are a pinned CASE over the score grid.
    *
    * Scale shape: one customer-keyed fold builds the (recency, frequency,
    * monetary) ledger, materialized once for its four consumers (three
    * metric histograms + the final scoring pass). Thresholds are 1-row
    * frames broadcast back (X141's global-moment pattern). Histogram
    * windows walk bounded domains: days (calendar), order counts (small),
    * $100 spend units. Money is exact cents end to end; the threshold
    * rank is the X22 ceil formula in integer arithmetic. */
  def rfmQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    val end = Tables.orders(spark, sfDir)
      .agg(max(to_date(col("o_orderdate"))).as("end_d"))
    val ledger = Materialize.diskBacked(
      Tables.orders(spark, sfDir)
        .groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_d"),
          Num.countStar.as("frequency"),
          sum(cents).as("monetary_cents"))
        .crossJoin(broadcast(end))
        .select(col("o_custkey"),
          datediff(col("end_d"), col("last_d")).cast("long").as("recency_d"),
          col("frequency"),
          col("monetary_cents"),
          Num.divLong(col("monetary_cents"), RfmMonetaryUnitCents)
            .as("monetary_u")))
    // Quintile thresholds of ALL THREE metrics in ONE histogram pass:
    // melt the ledger to (metric, v), histogram per (metric, v), rank-walk
    // per metric with the window PARTITIONED by metric (each partition is
    // one metric's domain-bounded value histogram — days / order counts /
    // $100 units — so no data-sized window appears), then fold the 3×4
    // thresholds into a single 1-row broadcast. Threshold formula per
    // quintile k: min v with cum >= ceil(k·n/5), X22's exact-integer rank.
    // One shuffle where the r8 shape ran three separate histogram jobs
    // over the same ledger (the only >25% bench drifter of round 8 —
    // VERDICT r8 item 4).
    val melted = ledger.select(explode(array(
        struct(lit("r").as("metric"), col("recency_d").as("v")),
        struct(lit("f").as("metric"), col("frequency").as("v")),
        struct(lit("m").as("metric"), col("monetary_u").as("v"))))
        .as("mv"))
      .select(col("mv.metric").as("metric"), col("mv.v").as("v"))
    val byV = Window.partitionBy(col("metric")).orderBy(col("v"))
    val all = Window.partitionBy(col("metric"))
    val perMetric = melted
      .groupBy(col("metric"), col("v")).agg(Num.countStar.as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byV))
      .withColumn("n", sum(col("cnt")).over(all))
      .groupBy(col("metric"))
      .agg(min(when(col("cum") >= expr("(n * 1 + 4) div 5"), col("v")))
          .as("t1"),
        (2 to 4).map { k =>
          min(when(col("cum") >= expr(s"(n * $k + 4) div 5"), col("v")))
            .as(s"t$k")
        }: _*)
    val thRow = perMetric
      .groupBy(lit(1).as("one"))
      .agg(
        max(when(col("metric") === "r", col("t1"))).as("tr1"),
        (for {
          (m, pfx) <- Seq("r" -> "tr", "f" -> "tf", "m" -> "tm")
          k <- 1 to 4
          if !(m == "r" && k == 1)
        } yield max(when(col("metric") === m, col(s"t$k"))).as(s"$pfx$k")): _*)
      .drop("one")
    val scored = ledger
      .crossJoin(broadcast(thRow))
      .select(col("monetary_cents"),
        (lit(1) + (1 to 4).map(k =>
          when(col("recency_d") < col(s"tr$k"), 1).otherwise(0))
          .reduce(_ + _)).as("r_score"),
        (lit(1) + (1 to 4).map(k =>
          when(col("frequency") > col(s"tf$k"), 1).otherwise(0))
          .reduce(_ + _)).as("f_score"),
        (lit(1) + (1 to 4).map(k =>
          when(col("monetary_u") > col(s"tm$k"), 1).otherwise(0))
          .reduce(_ + _)).as("m_score"))
    scored
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(Num.countStar.as("n_customers"),
        sum(col("monetary_cents").cast(DecimalType(38, 0))).cast("long")
          .as("monetary_cents"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4
          && col("m_score") >= 4, "champions")
          .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
          .when(col("r_score") >= 4 && col("f_score") <= 2, "new")
          .otherwise(lit("core")))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  val rfmOracle: String = {
    def thr(src: String, pfx: String): String =
      s"""(SELECT ${(1 to 4).map(k =>
        s"MIN(CASE WHEN cum >= (n * $k + 4) // 5 THEN v END) AS ${pfx}$k")
        .mkString(", ")}
         | FROM (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum,
         |   SUM(cnt) OVER () AS n
         |   FROM (SELECT $src AS v, COUNT(*) AS cnt FROM ledger GROUP BY 1)))"""
        .stripMargin
    s"""WITH e AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS end_d FROM orders),
       |ledger AS (
       |  SELECT o_custkey,
       |    date_diff('day', MAX(CAST(o_orderdate AS DATE)),
       |      (SELECT end_d FROM e)) AS recency_d,
       |    COUNT(*) AS frequency,
       |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
       |      AS BIGINT)) AS BIGINT) AS monetary_cents,
       |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
       |      AS BIGINT)) AS BIGINT) // ${RfmMonetaryUnitCents} AS monetary_u
       |  FROM orders GROUP BY 1),
       |tr AS ${thr("recency_d", "tr")},
       |tf AS ${thr("frequency", "tf")},
       |tm AS ${thr("monetary_u", "tm")},
       |scored AS (
       |  SELECT monetary_cents,
       |    1 + ${(1 to 4).map(k =>
      s"(CASE WHEN recency_d < tr$k THEN 1 ELSE 0 END)").mkString(" + ")}
       |      AS r_score,
       |    1 + ${(1 to 4).map(k =>
      s"(CASE WHEN frequency > tf$k THEN 1 ELSE 0 END)").mkString(" + ")}
       |      AS f_score,
       |    1 + ${(1 to 4).map(k =>
      s"(CASE WHEN monetary_u > tm$k THEN 1 ELSE 0 END)").mkString(" + ")}
       |      AS m_score
       |  FROM ledger, tr, tf, tm)
       |SELECT r_score, f_score, m_score,
       |  CAST(COUNT(*) AS BIGINT) AS n_customers,
       |  CAST(SUM(CAST(monetary_cents AS DECIMAL(38,0))) AS BIGINT)
       |    AS monetary_cents,
       |  CASE
       |    WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
       |      THEN 'champions'
       |    WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
       |    WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
       |    WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
       |    ELSE 'core' END AS segment
       |FROM scored GROUP BY 1, 2, 3
       |ORDER BY r_score, f_score, m_score""".stripMargin
  }
  // ------------------------------------------------------------------
  // `q_training_examples` (X216): next-event prediction pairs
  // ------------------------------------------------------------------

  /** Context length of the next-event examples. */
  val ExampleCtx = 3

  /** `q_training_examples`: TRAINING-EXAMPLE CONSTRUCTION from behavioral
    * logs — the supervised-pair builder behind every next-action /
    * session-recommendation model: per user, order events by (ts,
    * event_id) and emit one example per position with a full
    * ExampleCtx-length context — (ctx = the previous 3 event_types
    * joined '>', label = the current event_type). The gate is the
    * (ctx, label) CO-OCCURRENCE TABLE with per-context label share
    * (integer per-mille) — the dataset card a training run ships:
    * example volume per pattern, class balance per context, nothing
    * about the model. Windows are the only machinery: three lags over
    * the user partition, the X5 ordering discipline (ties broken by
    * event_id) so the example set is a pure function of the data.
    *
    * Scale shape: one user-partitioned window pass (the sessionize
    * shuffle), then a (|event_type|^4)-bounded rollup — example
    * construction at 100 TB is exactly this shape, with the window key
    * carrying the parallelism. */
  def trainingExamplesQ(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val lags = (1 to ExampleCtx).reverse.map(i => lag(col("event_type"), i).over(w))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("ctx", concat_ws(">", lags: _*))
      .withColumn("have", lags.map(_.isNotNull.cast("int")).reduce(_ + _))
      .filter(col("have") === ExampleCtx) // only full-context examples
      .groupBy(col("ctx"), col("event_type").as("label"))
      .agg(Num.countStar.as("n_examples"))
      .withColumn("ctx_total",
        sum(col("n_examples")).over(Window.partitionBy(col("ctx"))))
      .withColumn("label_share_permille",
        Num.divLong(col("n_examples") * 1000, col("ctx_total")))
      .orderBy(col("ctx"), col("label"))
  }

  val trainingExamplesOracle: String =
    s"""WITH ordered AS (
       |  SELECT user_id, event_type,
       |    LAG(event_type, 3) OVER w AS l3,
       |    LAG(event_type, 2) OVER w AS l2,
       |    LAG(event_type, 1) OVER w AS l1
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |ex AS (
       |  SELECT l3 || '>' || l2 || '>' || l1 AS ctx, event_type AS label
       |  FROM ordered
       |  WHERE l1 IS NOT NULL AND l2 IS NOT NULL AND l3 IS NOT NULL),
       |g AS (
       |  SELECT ctx, label, CAST(COUNT(*) AS BIGINT) AS n_examples
       |  FROM ex GROUP BY 1, 2),
       |t AS (
       |  SELECT *, CAST(SUM(n_examples) OVER (PARTITION BY ctx) AS BIGINT)
       |    AS ctx_total
       |  FROM g)
       |SELECT ctx, label, n_examples, ctx_total,
       |  n_examples * 1000 // ctx_total AS label_share_permille
       |FROM t ORDER BY ctx, label""".stripMargin
  // ------------------------------------------------------------------
  // `q_did` (X219): difference-in-differences readout
  // ------------------------------------------------------------------

  /** Pre/post boundary of the DiD windows (events span 2024-01). */
  val DidCut = "2024-01-16"

  /** `q_did`: DIFFERENCE-IN-DIFFERENCES — the experimentation family's
    * (X158 lift, X141 CUPED, X166 post-stratification) estimator for
    * launches WITHOUT a holdout randomized at exposure time: users
    * hash-split into treat/control (the X31 assignment discipline),
    * value compared pre vs post a fixed cut, and the causal readout is
    * (ΔT) − (ΔC) — secular drift that hits both groups cancels. All four
    * cell means are exact integer cents (sum/count integral division),
    * so the DiD estimate is arithmetic on Longs and the gate hashes
    * exactly; the four cells ride along so a reviewer can audit the
    * parallel-trends inputs, with the estimate broadcast onto each row
    * (the suite's 1-row global-moment idiom).
    *
    * Plan: one narrow classify pass, one 4-cell aggregate, one 1-row
    * broadcast — shape-invariant at any event volume. */
  def didQ(spark: SparkSession, sfDir: String): DataFrame = {
    val treat = pmod(
      conv(substring(md5(concat(lit("did"), col("user_id"))), 1, 15), 16, 10)
        .cast("long"), lit(2L))
    val cells = Tables.events(spark, sfDir)
      .select(treat.as("treat"),
        when(col("ts") < lit(DidCut).cast("timestamp"), "pre")
          .otherwise("post").as("period"),
        floor(col("value") * 100).cast("long").as("c"))
      .groupBy(col("treat"), col("period"))
      .agg(Num.countStar.as("n_events"),
        sum(col("c")).as("sum_cents"))
      .withColumn("mean_cents", Num.divLong(col("sum_cents"), col("n_events")))
    val did = cells.agg(
      (sum(when(col("treat") === 1 && col("period") === "post",
          col("mean_cents")).otherwise(0L)) -
        sum(when(col("treat") === 1 && col("period") === "pre",
          col("mean_cents")).otherwise(0L)) -
        sum(when(col("treat") === 0 && col("period") === "post",
          col("mean_cents")).otherwise(0L)) +
        sum(when(col("treat") === 0 && col("period") === "pre",
          col("mean_cents")).otherwise(0L))).as("did_cents"))
    cells.crossJoin(broadcast(did))
      .select(col("treat"), col("period"), col("n_events"),
        col("sum_cents"), col("mean_cents"), col("did_cents"))
      .orderBy(col("treat"), col("period"))
  }

  val didOracle: String =
    s"""WITH base AS (
       |  SELECT CAST(concat('0x', substr(md5('did' || user_id), 1, 15))
       |           AS BIGINT) % 2 AS treat,
       |    CASE WHEN ts < TIMESTAMP '${DidCut}' THEN 'pre' ELSE 'post' END
       |      AS period,
       |    CAST(FLOOR(value * 100) AS BIGINT) AS c
       |  FROM events),
       |cells AS (
       |  SELECT treat, period, CAST(COUNT(*) AS BIGINT) AS n_events,
       |    CAST(SUM(c) AS BIGINT) AS sum_cents,
       |    CAST(SUM(c) AS BIGINT) // COUNT(*) AS mean_cents
       |  FROM base GROUP BY 1, 2),
       |d AS (
       |  SELECT CAST(
       |    SUM(CASE WHEN treat = 1 AND period = 'post' THEN mean_cents ELSE 0 END)
       |    - SUM(CASE WHEN treat = 1 AND period = 'pre' THEN mean_cents ELSE 0 END)
       |    - SUM(CASE WHEN treat = 0 AND period = 'post' THEN mean_cents ELSE 0 END)
       |    + SUM(CASE WHEN treat = 0 AND period = 'pre' THEN mean_cents ELSE 0 END)
       |    AS BIGINT) AS did_cents
       |  FROM cells)
       |SELECT treat, period, n_events, sum_cents, mean_cents, d.did_cents
       |FROM cells, d ORDER BY treat, period""".stripMargin

  // `q_ips` (X245 family): inverse-propensity off-policy evaluation

  /** Logging-policy propensity of the 'push' arm, per-mille; 'email'
    * gets the complement. 750/250 chosen so 3000/p is an integer for
    * both arms (4 and 12) — the IPS weights stay exact Longs. */
  val IpsPushPm = 750L
  /** Common weight numerator: w = IpsWeightScale / p_pm per matched row. */
  val IpsWeightScale = 3000L
  /** Target policy's value threshold: π picks 'email' when the event
    * value exceeds this, else 'push'. */
  val IpsEmailMin = 50.0

  /** `q_ips` (X247): OFF-POLICY evaluation by inverse propensity
    * scoring — "what would the NEW policy's reward have been?" answered
    * from logs of the OLD policy, the question every recommender /
    * notification team asks before an A/B test spends real traffic
    * (X85's lift needs the experiment to have RUN; IPS pre-evaluates it
    * from history). The logged action is an md5-uniform draw (push 750‰
    * / email 250‰ — known propensities, the textbook stochastic logger;
    * both engines draw identical actions), reward is the purchase
    * indicator, and the target policy is deterministic (email iff
    * value > 50). Matched rows carry weight 3000/p — exactly 4 or 12,
    * integers by construction — so three estimators emerge in one fold:
    *   naive_pm  — mean reward over matched rows only (the biased
    *               "just filter the logs" estimate IPS exists to fix:
    *               it ignores HOW unlikely the logger was to agree),
    *   ips_pm    — Σ r·match·(3000/p) / (3n), unbiased for the target
    *               policy's reward rate,
    *   snips_pm  — the self-normalized variant Σrw/Σw (lower variance,
    *               the production default).
    * All three are exact integral per-milles; the whole artifact
    * hash-gates with no float anywhere.
    *
    * Scale: one narrow pass (two md5s and the policy predicate fused
    * into the scan projection) into a day-bounded aggregate — the
    * estimator costs exactly what the daily report it rides on costs. */
  def ipsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val u = conv(substring(md5(concat(lit("ips"), col("event_id"))), 1, 15),
      16, 10).cast("long") % 1000L
    val logged = when(u < IpsPushPm, lit("push")).otherwise(lit("email"))
    val pPm = when(u < IpsPushPm, lit(IpsPushPm))
      .otherwise(lit(1000L - IpsPushPm))
    val target = when(col("value") > IpsEmailMin, lit("email"))
      .otherwise(lit("push"))
    val r = when(col("event_type") === "purchase", 1L).otherwise(0L)
    val m = (logged === target).cast("long")
    Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        r.as("r"), m.as("m"), (lit(IpsWeightScale) / pPm).cast("long").as("w"))
      .groupBy(col("day"))
      .agg(Num.countStar.as("n"), sum(col("m")).as("n_match"),
        sum(col("m") * col("w")).as("sum_w"),
        sum(col("r") * col("m") * col("w")).as("sum_rw"),
        sum(col("r") * col("m")).as("n_match_pos"))
      .select(col("day"), col("n"), col("n_match"), col("sum_w"),
        col("sum_rw"),
        Num.divLong(col("n_match_pos") * 1000L, col("n_match"))
          .as("naive_pm"),
        Num.divLong(col("sum_rw") * 1000L, col("n") * 3L).as("ips_pm"),
        Num.divLong(col("sum_rw") * 1000L, col("sum_w")).as("snips_pm"))
      .orderBy(col("day"))
  }

  val ipsOracle: String =
    s"""WITH base AS (
       |  SELECT strftime(ts, '%Y-%m-%d') AS day,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r,
       |    CASE WHEN (CAST(concat('0x', substr(md5('ips' || event_id), 1, 15))
       |        AS BIGINT) % 1000 < ${IpsPushPm}) =
       |      (value <= ${IpsEmailMin}) THEN 1 ELSE 0 END AS m,
       |    CASE WHEN CAST(concat('0x', substr(md5('ips' || event_id), 1, 15))
       |        AS BIGINT) % 1000 < ${IpsPushPm}
       |      THEN ${IpsWeightScale / IpsPushPm}
       |      ELSE ${IpsWeightScale / (1000L - IpsPushPm)} END AS w
       |  FROM events),
       |g AS (
       |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(m) AS BIGINT) AS n_match,
       |    CAST(SUM(m * w) AS BIGINT) AS sum_w,
       |    CAST(SUM(r * m * w) AS BIGINT) AS sum_rw,
       |    CAST(SUM(r * m) AS BIGINT) AS n_match_pos
       |  FROM base GROUP BY 1)
       |SELECT day, n, n_match, sum_w, sum_rw,
       |  n_match_pos * 1000 // n_match AS naive_pm,
       |  sum_rw * 1000 // (n * 3) AS ips_pm,
       |  sum_rw * 1000 // sum_w AS snips_pm
       |FROM g ORDER BY day""".stripMargin

  // `q_psm` (X250): stratified propensity matching → ATT

  /** Treatment rule: a user with at least this many click events is
    * "exposed". ~13 clicks/user in the corpus at every SF (events and
    * users scale together), so the rule splits the population rather
    * than degenerating to all-or-nothing. */
  val PsmTreatMinClicks = 14L
  /** Hash sub-strata within each activity bucket. Matching inside
    * (bucket × sub-stratum) keeps every rank window a small partition;
    * at larger corpora RAISE this (a user-hash refinement of a valid
    * stratification is still a valid stratification). */
  val PsmSubStrata = 8L

  /** `q_psm` (X250): PROPENSITY-STRATIFIED MATCHING — the
    * observational-causal leg the experimentation family still lacked
    * (X85 needs a randomized A/B; X141 needs pre-period covariates;
    * X219 needs a launch cut; IPS needs LOGGED propensities; PSM is
    * what's left when all you have is a confounded log): estimate the
    * effect of click exposure on purchase spend where heavy users both
    * click more AND buy more. Users fold to one row (clicks, total
    * events, purchase cents); treatment = clicks ≥ 14; the confounder
    * proxy is the activity bucket (n_events div 10, capped — the
    * coarsened exact matching on the one covariate that drives both
    * sides); within each (bucket × user-hash sub-stratum), the i-th
    * treated user (by user_id) matches the i-th control, unmatched
    * tail dropped — deterministic rank pairing, the greedy-match
    * analogue both engines replay identically. ATT = mean matched
    * difference, emitted as exact sums plus a SIGN-SPLIT milli-ATT
    * (the difference can be negative; trunc-vs-floor integral division
    * diverges across engines on negative dividends, so both sides
    * compute sign·(|sum|·1000 div n) explicitly).
    *
    * Scale: one data-sized user fold; the rank windows partition by
    * (bucket, sub, arm) — parallelism = strata count, which the
    * PsmSubStrata dial grows with the corpus; everything after is
    * bucket-bounded. */
  def psmQ(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = floor(col("value") * 100).cast("long")
    val users = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(Num.countStar.as("n_events"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("clicks"),
        sum(when(col("event_type") === "purchase", cents).otherwise(0L))
          .as("y_cents"))
      .withColumn("treated",
        (col("clicks") >= PsmTreatMinClicks).cast("long"))
      .withColumn("bucket", least(Num.divLong(col("n_events"), 10L), lit(9L)))
      .withColumn("sub", pmod(col("user_id"), lit(PsmSubStrata)))
    val byStratumArm = Window
      .partitionBy(col("bucket"), col("sub"), col("treated"))
      .orderBy(col("user_id"))
    val ranked = Materialize.diskBacked(
      users.withColumn("rn", row_number().over(byStratumArm)))
    val pairs = ranked.filter(col("treated") === 1L)
      .select(col("bucket"), col("sub"), col("rn"), col("y_cents").as("y_t"))
      .join(ranked.filter(col("treated") === 0L)
        .select(col("bucket"), col("sub"), col("rn"),
          col("y_cents").as("y_c")),
        Seq("bucket", "sub", "rn"))
    val att = pairs.agg(
      Num.countStar.as("n_pairs_total"),
      sum(col("y_t") - col("y_c")).as("diff_cents_total"))
    val arms = ranked.groupBy(col("bucket"))
      .agg(sum(col("treated")).as("n_treated"),
        sum(lit(1L) - col("treated")).as("n_control"))
    val perBucket = pairs.groupBy(col("bucket"))
      .agg(Num.countStar.as("n_pairs"),
        sum(col("y_t")).as("sum_y_t"), sum(col("y_c")).as("sum_y_c"))
    arms.join(perBucket, Seq("bucket"), "left")
      .select(col("bucket"), col("n_treated"), col("n_control"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("sum_y_t"), lit(0L)).as("sum_y_t"),
        coalesce(col("sum_y_c"), lit(0L)).as("sum_y_c"))
      .crossJoin(broadcast(att))
      .withColumn("att_millis",
        when(col("diff_cents_total") < 0L,
          -Num.divLong(-col("diff_cents_total") * 1000L,
            col("n_pairs_total")))
          .otherwise(Num.divLong(col("diff_cents_total") * 1000L,
            col("n_pairs_total"))))
      .orderBy(col("bucket"))
  }

  val psmOracle: String =
    s"""WITH u AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS clicks,
       |    CAST(SUM(CASE WHEN event_type = 'purchase'
       |      THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END)
       |      AS BIGINT) AS y_cents
       |  FROM events GROUP BY 1),
       |s AS (
       |  SELECT *,
       |    CASE WHEN clicks >= ${PsmTreatMinClicks} THEN 1 ELSE 0 END
       |      AS treated,
       |    least(n_events // 10, 9) AS bucket,
       |    user_id % ${PsmSubStrata} AS sub
       |  FROM u),
       |r AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY bucket, sub, treated ORDER BY user_id)
       |    AS BIGINT) AS rn
       |  FROM s),
       |p AS (
       |  SELECT t.bucket, t.y_cents AS y_t, c.y_cents AS y_c
       |  FROM r t JOIN r c
       |    ON t.bucket = c.bucket AND t.sub = c.sub AND t.rn = c.rn
       |  WHERE t.treated = 1 AND c.treated = 0),
       |att AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs_total,
       |    CAST(SUM(y_t - y_c) AS BIGINT) AS diff_cents_total
       |  FROM p),
       |arms AS (
       |  SELECT bucket, CAST(SUM(treated) AS BIGINT) AS n_treated,
       |    CAST(SUM(1 - treated) AS BIGINT) AS n_control
       |  FROM r GROUP BY 1),
       |pb AS (
       |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    CAST(SUM(y_t) AS BIGINT) AS sum_y_t,
       |    CAST(SUM(y_c) AS BIGINT) AS sum_y_c
       |  FROM p GROUP BY 1)
       |SELECT arms.bucket, arms.n_treated, arms.n_control,
       |  COALESCE(pb.n_pairs, 0) AS n_pairs,
       |  COALESCE(pb.sum_y_t, 0) AS sum_y_t,
       |  COALESCE(pb.sum_y_c, 0) AS sum_y_c,
       |  att.n_pairs_total, att.diff_cents_total,
       |  CASE WHEN att.diff_cents_total < 0
       |    THEN -((-att.diff_cents_total) * 1000 // att.n_pairs_total)
       |    ELSE att.diff_cents_total * 1000 // att.n_pairs_total END
       |    AS att_millis
       |FROM arms LEFT JOIN pb ON arms.bucket = pb.bucket, att
       |ORDER BY arms.bucket""".stripMargin

  // `q_seq_patterns` (X253): sequential-pattern support mining

  /** `q_seq_patterns` (X253): ORDERED-PAIR sequential patterns — the
    * support count every sequence miner (GSP/PrefixSpan) starts from,
    * and the shape none of the existing behavioral ops express: X70
    * counts ADJACENT transitions, X68/X155 check ONE fixed sequence,
    * X216 conditions on a fixed-length context; this asks, for every
    * ordered type pair (a → b), in how many user-days did a occur
    * BEFORE b at all — existential order, any distance. One fold to
    * (user, day, type, first_us, last_us), then the pair test is
    * first(a) < last(b) over the ≤|types|² within-group self-join
    * (strict <, so equal-timestamp edges are excluded by the same rule
    * in both engines). Support rides with per-mille of all user-days —
    * the interestingness denominator.
    *
    * Scale: the fold is one map-side-combined aggregate to a frame
    * bounded by user-days × |types|; the self-join fans each group to
    * ≤|types|² rows (25 here — the type DOMAIN, not the event count),
    * then collapses to the |types|²-bounded pattern table. */
  def seqPatternsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val spans = Materialize.diskBacked(
      Tables.events(spark, sfDir)
        .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"), unix_micros(col("ts")).as("us"))
        .groupBy(col("user_id"), col("day"), col("event_type"))
        .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us")))
    val total = spans.select(col("user_id"), col("day")).distinct()
      .agg(Num.countStar.as("n_userdays"))
    spans.as("a")
      .join(spans.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.day") === col("b.day") &&
          col("a.event_type") =!= col("b.event_type"))
      .filter(col("a.first_us") < col("b.last_us"))
      .groupBy(col("a.event_type").as("pat_a"),
        col("b.event_type").as("pat_b"))
      .agg(Num.countStar.as("support"))
      .crossJoin(broadcast(total))
      .withColumn("support_permille",
        Num.divLong(col("support") * 1000L, col("n_userdays")))
      .orderBy(col("support").desc, col("pat_a"), col("pat_b"))
  }

  // `q_power` (X261): experiment sizing — minimum detectable effect

  /** z(α/2 = 0.025) + z(power = 0.80) = 1.95996 + 0.84162, pinned as a
    * literal so both engines multiply the identical constant. */
  val PowerZSum = 2.80158

  /** `q_power` (X261): MINIMUM DETECTABLE EFFECT — the experimentation
    * family's missing tense: everything else analyzes a test that RAN
    * (X85 lift, X255 SRM, X259 uplift); this sizes the next one —
    * "with this traffic and this variance, what's the smallest lift a
    * 50/50 test can see at α=0.05 / 80% power?" MDE = z·2σ/√n per the
    * two-sample normal approximation. The variance moments stay exact
    * Longs (n·Σx² − (Σx)² — the cleared-denominator form), and the one
    * irrational step is a SINGLE pinned-order double chain per group —
    * sqrt(vn/n³)·2·z, rounded once to centi-cents — no double is ever
    * summed (the X199/X252 randomized-artifact discipline).
    *
    * Scale: one map-side-combined moment fold per event_type; the MDE
    * arithmetic is per-GROUP work. Moment magnitudes: cents² ≤ 10¹⁰
    * per row keeps Σx² inside Long beyond the 100× soak; (Σx)² crosses
    * ~10¹⁸ around 10⁹ rows per group — at that scale the moments move
    * to DECIMAL(38,0) unchanged. */
  def powerQ(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = floor(col("value") * 100).cast("long")
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(Num.countStar.as("n"), sum(cents).as("sx"),
        sum(cents * cents).as("sxx"))
      .withColumn("var_num", col("n") * col("sxx") - col("sx") * col("sx"))
      .select(col("event_type"), col("n"), col("sx"), col("sxx"),
        col("var_num"),
        floor(sqrt(col("var_num").cast("double")
          / (col("n") * col("n") * col("n")).cast("double"))
          * lit(2.0) * lit(PowerZSum) * lit(100.0) + lit(0.5))
          .cast("long").as("mde_centicents"))
      .orderBy(col("event_type"))
  }

  val powerOracle: String =
    s"""WITH m AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sx,
       |    CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)
       |      * CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sxx
       |  FROM events GROUP BY 1)
       |SELECT event_type, n, sx, sxx,
       |  n * sxx - sx * sx AS var_num,
       |  CAST(FLOOR(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
       |    / CAST(n * n * n AS DOUBLE))
       |    * 2.0 * ${PowerZSum} * 100.0 + 0.5) AS BIGINT)
       |    AS mde_centicents
       |FROM m ORDER BY event_type""".stripMargin

  // `q_qini` (X259): uplift (Qini) curve over score deciles

  /** `q_qini` (X259): the UPLIFT-MODEL evaluation — X245's gains table
    * crossed with the experiment: a targeting model is not judged by
    * who converts (X245) but by whose conversion the treatment CAUSED,
    * so each score decile carries both arms' cumulative counts and the
    * cumulative uplift — treat rate minus control rate — as an exact
    * sign-split cross-multiply: (Σpos_t·Σn_c − Σpos_c·Σn_t)·1000 div
    * (Σn_t·Σn_c). A model that ranks persuadables first shows uplift
    * concentrating in the top deciles (the Qini curve's bow); one that
    * merely ranks converters shows flat uplift — the distinction every
    * targeting team must measure before spending sends. Deciles come
    * from the pooled per-mille score histogram (X245's bucket rule, so
    * arms can't get different boundaries); the md5 arm draw is X85's.
    *
    * Scale: one (pm × arm) histogram fold; every window and the uplift
    * arithmetic walk the ≤1000-bucket frame. */
  def qiniQ(spark: SparkSession, sfDir: String): DataFrame = {
    val predM = least(floor(col("value") * 1000.0 / Stats.CalibValueScale)
      .cast("long"), lit(999L))
    val arm = conv(substring(md5(concat(lit("ab"), col("user_id"))), 1, 15),
      16, 10).cast("long") % 2L
    val pos = when(col("event_type") === "purchase", 1L).otherwise(0L)
    val hist = Tables.events(spark, sfDir)
      .select(predM.as("pm"), arm.as("t"), pos.as("pos"))
      .groupBy(col("pm"))
      .agg(sum(col("t")).as("n_t"),
        sum(col("t") * col("pos")).as("pos_t"),
        sum(lit(1L) - col("t")).as("n_c"),
        sum((lit(1L) - col("t")) * col("pos")).as("pos_c"))
    val byScoreDesc = Window.orderBy(col("pm").desc)
    val all = Window.partitionBy()
    val byDec = Window.orderBy(col("decile"))
    val dec = hist
      .withColumn("cum_prev", coalesce(sum(col("n_t") + col("n_c")).over(
        byScoreDesc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_all", sum(col("n_t") + col("n_c")).over(all))
      .withColumn("decile", Num.divLong(col("cum_prev") * 10L, col("n_all")))
      .groupBy(col("decile"))
      .agg(sum(col("n_t")).as("n_t"), sum(col("pos_t")).as("pos_t"),
        sum(col("n_c")).as("n_c"), sum(col("pos_c")).as("pos_c"))
      .withColumn("cum_n_t", sum(col("n_t")).over(byDec))
      .withColumn("cum_pos_t", sum(col("pos_t")).over(byDec))
      .withColumn("cum_n_c", sum(col("n_c")).over(byDec))
      .withColumn("cum_pos_c", sum(col("pos_c")).over(byDec))
    // parenthesized: a leading-minus continuation line is a SEPARATE
    // statement to Scala's semicolon inference (the first build of this
    // expression silently dropped the whole subtrahend)
    val numer = (col("cum_pos_t") * col("cum_n_c")
      - col("cum_pos_c") * col("cum_n_t"))
    dec.select(col("decile"), col("n_t"), col("pos_t"), col("n_c"),
      col("pos_c"), col("cum_n_t"), col("cum_pos_t"), col("cum_n_c"),
      col("cum_pos_c"),
      when(col("cum_n_t") * col("cum_n_c") === 0L, lit(0L))
        .when(numer < 0L, -Num.divLong(-numer * 1000L,
          col("cum_n_t") * col("cum_n_c")))
        .otherwise(Num.divLong(numer * 1000L,
          col("cum_n_t") * col("cum_n_c"))).as("uplift_milli"))
      .orderBy(col("decile"))
  }

  val qiniOracle: String =
    s"""WITH q AS (
       |  SELECT least(CAST(FLOOR(value * 1000.0
       |      / ${Stats.CalibValueScale}) AS BIGINT), 999) AS pm,
       |    CAST(concat('0x', substr(md5('ab' || user_id), 1, 15))
       |      AS BIGINT) % 2 AS t,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
       |  FROM events),
       |h AS (
       |  SELECT pm, CAST(SUM(t) AS BIGINT) AS n_t,
       |    CAST(SUM(t * pos) AS BIGINT) AS pos_t,
       |    CAST(SUM(1 - t) AS BIGINT) AS n_c,
       |    CAST(SUM((1 - t) * pos) AS BIGINT) AS pos_c
       |  FROM q GROUP BY 1),
       |d AS (
       |  SELECT *,
       |    CAST(COALESCE(SUM(n_t + n_c) OVER (ORDER BY pm DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum_prev,
       |    CAST(SUM(n_t + n_c) OVER () AS BIGINT) AS n_all
       |  FROM h),
       |g AS (
       |  SELECT cum_prev * 10 // n_all AS decile,
       |    CAST(SUM(n_t) AS BIGINT) AS n_t,
       |    CAST(SUM(pos_t) AS BIGINT) AS pos_t,
       |    CAST(SUM(n_c) AS BIGINT) AS n_c,
       |    CAST(SUM(pos_c) AS BIGINT) AS pos_c
       |  FROM d GROUP BY 1),
       |w AS (
       |  SELECT g.*,
       |    CAST(SUM(n_t) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cum_n_t,
       |    CAST(SUM(pos_t) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cum_pos_t,
       |    CAST(SUM(n_c) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cum_n_c,
       |    CAST(SUM(pos_c) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cum_pos_c
       |  FROM g)
       |SELECT decile, n_t, pos_t, n_c, pos_c,
       |  cum_n_t, cum_pos_t, cum_n_c, cum_pos_c,
       |  CASE WHEN cum_n_t * cum_n_c = 0 THEN CAST(0 AS BIGINT)
       |    WHEN cum_pos_t * cum_n_c - cum_pos_c * cum_n_t < 0
       |    THEN -((-(cum_pos_t * cum_n_c - cum_pos_c * cum_n_t)) * 1000
       |      // (cum_n_t * cum_n_c))
       |    ELSE (cum_pos_t * cum_n_c - cum_pos_c * cum_n_t) * 1000
       |      // (cum_n_t * cum_n_c) END AS uplift_milli
       |FROM w ORDER BY decile""".stripMargin

  // `q_iv` (X256): instrumental-variable (Wald / LATE) estimator

  /** Treatment-uptake thresholds: always-takers (clicks ≥ 20 take it
    * regardless) and encouragement compliers (z = 1 and clicks ≥ 10). */
  val IvAlwaysMinClicks = 20L
  val IvComplierMinClicks = 10L

  /** `q_iv` (X256): the INSTRUMENTAL-VARIABLE leg completing the causal
    * family (X85 randomized lift, X141 CUPED, X219 DiD, X247 IPS, X250
    * PSM): when uptake is voluntary, comparing takers to non-takers is
    * confounded and even an RCT only randomizes the ENCOURAGEMENT —
    * the Wald estimator divides intent-to-treat effects,
    * LATE = ITT_y / ITT_d, identifying the effect on compliers. The
    * instrument is the md5 user draw; uptake has the classic
    * compliance structure (always-takers at clicks ≥ 20, compliers who
    * take it only when encouraged at clicks ≥ 10). The arithmetic
    * stays EXACT: mean differences clear denominators —
    * ITT_y = (S₁n₀ − S₀n₁)/(n₁n₀) and likewise ITT_d, so the n₁n₀
    * cancels in the ratio and LATE = (S₁n₀ − S₀n₁)/(D₁n₀ − D₀n₁), a
    * pure integer ratio emitted sign-split in millis (both numerator
    * and denominator can be negative; trunc-vs-floor diverges across
    * engines on negative dividends — the X250 rule). The per-arm cells
    * (n, Σy, uptake) ride along as the first-stage audit every IV
    * readout must show (a weak instrument = tiny denominator is
    * visible, not hidden).
    *
    * Scale: one user fold, one 2-row aggregate, one broadcast — the
    * estimator costs what the user rollup costs. */
  def ivQ(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = floor(col("value") * 100).cast("long")
    val z = conv(substring(md5(concat(lit("iv"), col("user_id"))), 1, 15),
      16, 10).cast("long") % 2L
    val users = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("clicks"),
        sum(when(col("event_type") === "purchase", cents).otherwise(0L))
          .as("y"))
      .withColumn("z", z)
      .withColumn("d",
        (col("clicks") >= IvAlwaysMinClicks ||
          (col("z") === 1L && col("clicks") >= IvComplierMinClicks))
          .cast("long"))
    val cells = users.groupBy(col("z"))
      .agg(Num.countStar.as("n_users"), sum(col("y")).as("sum_y_cents"),
        sum(col("d")).as("n_treated"))
    val wald = cells.agg(
      (max(when(col("z") === 1L, col("sum_y_cents")))
        * max(when(col("z") === 0L, col("n_users")))
        - max(when(col("z") === 0L, col("sum_y_cents")))
        * max(when(col("z") === 1L, col("n_users")))).as("itt_y_numer"),
      (max(when(col("z") === 1L, col("n_treated")))
        * max(when(col("z") === 0L, col("n_users")))
        - max(when(col("z") === 0L, col("n_treated")))
        * max(when(col("z") === 1L, col("n_users")))).as("itt_d_numer"))
    val sgn = when(col("itt_y_numer") * col("itt_d_numer") < 0L, -1L)
      .otherwise(1L)
    cells.crossJoin(broadcast(wald))
      .withColumn("late_millis",
        sgn * Num.divLong(abs(col("itt_y_numer")) * 1000L,
          abs(col("itt_d_numer"))))
      .orderBy(col("z"))
  }

  val ivOracle: String =
    s"""WITH u AS (
       |  SELECT user_id,
       |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS clicks,
       |    CAST(SUM(CASE WHEN event_type = 'purchase'
       |      THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END)
       |      AS BIGINT) AS y
       |  FROM events GROUP BY 1),
       |a AS (
       |  SELECT *,
       |    CAST(concat('0x', substr(md5('iv' || user_id), 1, 15))
       |      AS BIGINT) % 2 AS z
       |  FROM u),
       |t AS (
       |  SELECT *, CAST(CASE WHEN clicks >= ${IvAlwaysMinClicks}
       |      OR (z = 1 AND clicks >= ${IvComplierMinClicks})
       |    THEN 1 ELSE 0 END AS BIGINT) AS d
       |  FROM a),
       |cells AS (
       |  SELECT z, CAST(COUNT(*) AS BIGINT) AS n_users,
       |    CAST(SUM(y) AS BIGINT) AS sum_y_cents,
       |    CAST(SUM(d) AS BIGINT) AS n_treated
       |  FROM t GROUP BY 1),
       |w AS (
       |  SELECT
       |    CAST(MAX(CASE WHEN z = 1 THEN sum_y_cents END)
       |      * MAX(CASE WHEN z = 0 THEN n_users END)
       |      - MAX(CASE WHEN z = 0 THEN sum_y_cents END)
       |      * MAX(CASE WHEN z = 1 THEN n_users END) AS BIGINT)
       |      AS itt_y_numer,
       |    CAST(MAX(CASE WHEN z = 1 THEN n_treated END)
       |      * MAX(CASE WHEN z = 0 THEN n_users END)
       |      - MAX(CASE WHEN z = 0 THEN n_treated END)
       |      * MAX(CASE WHEN z = 1 THEN n_users END) AS BIGINT)
       |      AS itt_d_numer
       |  FROM cells)
       |SELECT cells.z, cells.n_users, cells.sum_y_cents, cells.n_treated,
       |  w.itt_y_numer, w.itt_d_numer,
       |  CASE WHEN w.itt_y_numer * w.itt_d_numer < 0
       |    THEN -(abs(w.itt_y_numer) * 1000 // abs(w.itt_d_numer))
       |    ELSE abs(w.itt_y_numer) * 1000 // abs(w.itt_d_numer) END
       |    AS late_millis
       |FROM cells, w ORDER BY cells.z""".stripMargin

  // `q_srm` (X255): sample-ratio-mismatch health check

  /** χ²(df=1) critical value at α=0.05, in millis (3.841). The flag
    * compares integer cross-multiples, never a float: (a−b)²·1000 >
    * 3841·n ⟺ χ² > 3.841, exactly. */
  val SrmCritMilli = 3841L

  /** `q_srm` (X255): SAMPLE-RATIO MISMATCH — the health check every
    * experimentation platform runs before anyone reads a metric (X85
    * computes the lift; SRM asks whether the ASSIGNMENT itself broke —
    * a redirect dropping one arm's traffic, a bot filter biased by arm,
    * an allocation bug: if the 50/50 split didn't land 50/50 beyond
    * chance, every downstream readout is garbage). Counted in the UNIT
    * OF RANDOMIZATION — distinct users, never events: user-level
    * assignment makes event counts clustered, and a χ² on clustered
    * counts flags healthy splits (the textbook SRM false alarm; the
    * first draft of this operator made exactly that mistake and its
    * own spec caught it). Under H₀ the two-cell goodness-of-fit χ²
    * reduces to (a−b)²/n; both the milli-scaled statistic and the
    * α=0.05 verdict are exact integer arithmetic (cross-multiplied
    * against the 3.841 critical value), so the gate hashes bit-exact.
    * Emitted per day — where assignment bugs show up as a STEP — plus
    * the pooled `__all__` row (distinct users overall, NOT a fold of
    * the daily frame: a user active on many days is one unit).
    *
    * Scale: two distinct-aggregates over a narrow (day, user, arm)
    * projection — the exact-distinct expand is the price of counting
    * units; X56's sketch is the swap-in when approximate suffices. */
  def srmQ(spark: SparkSession, sfDir: String): DataFrame = {
    val arm = conv(substring(md5(concat(lit("ab"), col("user_id"))), 1, 15),
      16, 10).cast("long") % 2L
    val base = Materialize.diskBacked(
      Tables.events(spark, sfDir)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("user_id"), arm.as("arm"))
        .distinct())
    val daily = base.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n"),
        countDistinct(when(col("arm") === 1L, col("user_id"))).as("n_treat"))
    val pooled = base.agg(countDistinct(col("user_id")).as("n"),
      countDistinct(when(col("arm") === 1L, col("user_id"))).as("n_treat"))
      .select(lit("__all__").as("day"), col("n"), col("n_treat"))
    daily.unionByName(pooled)
      .select(col("day"), col("n"), col("n_treat"),
        (col("n") - col("n_treat")).as("n_control"))
      .withColumn("diff2",
        (col("n_treat") * 2L - col("n")) * (col("n_treat") * 2L - col("n")))
      .select(col("day"), col("n"), col("n_treat"), col("n_control"),
        Num.divLong(col("diff2") * 1000L, col("n")).as("chi2_milli"),
        (col("diff2") * 1000L > lit(SrmCritMilli) * col("n"))
          .cast("long").as("srm_flag"))
      .orderBy(col("day"))
  }

  val srmOracle: String =
    s"""WITH b AS (
       |  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id,
       |    CAST(concat('0x', substr(md5('ab' || user_id), 1, 15))
       |      AS BIGINT) % 2 AS arm
       |  FROM events),
       |d AS (
       |  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n,
       |    CAST(COUNT(DISTINCT CASE WHEN arm = 1 THEN user_id END)
       |      AS BIGINT) AS n_treat
       |  FROM b GROUP BY 1),
       |u AS (
       |  SELECT day, n, n_treat FROM d
       |  UNION ALL
       |  SELECT '__all__', CAST(COUNT(DISTINCT user_id) AS BIGINT),
       |    CAST(COUNT(DISTINCT CASE WHEN arm = 1 THEN user_id END)
       |      AS BIGINT)
       |  FROM b),
       |s AS (
       |  SELECT day, n, n_treat, n - n_treat AS n_control,
       |    (n_treat * 2 - n) * (n_treat * 2 - n) AS diff2
       |  FROM u)
       |SELECT day, n, n_treat, n_control,
       |  diff2 * 1000 // n AS chi2_milli,
       |  CAST(CASE WHEN diff2 * 1000 > ${SrmCritMilli} * n THEN 1 ELSE 0 END
       |    AS BIGINT) AS srm_flag
       |FROM s ORDER BY day""".stripMargin

  val seqPatternsOracle: String =
    """WITH spans AS (
      |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_type,
      |    CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_us,
      |    CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
      |  FROM events GROUP BY 1, 2, 3),
      |tot AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_userdays
      |  FROM (SELECT DISTINCT user_id, day FROM spans)),
      |p AS (
      |  SELECT a.event_type AS pat_a, b.event_type AS pat_b,
      |    CAST(COUNT(*) AS BIGINT) AS support
      |  FROM spans a JOIN spans b
      |    ON a.user_id = b.user_id AND a.day = b.day
      |    AND a.event_type <> b.event_type
      |  WHERE a.first_us < b.last_us
      |  GROUP BY 1, 2)
      |SELECT pat_a, pat_b, support,
      |  support * 1000 // tot.n_userdays AS support_permille,
      |  tot.n_userdays
      |FROM p, tot
      |ORDER BY support DESC, pat_a, pat_b""".stripMargin
}
