package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Num, Tables}

/** Join operators.
  *
  * Reference semantics (all file:line into /root/reference/):
  *  - J1 inner equi-join fact⋈dim feeding the daily rollup
  *    (src/snowflake_loader.py:151-152).
  *  - J2 MERGE upsert of the channel dimension — an outer-join-shaped op
  *    (src/snowflake_loader.py:86-104): source wins for updatable columns,
  *    target keeps first_seen_date.
  *  - J3 fact MERGE with only WHEN NOT MATCHED THEN INSERT
  *    (azure-functions/function_app.py:439-482) — exactly a left anti join.
  *
  * Scale notes: the dimension side (customer⋈nation ≈ DIM_CHANNELS) is orders
  * of magnitude smaller than the fact side, so Catalyst auto-broadcasts it
  * (BroadcastHashJoin) under autoBroadcastJoinThreshold; at 100 TB fact the
  * join never shuffles the fact table. The anti-join broadcasts the NEW side
  * when small; AQE converts to broadcast at runtime otherwise.
  */
object Joins {

  /** J1: fact(orders) ⋈ dim(customer⋈nation). orders ≈ FACT_VIDEOS,
    * customer+nation ≈ DIM_CHANNELS with its country attribute. */
  def joinFactDim(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    // dim = customer enriched with country. Only `nation` (bounded, 25 rows)
    // gets an explicit broadcast hint; `customer` grows with scale factor, so
    // the fact⋈dim strategy is left to autoBroadcastJoinThreshold/AQE — a
    // forced broadcast there would OOM the driver at 100 TB.
    val dim = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(c("c_custkey"), c("c_name"), n("n_name").as("nation"))
    o.join(dim, o("o_custkey") === dim("c_custkey"))
      .select(o("o_orderkey"), dim("nation"), o("o_orderstatus"),
        o("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** J3: left anti join — insert-only MERGE dedup: "today's batch" (orders
    * from 1999 on) minus keys already in the target (every 7th orderkey,
    * simulating previously-loaded facts). First write wins, re-collections do
    * not refresh — exactly WHEN NOT MATCHED THEN INSERT with no update clause
    * (function_app.py:465-481). */
  def antiJoinNewFacts(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val batch = o.filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
    val target = o.filter(col("o_orderkey") % 7 === 0).select(col("o_orderkey"))
    insertOnlyNew(batch, target, "o_orderkey")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** `q_star_join`: multi-dimensional star join — the fact table against
    * two independent dimension arms, one of them two-hop
    * (supplier→nation→region, the snowflake shape). Catalyst's join
    * reordering + size-based strategy pick broadcast for every dim arm;
    * the fact table is scanned once and never shuffled. This is the
    * general form of the reference's single-dim rollup
    * (src/snowflake_loader.py:140-155) at warehouse scale. */
  def starJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
    val p = Tables.part(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    val supGeo = s
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(s("s_suppkey"), r("r_name").as("region"))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .join(supGeo, l("l_suppkey") === supGeo("s_suppkey"))
      .groupBy(col("p_brand"), col("region"))
      .agg(graft.engine.Num.countStar.as("n_items"),
        graft.engine.Num.sumMoney(col("l_extendedprice")).as("revenue"))
      .orderBy(col("p_brand"), col("region"))
  }

  val starJoinOracle: String =
    """SELECT p.p_brand, r.r_name AS region,
      | COUNT(*) AS n_items,
      | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY 1, 2
      |ORDER BY p_brand, region""".stripMargin

  /** J2: MERGE upsert semantics on vanilla parquet = full outer join +
    * per-column precedence. Target = "previously seen" slice of customer
    * (c_custkey % 3 == 0), source = "today's batch" (c_custkey % 2 == 0).
    * Source wins for updatable attributes (last-write-wins, like DIM_CHANNELS
    * at src/snowflake_loader.py:90-95); target keeps its first_seen marker.
    *
    * At scale both sides shuffle on the merge key once; with the target
    * bucketed on the key the shuffle disappears entirely.
    */
  /** Core MERGE-upsert: full outer on `key`; source wins for every updatable
    * column, target keeps its first_seen marker. Shapes: target(key, t_name,
    * t_acctbal, t_first_seen), source(key, s_name, s_acctbal, s_first_seen). */
  def mergeUpsert(target: DataFrame, source: DataFrame): DataFrame =
    // MERGE UPDATE semantics need an explicit match flag: the coalesce
    // shortcut would silently keep the target value when a matched source
    // column is NULL (a real upsert clearing a field) — last write must
    // win INCLUDING null writes. first_seen is the one first-write-wins
    // column, so it stays a coalesce by design.
    target.join(source.withColumn("s_present", lit(true)),
        Seq("key"), "full_outer")
      .select(col("key"),
        when(col("s_present"), col("s_name"))
          .otherwise(col("t_name")).as("name"),
        when(col("s_present"), col("s_acctbal"))
          .otherwise(col("t_acctbal")).as("acctbal"),
        coalesce(col("t_first_seen"), col("s_first_seen")).as("first_seen"))
      .orderBy(col("key"))

  /** Core insert-only MERGE: rows of `batch` whose key is absent from
    * `target` — first write wins, re-collections never refresh
    * (function_app.py:465-481). */
  def insertOnlyNew(batch: DataFrame, target: DataFrame, key: String): DataFrame =
    batch.join(target.select(col(key)), Seq(key), "left_anti")

  /** Bucket count for the co-located join demo. */
  val Buckets = 8

  /** `q_bucketed_join`: SHUFFLE-FREE co-located join via bucketing — both
    * sides are written `bucketBy(8, key).sortBy(key)` once, after which the
    * join (and any same-key aggregate above it) needs NO exchange: the
    * bucket layout IS the hash partitioning, persisted. This is the pattern
    * that amortizes a 100 TB fact table's shuffle across every downstream
    * join — pay the partitioned write once, join for free forever.
    * PlanSpec asserts the plan has no hash-partition exchange. Tables are
    * rewritten per run (overwrite, sfDir-keyed names) into the session's
    * temp warehouse; at a real deployment they ARE the warehouse. */
  def bucketedJoinQ(spark: SparkSession, sfDir: String): DataFrame = {
    val tag = Tables.sfTag(sfDir)
    val (tOrders, tCust) = (s"graft_bko_$tag", s"graft_bkc_$tag")
    Tables.orders(spark, sfDir)
      .write.mode("overwrite")
      .bucketBy(Buckets, "o_custkey").sortBy("o_custkey")
      .saveAsTable(tOrders)
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .write.mode("overwrite")
      .bucketBy(Buckets, "c_custkey").sortBy("c_custkey")
      .saveAsTable(tCust)
    spark.table(tOrders)
      .join(spark.table(tCust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(graft.engine.Num.countStar.as("n_orders"),
        graft.engine.Num.sumMoney(col("o_totalprice")).as("total_price"))
      .orderBy(col("c_custkey"))
  }

  val bucketedJoinOracle: String =
    """SELECT c.c_custkey, c.c_name, COUNT(*) AS n_orders,
      | CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1, 2 ORDER BY c_custkey""".stripMargin

  /** `q_semi_join`: left semi join — EXISTS semantics (suppliers with at
    * least one 1996+ shipment), the one join type the reference surface
    * didn't exercise (J3 covers anti = NOT EXISTS). The probe side is
    * deduplicated by the join itself (no distinct pass); the shipdate
    * filter pushes into the lineitem scan. */
  def semiJoinQ(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.supplier(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
    s.join(l, s("s_suppkey") === l("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  val semiJoinOracle: String =
    """SELECT s_suppkey, s_name FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_suppkey = s.s_suppkey
      |                AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00')
      |ORDER BY s_suppkey""".stripMargin

  // ------------------------------------------------------------------
  // `q_asof_join`: keyed as-of join — for each probe row, the latest state
  // row of the same key with state.ts <= probe.ts (inclusive). Spark has no
  // ASOF JOIN operator; a range join would be O(probe × state) per key. The
  // scalable idiom is UNION + WINDOW: tag both streams, sort each key's
  // timeline once, and carry the last non-null state forward — ONE shuffle
  // on the key, no join at all. Equal timestamps order state (tag 0) before
  // probe (tag 1), giving the inclusive >= semantics of DuckDB's ASOF JOIN.
  // At 100 TB this is the plan you want: both inputs hash-partition by key,
  // sort within partition, single pass; a hot key goes through AQE
  // skew-split plus coarse time-bucketing.
  // ------------------------------------------------------------------

  /** Core: probe(key, ts, event_id) gets (state_ts, state_val) of the
    * latest state(key, ts, sval) row at-or-before its ts. */
  def asofJoin(probe: DataFrame, state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = state
      .select(col("key"), col("ts"), lit(0).as("tag"), lit(-1L).as("event_id"),
        col("sval"))
      .unionByName(probe
        .select(col("key"), col("ts"), lit(1).as("tag"), col("event_id"),
          lit(null).cast("double").as("sval")))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE carried struct, not independent (state_ts, state_val) windows:
    // independent `last`s could pair the ts of a later state row with the
    // sval of an earlier one when a state row carries a NULL sval — the
    // struct is non-null for every state row, so ts and sval always come
    // from the SAME (latest) state row.
    tagged
      .withColumn("st", last(
        when(col("tag") === 0, struct(col("ts").as("s_ts"), col("sval").as("s_val"))),
        ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("key"), col("ts"),
        col("st.s_ts").as("state_ts"), col("st.s_val").as("state_val"))
  }

  /** `q_asof_join` over events: each purchase gets the user's most recent
    * signup at-or-before it (state deduped to one row per (user, ts),
    * latest event_id wins, for a well-defined as-of input). */
  def asofJoinQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
    val wD = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val state = ev.filter(col("event_type") === "signup")
      .withColumn("rn", row_number().over(wD)).filter(col("rn") === 1)
      .select(col("user_id").as("key"), col("ts"), col("value").as("sval"))
    val probe = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("key"), col("ts"), col("event_id"))
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    asofJoin(probe, state)
      .select(col("event_id"), col("key").as("user_id"),
        date_format(col("ts"), fmt).as("ts"),
        coalesce(date_format(col("state_ts"), fmt), lit("(none)")).as("state_ts"),
        coalesce(col("state_val"), lit(-1.0)).as("state_val"))
      .orderBy(col("event_id"))
  }

  val asofJoinOracle: String =
    """WITH state AS (
      |  SELECT user_id, ts, value FROM (
      |    SELECT user_id, ts, value,
      |      ROW_NUMBER() OVER (PARTITION BY user_id, ts
      |                         ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_type = 'signup') WHERE rn = 1),
      |probe AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
      |  COALESCE(strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f'), '(none)') AS state_ts,
      |  COALESCE(s.value, -1.0) AS state_val
      |FROM probe p ASOF LEFT JOIN state s
      |  ON p.user_id = s.user_id AND p.ts >= s.ts
      |ORDER BY p.event_id""".stripMargin

  // ------------------------------------------------------------------
  // `q_asof_forward` (X197): FORWARD as-of join with a tolerance bound
  // ------------------------------------------------------------------

  /** Tolerance for the forward match (seconds): a next-state further out
    * is treated as no match — pandas merge_asof(direction='forward',
    * tolerance=...) semantics. Applying the bound POST-match is exact:
    * the forward match is the MINIMUM state ts ≥ probe ts, so if it
    * exceeds the tolerance no other candidate can be inside it. */
  val AsofForwardTolSecs = 21600L // 6 h

  /** Core: probe(key, ts, event_id) gets (state_ts, state_val) of the
    * EARLIEST state(key, ts, sval) row at-or-after its ts — X20's
    * union+window idiom with the timeline walked in reverse (ts DESC,
    * state still ordered before probe at equal ts, giving inclusive <=).
    * Same scale shape: one shuffle on the key, no join at all. The
    * forward direction is the event-outcome attribution primitive
    * ("first response after each request", "next deploy after each
    * alert") that the backward join cannot express. */
  def asofForwardJoin(probe: DataFrame, state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = state
      .select(col("key"), col("ts"), lit(0).as("tag"), lit(-1L).as("event_id"),
        col("sval"))
      .unionByName(probe
        .select(col("key"), col("ts"), lit(1).as("tag"), col("event_id"),
          lit(null).cast("double").as("sval")))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts").desc, col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("st", last(
        when(col("tag") === 0, struct(col("ts").as("s_ts"), col("sval").as("s_val"))),
        ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("key"), col("ts"),
        col("st.s_ts").as("state_ts"), col("st.s_val").as("state_val"))
  }

  /** `q_asof_forward`: each signup gets the user's FIRST purchase at-or-
    * after it, but only within [[AsofForwardTolSecs]] — the
    * conversion-latency attribution question. Beyond-tolerance matches
    * null out post-carry (exact, see [[AsofForwardTolSecs]]); the gated
    * artifact carries the latency seconds so a match at the wrong
    * distance breaks the hash. */
  def asofForwardQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
    val wD = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val state = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(wD)).filter(col("rn") === 1)
      .select(col("user_id").as("key"), col("ts"), col("value").as("sval"))
    val probe = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("key"), col("ts"), col("event_id"))
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val lagSecs = unix_timestamp(col("state_ts")) - unix_timestamp(col("ts"))
    val inTol = col("state_ts").isNotNull && lagSecs <= AsofForwardTolSecs
    asofForwardJoin(probe, state)
      .select(col("event_id"), col("key").as("user_id"),
        date_format(col("ts"), fmt).as("ts"),
        when(inTol, date_format(col("state_ts"), fmt))
          .otherwise(lit("(none)")).as("next_ts"),
        when(inTol, col("state_val")).otherwise(lit(-1.0)).as("next_val"),
        when(inTol, lagSecs).otherwise(lit(-1L)).as("lag_secs"))
      .orderBy(col("event_id"))
  }

  val asofForwardOracle: String =
    s"""WITH state AS (
      |  SELECT user_id, ts, value FROM (
      |    SELECT user_id, ts, value,
      |      ROW_NUMBER() OVER (PARTITION BY user_id, ts
      |                         ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
      |probe AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
      |m AS (
      |  SELECT p.event_id, p.user_id, p.ts, s.ts AS s_ts, s.value AS s_val,
      |    date_diff('second', p.ts, s.ts) AS lag
      |  FROM probe p ASOF LEFT JOIN state s
      |    ON p.user_id = s.user_id AND p.ts <= s.ts)
      |SELECT event_id, user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
      |  CASE WHEN s_ts IS NOT NULL AND lag <= ${AsofForwardTolSecs}
      |    THEN strftime(s_ts, '%Y-%m-%d %H:%M:%S.%f') ELSE '(none)' END
      |    AS next_ts,
      |  CASE WHEN s_ts IS NOT NULL AND lag <= ${AsofForwardTolSecs}
      |    THEN s_val ELSE -1.0 END AS next_val,
      |  CASE WHEN s_ts IS NOT NULL AND lag <= ${AsofForwardTolSecs}
      |    THEN lag ELSE -1 END AS lag_secs
      |FROM m ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------
  // `q_range_join`: interval/range join — fact rows against a dimension of
  // (possibly OVERLAPPING) value ranges. The naive plan is a broadcast
  // nested-loop with a theta predicate; the scalable plan used here is
  // BIN ACCELERATION: each range explodes into the fixed-width bins it
  // covers, the fact row computes its single bin, and the join becomes an
  // EQUI-join on bin followed by the exact range filter. Each (row, range)
  // match appears in exactly one bin (the row's), so no dedup is needed.
  // At 100 TB the bin join hash-partitions like any equi-join; bin width
  // trades dimension blowup against filter selectivity.
  // ------------------------------------------------------------------

  /** Price-tier ranges [lo, hi) — deliberately overlapping (a part can land
    * in several tiers), shared verbatim with the oracle. */
  val PriceTiers: Seq[(String, Int, Int)] =
    Seq(("budget", 0, 1000), ("low", 800, 1200), ("mid", 1000, 1600),
      ("high", 1500, 2100), ("luxury", 1800, 2500))
  val BinWidth = 100

  def rangeJoinQ(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tiers = PriceTiers.toDF("tier", "lo", "hi")
      .withColumn("bin", explode(sequence(
        (col("lo") / BinWidth).cast("int"),
        ((col("hi") - 1) / BinWidth).cast("int"))))
    val p = Tables.part(spark, sfDir)
      .withColumn("bin", floor(col("p_retailprice") / BinWidth).cast("int"))
    p.join(broadcast(tiers), p("bin") === tiers("bin") &&
        p("p_retailprice") >= tiers("lo") && p("p_retailprice") < tiers("hi"))
      .groupBy(col("tier"))
      .agg(graft.engine.Num.countStar.as("n_parts"),
        graft.engine.Num.sumMoney(col("p_retailprice")).as("total_price"))
      .orderBy(col("tier"))
  }

  val rangeJoinOracle: String = {
    val values = PriceTiers.map { case (t, lo, hi) => s"('$t', $lo, $hi)" }
      .mkString(", ")
    s"""SELECT t.tier, COUNT(*) AS n_parts,
       | CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
       |FROM part p
       |JOIN (VALUES $values) AS t(tier, lo, hi)
       |  ON p.p_retailprice >= t.lo AND p.p_retailprice < t.hi
       |GROUP BY t.tier ORDER BY t.tier""".stripMargin
  }

  /** Batch size of the reference's batched detail lookups (50 ids per API
    * request: src/youtube_collector.py:38-64, function_app.py:84-116). */
  val LookupBatchSize = 50

  /** S3/S4 `q_batched_lookup`: the engine-side shape of the reference's one
    * hand-built optimization — collect pending ids, fetch their details in
    * batches of ≤50 per request instead of one call per id. Dataflow: the
    * distinct id task list groups into deterministic ≤50-id batches
    * (`id div 50` — contiguous blocks, so batch membership is partitioning-
    * independent and oracle-able); each batch becomes ONE row whose id array
    * is the request payload; `mapPartitions` is the imperative client
    * boundary (one batched "call" per row — a real client would send the
    * joined id list and stream back one record per id); the fetched rows
    * then enrich against the details table with a plain equi-join that
    * Catalyst broadcasts at dim size. Never a per-id driver loop: the
    * batching, the calls, and the join are all executor-side and scale with
    * partitions, not with the driver. */
  def batchedLookupQ(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tasks = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("id")).distinct()
      .withColumn("batch_id", expr(s"id div $LookupBatchSize"))
    val requests = tasks.groupBy(col("batch_id"))
      .agg(collect_list(col("id")).as("ids"))
      .select(col("batch_id"), col("ids"))
    val fetched = requests.as[(Long, Seq[Long])]
      .mapPartitions { batches =>
        batches.flatMap { case (batchId, ids) =>
          ids.iterator.map(id => (batchId, id))
        }
      }
      .toDF("batch_id", "id")
    val details = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"))
    // LEFT join: ids the lookup source doesn't know stay visible (n_found
    // vs n_ids is the reference's per-batch miss accounting).
    fetched.join(details, fetched("id") === details("c_custkey"), "left")
      .groupBy(col("batch_id"))
      .agg(graft.engine.Num.countStar.as("n_ids"),
        count(col("c_custkey")).as("n_found"),
        graft.engine.Num.sumMoney(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("batch_id"))
  }

  val batchedLookupOracle: String =
    s"""WITH tasks AS (SELECT DISTINCT o_custkey AS id FROM orders),
       |b AS (SELECT id, id // $LookupBatchSize AS batch_id FROM tasks)
       |SELECT b.batch_id, COUNT(*) AS n_ids, COUNT(c.c_custkey) AS n_found,
       |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
       |FROM b LEFT JOIN customer c ON b.id = c.c_custkey
       |GROUP BY 1 ORDER BY batch_id""".stripMargin

  def mergeDim(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val target = cust.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("key"),
        col("c_name").as("t_name"), col("c_acctbal").as("t_acctbal"),
        lit("2024-01-01").as("t_first_seen"))
    val source = cust.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("key"),
        concat(col("c_name"), lit("#v2")).as("s_name"),
        (col("c_acctbal") + 100.0).as("s_acctbal"),
        lit("2024-06-01").as("s_first_seen"))
    mergeUpsert(target, source)
  }

  // ------------------------------------------------------------------
  // `q_scd2`: slowly-changing-dimension TYPE-2 history — the dimension-
  // management pattern one step past the reference's overwrite MERGE (J2,
  // which is SCD1: update-in-place, history lost). Each attribute change
  // becomes a VERSION ROW with a validity interval [valid_from, valid_to)
  // and a current flag, which is what lets a fact row join the attribute
  // AS OF its own timestamp (the warehouse twin of the as-of join above).
  // Built from the change log in one pass: dedup to one change per (key,
  // ts), then `lead(ts)` over each key's timeline closes every interval
  // with the next change's start. ONE shuffle on the key — same exchange
  // serves the dedup window, the lead window, and nothing else; no join,
  // no second pass. At 100 TB the change log partitions by key and each
  // key's timeline sorts within its partition; version numbering rides the
  // same sort for free.
  // ------------------------------------------------------------------

  def scd2Q(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wD = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val wK = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc)
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "signup")
      .withColumn("rn", row_number().over(wD)).filter(col("rn") === 1)
      .select(col("user_id"), col("ts"), col("value").as("attr"))
      .withColumn("version", row_number().over(wK))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(wK))
      .select(col("user_id"), col("version"),
        date_format(col("ts"), fmt).as("valid_from"),
        coalesce(date_format(col("valid_to_ts"), fmt), lit("(current)"))
          .as("valid_to"),
        col("attr"),
        (col("valid_to_ts").isNull).as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val scd2Oracle: String =
    """WITH chg AS (
      |  SELECT user_id, ts, value AS attr FROM (
      |    SELECT user_id, ts, value,
      |      ROW_NUMBER() OVER (PARTITION BY user_id, ts
      |                         ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_type = 'signup') WHERE rn = 1)
      |SELECT user_id,
      |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC) AS version,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
      |  COALESCE(strftime(LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC),
      |                    '%Y-%m-%d %H:%M:%S.%f'), '(current)') AS valid_to,
      |  attr,
      |  LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC) IS NULL
      |    AS is_current
      |FROM chg
      |ORDER BY user_id, version""".stripMargin

  /** Bloom bit-array size (2^16 bits) and hash count. */
  val BloomBits = 1 << 16
  val BloomK = 3
  /** The dim-side predicate the filter summarizes. */
  val BloomSegment = "BUILDING"

  /** Position columns of the k Bloom hashes for a key column (portable
    * 60-bit md5 hash per seed, mod m — nonneg, so % == pmod on both
    * engines). */
  private def bloomPos(key: org.apache.spark.sql.Column) =
    (0 until BloomK).map(i =>
      pmod(conv(substring(md5(concat(lit(s"bf${i}_"), key)), 1, 15), 16, 10)
        .cast("long"), lit(BloomBits.toLong)))

  /** `q_bloom_join`: Bloom-filter join pruning — the runtime-filter
    * technique that makes selective fact⋈dim joins survive 100 TB: the
    * dim side's join keys fold into a fixed-size bit array, the fact scan
    * drops rows that cannot match BEFORE the shuffle, and only the
    * survivors (true matches + a measured trickle of false positives) pay
    * join cost. Spark's own engine does this opaquely (AQE runtime bloom /
    * DPP); this is the transparent twin with the same dataflow, and it
    * EXPOSES the thing that matters operationally — the false-positive
    * count per group — instead of hiding it.
    *
    * Shape: filter = distinct set positions of the dim keys (k·|dim| ints,
    * broadcast — the ≤8 KiB bitmask stand-in); probe rows explode to k
    * position rows (narrow), broadcast-semi-join against the filter, and a
    * count==k aggregate on the probe key keeps rows whose every position
    * hit. The verify join against the real dim then runs on the pruned
    * candidates only. All positions are exact integers → the pass/fail
    * decision (and thus even which false positives survive) hash-gates
    * cross-engine. */
  def bloomJoinQ(spark: SparkSession, sfDir: String): DataFrame = {
    val dimKeys = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === BloomSegment)
      .select(col("c_custkey"))
    val filterBits = dimKeys
      .select(explode(array(bloomPos(col("c_custkey")): _*)).as("pos"))
      .distinct()
    val probe = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    // MATERIALIZED: candidates feeds both the n_candidates rollup and the
    // verified branch — unmaterialized, the fact scan + k-way explode +
    // semi-join + aggregate would execute twice (the multi-consumer rule)
    val candidates = graft.engine.Materialize.diskBacked(probe
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        explode(array(bloomPos(col("o_custkey")): _*)).as("pos"))
      .join(broadcast(filterBits), Seq("pos"), "left_semi")
      .groupBy(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") === BloomK))
    val verified = candidates
      .join(broadcast(dimKeys.withColumnRenamed("c_custkey", "o_custkey")),
        Seq("o_custkey"), "left_semi")
    candidates.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_candidates"))
      .join(verified.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_actual")),
        Seq("o_orderpriority"), "left")
      .select(col("o_orderpriority"), col("n_candidates"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        (col("n_candidates") - coalesce(col("n_actual"), lit(0L)))
          .as("n_false_pos"))
      .orderBy(col("o_orderpriority"))
  }

  val bloomJoinOracle: String = {
    def posSql(seed: Int, key: String) =
      s"CAST(concat('0x', substr(md5('bf${seed}_' || $key), 1, 15)) AS BIGINT) % ${BloomBits}"
    val dimPos = (0 until BloomK)
      .map(i => s"SELECT ${posSql(i, "c_custkey")} AS pos FROM dim")
      .mkString("\n  UNION\n  ")
    val probeChecks = (0 until BloomK)
      .map(i => s"${posSql(i, "o_custkey")} IN (SELECT pos FROM bits)")
      .mkString("\n    AND ")
    s"""WITH dim AS (
       |  SELECT c_custkey FROM customer WHERE c_mktsegment = '${BloomSegment}'),
       |bits AS (
       |  ${dimPos}),
       |cand AS (
       |  SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
       |  WHERE ${probeChecks})
       |SELECT o_orderpriority,
       |  COUNT(*) AS n_candidates,
       |  CAST(SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM dim)
       |       THEN 1 ELSE 0 END) AS BIGINT) AS n_actual,
       |  COUNT(*) - CAST(SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM dim)
       |       THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
       |FROM cand GROUP BY 1 ORDER BY o_orderpriority""".stripMargin
  }

  /** Deterministic synthetic second snapshot for the CDC diff: customers
    * churn at key % 97 == 0, balances move at key % 13 == 0, and a
    * disjoint id range (key % 89 == 0, shifted past the observed max key)
    * arrives new — the three mutation classes a snapshot diff must
    * classify. The shift is MAX(k), not a constant: a fixed offset stops
    * being disjoint once the table outgrows it (TPC-H customer passes
    * 1M keys at SF≈7) and added rows would collide with live ones. */

  /** `q_cdc_diff`: change-data-capture by snapshot comparison — the
    * reconciliation report a warehouse runs when an upstream can't emit a
    * change log: full-outer join old vs. new snapshot on the key, classify
    * each key as added / removed / changed / unchanged from the tracked
    * attribute tuple, and roll up count + key-checksum per class (the
    * checksums are what an auditor diffs against the next run).
    *
    * Plan: ONE co-partitioned shuffle join (both snapshots hash on the
    * key — the canonical CDC shape; with bucketed snapshots, as in
    * `q_bucketed_join`, the exchange disappears entirely) followed by a
    * 4-group two-phase aggregate. No broadcast — both sides are
    * table-sized by construction. */
  def cdcDiffQ(spark: SparkSession, sfDir: String): DataFrame = {
    val snap = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
        col("c_mktsegment").as("seg"))
    val maxK = snap.agg(max(col("k")).as("mk"))
    val next = snap.filter(col("k") % 97 =!= 0)
      .withColumn("bal",
        when(col("k") % 13 === 0, col("bal") + 100).otherwise(col("bal")))
      .unionByName(snap.filter(col("k") % 89 === 0)
        .crossJoin(broadcast(maxK))
        .select((col("k") + col("mk")).as("k"), col("bal"), col("seg")))
    snap.as("o").join(next.as("n"), col("o.k") === col("n.k"), "full_outer")
      .select(
        when(col("o.k").isNull, "added")
          .when(col("n.k").isNull, "removed")
          .when(col("o.bal") === col("n.bal") && col("o.seg") === col("n.seg"),
            "unchanged")
          .otherwise("changed").as("status"),
        coalesce(col("o.k"), col("n.k")).as("k"))
      .groupBy(col("status"))
      .agg(Num.countStar.as("n"), sum(col("k")).as("key_checksum"))
      .orderBy(col("status"))
  }

  val cdcDiffOracle: String =
    s"""WITH snap AS (
       |  SELECT c_custkey AS k, c_acctbal AS bal, c_mktsegment AS seg
       |  FROM customer),
       |nxt AS (
       |  SELECT k, CASE WHEN k % 13 = 0 THEN bal + 100 ELSE bal END AS bal,
       |    seg
       |  FROM snap WHERE k % 97 <> 0
       |  UNION ALL
       |  SELECT k + (SELECT MAX(k) FROM snap) AS k, bal, seg
       |  FROM snap WHERE k % 89 = 0)
       |SELECT CASE WHEN o.k IS NULL THEN 'added'
       |            WHEN n.k IS NULL THEN 'removed'
       |            WHEN o.bal = n.bal AND o.seg = n.seg THEN 'unchanged'
       |            ELSE 'changed' END AS status,
       |  COUNT(*) AS n,
       |  CAST(SUM(COALESCE(o.k, n.k)) AS BIGINT) AS key_checksum
       |FROM snap o FULL OUTER JOIN nxt n ON o.k = n.k
       |GROUP BY 1 ORDER BY status""".stripMargin

  /** X119 `q_fuzzy_join`: entity resolution by bounded Hamming distance
    * over a fixed-format key column — the "same entity, corrupted id"
    * matcher every ingestion pipeline needs (OCR'd ids, fat-fingered
    * account numbers, telemetry keys with bit flips).
    *
    * The naive form is an O(n²) cross join with a distance predicate —
    * at 100 TB that is the single most common scale-killer in entity
    * resolution. This operator blocks with DELETION NEIGHBORHOODS
    * instead: each 9-char key tail emits C(9,2)=36 (dropped-positions,
    * remainder) blocking keys; two keys share a blocking key IFF they
    * agree everywhere outside the two dropped positions, i.e. IFF their
    * Hamming distance is ≤ 2. The candidate set is therefore EXACT —
    * zero false candidates, zero missed pairs — and the join is a plain
    * equi-join on (block, remainder) that shuffles 36·n small rows
    * instead of comparing n²/2 pairs. Per-block fan-in is bounded by the
    * key-domain structure (≤10² rows for decimal tails), so no block
    * degenerates into a quadratic island.
    *
    * Within a block the two sides agree everywhere OUTSIDE the dropped
    * positions, so the pair's full Hamming distance is just two char
    * compares on the dropped characters — each row carries only (id, the
    * two dropped chars), never the name. A pair at distance 1 matches 8
    * blocking keys and a distance-2 pair exactly 1; rather than a
    * multi-million-row distinct() to collapse the duplicates, each pair
    * is accepted in exactly ONE canonical block — the mismatch-position
    * pair for distance 2, (p, p+1) for a single mismatch at p (or (8,9)
    * for p = L) — making the pipeline shuffle-free after the candidate
    * join: candidates stream through a codegen filter straight into the
    * bounded aggregate. The native [[graft.functions.StringExprs]]
    * `graft_hamming` expression computes the same distance from the full
    * strings; the ScalaTest spec uses it to pin this blocked plan to the
    * brute-force all-pairs scan.
    *
    * Shuffle bytes: the (blk, rem) blocking key is PACKED into one long
    * `bk = blk·10^(L-2) + rem` — lossless, because the tail is all
    * digits (c_name is "Customer#" + 9 digits) so the 7-char remainder
    * IS a number below 10^7 and the packing is injective. Each exploded
    * row then shuffles (long, long, 2 chars) instead of carrying a
    * 7-char string through the exchange — ~2× fewer candidate-join
    * shuffle bytes (EntityStatsSpec pins a byte ceiling). The dropped
    * chars ci/cj stay as strings: they are the verify payload, not the
    * key. */
  val FuzzyTailLen = 9
  val FuzzyMaxDist = 2
  /** 10^(FuzzyTailLen-2): the packing base for the 7-digit remainder. */
  val FuzzyRemBase = 10000000L

  /** The fuzzy join's 36-way deletion-neighborhood blocking frame —
    * (id, bk packed long, dropped chars ci/cj) per (i,j) key. Factored so
    * `graft.tools.ScaleProbe fuzzy` can measure the CANDIDATE-PAIR volume
    * (Σ_bk c·(c−1)/2) of the exact production frame across scale tiers
    * (VERDICT r8 item 5: measure, don't argue, the second decade). */
  private[graft] def fuzzyBlocked(spark: SparkSession, sfDir: String): DataFrame = {
    val L = FuzzyTailLen
    // c_name = "Customer#ddddddddd" — the 9-digit tail is the match key.
    val tailCol = substring(col("c_name"), 10, L)
    val keys = for { i <- 1 to L; j <- (i + 1) to L } yield {
      val rem = concat(
        substring(col("tail"), 1, i - 1),
        substring(col("tail"), i + 1, j - i - 1),
        substring(col("tail"), j + 1, L - j))
      struct((lit(i * 10 + j) * FuzzyRemBase + rem.cast("long")).as("bk"),
        substring(col("tail"), i, 1).as("ci"),
        substring(col("tail"), j, 1).as("cj"))
    }
    // Repartition BEFORE the explode: the single-file dim scan is one
    // partition, and the 36× string-building fan-out is the query's only
    // heavy map work — spread it across the cluster, not one task. Width
    // follows the cluster (defaultParallelism), not a hard-coded core count.
    Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("id"), tailCol.as("tail"))
      // Precondition guard, LOUD not silent: the packed-long blocking
      // key casts the deletion-neighborhood remainder to long, so a
      // non-digit tail would cast to NULL and silently vanish from the
      // pair space (the r7 string-keyed join tolerated arbitrary tails;
      // the r8 packed key narrowed the domain — ADVICE r8 asked for the
      // assumption to be checked, not assumed). Or short-circuits in
      // both codegen and interpreted eval, so raise_error fires only on
      // a violating row; cost is one anchored regex per dim row, before
      // the 36× explode.
      .filter(col("tail").rlike("^[0-9]{" + L + "}$") ||
        raise_error(concat(lit("fuzzyJoin: non-digit c_name tail: "),
          col("tail"))).isNotNull)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("id"), explode(array(keys: _*)).as("k"))
      .select(col("id"), col("k.bk").as("bk"),
        col("k.ci").as("ci"), col("k.cj").as("cj"))
  }

  def fuzzyJoinQ(spark: SparkSession, sfDir: String): DataFrame = {
    val L = FuzzyTailLen
    // MATERIALIZED: the exploded blocking frame feeds both join sides —
    // without the plan break the 36-way explode over the scan runs twice.
    val exploded = graft.engine.Materialize.diskBacked(
      fuzzyBlocked(spark, sfDir))
    val a = exploded.select(col("bk"), col("id").as("id_a"),
      col("ci").as("ci_a"), col("cj").as("cj_a"))
    val b = exploded.select(col("bk"), col("id").as("id_b"),
      col("ci").as("ci_b"), col("cj").as("cj_b"))
    val di = col("ci_a") =!= col("ci_b") // mismatch at dropped position i
    val dj = col("cj_a") =!= col("cj_b") // mismatch at dropped position j
    // unpack blk = i*10 + j from the packed key (exact integer division)
    val blk = Num.divLong(col("bk"), FuzzyRemBase)
    val (bi, bj) = (Num.divLong(blk, 10L), blk % 10)
    val canonical = (di && dj) ||
      (di && !dj && bj === bi + 1) ||
      (!di && dj && blk === (L - 1) * 10 + L)
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b") && canonical)
      .select(col("id_a"), col("id_b"),
        (di.cast("int") + dj.cast("int")).as("dist"))
      .groupBy(col("dist"))
      .agg(Num.countStar.as("n_pairs"),
        countDistinct(col("id_a")).as("n_left"))
      .orderBy(col("dist"))
  }

  /** Oracle states the SEMANTICS (all-pairs Hamming ≤ 2) without the
    * blocking — n² is affordable at oracle scale and proves the deletion
    * neighborhoods lose nothing. */
  val fuzzyJoinOracle: String =
    s"""SELECT dist, COUNT(*) AS n_pairs, COUNT(DISTINCT id_a) AS n_left
       |FROM (
       |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       |         hamming(a.c_name, b.c_name) AS dist
       |  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey)
       |WHERE dist <= ${FuzzyMaxDist} AND dist > 0
       |GROUP BY 1 ORDER BY dist""".stripMargin

  // ------------------------------------------------------------------
  // `q_edit_pairs` (X226): edit-distance-1 similarity join (FastSS)
  // ------------------------------------------------------------------

  /** `q_edit_pairs`: TRUE edit-distance similarity join over
    * varying-length strings — the general-alphabet companion to X119:
    * the fuzzy join blocks POSITIONALLY (fixed-length keys,
    * substitutions only — Hamming), and cannot see that "143" and
    * "1432" are one keystroke apart. This operator mines ED ≤ 1 pairs
    * (substitutions AND insertions/deletions) with the
    * deletion-neighborhood signature scheme (FastSS): each string s
    * emits s itself plus its |s| delete-one variants; if ED(a,b) ≤ 1
    * the two strings SHARE a signature (substitution at i → both delete
    * position i; indel → the shorter string IS a signature of both), so
    * an equi-join on signature is a LOSSLESS candidate generator — and
    * sharing a signature bounds ED ≤ 2, so one exact `levenshtein` per
    * distinct candidate finishes the verify. The ID-reconciliation /
    * typo-clustering primitive of entity resolution, run over the
    * customer key rendered as a decimal string (lengths vary, so indel
    * pairs are real: 4.3k of 22.3k pairs at gate scale).
    *
    * Scale shape: vocabulary-bounded end to end — (L+1) signatures per
    * DISTINCT string, one shuffle on signature with bucket sizes
    * following the signature-frequency distribution (never all-pairs),
    * one candidate distinct, one codegen'd levenshtein per candidate.
    *
    * The oracle states the SEMANTICS as brute force behind a cheap
    * prefilter that is itself lossless: one edit at position > 0 leaves
    * the first characters equal; one edit at position 0 leaves the last
    * characters equal (suffixes align right even across an indel); the
    * only escape is a min-length-1 pair, admitted wholesale. The gate
    * therefore proves the signature join loses nothing. */
  def editPairsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("string").as("w")).distinct()
    val delSigs = transform(
      sequence(lit(0), length(col("w")) - 1),
      i => concat(col("w").substr(lit(1), i),
        col("w").substr(i + lit(2), length(col("w")))))
    // MATERIALIZED: the signature frame feeds both sides of the
    // candidate self-join (the multi-consumer rule)
    val sigs = graft.engine.Materialize.diskBacked(
      ids.select(col("w"),
        explode(array_union(array(col("w")), delSigs)).as("sig")))
    val cand = sigs.as("a").join(sigs.as("b"),
        col("a.sig") === col("b.sig") && col("a.w") < col("b.w"))
      .select(col("a.w").as("id_a"), col("b.w").as("id_b"))
      .distinct()
    cand.filter(levenshtein(col("id_a"), col("id_b")) <= 1)
      .select(col("id_a"), col("id_b"),
        when(length(col("id_a")) === length(col("id_b")), lit("sub"))
          .otherwise(lit("indel")).as("kind"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val editPairsOracle: String =
    """WITH v AS (
      |  SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS w FROM customer),
      |cand AS (
      |  SELECT a.w AS id_a, b.w AS id_b
      |  FROM v a JOIN v b ON a.w < b.w
      |   AND abs(length(a.w) - length(b.w)) <= 1
      |   AND (substr(a.w, 1, 1) = substr(b.w, 1, 1)
      |        OR substr(a.w, length(a.w), 1) = substr(b.w, length(b.w), 1)
      |        OR least(length(a.w), length(b.w)) = 1))
      |SELECT id_a, id_b,
      |  CASE WHEN length(id_a) = length(id_b) THEN 'sub' ELSE 'indel' END
      |    AS kind
      |FROM cand WHERE levenshtein(id_a, id_b) <= 1
      |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------------------------
  // `q_skew_join` / `q_skew_join_plain`: hot-key join under AQE skew split
  // ------------------------------------------------------------------

  /** The classic UNKNOWN-member fact skew: every fact row without a
    * resolvable dimension key collapses onto the sentinel member (-1), so
    * one join key carries a third of the table while real keys carry ~600
    * rows each (`q_skew_profile` is the diagnostic that would surface
    * this). The lazy plan: facts (lineitem, with `l_returnflag = 'N'`
    * standing in deterministically for "supplier attribution missing")
    * joined to the supplier dim extended with the UNKNOWN row, rolled up
    * per nation. */
  private[graft] def skewJoinPlan(spark: SparkSession, sfDir: String): DataFrame = {
    // AQE splits a skewed REDUCE partition at map-output granularity: it
    // regroups the map chunks that hash-landed together, so the hot key is
    // only divisible if many map tasks produced it. A 100 TB scan gives
    // thousands of map tasks for free; the bench fixture is ONE parquet
    // row group = one scan task = one indivisible chunk, so spread the
    // fact side across the cluster width first (at scale this exchange is
    // what the scan's own task fan-out already provides).
    val facts = Tables.lineitem(spark, sfDir).select(
      when(col("l_returnflag") === "N", lit(-1L))
        .otherwise(col("l_suppkey")).as("supp_key"),
      col("l_extendedprice"))
      .repartition(spark.sparkContext.defaultParallelism)
    val dim = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("supp_key"),
        col("s_nationkey").cast("long").as("nation_key"))
      .unionByName(spark.range(1).select(
        lit(-1L).as("supp_key"), lit(-1L).as("nation_key")))
    facts.join(dim, Seq("supp_key"))
      .groupBy(col("nation_key"))
      .agg(Num.countStar.as("n_items"),
        Num.sumMoney(col("l_extendedprice")).as("revenue"))
      .orderBy(col("nation_key"))
  }

  /** Confs that make the hot key OBSERVABLE at bench scale: broadcast off
    * (the dim would otherwise broadcast and no shuffle would exist to
    * skew — at 100 TB the dim may not fit, which is when skew bites), and
    * the AQE skew thresholds scaled from their production defaults
    * (256 MB partitions) down to bench bytes so the optimizer classifies
    * the sentinel partition exactly as it would the real thing. */
  private[graft] val skewScaleConfs: Seq[(String, String)] = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    // The join feeds a rollup whose re-shuffle the skew split would add
    // anyway; without force, OptimizeSkewedJoin vetoes itself whenever the
    // split changes the join's output partitioning that a downstream
    // exchange must then restore. One straggler partition costs more than
    // one extra small exchange — the trade this conf exists to take.
    "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")

  /** `q_skew_join`: the hot-key join executed WITH AQE's skew-join split —
    * the runtime answer to skew (the planned-ahead answers are the salted
    * variants, W1/A1). AQE observes the finished map stage, sees the
    * sentinel partition at ~N/3 of the table, and splits it into
    * advisory-sized chunks each joined against a replicated copy of the
    * dim's matching partition — no code change, no salt column, identical
    * results (same oracle as the plain variant; PlanSpec pins that the
    * split actually engaged, not just that AQE was on).
    *
    * The result materializes INSIDE the conf scope (the scoped confs are
    * read at execution time, and the caller counts after the scope ends). */
  def skewJoinQ(spark: SparkSession, sfDir: String): DataFrame =
    graft.engine.Conf.scoped(spark, skewScaleConfs: _*) {
      graft.engine.Materialize.diskBacked(skewJoinPlan(spark, sfDir))
    }

  /** `q_skew_join_plain`: identical plan with the skew split DISABLED —
    * the baseline an un-tuned engine runs, where the sentinel partition
    * serializes one straggler task. Gated against the same oracle: the
    * optimization must never change the answer. */
  def skewJoinPlainQ(spark: SparkSession, sfDir: String): DataFrame =
    graft.engine.Conf.scoped(spark,
      skewScaleConfs :+ ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      graft.engine.Materialize.diskBacked(skewJoinPlan(spark, sfDir))
    }

  val skewJoinOracle: String =
    """SELECT nation_key, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM (SELECT CASE WHEN l_returnflag = 'N' THEN -1 ELSE l_suppkey END
      |        AS supp_key, l_extendedprice FROM lineitem) f
      |JOIN (SELECT s_suppkey AS supp_key,
      |        CAST(s_nationkey AS BIGINT) AS nation_key FROM supplier
      |      UNION ALL SELECT -1, -1) d USING (supp_key)
      |GROUP BY nation_key ORDER BY nation_key""".stripMargin

  // `q_left_outer`: preserved-row outer join coverage report

  /** `q_left_outer`: the LEFT OUTER leg of the join-type surface (inner
    * J1, semi X37, anti J3, full-outer J2/X73 are gated elsewhere) — the
    * dimension-coverage report it exists for: every customer preserved,
    * order activity null-filled, so "how many customers in each segment
    * have never ordered" falls out of counting the null side. The fact
    * side pre-aggregates to per-customer counts BEFORE the join (a
    * customer-keyed fold), so the outer join matches at most one row per
    * customer — no fan-out, no null-fill ambiguity.
    *
    * Scale shape: fact folds to the dimension's key first; the outer
    * join is key-to-key; the report fold is segment-bounded. */
  def leftOuterQ(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(Num.countStar.as("n_orders"))
    Tables.customer(spark, sfDir)
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(Num.countStar.as("n_customers"),
        sum(when(col("n_orders").isNull, 1L).otherwise(0L))
          .as("n_never_ordered"),
        sum(coalesce(col("n_orders"), lit(0L))).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  val leftOuterOracle: String =
    """WITH pc AS (
      |  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1)
      |SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(SUM(CASE WHEN n_orders IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_never_ordered,
      |  CAST(SUM(COALESCE(n_orders, 0)) AS BIGINT) AS n_orders
      |FROM customer LEFT JOIN pc ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin
}
