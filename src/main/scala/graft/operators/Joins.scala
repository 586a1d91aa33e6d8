package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

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
    target.join(source, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("s_name"), col("t_name")).as("name"),
        coalesce(col("s_acctbal"), col("t_acctbal")).as("acctbal"),
        coalesce(col("t_first_seen"), col("s_first_seen")).as("first_seen"))
      .orderBy(col("key"))

  /** Core insert-only MERGE: rows of `batch` whose key is absent from
    * `target` — first write wins, re-collections never refresh
    * (function_app.py:465-481). */
  def insertOnlyNew(batch: DataFrame, target: DataFrame, key: String): DataFrame =
    batch.join(target.select(col(key)), Seq(key), "left_anti")

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
}
