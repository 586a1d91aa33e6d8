package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Num, Tables}

/** Aggregation operators.
  *
  * Reference semantics (file:line into /root/reference/):
  *  - A1 daily rollup: GROUP BY (country, sentiment) with COUNT + 3 SUMs +
  *    AVG over the fact⋈dim join (src/snowflake_loader.py:140-155).
  *  - A4 count-distribution report with percentage-of-total
  *    (src/youtube_collector.py:247-266).
  *  - A5 scalar-subquery table counts in one row
  *    (src/snowflake_loader.py:166-171).
  *  - O1 multi-key mixed-direction sorted report
  *    (src/snowflake_loader.py:179-185).
  *
  * All ride Spark's two-phase HashAggregate (map-side partial + final after
  * shuffle), so at 100 TB the shuffle carries only one row per (group ×
  * partition), not the fact rows.
  */
object Aggregates {

  /** A1 `q_agg_daily_region`: orders⋈customer⋈nation rolled up by
    * (nation, orderstatus). The date predicate mirrors the reference's
    * "today only" filter (injected literal for determinism —
    * src/snowflake_loader.py:153) and pushes down to the parquet scan. */
  def aggDailyRegion(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    // Broadcast hint only on bounded `nation`; customer-sized dim is left to
    // autoBroadcastJoinThreshold/AQE (scales with SF — never force-broadcast).
    val dim = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(c("c_custkey"), n("n_name").as("nation"))
    o.join(dim, o("o_custkey") === dim("c_custkey"))
      .groupBy(col("nation"), col("o_orderstatus"))
      .agg(
        Num.countStar.as("video_count"),
        Num.sumMoney(col("o_totalprice")).as("total_price"),
        (Num.sumMoney(col("o_totalprice")) / Num.countStar).as("avg_price"))
      .orderBy(col("nation"), col("o_orderstatus"))
  }

  /** O1 `q_report_sorted`: per-nation report, mixed-direction sort
    * (ORDER BY country ASC, video_count DESC in the reference). */
  def reportSorted(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val dim = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(c("c_custkey"), n("n_name").as("nation"))
    o.join(dim, o("o_custkey") === dim("c_custkey"))
      .groupBy(col("nation"), col("o_orderpriority"))
      .agg(Num.countStar.as("order_count"),
        Num.sumMoney(col("o_totalprice")).as("total_price"))
      .orderBy(col("nation").asc, col("order_count").desc,
        col("o_orderpriority").asc)
  }

  /** A4 `q_sentiment_dist`: histogram + percentage of grand total via a
    * window over the empty partitioning (the report at
    * src/youtube_collector.py:247-266). The percentage division is
    * deterministic cross-engine (two exact longs), but the 2-decimal
    * rounding must use the floor(x·100 + 0.5)/100 idiom on BOTH engines:
    * Spark's round() rounds the shortest-decimal rendering while DuckDB's
    * ROUND multiplies first, and the two diverge on reachable count/total
    * pairs (e.g. 1783/20000 → 8.92 vs 8.91) — the same divergence class
    * TextAnalysis.round4 documents. */
  def sentimentDist(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus")).agg(Num.countStar.as("n"))
    // Grand total via an unpartitioned window: one extra lightweight exchange
    // of the already-tiny grouped result, never of the fact table.
    counts
      .withColumn("pct",
        floor(col("n") * 100.0 / sum(col("n")).over(Window.partitionBy())
          * 100.0 + 0.5) / 100.0)
      .orderBy(col("o_orderstatus"))
  }

  /** A5 `q_scalar_subquery`: one row of table counts — Spark SQL supports
    * scalar subqueries directly, mirroring the summary at
    * src/snowflake_loader.py:166-171. */
  def scalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("g_customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("g_orders")
    Tables.nation(spark, sfDir).createOrReplaceTempView("g_nation")
    spark.sql(
      """SELECT
        |  (SELECT COUNT(*) FROM g_customer) AS channels,
        |  (SELECT COUNT(*) FROM g_orders)   AS videos,
        |  (SELECT COUNT(*) FROM g_nation)   AS aggregations""".stripMargin)
  }

  /** A1-at-scale `q_agg_pricing`: the classic pricing-summary shape over the
    * largest table (lineitem) — 2 grouping keys, count + sums + means — the
    * headline scan-heavy aggregate for the bench. Quantities are
    * integer-valued doubles (exact at any summation order); money columns go
    * through the decimal-exact path. Map-side partial aggregation reduces the
    * shuffle to (#groups × #partitions) rows. */
  def aggPricing(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        Num.sumMoney(col("l_extendedprice")).as("sum_base_price"),
        (sum(col("l_quantity")) / Num.countStar).as("avg_qty"),
        (Num.sumMoney(col("l_extendedprice")) / Num.countStar).as("avg_price"),
        Num.countStar.as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val aggPricingOracle: String =
    """SELECT l_returnflag, l_linestatus,
      | SUM(l_quantity) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | SUM(l_quantity) / COUNT(*) AS avg_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Skew-safe two-stage aggregation (`q_agg_salted`): the salting idiom
    * for hot grouping keys at 100 TB — `events.event_type` has only a
    * handful of values, so a plain groupBy funnels the whole table into ~5
    * reducers. Stage 1 aggregates by (key, salt) spreading each hot key
    * over `Salts` reducers; stage 2 combines the per-salt partials. Result
    * is identical to the direct groupBy (the oracle computes exactly that).
    * The summed metric uses floor()+long so it is exact under any
    * combination order AND any engine (double sums are order-dependent;
    * double→long casts truncate in Spark but round in DuckDB — floor first
    * sidesteps both). */
  val Salts = 8

  def aggSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val partial = Tables.events(spark, sfDir)
      .withColumn("salt", pmod(col("event_id"), lit(Salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(Num.countStar.as("pn"),
        sum(floor(col("value")).cast("long")).as("psv"))
    partial
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("psv")).as("sum_floor_value"))
      .orderBy(col("event_type"))
  }

  val aggSaltedOracle: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** A2 `q_distinct`: SELECT DISTINCT (dedup pre-MERGE,
    * function_app.py:442). Partial aggregation removes duplicates map-side
    * before the shuffle. */
  def distinctRows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  /** `q_set_ops`: UNION / INTERSECT / EXCEPT over two key sets — recent
    * customers (1997+ orders) vs customers with a finished order. Each set
    * op is a distinct-aggregate-shaped shuffle on the key; the three counts
    * union into one report row each. At scale every branch is a two-phase
    * hash aggregate — the inputs are scanned once per op but only the key
    * column moves. */
  def setOpsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val recent = o.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val finished = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    def counted(name: String, df: DataFrame): DataFrame =
      df.distinct().agg(Num.countStar.as("n_keys"))
        .select(lit(name).as("set_op"), col("n_keys"))
    counted("except", recent.except(finished))
      .unionByName(counted("intersect", recent.intersect(finished)))
      .unionByName(counted("union", recent.union(finished)))
      .orderBy(col("set_op"))
  }

  val setOpsOracle: String =
    """WITH recent AS (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'),
      |finished AS (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |SELECT 'except' AS set_op,
      |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM recent
      |    EXCEPT SELECT DISTINCT o_custkey FROM finished)) AS n_keys
      |UNION ALL SELECT 'intersect',
      |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM recent
      |    INTERSECT SELECT DISTINCT o_custkey FROM finished))
      |UNION ALL SELECT 'union',
      |  (SELECT COUNT(*) FROM (SELECT o_custkey FROM recent
      |    UNION SELECT o_custkey FROM finished))
      |ORDER BY set_op""".stripMargin

  /** Known pivot keys — passing them to pivot() skips the extra
    * distinct-values scan job AND fixes the output column order. */
  val PivotStatuses: Seq[String] = Seq("F", "O", "P")

  /** `q_pivot`: long→wide pivot — order counts per priority × status
    * matrix, the reference's sentiment histogram (youtube_collector.py:
    * 247-266) generalized to a cross-tab. Spark's pivot() compiles to ONE
    * grouped aggregate whose aggregate list is the when()-projected status
    * buckets (no join, no second shuffle); the oracle writes those
    * conditional aggregates out explicitly. */
  def pivotQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", PivotStatuses)
      .agg(Num.countStar)
      .select(col("o_orderpriority") +:
        PivotStatuses.map(s => coalesce(col(s), lit(0L)).as(s"n_$s")): _*)
      .orderBy(col("o_orderpriority"))

  val pivotOracle: String = {
    val cols = PivotStatuses.map(s =>
      s"COALESCE(COUNT(*) FILTER (o_orderstatus = '$s'), 0) AS n_$s")
      .mkString(",\n ")
    s"""SELECT o_orderpriority,
       | $cols
       |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin
  }

  /** Top pair count reported by the basket miner. */
  val BasketTopK = 25

  /** `q_basket_pairs`: market-basket pair mining (the Apriori 2-itemset
    * step) with lift — which brand pairs co-occur in an order more than
    * their independent popularity predicts. The association-rule primitive
    * a recommendation / curation pipeline runs over transaction logs.
    *
    * Scale shape: the transaction frame folds to distinct (order, brand)
    * FIRST (brand is a bounded domain, so per-order fan-out is capped at
    * the domain size like X60's per-order supplier pairs), the pair
    * self-join is an equi-join on the order key, and the support aggregate
    * is two-phase over a domain-bounded (brand, brand) key space. Brand
    * marginals and the order count broadcast back as 1-row/25-row frames.
    * Lift is one pinned IEEE expression over exact counts, so ranking and
    * ties hash-gate cross-engine. */
  def basketPairsQ(spark: SparkSession, sfDir: String): DataFrame = {
    // Cached PRE-PARTITIONED on the basket key: the pair self-join below
    // then runs exchange-free on both sides (same discipline as pagerank's
    // edgesDeg / triangles' oriented frame).
    val ob = graft.engine.Materialize.diskBacked(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p_partkey"))
        .join(Tables.part(spark, sfDir)
          .select(col("p_partkey"), col("p_brand")), Seq("p_partkey"))
        .select(col("ok"), col("p_brand").as("b"))
        // repartition BEFORE dedup: HashPartitioning(ok) satisfies the
        // (ok, b) aggregate's clustering (subset partitioning), so the
        // dedup runs exchange-free on the basket-keyed layout the pair
        // self-join needs anyway — one shuffle where distinct-then-
        // repartition paid two.
        .repartition(col("ok"))
        .dropDuplicates("ok", "b"))
    val nOrders = ob.select(col("ok")).distinct()
      .agg(Num.countStar.as("n_orders"))
    // fenced for the same reason as assoc_rules: two broadcast consumers
    // of the brand marginal otherwise re-aggregate the ownership cache
    val brandCnt = graft.engine.Materialize.diskBacked(
      ob.groupBy(col("b")).agg(Num.countStar.as("cnt")))
    ob.as("x").join(ob.as("y"),
        col("x.ok") === col("y.ok") && col("x.b") < col("y.b"))
      .groupBy(col("x.b").as("brand_a"), col("y.b").as("brand_b"))
      .agg(Num.countStar.as("support"))
      .join(broadcast(brandCnt
        .select(col("b").as("brand_a"), col("cnt").as("ca"))), Seq("brand_a"))
      .join(broadcast(brandCnt
        .select(col("b").as("brand_b"), col("cnt").as("cb"))), Seq("brand_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("support"),
        ((col("support").cast("double") * col("n_orders").cast("double"))
          / (col("ca").cast("double") * col("cb").cast("double"))).as("lift"))
      .orderBy(col("support").desc, col("brand_a"), col("brand_b"))
      .limit(BasketTopK)
  }

  val basketPairsOracle: String =
    s"""WITH ob AS (
       |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       |n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM ob),
       |bc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM ob GROUP BY 1),
       |pairs AS (
       |  SELECT x.b AS brand_a, y.b AS brand_b, CAST(COUNT(*) AS BIGINT) AS support
       |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b
       |  GROUP BY 1, 2)
       |SELECT brand_a, brand_b, support,
       |  (CAST(support AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
       |    / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)) AS lift
       |FROM pairs
       |JOIN bc ca ON ca.b = brand_a
       |JOIN bc cb ON cb.b = brand_b, n
       |ORDER BY support DESC, brand_a, brand_b
       |LIMIT ${BasketTopK}""".stripMargin

  // ------------------------------------------------------------------
  // `q_itemcf` (X228): item-item collaborative-filtering neighbors
  // ------------------------------------------------------------------

  /** Neighbors retained per item. */
  val ItemCfTopK = 3

  /** `q_itemcf`: item-item collaborative filtering ("customers who
    * bought X also bought Y") — the recommendation-retrieval primitive
    * layered over X65's co-occurrence counting, with the three deltas
    * that turn pair counts into a neighbor index: pairs lift to the
    * CUSTOMER level (a brand pair co-occurs once per customer, not once
    * per order — repeat purchases must not inflate similarity), the
    * association strength is exact-integer JACCARD over owner sets
    * (cooc·10⁶ / (n_a + n_b − cooc) — cosine's sqrt would leave integer
    * arithmetic, and on implicit binary feedback Jaccard ranks
    * near-identically), and each item keeps only its top-k neighbors by
    * (jaccard desc, neighbor asc) — the per-item neighbor list a
    * retrieval service actually ships. Both directions are emitted:
    * neighbor lists are per-item, not per-unordered-pair.
    *
    * Scale shape: ownership dedups on a customer-keyed layout (the one
    * data-sized shuffle), the pair fan-out is per-customer
    * catalog-bounded (≤ |brands|² per customer — at item granularity a
    * production run caps per-user item counts first, the X75
    * discipline), the pair aggregate is brand-domain bounded, and the
    * owner-count joins plus the top-k window run on the 25²-row pair
    * frame — broadcast-sized everything after the shuffle. */
  def itemcfQ(spark: SparkSession, sfDir: String): DataFrame = {
    val owned = graft.engine.Materialize.diskBacked(
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("o_orderkey"),
            col("l_partkey").as("p_partkey")), Seq("o_orderkey"))
        .join(Tables.part(spark, sfDir)
          .select(col("p_partkey"), col("p_brand")), Seq("p_partkey"))
        .select(col("o_custkey").as("cust"), col("p_brand").as("b"))
        // repartition BEFORE dedup: HashPartitioning(cust) satisfies the
        // (cust, b) aggregate's clustering AND the pair self-join's —
        // one shuffle total (the X65 layout rule)
        .repartition(col("cust"))
        .dropDuplicates("cust", "b"))
    // brand-marginal frame fenced: two broadcast consumers, and without
    // the fence each re-ran the owner-set aggregate over the cached
    // ownership frame (the assoc_rules finding, same shape)
    val owners = graft.engine.Materialize.diskBacked(
      owned.groupBy(col("b")).agg(Num.countStar.as("n")))
    val pairs = owned.as("x").join(owned.as("y"),
        col("x.cust") === col("y.cust") && col("x.b") =!= col("y.b"))
      .groupBy(col("x.b").as("brand"), col("y.b").as("neighbor"))
      .agg(Num.countStar.as("cooc"))
    val w = Window.partitionBy(col("brand"))
      .orderBy(col("jaccard_ppm").desc, col("neighbor").asc)
    pairs
      .join(broadcast(owners
        .select(col("b").as("brand"), col("n").as("n_brand"))), Seq("brand"))
      .join(broadcast(owners
        .select(col("b").as("neighbor"), col("n").as("n_neighbor"))),
        Seq("neighbor"))
      .withColumn("jaccard_ppm", Num.divLong(col("cooc") * 1000000L,
        col("n_brand") + col("n_neighbor") - col("cooc")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= ItemCfTopK)
      .select(col("brand"), col("rnk").cast("long").as("rnk"),
        col("neighbor"), col("cooc"), col("jaccard_ppm"))
      .orderBy(col("brand"), col("rnk"))
  }

  val itemcfOracle: String =
    s"""WITH ob AS (
       |  SELECT DISTINCT o.o_custkey AS cust, p.p_brand AS b
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |  JOIN part p ON l.l_partkey = p.p_partkey),
       |own AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM ob GROUP BY 1),
       |pairs AS (
       |  SELECT x.b AS brand, y.b AS neighbor,
       |    CAST(COUNT(*) AS BIGINT) AS cooc
       |  FROM ob x JOIN ob y ON x.cust = y.cust AND x.b <> y.b
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT p.brand, p.neighbor, p.cooc,
       |    p.cooc * 1000000 // (a.n + b.n - p.cooc) AS jaccard_ppm
       |  FROM pairs p
       |  JOIN own a ON a.b = p.brand
       |  JOIN own b ON b.b = p.neighbor),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY brand
       |    ORDER BY jaccard_ppm DESC, neighbor ASC) AS rnk FROM j)
       |SELECT brand, CAST(rnk AS BIGINT) AS rnk, neighbor, cooc, jaccard_ppm
       |FROM r WHERE rnk <= ${ItemCfTopK} ORDER BY brand, rnk""".stripMargin

  // ------------------------------------------------------------------
  // `q_assoc_rules` (X237): directional association rules
  // ------------------------------------------------------------------

  /** Rules retained (global top-k by confidence). */
  val RulesTopK = 20

  /** `q_assoc_rules`: association RULES — the directional artifact the
    * symmetric pair mining (X65) and neighbor lists (X228) cannot
    * express: "carts holding A take B with probability conf(A→B) =
    * supp(AB)/supp(A)", and conf(A→B) ≠ conf(B→A) is exactly the
    * asymmetry a recommender acts on (the niche item implies the staple;
    * the staple implies nothing). Confidence is exact integer per-mille
    * (the ranking key — ties broken on the rule id, never on a float);
    * lift rides along as the identically-ordered IEEE double both
    * engines compute (the X65 convention) flagging confident-but-
    * negatively-associated rules.
    *
    * Scale shape: one order-keyed pair fan-out (the X65 layout reused
    * verbatim — basket-bounded), a brand²-bounded rule aggregate,
    * broadcast marginals, and a TakeOrdered over the bounded rule
    * frame. */
  def assocRulesQ(spark: SparkSession, sfDir: String): DataFrame = {
    val ob = graft.engine.Materialize.diskBacked(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p_partkey"))
        .join(Tables.part(spark, sfDir)
          .select(col("p_partkey"), col("p_brand")), Seq("p_partkey"))
        .select(col("ok"), col("p_brand").as("b"))
        .repartition(col("ok"))
        .dropDuplicates("ok", "b"))
    // n_orders as a DRIVER scalar, brandCnt disk-backed: both marginal
    // frames fan into several join branches, and Spark has no cross-branch
    // subexpression reuse — the r16 before-plan shows the ob aggregate
    // subtrees inlined 5×, each re-reading the 555k-row cache. One count
    // job + one 25-row materialization compute each marginal exactly once.
    val nOrders = ob.select(col("ok")).distinct().count()
    val brandCnt = graft.engine.Materialize.diskBacked(
      ob.groupBy(col("b")).agg(Num.countStar.as("cnt")))
    ob.as("x").join(ob.as("y"),
        col("x.ok") === col("y.ok") && col("x.b") =!= col("y.b"))
      .groupBy(col("x.b").as("antecedent"), col("y.b").as("consequent"))
      .agg(Num.countStar.as("supp_ab"))
      .join(broadcast(brandCnt.select(col("b").as("antecedent"),
        col("cnt").as("supp_a"))), Seq("antecedent"))
      .join(broadcast(brandCnt.select(col("b").as("consequent"),
        col("cnt").as("supp_c"))), Seq("consequent"))
      .select(col("antecedent"), col("consequent"), col("supp_ab"),
        col("supp_a"),
        Num.divLong(col("supp_ab") * 1000L, col("supp_a")).as("conf_pm"),
        ((col("supp_ab").cast("double") * lit(nOrders).cast("double"))
          / (col("supp_a").cast("double") * col("supp_c").cast("double")))
          .as("lift"))
      .orderBy(col("conf_pm").desc, col("antecedent"), col("consequent"))
      .limit(RulesTopK)
  }

  val assocRulesOracle: String =
    s"""WITH ob AS (
       |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       |n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM ob),
       |bc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM ob GROUP BY 1),
       |rules AS (
       |  SELECT x.b AS antecedent, y.b AS consequent,
       |    CAST(COUNT(*) AS BIGINT) AS supp_ab
       |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.b <> y.b
       |  GROUP BY 1, 2)
       |SELECT antecedent, consequent, supp_ab, a.cnt AS supp_a,
       |  supp_ab * 1000 // a.cnt AS conf_pm,
       |  (CAST(supp_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
       |    / (CAST(a.cnt AS DOUBLE) * CAST(c.cnt AS DOUBLE)) AS lift
       |FROM rules
       |JOIN bc a ON a.b = antecedent
       |JOIN bc c ON c.b = consequent, n
       |ORDER BY conf_pm DESC, antecedent, consequent
       |LIMIT ${RulesTopK}""".stripMargin

  // ------------------------------------------------------------------
  // `q_itemsets3` (X186): Apriori level-3 frequent itemsets
  // ------------------------------------------------------------------

  /** Minimum support as an exact per-mille of baskets (1‰): the compare
    * is integer cross-multiplication, never a double ratio. */
  val Itemset3MinPermille = 1
  val Itemset3TopK = 20

  /** `q_itemsets3`: frequent brand TRIPLES by level-wise Apriori — the
    * step past X65's pair mining that makes the candidate-pruning
    * algebra visible. L2 = support-filtered pairs; candidate triples =
    * L2 ⋈ L2 on the shared first item (b < c) with the THIRD sub-pair
    * (b, c) membership-checked against L2 (the full Apriori property:
    * every subset of a frequent set is frequent); only candidate triples
    * are then counted against the baskets.
    *
    * Scale: the pruning order is the whole point — the basket fan-out
    * runs pair-first restricted to L2 members (broadcast semi-join, so
    * infrequent brands never enter the triple explode), the L2 ⋈ L2
    * candidate build is frequent-pairs-sized (brand-domain bounded, a
    * broadcast), and the triple count groups on a candidate-bounded key
    * set. Brute-forcing C(items,3) per basket instead is the shape that
    * dies at warehouse scale; the oracle MAY brute-force because Apriori
    * pruning is lossless, which is exactly what the gate proves. */
  def itemsets3Q(spark: SparkSession, sfDir: String): DataFrame = {
    val ob = graft.engine.Materialize.diskBacked(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p_partkey"))
        .join(Tables.part(spark, sfDir)
          .select(col("p_partkey"), col("p_brand")), Seq("p_partkey"))
        .select(col("ok"), col("p_brand").as("b"))
        .repartition(col("ok"))
        .dropDuplicates("ok", "b"))
    // n_orders as a DRIVER scalar: it was a 1-row frame crossJoined under
    // l2, and l2 feeds FOUR consumers (the candidate build's p and q legs,
    // the Apriori membership semi, and the basket-pair prefilter) — with
    // no cross-branch subexpression reuse every consumer re-ran the
    // 555k-row distinct+count (the r16 before-plan shows that aggregate
    // subtree 26×). One count job computes the same number once.
    val nOrders = ob.select(col("ok")).distinct().count()
    // The basket PAIR frame feeds both L2 (support filter) and the triple
    // extend — materialize it once (the ob self-join is the op's only
    // data-sized shuffle; round-9 bench caught the unfenced form running
    // it twice, 3.6 s → the fenced form halves the heavy work)
    val pairs = graft.engine.Materialize.diskBacked(
      ob.as("x").join(ob.as("y"),
          col("x.ok") === col("y.ok") && col("x.b") < col("y.b"))
        .select(col("x.ok").as("ok"), col("x.b").as("brand_a"),
          col("y.b").as("brand_b")))
    // L2: support-filtered pairs (brand-domain bounded) — disk-backed for
    // the same reason as n_orders: four consumers, so the unfenced form
    // re-aggregated the 900k-row pair cache per consumer.
    val l2 = graft.engine.Materialize.diskBacked(pairs
      .groupBy(col("brand_a").as("i1"), col("brand_b").as("i2"))
      .agg(Num.countStar.as("s2"))
      .filter(col("s2") * 1000 >= lit(nOrders * Itemset3MinPermille))
      .select(col("i1"), col("i2")))
    // candidate triples: {a,b} ⋈ {a,c}, b < c, with {b,c} ∈ L2 (Apriori)
    val cand = l2.as("p").join(l2.as("q"),
        col("p.i1") === col("q.i1") && col("p.i2") < col("q.i2"))
      .select(col("p.i1").as("brand_a"), col("p.i2").as("brand_b"),
        col("q.i2").as("brand_c"))
      .join(l2.select(col("i1").as("brand_b"), col("i2").as("brand_c")),
        Seq("brand_b", "brand_c"), "left_semi")
    // count ONLY candidate triples: pair step semi-joins L2 first so
    // infrequent brands never fan out, then extend by one item
    val pairsL2 = pairs
      .join(broadcast(l2.select(col("i1").as("brand_a"),
        col("i2").as("brand_b"))), Seq("brand_a", "brand_b"), "left_semi")
    pairsL2
      .join(ob.select(col("ok"), col("b").as("brand_c")), Seq("ok"))
      .filter(col("brand_c") > col("brand_b"))
      .join(broadcast(cand), Seq("brand_a", "brand_b", "brand_c"), "left_semi")
      .groupBy(col("brand_a"), col("brand_b"), col("brand_c"))
      .agg(Num.countStar.as("support"))
      .filter(col("support") * 1000 >= lit(nOrders * Itemset3MinPermille))
      .select(col("brand_a"), col("brand_b"), col("brand_c"), col("support"))
      .orderBy(col("support").desc, col("brand_a"), col("brand_b"),
        col("brand_c"))
      .limit(Itemset3TopK)
  }

  /** Oracle: Apriori pruning is lossless, so the spec is the brute-force
    * triple join with the same integer support gate. */
  val itemsets3Oracle: String =
    s"""WITH ob AS (
       |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       |n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM ob),
       |tri AS (
       |  SELECT x.b AS brand_a, y.b AS brand_b, z.b AS brand_c,
       |    CAST(COUNT(*) AS BIGINT) AS support
       |  FROM ob x
       |  JOIN ob y ON x.ok = y.ok AND x.b < y.b
       |  JOIN ob z ON y.ok = z.ok AND y.b < z.b
       |  GROUP BY 1, 2, 3)
       |SELECT brand_a, brand_b, brand_c, support
       |FROM tri, n
       |WHERE support * 1000 >= n_orders * ${Itemset3MinPermille}
       |ORDER BY support DESC, brand_a, brand_b, brand_c
       |LIMIT ${Itemset3TopK}""".stripMargin

  /** `q_unpivot`: UNPIVOT/melt — the inverse of `q_pivot` and the other
    * half of the reshape pair: a wide per-returnflag metrics row (3
    * aggregates) melts to long (flag, metric, value) form via the native
    * `Dataset.unpivot` operator — the shape metric stores and chart
    * layers ingest.
    *
    * Plan: one two-phase aggregate builds the wide frame (flags-bounded),
    * then unpivot is a narrow Expand projection (×metrics) over that tiny
    * frame — the row multiplication happens AFTER aggregation, so it costs
    * |flags|·|metrics| rows, not |data|·|metrics|. */
  def unpivotQ(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
        Num.countStar.as("n_rows"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("n_rows"), col("n_parts")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  val unpivotOracle: String =
    """WITH w AS (
      |  SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |    COUNT(*) AS n_rows,
      |    CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
      |UNION ALL
      |SELECT l_returnflag, 'n_rows', n_rows FROM w
      |UNION ALL
      |SELECT l_returnflag, 'n_parts', n_parts FROM w
      |ORDER BY l_returnflag, metric""".stripMargin

  /** X106 `q_grouping_sets`: arbitrary GROUPING SETS — the general form
    * behind X19's ROLLUP and X39's CUBE, for reports that want chosen
    * aggregation levels rather than a full lattice: here (type, day),
    * (type), and the grand total, but NOT the (day)-only marginal a CUBE
    * would force (on a 100 TB firehose that skipped marginal is real
    * work). One pass: Expand replicates each input row once per matching
    * set BEFORE the partial aggregate, so the shuffle carries
    * |sets| × |groups| partial rows, never |sets| × |data| (the X89
    * discipline). Subtotal rows surface through the standard NULL-fill,
    * re-labeled '(all)' — the harness columns are never themselves NULL,
    * so the sentinel is unambiguous and hash-stable cross-engine. */
  def groupingSetsQ(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        floor(col("value")).cast("long").as("v"))
      .groupingSets(
        Seq(Seq(col("event_type"), col("day")), Seq(col("event_type")), Seq()),
        col("event_type"), col("day"))
      .agg(Num.countStar.as("n_events"), sum(col("v")).as("sum_floor_value"))
      .select(coalesce(col("event_type"), lit("(all)")).as("event_type"),
        coalesce(col("day"), lit("(all)")).as("day"),
        col("n_events"), col("sum_floor_value"))
      .orderBy(col("event_type"), col("day"))
  }

  val groupingSetsOracle: String =
    """SELECT COALESCE(event_type, '(all)') AS event_type,
      |  COALESCE(strftime(ts, '%Y-%m-%d'), '(all)') AS day,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value
      |FROM events
      |GROUP BY GROUPING SETS ((event_type, strftime(ts, '%Y-%m-%d')),
      |                        (event_type), ())
      |ORDER BY event_type, day""".stripMargin

  /** MV refresh split point: history strictly before, delta on/after. */
  val IvmSplitDate = "2024-01-25"

  /** `q_ivm_refresh`: incremental materialized-view maintenance — the
    * nightly pattern that makes a 100 TB rollup affordable: the stored MV
    * holds ALGEBRAIC partial aggregates (count + exact DECIMAL sum, both
    * mergeable), a delta batch aggregates alone, and refresh is a
    * key-level merge of the two — the history rows are never rescanned.
    * The gate proves the whole point: the oracle is a FULL recompute over
    * all events, and the hash must match, so merge(base, delta) ≡
    * recompute exactly (decimal addition is associative; the cast to
    * double happens only at emission, never inside the stored state).
    *
    * Scale shape: the MV stays partitioned by its group key; the delta
    * aggregate is days-bounded and tiny relative to the MV; the merge is
    * one full-outer join on the group key (null-safe, so null-keyed
    * groups merge too, and full-outer because either side can hold keys
    * the other lacks). An all-null-valued group must stay NULL after the
    * merge (as a recompute would report it), hence the both-null guard
    * rather than a bare coalesce-to-zero. */
  def ivmRefreshQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
    val split = lit(IvmSplitDate).cast("date")
    def aggOf(df: DataFrame): DataFrame =
      df.groupBy(col("event_type"), col("day"))
        .agg(Num.countStar.as("n"),
          sum(col("value").cast(DecimalType(18, 2))).as("s"))
    // the stored MV: materialized partial aggregates over history only.
    // The split must PARTITION the rows: a bare `day < split` silently
    // drops null-day rows from both sides (NULL comparisons are neither
    // true nor false), so nulls are routed explicitly to the base side —
    // a recompute-oracle group must come from exactly one of the inputs.
    val base = graft.engine.Materialize.diskBacked(
      aggOf(ev.filter(col("day") < split || col("day").isNull)))
    val delta = aggOf(ev.filter(col("day") >= split))
    base.as("b").join(delta.as("d"),
        col("b.event_type") <=> col("d.event_type") &&
          col("b.day") <=> col("d.day"),
        "full_outer")
      .select(
        coalesce(col("b.event_type"), col("d.event_type")).as("event_type"),
        date_format(coalesce(col("b.day"), col("d.day")), "yyyy-MM-dd")
          .as("day"),
        (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L)))
          .as("n_events"),
        when(col("b.s").isNull && col("d.s").isNull, lit(null))
          .otherwise(coalesce(col("b.s"), lit(0)) + coalesce(col("d.s"), lit(0)))
          .cast("double").as("sum_value"))
      .orderBy(col("event_type"), col("day"))
  }

  val ivmRefreshOracle: String =
    """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2
      |ORDER BY event_type, day""".stripMargin

  // `q_above_avg`: correlated-subquery decorrelation

  /** `q_above_avg`: "customers above their own nation's average balance"
    * — the canonical CORRELATED scalar subquery (`WHERE c_acctbal >
    * (SELECT AVG(...) WHERE same nation)`), re-expressed the way an
    * engine must run it at scale: decorrelate to one per-nation
    * aggregate joined back (A5 `q_scalar_subquery` covers the
    * UNcorrelated form; this is the correlated half of that SQL
    * surface). The comparison clears the division — c_cents·n >
    * sum_cents — so the "above average" predicate is EXACT integer
    * arithmetic, immune to both engines' avg() rounding.
    *
    * Scale shape: one nation-keyed fold (≤25 rows) broadcast back onto
    * the customer scan, then a nation-keyed report fold. The dimension
    * join for names is a second broadcast. */
  def aboveAvgQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cents = (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), cents.as("cents"))
    val natAvg = cust.groupBy(col("c_nationkey"))
      .agg(Num.countStar.as("n"),
        sum(col("cents").cast(DecimalType(38, 0))).as("sum_cents"))
    cust.join(broadcast(natAvg), Seq("c_nationkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(max(col("n")).as("n_customers"),
        sum(when(col("cents").cast(DecimalType(38, 0)) * col("n")
          > col("sum_cents"), 1L).otherwise(0L)).as("n_above_avg"))
      .orderBy(col("n_name"))
  }

  val aboveAvgOracle: String =
    """WITH cust AS (
      |  SELECT c_nationkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM customer),
      |na AS (
      |  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0))
      |      AS sum_cents
      |  FROM cust GROUP BY 1)
      |SELECT n_name, MAX(n) AS n_customers,
      |  CAST(SUM(CASE WHEN CAST(cents AS DECIMAL(38,0)) * n > sum_cents
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_above_avg
      |FROM cust
      |JOIN na USING (c_nationkey)
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY n_name""".stripMargin

  // `q_mode`: deterministic modal value per group

  /** `q_mode`: the most frequent (floored) value per event type with a
    * PINNED tie-break (smallest value wins) — engines' `mode()` builtins
    * leave ties implementation-defined, so the deterministic form is the
    * histogram argmax both engines state explicitly. Report carries the
    * modal count and its share of the group as one closing division.
    *
    * Scale shape: the X22 histogram fold, then the argmax is a per-group
    * min-over-filtered-window on the bounded value domain. */
  def modeQ(spark: SparkSession, sfDir: String): DataFrame = {
    val v = floor(col("value")).cast("long")
    val all = Window.partitionBy(col("event_type"))
    Tables.events(spark, sfDir)
      .select(col("event_type"), v.as("v"))
      .groupBy(col("event_type"), col("v"))
      .agg(Num.countStar.as("cnt"))
      .withColumn("m", max(col("cnt")).over(all))
      .withColumn("n", sum(col("cnt")).over(all))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_events"),
        min(when(col("cnt") === col("m"), col("v"))).as("mode_v"),
        max(col("m")).as("mode_count"))
      .withColumn("mode_share",
        col("mode_count").cast("double") / col("n_events").cast("double"))
      .orderBy(col("event_type"))
  }

  val modeOracle: String =
    """WITH h AS (
      |  SELECT event_type, CAST(floor(value) AS BIGINT) AS v,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, v, cnt,
      |    MAX(cnt) OVER (PARTITION BY event_type) AS m,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM h)
      |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
      |  MIN(CASE WHEN cnt = m THEN v END) AS mode_v,
      |  CAST(MAX(m) AS BIGINT) AS mode_count,
      |  CAST(MAX(m) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS mode_share
      |FROM w GROUP BY 1 ORDER BY event_type""".stripMargin

  // `q_string_agg`: ordered, bounded list aggregation

  /** Names kept per group in the `q_string_agg` roster. */
  val StringAggTopN = 5

  /** `q_string_agg`: LISTAGG / string_agg with DETERMINISTIC order and a
    * BOUNDED prefix — the roster report (first-N members alphabetically,
    * joined into one cell). Unordered string_agg is nondeterministic
    * under parallel aggregation, and unbounded agg strings grow with the
    * data; sort_array over collect_list + slice pins both: per-group
    * state is the member set (collected only at nation cardinality ≤
    * group membership), the emitted cell is the fixed-N prefix.
    *
    * Scale note: collect_list state is group-membership-sized; for the
    * customer-per-nation roster that is the fan-out a roster REPORT
    * inherently needs. At unbounded group sizes the bounded prefix
    * should push down (a per-group top-N heap before the collect) —
    * here the window rank does exactly that BEFORE collecting. */
  def stringAggQ(spark: SparkSession, sfDir: String): DataFrame = {
    val byName = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_name"))
    Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_name"))
      .withColumn("rk", row_number().over(byName))
      .filter(col("rk") <= StringAggTopN)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(Num.countStar.as("n_listed"),
        concat_ws(",", array_sort(collect_list(col("c_name"))))
          .as("roster"))
      .orderBy(col("n_name"))
  }

  val stringAggOracle: String =
    s"""WITH r AS (
       |  SELECT c_nationkey, c_name,
       |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_name)
       |      AS rk
       |  FROM customer)
       |SELECT n_name, COUNT(*) AS n_listed,
       |  array_to_string(list_sort(list(c_name)), ',') AS roster
       |FROM r JOIN nation ON c_nationkey = n_nationkey
       |WHERE rk <= ${StringAggTopN}
       |GROUP BY 1 ORDER BY n_name""".stripMargin

  // `q_trend_movers`: period-over-period demand shift top-k

  /** Movers reported. */
  val TrendTopK = 20

  /** `q_trend_movers`: the parts whose shipped quantity shifted most
    * between two halves of the order history — the "what's trending"
    * report beside X149's distribution-level TVD: TVD says THAT the mix
    * moved, this says WHICH items moved it. Period comes from the order
    * date, so the shape is the engine's standard fact⋈fact co-partitioned
    * equi-join (lineitem⋈orders on orderkey — only the date column rides
    * the shuffle), folded straight to the (part, period) quantity matrix
    * via conditional sums (one part-keyed aggregate, no pivot exec).
    * Quantities are integer-valued doubles (exact at any summation order
    * below 2^53); the top-k by absolute delta is a TakeOrdered heap with
    * a pinned partkey tie-break, never a catalog sort. */
  def trendMoversQ(spark: SparkSession, sfDir: String): DataFrame = {
    val isA = col("o_orderdate") <
      lit(graft.operators.Stats.TvdSplitDate).cast("timestamp")
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), isA.as("is_a")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_partkey"))
      .agg(
        sum(when(col("is_a"), col("l_quantity")).otherwise(0.0))
          .cast("long").as("qty_a"),
        sum(when(!col("is_a"), col("l_quantity")).otherwise(0.0))
          .cast("long").as("qty_b"))
      .withColumn("delta", col("qty_b") - col("qty_a"))
      .orderBy(abs(col("delta")).desc, col("l_partkey").asc)
      .limit(TrendTopK)
      .orderBy(col("delta").desc, col("l_partkey").asc)
  }

  val trendMoversOracle: String =
    s"""WITH m AS (
       |  SELECT l_partkey,
       |    CAST(SUM(CASE WHEN o_orderdate
       |        < TIMESTAMP '${graft.operators.Stats.TvdSplitDate} 00:00:00'
       |      THEN l_quantity ELSE 0 END) AS BIGINT) AS qty_a,
       |    CAST(SUM(CASE WHEN o_orderdate
       |        < TIMESTAMP '${graft.operators.Stats.TvdSplitDate} 00:00:00'
       |      THEN 0 ELSE l_quantity END) AS BIGINT) AS qty_b
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1),
       |t AS (
       |  SELECT l_partkey, qty_a, qty_b, qty_b - qty_a AS delta FROM m
       |  ORDER BY ABS(qty_b - qty_a) DESC, l_partkey
       |  LIMIT ${TrendTopK})
       |SELECT * FROM t ORDER BY delta DESC, l_partkey""".stripMargin
}
