package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.{Materialize, Num, Tables}

/** Graph analytics over relationship tables (SURVEY.md §2.11). Second
  * iterative-fixpoint operator family beside X45's connected components
  * (`Dedup.dedupClustersQ`): where CC propagates min-labels to a fixpoint,
  * PageRank propagates rank MASS a fixed number of rounds — the
  * importance-scoring pass a curation pipeline runs over citation / link /
  * co-occurrence graphs to weight documents before sampling.
  *
  * Scale shape per iteration: ranks join edges on src (both sides
  * hash-partitioned on src; the edge table is materialized once and its
  * partitioning reused every round), contributions aggregate on dst —
  * exactly two shuffles of (node, value) longs per round, never the raw
  * input table. The iteration count is FIXED (power-method truncation), so
  * unlike CC there is no convergence probe — the plan is 3 identical
  * stages, pipelined by the scheduler.
  *
  * Cross-engine determinism: per-edge contributions are quantized to 1e-12
  * (`floor(x*1e12+0.5)` — identical single-rounded IEEE ops both engines)
  * and summed as DECIMAL — associative and exact, so the per-dst sum is
  * independent of Spark's partial-aggregation split, the same trick as
  * X30's centroid means. The damping update is then one pinned-order
  * double expression. The oracle unrolls the same three rounds in SQL.
  */
object Graph {

  /** Fixed power-method rounds (truncation, not convergence — see above). */
  val PrIters = 3
  /** Top-k nodes reported. */
  val PrTopK = 50
  /** Contribution quantum: 1e-12 of rank mass (exact in DECIMAL sums). */
  val PrQuantSql = "1e12"

  /** Pair-count threshold below which the power method runs in a single
    * task — the same size-adaptive switch as `Dedup.connectedComponents`,
    * and for the same reason: the quantized rounds are bit-reproducible in
    * either engine, and on a small co-occurrence graph the distributed
    * path's cost is all scheduling (per-round shuffles of tiny frames),
    * not compute. 5M undirected pairs = 10M directed edges ≈ 160 MB of
    * longs plus the rank/degree tables: one executor's working set. */
  val LocalPrMaxPairs: Long = 5000000L

  /** `q_pagerank`: damped PageRank (d=0.85) over the symmetric
    * part↔supplier co-occurrence graph from `lineitem` (part nodes = 2k,
    * supplier nodes = 2k+1 — disjoint id spaces). Symmetry means every
    * node has out-edges, so no dangling-mass redistribution is needed and
    * rank mass is conserved up to quantization. */
  def pagerankQ(spark: SparkSession, sfDir: String): DataFrame =
    pagerank(spark,
      Tables.lineitem(spark, sfDir)
        .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct(),
      LocalPrMaxPairs)
      .orderBy(col("r").desc, col("node").asc).limit(PrTopK)
      .select(col("node"), col("r"))

  /** `PrIters` quantized power-method rounds over the symmetric closure of
    * an undirected pair set; returns the full (node, r) rank vector.
    * Size-adaptive like `Dedup.connectedComponents`: single-task iteration
    * under `localMaxPairs` pairs, the distributed two-shuffles-per-round
    * dataflow above it. Both paths apply the SAME single-rounded IEEE ops
    * in the same order (quantize → exact integer sum → damp), so they are
    * bit-identical — GraphSpec pins the equivalence by forcing each. */
  private[graft] def pagerank(
      spark: SparkSession, pairsIn: DataFrame,
      localMaxPairs: Long): DataFrame = {
    // pairs feeds BOTH union sides of the symmetric edge set — materialized
    // once so the upstream distinct doesn't run twice (and the count that
    // picks the path is read off the same materialization).
    val (pairs, nPairs) = Materialize.diskBackedWithCount(pairsIn)
    if (nPairs <= localMaxPairs) localPagerank(spark, pairs)
    else distributedPagerank(spark, pairs)
  }

  /** Single-task quantized power method (the ≤-threshold path). Mirrors
    * the distributed path's arithmetic exactly: contributions are
    * `floor(r/outdeg * 1e12 + 0.5)` as a Long (the engine's DECIMAL(28,0)
    * sum is exact and total mass ≤ ~1e12, so Long cannot overflow), and
    * the damping update reuses the engine's `a + b*c` evaluation order. */
  private def localPagerank(spark: SparkSession, pairs: DataFrame): DataFrame = {
    import spark.implicits._
    import graft.engine.Primitives
    import java.lang.Double.{doubleToRawLongBits, longBitsToDouble}
    pairs.select(col("a"), col("b")).as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        // primitive arrays/maps only — edge-proportional boxed collections
        // would multiply the working set the threshold budget is based on
        val sb = new scala.collection.mutable.ArrayBuilder.ofLong
        val db = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { case (a, b) =>
          sb += a; db += b
          sb += b; db += a
        }
        val srcs = sb.result(); val dsts = db.result()
        val outdeg = new Primitives.LongLongMap()
        var i = 0
        while (i < srcs.length) { outdeg.addTo(srcs(i), 1L); i += 1 }
        val n = outdeg.size.toDouble
        // rank doubles ride the long map bit-exactly via raw-bits casts
        var ranks = new Primitives.LongLongMap(outdeg.size)
        outdeg.foreachEntry((k, _) =>
          ranks(k) = doubleToRawLongBits(1.0 / n))
        var round = 0
        while (round < PrIters) {
          val qsum = new Primitives.LongLongMap(outdeg.size)
          var j = 0
          while (j < srcs.length) {
            val qc = math.floor(
              longBitsToDouble(ranks(srcs(j))) / outdeg(srcs(j)) * 1e12 + 0.5)
              .toLong
            qsum.addTo(dsts(j), qc)
            j += 1
          }
          val next = new Primitives.LongLongMap(outdeg.size)
          qsum.foreachEntry { (node, q) =>
            next(node) = doubleToRawLongBits(0.15 / n + 0.85 * (q.toDouble / 1e12))
          }
          ranks = next
          round += 1
        }
        ranks.iterator.map { case (k, bits) => (k, longBitsToDouble(bits)) }
      }
      .toDF("node", "r")
  }

  /** Distributed power method (the above-threshold path). */
  private def distributedPagerank(spark: SparkSession, pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    // The out-degree joins EVERY round, so it is pre-joined onto the edge
    // table ONCE and the result persisted PRE-PARTITIONED on src: the
    // cached relation keeps its HashPartitioning, so each round's
    // edge ⋈ ranks join shuffles only the node-sized rank vector, never
    // the edge table — the exact partition-reuse discipline a
    // 1000-executor pagerank lives by. The rounds themselves stay LAZY —
    // ranks is consumed exactly once per round (fixed iteration count, no
    // convergence probe), so the whole propagation is one linear plan
    // executed as one job, with no per-round action barrier (that barrier
    // is what CC pays for its fixpoint check; a truncated power method
    // doesn't need it).
    //
    // deg doubles as the NODE SET (its keys are exactly the nodes: the
    // graph is symmetric, so src values cover every endpoint) — one
    // node-sized materialization instead of separate edges + nodes caches.
    val deg = Materialize.diskBacked(
      edges.groupBy(col("src")).agg(Num.countStar.as("outdeg")))
    val edgesDeg = Materialize.diskBacked(
      edges.join(deg, Seq("src")).repartition(col("src")))
    val nRow = deg.agg(Num.countStar.cast("double").as("n"))
    var ranks = deg.crossJoin(broadcast(nRow))
      .select(col("src").as("node"), (lit(1.0) / col("n")).as("r"))
    for (_ <- 1 to PrIters) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          floor(col("r") / col("outdeg") * lit(1e12) + lit(0.5))
            .cast(DecimalType(28, 0)).as("qc"))
        .groupBy(col("node")).agg(sum(col("qc")).as("qsum"))
      // No resurrection join against the node set: symmetry gives every
      // node in-degree ≥ 1, so contrib's key set IS the node set and the
      // damping update is a pure projection (the left-join the general
      // algorithm needs only revives zero-in-degree nodes, which this
      // graph cannot have).
      ranks = contrib
        .crossJoin(broadcast(nRow))
        .select(col("node"),
          (lit(0.15) / col("n") + lit(0.85) *
            (col("qsum").cast("double") / lit(1e12))).as("r"))
    }
    ranks
  }

  val pagerankOracle: String = {
    // one propagation round: ranks CTE `rin` -> new ranks CTE named `rout`
    def round(rin: String, rout: String): String =
      s"""c_$rout AS (
         |  SELECT e.dst AS node,
         |    SUM(CAST(FLOOR(r.r / d.outdeg * $PrQuantSql + CAST(0.5 AS DOUBLE))
         |             AS DECIMAL(28,0))) AS qsum
         |  FROM edges e
         |  JOIN $rin r ON e.src = r.node
         |  JOIN deg d ON e.src = d.src
         |  GROUP BY 1),
         |$rout AS (
         |  SELECT n.node,
         |    CAST(0.15 AS DOUBLE) / (SELECT n FROM nn) + CAST(0.85 AS DOUBLE)
         |      * (COALESCE(CAST(c.qsum AS DOUBLE), 0) / $PrQuantSql) AS r
         |  FROM nodes n LEFT JOIN c_$rout c ON n.node = c.node)""".stripMargin
    val rounds = (1 to PrIters)
      .map(i => round(if (i == 1) "r0" else s"r${i - 1}", s"r$i"))
      .mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
       |  FROM lineitem),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL
       |  SELECT b AS src, a AS dst FROM pairs),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
       |        FROM edges GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       |r0 AS (
       |  SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS r
       |  FROM nodes),
       |$rounds
       |SELECT node, r FROM r$PrIters
       |ORDER BY r DESC, node ASC LIMIT $PrTopK""".stripMargin
  }

  /** Supplier panel: every 1/TriPanelMod-th supplier (keeps the
    * co-occurrence subgraph dense enough for triangles at every SF while
    * bounding wedge cost). */
  val TriPanelMod = 3
  /** Top-k nodes reported by triangle participation. */
  val TriTopK = 20

  /** `q_triangles`: exact triangle counting over the supplier
    * co-occurrence graph (suppliers co-supplying an order, panel-sampled
    * 1-in-TriPanelMod) — the clustering-structure primitive for community
    * detection / graph curation, third graph operator beside X45's
    * connected components and X53's PageRank.
    *
    * The scale algorithm is degree orientation: every undirected edge
    * points from its lower-(degree, id) endpoint to the higher one, which
    * makes the oriented out-degree O(√m) on ANY graph — so wedge
    * generation (the only superlinear step, Σ C(outdeg⁺,2)) is bounded
    * regardless of hub skew, and each triangle is found exactly once (its
    * orientation-minimal corner). Dataflow: oriented edges self-join on
    * the wedge apex (shuffle on node longs), then one equi-join probes the
    * closing edge — hash joins end to end, no products, counts exact.
    *
    * Edge derivation is itself bounded: per-order supplier pairs fan out
    * quadratically in lineitems-per-order, which TPC-H-shape caps at ~7
    * (real pipelines cap the group or df-filter it like X15's postings). */
  def trianglesQ(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_suppkey") % TriPanelMod === 0)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s"))
      .distinct()
    val raw = li.as("a").join(li.as("b"), col("a.ok") === col("b.ok"))
      .filter(col("a.s") < col("b.s"))
      .select(col("a.s").as("u"), col("b.s").as("v"))
      .distinct()
    triangleCounts(raw)
      .orderBy(col("n_tri").desc, col("node").asc)
      .limit(TriTopK)
  }

  /** Edge-count threshold for the single-task triangle path — the same
    * size-adaptive switch as `pagerank`/`Dedup.connectedComponents`.
    * Triangle counts are exact integers on both paths, so the switch is
    * purely a scheduling decision: below it, one task replaces three
    * materializations plus a self-join pipeline. */
  val LocalTriMaxEdges: Long = 5000000L

  /** Core: per-node triangle participation counts over a canonical
    * (u < v) undirected edge frame. Unit-tested on known graphs. */
  def triangleCounts(rawEdges: DataFrame): DataFrame =
    triangleCounts(rawEdges, LocalTriMaxEdges)

  /** Size-adaptive dispatch (GraphSpec forces each path on known graphs). */
  private[graft] def triangleCounts(
      rawEdges: DataFrame, localMaxEdges: Long): DataFrame = {
    // canonical undirected edge set (u < v) — feeds degree counting,
    // orientation, AND the closing-edge probe, so it is materialized once
    // (and the path-picking count reads off the same materialization)
    val (edges, nEdges) = Materialize.diskBackedWithCount(rawEdges)
    if (nEdges <= localMaxEdges) localTriangles(edges)
    else distributedTriangles(edges)
  }

  /** Single-task degree-oriented triangle counting (the ≤-threshold path):
    * the same algorithm as the distributed dataflow — orient each edge
    * from its lower-(degree, id) endpoint, enumerate wedges at the
    * orientation apex, probe the canonical edge set for the closing edge —
    * so each triangle is found exactly once at its orientation-minimal
    * corner, identically to the join pipeline. */
  private def localTriangles(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    import graft.engine.Primitives
    edges.select(col("u"), col("v")).as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        // primitive parallel arrays end to end: sorted canonical edges give
        // binary-searchable closure membership, sorted oriented edges give
        // contiguous per-apex runs — no boxed tuples/sets at edge scale
        val ub = new scala.collection.mutable.ArrayBuilder.ofLong
        val vb = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { case (u, v) => ub += u; vb += v }
        val us = ub.result(); val vs = vb.result()
        val deg = new Primitives.LongLongMap()
        var i = 0
        while (i < us.length) {
          deg.addTo(us(i), 1L); deg.addTo(vs(i), 1L); i += 1
        }
        val os = new Array[Long](us.length)
        val od = new Array[Long](us.length)
        i = 0
        while (i < us.length) {
          val u = us(i); val v = vs(i)
          val uFirst = deg(u) < deg(v) || (deg(u) == deg(v) && u < v)
          os(i) = if (uFirst) u else v
          od(i) = if (uFirst) v else u
          i += 1
        }
        Primitives.sortPairs(us, vs) // canonical (u<v) membership order
        Primitives.sortPairs(os, od) // apex-grouped, dsts ascending per run
        val nTri = new Primitives.LongLongMap()
        var runStart = 0
        while (runStart < os.length) {
          var runEnd = runStart + 1
          while (runEnd < os.length && os(runEnd) == os(runStart)) runEnd += 1
          var j = runStart
          while (j < runEnd) {
            var k = j + 1
            while (k < runEnd) {
              // run sorted by dst and edges distinct → od(j) < od(k)
              if (Primitives.containsPair(us, vs, od(j), od(k))) {
                nTri.addTo(os(runStart), 1L)
                nTri.addTo(od(j), 1L)
                nTri.addTo(od(k), 1L)
              }
              k += 1
            }
            j += 1
          }
          runStart = runEnd
        }
        nTri.iterator
      }
      .toDF("node", "n_tri")
  }

  /** Distributed degree-oriented triangle counting (above-threshold). */
  private def distributedTriangles(edges: DataFrame): DataFrame = {
    // orientation rank = (degree, id): lower endpoint -> higher endpoint.
    // deg is node-sized and MATERIALIZED so the cache's accurate size
    // statistics let Catalyst pick broadcast joins for the two orientation
    // lookups when the node set is small (the un-cached aggregate's
    // estimate is too pessimistic to broadcast) — while staying a plain
    // shuffle join when a billion-node graph makes broadcast impossible.
    val deg = Materialize.diskBacked(
      edges.select(col("u").as("n")).unionAll(edges.select(col("v")))
        .groupBy(col("n")).agg(count(lit(1)).as("d")))
    val ranked = edges
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
    // Pre-partitioned on the wedge apex before caching: InMemoryRelation
    // preserves the HashPartitioning, so NEITHER side of the self-join
    // below needs an exchange (same discipline as pagerank's edgesDeg).
    val oriented = Materialize.diskBacked(ranked.select(
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")), col("u"))
        .otherwise(col("v")).as("src"),
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")), col("v"))
        .otherwise(col("u")).as("dst"))
      .repartition(col("src")))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.src") === col("e2.src"))
      .filter(col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"),
        col("e2.dst").as("c"))
    // closing-edge probe: wedges carry b < c and the undirected edge set
    // is canonical u < v, so closure is a pure EQUI semi-join (an OR-form
    // "either direction" probe would degrade to a nested loop)
    val tris = wedges.join(edges,
      col("b") === col("u") && col("c") === col("v"), "left_semi")
    tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  val trianglesOracle: String =
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
       |  WHERE l_suppkey % ${TriPanelMod} = 0),
       |edges AS (
       |  SELECT DISTINCT a.s AS u, b.s AS v
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.s < b.s),
       |deg AS (
       |  SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
       |    SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
       |  GROUP BY 1),
       |oriented AS (
       |  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
       |              THEN e.u ELSE e.v END AS src,
       |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
       |              THEN e.v ELSE e.u END AS dst
       |  FROM edges e
       |  JOIN deg du ON e.u = du.n
       |  JOIN deg dv ON e.v = dv.n),
       |wedges AS (
       |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
       |  FROM oriented e1 JOIN oriented e2
       |    ON e1.src = e2.src AND e1.dst < e2.dst),
       |tris AS (
       |  SELECT w.a, w.b, w.c FROM wedges w
       |  WHERE EXISTS (SELECT 1 FROM edges o
       |    WHERE o.u = w.b AND o.v = w.c))
       |SELECT node, COUNT(*) AS n_tri FROM (
       |  SELECT a AS node FROM tris
       |  UNION ALL SELECT b FROM tris
       |  UNION ALL SELECT c FROM tris)
       |GROUP BY 1 ORDER BY n_tri DESC, node ASC LIMIT ${TriTopK}""".stripMargin

  /** X124 `q_degree_dist`: degree distribution of the part↔supplier
    * co-occurrence graph, split by node side — the first diagnostic run
    * on any production graph (hub detection, skew sizing for the
    * iterative ops above, power-law sanity check). Two bounded
    * aggregates: degree per node (map-side combined on the symmetric
    * edge stream), then nodes per (side, degree) — output is
    * |distinct degrees|-sized, never node-sized, so the report holds at
    * any graph scale. Shares the X44/X46 edge definition, so its hub
    * counts directly size those operators' skew handling. */
  def degreeDistQ(spark: SparkSession, sfDir: String): DataFrame = {
    // Both endpoints come off the distinct frame via ONE explode — a
    // two-branch union would make the pair distinct a two-consumer
    // subtree and run the lineitem scan + shuffle twice (and a
    // materialization to dodge that costs more than the recompute here).
    val ends = Tables.lineitem(spark, sfDir)
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
      .select(explode(array(col("a"), col("b"))).as("node"))
    ends.groupBy(col("node"))
      .agg(Num.countStar.as("deg"))
      .groupBy((col("node") % 2 === 0).as("is_part"), col("deg"))
      .agg(Num.countStar.as("n_nodes"))
      .orderBy(col("is_part"), col("deg"))
  }

  val degreeDistOracle: String =
    """WITH pairs AS (
      |  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
      |  FROM lineitem),
      |ends AS (SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs),
      |deg AS (SELECT node, COUNT(*) AS deg FROM ends GROUP BY 1)
      |SELECT node % 2 = 0 AS is_part, deg, COUNT(*) AS n_nodes
      |FROM deg GROUP BY 1, 2 ORDER BY is_part, deg""".stripMargin

  // `q_bfs_levels`: breadth-first reach frontier

  /** Fixed BFS radius (hop truncation, like PrIters — no convergence
    * probe; the plan is MaxHops identical stages). */
  val BfsMaxHops = 3

  /** `q_bfs_levels`: hop-distance histogram from a seed node over the
    * part↔supplier graph — the reachability probe (is the graph one
    * blob? how fast does a neighborhood saturate?) run before committing
    * to diameter-sensitive algorithms like X45's label propagation.
    * Min-hop semantics: a node's level is its FIRST reach.
    *
    * Size-adaptive like CC/PageRank/HITS: single-task array BFS under
    * `LocalPrMaxPairs` undirected pairs, the distributed frontier
    * dataflow above it (GraphSpec pins the equivalence). Distributed
    * scale shape per round: frontier ⋈ edges on src (the frontier is the
    * small side every round), minus already-visited via left_anti, then
    * distinct — all equi-joins on node ids; the raw table never re-enters
    * after the edge projection. The frontier AND the visited set
    * materialize each round (each feeds two consumers — an unfenced
    * frontier_k lineage contains frontier_{k-1} contains ... and the
    * expansion recomputes ~2^hop times). The seed is the min part id,
    * computed in-plan as a 1-row broadcast, never collect()ed. The
    * oracle is the same fixpoint as a recursive CTE with per-iteration
    * dedup. */
  def bfsLevelsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, sfDir)
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val seed = Tables.lineitem(spark, sfDir)
      .agg((min(col("l_partkey")) * 2).as("node"))
    bfsLevels(spark, pairs, seed, LocalPrMaxPairs)
      .groupBy(col("lvl")).agg(Num.countStar.as("n_nodes"))
      .orderBy(col("lvl"))
  }

  /** Min-hop (node, lvl) reach set within `BfsMaxHops` of the 1-row
    * `seed` frame, over the symmetric closure of directed (src, dst)
    * pairs. Size-adaptive: single-task array BFS under `localMaxPairs`
    * pairs, frontier-join rounds above it. */
  private[graft] def bfsLevels(
      spark: SparkSession, pairsIn: DataFrame, seed: DataFrame,
      localMaxPairs: Long): DataFrame = {
    val (pairs, nPairs) = Materialize.diskBackedWithCount(pairsIn)
    if (nPairs <= localMaxPairs) localBfs(spark, pairs, seed)
    else distributedBfs(spark, pairs, seed)
  }

  /** Single-task BFS (the ≤-threshold path): one pass builds primitive
    * adjacency via sorted parallel arrays, then `BfsMaxHops` frontier
    * sweeps — identical min-hop semantics to the distributed rounds. */
  private def localBfs(
      spark: SparkSession, pairs: DataFrame, seed: DataFrame): DataFrame = {
    import spark.implicits._
    import graft.engine.Primitives
    // The seed travels as its own marker row (is_edge = false) rather than
    // only via the crossJoin: with an EMPTY pairs frame the crossJoin
    // yields zero rows and the old formulation lost the seed entirely,
    // while distributedBfs correctly returns it at lvl 0 — the two
    // size-adaptive paths must agree on every input, degenerate included.
    val seedRows = seed.select(lit(0L).as("src"), lit(0L).as("dst"),
      col("node").as("seed"), lit(false).as("is_edge"))
    val edgeRows = pairs.crossJoin(broadcast(seed))
      .select(col("src"), col("dst"), col("node").as("seed"),
        lit(true).as("is_edge"))
    seedRows.unionByName(edgeRows)
      .as[(Long, Long, Long, Boolean)]
      .repartition(1)
      .mapPartitions { it =>
        val sb = new scala.collection.mutable.ArrayBuilder.ofLong
        val db = new scala.collection.mutable.ArrayBuilder.ofLong
        var seed = Long.MinValue
        it.foreach { case (s, d, sd, isEdge) =>
          if (isEdge) {
            sb += s; db += d
            sb += d; db += s
          }
          seed = sd
        }
        if (seed == Long.MinValue) Iterator.empty
        else {
          val srcs = sb.result(); val dsts = db.result()
          val lvl = new Primitives.LongLongMap()
          lvl(seed) = 0L
          var frontier = Array(seed)
          var hop = 1L
          while (hop <= BfsMaxHops && frontier.nonEmpty) {
            val nb = new scala.collection.mutable.ArrayBuilder.ofLong
            val inF = new Primitives.LongLongMap(frontier.length)
            frontier.foreach(inF(_) = 1L)
            var i = 0
            while (i < srcs.length) {
              if (inF.contains(srcs(i)) && !lvl.contains(dsts(i))) {
                lvl(dsts(i)) = hop
                nb += dsts(i)
              }
              i += 1
            }
            frontier = nb.result()
            hop += 1
          }
          lvl.iterator
        }
      }
      .toDF("node", "lvl")
  }

  /** Distributed frontier-expansion BFS (the above-threshold path). */
  private def distributedBfs(
      spark: SparkSession, pairs: DataFrame, seed: DataFrame): DataFrame = {
    val edges = Materialize.diskBacked(
      pairs.unionByName(pairs.select(col("dst").as("src"), col("src").as("dst"))))
    var visited = Materialize.diskBacked(
      seed.select(col("node"), lit(0L).as("lvl")))
    var frontier = visited
    (1 to BfsMaxHops).foreach { hop =>
      val next = Materialize.diskBacked(
        frontier.select(col("node").as("f_node"))
          .join(edges.as("e"), col("f_node") === col("e.src"))
          .select(col("e.dst").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .select(col("node"), lit(hop.toLong).as("lvl")))
      visited = Materialize.diskBacked(visited.unionByName(next))
      frontier = next
    }
    visited
  }

  val bfsLevelsOracle: String =
    s"""WITH RECURSIVE edges AS (
       |  SELECT DISTINCT 2 * l_partkey AS src, 2 * l_suppkey + 1 AS dst
       |  FROM lineitem
       |  UNION
       |  SELECT DISTINCT 2 * l_suppkey + 1, 2 * l_partkey FROM lineitem),
       |walk AS (
       |  SELECT CAST(2 * MIN(l_partkey) AS BIGINT) AS node,
       |    CAST(0 AS BIGINT) AS lvl
       |  FROM lineitem
       |  UNION
       |  SELECT e.dst AS node, w.lvl + 1 AS lvl
       |  FROM walk w JOIN edges e ON e.src = w.node
       |  WHERE w.lvl < ${BfsMaxHops}),
       |lv AS (SELECT node, MIN(lvl) AS lvl FROM walk GROUP BY 1)
       |SELECT lvl, CAST(COUNT(*) AS BIGINT) AS n_nodes
       |FROM lv GROUP BY 1 ORDER BY lvl""".stripMargin

  // `q_ra_links`: resource-allocation link prediction

  /** Hub cap: parts shared by more than this many suppliers are dropped
    * from scoring. Not (only) a performance guard — RA's 1/deg weight
    * already sends hub contributions toward zero, and capping is how the
    * published large-graph evaluations bound the deg² pair fan-out. */
  val RaDegCap = 32
  /** Reported pair count. */
  val RaTopK = 30
  /** Weight quantum denominator: weight(p) = 1e12 div deg(p), an exact
    * integer — the ln-free cousin of Adamic-Adar (Zhou et al.'s resource
    * allocation index), chosen because 1/ln(deg) is not bit-reproducible
    * across engines while integer division is. */
  val RaQuant = 1000000000000L

  /** `q_ra_links`: resource-allocation link prediction over the
    * supplier–part bipartite graph — score supplier pairs by
    * sum over shared parts of 1/deg(part), the "how much exclusive
    * inventory do we share" signal that predicts which two suppliers an
    * assortment graph will link next. Hot-key discipline: deg ≤ RaDegCap
    * bounds the per-part pair fan-out (deg choose 2) BEFORE the
    * self-join, the X65 basket trick with an explicit cap.
    *
    * Scale shape: one distinct (part, supplier) projection; the degree
    * aggregate is part-keyed on the same exchange; the capped self-join
    * emits at most RaDegCap²/2 pairs per part; the pair aggregate sums
    * exact integer weights (order-independent). Only the final /1e12 is
    * floating point. */
  def raLinksQ(spark: SparkSession, sfDir: String): DataFrame = {
    val ps = Materialize.diskBacked(
      Tables.lineitem(spark, sfDir)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
        .distinct()
        .repartition(col("p")))
    val deg = ps.groupBy(col("p")).agg(Num.countStar.as("deg"))
      .filter(col("deg").between(2, RaDegCap))
      .withColumn("wq", expr(s"${RaQuant}L div deg"))
    // The cap must land BEFORE pair generation (the documented hub-cap
    // contract): joining deg onto the x side first drops hub parts from
    // the build, so their deg² fan-out never materializes — the y side
    // follows for free (its hub rows find no x match).
    ps.join(deg, Seq("p")).as("x").join(ps.as("y"),
        col("x.p") === col("y.p") && col("x.s") < col("y.s"))
      .select(col("x.s").as("s_a"), col("y.s").as("s_b"), col("x.wq").as("wq"))
      .groupBy(col("s_a"), col("s_b"))
      .agg(Num.countStar.as("n_shared"), sum(col("wq")).as("score_q"))
      .select(col("s_a"), col("s_b"), col("n_shared"),
        (col("score_q").cast("double") / lit(1e12)).as("score"))
      .orderBy(col("score").desc, col("s_a"), col("s_b"))
      .limit(RaTopK)
  }

  val raLinksOracle: String =
    s"""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
       |deg AS (
       |  SELECT p, CAST(COUNT(*) AS BIGINT) AS deg FROM ps GROUP BY 1),
       |capped AS (
       |  SELECT p, ${RaQuant} // deg AS wq FROM deg
       |  WHERE deg BETWEEN 2 AND ${RaDegCap}),
       |pairs AS (
       |  SELECT x.p AS p, x.s AS s_a, y.s AS s_b
       |  FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s)
       |SELECT s_a, s_b, CAST(COUNT(*) AS BIGINT) AS n_shared,
       |  CAST(SUM(wq) AS DOUBLE) / 1e12 AS score
       |FROM pairs JOIN capped USING (p)
       |GROUP BY 1, 2
       |ORDER BY score DESC, s_a, s_b
       |LIMIT ${RaTopK}""".stripMargin

  // `q_hits`: HITS hubs & authorities (exact-integer power rounds)

  /** Full mutual-reinforcement rounds (auth pass + hub pass each). */
  val HitsIters = 2
  /** Nodes reported per role. */
  val HitsTopK = 25
  /** Edge threshold for the single-task path — the same size-adaptive
    * switch as CC/PageRank, and with a bonus: below it every HITS score
    * is provably Long-safe. For iters=2 any rank value is ≤ E² (h1(s) =
    * Σ_{p∈N(s)} indeg(p) ≤ E; a2 ≤ indeg·E ≤ E²; h2 ≤ Σ_p a2(p) =
    * Σ_s deg(s)·h1(s) ≤ E²), so E ≤ 5M keeps everything under 2.5e13 —
    * far inside 2⁶³ — and the local Long arithmetic is bit-identical to
    * the distributed DECIMAL sums. */
  val LocalHitsMaxEdges: Long = 5000000L

  /** `q_hits`: Kleinberg's HITS over the directed supplier→part bipartite
    * graph from `lineitem` — the second link-analysis scorer beside X53's
    * PageRank, answering a different question: PageRank scores GLOBAL
    * importance under random walks; HITS separates HUBS (suppliers whose
    * shipments touch well-sourced parts) from AUTHORITIES (parts stocked
    * by strong hubs), the directory-vs-content split. Unnormalized
    * iterates are PURE INTEGER sums (hub₀=1 ⇒ auth₁=indegree; each pass
    * is one equi-join + sum), so unlike PageRank's 1e-12 quantization no
    * rounding exists at all — DECIMAL(38,0) carries the growth (score ≤
    * deg^(2·iters)·n, inside 38 digits for any realistic degree) and both
    * engines agree bit-for-bit. Normalization is the caller-facing
    * `score_frac` = score/max, one decimal→double division per role.
    *
    * Scale shape: edges = DISTINCT (s,p) materialized ONCE and reused by
    * all 2·HitsIters passes; each pass shuffles only (node, score) pairs —
    * two exchanges per round, the raw table never re-enters (X53's
    * discipline). Rank vectors stay node-sized; the final per-role top-K
    * is a TakeOrdered, never a global sort. */
  def hitsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val (auth, hub) = hitsRanks(spark,
      Tables.lineitem(spark, sfDir)
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .distinct(),
      LocalHitsMaxEdges)
    def top(df: DataFrame, role: String): DataFrame = {
      val all = Window.partitionBy()
      df.withColumn("m", max(col("score")).over(all))
        .orderBy(col("score").desc, col("node").asc).limit(HitsTopK)
        .select(lit(role).as("role"), col("node"),
          col("score").cast("long").as("score"),
          (col("score").cast("double") / col("m").cast("double"))
            .as("score_frac"))
    }
    top(auth, "auth").unionAll(top(hub, "hub"))
      .orderBy(col("role"), col("score").desc, col("node"))
  }

  /** `HitsIters` exact-integer HITS rounds over directed (s → p) edges;
    * returns the full (node, score) authority and hub vectors. Size
    * adaptive like CC/PageRank: single-task primitive-map iteration under
    * `localMaxEdges`, the distributed dataflow above it — both paths are
    * pure integer sums of the same recurrence, so they agree exactly
    * (GraphSpec pins the equivalence by forcing each). */
  private[graft] def hitsRanks(
      spark: SparkSession, edgesIn: DataFrame,
      localMaxEdges: Long): (DataFrame, DataFrame) = {
    val (edges, nEdges) = Materialize.diskBackedWithCount(edgesIn)
    if (nEdges <= localMaxEdges) localHits(spark, edges)
    else distributedHits(spark, edges)
  }

  /** Single-task exact-integer HITS (the ≤-threshold path). Long
    * accumulators are exact here: every score is ≤ E² by the bound in
    * [[LocalHitsMaxEdges]]'s doc. */
  private def localHits(
      spark: SparkSession, edges: DataFrame): (DataFrame, DataFrame) = {
    import spark.implicits._
    import graft.engine.Primitives
    val ranks = edges.select(col("s"), col("p")).as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val sb = new scala.collection.mutable.ArrayBuilder.ofLong
        val pb = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { case (s, p) => sb += s; pb += p }
        val ss = sb.result(); val ps = pb.result()
        // hub0 = 1 for every supplier ⇒ auth1 = indegree(p)
        var auth = new Primitives.LongLongMap()
        var i = 0
        while (i < ps.length) { auth.addTo(ps(i), 1L); i += 1 }
        var hub = new Primitives.LongLongMap()
        i = 0
        while (i < ss.length) { hub.addTo(ss(i), auth(ps(i))); i += 1 }
        var round = 2
        while (round <= HitsIters) {
          val a = new Primitives.LongLongMap(auth.size)
          i = 0
          while (i < ps.length) { a.addTo(ps(i), hub(ss(i))); i += 1 }
          auth = a
          val h = new Primitives.LongLongMap(hub.size)
          i = 0
          while (i < ss.length) { h.addTo(ss(i), auth(ps(i))); i += 1 }
          hub = h
          round += 1
        }
        auth.iterator.map { case (n, sc) => ("auth", n, sc) } ++
          hub.iterator.map { case (n, sc) => ("hub", n, sc) }
      }
      .toDF("role", "node", "score")
    val both = Materialize.diskBacked(
      ranks.select(col("role"), col("node"),
        col("score").cast(DecimalType(38, 0)).as("score")))
    (both.filter(col("role") === "auth").drop("role"),
      both.filter(col("role") === "hub").drop("role"))
  }

  // `q_assortativity`: bipartite degree assortativity

  /** `q_assortativity`: degree assortativity of the supplier→part graph —
    * the Pearson correlation of (deg(s), deg(p)) across EDGES (Newman
    * 2002): do high-volume suppliers stock popular parts (assortative,
    * r>0) or niche ones (disassortative, r<0)? The one-number structure
    * summary beside X124's full degree histogram; it decides whether
    * hub-capping (X144) or skew salting will matter before running them.
    *
    * Numeric contract: the five sufficient statistics (E, Σx, Σy, Σxy,
    * Σx², Σy²) are exact integer sums carried in DECIMAL(38,0) — the
    * X129 moment-matrix convention — and the closing r is a pinned-order
    * double expression whose only non-exact steps are two correctly-
    * rounded IEEE sqrts, so both engines agree bit for bit.
    *
    * Scale shape: edges materialized once (it feeds both degree folds
    * AND the join chain), degrees attach via two node-keyed equi-joins,
    * and everything folds to ONE 1-row moment frame. */
  def assortativityQ(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val edges = Materialize.diskBacked(
      Tables.lineitem(spark, sfDir)
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .distinct())
    val degS = edges.groupBy(col("s")).agg(Num.countStar.as("x"))
    val degP = edges.groupBy(col("p")).agg(Num.countStar.as("y"))
    val m = edges.join(degS, Seq("s")).join(degP, Seq("p"))
      .agg(Num.countStar.cast(dec).as("e"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("y") * col("y")).cast(dec)).as("syy"))
    m.select(
      col("e").cast("long").as("n_edges"),
      (col("sx").cast("double") / col("e").cast("double")).as("mean_deg_s"),
      (col("sy").cast("double") / col("e").cast("double")).as("mean_deg_p"),
      ((col("e") * col("sxy") - col("sx") * col("sy")).cast("double")
        / (sqrt((col("e") * col("sxx") - col("sx") * col("sx")).cast("double"))
          * sqrt((col("e") * col("syy") - col("sy") * col("sy")).cast("double"))))
        .as("assortativity"))
  }

  val assortativityOracle: String =
    """WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
      |ds AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS x FROM e GROUP BY 1),
      |dp AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS y FROM e GROUP BY 1),
      |m AS (
      |  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS en,
      |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |    CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
      |    CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
      |    CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
      |  FROM e JOIN ds USING (s) JOIN dp USING (p))
      |SELECT CAST(en AS BIGINT) AS n_edges,
      |  CAST(sx AS DOUBLE) / CAST(en AS DOUBLE) AS mean_deg_s,
      |  CAST(sy AS DOUBLE) / CAST(en AS DOUBLE) AS mean_deg_p,
      |  CAST(en * sxy - sx * sy AS DOUBLE)
      |    / (sqrt(CAST(en * sxx - sx * sx AS DOUBLE))
      |       * sqrt(CAST(en * syy - sy * sy AS DOUBLE))) AS assortativity
      |FROM m""".stripMargin

  // `q_kcore`: fixed-round k-core peeling

  /** Minimum degree kept by each peel round. */
  val KcoreK = 8
  /** Fixed peel rounds (truncation, X53's fixed-iteration discipline —
    * a convergence probe would add a per-round action barrier). */
  val KcoreRounds = 3

  /** `q_kcore`: k-core peeling over the supplier↔part graph — iteratively
    * drop endpoints with degree < K; what survives is the dense backbone
    * (the "core" retailers/parts whose relationships don't evaporate when
    * marginal players leave). Third structure probe beside X124 (degree
    * histogram: how skewed) and X162 (assortativity: who connects to
    * whom); k-core says how DEEP the density goes. Rounds are FIXED like
    * X53's power method, so the plan is `KcoreRounds` identical stages
    * and the oracle unrolls them; the gated artifact reports each round's
    * survivor census, making the convergence trajectory itself the
    * verified output.
    *
    * Size-adaptive like CC/PageRank/HITS/BFS: single-task primitive-map
    * peel under `LocalPrMaxPairs` edges (GraphSpec pins the equivalence),
    * the distributed rounds above it. Distributed scale shape per round:
    * two node-keyed degree folds + two semi-join shaped equi-joins back
    * onto the edge frame, which is materialized every round (it feeds
    * both degree folds AND the next filter — the multi-consumer rule);
    * the census is one aggregate per round off the materialized frame.
    * Nothing is ever node²-sized. */
  def kcoreQ(spark: SparkSession, sfDir: String): DataFrame =
    kcore(spark,
      Tables.lineitem(spark, sfDir)
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .distinct(),
      LocalPrMaxPairs)

  /** Per-round peel census over directed (s, p) edges; size-adaptive. */
  private[graft] def kcore(
      spark: SparkSession, edgesIn: DataFrame,
      localMaxEdges: Long): DataFrame = {
    val (edges, nEdges) = Materialize.diskBackedWithCount(edgesIn)
    val out =
      if (nEdges <= localMaxEdges) localKcore(spark, edges)
      else distributedKcore(spark, edges)
    out.orderBy(col("round"))
  }

  /** Single-task peel (the ≤-threshold path — CC/PageRank/HITS/BFS's
    * switch): primitive arrays + degree maps, `KcoreRounds` sweeps,
    * identical simultaneous-peel semantics to the distributed rounds
    * (GraphSpec pins the equivalence). */
  private def localKcore(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    import graft.engine.Primitives
    edges.select(col("s"), col("p")).as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val sb = new scala.collection.mutable.ArrayBuilder.ofLong
        val pb = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { case (s, p) => sb += s; pb += p }
        var ss = sb.result(); var ps = pb.result()
        (1 to KcoreRounds).iterator.map { r =>
          val ds = new Primitives.LongLongMap()
          val dp = new Primitives.LongLongMap()
          var i = 0
          while (i < ss.length) { ds.addTo(ss(i), 1L); dp.addTo(ps(i), 1L); i += 1 }
          val ns = new scala.collection.mutable.ArrayBuilder.ofLong
          val np = new scala.collection.mutable.ArrayBuilder.ofLong
          i = 0
          while (i < ss.length) {
            if (ds(ss(i)) >= KcoreK && dp(ps(i)) >= KcoreK) {
              ns += ss(i); np += ps(i)
            }
            i += 1
          }
          ss = ns.result(); ps = np.result()
          val us = new Primitives.LongLongMap()
          val up = new Primitives.LongLongMap()
          i = 0
          while (i < ss.length) { us(ss(i)) = 1L; up(ps(i)) = 1L; i += 1 }
          (r, us.size.toLong, up.size.toLong, ss.length.toLong)
        }
      }
      .toDF("round", "n_supp", "n_part", "n_edges")
  }

  /** Distributed peel rounds (the above-threshold path). */
  private def distributedKcore(spark: SparkSession, edgesIn: DataFrame): DataFrame = {
    var cur = edgesIn
    val rounds = (1 to KcoreRounds).map { r =>
      val degS = cur.groupBy(col("s")).agg(Num.countStar.as("ds"))
        .filter(col("ds") >= KcoreK).select(col("s"))
      val degP = cur.groupBy(col("p")).agg(Num.countStar.as("dp"))
        .filter(col("dp") >= KcoreK).select(col("p"))
      cur = Materialize.diskBacked(
        cur.join(degS, Seq("s")).join(degP, Seq("p")))
      cur.agg(countDistinct(col("s")).as("n_supp"),
          countDistinct(col("p")).as("n_part"),
          Num.countStar.as("n_edges"))
        .select(lit(r).as("round"), col("n_supp"), col("n_part"),
          col("n_edges"))
    }
    rounds.reduce(_ unionAll _)
  }

  val kcoreOracle: String = {
    def round(prev: String, name: String): String =
      s"""$name AS (
         |  SELECT s, p FROM $prev
         |  WHERE s IN (SELECT s FROM $prev GROUP BY s
         |              HAVING COUNT(*) >= ${KcoreK})
         |    AND p IN (SELECT p FROM $prev GROUP BY p
         |              HAVING COUNT(*) >= ${KcoreK}))""".stripMargin
    val stats = (1 to KcoreRounds).map { r =>
      s"""SELECT $r AS round, CAST(COUNT(DISTINCT s) AS BIGINT) AS n_supp,
         |  CAST(COUNT(DISTINCT p) AS BIGINT) AS n_part,
         |  CAST(COUNT(*) AS BIGINT) AS n_edges FROM e$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e0 AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
       |  FROM lineitem),
       |${round("e0", "e1")},
       |${round("e1", "e2")},
       |${round("e2", "e3")}
       |SELECT * FROM ($stats) ORDER BY round""".stripMargin
  }

  /** Distributed HITS (the above-threshold path). The edge table is
    * materialized PRE-PARTITIONED on each of its two join keys — HITS
    * alternates sides every half-round, and re-shuffling a 100 TB edge
    * table twice per round is exactly what the two cached copies avoid:
    * every pass shuffles only the node-sized rank vector. Rounds stay
    * LAZY (one linear plan per output leg, PageRank's discipline); only
    * the final authority vector materializes, because both the last hub
    * pass and its own top-K leg consume it. */
  private def distributedHits(
      spark: SparkSession, edges: DataFrame): (DataFrame, DataFrame) = {
    val dec = DecimalType(38, 0)
    val byP = Materialize.diskBacked(edges.repartition(col("p")))
    val byS = Materialize.diskBacked(edges.repartition(col("s")))
    var auth = byP.groupBy(col("p"))
      .agg(Num.countStar.cast(dec).as("score"))
    var hub: DataFrame = null
    for (r <- 1 to HitsIters) {
      if (r > 1)
        auth = byS.join(hub, Seq("s"))
          .groupBy(col("p")).agg(sum(col("score")).cast(dec).as("score"))
      if (r == HitsIters)
        auth = Materialize.diskBacked(auth)
      hub = byP.join(auth, Seq("p"))
        .groupBy(col("s")).agg(sum(col("score")).cast(dec).as("score"))
    }
    (auth.withColumnRenamed("p", "node"), hub.withColumnRenamed("s", "node"))
  }

  val hitsOracle: String =
    s"""WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
       |a1 AS (
       |  SELECT p, CAST(COUNT(*) AS DECIMAL(38,0)) AS score FROM e GROUP BY 1),
       |h1 AS (
       |  SELECT s, CAST(SUM(score) AS DECIMAL(38,0)) AS score
       |  FROM e JOIN a1 USING (p) GROUP BY 1),
       |a2 AS (
       |  SELECT p, CAST(SUM(score) AS DECIMAL(38,0)) AS score
       |  FROM e JOIN h1 USING (s) GROUP BY 1),
       |h2 AS (
       |  SELECT s, CAST(SUM(score) AS DECIMAL(38,0)) AS score
       |  FROM e JOIN a2 USING (p) GROUP BY 1),
       |ta AS (
       |  SELECT 'auth' AS role, p AS node, CAST(score AS BIGINT) AS score,
       |    CAST(score AS DOUBLE) / CAST(MAX(score) OVER () AS DOUBLE)
       |      AS score_frac
       |  FROM a2 ORDER BY score DESC, node LIMIT ${HitsTopK}),
       |th AS (
       |  SELECT 'hub' AS role, s AS node, CAST(score AS BIGINT) AS score,
       |    CAST(score AS DOUBLE) / CAST(MAX(score) OVER () AS DOUBLE)
       |      AS score_frac
       |  FROM h2 ORDER BY score DESC, node LIMIT ${HitsTopK})
       |SELECT * FROM (SELECT * FROM ta UNION ALL SELECT * FROM th)
       |ORDER BY role, score DESC, node""".stripMargin

  // `q_cc_incremental` (X262): incremental connected components
  // through the committed label table

  /** Supplier node-id offset (part keys stay < this). */
  val CcNodeOffset = 1000000000L

  /** `q_cc_incremental` (X262): INCREMENTAL connected components — the
    * graph twin of X205's persisted dedup index: day 1 labels the
    * history graph and COMMITS (node → label) as a table; day 2 must
    * fold a new edge batch in WITHOUT re-walking history, which the
    * classic relabel trick makes exact: committed labels ARE min-id
    * witnesses, so CC over (node–label edges from the committed table)
    * ∪ (the new batch's edges) equals CC of the full graph — each old
    * component collapses to a star around its label, and new edges
    * stitch stars together. The gate's oracle is the FROM-SCRATCH
    * transitive closure over all edges, so the equivalence is proven
    * per run, not assumed. Edges: the part↔supplier bipartite graph
    * from lineitem (supplier ids offset into their own range); the
    * history/batch split is the X61 orderkey-mod discipline.
    *
    * Scale: day 2 touches the label table (node-sized) plus the new
    * batch — never the historical edge set; exactly how a production
    * entity-resolution graph absorbs a daily delta. */
  def ccIncrementalQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import graft.engine.TableCommit
    val root = graft.engine.TempWarehouse.createManaged("graft_ccinc_") +
      "/labels"
    def edgesOf(df: DataFrame): DataFrame = df
      .select(col("l_partkey").cast("long").as("doc_a"),
        (col("l_suppkey").cast("long") + CcNodeOffset).as("doc_b"))
      .distinct()
    val li = Tables.lineitem(spark, sfDir)
    val hist = edgesOf(li.filter(pmod(col("l_orderkey"), lit(5)) =!= 0))
    val labels1 = graft.operators.Dedup.connectedComponents(spark, hist,
      localMaxEdges = 5000000L)
    TableCommit.commitOverwrite(labels1, root, retain = 2)
    val schema = StructType(Seq(
      StructField("node", LongType), StructField("label", LongType)))
    val labelEdges = TableCommit.read(spark, root, schema)
      .select(col("node").as("doc_a"), col("label").as("doc_b"))
    val batch = edgesOf(li.filter(pmod(col("l_orderkey"), lit(5)) === 0))
    val labels2 = graft.operators.Dedup.connectedComponents(spark,
      labelEdges.unionByName(batch), localMaxEdges = 5000000L)
    labels2.groupBy(col("label"))
      .agg(Num.countStar.as("n_nodes"), sum(col("node")).as("node_sum"))
      .orderBy(col("label"))
  }

  val ccIncrementalOracle: String =
    s"""WITH RECURSIVE e0 AS (
       |  SELECT DISTINCT CAST(l_partkey AS BIGINT) AS a,
       |    CAST(l_suppkey AS BIGINT) + ${CcNodeOffset} AS b
       |  FROM lineitem),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM e0
       |  UNION ALL
       |  SELECT b AS src, a AS dst FROM e0),
       |reach AS (
       |  SELECT src AS node, src AS label FROM edges
       |  UNION
       |  SELECT e.dst AS node, r.label
       |  FROM reach r JOIN edges e ON e.src = r.node),
       |lab AS (
       |  SELECT node, MIN(label) AS label FROM reach GROUP BY node)
       |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |  CAST(SUM(node) AS BIGINT) AS node_sum
       |FROM lab GROUP BY 1 ORDER BY label""".stripMargin
}
