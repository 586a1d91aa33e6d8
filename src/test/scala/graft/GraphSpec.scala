package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Triangle-counting core on known graphs, and PageRank invariants. */
class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("square with one diagonal has two triangles sharing the diagonal") {
    // 1-2-3-4-1 plus diagonal 1-3 -> {1,2,3} and {1,3,4}
    val t = tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)))
    assert(t === Map(1L -> 2L, 3L -> 2L, 2L -> 1L, 4L -> 1L))
  }

  test("triangle-free graphs (path, star) count nothing") {
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    assert(tri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))).isEmpty)
  }

  test("K4 has four triangles, every node in three") {
    val t = tri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(t === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(t.values.sum % 3 === 0, "corner counts must be 3x the triangle count")
  }

  test("triangles: local and distributed paths agree on all known graphs") {
    val graphs = Seq(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)), // square+diagonal
      Seq((1L, 2L), (2L, 3L), (3L, 4L)),                     // path
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)) // K4
    )
    graphs.foreach { g =>
      def run(localMaxEdges: Long) = {
        val df = Graph.triangleCounts(g.toDF("u", "v"), localMaxEdges)
        assert(df.columns.toSeq === Seq("node", "n_tri"))
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      assert(run(Long.MaxValue) === run(0L))
    }
  }

  test("pagerank: local and distributed paths are bit-identical") {
    // A star (1 hub, 3 leaves) glued to a 2-cycle through node 10 — mixed
    // degrees so quantized contributions differ per edge. Pair ids use the
    // odd/even spaces the production graph uses (irrelevant to the math).
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (2L, 5L), (2L, 10L), (10L, 11L)
    ).toDF("a", "b")
    def run(localMaxPairs: Long) = {
      val df = Graph.pagerank(spark, pairs, localMaxPairs)
      assert(df.columns.toSeq === Seq("node", "r"))
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val local = run(Long.MaxValue) // forces the single-task power method
    val dist  = run(0L)            // forces the distributed rounds
    assert(local.keySet === dist.keySet)
    // bit-identical, not approximately equal: both paths promise the same
    // single-rounded IEEE ops in the same order
    local.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ===
        java.lang.Double.doubleToLongBits(dist(k)), s"node $k: $v vs ${dist(k)}")
    }
    assert(math.abs(local.values.sum - 1.0) < 1e-9, "rank mass conserved")
  }

  test("bfs: local and distributed paths agree exactly") {
    // path 1-2-3-4-5 plus a branch 2-6: from seed 1 the hop levels are
    // 0:{1} 1:{2} 2:{3,6} 3:{4}; 5 is beyond BfsMaxHops=3
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L))
      .toDF("src", "dst")
    val seed = pairs.agg(min(col("src")).as("node"))
    def run(localMax: Long) =
      Graph.bfsLevels(spark, pairs, seed, localMax)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = run(Long.MaxValue)
    val dist = run(0L)
    assert(local === dist)
    assert(local === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 6L -> 2L, 4L -> 3L))
  }

  test("kcore: local and distributed paths agree exactly") {
    // K(8,8) complete bipartite — every degree is exactly K=8, so the
    // core survives all rounds — plus a pendant supplier 99→p10 (degree
    // 1, peeled in round 1; p10 drops from 9 back to 8 and stays).
    val base = for (s <- 1L to 8L; p <- 10L to 17L) yield (s, p)
    val all = base :+ ((99L, 10L))
    val edges = all.toDF("s", "p")
    def run(localMax: Long) =
      Graph.kcore(spark, edges, localMax)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
    val local = run(Long.MaxValue)
    val dist = run(0L)
    assert(local === dist)
    assert(local === (1 to Graph.KcoreRounds).map(r => (r, 8L, 8L, 64L)))
  }

  test("hits: local and distributed paths agree exactly") {
    // bipartite with mixed degrees: s1 ships 3 parts, s2 ships 2, s3 one;
    // p10 stocked by everyone, the rest sparse
    val edges = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L), (3L, 10L)
    ).toDF("s", "p")
    def run(localMax: Long) = {
      val (a, h) = Graph.hitsRanks(spark, edges, localMax)
      (a.collect().map(r => r.getLong(0) -> r.getDecimal(1).longValueExact())
        .toMap,
        h.collect().map(r => r.getLong(0) -> r.getDecimal(1).longValueExact())
          .toMap)
    }
    val (la, lh) = run(Long.MaxValue) // forces the single-task path
    val (da, dh) = run(0L)            // forces the distributed rounds
    assert(la === da)
    assert(lh === dh)
    // hand-check round 1: auth1 = indegree, hub1 = sum of neighbor indegs
    // round 2: auth2 = sum of neighbor hub1, hub2 = sum of neighbor auth2
    val auth1 = Map(10L -> 3L, 11L -> 2L, 12L -> 1L)
    val hub1 = Map(1L -> 6L, 2L -> 5L, 3L -> 3L)
    val auth2 = Map(10L -> 14L, 11L -> 11L, 12L -> 6L)
    val hub2 = Map(1L -> 31L, 2L -> 25L, 3L -> 14L)
    assert(la === auth2 && lh === hub2)
    assert(auth1(10L) === 3L && hub1(1L) === 6L) // (documents the chain)
  }

  test("pagerank ranks sum to ~1 and are all positive") {
    val rows = Graph.pagerankQ(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) > 0))
    // top-50 of a larger node set sums below 1; each rank is bounded by 1
    rows.foreach(r => assert(r.getDouble(1) <= 1.0))
  }

  test("degree distribution: handshake identity and per-side node totals") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Graph.degreeDistQ(spark, sfDir).collect()
      .map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2)))
    val pairs = graft.engine.Tables.lineitem(spark, sfDir)
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val nEdges = pairs.count()
    // Σ deg·n_nodes over both sides = 2·|E| (each edge has one end per side)
    assert(rows.map(t => t._2 * t._3).sum == 2 * nEdges)
    assert(rows.filter(_._1).map(t => t._2 * t._3).sum == nEdges)
    // node totals per side match the distinct endpoint counts
    val nParts = pairs.select("a").distinct().count()
    val nSupps = pairs.select("b").distinct().count()
    assert(rows.filter(_._1).map(_._3).sum == nParts)
    assert(rows.filter(!_._1).map(_._3).sum == nSupps)
  }

  test("incremental-CC relabel lemma: cc(labels(hist) ∪ batch) = cc(hist ∪ batch)") {
    // the algebraic heart of q_cc_incremental, proven on random sparse
    // graphs where merges, untouched components, and brand-new
    // components all occur (the sfDir fixture is one giant component)
    val rnd = new scala.util.Random(11)
    def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
      graft.operators.Dedup.connectedComponents(spark,
        edges.toDF("doc_a", "doc_b"), localMaxEdges = 1000000L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 10).foreach { _ =>
      val n = 30 + rnd.nextInt(30)
      def edge() = (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      val hist = Seq.fill(n / 2)(edge())
      val batch = Seq.fill(n / 4)(edge())
      val labels1 = cc(hist)
      val incremental = cc(labels1.toSeq ++ batch)
      val scratch = cc(hist ++ batch)
      // nodes present in history keep/merge labels exactly as a full
      // recompute would; batch-only nodes appear identically in both
      assert(incremental === scratch,
        s"relabel lemma broken on n=$n hist=${hist.size} batch=${batch.size}")
    }
  }
}
