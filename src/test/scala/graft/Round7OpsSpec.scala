package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Behavior, Dedup, Graph, Relational, Stats}
import graft.engine.Tables

/** Semantic invariants for the round-7 operators: EWMA smoothing, CUPED
  * readout, attribution, BFS levels, RA link prediction, prefix-filtered
  * set-similarity join, and the time-travel read. The cross-engine gate
  * pins exact values; these pin the MEANING (hand-recomputed expectations
  * and structural laws the oracle can't express).
  */
class Round7OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ewma: per-user value matches a hand-rolled fold of the K latest events") {
    val out = Stats.ewmaQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(out.nonEmpty)
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val byUser = events.groupBy(_._1)
    out.foreach { case (uid, n, ewma) =>
      val evs = byUser(uid).sortBy(e => (e._2.getTime, e._3)).reverse
      assert(n === evs.size.toLong)
      val expect = evs.take(Stats.EwmaWindow).zipWithIndex.map {
        case ((_, _, _, v), i) =>
          math.floor(v * math.pow(Stats.EwmaDecay, i + 1) * 1e9 + 0.5)
      }.map(BigDecimal(_)).sum.toDouble / 1e9
      assert(math.abs(ewma - expect) < 1e-12, s"user $uid: $ewma vs $expect")
    }
  }

  test("cuped: adjustment preserves the global mean and matches hand-fit theta") {
    val rows = Behavior.cupedQ(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    val nTotal = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum === nTotal)
    // CUPED is mean-preserving across the pooled population: the
    // n-weighted mean of adjusted equals the n-weighted mean of raw
    // (the theta term telescopes because sum(x_arm deviations) = 0).
    val wRaw = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    val wAdj = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(wRaw - wAdj) < 1e-6)
  }

  test("attribution: both models conserve conversions and total revenue") {
    val rows = Behavior.attributionQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
    val nConv = purchases.count()
    val rev = purchases.agg(graft.engine.Num.sumMoney(col("value")))
      .head().getDouble(0)
    Seq("first", "last").foreach { m =>
      val part = rows.filter(_._1 == m)
      assert(part.map(_._3).sum === nConv, s"model $m conversion count")
      assert(math.abs(part.map(_._4).sum - rev) < 1e-6, s"model $m revenue")
      // purchases never credit the 'purchase' channel
      assert(!part.exists(_._2 == "purchase"))
    }
  }

  test("bfs: level 0 is the seed alone and level 1 is the seed part's suppliers") {
    val lv = Graph.bfsLevelsQ(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lv(0L) === 1L)
    val minPart = Tables.lineitem(spark, sf)
      .agg(min(col("l_partkey"))).head().getLong(0)
    val suppliersOfSeed = Tables.lineitem(spark, sf)
      .filter(col("l_partkey") === minPart)
      .select(col("l_suppkey")).distinct().count()
    assert(lv(1L) === suppliersOfSeed)
    // levels are contiguous from 0
    assert(lv.keySet === (0L until lv.size.toLong).toSet)
  }

  test("ra links: scores match a brute-force recompute of capped shared parts") {
    val got = Graph.raLinksQ(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
    assert(got.nonEmpty)
    val ps = Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = ps.groupBy(_._1).map { case (p, xs) => p -> xs.length }
    val capped = deg.filter { case (_, d) => d >= 2 && d <= Graph.RaDegCap }
    val expect = ps.groupBy(_._1).toSeq.flatMap { case (p, xs) =>
      if (!capped.contains(p)) Seq.empty
      else {
        val ss = xs.map(_._2).sorted
        for { i <- ss.indices; j <- i + 1 until ss.size }
          yield ((ss(i), ss(j)), Graph.RaQuant / capped(p))
      }
    }.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.size.toLong, vs.map(_._2).sum.toDouble / 1e12)
    }
    got.foreach { case (pair, (nShared, score)) =>
      val (en, es) = expect(pair)
      assert(nShared === en && math.abs(score - es) < 1e-12, s"pair $pair")
    }
  }

  test("setsim prefix filter is lossless vs brute-force signature Jaccard") {
    val got = Dedup.setsimPrefixQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: every doc pair's signature Jaccard without any filter
    val sig = Dedup.setsimSignatures(Tables.documents(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    val docs = sig.keys.toSeq.sorted
    val expect = (for {
      i <- docs.indices; j <- i + 1 until docs.size
      a = sig(docs(i)); b = sig(docs(j))
      inter = (a & b).size
      if (Dedup.SetsimTauNum + Dedup.SetsimTauDen) * inter >=
        Dedup.SetsimTauNum * (a.size + b.size)
    } yield (docs(i), docs(j))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("time travel: v1 ignores the update batch, v2 applies it") {
    val rows = Relational.timeTravelQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val v1n = rows.filter(_._1 == 1L).map(_._3).sum
    val v2n = rows.filter(_._1 == 2L).map(_._3).sum
    val cust = Tables.customer(spark, sf)
    val expectedV1 = cust.filter(col("c_custkey") % 3 =!= 0).count()
    // v2 = v1 keys UNION even keys (MERGE inserts the evens not in v1)
    val expectedV2 = cust.filter(
      col("c_custkey") % 3 =!= 0 || col("c_custkey") % 2 === 0).count()
    assert(v1n === expectedV1 && v2n === expectedV2)
    // the +1000-cents update moved v2's balance sum upward by exactly
    // 1000 * (#even keys), net of rows that entered v2 fresh
    val evens = cust.filter(col("c_custkey") % 2 === 0)
    val evenCents = evens
      .agg(sum((col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")))
      .head().getLong(0)
    val v1EvenCents = cust
      .filter(col("c_custkey") % 3 =!= 0 && col("c_custkey") % 2 === 0)
      .agg(sum((col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")))
      .head().getLong(0)
    val deltaExpected = (evenCents + 1000L * evens.count()) - v1EvenCents
    val delta = rows.filter(_._1 == 2L).map(_._4).sum -
      rows.filter(_._1 == 1L).map(_._4).sum
    assert(delta === deltaExpected)
  }

  test("coherent sample: every sampled customer keeps ALL their orders") {
    val row = graft.operators.Curation.coherentSampleQ(spark, sf).head()
    val joined = row.getLong(0)
    // recompute: sampled custkeys, then their FULL order counts — if
    // sampling were per-table-independent this would overcount vs the
    // sampled join; universe sampling makes them equal
    val keep = (c: org.apache.spark.sql.Column) => pmod(
      conv(substring(md5(concat(lit("cs"), c)), 1, 15), 16, 10)
        .cast("long"), lit(100)) < graft.operators.Curation.CoherentPct
    val sampledCust = Tables.customer(spark, sf)
      .filter(keep(col("c_custkey"))).select(col("c_custkey"))
    val fullOrdersOfSampled = Tables.orders(spark, sf)
      .join(sampledCust, col("o_custkey") === col("c_custkey")).count()
    assert(joined === fullOrdersOfSampled)
    // the estimator is the advertised inverse-probability scale-up
    assert(math.abs(row.getDouble(2) - joined * 5.0) < 1e-9)
  }

  test("mannwhitney: doubled U matches the brute-force pair count") {
    val row = graft.operators.Stats.mannwhitneyQ(spark, sf).head()
    val (nx, ny, u2) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val vals = Tables.events(spark, sf)
      .filter(col("event_type").isin(
        graft.operators.Stats.MwGroupX, graft.operators.Stats.MwGroupY))
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val xs = vals.filter(_._1 == graft.operators.Stats.MwGroupX).map(_._2)
    val ys = vals.filter(_._1 == graft.operators.Stats.MwGroupY).map(_._2)
    assert(nx === xs.length.toLong && ny === ys.length.toLong)
    // U = #(x>y) + 0.5*#(x==y), doubled to stay integral
    val u2Brute = xs.iterator.map { x =>
      2L * ys.count(x > _) + ys.count(x == _)
    }.sum
    assert(u2 === u2Brute)
    assert(math.abs(row.getDouble(3) - u2.toDouble / 2.0 / (nx * ny)) < 1e-12)
  }
}
