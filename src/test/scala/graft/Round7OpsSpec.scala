package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Aggregates, Behavior, Dedup, Graph, Relational, Stats}
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

  test("tvd drift: statistic matches a brute-force binned recompute and is in [0,1]") {
    val row = Stats.tvdDriftQ(spark, sf).head()
    val (na, nb, num, tvd) =
      (row.getLong(0), row.getLong(1), row.getLong(3), row.getDouble(5))
    val orders = Tables.orders(spark, sf)
      .select(col("o_totalprice"),
        (col("o_orderdate") < lit(Stats.TvdSplitDate).cast("timestamp"))
          .as("is_a"))
      .collect()
      .map(r => (r.getDouble(0), r.getBoolean(1)))
    val bucketOf = (p: Double) =>
      (BigDecimal(p).setScale(2) * 100).toLongExact / Stats.TvdBucketCents
    val a = orders.filter(_._2).map(o => bucketOf(o._1))
    val b = orders.filterNot(_._2).map(o => bucketOf(o._1))
    assert(na === a.length.toLong && nb === b.length.toLong)
    val buckets = (a ++ b).distinct
    val numBrute = buckets.map { k =>
      math.abs(a.count(_ == k).toLong * nb - b.count(_ == k).toLong * na)
    }.sum
    assert(num === numBrute)
    assert(math.abs(tvd - num.toDouble / (2.0 * na * nb)) < 1e-15)
    assert(tvd >= 0.0 && tvd <= 1.0)
  }

  test("benford: digit histogram matches string-leading-digit brute force") {
    val rows = Stats.benfordQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val cents = Tables.orders(spark, sf).select(col("o_totalprice")).collect()
      .map(r => (BigDecimal(r.getDouble(0)).setScale(2) * 100).toLongExact)
    val brute = cents.map(_.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(_._1).toSet === brute.keySet)
    rows.foreach { case (d, obs, obsPpm, expPpm) =>
      assert(obs === brute(d), s"digit $d")
      assert(obsPpm === obs * 1000000L / cents.length)
      assert(expPpm === Stats.BenfordPpm(d.toInt - 1))
    }
    // the pinned expectation table is a probability vector (ppm sums to 1e6)
    assert(Stats.BenfordPpm.sum === 1000000L)
  }

  test("abc pareto: classes partition the catalog and match brute force") {
    val rows = Stats.abcParetoQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === Seq("A", "B", "C"))
    val perPart = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_extendedprice")).collect()
      .map(r => r.getLong(0) ->
        (BigDecimal(r.getDouble(1)).setScale(2) * 100).toLongExact)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(rows.map(_._2).sum === perPart.size.toLong)
    val total = perPart.values.map(BigInt(_)).sum
    assert(rows.map(r => BigInt(r._3)).sum === total)
    // brute: bucket histogram desc, preceding-cum thresholds at 80/95%
    val byBucket = perPart.values.groupBy(_ / Stats.AbcBucketCents).toSeq
      .sortBy(-_._1)
    val cls = scala.collection.mutable.Map[String, (Long, BigInt)]()
      .withDefaultValue((0L, BigInt(0)))
    var cum = BigInt(0)
    byBucket.foreach { case (_, revs) =>
      val k = if (cum * 20 < total * 16) "A"
        else if (cum * 20 < total * 19) "B" else "C"
      val (n0, r0) = cls(k)
      cls(k) = (n0 + revs.size, r0 + revs.map(BigInt(_)).sum)
      cum += revs.map(BigInt(_)).sum
    }
    rows.foreach { case (k, n, rev, share) =>
      assert((n, BigInt(rev)) === cls(k), s"class $k")
      assert(math.abs(share - BigDecimal(rev).toDouble / total.toDouble) < 1e-12)
    }
  }

  test("hits: scores match a brute-force two-round mutual reinforcement") {
    val rows = Graph.hitsQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val edges = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var auth = edges.groupBy(_._2).view.mapValues(es => BigInt(es.length)).toMap
    var hub = edges.groupBy(_._1).view
      .mapValues(_.map(e => auth(e._2)).sum).toMap
    for (_ <- 2 to Graph.HitsIters) {
      auth = edges.groupBy(_._2).view
        .mapValues(_.map(e => hub(e._1)).sum).toMap
      hub = edges.groupBy(_._1).view
        .mapValues(_.map(e => auth(e._2)).sum).toMap
    }
    val topAuth = auth.toSeq.sortBy { case (n, s) => (-s, n) }
      .take(Graph.HitsTopK)
    val topHub = hub.toSeq.sortBy { case (n, s) => (-s, n) }
      .take(Graph.HitsTopK)
    assert(rows.filter(_._1 == "auth").map(r => r._2 -> BigInt(r._3)).toSeq
      .sortBy(x => (-x._2, x._1)) === topAuth)
    assert(rows.filter(_._1 == "hub").map(r => r._2 -> BigInt(r._3)).toSeq
      .sortBy(x => (-x._2, x._1)) === topHub)
    val maxA = auth.values.max
    rows.filter(_._1 == "auth").foreach { case (_, n, s, f) =>
      assert(math.abs(f - BigDecimal(s).toDouble / maxA.toDouble) < 1e-12,
        s"auth $n")
    }
  }

  test("survival: life table accounts for every customer and n_risk telescopes") {
    val rows = Behavior.survivalQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val nCust = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    // interval 0's at-risk pool is everyone; each interval's exits
    // (deaths + censored) are exactly the n_risk drop to the next row
    assert(rows.head._1 === 0L && rows.head._2 === nCust)
    rows.sliding(2).foreach {
      case Array((_, r1, d1, c1, _), (_, r2, _, _, _)) =>
        assert(r2 <= r1 - d1 - c1) // gaps allowed: empty intervals skipped
      case _ => ()
    }
    assert(rows.map(r => r._3 + r._4).sum === nCust)
    rows.foreach { case (k, r, d, _, h) =>
      assert(h === d * 1000000L / r, s"interval $k")
    }
  }

  test("rfm: grid covers every customer and scores match brute-force quintiles") {
    val rows = Behavior.rfmQ(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
        (r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    val ledger = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_d"),
        count(lit(1)).as("freq"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
      .select(
        datediff(max(col("last_d")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()),
          col("last_d")).cast("long").as("rec"),
        col("freq"), col("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.values.map(_._1).sum === ledger.length.toLong)
    assert(rows.values.map(v => BigInt(v._2)).sum ===
      ledger.map(l => BigInt(l._3)).sum)
    // brute quintile thresholds: min v with rank >= ceil(k*n/5)
    def thr(vs: Seq[Long]): Seq[Long] = {
      val s = vs.sorted; val n = s.length
      (1 to 4).map(k => s(((k * n + 4) / 5 - 1).max(0)))
    }
    val (tr, tf, tm) = (thr(ledger.map(_._1)), thr(ledger.map(_._2)),
      thr(ledger.map(_._3 / Behavior.RfmMonetaryUnitCents)))
    val brute = ledger.groupBy { case (rec, f, cents) =>
      (1 + tr.count(rec < _), 1 + tf.count(f > _),
        1 + tm.count(cents / Behavior.RfmMonetaryUnitCents > _))
    }.view.mapValues(_.length.toLong).toMap
    assert(rows.view.mapValues(_._1).toMap === brute)
    rows.foreach { case ((r, f, m), (_, _, seg)) =>
      val expectSeg =
        if (r >= 4 && f >= 4 && m >= 4) "champions"
        else if (r <= 2 && f >= 4) "at_risk"
        else if (r <= 2 && f <= 2) "hibernating"
        else if (r >= 4 && f <= 2) "new"
        else "core"
      assert(seg === expectSeg, s"segment of ($r,$f,$m)")
    }
  }

  test("window funnel: matches brute-force earliest-chain and bounds q_funnel") {
    val row = Behavior.windowFunnelQ(spark, sf).head()
    val (nu, n1, n2, n3) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(n3 <= n2 && n2 <= n1 && n1 <= nu)
    // the timed funnel can never beat the unbounded one, stage for stage
    val unb = Behavior.funnelQ(spark, sf).head()
    assert(n1 === unb.getLong(1))
    assert(n2 <= unb.getLong(2) && n3 <= unb.getLong(3))
    // brute force: earliest chain with the 24h per-step cap, compared at
    // the engine's full microsecond resolution
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val gap = Behavior.FunnelGapSec * 1000000L
    var (b1, b2, b3) = (0L, 0L, 0L)
    var secSum = 0L
    evs.groupBy(_._1).foreach { case (_, es) =>
      val t1 = es.filter(_._2 == "signup").map(_._3).minOption
      t1.foreach { s =>
        b1 += 1
        val t2 = es.filter(e => e._2 == "view" && e._3 >= s && e._3 <= s + gap)
          .map(_._3).minOption
        t2.foreach { v =>
          b2 += 1
          val t3 = es.filter(e =>
            e._2 == "purchase" && e._3 >= v && e._3 <= v + gap)
            .map(_._3).minOption
          // the reported duration is floor-second, like unix_timestamp
          t3.foreach { p => b3 += 1; secSum += p / 1000000L - s / 1000000L }
        }
      }
    }
    assert((n1, n2, n3) === ((b1, b2, b3)))
    assert(row.getLong(4) === secSum)
  }

  test("seasonal anomaly: weekday medians and flags match brute force") {
    val rows = Stats.seasonalAnomalyQ(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq === (0 to 6))
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("t"))
      .select(
        pmod(datediff(col("d"),
          lit(Stats.SeasonalAnchor).cast("date")), lit(7)).as("dow"),
        col("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.map(_._2).sum === daily.length.toLong)
    rows.foreach { case (dow, nDays, med, nHigh, nLow) =>
      val ts = daily.filter(_._1 == dow).map(_._2).sorted
      assert(nDays === ts.length.toLong)
      assert(med === ts((ts.length + 1) / 2 - 1), s"dow $dow median")
      assert(nHigh === ts.count(t => 2 * t > 3 * med).toLong)
      assert(nLow === ts.count(t => 2 * t < med).toLong)
    }
  }

  test("poststrat: estimator algebra and stratum accounting are exact") {
    val rows = graft.operators.Curation.poststratQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val nCust = Tables.customer(spark, sf).count()
    assert(rows.map(_._2).sum === nCust)
    rows.foreach { case (seg, nPop, nSmp, sampleRev, trueRev, est, err) =>
      assert(nSmp <= nPop && nSmp > 0, s"$seg sample counts")
      assert(sampleRev <= trueRev, s"$seg sample revenue bound")
      assert(est === BigDecimal(sampleRev).*(BigDecimal(nPop)).toDouble / nSmp,
        s"$seg estimate")
      assert(math.abs(err - (est / trueRev - 1.0)) < 1e-15, s"$seg err")
    }
    // the coherent slice means total sampled revenue / total true revenue
    // lands near the 20% inclusion rate (loose sanity band)
    val ratio = rows.map(_._4).sum.toDouble / rows.map(_._5).sum
    assert(ratio > 0.05 && ratio < 0.5)
  }

  test("trend movers: top-k matches a brute-force period pivot") {
    val rows = Aggregates.trendMoversQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === Aggregates.TrendTopK)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"),
        (col("o_orderdate") < lit(Stats.TvdSplitDate).cast("timestamp"))
          .as("is_a")),
        col("l_orderkey") === col("o_orderkey"))
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2).toLong, r.getBoolean(4)))
    val byPart = li.groupBy(_._1).view.mapValues { es =>
      (es.filter(_._3).map(_._2).sum, es.filterNot(_._3).map(_._2).sum)
    }.toMap
    val brute = byPart.toSeq
      .map { case (p, (a, b)) => (p, a, b, b - a) }
      .sortBy { case (p, _, _, d) => (-math.abs(d), p) }
      .take(Aggregates.TrendTopK)
      .sortBy { case (p, _, _, d: Long) => (-d, p) }
    assert(rows.toSeq === brute)
  }

  test("boxplot: quartiles and fence census match brute force") {
    val rows = Stats.boxplotQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { case (et, n, q1, q3, iqr, lo, hi) =>
      val vs = vals.filter(_._1 == et).map(_._2).sorted
      assert(n === vs.length.toLong)
      assert(q1 === vs(((vs.length + 3) / 4 - 1).max(0)), s"$et q1")
      assert(q3 === vs(((vs.length * 3 + 3) / 4 - 1).max(0)), s"$et q3")
      assert(iqr === q3 - q1)
      assert(lo === vs.count(v => 2 * v < 2 * q1 - 3 * iqr).toLong, s"$et lo")
      assert(hi === vs.count(v => 2 * v > 2 * q3 + 3 * iqr).toLong, s"$et hi")
    }
  }

  test("kmv intersect: sketch algebra matches a hand-built replica and brackets truth") {
    val row = Stats.kmvIntersectQ(spark, sf).head()
    val users = Tables.events(spark, sf)
      .filter(col("event_type").isin(Stats.KmvSetA, Stats.KmvSetB))
      .select(col("event_type"),
        conv(substring(md5(concat(lit("u"), col("user_id"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val k = Stats.KmvK
    val ha = users.filter(_._1 == Stats.KmvSetA).map(_._2).distinct.sorted.take(k)
    val hb = users.filter(_._1 == Stats.KmvSetB).map(_._2).distinct.sorted.take(k)
    val hu = (ha ++ hb).distinct.sorted.take(k)
    def est(hs: Array[Long]): Double =
      if (hs.length < k) hs.length.toDouble
      else (k - 1).toDouble * math.pow(2.0, 60) / hs(k - 1)
    val common = hu.count(x => ha.contains(x) && hb.contains(x))
    assert(row.getInt(0) === ha.length && row.getInt(1) === hb.length)
    assert(row.getDouble(2) === est(ha) && row.getDouble(3) === est(hb))
    assert(row.getDouble(4) === est(hu))
    assert(row.getInt(5) === common)
    // the estimates should bracket the exact values loosely (k=64 sketch)
    val trueA = users.count(_._1 == Stats.KmvSetA).toDouble
    assert(row.getDouble(2) > trueA * 0.5 && row.getDouble(2) < trueA * 2.0)
  }

  test("gini: matches the sorted-list formula on quantized spends") {
    val row = Stats.giniQ(spark, sf).head()
    val spends = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("spend"))
      .select((col("spend") / Stats.GiniUnitCents).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = spends.length
    assert(row.getLong(0) === n.toLong)
    val sx = spends.map(BigInt(_)).sum
    val num = spends.zipWithIndex
      .map { case (x, i) => BigInt(x) * (2 * (i + 1) - n - 1) }.sum
    val brute = num.toDouble / (BigDecimal(sx) * n).toDouble
    assert(math.abs(row.getDouble(2) - brute) < 1e-12)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) < 1.0)
  }

  test("assortativity: matches brute-force edge-degree Pearson, r in [-1,1]") {
    val row = Graph.assortativityQ(spark, sf).head()
    val edges = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ds = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val dp = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val xs = edges.map(e => ds(e._1).toDouble)
    val ys = edges.map(e => dp(e._2).toDouble)
    val e = edges.length.toDouble
    assert(row.getLong(0) === edges.length.toLong)
    assert(math.abs(row.getDouble(1) - xs.sum / e) < 1e-9)
    val num = e * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum
    val den = math.sqrt(e * xs.map(x => x * x).sum - xs.sum * xs.sum) *
      math.sqrt(e * ys.map(y => y * y).sum - ys.sum * ys.sum)
    assert(math.abs(row.getDouble(3) - num / den) < 1e-9)
    assert(row.getDouble(3) >= -1.0 && row.getDouble(3) <= 1.0)
  }

  test("cusum: locator matches the brute-force scan of all split points") {
    val row = Stats.cusumQ(spark, sf).head()
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("x"))
      .orderBy(col("d"))
      .select(date_format(col("d"), "yyyy-MM-dd"), col("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = daily.length
    val total = daily.map(e => BigInt(e._2)).sum
    var cum = BigInt(0)
    val devs = daily.zipWithIndex.map { case ((day, x), i) =>
      cum += x
      (day, (cum * n - total * (i + 1)).abs)
    }
    val devmax = devs.map(_._2).max
    assert(row.getLong(0) === n.toLong)
    assert(BigInt(row.getLong(1)) === total)
    assert(row.getString(2) === devs.find(_._2 == devmax).get._1)
    assert(math.abs(row.getDouble(3)
      - devmax.toDouble / (total.toDouble * n)) < 1e-12)
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0)
  }

  test("bursts: runs match a brute-force island scan per type") {
    val rows = Behavior.burstsQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"),
        datediff(col("d"), lit("1995-01-01").cast("date")).as("dn"), col("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    rows.foreach { case (et, nBursts, nDays, longest) =>
      val ds = daily.filter(_._1 == et)
      val cs = ds.map(_._3).sorted
      val med = cs((cs.length + 1) / 2 - 1)
      val above = ds.filter(_._3 > med).map(_._2).sorted
      // island lengths from consecutive day numbers
      val runs = above.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, d) if d == e + 1 => (s, d) :: rest
        case (acc, d) => (d, d) :: acc
      }.map { case (s, e) => (e - s + 1).toLong }
      assert(nBursts === runs.length.toLong, s"$et bursts")
      assert(nDays === above.length.toLong, s"$et days")
      assert(longest === runs.max, s"$et longest")
    }
  }

  test("kcore: peeling is monotone and matches a brute-force simultaneous peel") {
    val rows = Graph.kcoreQ(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (1 to Graph.KcoreRounds))
    rows.sliding(2).foreach {
      case Array((_, s1, p1, e1), (_, s2, p2, e2)) =>
        assert(s2 <= s1 && p2 <= p1 && e2 <= e1)
      case _ => ()
    }
    var edges = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { case (r, nS, nP, nE) =>
      val okS = edges.groupBy(_._1).filter(_._2.length >= Graph.KcoreK).keySet
      val okP = edges.groupBy(_._2).filter(_._2.length >= Graph.KcoreK).keySet
      edges = edges.filter(e => okS(e._1) && okP(e._2))
      assert(nE === edges.length.toLong, s"round $r edges")
      assert(nS === edges.map(_._1).distinct.length.toLong, s"round $r supp")
      assert(nP === edges.map(_._2).distinct.length.toLong, s"round $r part")
    }
  }

  test("kanon: audit matches a brute-force equivalence-class census") {
    val row = graft.operators.Curation.kanonQ(spark, sf).head()
    val rel = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val classes = rel.groupBy(e => (e._1, e._2)).values.toSeq
    assert(row.getLong(0) === classes.length.toLong)
    assert(row.getLong(1) ===
      classes.count(_.length < graft.operators.Curation.KanonK).toLong)
    assert(row.getLong(2) === classes.filter(_.length <
      graft.operators.Curation.KanonK).map(_.length.toLong).sum)
    assert(row.getLong(3) === classes.count(
      _.map(_._3).distinct.length < graft.operators.Curation.KanonL).toLong)
    assert(row.getLong(4) === classes.map(_.length).min.toLong)
  }

  test("disorder: lateness matches a brute-force per-user running max") {
    val rows = graft.operators.Sessionize.disorderQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val late = scala.collection.mutable.Map[String, List[Long]]()
      .withDefaultValue(Nil)
    evs.groupBy(_._2).foreach { case (_, es) =>
      var seen = Long.MinValue
      es.sortBy(_._3).foreach { case (et, _, _, us) =>
        val l = if (seen > us) seen - us else 0L
        late(et) = l :: late(et)
        seen = math.max(seen, us)
      }
    }
    rows.foreach { case (et, n, nLate, maxS, totS) =>
      val ls = late(et)
      assert(n === ls.length.toLong, s"$et count")
      assert(nLate === ls.count(_ > 0L).toLong, s"$et late")
      assert(maxS === ls.max / 1000000L, s"$et max")
      assert(totS === ls.sum / 1000000L, s"$et total")
    }
  }

  test("cohort ltv: cumulative curve is monotone and conserves purchase revenue") {
    val rows = Behavior.cohortLtvQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalCents = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long")))
      .head().getLong(0)
    assert(rows.map(_._3).sum === totalCents)
    rows.groupBy(_._1).foreach { case (cw, cells) =>
      val sorted = cells.sortBy(_._2)
      // cum at each offset = running sum of the rev column
      var run = 0L
      sorted.foreach { case (_, off, rev, cum) =>
        run += rev
        assert(cum === run, s"cohort $cw offset $off")
      }
    }
  }

  test("above avg: counts match brute force and the predicate is division-free") {
    val rows = Aggregates.aboveAvgQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cust = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byNat = cust.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.map(_._1).toSet === byNat.keySet)
    rows.foreach { case (nat, n, above) =>
      val cs = byNat(nat)
      assert(n === cs.length.toLong, s"$nat count")
      val sum = cs.map(BigInt(_)).sum
      assert(above === cs.count(c => BigInt(c) * cs.length > sum).toLong,
        s"$nat above")
    }
  }

  test("trailing range: frame shrinks over gaps instead of reaching back") {
    val rows = Stats.trailingRangeQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val daily = rows.map(r => java.time.LocalDate.parse(r._1) -> r._2).toMap
    rows.foreach { case (dayS, _, trailing, present) =>
      val day = java.time.LocalDate.parse(dayS)
      val window = (0 until Stats.TrailingDays)
        .flatMap(k => daily.get(day.minusDays(k.toLong)))
      assert(trailing === window.sum, s"$dayS trailing")
      assert(present === window.length.toLong, s"$dayS present")
      assert(present <= Stats.TrailingDays.toLong)
    }
  }

  test("weighted median: crossing buckets match a brute-force weight walk") {
    val rows = Stats.weightedMedianQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        ((col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          / Stats.WMedianBucketCents).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (flag, tw, wmed, wp90) =>
      val hist = li.filter(_._1 == flag).groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toMap.toSeq.sortBy(_._1)
      val total = hist.map(_._2).sum
      assert(tw === total, s"$flag total")
      var cum = 0L
      var (m, p) = (Option.empty[Long], Option.empty[Long])
      hist.foreach { case (b, w) =>
        cum += w
        if (m.isEmpty && cum * 2 >= total) m = Some(b)
        if (p.isEmpty && cum * 10 >= total * 9) p = Some(b)
      }
      assert(wmed === m.get, s"$flag median")
      assert(wp90 === p.get, s"$flag p90")
      assert(wmed <= wp90)
    }
  }

  test("mode: histogram argmax with the pinned smallest-value tie-break") {
    val rows = Aggregates.modeQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { case (et, n, modeV, modeC, share) =>
      val hist = vals.filter(_._1 == et).groupBy(_._2).view
        .mapValues(_.length.toLong).toMap
      assert(n === hist.values.sum)
      val m = hist.values.max
      assert(modeC === m, s"$et count")
      assert(modeV === hist.filter(_._2 == m).keys.min, s"$et tie-break")
      assert(share === m.toDouble / n.toDouble)
    }
  }

  test("string agg: roster is the first-N alphabetical members, pinned order") {
    val rows = Aggregates.stringAggQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val cust = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    rows.foreach { case (nat, nListed, roster) =>
      val names = cust.filter(_._1 == nat).map(_._2).sorted
        .take(Aggregates.StringAggTopN)
      assert(nListed === names.length.toLong, s"$nat count")
      assert(roster === names.mkString(","), s"$nat roster")
    }
  }

  test("lorenz: deciles partition customers, shares are monotone to 1.0") {
    val rows = Stats.lorenzQ(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nCust = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_._2).sum === nCust)
    // the curve is convex-ish monotone: shares rise to exactly 1.0
    rows.sliding(2).foreach {
      case Array((_, _, _, s1), (_, _, _, s2)) => assert(s2 >= s1)
      case _ => ()
    }
    assert(math.abs(rows.last._4 - 1.0) < 1e-12)
    // Gini consistency: the curve and X161's coefficient describe the
    // same distribution — cum share of the bottom half is well below it
    val gini = Stats.giniQ(spark, sf).head().getDouble(2)
    if (gini > 0.1) {
      val bottomHalf = rows.filter(_._1 <= 5).map(_._3).sum.toDouble /
        rows.map(_._3).sum
      assert(bottomHalf < 0.5)
    }
  }

  test("growth accounting: WAU identity holds week over week") {
    val rows = Behavior.growthAccountingQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // WAU_w = new + retained + resurrected; and the flow identity
    // WAU_w = WAU_{w-1} + new_w + resurrected_w - churned_w for
    // CONSECUTIVE weeks
    val wau = rows.map(r => r._1 -> (r._2 + r._3 + r._4)).toMap
    rows.sliding(2).foreach {
      case Array((w1, _, _, _, _), (w2, nNew, nRet, nRes, nChu)) =>
        val d1 = java.time.LocalDate.parse(w1)
        val d2 = java.time.LocalDate.parse(w2)
        if (java.time.temporal.ChronoUnit.DAYS.between(d1, d2) == 7L) {
          assert(wau(w2) === wau(w1) + nNew + nRes - nChu,
            s"flow identity at $w2")
          assert(nRet === wau(w1) - nChu, s"retained identity at $w2")
        }
      case _ => ()
    }
    // every first-week user is 'new': week 1 has no retained/resurrected
    assert(rows.head._3 === 0L && rows.head._4 === 0L)
  }

  test("range planner: buckets partition the table and match brute boundaries") {
    val rows = Stats.rangePlannerQ(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val keys = Tables.orders(spark, sf)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = keys.map(_._2).sum
    assert(rows.map(_._2).sum === n)
    assert(rows.map(_._3).sum === keys.length.toLong)
    // brute boundaries: b_i = smallest key with cum >= ceil(i*n/16)
    val nP = Stats.RangePlanN
    var cum = 0L
    val cums = keys.map { case (k, c) => cum += c; (k, cum) }
    val bounds = (1 to nP).map { i =>
      val rank = (n * i + nP - 1) / nP
      cums.find(_._2 >= rank).get._1
    }
    val brute = keys.groupBy { case (k, _) =>
      bounds.zipWithIndex.find { case (b, _) => k <= b }
        .map(_._2 + 1).getOrElse(nP)
    }.view.mapValues(es => (es.map(_._2).sum, es.length.toLong)).toMap
    rows.foreach { case (b, nr, nk) =>
      assert((nr, nk) === brute(b), s"bucket $b")
    }
  }

  test("knn graph: degree census obeys the mutual-graph laws") {
    val rows = graft.operators.Similarity.knnGraphQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nVecs = Tables.embeddings(spark, sf).count()
    // the histogram partitions every node, degrees are bounded by K, and
    // the handshake sum is even (each mutual edge contributes 2)
    assert(rows.map(_._2).sum === nVecs)
    assert(rows.forall(_._1 <= graft.operators.Similarity.KnnGraphK.toLong))
    assert(rows.map { case (d, n) => d * n }.sum % 2 === 0L)
    // mutuality strictly prunes: mutual edges <= directed top-K edges / 2
    val handshake = rows.map { case (d, n) => d * n }.sum / 2
    assert(handshake <= nVecs * graft.operators.Similarity.KnnGraphK / 2)
  }

  test("audio stats: decoded features match the closed-form waveform exactly") {
    import graft.operators.MultiModal
    val rows = MultiModal.audioStatsQ(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.size.toLong === nDocs)
    // recompute a handful of clips from the waveform rule, bit-exact
    rows.keys.toSeq.sorted.take(5).foreach { id =>
      val samples = (0 until MultiModal.wavFrames(id))
        .map(i => MultiModal.wavSample(id, i).toLong)
      val flips = samples.sliding(2).count {
        case Seq(a, b) => a * b < 0
        case _ => false
      }
      assert(rows(id) === ((samples.length.toLong,
        samples.map(math.abs).max, samples.map(s => s * s).sum,
        flips.toLong)), s"clip $id")
    }
  }

  test("quantile merge: merged-sketch quantiles equal a direct global recompute") {
    val row = Stats.quantileMergeQ(spark, sf).head()
    val vals = Tables.events(spark, sf).select(col("value")).collect()
      .map(_.getDouble(0))
    val bins = vals.map { v =>
      math.max(0, math.min(Stats.SketchBins - 1,
        math.floor(v / Stats.SketchBinWidth).toInt))
    }
    assert(row.getLong(0) === bins.length.toLong)
    val nTypes = Tables.events(spark, sf)
      .select(col("event_type")).distinct().count()
    assert(row.getLong(1) === nTypes)
    val sorted = bins.sorted
    val p50 = sorted((bins.length + 1) / 2 - 1).toLong * Stats.SketchBinWidth
    val p90 = sorted((bins.length * 9 + 9) / 10 - 1).toLong * Stats.SketchBinWidth
    assert(row.getLong(2) === p50)
    assert(row.getLong(3) === p90)
  }

  test("left outer: preserved rows reconcile with the anti-join count") {
    val rows = graft.operators.Joins.leftOuterQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nCust = Tables.customer(spark, sf).count()
    val nOrders = Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum === nCust)
    assert(rows.map(_._4).sum === nOrders)
    // the null side IS the anti join
    val nNever = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(rows.map(_._3).sum === nNever)
  }

  test("zone map: stats are consistent with the planner and pruning is sound") {
    val rows = Stats.zoneMapQ(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val planner = Stats.rangePlannerQ(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // the zone map describes exactly the planner's buckets
    rows.foreach { case (b, nr, _, _, _) =>
      assert(nr === planner(b), s"bucket $b rows")
    }
    // zones tile the key space: min <= max, consecutive zones don't overlap
    rows.sliding(2).foreach {
      case Array((_, _, _, max1, _), (_, _, min2, _, _)) =>
        assert(min2 > max1)
      case _ => ()
    }
    // pruning soundness: a pruned zone really contains no probe key
    val keys = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0))
    val probeKeys = keys.filter(k =>
      k >= Stats.ZoneProbeLo && k <= Stats.ZoneProbeHi)
    rows.filter(_._5).foreach { case (b, _, mn, mx, _) =>
      assert(!probeKeys.exists(k => k >= mn && k <= mx), s"bucket $b")
    }
    // and the probe keys all live in unpruned zones
    val kept = rows.filterNot(_._5)
    probeKeys.foreach { k =>
      assert(kept.exists { case (_, _, mn, mx, _) => k >= mn && k <= mx })
    }
  }
}
