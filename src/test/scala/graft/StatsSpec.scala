package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.KmvSketch
import graft.operators.Stats

/** Percentile rank selection and the KMV sketch's lattice properties. */
class StatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("discrete percentile = value at rank ceil(q*n) on a known multiset") {
    // 10 values 1..10 -> p50 = v[5] = 5, p90 = v[9] = 9
    val df = Seq.tabulate(10)(i => ("t", java.sql.Timestamp.valueOf(
      f"2024-01-01 00:00:${i}%02d"), (i + 1).toDouble))
      .toDF("event_type", "ts", "value")
    df.createOrReplaceTempView("stats_spec_events")
    val byV = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("v"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    val r = df.select(col("event_type"), floor(col("value")).cast("long").as("v"))
      .withColumn("rn", row_number().over(byV))
      .withColumn("n", count(lit(1)).over(all))
      .groupBy(col("event_type"))
      .agg(max(when(col("rn") === ((col("n") + 1) / 2).cast("long"), col("v"))).as("p50"),
        max(when(col("rn") === ((col("n") * 9 + 9) / 10).cast("long"), col("v"))).as("p90"))
      .collect().head
    assert(r.getLong(1) === 5L && r.getLong(2) === 9L)
  }

  test("ks: d_num matches a brute-force supremum over the empirical CDFs") {
    val sfDir = "/root/testdata/sf0.001"
    val row = Stats.ksTestQ(spark, sfDir).head()
    val (na, nb, dNum) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val vals = graft.engine.Tables.events(spark, sfDir)
      .filter(col("event_type").isin(Stats.KsSampleA, Stats.KsSampleB))
      .select(col("event_type"), floor(col("value")).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val a = vals.filter(_._1 == Stats.KsSampleA).map(_._2)
    val b = vals.filter(_._1 == Stats.KsSampleB).map(_._2)
    assert(na == a.length && nb == b.length)
    val dBrute = (a ++ b).distinct.map { v =>
      math.abs(a.count(_ <= v).toLong * nb - b.count(_ <= v).toLong * na)
    }.max
    assert(dNum == dBrute, s"engine $dNum vs brute $dBrute")
    assert(dNum >= 0 && dNum <= na * nb) // D = d_num/(na*nb) ∈ [0, 1]
  }

  test("skyline: survivors undominated, eliminated points each dominated (brute force)") {
    val sfDir = "/root/testdata/sf0.001"
    // match by customer id — the query emits spend as double, so exact
    // tuples must come from the decimal-exact reference frame
    val skyIds = Stats.skylineQ(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val all = graft.engine.Tables.orders(spark, sfDir)
      .groupBy($"o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("spend"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDecimal(1)), r.getLong(2)))
    def dominates(a: (Long, BigDecimal, Long), b: (Long, BigDecimal, Long)) =
      a._2 >= b._2 && a._3 <= b._3 && (a._2 > b._2 || a._3 < b._3)
    assert(skyIds.nonEmpty && skyIds.size < all.length)
    // no frontier point is dominated by ANY point
    all.filter(s => skyIds(s._1)).foreach(s =>
      assert(!all.exists(a => dominates(a, s)), s"frontier point $s is dominated"))
    // every eliminated point is dominated by SOME point
    all.filterNot(a => skyIds(a._1)).foreach(a =>
      assert(all.exists(b => dominates(b, a)), s"$a eliminated but undominated"))
  }

  test("winsorize: clamped sum bounded by raw extremes, thresholds are real percentiles") {
    val rows = Stats.winsorizeQ(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (raw, win) = (r.getLong(4), r.getLong(5))
      val (nLo, nHi) = (r.getLong(6), r.getLong(7))
      assert(lo <= hi)
      assert(win >= n * lo && win <= n * hi) // all values inside [lo, hi] after clamp
      if (nLo == 0 && nHi == 0) assert(win == raw) // nothing clamped -> identity
      // at most 5% of mass below lo (strictly-below is what gets clamped)
      assert(nLo * 20 <= n && nHi * 20 <= n,
        s"${r.getString(0)}: clamped ($nLo, $nHi) of $n exceeds 5% per side")
    }
  }

  test("percentilesQ columns are ordered and keyed deterministically") {
    val out = Stats.percentilesQ(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSeq === rows.map(_.getString(0)).toSeq.sorted)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4)
        && r.getLong(4) <= r.getLong(5),
        s"min <= p50 <= p90 <= max violated: $r")
    }
  }

  test("KMV buffer is the k smallest distinct values, order-independent") {
    val k = 8
    val agg = new KmvSketch(k)
    val xs = Seq(5L, 3L, 9L, 3L, 1L, 7L, 11L, 2L, 8L, 6L, 4L, 10L, 5L)
    val expected = xs.distinct.sorted.take(k)
    // sequential reduce in two different orders
    val a = xs.foldLeft(agg.zero)(agg.reduce)
    val b = xs.reverse.foldLeft(agg.zero)(agg.reduce)
    assert(a === expected && b === expected)
    // arbitrary split + merge = same result (partial-aggregation safety)
    for (split <- Seq(1, 4, 7, 12)) {
      val (l, r) = xs.splitAt(split)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m === expected, s"split at $split")
    }
  }

  test("KMV estimate is exact below k and within 3x above k") {
    val out = Stats.kmvDistinctQ(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    // Exact counts computed here, not in the query: the exact rider was
    // dropped from kmvDistinctQ in round 4 so the bench times the sketch
    // path alone (at scale the exact pass costs more than the sketch).
    val exactByType = graft.engine.Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("event_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val exact = exactByType(r.getString(0)).toDouble
      val est = r.getDouble(2)
      if (exact < Stats.KmvK) assert(est === exact)
      else assert(est > exact / 3 && est < exact * 3,
        s"KMV estimate $est far from exact $exact")
    }
  }

  test("HLL estimate tracks exact distinct within the m=64 error band") {
    val out = Stats.hllDistinctQ(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    val exactByType = graft.engine.Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("event_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val exact = exactByType(r.getString(0)).toDouble
      val est = r.getDouble(3)
      // sigma = 1.04/sqrt(64) = 13%; allow 4 sigma
      assert(est > exact * 0.48 && est < exact * 1.52,
        s"HLL estimate $est outside error band of exact $exact")
      // registers are a 64-cell array at any cardinality
      assert(r.getLong(1) <= Stats.HllM)
    }
  }

  test("HLL merged __all__ row equals sketching the ungrouped union directly") {
    val sf = "/root/testdata/sf0.001"
    val allRow = Stats.hllMergeQ(spark, sf)
      .filter(col("event_type") === "__all__").collect().head
    // sketch the whole table as ONE group by collapsing the type first
    val union = graft.engine.Tables.events(spark, sf)
      .withColumn("event_type", lit("__all__"))
    val viaOneGroup = {
      val h = conv(substring(md5(concat(lit("e"), col("event_id"))), 1, 15), 16, 10)
        .cast("long")
      val rest = col("h").bitwiseAND(lit((1L << 54) - 1))
      val rho = when(rest === 0, lit(55)).otherwise(lit(55) - length(bin(rest)))
      union.select(col("event_type"), h.as("h"))
        .select(col("event_type"), shiftright(col("h"), 54).as("bucket"),
          rho.cast("int").as("rho"))
        .groupBy(col("event_type"), col("bucket")).agg(max(col("rho")).as("reg"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("buckets_hit"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - reg)")).cast("long").as("s_hit"))
        .select(col("buckets_hit"),
          (col("s_hit") + (lit(64L) - col("buckets_hit")) * lit(1L << 55)).as("s_int"))
        .collect().head
    }
    assert(allRow.getLong(1) === viaOneGroup.getLong(0), "buckets_hit differ")
    assert(allRow.getLong(2) === viaOneGroup.getLong(1),
      "merged register sum != direct union sketch — merge identity broken")
  }

  test("join-cardinality estimate tracks exact key overlap within the band") {
    val sf = "/root/testdata/sf0.01"
    val r = Stats.joinCardEstQ(spark, sf).collect().head
    // exact calibration (the join the operator exists to avoid) lives here
    val orders = graft.engine.Tables.orders(spark, sf)
      .select(col("o_custkey").as("k")).distinct()
    val cust = graft.engine.Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === graft.operators.Joins.BloomSegment)
      .select(col("c_custkey").as("k")).distinct()
    val exactA = orders.count().toDouble
    val exactB = cust.count().toDouble
    val exactI = orders.join(cust, Seq("k"), "left_semi").count().toDouble
    // m=64 -> sigma 13%; inclusion-exclusion compounds three estimates, so
    // allow a wide but meaningful band (each leg 4 sigma, intersect ~60%)
    assert(r.getDouble(0) > exactA * 0.48 && r.getDouble(0) < exactA * 1.52)
    assert(r.getDouble(1) > exactB * 0.48 && r.getDouble(1) < exactB * 1.52)
    assert(r.getDouble(3) > exactI * 0.4 && r.getDouble(3) < exactI * 1.6,
      s"intersect estimate ${r.getDouble(3)} far from exact $exactI")
  }

  test("outliers: every flagged row is > 3 sd from its group mean (exact check)") {
    val sf = "/root/testdata/sf0.01"
    val flagged = Stats.outliersQ(spark, sf).collect()
    assert(flagged.nonEmpty, "harness data should contain 3-sigma outliers")
    // recompute naive per-type mean/sd on the driver from the same quantization
    val rows = graft.engine.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> math.floor(r.getDouble(1) * 1e6 + 0.5) / 1e6)
    val byType = rows.groupBy(_._1).map { case (t, vs) =>
      val xs = vs.map(_._2)
      val m = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => x * x).sum / xs.length - m * m)
      t -> (m, sd)
    }
    flagged.foreach { r =>
      val (m, sd) = byType(r.getString(1))
      val x = r.getLong(2) / 1e6
      assert(math.abs(x - m) > 2.9 * sd, s"row $r not an outlier (m=$m sd=$sd)")
    }
  }

  test("window analytics: gaps non-negative, quartiles balanced per type") {
    val rows = Stats.windowAnalyticsQ(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // -1 marks a user's first event; real gaps are non-negative (ts-ordered)
    rows.foreach { r =>
      val gap = r.getLong(2)
      assert(gap >= -1, s"negative inter-event gap $gap")
      val q = r.getInt(4)
      assert(q >= 1 && q <= 4, s"quartile $q out of range")
    }
    // ntile buckets within a partition differ in size by at most one —
    // check per event_type via an independent recount
    val byType = graft.engine.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // The partition key isn't in the output, so assert the global quartile
    // counts: each quartile's total ≈ N/4 within ±1 per event_type partition.
    val totals = rows.groupBy(_.getInt(4)).view.mapValues(_.length).toMap
    val n = rows.length
    val slack = byType.size // ±1 per event_type partition
    (1 to 4).foreach { q =>
      assert(math.abs(totals(q) - n / 4) <= slack + 3,
        s"quartile $q count ${totals(q)} far from ${n / 4}")
    }
  }

  test("histogram-rank precondition: events.value domain is bounded and quantized") {
    // q_percentiles / q_window_analytics / q_mad_outliers rank a
    // (event_type, value) HISTOGRAM instead of the raw rows — scale-safe
    // ONLY while the ranked value domain stays far below the row count.
    // That holds because value is 2-decimal-quantized on a bounded range
    // (≤ ~56k cells however many TB of events flow through); this guards
    // the data contract the plans rely on. A continuous domain would make
    // the histogram row-sized — the documented fallback is the
    // constant-state bin sketch (q_quantile_sketch, Stats.scala).
    val ev = graft.engine.Tables.events(spark, "/root/testdata/sf0.001")
    val bad = ev.filter(
      col("value") < 0 || col("value") > 1000 ||
        abs(col("value") * 100 - round(col("value") * 100, 0)) > lit(1e-9))
      .count()
    assert(bad === 0L,
      "events.value left its quantized bounded domain — histogram-rank " +
        "plans (q_percentiles/q_window_analytics/q_mad_outliers) must " +
        "switch to the q_quantile_sketch bin-sketch path")
    val cells = ev.select(col("event_type"), col("value")).distinct().count()
    assert(cells <= 60000L * 5,
      s"histogram cardinality $cells exceeds the documented domain bound")
  }

  test("quantile sketch is within one bin width of the exact percentiles") {
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = Stats.percentilesQ(spark, sfDir).collect()
        .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
      val sketch = Stats.quantileSketchQ(spark, sfDir).collect()
      assert(sketch.nonEmpty)
      sketch.foreach { r =>
        val (p50, p90) = exact(r.getString(0))
        val (lo50, lo90) = (r.getLong(2), r.getLong(3))
        // the sketch reports the lower boundary of the bin holding the true
        // rank, so exact ∈ [lo, lo + width) — the advertised error bound
        assert(lo50 <= p50 && p50 < lo50 + Stats.SketchBinWidth,
          s"p50 $p50 outside sketch bin [$lo50, ${lo50 + Stats.SketchBinWidth})")
        assert(lo90 <= p90 && p90 < lo90 + Stats.SketchBinWidth,
          s"p90 $p90 outside sketch bin [$lo90, ${lo90 + Stats.SketchBinWidth})")
      }
    }
  }

  test("histogram-ranked quartile equals the builtin ntile row for row") {
    val sfDir = "/root/testdata/sf0.001"
    val ours = Stats.windowAnalyticsQ(spark, sfDir)
      .select(col("event_id"), col("value_quartile")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    val builtin = graft.engine.Tables.events(spark, sfDir)
      .select(col("event_id"), ntile(4).over(w).as("q")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ours === builtin)
  }

  test("CMS estimate is an upper bound on the exact count for every probe") {
    val sfDir = "/root/testdata/sf0.01"
    val est = Stats.cmsHeavyQ(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size === Stats.CmsProbes.size)
    val exact = graft.engine.Tables.documents(spark, sfDir)
      .select(explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
        w => w =!= "")).as("word"))
      .groupBy(col("word")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Stats.CmsProbes.foreach { w =>
      assert(est(w) >= exact.getOrElse(w, 0L),
        s"CMS underestimated '$w': ${est(w)} < ${exact.getOrElse(w, 0L)}")
    }
    // the probes include words that actually occur, so the sketch is live
    assert(Stats.CmsProbes.exists(w => exact.getOrElse(w, 0L) > 0))
  }

  test("simhash banding is lossless for the Hamming radius (pigeonhole)") {
    // any two 32-bit values within hamming HamMax share >= 1 of the 4 bytes
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val a = rnd.nextInt() & 0xFFFFFFFFL
      val flips = rnd.shuffle((0 until 32).toList)
        .take(rnd.nextInt(graft.operators.TextAnalysis.HamMax + 1))
      val b = flips.foldLeft(a)((v, j) => v ^ (1L << j))
      val shared = (0 until graft.operators.TextAnalysis.SimBands)
        .exists(j => ((a >> (8 * j)) & 255) == ((b >> (8 * j)) & 255))
      assert(shared, f"a=$a%08x b=$b%08x")
    }
  }

  test("label weights: balanced reweighting makes class masses equal") {
    val rows = Stats.labelWeightsQ(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    // each class's total mass n_c·w_c = n/k: equal across classes (up to
    // the 1e-6 output rounding), and all masses sum back to ~n
    val masses = rows.map(t => t._2 * t._3)
    val expected = total.toDouble / rows.length
    masses.foreach(m => assert(math.abs(m - expected) < 1e-4 * expected))
    assert(math.abs(masses.sum - total) < 1e-3 * total)
    // rarest class gets the largest weight
    val byN = rows.sortBy(_._2)
    assert(byN.head._3 >= byN.last._3)
  }
  test("trailing p90: histogram fan-out equals a direct per-window recomputation") {
    val sfDir = "/root/testdata/sf0.001"
    val spark2 = TestSpark.spark
    val got = Stats.trailingP90Q(spark2, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // direct recomputation: for each (type, day), gather raw cents of the
    // trailing 7 days and take min v with cum >= ceil(0.9 n)
    val raw = graft.engine.Tables.events(spark2, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        floor(col("value") * 100).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val days = raw.map(_._2).distinct
    val expected = (for {
      t <- raw.map(_._1).distinct; day <- days
      vs = raw.filter { case (tt, d, _) =>
        tt == t && !d.isAfter(day) && d.isAfter(day.minusDays(Stats.TrailP90Days))
      }.map(_._3).sorted
      if vs.nonEmpty
    } yield {
      val n = vs.length
      val rank = (9 * n + 9) / 10 // ceil(0.9 n)
      (t, day.toString) -> (vs(rank - 1), n.toLong)
    }).toMap
    assert(got === expected,
      s"mismatch sample: ${(expected.toSet -- got.toSet).take(2)} vs ${(got.toSet -- expected.toSet).take(2)}")
  }
  test("rolling HLL: merged-sketch estimate tracks the exact trailing distinct") {
    val sfDir = "/root/testdata/sf0.001"
    val spark2 = TestSpark.spark
    // Read the sketch the way a consumer must (X56's design note): below
    // ~2.5·m the raw harmonic estimate overshoots and the standard
    // linear-counting read m·ln(m/(m−hit)) applies — ln lives HERE in
    // the consumer, never in the gated engine artifact (the artifact is
    // registers + exact-integer denominator + one literal division).
    val m = Stats.HllM.toDouble
    val est = Stats.rollingHllQ(spark2, sfDir).collect()
      .map { r =>
        val hit = r.getLong(1).toDouble
        val corrected =
          if (hit < m) m * math.log(m / (m - hit)) else r.getDouble(3)
        r.getString(0) -> corrected
      }.toMap
    // exact trailing-7d distinct users per day, recomputed directly
    val raw = graft.engine.Tables.events(spark2, sfDir)
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct().collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1))
    val days = raw.map(_._1).distinct
    days.foreach { day =>
      val exact = raw.filter { case (d, _) =>
        !d.isAfter(day) && d.isAfter(day.minusDays(Stats.RollingHllDays))
      }.map(_._2).distinct.length
      val e = est(day.toString)
      // 64-register HLL: ~13% standard error; allow 3 sigma
      assert(math.abs(e - exact) <= 0.4 * exact + 5,
        s"day $day: est $e vs exact $exact")
    }
    assert(est.size === days.size)
  }

  test("q_auc matches brute-force pairwise AUC (ties counted half) per cohort") {
    val sf = "/root/testdata/sf0.001"
    val got = Stats.aucQ(spark, sf).collect()
      .map(r => r.getAs[Long]("cohort") ->
        (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          r.getAs[Long]("auc_ppm"))).toMap
    // independent truth: AUC = (#(pos>neg) + ½·#(pos==neg)) / (n1·n0)
    // over the SAME per-mille-quantized scores, brute-forced driver-side
    val rows = graft.engine.Tables.events(spark, sf)
      .select((col("user_id") % 4).as("cohort"),
        least(floor(col("value") * 1000.0 / Stats.CalibValueScale)
          .cast("long"), lit(999L)).as("pm"),
        (col("event_type") === "purchase").as("pos"))
      .collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("pm"),
        r.getAs[Boolean]("pos")))
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      val p = rs.filter(_._3).map(_._2)
      val n = rs.filterNot(_._3).map(_._2)
      var wins2 = 0L // doubled: win=2, tie=1
      for (a <- p; b <- n)
        wins2 += (if (a > b) 2L else if (a == b) 1L else 0L)
      val (n1, n0, aucPpm) = got(cohort)
      assert(n1 === p.length.toLong && n0 === n.length.toLong)
      assert(aucPpm === wins2 * 500000L / (n1 * n0),
        s"cohort $cohort: rank-based vs pairwise disagree")
    }
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
  }

  test("q_pr_auc: bounds, class totals, and best-F1 dominance hold per cohort") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Stats.prAucQ(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSet === Set(0L, 1L, 2L, 3L))
    val byType = graft.engine.Tables.events(spark, sfDir)
      .groupBy((col("user_id") % 4).as("cohort"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("pos"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (cohort, nPos, nNeg) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (ap, f1) = (r.getLong(3), r.getLong(4))
      assert(nPos + nNeg === byType(cohort)._1 && nPos === byType(cohort)._2)
      assert(ap >= 0 && ap <= 1000000L, s"AP out of [0,1]: $ap")
      assert(f1 >= 0 && f1 <= 1000000L, s"F1 out of [0,1]: $f1")
      // a random ranker's AP ≈ base rate; the monotone scorer must beat it
      val baseRatePpm = nPos * 1000000L / (nPos + nNeg)
      assert(ap > baseRatePpm, s"cohort $cohort: AP $ap <= base $baseRatePpm")
    }
  }

  test("q_crosscorr: pair counts are lag-symmetric and lag 0 is the joint-day frame") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Stats.crosscorrQ(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === (-7L to 7L).toSet)
    // pairing (d, d−l) and (d, d+l) cover the same day pairs — the
    // calendar-overlap count must be symmetric even though the moments
    // are not (lead vs lag)
    (1L to 7L).foreach { l =>
      assert(rows(l).getLong(1) === rows(-l).getLong(1),
        s"n(lag $l) != n(lag -$l)")
    }
    // at lag 0 both series align on the same days: Σa and Σb are the
    // full-overlap sums and n is the day count of the joint calendar
    val nDays = graft.engine.Tables.events(spark, sfDir)
      .filter(col("event_type").isin(Stats.CrossCorrA, Stats.CrossCorrB))
      .select(to_date(col("ts"))).distinct().count()
    assert(rows(0L).getLong(1) === nDays)
  }

  test("q_quantile_normalize: normalized values live in the global domain and group sizes survive") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Stats.quantileNormalizeQ(spark, sfDir).collect()
    val ev = graft.engine.Tables.events(spark, sfDir)
      .select(col("event_type"), floor(col("value")).cast("long").as("v"))
    val sizes = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (gMin, gMax) = {
      val r = ev.agg(min(col("v")), max(col("v"))).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(rows.map(_.getString(0)).toSet === sizes.keySet)
    rows.foreach { r =>
      val g = r.getString(0)
      assert(r.getLong(1) === sizes(g), s"$g: n drifted")
      // mapped values are VALUES OF THE GLOBAL DISTRIBUTION — bounded by
      // its extremes, and the top quantile maps exactly to the global max
      assert(r.getLong(3) >= gMin && r.getLong(4) <= gMax)
      assert(r.getLong(4) === gMax,
        s"$g: q=1000 must map to the global max (rank selection at N)")
    }
  }

  test("q_target_encode: encodings are leak-free group means in exact cents") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Stats.targetEncodeQ(spark, sfDir).collect()
    import org.apache.spark.sql.types.DecimalType
    val raw = graft.engine.Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("p"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byGroup = raw.groupBy(_._1)
    rows.foreach { r =>
      val (p, n) = (r.getString(0), r.getLong(1))
      val cs = byGroup(p).map(_._2)
      assert(n === cs.length)
      val s = cs.sum
      // driver-side recomputation of the LOO fold — truncating division,
      // exactly the operator's arithmetic
      val encs = cs.map(c => (s - c) / (cs.length - 1))
      assert(r.getLong(2) === encs.sum, s"$p: sum_enc mismatch")
      assert(r.getLong(3) === encs.min && r.getLong(4) === encs.max)
    }
  }

  test("q_heavy_hitters: equals the brute-force heavy set; MG superset law") {
    val sfDir = "/root/testdata/sf0.001"
    val out = Stats.heavyHittersQ(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val counts = graft.engine.Tables.documents(spark, sfDir)
      .select(explode(graft.engine.Text.words).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = counts.map(_._2).sum
    val brute = counts.filter { case (_, c) => c * Stats.HhK > n }.toMap
    assert(out === brute, "exact heavy set must equal brute force")
    assert(out.nonEmpty, "fixture should have heavy hitters at k=200")

    // MG superset law on adversarial random streams: any item with
    // count > n/k survives a single Misra-Gries(k) pass, whatever the
    // arrival order
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val k = 1 + rnd.nextInt(8)
      val stream = Array.fill(200 + rnd.nextInt(800))(rnd.nextInt(30))
      val m = scala.collection.mutable.HashMap.empty[Int, Long]
      stream.foreach { w =>
        val cur = m.getOrElse(w, 0L)
        if (cur > 0L || m.size < k) m(w) = cur + 1L
        else {
          m.mapValuesInPlace((_, c) => c - 1L)
          m.filterInPlace((_, c) => c > 0L)
        }
      }
      val exact = stream.groupBy(identity).view.mapValues(_.length.toLong)
      exact.foreach { case (w, c) =>
        if (c * k > stream.length)
          assert(m.contains(w),
            s"k=$k n=${stream.length}: heavy item $w (count $c) evicted")
      }
    }
  }

  test("q_theil_sen: median slope recomputes; robust-vs-OLS both present") {
    val sfDir = "/root/testdata/sf0.001"
    val row = Stats.theilSenQ(spark, sfDir).head()
    import org.apache.spark.sql.types.DecimalType
    val daily = graft.engine.Tables.orders(spark, sfDir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(((sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long"))) / count(lit(1))).cast("long").as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1)
    val n = daily.length.toLong
    assert(row.getLong(0) === n)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield {
      val dy = daily(j)._2 - daily(i)._2
      val dd = daily(j)._1 - daily(i)._1
      if (dy < 0) -((-dy) * 1000L / dd) else dy * 1000L / dd
    }).sorted
    assert(row.getLong(1) === slopes.length.toLong)
    assert(row.getLong(2) === slopes(((slopes.length + 1) / 2 - 1).toInt),
      "Theil-Sen median slope recompute")
    // OLS recompute with start-anchored t
    val t0 = daily.head._1
    val (st, sx, stt, stx) = daily.foldLeft((0L, 0L, 0L, 0L)) {
      case ((a, b, c, d2), (day, x)) =>
        val t = day - t0
        (a + t, b + x, c + t * t, d2 + t * x)
    }
    val num = n * stx - st * sx
    val den = n * stt - st * st
    val ols = if (num < 0) -((-num) * 1000L / den) else num * 1000L / den
    assert(row.getLong(3) === ols, "OLS contrast recompute")
  }

  test("q_hll_est: one estimator definition, exact leg exact, error in the m=64 band") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Stats.hllEstQ(spark, sfDir).collect()
    val ests = Stats.hllDistinctQ(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val exact = graft.engine.Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(countDistinct(col("event_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) === exact(t), s"$t: exact leg drifted")
      // the gate's estimate IS X56's estimate — one definition, not a
      // reimplemented eval grading the wrong sketch
      assert((r.getLong(3), r.getDouble(4)) === ests(t))
      val err = r.getLong(5)
      assert(err === math.floor(
        math.abs(r.getDouble(4) / exact(t) - 1.0) * 1000.0).toLong)
      // m=64 → σ ≈ 1.04/√64 = 13%; 3σ band (the eval exists to MEASURE
      // this, but an estimate 40%+ off means the sketch is broken)
      assert(err < 400L, s"$t: HLL error $err‰ outside any plausible band")
    }
  }

  test("q_decile_lift: partition identity, monotone capture, closing lift = 1000") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Stats.decileLiftQ(spark, sfDir).collect()
    val nEvents = graft.engine.Tables.events(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum === nEvents, "deciles partition the rows")
    val cumPos = rows.map(_.getLong(4))
    assert(cumPos.zip(cumPos.tail).forall { case (a, b) => a <= b },
      "cumulative capture must be nondecreasing")
    val last = rows.last
    assert(last.getLong(5) === 1000L, "full-population gain is 1000 permille")
    assert(last.getLong(6) === 1000L, "full-population lift is exactly 1.0")
    // lift identity per row: lift = cum_pos*n_tot*1000 div (cum_n*pos_tot)
    val posTot = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      assert(r.getLong(6) ===
        r.getLong(4) * nEvents * 1000L / (r.getLong(3) * posTot))
    }
  }

  test("q_conformal: qhat is the exact conformal rank; coverage recomputes") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Stats.conformalQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val qhat = rows.head.getLong(4)
    val nCal = rows.head.getLong(5)
    val rRank = rows.head.getLong(6)
    assert(rows.forall(r => r.getLong(4) == qhat && r.getLong(5) == nCal),
      "qhat and n_cal are global constants")
    // driver-side recompute of the calibration quantile
    val ev = graft.engine.Tables.events(spark, sfDir)
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("c"),
        conv(substring(md5(concat(lit("cf"), col("event_id"))), 1, 15), 16, 10)
          .cast("long").%(1000L).as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val preds = ev.filter(_._3 < Stats.ConfTrainPm).groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(_._2).sum / xs.length }
    val calScores = ev
      .filter(e => e._3 >= Stats.ConfTrainPm && e._3 < Stats.ConfCalPm)
      .flatMap(e => preds.get(e._1).map(p => math.abs(e._2 - p)))
      .sorted
    assert(nCal === calScores.length.toLong)
    val r = ((nCal + 1) * 9 + 9) / 10
    assert(rRank === r)
    assert(qhat === calScores((r - 1).toInt),
      "qhat must be the r-th smallest calibration score")
    // coverage recompute per event_type on the test split
    val test = ev.filter(_._3 >= Stats.ConfCalPm)
    rows.foreach { row =>
      val t = row.getString(0)
      val ts = test.filter(_._1 == t)
      val covered = ts.count(e => math.abs(e._2 - preds(t)) <= qhat).toLong
      assert(row.getLong(2) === ts.length.toLong)
      assert(row.getLong(3) === covered)
      assert(row.getLong(7) === covered * 1000L / ts.length)
    }
  }
}
