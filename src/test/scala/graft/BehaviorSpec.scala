package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Behavior, Sessionize, Stats}

/** Semantic invariants of the behavioral/statistical report family — the
  * properties that must hold on ANY input, checked on the harness data
  * (cross-engine equality is the DuckDB gate's job; these pin meaning). */
class BehaviorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("cumulative users: monotone, n_new sums to final, bounded by actives") {
    val rows = Behavior.cumulativeUsersQ(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.sliding(2).forall {
      case Array(a, b) => a._4 <= b._4; case _ => true }) // cum monotone
    assert(rows.map(_._3).sum == rows.last._4) // Σ n_new = final cumulative
    assert(rows.forall(r => r._3 <= r._2)) // new users were active that day
    val totalUsers = graft.engine.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.last._4 == totalUsers)
    // day 1: everyone seen is new
    assert(rows.head._2 == rows.head._3 && rows.head._3 == rows.head._4)
  }

  test("wau: bounded by cumulative users, >= daily actives, full windows only") {
    val wau = Behavior.wauQ(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cum = Behavior.cumulativeUsersQ(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(wau.nonEmpty)
    // the ledger starts only once a FULL trailing window exists: the first
    // WauWindowDays-1 calendar days are excluded, nothing after is
    val firstFull = java.time.LocalDate.parse(cum.head._1)
      .plusDays(Behavior.WauWindowDays - 1).toString
    assert(wau.keySet.min == firstFull)
    assert(wau.keySet.forall(_ >= firstFull))
    cum.filter(_._1 >= firstFull).foreach { case (day, nActive, cumUsers) =>
      val w = wau(day) // every active day past the ramp appears
      assert(w >= nActive, s"$day: wau $w < daily active $nActive")
      assert(w <= cumUsers, s"$day: wau $w > cumulative $cumUsers")
    }
  }

  test("funnel stages are monotone: users >= signup >= view >= purchase") {
    val r = Behavior.funnelQ(spark, sfDir).collect()(0)
    val (users, s, v, p) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users >= s && s >= v && v >= p,
      s"funnel not monotone: $users >= $s >= $v >= $p")
    assert(p > 0, "harness data should convert some users end to end")
  }

  test("cohort retention: offset-0 cell equals the cohort's user count") {
    val rows = Behavior.cohortRetentionQ(spark, sfDir).collect()
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (_, cells) =>
      val zero = cells.find(_.getLong(1) == 0L)
      assert(zero.isDefined, "every cohort is active in its first week")
      val peak = cells.map(_.getLong(2)).max
      assert(zero.get.getLong(2) == peak,
        "offset-0 must be the cohort's maximum (everyone active at start)")
    }
  }

  test("audience overlap is bounded by both audience sizes") {
    Behavior.audienceOverlapQ(spark, sfDir).collect().foreach { r =>
      val (ov, a, b) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ov > 0 && ov <= math.min(a, b), s"overlap $ov vs sizes $a/$b")
    }
  }

  test("event paths: per-source edge counts sum to the source total") {
    val rows = Behavior.eventPathsQ(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, edges) =>
      assert(edges.map(_.getLong(2)).sum == edges.head.getLong(3))
    }
  }

  test("session paths: frequencies positive, paths non-empty, limit respected") {
    val rows = Sessionize.sessionPathsQ(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Sessionize.PathTopK)
    assert(rows.forall(r => r.getString(0).nonEmpty && r.getLong(1) > 0))
    // ordered by frequency desc
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("spearman sums satisfy rank algebra (Σ2r = n(n+1)) and |rho| <= 1") {
    Stats.spearmanQ(spark, sfDir).collect().foreach { r =>
      val n = r.getLong(1).toDouble
      val (sx, sy) = (r.getLong(2), r.getLong(3))
      // doubled tie-averaged ranks over n rows always sum to n(n+1)
      assert(sx == (n * (n + 1)).toLong, s"sx $sx != n(n+1)")
      assert(sy == (n * (n + 1)).toLong, s"sy $sy != n(n+1)")
      val num = n * r.getLong(6) - sx.toDouble * sy
      val dx = n * r.getLong(4) - sx.toDouble * sx
      val dy = n * r.getLong(5) - sy.toDouble * sy
      val rho = num / math.sqrt(dx * dy)
      assert(rho.abs <= 1.0001, s"rho $rho out of range")
    }
  }

  test("mad outliers: mad >= 0 and outliers < group size") {
    Stats.madOutliersQ(spark, sfDir).collect().foreach { r =>
      assert(r.getLong(3) >= 0) // mad
      assert(r.getLong(4) < r.getLong(1)) // outliers < n_events
    }
  }

  test("streaks: crafted islands produce the expected best-run histogram") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // user 1: 1-2-3, gap, 5-6, gap, 10 → best 3
    // user 2: alternating days → best 1
    // user 3: 5 consecutive → best 5
    val days = Seq(
      (1L, 1), (1L, 2), (1L, 3), (1L, 5), (1L, 6), (1L, 10),
      (2L, 1), (2L, 3), (2L, 5),
      (3L, 11), (3L, 12), (3L, 13), (3L, 14), (3L, 15))
    val ud = days.toDF("user_id", "d")
      .select(col("user_id"),
        date_add(lit("2024-01-01").cast("date"), col("d")).as("day"))
    val out = Behavior.streaks(ud).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("q_ips: estimators recompute exactly from the raw log") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val rows = Behavior.ipsQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val raw = graft.engine.Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("value"),
        conv(substring(md5(concat(lit("ips"), col("event_id"))), 1, 15),
          16, 10).cast("long").%(1000L).as("u"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val byDay = raw.groupBy(_._1)
    rows.foreach { row =>
      val day = row.getString(0)
      val es = byDay(day)
      val triples = es.map { case (_, et, v, u) =>
        val loggedPush = u < Behavior.IpsPushPm
        val targetPush = !(v > Behavior.IpsEmailMin)
        val m = if (loggedPush == targetPush) 1L else 0L
        val w = if (loggedPush) Behavior.IpsWeightScale / Behavior.IpsPushPm
                else Behavior.IpsWeightScale / (1000L - Behavior.IpsPushPm)
        val r = if (et == "purchase") 1L else 0L
        (r, m, w)
      }
      val n = es.length.toLong
      val sumW = triples.map(t => t._2 * t._3).sum
      val sumRw = triples.map(t => t._1 * t._2 * t._3).sum
      val nMatch = triples.map(_._2).sum
      val nMatchPos = triples.map(t => t._1 * t._2).sum
      assert(row.getLong(1) === n)
      assert(row.getLong(2) === nMatch)
      assert(row.getLong(3) === sumW && row.getLong(4) === sumRw)
      assert(row.getLong(5) === nMatchPos * 1000L / nMatch)
      assert(row.getLong(6) === sumRw * 1000L / (n * 3L))
      assert(row.getLong(7) === sumRw * 1000L / sumW)
    }
    // unbiasedness sanity: the IPS weights are exactly 3000/p for both arms
    assert(Behavior.IpsWeightScale % Behavior.IpsPushPm === 0L)
    assert(Behavior.IpsWeightScale % (1000L - Behavior.IpsPushPm) === 0L)
  }

  test("q_seq_patterns: supports recompute from the raw log; bounds hold") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val rows = Behavior.seqPatternsQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val raw = graft.engine.Tables.events(spark, sfDir)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("d"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getString(2), r.getLong(3)))
    val byDay = raw.groupBy(_._1)
    val nUserDays = byDay.size.toLong
    val support = scala.collection.mutable.HashMap.empty[(String, String), Long]
    byDay.values.foreach { es =>
      val spans = es.groupBy(_._2).map { case (t, xs) =>
        (t, xs.map(_._3).min, xs.map(_._3).max)
      }
      for ((a, fa, _) <- spans; (b, _, lb) <- spans if a != b && fa < lb)
        support((a, b)) = support.getOrElse((a, b), 0L) + 1L
    }
    assert(rows.length === support.size)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === support(k), s"$k support")
      assert(r.getLong(3) === nUserDays)
      assert(r.getLong(4) === support(k) * 1000L / nUserDays)
      assert(r.getLong(2) <= nUserDays, "support bounded by user-days")
    }
  }

  test("q_power: moments and the one-rounding MDE recompute exactly") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val rows = Behavior.powerQ(spark, sfDir).collect()
    val raw = graft.engine.Tables.events(spark, sfDir)
      .select(col("event_type"), floor(col("value") * 100).cast("long")
        .as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    raw.groupBy(_._1).foreach { case (t, xs) =>
      val row = rows.find(_.getString(0) == t).get
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum
      val sxx = xs.map(x => x._2 * x._2).sum
      val vn = n * sxx - sx * sx
      assert(row.getLong(1) === n && row.getLong(2) === sx &&
        row.getLong(3) === sxx && row.getLong(4) === vn)
      val mde = math.floor(math.sqrt(vn.toDouble / (n * n * n).toDouble)
        * 2.0 * Behavior.PowerZSum * 100.0 + 0.5).toLong
      assert(row.getLong(5) === mde, s"$t: MDE recompute")
      assert(vn >= 0L, "variance numerator must be nonnegative")
    }
  }

  test("q_qini: deciles partition both arms; uplift recomputes exactly") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val rows = Behavior.qiniQ(spark, sfDir).collect()
    val nEvents = graft.engine.Tables.events(spark, sfDir).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(3)).sum === nEvents,
      "deciles must partition all events across both arms")
    rows.foreach { r =>
      val (cnt, cpt, cnc, cpc) =
        (r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
      val numer = cpt * cnc - cpc * cnt
      val exp =
        if (cnt * cnc == 0) 0L
        else if (numer < 0) -((-numer) * 1000L / (cnt * cnc))
        else numer * 1000L / (cnt * cnc)
      assert(r.getLong(9) === exp, s"decile ${r.getLong(0)} uplift")
    }
    // cumulative counts are nondecreasing and end at the arm totals
    val last = rows.last
    assert(last.getLong(5) === rows.map(_.getLong(1)).sum)
    assert(last.getLong(7) === rows.map(_.getLong(3)).sum)
    // a non-causal md5 arm on a non-causal scorer: the full-population
    // uplift must be small (here: the arms differ only by sampling)
    assert(math.abs(last.getLong(9)) < 100L,
      "closing uplift implausibly large for a null effect")
  }

  test("q_iv: Wald estimator recomputes; first-stage cells audit") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val rows = Behavior.ivQ(spark, sfDir).collect()
    assert(rows.length === 2 && rows.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    val users = graft.engine.Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("ck"),
        sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
      .withColumn("z", conv(substring(md5(concat(lit("iv"),
        col("user_id"))), 1, 15), 16, 10).cast("long") % 2L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    def cell(zv: Long) = {
      val xs = users.filter(_._3 == zv)
      val d = xs.count { case (ck, _, z) =>
        ck >= Behavior.IvAlwaysMinClicks ||
          (z == 1L && ck >= Behavior.IvComplierMinClicks)
      }.toLong
      (xs.length.toLong, xs.map(_._2).sum, d)
    }
    val (n0, s0, d0) = cell(0L)
    val (n1, s1, d1) = cell(1L)
    rows.foreach { r =>
      val (n, s, d) = if (r.getLong(0) == 0L) (n0, s0, d0) else (n1, s1, d1)
      assert(r.getLong(1) === n && r.getLong(2) === s && r.getLong(3) === d)
      val ny = s1 * n0 - s0 * n1
      val nd = d1 * n0 - d0 * n1
      assert(r.getLong(4) === ny && r.getLong(5) === nd)
      assert(nd !== 0L, "weak-instrument fixture: first stage is null")
      val late =
        if (ny * nd < 0) -(math.abs(ny) * 1000L / math.abs(nd))
        else math.abs(ny) * 1000L / math.abs(nd)
      assert(r.getLong(6) === late, "sign-split Wald recompute")
    }
    // the compliance structure is real: encouragement must move uptake
    assert(d1 * n0 > d0 * n1, "encouraged arm should take up more")
  }

  test("q_srm: unit counts recompute from distinct users; flag law holds") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val rows = Behavior.srmQ(spark, sfDir).collect()
    val daily = rows.filterNot(_.getString(0) == "__all__")
    val all = rows.filter(_.getString(0) == "__all__")
    assert(all.length === 1 && daily.nonEmpty)
    // driver recompute in the unit of randomization (distinct users)
    val raw = graft.engine.Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("d"), col("user_id"),
        (conv(substring(md5(concat(lit("ab"), col("user_id"))), 1, 15),
          16, 10).cast("long") % 2L).as("arm"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byDay = raw.groupBy(_._1)
    daily.foreach { r =>
      val us = byDay(r.getString(0)).map(x => (x._2, x._3)).distinct
      assert(r.getLong(1) === us.length.toLong)
      assert(r.getLong(2) === us.count(_._2 == 1L).toLong)
    }
    val users = raw.map(x => (x._2, x._3)).distinct
    assert(all.head.getLong(1) === users.length.toLong,
      "pooled row must count distinct USERS, not sum user-days")
    assert(all.head.getLong(2) === users.count(_._2 == 1L).toLong)
    rows.foreach { r =>
      val (n, a, b) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(a + b === n)
      val diff2 = (a - b) * (a - b)
      assert(r.getLong(4) === diff2 * 1000L / n, "chi2_milli recompute")
      assert(r.getLong(5) ===
        (if (diff2 * 1000L > Behavior.SrmCritMilli * n) 1L else 0L))
    }
    // the md5 split is genuinely ~50/50 in units: the pooled row (9/6
    // at this SF) must not flag
    assert(all.head.getLong(5) === 0L,
      "uniform hash assignment flagged SRM — split or statistic broken")
  }

  test("q_psm: rank pairing recomputes from raw events; ATT identity") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val rows = Behavior.psmQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // driver-side replay of the whole matching
    val users = graft.engine.Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("ck"),
        sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val strata = users.map { case (uid, n, ck, y) =>
      val treated = ck >= Behavior.PsmTreatMinClicks
      ((math.min(n / 10, 9L), uid % Behavior.PsmSubStrata), treated, uid, y)
    }.groupBy(_._1)
    var pairsTotal = 0L
    var diffTotal = 0L
    val bucketPairs = scala.collection.mutable.HashMap.empty[Long, Long]
    strata.foreach { case ((bucket, _), xs) =>
      val t = xs.filter(_._2).sortBy(_._3).map(_._4)
      val c = xs.filter(!_._2).sortBy(_._3).map(_._4)
      val m = math.min(t.length, c.length)
      pairsTotal += m
      bucketPairs(bucket) = bucketPairs.getOrElse(bucket, 0L) + m
      (0 until m).foreach(i => diffTotal += t(i) - c(i))
    }
    // non-degenerate fixture: both arms and at least one matched pair
    assert(pairsTotal > 0, "no matched pairs — treatment rule degenerate")
    rows.foreach { r =>
      val bucket = r.getLong(0)
      assert(r.getLong(3) === bucketPairs.getOrElse(bucket, 0L),
        s"bucket $bucket pair count")
      assert(r.getLong(6) === pairsTotal && r.getLong(7) === diffTotal)
      val expAtt =
        if (diffTotal < 0) -((-diffTotal) * 1000L / pairsTotal)
        else diffTotal * 1000L / pairsTotal
      assert(r.getLong(8) === expAtt, "sign-split milli-ATT")
    }
    // pairing balance: n_pairs never exceeds either arm
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1) && r.getLong(3) <= r.getLong(2))
    }
  }
}
