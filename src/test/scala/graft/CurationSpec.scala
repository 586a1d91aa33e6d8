package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

/** Curation-quartet semantics: split partition/determinism, decontamination
  * scope, repetition bounds, redaction round-trip. */
class CurationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("split partitions the corpus: counts sum to N, assignment is stable") {
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val total = docs.count()
    val a = Curation.splitQ(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.values.sum === total)
    assert(a.keySet.subsetOf(Set("train", "val", "test")))
    // deterministic: recomputing yields the identical assignment
    val b = Curation.splitQ(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
    // roughly the configured proportions (hash uniformity, loose bounds)
    val train = a.getOrElse("train", 0L).toDouble / total
    assert(train > 0.6 && train < 0.95, s"train fraction $train")
  }

  test("sequence packing: contiguous stream, exact chunk spans, full coverage") {
    val rows = Curation.seqPackQ(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // contiguity: each doc starts exactly where the previous one ended —
    // the stream has no gaps and no overlaps in doc_id order
    rows.sliding(2).foreach {
      case Array((_, n0, s0, _, _, _), (d1, _, s1, _, _, _)) =>
        assert(s1 === s0 + n0, s"doc $d1 starts at $s1, expected ${s0 + n0}")
      case _ => ()
    }
    val cap = Curation.PackCap
    rows.foreach { case (d, n, s, first, last, span) =>
      assert(n > 0, s"doc $d zero tokens")
      assert(first === s / cap)
      assert(last === (s + n - 1) / cap)
      assert(span === last - first + 1)
      // a doc spans k chunks iff its token range crosses k-1 boundaries:
      // at least ceil(n/cap), at most one more (a short doc can straddle)
      assert(span >= (n + cap - 1) / cap, s"doc $d spans too few chunks")
      assert(span <= (n + cap - 2) / cap + 1, s"doc $d spans too many chunks")
    }
    // the stream's total length is the sum of all token counts
    val (_, nLastTok, sLast, _, _, _) = rows.last
    assert(sLast + nLastTok === rows.map(_._2).sum)
  }

  test("decontamination never flags eval-set documents themselves") {
    val flagged = Curation.decontaminateQ(spark, sfDir).collect()
      .map(_.getLong(0))
    assert(flagged.nonEmpty) // harness vocabulary guarantees shared shingles
    assert(flagged.forall(_ % Curation.EvalMod != 0))
  }

  test("repetition ratios are in [0,1) and 0 for an all-distinct doc") {
    val rows = Curation.repetitionQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, s) = (r.getDouble(2), r.getDouble(3))
      assert(w >= 0.0 && w < 1.0 && s >= 0.0 && s < 1.0, s"out of range: $r")
    }
    import spark.implicits._
    val one = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    one.createOrReplaceTempView("curation_spec_docs")
    val ws = filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "")
    val distinctRatio = one.select(
      (size(array_distinct(ws)).cast("double") / size(ws)).as("r"))
      .collect().head.getDouble(0)
    assert(distinctRatio === 1.0)
  }

  test("stratified sample rate grows with label and is rerun-stable") {
    val s1 = Curation.sampleStratifiedQ(spark, sfDir).collect()
    val s2 = Curation.sampleStratifiedQ(spark, sfDir).collect()
    assert(s1.toSeq == s2.toSeq) // pure function of the key
    val total = graft.engine.Tables.embeddings(spark, sfDir).count()
    assert(s1.length > 0 && s1.length < total)
    // rate (label+1)*50 per mille: label 9 must keep more than label 0
    val byLabel = s1.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    if (byLabel.contains(0) && byLabel.contains(9))
      assert(byLabel(9) > byLabel(0))
  }

  test("pps sample: per-doc rate tracks n_chars and weight-mass share exceeds count share") {
    val rows = Curation.ppsSampleQ(spark, sfDir).collect()
    assert(rows.length > 0)
    val nDocs = rows.map(_.getLong(1)).sum
    val wTotal = rows.map(_.getLong(2)).sum
    val nSampled = rows.map(_.getLong(3)).sum
    val wSampled = rows.map(_.getLong(4)).sum
    assert(nSampled > 0 && nSampled < nDocs)
    // PPS keeps long docs preferentially: the sample's weight share must
    // exceed its count share (equality would mean uniform sampling)
    assert(wSampled.toDouble / wTotal > nSampled.toDouble / nDocs)
    // expected draw count ≈ Σ p_i = w_total / PpsDen; allow ±20%
    val expected = wTotal.toDouble / Curation.PpsDen
    assert(math.abs(nSampled - expected) < 0.2 * expected,
      s"drew $nSampled, expected ≈ $expected")
  }

  test("sequence packing: bins are contiguous per shard and token-bounded") {
    val rows = Curation.packSequencesQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, bins) =>
      val ids = bins.map(_.getLong(1)).sorted.toSeq
      assert(ids.headOption.contains(0L) && ids == (0L until ids.length).toSeq,
        "bins must be contiguous from 0 within a shard")
    }
    // a bin's span never exceeds budget + one overhanging document
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val maxToks = docs.select(greatest(size(filter(
      split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "")), lit(1)).as("t"))
      .agg(max(col("t"))).head().getInt(0)
    rows.foreach { r =>
      assert(r.getLong(3) <= Curation.PackBudget + maxToks,
        s"bin ${r.getLong(1)} holds ${r.getLong(3)} tokens")
    }
  }

  test("forget report: erased + after = before, erased users all on the list") {
    val rows = Curation.forgetQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3),
        s"rows_before != erased + after in $r")
    }
    // cross-check one partition against a direct semi-join count
    val ev = graft.engine.Tables.events(spark, sfDir)
    val direct = ev
      .filter(col("user_id") % Curation.ForgetMod === 0)
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) === direct.getOrElse(r.getString(0), 0L))
    }
  }

  test("redaction masks every digit run and counts them") {
    val out = Curation.redactQ(spark, sfDir)
      .filter(col("n_redactions") > 0)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getString(1).exists(_.isDigit), s"digits survived: $r")
    }
  }

  test("negative sampling: disjoint from interactions, deterministic, capped") {
    val rows = Curation.negativeSampleQ(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    val interactions = graft.engine.Tables.orders(spark, sfDir)
      .join(graft.engine.Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (cust, nNeg, items) =>
      val ids = items.split(",").map(_.toLong)
      assert(ids.length == nNeg && nNeg <= Curation.NegKeep)
      assert(ids.distinct.length == ids.length, s"dup negatives for $cust")
      ids.foreach(i => assert(!interactions.contains((cust, i)),
        s"sampled a true interaction: ($cust, $i)"))
    }
    // pure function of the data: a second run reproduces it exactly
    val again = Curation.negativeSampleQ(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.sameElements(again))
  }
  test("quality waterfall: stages partition the corpus, survivors decrease monotonically") {
    val sfDir = "/root/testdata/sf0.001"
    val spark2 = TestSpark.spark
    val rows = Curation.qualityWaterfallQ(spark2, sfDir).collect()
    val total = graft.engine.Tables.documents(spark2, sfDir).count()
    // first-fail charging => the stage counts sum to the corpus exactly
    assert(rows.map(_.getLong(1)).sum === total)
    // survivor column is non-increasing along the waterfall and ends at the pass count
    val survivors = rows.map(_.getLong(4))
    assert(survivors.zip(survivors.tail).forall { case (a, b) => a >= b })
    assert(rows.last.getString(0) === "5_pass" &&
      survivors.last === rows.last.getLong(1))
  }

  test("shard assignment is stable under corpus append (hash-dealt, not round-robin)") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    // the same doc_id lands on the same shard regardless of what else is
    // in the frame — recompute the hash directly for a sample
    val got = Curation.shardAssignQ(spark2, "/root/testdata/sf0.001").collect()
    assert(got.map(_.getLong(0)).toSeq === (0L until Curation.ShardCount.toLong))
    assert(got.map(_.getLong(1)).sum ===
      graft.engine.Tables.documents(spark2, "/root/testdata/sf0.001").count())
    // deviation column is the integer per-mille |n_tokens*S - total|*1000/total
    val totalTok = got.map(_.getLong(2)).sum
    got.foreach { r =>
      val expect = math.abs(r.getLong(2) * Curation.ShardCount - totalTok) * 1000 / totalTok
      assert(r.getLong(4) === expect, s"shard ${r.getLong(0)} deviation")
    }
  }

  test("q_rand_response: inversion identity holds and the estimator tracks truth at 1/sqrt(n)") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Curation.randResponseQ(spark, sfDir).collect()
    var (estSum, trueSum, nTot) = (0L, 0L, 0L)
    rows.foreach { r =>
      val (n, nYes, est, truth, err) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(est === 4 * nYes - n, "debias inversion broken")
      assert(err === math.abs(est - 2 * truth))
      estSum += est; trueSum += truth; nTot += n
    }
    // the mechanism's global error is noise-floor-sized: sd(est) =
    // 2·sqrt(n·p(1−p)) in ×2 units ≈ 2·sqrt(0.1875·n); allow 5 sd —
    // deterministic (md5 draws), so this never flakes, but it WOULD
    // catch a broken flip rate or a debias constant drift
    val bound = (10.0 * math.sqrt(0.1875 * nTot)).toLong
    assert(math.abs(estSum - 2 * trueSum) <= bound,
      s"global |est-truth| ${math.abs(estSum - 2 * trueSum)} exceeds $bound")
  }

  test("q_boilerplate: ratio identity and passage accounting hold") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Curation.boilerplateQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (np, nb, pm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nb <= np && pm === nb * 1000 / np)
    }
    // the tiny shared vocabulary makes 8-word passages repeat across
    // docs — the detector must actually fire somewhere at sf0.001
    assert(rows.exists(_.getLong(3) > 0), "no boilerplate found at all")
  }

  test("q_dp_release: ladder is a pmf, draws replay, release identity holds") {
    // the pinned discrete-Laplace ladder must be an exact per-mille pmf,
    // symmetric up to the documented z=0 quantization residue
    assert(Curation.DpLadderPm.sum === 1000L)
    assert(Curation.DpLadderPm.length === 17)
    assert(Curation.DpLadderPm === Curation.DpLadderPm.reverse,
      "two-sided geometric is symmetric")
    val rows = Curation.dpReleaseQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    def drawZ(day: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(("dp" + day).getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      val u = java.lang.Long.parseLong(hex, 16) % 1000L
      val i = Curation.DpCdfPm.indexWhere(u < _)
      i.toLong - 8L
    }
    var sumAbs = 0L
    rows.foreach { r =>
      val (day, nTrue, z, rel, ae) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(z === drawZ(day), s"$day: draw must replay from the ladder")
      assert(rel === nTrue + z && ae === math.abs(z))
      sumAbs += math.abs(z)
    }
    assert(rows.head.getLong(5) === sumAbs * 1000L / rows.length,
      "mae_millis recompute")
    // the mechanism must actually perturb something at this ε
    assert(rows.exists(_.getLong(2) != 0L), "all draws zero — ladder broken?")
  }
}
