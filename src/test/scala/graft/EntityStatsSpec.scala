package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.StringExprs
import graft.operators.{Curation, Joins, Stats, TextAnalysis}

/** X119–X123: hamming expression, deletion-neighborhood fuzzy join, χ²
  * independence, token entropy, inverted index, length-bucket batching. */
class EntityStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("graft_hamming: distance, symmetry, length-mismatch null") {
    StringExprs.ensureRegistered(spark)
    val df = Seq(
      ("abcdef", "abcdef"),
      ("abcdef", "abcdez"),
      ("000111", "010101"),
      ("abc", "abcd")).toDF("a", "b")
    val out = df.select(
      StringExprs.hamming(col("a"), col("b")).as("d"),
      StringExprs.hamming(col("b"), col("a")).as("rev")).collect()
    assert(out(0).getInt(0) == 0)
    assert(out(1).getInt(0) == 1)
    assert(out(2).getInt(0) == 2)
    assert(out(3).isNullAt(0))
    // symmetry on the defined rows
    out.take(3).foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("fuzzy join: blocking result equals the brute-force all-pairs scan") {
    StringExprs.ensureRegistered(spark)
    val c = graft.engine.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val brute = c.as("a").crossJoin(c.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(StringExprs.hamming(col("a.name"), col("b.name")).as("dist"))
      .filter(col("dist") <= Joins.FuzzyMaxDist && col("dist") > 0)
      .groupBy(col("dist")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val blocked = Joins.fuzzyJoinQ(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(blocked == brute)
  }

  test("fuzzy join: the candidate join keys on the packed long, never a string") {
    // Regression guard for the (blk, rem)->bk packing (measured at
    // sf0.01, broadcast off: 1.45 MB shuffled with the 7-char remainder
    // string on the key vs 1.28 MB packed — lz4 absorbs most of the raw
    // string width, but the long key also hashes/compares without
    // dereferencing UTF8String bytes). A byte ceiling would flake with
    // machine-dependent partition counts; the key TYPE is the invariant.
    graft.engine.Conf.scoped(spark,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = Joins.fuzzyJoinQ(spark, "/root/testdata/sf0.001")
      val joins = df.queryExecution.sparkPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          j.leftKeys ++ j.rightKeys
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
          j.leftKeys ++ j.rightKeys
      }
      assert(joins.nonEmpty, "expected a shuffled candidate join")
      joins.flatten.foreach { k =>
        assert(k.dataType === org.apache.spark.sql.types.LongType,
          s"candidate-join key $k is ${k.dataType} — the packed bk key regressed")
      }
    }
  }

  test("fuzzy join: a non-digit c_name tail fails loudly, never a silent drop") {
    // The packed-long blocking key casts the deletion remainder to long;
    // on the r7 string-keyed join a non-digit tail still matched, on the
    // r8 packed key it would cast to NULL and silently vanish from the
    // pair space (ADVICE r8). The query now guards the precondition with
    // raise_error — prove it fires on crafted data and names the tail.
    val bad = java.nio.file.Files.createTempDirectory("graft_fuzzy_bad_")
    spark.createDataFrame(Seq(
      (1L, "Customer#000000001"),
      (2L, "Customer#00000000X"))).toDF("c_custkey", "c_name")
      .coalesce(1).write.parquet(s"$bad/customer.parquet")
    val e = intercept[Exception] {
      Joins.fuzzyJoinQ(spark, bad.toString).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("non-digit c_name tail")),
      s"expected the precondition error, got: $e")
  }

  test("chi2: per-lang parts recompute from the contingency table") {
    val cells = graft.engine.Tables.documents(spark, sfDir)
      .groupBy("lang", "source").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = cells.map(_._3).sum
    val rl = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cs = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val expected = cells.groupBy(_._1).view.mapValues { cl =>
      cl.map { case (l, s, o) =>
        val num = n * o - rl(l) * cs(s)
        (num.toDouble * num.toDouble) / (n * rl(l) * cs(s)).toDouble
      }.sum
    }.toMap
    Stats.chi2Q(spark, sfDir).collect().foreach { r =>
      val (lang, part) = (r.getString(0), r.getDouble(3))
      assert(math.abs(part - expected(lang)) < 1e-4, lang)
      assert(r.getLong(1) == rl(lang))
    }
  }

  test("entropy: bounds and a direct per-doc recompute") {
    val rows = TextAnalysis.entropyQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ent, ttr) = (r.getDouble(2), r.getDouble(3))
      assert(ent >= 0.0 && ttr > 0.0 && ttr <= 1.0, r.getString(0))
    }
    // direct recompute of one language's average from the tf vectors
    val lang = rows.head.getString(0)
    val tf = graft.engine.Tables.documents(spark, sfDir)
      .filter(col("lang") === lang)
      .select(col("doc_id"), explode(graft.engine.Text.words).as("t"))
      .groupBy("doc_id", "t").count()
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val perDoc = tf.groupBy(_._1).map { case (_, ts) =>
      val nW = ts.map(_._2).sum.toDouble
      math.log(nW) - ts.map(c => c._2 * math.log(c._2.toDouble)).sum / nW
    }
    val avg = perDoc.sum / perDoc.size
    assert(math.abs(rows.head.getDouble(2) - avg) < 1e-4)
  }

  test("inverted index: sorted capped postings, df ranking, df recompute") {
    val rows = TextAnalysis.invertedIndexQ(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= TextAnalysis.IdxTopTerms)
    // ranks are dense from 1, df non-increasing
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val dfs = rows.map(_.getLong(2))
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val ids = r.getString(3).split(",").map(_.toLong)
      assert(ids.length <= TextAnalysis.IdxPostingsHead)
      assert(ids.sorted.sameElements(ids), r.getString(1))
    }
    // spot-check df of the top term against a direct count
    val top = rows.head.getString(1)
    val direct = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(graft.engine.Text.words).as("t"))
      .filter(col("t") === top).select("doc_id").distinct().count()
    assert(rows.head.getLong(2) == direct)
  }

  test("source overlap: bounds, pair coverage, and a direct recompute") {
    val rows = TextAnalysis.sourceOverlapQ(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), (shared, va, vb, ovl)) =>
      assert(a < b)
      assert(shared <= math.min(va, vb), s"($a,$b)")
      assert(ovl > 0.0 && ovl <= 1.0, s"($a,$b)")
    }
    // direct recompute for the lexicographically first reported pair
    val ((sa, sb), (shared, va, vb, _)) = rows.minBy(_._1)
    val vocab = graft.engine.Tables.documents(spark, sfDir)
      .select(col("source"), explode(graft.engine.Text.words).as("t"))
      .distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    val setA = vocab.filter(_._1 == sa).map(_._2).toSet
    val setB = vocab.filter(_._1 == sb).map(_._2).toSet
    assert(setA.size == va && setB.size == vb)
    assert((setA & setB).size == shared)
  }

  test("length buckets: partition of each language, ordered, exact waste") {
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Curation.lengthBucketsQ(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      assert(bs.map(_._3).sum == docs(lang))
      // equal-count tiling: bucket sizes differ by at most 1
      assert(bs.map(_._3).max - bs.map(_._3).min <= 1)
      // buckets ordered by length: ranges are non-decreasing
      val sorted = bs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(lo, hi) => assert(lo._5 <= hi._4, s"$lang ${lo._2}")
        case _ =>
      }
      // pad_waste identity
      sorted.foreach(b => assert(b._7 == b._5 * b._3 - b._6))
    }
  }

  test("q_bpe_train: round-1 rule is the brute-force argmax; merges compress exactly") {
    val rows = TextAnalysis.bpeTrainQ(spark, sfDir).collect()
    assert(rows.length == TextAnalysis.BpeRounds)
    val wc = graft.engine.Tables.documents(spark, sfDir)
      .select(explode(graft.engine.Text.words).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // driver-side reference mirroring the operator's EXACT semantics:
    // BpeMergePasses left-to-right non-overlapping string-replace passes
    // (java.lang.String.replace has the same scan rule as Spark's and
    // DuckDB's replace)
    def toks(s: String): Array[String] = s.split(" ").filter(_.nonEmpty)
    var vocab = wc.map { case (w, c) =>
      (" " + w.map(_.toString).mkString(" ") + " ", c)
    }
    rows.zipWithIndex.foreach { case (row, i) =>
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (s, c) =>
        val syms = toks(s)
        syms.zip(syms.tail).foreach { p =>
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
        }
      }
      val ((ba, bb), bc) = pairCounts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }
      assert(row.getLong(0) === (i + 1).toLong)
      assert((row.getString(1), row.getString(2)) === ((ba, bb)),
        s"round ${i + 1} merge rule diverges from brute force")
      assert(row.getLong(3) === bc, s"round ${i + 1} pair count")
      vocab = vocab.map { case (s, c) =>
        val m = (1 to TextAnalysis.BpeMergePasses).foldLeft(s)((acc, _) =>
          acc.replace(s" $ba $bb ", s" $ba$bb "))
        (m, c)
      }
      // the fixpoint property: no occurrence of the pair survives
      vocab.foreach { case (s, _) =>
        assert(!s.contains(s" $ba $bb "), "merge must reach its fixpoint")
      }
      val symsTotal = vocab.map { case (s, c) => toks(s).length * c }.sum
      assert(row.getLong(4) === symsTotal,
        s"round ${i + 1}: post-merge symbol total must match the replay")
    }
    // compression is strict: each merge removes at least one symbol
    val totals = rows.map(_.getLong(4))
    assert(totals.zip(totals.tail).forall { case (a, b) => b < a })
  }
}
