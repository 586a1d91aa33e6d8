package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.Sentiment
import graft.operators.Dedup

/** ScalaCheck properties (SURVEY.md §5.4), run through scalacheck's own
  * runner (the scalatestplus bridge is not in the offline dep cache). */
class PropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private val wordGen = Gen.oneOf("good", "win", "fail", "bad", "calm", "tree")
  private val textGen = Gen.listOfN(6, wordGen).map(_.mkString(" "))
  private val catGen = Gen.oneOf(19, 20, 10, 99)

  test("classification partitions every input: POS+NEG+NEU+UNK == N") {
    val lex = Sentiment.Lexicons(Seq("good", "win"), Seq("fail", "bad"),
      Seq(19), Seq(20), Seq(10))
    check(Prop.forAll(Gen.listOfN(20, Gen.zip(catGen, textGen))) { rows =>
      rows.isEmpty || {
        val df = rows.zipWithIndex.map { case ((c, t), i) => (i, c, t) }
          .toDF("id", "cat", "text")
        val txt = lower(col("text"))
        val out = df.select(Sentiment.finalSentiment(col("cat"),
          Sentiment.keywordCount(txt, lex.positive),
          Sentiment.keywordCount(txt, lex.negative), lex).as("s"))
          .groupBy("s").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        out.keySet.subsetOf(Set("POSITIVE", "NEGATIVE", "NEUTRAL", "UNKNOWN")) &&
          out.values.sum == rows.length
      }
    })
  }

  test("engagement rate is finite, >= 0, and 0 exactly when views == 0") {
    val rowGen = Gen.zip(Gen.chooseNum(0, 10000),
      Gen.chooseNum(0, 500), Gen.chooseNum(0, 500))
    check(Prop.forAll(Gen.listOfN(20, rowGen)) { rows =>
      rows.isEmpty || {
        rows.toDF("views", "likes", "comments")
          .select(col("views"), Sentiment.engagementRate(col("views"),
            col("likes").cast("double"), col("comments").cast("double")).as("r"))
          .collect()
          .forall { r =>
            val (views, rate) = (r.getInt(0), r.getDouble(1))
            !rate.isNaN && !rate.isInfinite && rate >= 0.0 &&
              (views != 0 || rate == 0.0)
          }
      }
    })
  }

  test("exact dedup: keepers unique and minimal, counts sum to input size") {
    val docGen = Gen.listOfN(15, Gen.oneOf("alpha beta", "gamma delta", "x y"))
    check(Prop.forAll(docGen) { texts =>
      texts.isEmpty || {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val out = Dedup.dedupByHash(df).collect()
        val keepers = out.map(_.getLong(1))
        val expectedKeepers = texts.zipWithIndex.groupBy(_._1)
          .map { case (_, g) => g.map(_._2.toLong).min }.toSet
        keepers.distinct.length == keepers.length &&
          out.map(_.getLong(2)).sum == texts.length &&
          keepers.toSet == expectedKeepers
      }
    })
  }

  test("grouped sums equal the ungrouped total (agg consistency)") {
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(0L, 1000L))
    check(Prop.forAll(Gen.listOfN(30, rowGen)) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "v")
        val grouped = df.groupBy("k").agg(sum("v").as("s"))
          .agg(sum("s")).head().getLong(0)
        grouped == df.agg(sum("v")).head().getLong(0)
      }
    })
  }
}
