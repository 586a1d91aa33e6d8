package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Sentiment

/** The reference's semantic traps (SURVEY.md §1.3), asserted directly:
  *  - keyword counting is SUBSTRING containment ("fail" ⊂ "failure"),
  *    each lexicon word counted at most once per document
  *    (/root/reference/src/youtube_collector.py:74-78)
  *  - keyword tie → NEUTRAL; category sets take precedence over keywords
  *    (/root/reference/src/youtube_collector.py:81-104)
  *  - combined text = title + ' ' + description + ' ' + join(tags) with
  *    '' / [] defaults for missing fields (:74, :157-158)
  */
class SentimentSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val lex = Sentiment.Lexicons(
    positive = Seq("good", "win"),
    negative = Seq("fail", "bad"),
    positiveCategories = Seq(19),
    negativeCategories = Seq(20),
    mixedCategories = Seq(10))

  private def classify(cat: Int, text: String): (Int, Int, String, String) = {
    val txt = lower(lit(text))
    val pos = Sentiment.keywordCount(txt, lex.positive)
    val neg = Sentiment.keywordCount(txt, lex.negative)
    val row = Seq(1).toDF("x").select(
      pos.as("p"), neg.as("n"),
      Sentiment.finalSentiment(lit(cat), pos, neg, lex).as("s"),
      Sentiment.classificationMethod(lit(cat), lex).as("m")).head()
    (row.getInt(0), row.getInt(1), row.getString(2), row.getString(3))
  }

  test("substring containment: 'fail' matches inside 'failure'") {
    val (_, n, s, _) = classify(10, "a complete failure")
    assert(n === 1)
    assert(s === "NEGATIVE")
  }

  test("each lexicon word counts at most once per document") {
    val (p, _, _, _) = classify(10, "good good good win")
    assert(p === 2) // good=1 (not 3) + win=1
  }

  test("keyword tie (pos == neg > 0) -> NEUTRAL") {
    val (p, n, s, m) = classify(10, "good fail")
    assert(p === 1 && n === 1)
    assert(s === "NEUTRAL")
    assert(m === "KEYWORD_BASED")
  }

  test("zero keywords in a mixed category -> NEUTRAL") {
    val (_, _, s, _) = classify(10, "nothing relevant here")
    assert(s === "NEUTRAL")
  }

  test("category sets override keywords (CATEGORY_BASED wins)") {
    // negative text but positive category -> POSITIVE
    assert(classify(19, "fail bad fail")._3 === "POSITIVE")
    assert(classify(20, "good win")._3 === "NEGATIVE")
    assert(classify(19, "x")._4 === "CATEGORY_BASED")
  }

  test("unknown category -> UNKNOWN / UNCATEGORIZED") {
    val (_, _, s, m) = classify(99, "good")
    assert(s === "UNKNOWN")
    assert(m === "UNCATEGORIZED")
  }

  test("combinedText joins title/description/tags with '' and [] defaults") {
    val df = Seq(
      (1, "Title", Some("Desc"), Some(Seq("t1", "t2"))),
      (2, "Title", None, None)
    ).toDF("id", "title", "description", "tags")
      .select(col("id"), Sentiment.combinedText(
        col("title"), col("description"), col("tags")).as("txt"))
    val byId = df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(byId(1) === "title desc t1 t2")
    // missing description -> '', missing tags -> []. The reference's
    // f"{t} {d} {' '.join(tags)}" keeps the separator spaces around the
    // empty defaults (no strip) — concat_ws over empty strings matches.
    assert(byId(2) === "title  ")
  }
}
