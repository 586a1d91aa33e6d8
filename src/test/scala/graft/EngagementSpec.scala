package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Sentiment

/** P10 engagement-rate traps (/root/reference/src/youtube_collector.py:106-116):
  * views == 0 -> 0.0 (no NaN/Inf), otherwise round(((likes+comments)/views)
  * * 100, 4) with Python's HALF_EVEN rounding (Spark bround). */
class EngagementSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def rate(views: Int, likes: Int, comments: Int): Double =
    Seq(1).toDF("x").select(
      Sentiment.engagementRate(lit(views), lit(likes).cast("double"),
        lit(comments).cast("double")).as("r")).head().getDouble(0)

  test("views == 0 -> 0.0, not NaN or error") {
    assert(rate(0, 10, 5) === 0.0)
  }

  test("plain case: (likes+comments)/views * 100 rounded to 4") {
    assert(rate(1000, 50, 25) === 7.5)
  }

  test("rounding is HALF_EVEN (banker's), matching Python round") {
    // (25+0)/3200*100 = 0.78125 -> HALF_EVEN gives 0.7812 (HALF_UP: 0.7813)
    assert(rate(3200, 25, 0) === 0.7812)
  }

  test("rate is never negative for non-negative counters") {
    for (v <- Seq(0, 1, 7, 100); l <- Seq(0, 3); c <- Seq(0, 9))
      assert(rate(v, l, c) >= 0.0)
  }
}
