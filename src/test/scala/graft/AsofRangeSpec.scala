package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

/** Semantics of the as-of join (union+window idiom) and the bin-accelerated
  * range join, on hand-built frames where the expected answers are obvious. */
class AsofRangeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asof join picks the latest state at-or-before each probe, inclusive") {
    val state = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-03 00:00:00"), 30.0),
      (2L, ts("2024-01-05 00:00:00"), 50.0)
    ).toDF("key", "ts", "sval")
    val probe = Seq(
      (1L, ts("2024-01-02 00:00:00"), 101L), // between states -> 10.0
      (1L, ts("2024-01-03 00:00:00"), 102L), // EQUAL ts -> inclusive -> 30.0
      (1L, ts("2024-01-04 00:00:00"), 103L), // after last -> 30.0
      (2L, ts("2024-01-01 00:00:00"), 201L), // before any state -> null
      (3L, ts("2024-01-01 00:00:00"), 301L)  // keyless -> null
    ).toDF("key", "ts", "event_id")
    val got = Joins.asofJoin(probe, state)
      .orderBy(col("event_id"))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSeq
    assert(got === Seq(
      101L -> Some(10.0), 102L -> Some(30.0), 103L -> Some(30.0),
      201L -> None, 301L -> None))
  }

  test("asof join state_ts is the matched state's timestamp") {
    val state = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("key", "ts", "sval")
    val probe = Seq((1L, ts("2024-06-01 00:00:00"), 7L)).toDF("key", "ts", "event_id")
    val row = Joins.asofJoin(probe, state).collect().head
    assert(row.getTimestamp(3) === ts("2024-01-01 00:00:00"))
  }

  test("range join with overlapping tiers equals the theta-join definition") {
    val sfDir = "/root/testdata/sf0.001"
    val got = Joins.rangeJoinQ(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // theta-join reference computed directly (no bins)
    val p = graft.engine.Tables.part(spark, sfDir)
    val exp = Joins.PriceTiers.map { case (t, lo, hi) =>
      t -> p.filter(col("p_retailprice") >= lo && col("p_retailprice") < hi).count()
    }.filter(_._2 > 0).sortBy(_._1)
    assert(got === exp)
  }

  test("every fact-tier match lands in exactly one bin (no dedup needed)") {
    // a part at price p has bin floor(p/W); a tier [lo,hi) containing p
    // lists that bin exactly once in its exploded bin set
    val tiers = Joins.PriceTiers
    for (price <- Seq(0.0, 99.99, 800.0, 999.5, 1199.99, 1600.0, 2099.0);
         (t, lo, hi) <- tiers if price >= lo && price < hi) {
      val bin = math.floor(price / Joins.BinWidth).toInt
      val binsOfTier = (lo / Joins.BinWidth) to ((hi - 1) / Joins.BinWidth)
      assert(binsOfTier.count(_ == bin) === 1, s"tier $t price $price")
    }
  }
}
