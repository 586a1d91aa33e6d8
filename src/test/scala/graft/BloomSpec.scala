package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

/** Bloom-filter join pruning invariants: no false negatives ever, false
  * positives measured and deterministic. */
class BloomSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("bloom candidates are a superset of true matches (no false negatives)") {
    val sf = "/root/testdata/sf0.01"
    val out = Joins.bloomJoinQ(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"candidates < actual in $r")
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2))
    }
    // the filter must pass EVERY true match: per-group actual == the real
    // semi-join count (a false negative would undercount a group)
    val dim = graft.engine.Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === Joins.BloomSegment)
      .select(col("c_custkey").as("o_custkey"))
    val trueCounts = graft.engine.Tables.orders(spark, sf)
      .join(dim, Seq("o_custkey"), "left_semi")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(2) === trueCounts.getOrElse(r.getString(0), 0L),
        s"actual mismatch for ${r.getString(0)}")
    }
  }

  test("bloom decision is rerun-deterministic") {
    val sf = "/root/testdata/sf0.001"
    val a = Joins.bloomJoinQ(spark, sf).collect().toSeq
    val b = Joins.bloomJoinQ(spark, sf).collect().toSeq
    assert(a === b)
  }
}
