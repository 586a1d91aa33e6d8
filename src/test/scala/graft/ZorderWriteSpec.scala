package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** The data-skipping payoff `q_zorder_layout` promises, measured for real:
  * write the same points z-sorted and hash-scattered, scan both with the
  * same selective predicate, and compare how many rows the parquet reader
  * actually surfaces (surviving row-group skipping via file min/max stats).
  * The z-sorted layout must skip on EITHER dimension; the scattered layout
  * can't skip at all (every file spans the full domain).
  */
class ZorderWriteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Rows the parquet scan emitted = rows in row groups that survived
    * min/max pruning (the post-scan Filter then trims them; we measure the
    * scan, which is what I/O is proportional to). */
  private def scannedRows(path: String, cond: org.apache.spark.sql.Column): Long = {
    val df = spark.read.parquet(path).filter(cond)
    df.collect()
    def leafScan(p: SparkPlan): FileSourceScanExec = p match {
      case a: AdaptiveSparkPlanExec => leafScan(a.executedPlan)
      case other => other.collectLeaves()
        .collectFirst { case f: FileSourceScanExec => f }.get
    }
    leafScan(df.queryExecution.executedPlan).metrics("numOutputRows").value
  }

  test("z-sorted parquet skips row groups on either dimension; scattered can't") {
    // balanced 8-bit x 8-bit point set (the layout's sweet spot)
    val pts = graft.engine.Tables.orders(spark, "/root/testdata/sf0.01")
      .select(pmod(col("o_custkey"), lit(256L)).as("x"),
        pmod(col("o_orderkey"), lit(256L)).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    Relational.zorderWrite(pts, s"$dir/sorted", 32)
    // hash-scatter control (round-robin would accidentally cluster y:
    // orderkey strides are regular, so every 32nd row cycles few residues)
    pts.repartition(32, col("x"), col("y"))
      .write.mode("overwrite").parquet(s"$dir/unsorted")

    val total = pts.count()
    for (cond <- Seq(col("x") === 5, col("y") === 200)) {
      val sorted = scannedRows(s"$dir/sorted", cond)
      val unsorted = scannedRows(s"$dir/unsorted", cond)
      // scattered: files span the domain, so (almost) nothing skips
      assert(unsorted * 5 >= total * 4,
        s"unsorted layout skipped too much to be a control ($cond)")
      // z-sorted: a point predicate on either dimension fixes the leading
      // interleaved bits, so most curve slices (files) prune out. Margin is
      // 2x, not the ~3-10x seen in isolation: under the parallel test run
      // the shared session's conf can shift the range-partitioner's sampled
      // file boundaries, which costs some pruning but never the property.
      assert(sorted * 2 <= unsorted,
        s"z-sorted scanned $sorted vs unsorted $unsorted for $cond — no skipping")
    }
    // matching answers — skipping must never change results
    val probe = col("x") === 5
    val a = spark.read.parquet(s"$dir/sorted").filter(probe).count()
    val b = spark.read.parquet(s"$dir/unsorted").filter(probe).count()
    assert(a == b)
  }
}
