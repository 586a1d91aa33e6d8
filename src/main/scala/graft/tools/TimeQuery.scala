package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev profiler: time one named query N times (median-friendly) without the
  * full-bench noise. Run: sbt "runMain graft.tools.TimeQuery q_dedup_ngram 3
  * /root/testdata/sf0.1" */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.engine.TempWarehouse.createManaged())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Optional: mimic the bench's per-plan warmup pass at another sf
    // first (SPARK_GRAFT_WARM_SF=/root/testdata/sf0.01) — for chasing
    // timings that only reproduce in the bench's session context.
    sys.env.get("SPARK_GRAFT_WARM_SF").foreach { wsf =>
      name.split(',').foreach { nm =>
        try SparkEntry.queries(nm)(spark, wsf).count()
        catch { case _: Throwable => () }
      }
      try spark.catalog.clearCache() catch { case _: Throwable => () }
    }
    // Comma-separated names time several queries in one JVM (shared warmup).
    name.split(',').foreach { nm =>
      val fn = SparkEntry.queries(nm)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[timeq] $nm rep$i ${(System.nanoTime() - t0) / 1e9}%7.3f s ($n rows)")
        try spark.catalog.clearCache() catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
