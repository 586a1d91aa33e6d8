package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev audit: compile every SparkEntry query's physical plan and flag the
  * scale anti-patterns (cartesian products, nested-loop joins, single-
  * partition exchanges, CodegenFallback-heavy nodes). Bounded-broadcast
  * cross joins are expected for the documented single-row/scalar attach
  * points — the sweep prints them so each occurrence can be adjudicated,
  * it does not fail. Usage: runMain graft.tools.PlanSweep <sfDir> */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.engine.TempWarehouse.createManaged())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val flags = Seq(
      "CartesianProduct" -> "cartesian",
      "BroadcastNestedLoopJoin" -> "bnl-join",
      "SinglePartition" -> "single-partition",
      "CodegenFallback" -> "codegen-fallback")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hits = flags.collect { case (pat, tag) if p.contains(pat) => tag }
        println(f"[sweep] $name%-24s ${if (hits.isEmpty) "clean" else hits.mkString(",")}")
      } catch {
        case e: Throwable => println(f"[sweep] $name%-24s ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
