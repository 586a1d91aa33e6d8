package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print a query's executed physical plan (the `.explain`
  * feedback loop PlanSpec's guards are written against). Run:
  * sbt "runMain graft.tools.PlanDump q_attribution" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries(args(0))(spark, sfDir)
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
