package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: prints formatted physical plans for named queries so plan
  * quality (pushdown, join strategy, codegen spans) can be audited per
  * operator. Usage: runMain graft.tools.Explain <sfDir> <qname> [qname...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.engine.TempWarehouse.createManaged())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { q =>
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
