package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.pipeline.{Fixtures, Medallion}

/** Dev profiler: times each medallion stage at fixture scale so the bench
  * cost of `q_pipeline_daily_agg` can be attributed. Not part of the driver
  * contract. Run: sbt "runMain graft.tools.TimePipeline" */
object TimePipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.engine.TempWarehouse.createManaged())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    (1 to 2).foreach { round =>
      val base = Files.createTempDirectory("graft_timepipe_").toString
      val raw = t("writeRaw")(Fixtures.writeRaw(base))
      val wh = s"$base/warehouse"
      (1 to 2).foreach { runN =>
        println(s"-- round $round run $runN")
        t("loadStaging")(Medallion.loadStaging(spark, raw, wh))
        t("loadChannels")(Medallion.loadChannels(spark, raw, wh))
        t("loadFacts")(Medallion.loadFacts(spark, wh))
        t("refreshAgg")(Medallion.refreshAgg(spark, wh))
        t("cleanupStaging")(Medallion.cleanupStaging(spark, wh))
      }
      t("readAgg.count")(Medallion.readAgg(spark, wh).count())
    }
    spark.stop()
  }
}
