package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler for the stream-stream interval join (q_streaming_join):
  * drains Incremental's OWN join plan (one definition — no drifted copy)
  * with progress capture so per-micro-batch durations (addBatch /
  * getBatch / walCommit / state commit) are visible at a chosen shuffle
  * partition count. This is the tool behind withDrainParts' store-sizing
  * numbers (re-measured on this shared plan after an earlier drifted
  * copy profiled a 24 h horizon). Run:
  * sbt "runMain graft.tools.ProfileStreamJoin /root/testdata/sf0.1 8"
  */
object ProfileStreamJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1) else "8"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.engine.TempWarehouse.createManaged())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val joined = graft.streaming.Incremental.streamingJoinPlan(spark, sfDir)
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName(s"psj_$rep")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[psj] rep$rep total ${dt}%.2f s, batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        println(s"[psj]   batch ${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} state=${p.stateOperators.map(s =>
            s"rowsTotal=${s.numRowsTotal} updated=${s.numRowsUpdated} commitMs=${s.commitTimeMs}").mkString(";")}")
      }
    }
    spark.stop()
  }
}
