package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the stream-stream interval join (q_streaming_join):
  * drains the same plan with progress capture so per-micro-batch
  * durations (addBatch / getBatch / walCommit / stateMemory) are visible.
  * Run: sbt "runMain graft.tools.ProfileStreamJoin /root/testdata/sf0.1 8"
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
    val schema = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(sfDir).schema
    def src = graft.engine.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir))
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = views.join(purchases,
      col("v_user") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("interval 86400 seconds"))
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
