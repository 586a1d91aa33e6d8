package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for q_substr_dupes phases (dev-only). */
object ProfileSubstr {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.engine.TempWarehouse.createManaged())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $tag ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    import graft.operators.Dedup.{SubstrN, SubstrW}
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= SubstrN)
      .repartition(col("doc_id"))
    val pos = docs.select(col("doc_id"), col("text"),
      explode(sequence(lit(1), length(col("text")) - SubstrN + 1)).as("i"))
    t("explode only, count")(pos.count())
    val grams = pos.select(col("doc_id"), col("i"),
      expr(s"substring(text, i, $SubstrN)").as("gram"))
    t("explode+substr, count via agg")(
      grams.agg(sum(length(col("gram")))).head())
    val fp = grams.withColumn("fp",
      conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long"))
    t("explode+substr+md5conv, sum(fp%k)")(
      fp.agg(sum(col("fp") % 1000000L)).head())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(-(SubstrW - 1), org.apache.spark.sql.expressions.Window.currentRow)
    val sel = fp.withColumn("wmin", min(col("fp")).over(w))
      .filter(col("fp") - col("wmin") === 0L)
    t("…+window+filter, count")(sel.count())
    t("full query")(
      graft.operators.Dedup.substrDupesQ(spark, sfDir).collect())
    t("full query again")(
      graft.operators.Dedup.substrDupesQ(spark, sfDir).collect())
    spark.stop()
  }
}
