package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q_dedup_clusters phases (dev-only). */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
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
    val pairs = t("minhashPairs+mat") {
      graft.engine.Materialize.diskBacked(
        graft.operators.Dedup.minhashPairs(
          graft.engine.Tables.documents(spark, sfDir))
          .select(col("doc_a"), col("doc_b")))
    }
    val n = t("pairs count")(pairs.count())
    println(s"[prof] n_pairs=$n")
    val sym = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val (edges, nEdges) = t("edges mat+count") {
      graft.engine.Materialize.diskBackedWithCount(
        sym.unionByName(
          sym.select(col("src")).distinct()
            .select(col("src"), col("src").as("dst"))))
    }
    println(s"[prof] n_edges=$nEdges")
    val nParts = 1
    val e2 = edges.repartition(nParts, col("dst"))
    def step(ls: org.apache.spark.sql.DataFrame) =
      e2.join(ls.select(col("node").as("dst"), col("label")), Seq("dst"))
        .repartition(nParts, col("src"))
        .groupBy(col("src").as("node")).agg(min(col("label")).as("label"))
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    var prev: java.math.BigDecimal = null
    var done = false
    var round = 0
    while (!done && round < 15) {
      round += 1
      val nx = step(step(step(labels))).persist(
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val s = t(s"round $round sum") {
        nx.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      }
      done = prev != null && s.compareTo(prev) == 0
      prev = s
      labels = nx
    }
    println(s"[prof] rounds=$round")
    t("final orderBy count")(labels.orderBy(col("node")).count())
    spark.stop()
  }
}
