package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.TableCommit

/** Scale soaks for the commit-log plane (VERDICT r11 tasks 2/3/7):
  *
  *   `commits <n> [checkpointEvery]` — n single-file appends; reports
  *     per-commit latency at the start vs the end of the history (the
  *     O(history) regression this would catch), cumulative manifest
  *     bytes vs the naive full-rewrite cost, one full-history
  *     changesBetween pass (the feed/stream planner's walk), and the
  *     stream-shaped incremental poll (span-sized windows).
  *
  *   `dv <files> <rowsPerFile> <deletePerMille> <inlineMax>` — the DV
  *     stress shape: delete ~frac of rows across EVERY file in one
  *     commit; reports commit latency, manifest bytes before/after,
  *     read overhead (DV'd read vs pre-delete read), and full-CDF
  *     derivation cost. Run once with inlineMax high (inline vectors)
  *     and once low (sidecars) to price the X269 threshold.
  *
  * Results land in SCALING.md by hand. */
object ManifestSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.engine.TempWarehouse.createManaged())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption match {
      case Some("commits") =>
        commits(spark, args(1).toInt,
          if (args.length > 2) args(2).toInt else 16)
      case Some("dv") =>
        dv(spark, args(1).toInt, args(2).toInt, args(3).toInt,
          args(4).toInt)
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }

  private def logBytes(root: String): Long = {
    val dir = Paths.get(root, "_log")
    if (!Files.isDirectory(dir)) return 0L
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(Files.size).sum
    } finally s.close()
  }

  private def commits(spark: SparkSession, n: Int, ce: Int): Unit = {
    val root = Files.createTempDirectory("graft_msoak_").toString + "/t"
    val df = spark.range(10).selectExpr("id as k", "id * 2 as v")
      .coalesce(1)
    var manifestBytes = 0L
    val lat = new Array[Double](n)
    val t0 = System.nanoTime()
    (1 to n).foreach { i =>
      val c0 = System.nanoTime()
      TableCommit.commitAppend(df, root, retain = n + 1,
        checkpointEvery = ce)
      lat(i - 1) = (System.nanoTime() - c0) / 1e9
    }
    val total = (System.nanoTime() - t0) / 1e9
    manifestBytes = logBytes(root)
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val first = med(lat.take(50).toSeq)
    val last = med(lat.takeRight(50).toSeq)
    // naive cost: every commit rewrites the full list (i entries)
    val entryLine = 120L // ~bytes per manifest entry line
    val naive = (1L to n.toLong).map(_ * entryLine).sum
    println(f"[msoak] commits=$n ce=$ce total=$total%.1f s " +
      f"medLatFirst50=$first%.4f s medLatLast50=$last%.4f s " +
      f"ratio=${last / first}%.2f")
    println(f"[msoak] manifestBytes=$manifestBytes " +
      f"naiveFullRewriteBytes~=$naive ratio=${
        manifestBytes.toDouble / naive}%.4f")
    // one full-history feed walk (what a from-zero consumer pays)
    val w0 = System.nanoTime()
    val chs = TableCommit.changesBetween(root, 0L, n.toLong)
    val walk = (System.nanoTime() - w0) / 1e9
    println(f"[msoak] changesBetween(0,$n): $walk%.2f s " +
      f"(${chs.map(_.added.size).sum} added entries)")
    // stream-shaped polling: 50-version spans across the history
    val span = 50L
    val p0 = System.nanoTime()
    var v = 0L
    var planned = 0
    while (v < n) {
      val hi = math.min(v + span, n.toLong)
      planned += TableCommit.changesBetween(root, v, hi)
        .map(_.added.size).sum
      v = hi
    }
    val poll = (System.nanoTime() - p0) / 1e9
    println(f"[msoak] incremental polls (span=$span): $poll%.2f s " +
      f"($planned planned entries)")
  }

  private def dv(spark: SparkSession, files: Int, rows: Int,
      perMille: Int, inlineMax: Int): Unit = {
    val root = Files.createTempDirectory("graft_dvsoak_").toString + "/t"
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", LongType)))
    val df = spark.range(files.toLong * rows)
      .selectExpr("id as k", "id * 2 as v").repartition(files)
    TableCommit.commitAppend(df, root, retain = 4)
    val bytesBefore = logBytes(root)
    val r0 = System.nanoTime()
    val n0 = TableCommit.read(spark, root, schema).count()
    val readPlain = (System.nanoTime() - r0) / 1e9
    val d0 = System.nanoTime()
    TableCommit.commitDeleteRows(spark, root, schema,
      pmod(col("k"), lit(1000L)) < perMille, retain = 4,
      inlineDvMax = inlineMax)
    val delT = (System.nanoTime() - d0) / 1e9
    val bytesAfter = logBytes(root)
    val sidecarBytes = {
      val dir = Paths.get(root, "_dv")
      if (!Files.isDirectory(dir)) 0L
      else {
        val s = Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(Files.size).sum
        } finally s.close()
      }
    }
    val r1 = System.nanoTime()
    val n1 = TableCommit.read(spark, root, schema).count()
    val readDv = (System.nanoTime() - r1) / 1e9
    val f0 = System.nanoTime()
    val cdf = TableCommit.readChangesFull(spark, root, schema, 1L, 2L)
      .count()
    val cdfT = (System.nanoTime() - f0) / 1e9
    println(f"[dvsoak] files=$files rowsPerFile=$rows " +
      f"perMille=$perMille inlineMax=$inlineMax")
    println(f"[dvsoak] deleteCommit=$delT%.2f s deleted=${n0 - n1} " +
      f"readPlain=$readPlain%.2f s readDv=$readDv%.2f s " +
      f"overhead=${readDv / readPlain}%.2f")
    println(f"[dvsoak] manifestBytes before=$bytesBefore " +
      f"after=$bytesAfter growth=${bytesAfter - bytesBefore} " +
      f"sidecarBytes=$sidecarBytes")
    println(f"[dvsoak] fullCdf rows=$cdf in $cdfT%.2f s")
  }
}
