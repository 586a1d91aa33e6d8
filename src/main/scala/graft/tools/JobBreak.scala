package graft.tools


import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiler (r16, guide §1): per-JOB wall breakdown of one query —
  * composite queries (fixture commits, streaming drains, iterative
  * passes) run many Spark jobs and the slow one is invisible in a single
  * end-to-end number. Prints every job's duration, description and
  * callsite, so the optimization effort lands on the job that owns the
  * time. Usage: runMain graft.tools.JobBreak <qname> [sfDir] [reps]
  */
object JobBreak {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      .config("spark.sql.warehouse.dir",
        graft.engine.TempWarehouse.createManaged())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        starts.put(e.jobId, (e.time, if (desc.nonEmpty) desc else site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, d) =>
          rows.add((e.jobId, (e.time - t0) / 1e3, d))
        }
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    name.split(',').filter(_.nonEmpty).foreach { nm =>
      val fn = graft.SparkEntry.queries(nm)
      (1 to reps).foreach { rep =>
        rows.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        import scala.jdk.CollectionConverters._
        val all = rows.asScala.toSeq.sortBy(_._1)
        println(f"[jobbreak] $nm rep$rep total=$dt%7.3f s rows=$n jobs=${all.size}")
        all.foreach { case (id, s, d) =>
          println(f"[jobbreak]   job$id%-4d $s%8.3f s  ${d.take(110)}")
        }
        println(f"[jobbreak]   sum-of-jobs ${all.map(_._2).sum}%8.3f s (gap to total = driver/planning)")
      }
    }
    spark.stop()
  }
}
