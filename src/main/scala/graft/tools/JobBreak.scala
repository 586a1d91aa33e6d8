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
    val builder = SparkSession.builder()
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
    // A/B hook: SPARK_GRAFT_CONFS="k=v;k=v" layers extra session confs
    // so candidate settings can be measured without editing the tool
    sys.env.get("SPARK_GRAFT_CONFS").foreach(_.split(';').foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) builder.config(kv.take(i), kv.drop(i + 1))
    })
    val spark = builder.getOrCreate()
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
    // Streaming decomposition: per-batch durationMs from the engine's own
    // progress events (triggerExecution = wall; addBatch/getBatch/
    // queryPlanning/walCommit/commitOffsets split it)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          import scala.jdk.CollectionConverters._
          val d = e.progress.durationMs.asScala.toSeq.sortBy(-_._2)
            .map { case (k, v) => s"$k=$v" }.mkString(" ")
          println(s"[streambreak] batch${e.progress.batchId} " +
            s"rows=${e.progress.numInputRows} $d")
        }
      })
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Paired A/B under ambient load (this host's co-tenant noise swings
    // 2-5×): SPARK_GRAFT_AB="conf=value" alternates the session conf
    // OFF/ON between consecutive reps, so each pair shares its load
    // environment and the delta is the conf's, not the neighbours'.
    val ab = sys.env.get("SPARK_GRAFT_AB").flatMap { kv =>
      val i = kv.indexOf('='); if (i > 0) Some(kv.take(i) -> kv.drop(i + 1))
      else None
    }
    name.split(',').filter(_.nonEmpty).foreach { nm =>
      val fn = graft.SparkEntry.queries(nm)
      (1 to reps).foreach { rep =>
        val abTag = ab.map { case (k, v) =>
          if (rep % 2 == 1) { spark.conf.unset(k); "A(default)" }
          else { spark.conf.set(k, v); s"B($v)" }
        }.getOrElse("")
        rows.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (abTag.nonEmpty)
          println(f"[jobbreak-ab] $nm rep$rep $abTag $dt%7.3f s")
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
