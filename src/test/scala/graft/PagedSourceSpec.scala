package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PagedSource
import graft.sources.PagedSource.{Page, PageTransport, StubTransport}

/** The paged-source client: token-chain integrity, retry billing, quota
  * stop, and the clean failure mode (the engine half of the reference's
  * API client, with the socket behind the transport seam). */
class PagedSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def corpus(n: Int): Map[String, Array[Long]] =
    Map("a" -> (1L to n).toArray)

  test("chain walk fetches every id exactly once, in page order") {
    val m = corpus(11)
    val df = PagedSource.fetchChains(spark, Seq("a"),
      () => new StubTransport(m, 4))
    val rows = df.collect()
    assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to 11L))
    // page boundaries: 4, 4, 3
    val perPage = rows.groupBy(_.getInt(2)).view.mapValues(_.length).toMap
    assert(perPage === Map(0 -> 4, 1 -> 4, 2 -> 3))
  }

  test("transient failures retry and each retry is billed as a call") {
    val m = corpus(11)
    val df = PagedSource.fetchChains(spark, Seq("a"),
      () => new StubTransport(m, 4), unitsPerCall = 7L)
    // stub fails first attempt of pages ≡ 1 (mod 3): page 1 costs 2 calls
    val attempts = df.groupBy("page_no")
      .agg(max("page_attempts").as("att")).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(attempts === Map(0 -> 1, 1 -> 2, 2 -> 1))
    // total calls 4 -> 28 units, the number the gated query's oracle prices
    assert(attempts.values.sum * 7L === 28L)
  }

  test("a chain stops cleanly before the first attempt that would overdraw quota") {
    // 40 ids / pageSize 4 = 10 pages; with retries pages cost
    // 1,2,1,1,2,1,1,2,1,1 calls. Budget 3 calls: page 0 (1 call) +
    // page 1 (2 calls, retry allowed to overdraw? no: spent=1, +1 <= 3 ok,
    // retry bills to 3) then page 2 needs spent+1 > 3 -> stop.
    val m = corpus(40)
    val df = PagedSource.fetchChains(spark, Seq("a"),
      () => new StubTransport(m, 4),
      unitsPerCall = 1L, quotaPerChain = 3L)
    val pages = df.select("page_no").distinct().collect().map(_.getInt(0)).sorted
    assert(pages.toSeq === Seq(0, 1))
    assert(df.count() === 8L) // two full pages, nothing from page 2
  }

  test("retries exhausted surfaces as the clean failure signal") {
    class DownTransport extends PageTransport {
      def fetch(chain: String, token: Option[String]) = Left("503 down")
    }
    val e = intercept[org.apache.spark.SparkException] {
      PagedSource.fetchChains(spark, Seq("a"),
        () => new DownTransport, maxAttempts = 2).count()
    }
    assert(e.getMessage.contains("RetriesExhausted") ||
      Option(e.getCause).exists(_.toString.contains("RetriesExhausted")) ||
      e.toString.contains("failed 2 attempts"))
  }

  test("an empty chain yields one empty page and no rows") {
    class EmptyTransport extends PageTransport {
      def fetch(chain: String, token: Option[String]) =
        Right(Page(Array.empty[Long], None))
    }
    val df = PagedSource.fetchChains(spark, Seq("a"),
      () => new EmptyTransport)
    assert(df.count() === 0L)
  }

  test("DataSourceV2: one input partition per chain, rows complete, retries page-exact") {
    val df = spark.read.format("graft.sources.PagedTableProvider")
      .option("chains", "4").option("rowsPerChain", "7")
      .option("pageSize", "3").load()
    // the planner must see chains as splits — that IS the DSv2 point
    assert(df.rdd.getNumPartitions === 4)
    val rows = df.collect()
    assert(rows.length === 28)
    val byChain = rows.groupBy(_.getString(0))
    assert(byChain.keySet === Set("c0", "c1", "c2", "c3"))
    byChain.foreach { case (c, rs) =>
      val ci = c.drop(1).toInt
      assert(rs.map(_.getLong(1)).sorted.toSeq ===
        (0 until 7).map(k => ci + k * 4L), c)
    }
    // pages 0(3 rows), 1(3), 2(1); page 1's first attempt fails -> 2 calls
    val att = rows.groupBy(_.getInt(2)).view.mapValues(_.map(_.getInt(3)).max)
    assert(att.toMap === Map(0 -> 1, 1 -> 2, 2 -> 1))
  }

  test("DataSourceV2: column pruning reaches the scan's read schema") {
    val df = spark.read.format("graft.sources.PagedTableProvider")
      .option("chains", "2").option("rowsPerChain", "5")
      .option("pageSize", "5").load()
      .select("chain", "id")
    val plan = df.queryExecution.executedPlan.toString
    // the BatchScan's own output must be the 2-column schema — pruning at
    // the reader, not a post-scan project over 4 materialized columns
    val scanLine = plan.linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("chain#") && scanLine.contains("id#") &&
      !scanLine.contains("page_no#") && !scanLine.contains("page_attempts#"),
      s"scan did not prune:\n$plan")
    assert(df.collect().map(_.getLong(1)).sorted.toSeq ===
      Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
  }

  test("DataSourceV2: a chain-equality filter prunes input partitions at planning time") {
    val base = spark.read.format("graft.sources.PagedTableProvider")
      .option("chains", "8").option("rowsPerChain", "6")
      .option("pageSize", "4").load()
    val one = base.filter(col("chain") === "c5")
    assert(one.rdd.getNumPartitions === 1, "EqualTo should plan 1 chain")
    assert(one.collect().map(_.getLong(1)).sorted.toSeq ===
      (0 until 6).map(k => 5L + k * 8L))
    val two = base.filter(col("chain").isin("c1", "c6"))
    assert(two.rdd.getNumPartitions === 2, "In should plan 2 chains")
    assert(two.count() === 12L)
    // a non-chain filter is NOT consumed: full partition fan-out, Spark
    // evaluates it post-scan, results still correct
    val residual = base.filter(col("id") === 5L)
    assert(residual.rdd.getNumPartitions === 8)
    assert(residual.count() === 1L)
  }

  test("DataSourceV2: COUNT(*) pushes completely — no aggregate, no page walk") {
    val base = spark.read.format("graft.sources.PagedTableProvider")
      .option("chains", "6").option("rowsPerChain", "1000")
      .option("pageSize", "7").load()
    // grouped: one pre-counted row per chain, Spark's aggregate GONE
    val grouped = base.groupBy("chain").count()
    val gPlan = grouped.queryExecution.executedPlan.toString
    assert(!gPlan.contains("HashAggregate"),
      s"grouped count must push completely:\n$gPlan")
    assert(grouped.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === (0 until 6).map(i => s"c$i" -> 1000L).toMap)
    // global: one row, also no aggregate in the plan
    val total = base.count()
    assert(total === 6000L)
    // composes with chain pruning: count of one chain = rowsPerChain
    assert(base.filter(col("chain") === "c2").count() === 1000L)
    // SELECT count(*), count(*): Catalyst dedupes the identical
    // CountStars BEFORE offering the aggregation, so the scan still sees
    // arity 1, claims complete pushdown legally, and the duplicate is a
    // post-scan Project of the single pushed count column. The arity
    // guard in isCountStarByChain (ADVICE r8) is therefore defensive —
    // this pins the observed contract: correct values, no page walk,
    // and the pushed schema stays one count column.
    val twoCounts = base.groupBy("chain")
      .agg(count(lit(1)).as("a"), count(lit(1)).as("b"))
      .filter(col("chain") === "c3")
    val tPlan = twoCounts.queryExecution.executedPlan.toString
    assert(!tPlan.contains("HashAggregate"),
      s"deduped two-count should still push completely:\n$tPlan")
    assert(twoCounts.collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      === Seq((1000L, 1000L)))
  }

  test("DataSourceV2 streaming: AvailableNow drains in page-bounded micro-batches and equals the batch read") {
    // The reference's operating mode is a timer re-poll resuming from a
    // page token; the MICRO_BATCH_READ facet models it with offset = page
    // watermark and maxPagesPerTrigger as the per-poll quota bound. Pin:
    // (a) multiple micro-batches, (b) each batch spans ≤ maxPages pages,
    // (c) the full drain is row-identical to the batch read — including
    // page_attempts, i.e. the retry schedule is batch-boundary-invariant.
    val opts = Map("chains" -> "4", "rowsPerChain" -> "97",
      "pageSize" -> "10", "maxPagesPerTrigger" -> "3")
    val sinkName = "graft_paged_stream_spec"
    val q = spark.readStream.format("graft-paged").options(opts).load()
      .writeStream.outputMode("append").format("memory")
      .queryName(sinkName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // 10 pages at 3/trigger → 4 data micro-batches
    val prog = q.recentProgress.filter(_.numInputRows > 0)
    assert(prog.length === 4, s"expected 4 data batches, got ${prog.length}")
    // offsets advance by ≤ 3 pages per batch and end at the horizon
    val ends = prog.flatMap(_.sources.headOption)
      .map(s => """\d+""".r.findFirstIn(s.endOffset).get.toInt)
    assert(ends.toSeq === Seq(3, 6, 9, 10), s"page watermarks: ${ends.toSeq}")
    val drained = spark.table(sinkName)
    val batch = spark.read.format("graft-paged").options(opts).load()
    // row-for-row identical, attempts included
    assert(drained.exceptAll(batch).isEmpty && batch.exceptAll(drained).isEmpty,
      "stream drain and batch read diverge")
    spark.catalog.dropTempView(sinkName)
  }

  test("DataSourceV2: a broadcast join runtime-filters chains before any transport call") {
    // DPP for a remote collection: the build side of a broadcast join
    // resolves to few chains at EXECUTION time, and SupportsRuntimeV2
    // Filtering hands the scan that IN-set — whole chains drop before a
    // single page is requested (for a quota-billed API, quota saved).
    graft.sources.PagedScanProbe.lastRuntimeKept = None
    val base = spark.read.format("graft-paged")
      .option("chains", "6").option("rowsPerChain", "100")
      .option("pageSize", "10").load()
    // DPP's planner heuristic requires a SELECTIVE predicate on the
    // build side (an unfiltered dim is assumed non-pruning), and the dim
    // must be RDD-backed — a LocalRelation folds the filter away before
    // the pruning rule can see it. Production shape: dim filtered by the
    // query, fact pruned by the surviving keys.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val dim = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("c4", 1), Row("c5", 2))),
      StructType(Seq(StructField("chain", StringType),
        StructField("grp", IntegerType))))
      .filter(col("grp") === 1)
    val joined = base.join(broadcast(dim), Seq("chain"))
    assert(joined.count() === 100L)
    assert(graft.sources.PagedScanProbe.lastRuntimeKept === Some(1),
      "runtime filter did not prune to the single joined chain")
  }

  test("DataSourceV2 streaming: a restart resumes from the committed page offset (no re-poll)") {
    // The reference's timer re-poll only works because the page token
    // survives across activations; the stream facet's offset must do the
    // same through a checkpoint. Drain to a FILE sink (recovery-capable),
    // then restart against the same checkpoint: the second run must find
    // the offset at the horizon and fetch NOTHING new.
    val ckpt = java.nio.file.Files.createTempDirectory("graft_paged_ckpt_")
    val out = java.nio.file.Files.createTempDirectory("graft_paged_out_")
    val opts = Map("chains" -> "3", "rowsPerChain" -> "40",
      "pageSize" -> "10", "maxPagesPerTrigger" -> "2")
    def drain(): Unit = {
      val q = spark.readStream.format("graft-paged").options(opts).load()
        .writeStream.outputMode("append").format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out.toString).count() === 120L)
    // restart: offset is committed at the horizon — zero new rows, and
    // the sink is not double-appended
    drain()
    assert(spark.read.parquet(out.toString).count() === 120L,
      "restart re-polled already-committed pages")
  }

  test("DataSourceV2: LIMIT caps each chain's page walk (partial pushdown)") {
    val base = spark.read.format("graft.sources.PagedTableProvider")
      .option("chains", "3").option("rowsPerChain", "100")
      .option("pageSize", "4").load()
    val limited = base.limit(5)
    assert(limited.count() === 5L)
    // the reader stopped paging: each partition emitted at most 5 rows
    // (2 pages of 4), never the full 25-page chain — observable because
    // page_no stays under 2 everywhere in the limited result
    val pages = limited.collect().map(_.getInt(2))
    assert(pages.forall(_ <= 1), s"reader paged past the limit: ${pages.toSeq}")
  }

  test("DataSourceV2: short name resolves through the ServiceLoader registry") {
    val df = spark.read.format("graft-paged")
      .option("chains", "2").option("rowsPerChain", "3")
      .option("pageSize", "3").load()
    assert(df.schema.fieldNames.toSeq ===
      Seq("chain", "id", "page_no", "page_attempts"))
    assert(df.count() === 6L)
  }

  test("chains partition across tasks; results are chain-disjoint and complete") {
    val many = (0 until 8).map(i => s"c$i")
    val served = many.zipWithIndex.map { case (c, i) =>
      c -> (1L to (i + 1).toLong).map(_ + i * 100).toArray
    }.toMap
    val df = PagedSource.fetchChains(spark, many,
      () => new StubTransport(served, 3))
    val got = df.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    assert(got === served.view.mapValues(_.toSeq).toMap)
  }

  // ---- streaming quota ledger across restarts (VERDICT r9 task 8) ----

  private def drainOnce(ckpt: String, out: String,
      opts: Map[String, String]): Either[Throwable, Unit] = {
    val reader = opts.foldLeft(
      spark.readStream.format("graft-paged")
        .option("chains", "3").option("rowsPerChain", "523")
        .option("pageSize", "40").option("maxPagesPerTrigger", "4")
    ) { case (r, (k, v)) => r.option(k, v) }
    val q = reader.load().writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try { q.awaitTermination(); Right(()) }
    catch { case e: Throwable => Left(e) }
  }

  test("a killed-and-resumed drain bills exactly the single-run quota") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_ledger_spec_").toString
    // reference run: one uninterrupted drain
    assert(drainOnce(s"$base/ckptA", s"$base/outA", Map.empty).isRight)
    val single = PagedSource.checkpointLedger(s"$base/ckptA")
    assert(single > 0L)
    // crash run: dies at page 8 of 14, then resumes on the same checkpoint
    val crashed = drainOnce(s"$base/ckptB", s"$base/outB",
      Map("simulateCrashAtPage" -> "8"))
    assert(crashed.isLeft, "the crash seam must kill run 1 mid-horizon")
    val midLedger = PagedSource.checkpointLedger(s"$base/ckptB")
    assert(midLedger > 0L && midLedger < single,
      s"mid-crash ledger $midLedger should be a strict prefix of $single")
    assert(drainOnce(s"$base/ckptB", s"$base/outB", Map.empty).isRight)
    // the resumed ledger CONTINUED the dead run's spend — equal billing
    assert(PagedSource.checkpointLedger(s"$base/ckptB") === single)
    // and the data halves stitched exactly-once
    val a = spark.read.parquet(s"$base/outA")
      .agg(count(lit(1)), sum(col("id"))).collect().head
    val b = spark.read.parquet(s"$base/outB")
      .agg(count(lit(1)), sum(col("id"))).collect().head
    assert(a === b)
  }

  test("quota budget is account-scoped admission control: too small fails loudly before overspend") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_budget_spec_").toString
    // 14 pages × (1 + retry on ≡1 mod 3) = 19 calls × 3 chains × 100 units
    // = 5700 total; 2000 affords the first batches then must refuse
    val r = drainOnce(s"$base/ckpt", s"$base/out",
      Map("quotaBudget" -> "2000"))
    assert(r.isLeft)
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
    assert(rootCause(r.left.toOption.get)
      .isInstanceOf[PagedSource.QuotaExhausted])
    // the ledger never passed the budget
    assert(PagedSource.checkpointLedger(s"$base/ckpt") <= 2000L)
    // a budget covering the horizon admits everything
    val ok = drainOnce(s"$base/ckpt2", s"$base/out2",
      Map("quotaBudget" -> "5700"))
    assert(ok.isRight)
    assert(PagedSource.checkpointLedger(s"$base/ckpt2") === 5700L)
  }
}
