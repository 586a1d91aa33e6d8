package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Num, Tables}

/** Engine half of a paged REST collection source — the structural twin of
  * the reference's YouTube API client (`search().list` page-token walking
  * at /root/reference/src/youtube_collector.py:16-25, retry/batching in
  * /root/reference/azure-functions/function_app.py:60-116), with the
  * socket replaced by a pluggable [[PageTransport]] seam.
  *
  * What is REAL here (and gated): the paging protocol (opaque token
  * chain, terminated by None), bounded retry of transient failures,
  * per-call quota accounting with a hard budget, and the Spark-side
  * plumbing — each chain walks on an EXECUTOR (chains partition across
  * the cluster like the reference's region×keyword task matrix; the
  * driver never loops over pages), and the fetched rows land as a plain
  * DataFrame that downstream joins/aggregates treat like any scan. What
  * is stubbed: the HTTP socket itself ([[StubTransport]] replays a
  * canned corpus deterministically — no network library in this
  * container, and SURVEY §2.1 scopes the live client out of the
  * engine). A production transport implements [[PageTransport]] over a
  * real connection; nothing else changes.
  *
  * Scale shape: one task per chain (the protocol is sequential WITHIN a
  * chain — page N+1's token comes from page N, exactly the API
  * contract), chains spread by repartition, results are executor-local
  * rows. Quota is per-chain, mirroring per-key API budgets; a global
  * budget would need a shared accumulator and is deliberately out of
  * scope (the reference budgets per run, not globally).
  */
object PagedSource {

  /** One fetched page: record ids, the next page's token (None = chain
    * end). Ids stand in for full records — the reference joins fetched
    * ids back to a details call (S4 `q_batched_lookup`); this source is
    * the listing half. */
  final case class Page(ids: Array[Long], nextToken: Option[String])

  /** A transport attempt: Right(page) or Left(transient error message).
    * Non-transient failures should throw — the client does not retry
    * those. */
  type FetchResult = Either[String, Page]

  /** The socket seam. Implementations must be usable from executor code;
    * the FACTORY is what ships in the closure (a transport may hold
    * per-task connection state). */
  trait PageTransport extends Serializable {
    /** Fetch one page of `chain`, `token` = None for the first page. */
    def fetch(chain: String, token: Option[String]): FetchResult
  }

  /** Deterministic canned-corpus transport: serves `chains` (chain →
    * ascending record ids) in pages of `pageSize`, and injects a
    * TRANSIENT failure on the FIRST attempt of every page whose 0-based
    * index ≡ 1 (mod 3) — so retry behavior is exercised on a closed-form
    * schedule an oracle can price (pages failing once = ⌊(n_pages+1)/3⌋).
    * Stateful per INSTANCE (first-attempt memory); build one per task via
    * the factory so the schedule is deterministic within a chain walk. */
  final class StubTransport(chains: Map[String, Array[Long]], pageSize: Int)
      extends PageTransport {
    private val attempted = scala.collection.mutable.Set.empty[(String, Int)]
    def fetch(chain: String, token: Option[String]): FetchResult = {
      val pageNo = token.map(_.toInt).getOrElse(0)
      if (pageNo % 3 == 1 && attempted.add((chain, pageNo)))
        return Left(s"503 transient: $chain page $pageNo")
      val ids = chains.getOrElse(chain, Array.empty[Long])
      val from = pageNo * pageSize
      val slice = ids.slice(from, from + pageSize)
      val next = if (from + pageSize < ids.length) Some((pageNo + 1).toString)
                 else None
      Right(Page(slice, next))
    }
  }

  /** Raised when a page keeps failing transiently past `maxAttempts` —
    * the clean "the source is down" signal (the reference lets the
    * googleapiclient raise after its own retries). */
  final class RetriesExhausted(msg: String) extends RuntimeException(msg)

  /** Thrown by the streaming facet's admission control when advancing the
    * page watermark by even one page would overrun the account-scoped
    * `quotaBudget` — the connector analogue of the reference API's
    * dailyLimitExceeded error. Fails the poll LOUDLY instead of silently
    * stalling an AvailableNow drain. */
  final class QuotaExhausted(msg: String) extends RuntimeException(msg)

  /** Walk every chain's token sequence executor-side. Returns one row per
    * fetched record: (chain, id, page_no, page_attempts) — provenance
    * that makes paging, retry, and quota OBSERVABLE columns rather than
    * client-log trivia. Each transport call costs `unitsPerCall` against
    * `quotaPerChain`; a chain stops CLEANLY before the call that would
    * overdraw (partial results, like an API key hitting its daily cap
    * mid-collection — the reference's quota note at
    * /root/reference/src/config.py:42-44 sizes its matrix under the same
    * budget). Transient failures retry up to `maxAttempts` per page. */
  def fetchChains(
      spark: SparkSession,
      chains: Seq[String],
      transportFactory: () => PageTransport,
      maxAttempts: Int = 3,
      unitsPerCall: Long = 100L,
      quotaPerChain: Long = Long.MaxValue): DataFrame = {
    import spark.implicits._
    val width = math.min(chains.size.max(1), spark.sparkContext.defaultParallelism)
    spark.createDataset(chains).repartition(width)
      .mapPartitions { it =>
        val transport = transportFactory()
        it.flatMap { chain =>
          val out = Iterator.unfold((Option.empty[String], 0, 0L, true)) {
            case (_, _, _, false) => None
            case (token, pageNo, spent, true) =>
              if (spent + unitsPerCall > quotaPerChain) None // budget stop
              else {
                var attempts = 0
                var result: FetchResult = Left("unattempted")
                var cost = 0L
                while (attempts < maxAttempts && result.isLeft) {
                  attempts += 1
                  cost += unitsPerCall
                  // each RETRY also bills — quota is per call, not per page
                  result = transport.fetch(chain, token)
                }
                result match {
                  case Left(err) => throw new RetriesExhausted(
                    s"chain $chain page $pageNo failed $attempts attempts: $err")
                  case Right(page) =>
                    val rows = page.ids.map(id => (chain, id, pageNo, attempts))
                    Some((rows, (page.nextToken, pageNo + 1, spent + cost,
                      page.nextToken.isDefined)))
                }
              }
          }
          out.flatten
        }
      }
      .toDF("chain", "id", "page_no", "page_attempts")
  }

  // ------------------------------------------------------------------
  // `q_source_paged`: the gated end-to-end drive of the source
  // ------------------------------------------------------------------

  val SourcePageSize = 4
  val SourceNumChains = 10
  val SourceUnitsPerCall = 100L

  /** `q_source_paged`: drive the paged client through a canned corpus —
    * suppliers dealt to [[SourceNumChains]] chains by `s_suppkey % 10` —
    * and report per chain: rows fetched, pages walked, transport calls
    * made (retries included), quota spent, and an id checksum. Every
    * column is closed-form from the supplier table (the oracle prices
    * the deterministic failure schedule as ⌊(n_pages+1)/3⌋ extra calls),
    * so a paging bug — skipped page, duplicated row, unbilled retry —
    * breaks the gate.
    *
    * The canned corpus collects to a broadcast ONLY to build the fake
    * remote server (the fixture IS the server's dataset); the client
    * path stays executor-side and driver-loop-free. */
  def sourcePagedQ(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus: Map[String, Array[Long]] =
      Tables.supplier(spark, sfDir)
        .select(col("s_suppkey").cast("long").as("id"))
        .collect().map(_.getLong(0))
        .groupBy(id => s"c${id % SourceNumChains}")
        .map { case (c, ids) => c -> ids.sorted }
    val served = spark.sparkContext.broadcast(corpus)
    val chains = (0 until SourceNumChains).map(i => s"c$i")
    val fetched = fetchChains(spark, chains,
      () => new StubTransport(served.value, SourcePageSize),
      unitsPerCall = SourceUnitsPerCall)
    fetched
      .groupBy(col("chain"), col("page_no"))
      .agg(Num.countStar.as("rows_in_page"),
        max(col("page_attempts")).as("attempts"),
        sum(col("id")).as("id_sum"))
      .groupBy(col("chain"))
      .agg(sum(col("rows_in_page")).as("n_rows"),
        Num.countStar.as("n_pages"),
        sum(col("attempts")).as("n_calls"),
        (sum(col("attempts")) * SourceUnitsPerCall).as("quota_units"),
        sum(col("id_sum")).as("id_sum"))
      .orderBy(col("chain"))
  }

  // ------------------------------------------------------------------
  // `q_source_dsv2`: the SAME protocol through the real DataSourceV2
  // ------------------------------------------------------------------

  val Dsv2Chains = 10
  val Dsv2RowsPerChain = 987L // odd on purpose: the last page is partial
  val Dsv2PageSize = 50

  /** `q_source_dsv2`: drive [[PagedTableProvider]] — one InputPartition
    * per chain, lazy executor-side page walking, the deterministic retry
    * schedule — through `spark.read.format(...)`, and aggregate the same
    * per-chain report as `q_source_paged`. The corpus is closed-form
    * (chain c serves c + k·chains), so the oracle is PURE ARITHMETIC
    * over the option values: n_pages = ⌈R/P⌉, n_calls = n_pages +
    * ⌊(n_pages+1)/3⌋, id_sum = R·c + C·R(R−1)/2. A planner or reader
    * defect — dropped partition, re-read page, unbilled retry, off-by-one
    * on the partial last page — breaks the gate. */
  def sourceDsv2Q(spark: SparkSession, sfDir: String): DataFrame = {
    val df = spark.read.format("graft.sources.PagedTableProvider")
      .option("chains", Dsv2Chains.toString)
      .option("rowsPerChain", Dsv2RowsPerChain.toString)
      .option("pageSize", Dsv2PageSize.toString)
      .load()
    df.groupBy(col("chain"), col("page_no"))
      .agg(Num.countStar.as("rows_in_page"),
        max(col("page_attempts")).as("attempts"),
        sum(col("id")).as("id_sum"))
      .groupBy(col("chain"))
      .agg(sum(col("rows_in_page")).as("n_rows"),
        Num.countStar.as("n_pages"),
        sum(col("attempts")).as("n_calls"),
        (sum(col("attempts")) * SourceUnitsPerCall).as("quota_units"),
        sum(col("id_sum")).as("id_sum"))
      .orderBy(col("chain"))
  }

  /** Table-free arithmetic oracle (the options ARE the data). */
  val sourceDsv2Oracle: String = {
    val r = Dsv2RowsPerChain
    val np = (r + Dsv2PageSize - 1) / Dsv2PageSize
    val calls = np + (np + 1) / 3
    s"""SELECT 'c' || CAST(c AS VARCHAR) AS chain,
       |  CAST($r AS BIGINT) AS n_rows,
       |  CAST($np AS BIGINT) AS n_pages,
       |  CAST($calls AS BIGINT) AS n_calls,
       |  CAST(${calls * SourceUnitsPerCall} AS BIGINT) AS quota_units,
       |  CAST($r * c + ${Dsv2Chains.toLong * r * (r - 1) / 2} AS BIGINT)
       |    AS id_sum
       |FROM range(0, ${Dsv2Chains}) AS t(c) ORDER BY chain""".stripMargin
  }

  /** Closed-form oracle: chain membership, page count, and the failure
    * schedule all derive from supplier alone. */
  val sourcePagedOracle: String =
    s"""WITH m AS (
       |  SELECT CAST(s_suppkey AS BIGINT) AS id,
       |         s_suppkey % ${SourceNumChains} AS c
       |  FROM supplier),
       |per_chain AS (
       |  SELECT c, COUNT(*) AS n_rows, SUM(id) AS id_sum FROM m GROUP BY c),
       |paged AS (
       |  SELECT c, n_rows, id_sum,
       |    (n_rows + ${SourcePageSize} - 1) // ${SourcePageSize} AS n_pages
       |  FROM per_chain)
       |SELECT 'c' || CAST(c AS VARCHAR) AS chain,
       |  CAST(n_rows AS BIGINT) AS n_rows,
       |  CAST(n_pages AS BIGINT) AS n_pages,
       |  CAST(n_pages + (n_pages + 1) // 3 AS BIGINT) AS n_calls,
       |  CAST((n_pages + (n_pages + 1) // 3) * ${SourceUnitsPerCall}
       |    AS BIGINT) AS quota_units,
       |  CAST(id_sum AS BIGINT) AS id_sum
       |FROM paged ORDER BY chain""".stripMargin

  // ------------------------------------------------------------------
  // `q_source_stream`: the connector's MICRO_BATCH_READ facet
  // ------------------------------------------------------------------

  val StreamChains = 6
  val StreamRowsPerChain = 523L // odd: partial last page crosses batches
  val StreamPageSize = 40      // → 14 pages per chain
  val StreamMaxPagesPerTrigger = 4 // → 4 micro-batches under AvailableNow

  /** `q_source_stream`: the reference's ACTUAL operating mode — a timer
    * re-polls the paged collections and resumes from the page token it
    * left off at (/root/reference/azure-functions/function_app.py:540-541)
    * — as the connector's `MICRO_BATCH_READ` facet. `readStream` on the
    * same provider, offset = the page-token watermark,
    * `maxPagesPerTrigger` bounding each poll's quota spend, AvailableNow
    * draining the 14-page horizon across 4 micro-batches into a memory
    * sink. The gate: the drain's per-chain report (rows, pages, transport
    * calls incl. retries, quota, id checksum) must equal the BATCH read's
    * — the same pure-arithmetic oracle shape as `q_source_dsv2`, so a
    * dropped batch, a re-read page boundary, or a retry schedule that
    * diverges across batch restarts all break the hash. */
  def sourceStreamQ(spark: SparkSession, sfDir: String): DataFrame = {
    val sinkName = "graft_source_stream_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = spark.readStream.format("graft-paged")
      .option("chains", StreamChains.toString)
      .option("rowsPerChain", StreamRowsPerChain.toString)
      .option("pageSize", StreamPageSize.toString)
      .option("maxPagesPerTrigger", StreamMaxPagesPerTrigger.toString)
      .load()
    val query = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    val rollup = spark.table(sinkName)
      .groupBy(col("chain"), col("page_no"))
      .agg(Num.countStar.as("rows_in_page"),
        max(col("page_attempts")).as("attempts"),
        sum(col("id")).as("id_sum"))
      .groupBy(col("chain"))
      .agg(sum(col("rows_in_page")).as("n_rows"),
        Num.countStar.as("n_pages"),
        sum(col("attempts")).as("n_calls"),
        (sum(col("attempts")) * SourceUnitsPerCall).as("quota_units"),
        sum(col("id_sum")).as("id_sum"))
      .orderBy(col("chain"))
    detachFromSink(spark, sinkName, rollup)
  }

  /** Materialize a memory-sink rollup into a LocalRelation and DROP the
    * sink's temp view — each drain registers a UUID-named sink, and
    * without the drop repeated bench/soak reps accumulate every drained
    * row in driver memory for the JVM lifetime (ADVICE r9). The rollup is
    * chain-cardinality (single digits), so the collect is a few rows; the
    * returned frame re-asserts the total order since a LocalRelation
    * carries rows, not the plan that ordered them. */
  private def detachFromSink(spark: SparkSession, sinkName: String,
      rollup: DataFrame, orderCol: String = "chain"): DataFrame = {
    val rows = rollup.collect().toIndexedSeq
    val schema = rollup.schema
    spark.catalog.dropTempView(sinkName)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema).orderBy(col(orderCol))
  }

  // ------------------------------------------------------------------
  // `q_source_stream_enrich`: stream-static join THROUGH the connector
  // ------------------------------------------------------------------

  val EnrichChains = 5
  val EnrichRowsPerChain = 200L // ids partition 0..999 exactly once

  /** `q_source_stream_enrich`: the reference's fetch-then-enrich loop
    * (page the API, join each batch against a warehouse dimension —
    * `function_app.py`'s per-batch region/keyword annotation) as a
    * STREAM-STATIC JOIN through the connector's micro-batch facet: the
    * paged stream broadcast-joins the `nation` dim INSIDE the streaming
    * query (per micro-batch, the X118 enrich discipline), the enriched
    * rows drain AvailableNow to a memory sink, and the gate aggregates
    * the drain per nation. The connector's closed-form ids partition
    * 0..chains·R−1 exactly once, so the oracle is a range() join against
    * the REAL nation table — half arithmetic, half warehouse data: a
    * page lost in any micro-batch, a join dropped on a batch boundary,
    * or a double-enriched retry all break the hash. */
  def sourceStreamEnrichQ(spark: SparkSession, sfDir: String): DataFrame = {
    val sinkName = "graft_source_stream_enrich_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val dim = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
    val stream = spark.readStream.format("graft-paged")
      .option("chains", EnrichChains.toString)
      .option("rowsPerChain", EnrichRowsPerChain.toString)
      .option("pageSize", "30")
      .option("maxPagesPerTrigger", "2")
      .load()
      .select(col("id"))
      .join(broadcast(dim), col("id") % 25 === col("nk"))
    val query = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    val rollup = spark.table(sinkName)
      .groupBy(col("n_name").as("nation"))
      .agg(Num.countStar.as("n_rows"), sum(col("id")).as("id_sum"))
      .orderBy(col("nation"))
    detachFromSink(spark, sinkName, rollup, orderCol = "nation")
  }

  // ------------------------------------------------------------------
  // `q_source_stream_resume`: the quota LEDGER survives a mid-drain crash
  // ------------------------------------------------------------------

  /** Page watermark at which run 1's driver "dies" — mid-horizon (14
    * pages at the stream constants), after two committed micro-batches. */
  val StreamCrashAtPage = 8

  /** `q_source_stream_resume` (X206): the connector's account-scoped
    * QUOTA LEDGER across process restarts — the reference's daily quota
    * belongs to the API account, not to whichever function invocation is
    * currently polling (/root/reference/azure-functions/
    * function_app.py:88-116), so the cumulative spend rides in the
    * CHECKPOINT next to the page watermark (`PageOffset{page, quota}`).
    * The gate runs the drain twice against one checkpoint: run 1 is
    * killed deterministically at page 8 of 14 (a crash seam in the
    * admission-control path — two micro-batches committed, ledger
    * persisted), run 2 resumes and finishes the horizon into an
    * exactly-once file sink. The readout is the per-chain transport
    * report (rows, pages, calls incl. retries, quota) PLUS the final
    * checkpointed ledger: rows/attempts prove the restart re-read
    * nothing and dropped nothing; `ledger_units` equals the single-run
    * arithmetic total ONLY if the resumed run continued the dead run's
    * ledger instead of starting a fresh one. */
  def sourceStreamResumeQ(spark: SparkSession, sfDir: String): DataFrame = {
    val work = graft.engine.TempWarehouse.createManaged("graft_stream_resume_")
    val ckpt = s"$work/ckpt"
    val out = s"$work/out"
    def drain(crashAt: Option[Int]): Unit = {
      val reader = spark.readStream.format("graft-paged")
        .option("chains", StreamChains.toString)
        .option("rowsPerChain", StreamRowsPerChain.toString)
        .option("pageSize", StreamPageSize.toString)
        .option("maxPagesPerTrigger", StreamMaxPagesPerTrigger.toString)
      val withCrash = crashAt.fold(reader)(p =>
        reader.option("simulateCrashAtPage", p.toString))
      val q = withCrash.load().writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      catch {
        // run 1's simulated process death — checkpoint keeps the
        // committed prefix and the ledger
        case _: org.apache.spark.sql.streaming.StreamingQueryException
          if crashAt.nonEmpty => ()
      }
    }
    drain(crashAt = Some(StreamCrashAtPage))
    drain(crashAt = None)
    val ledger = checkpointLedger(ckpt)
    spark.read.parquet(out)
      .groupBy(col("chain"), col("page_no"))
      .agg(Num.countStar.as("rows_in_page"),
        max(col("page_attempts")).as("attempts"),
        sum(col("id")).as("id_sum"))
      .groupBy(col("chain"))
      .agg(sum(col("rows_in_page")).as("n_rows"),
        Num.countStar.as("n_pages"),
        sum(col("attempts")).as("n_calls"),
        (sum(col("attempts")) * SourceUnitsPerCall).as("quota_units"),
        sum(col("id_sum")).as("id_sum"))
      .withColumn("ledger_units", lit(ledger))
      .orderBy(col("chain"))
  }

  /** Final cumulative quota from the checkpoint: the `quota` field of the
    * highest-numbered offsets entry — what the next restart would resume
    * from. Driver-side metadata read, same trust base as the engine's own
    * offset recovery. */
  private[graft] def checkpointLedger(ckpt: String): Long = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(ckpt, "offsets")
    val s = java.nio.file.Files.list(dir)
    val latest = try {
      s.iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.forall(_.isDigit))
        .maxBy(_.getFileName.toString.toLong)
    } finally s.close()
    val QuotaRe = """"quota":(\d+)""".r
    QuotaRe.findAllMatchIn(java.nio.file.Files.readString(latest))
      .map(_.group(1).toLong).toSeq.lastOption
      .getOrElse(throw new IllegalStateException(
        s"no quota ledger in $latest"))
  }

  /** Oracle: identical per-chain pricing to `q_source_stream` (the resume
    * must change NOTHING about what is read or billed) plus the ledger
    * total — all chains' calls at the stream constants. */
  val sourceStreamResumeOracle: String = {
    val r = StreamRowsPerChain
    val np = (r + StreamPageSize - 1) / StreamPageSize
    val calls = np + (np + 1) / 3
    s"""SELECT 'c' || CAST(c AS VARCHAR) AS chain,
       |  CAST($r AS BIGINT) AS n_rows,
       |  CAST($np AS BIGINT) AS n_pages,
       |  CAST($calls AS BIGINT) AS n_calls,
       |  CAST(${calls * SourceUnitsPerCall} AS BIGINT) AS quota_units,
       |  CAST($r * c + ${StreamChains.toLong * r * (r - 1) / 2} AS BIGINT)
       |    AS id_sum,
       |  CAST(${StreamChains * calls * SourceUnitsPerCall} AS BIGINT)
       |    AS ledger_units
       |FROM range(0, ${StreamChains}) AS t(c) ORDER BY chain""".stripMargin
  }

  /** Oracle: the connector's ids are exactly 0..chains·R−1, so the
    * enriched rollup prices as a range() join against nation. */
  val sourceStreamEnrichOracle: String =
    s"""SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(SUM(t.i) AS BIGINT) AS id_sum
       |FROM range(0, ${EnrichChains * EnrichRowsPerChain}) AS t(i)
       |JOIN nation n ON t.i % 25 = n.n_nationkey
       |GROUP BY 1 ORDER BY nation""".stripMargin

  /** Table-free arithmetic oracle: identical pricing to the batch DSv2
    * gate at the stream's constants — the stream facet must change
    * NOTHING about what is read, only when. */
  val sourceStreamOracle: String = {
    val r = StreamRowsPerChain
    val np = (r + StreamPageSize - 1) / StreamPageSize
    val calls = np + (np + 1) / 3
    s"""SELECT 'c' || CAST(c AS VARCHAR) AS chain,
       |  CAST($r AS BIGINT) AS n_rows,
       |  CAST($np AS BIGINT) AS n_pages,
       |  CAST($calls AS BIGINT) AS n_calls,
       |  CAST(${calls * SourceUnitsPerCall} AS BIGINT) AS quota_units,
       |  CAST($r * c + ${StreamChains.toLong * r * (r - 1) / 2} AS BIGINT)
       |    AS id_sum
       |FROM range(0, ${StreamChains}) AS t(c) ORDER BY chain""".stripMargin
  }
}
