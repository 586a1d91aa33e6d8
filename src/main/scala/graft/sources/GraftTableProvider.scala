package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.engine.TableCommit

/** A DataSourceV2 WRITE path backed by the [[TableCommit]] log —
  * `df.write.format("graft-table").option("root", r).mode("append")` —
  * the third facet of the connector family (X182/X183 batch read, X184
  * micro-batch stream), and the one that demonstrates Spark's
  * distributed TWO-PHASE COMMIT contract end to end:
  *
  *   - each task's [[DataWriter]] streams its partition into an
  *     ATTEMPT-UNIQUE parquet file inside an invisible staged batch
  *     directory (task retries and speculative attempts collide with
  *     nobody; a losing attempt's `abort()` deletes only its own file);
  *   - task `commit()` returns the file path + row count as the
  *     [[WriterCommitMessage]] — the executor→driver handshake;
  *   - the driver's [[BatchWrite.commit]] turns the surviving messages
  *     into manifest entries and PUBLISHES them in one atomic pointer
  *     swap via [[TableCommit.publish]] (optimistic concurrency: a
  *     commit that landed since the job started aborts this one rather
  *     than burying it);
  *   - job-level `abort()` deletes the staged files — readers never saw
  *     them (the same invisibility [[TableCommit.stageForAudit]] rides).
  *
  * `mode("overwrite")` arrives as [[SupportsTruncate]] and swaps the
  * whole manifest to exactly this batch. Reading back goes through
  * `TableCommit.read` (schema-explicit, manifest-pinned); the provider
  * is deliberately write-only — `spark.read.format("graft-table")` has
  * no capability, and `inferSchema` says so loudly.
  *
  * Executor-side parquet writing uses parquet-hadoop's public Group API
  * (the X188 avro-leg precedent: container writers ARE available to
  * library code without Spark's private writer machinery), covering the
  * primitive column types (long/int/double/string) the commit-layer
  * gates use; richer logical types would extend `messageType`. Row
  * counts ride the commit message into `Entry.rows`, so metadata-only
  * COUNT(*) (X218) works on DSv2-written tables too. */
class GraftTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-table"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft-table needs an explicit schema: pass .schema(...) on the " +
        "reader/writer (the schema contract is the caller's, exactly " +
        "as in TableCommit.read)")
  /** The written DataFrame's own schema IS the table schema. */
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftWriteTable(schema, properties)
}

private[graft] class GraftWriteTable(schema0: StructType,
    properties: util.Map[String, String])
    extends Table with SupportsWrite with SupportsRead {
  private val root = Option(properties.get("root")).getOrElse(
    throw new IllegalArgumentException("graft-table requires option 'root'"))
  override def name(): String = s"graft-table($root)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE, TableCapability.BATCH_READ)

  /** X289: the BATCH READ facet — `spark.read.format("graft-table")`
    * serves the CURRENT snapshot's live rows (DV anti-apply in the
    * reader task), so graft tables are SQL-able through Spark's own
    * planner: register a temp view, join, aggregate. Column pruning
    * arrives via [[SupportsPushDownRequiredColumns]]; comparison
    * filters additionally prune WHOLE FILES at planning time against
    * the manifest's min/max stats (the X207 channel — lossless: Spark
    * still evaluates every filter row-level; a file without stats for
    * the column is kept). Reads serve PHYSICAL column names — mapped
    * tables (X276) go through `TableCommit.readMapped`. */
  /** X293: a TIME-TRAVEL pin — when set, scans serve this version's
    * snapshot (`entriesAtVersion`) instead of the head; the SQL
    * catalog's `VERSION AS OF` / `TIMESTAMP AS OF` loads set it. */
  protected def asOfVersion: Option[Long] = None

  /** X298: logical → physical renames (identity omitted). Scans read
    * files and manifest stats under PHYSICAL names (emitting logical),
    * writes land physical — so catalog tables stay byte-consistent
    * across `ALTER TABLE RENAME COLUMN`. */
  protected def toPhysical: Map[String, String] = Map.empty

  /** X316/X328: the table's declared partition columns (logical
    * names), if any — catalog tables created `PARTITIONED BY (...)`
    * set them. Scans then default to the clustered shape
    * (KeyGroupedPartitioning when the manifest proves the layout), and
    * batch writes rotate files on the key so every written file IS
    * single-keyed. Multi-column lists are identity-only (X328). */
  protected def partitionColumns: Seq[String] = Nil

  /** X320/X327: how the layout keys beside [[partitionColumn]] —
    * identity on the value, `bucket(n, col)` (the canonical
    * [[GraftBucketFn]] hash, bounded file count at any cardinality),
    * or a time transform over a TIMESTAMP column. */
  protected def partitionRotate: GraftRotate = GraftRotate.Identity

  private def declaredCluster: Option[GraftClusterSpec] =
    partitionColumns.headOption.map(c => partitionRotate match {
      case GraftRotate.Bucket(n)  => BucketCluster(c, n)
      case GraftRotate.Time(unit) => TimeCluster(c, unit)
      case GraftRotate.Tuple(_)   => TupleCluster(partitionColumns)
      case GraftRotate.Identity   => IdentityCluster(c)
    })

  private def physSchema(s: StructType): StructType =
    if (toPhysical.isEmpty) s
    else StructType(s.fields.toIndexedSeq.map(f =>
      f.copy(name = toPhysical.getOrElse(f.name, f.name))))

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root, schema0,
      // X296b: the engine's own snapshot reads pin their version and
      // select the DV'd-files-only leg through reader options
      asOfVersion.orElse(
        Option(options.get("asofversion")).map(_.toLong)),
      toPhysical,
      Option(options.get("dvonly")).exists(_ == "true"),
      // X314: declare a column every file is single-valued on (the
      // manifest verifies) → the scan reports KeyGroupedPartitioning;
      // X316/X320: a declared partition column is the standing default
      Option(options.get("clusterby"))
        .map(IdentityCluster(_): GraftClusterSpec)
        .orElse(declaredCluster))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate
        with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
      private var replaceAll = false
      private var dynamicParts = false
      override def truncate(): WriteBuilder = { replaceAll = true; this }
      // X331: INSERT OVERWRITE under partitionOverwriteMode=dynamic —
      // written files replace exactly the layout keys they carry
      override def overwriteDynamicPartitions(): WriteBuilder = {
        dynamicParts = true; this
      }
      override def build(): Write = {
        val retain = Option(properties.get("retain")).map(_.toInt).getOrElse(1)
        val failAt = Option(properties.get("failatpartition")).map(_.toInt)
        val retries = Option(properties.get("conflictretries"))
          .map(_.toInt).getOrElse(0)
        val crashAfter = Option(properties.get("crashafterepoch"))
          .map(_.toLong)
        val txnId = Option(properties.get("txnid")).map(_.toLong)
        val txnApp = Option(properties.get("txnappid"))
        val txnMigrate = Option(properties.get("txnmigrate"))
        txnMigrate.foreach(m => require(m == "scalar" || m == "fresh",
          s"option 'txnmigrate' must be 'scalar' or 'fresh', got '$m'"))
        // the writer's field names are the PHYSICAL ones (rows are
        // consumed positionally, so only the parquet schema changes)
        // X316/X320: the partition column rides as (logical name — the
        // distribution/ordering contract resolves against the query's
        // output — its positional index, and the bucket count)
        val idxs = partitionColumns
          .map(c => info.schema().fieldNames.indexOf(c))
        val pIdx =
          if (partitionColumns.nonEmpty && idxs.forall(_ >= 0))
            Some((partitionColumns, idxs, partitionRotate))
          else None
        new GraftWrite(root, physSchema(info.schema()), replaceAll,
          retain, failAt, retries, crashAfter, txnId, txnApp, txnMigrate,
          pIdx, dynamicParts)
      }
    }
}

private class GraftWrite(root: String, schema: StructType,
    replaceAll: Boolean, retain: Int, failAt: Option[Int],
    conflictRetries: Int, crashAfterEpoch: Option[Long] = None,
    txnId: Option[Long] = None, txnApp: Option[String] = None,
    txnMigrate: Option[String] = None,
    partCol: Option[(Seq[String], Seq[Int], GraftRotate)] = None,
    dynamicParts: Boolean = false)
    extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}

  /** X316/X320: a partitioned write asks Spark to CLUSTER the input by
    * the partition expression (the column, or its bucket transform —
    * resolved against the catalog's canonical function) and SORT
    * within tasks on it, so the writer's file rotation sees each key
    * as one contiguous run — one file per (task, key), minimal file
    * count, single-keyed by construction. Unpartitioned writes leave
    * the plan untouched. */
  private def partExprs: Seq[
      org.apache.spark.sql.connector.expressions.Expression] =
    partCol.toSeq.flatMap {
      case (cs, _, GraftRotate.Bucket(n)) =>
        Seq(Expressions.bucket(n, cs.head))
      case (cs, _, GraftRotate.Time("days")) =>
        Seq(Expressions.days(cs.head))
      case (cs, _, GraftRotate.Time("months")) =>
        Seq(Expressions.months(cs.head))
      case (cs, _, GraftRotate.Time(_)) =>
        Seq(Expressions.hours(cs.head))
      // identity and X328 tuple layouts cluster on every column
      case (cs, _, _) => cs.map(Expressions.identity)
    }
  override def requiredDistribution(): Distribution =
    if (partExprs.isEmpty) Distributions.unspecified()
    else Distributions.clustered(partExprs.toArray)
  override def requiredOrdering(): Array[SortOrder] =
    partExprs.map(e =>
      Expressions.sort(e, SortDirection.ASCENDING)).toArray
  override def requiredNumPartitions(): Int = 0

  override def toBatch: BatchWrite = new GraftBatchWrite(
    root, schema, replaceAll, retain, failAt, conflictRetries, txnId,
    txnApp, partCol.map { case (_, is, r) => (is, r) }, dynamicParts)
  override def toStreaming: StreamingWrite = {
    require(!replaceAll,
      "graft-table streaming supports outputMode(\"append\") only — " +
        "a per-epoch truncate would erase prior epochs' exactly-once " +
        "history; rebuild-per-batch shapes belong in foreachBatch")
    new GraftStreamingWrite(root, schema, retain, failAt,
      conflictRetries, crashAfterEpoch, txnApp, txnMigrate,
      partCol.map { case (_, is, r) => (is, r) })
  }
}

private final case class GraftCommitMessage(relPath: String, rows: Long,
    stats: Map[String, (String, String)] = Map.empty,
    part: Option[String] = None)
    extends WriterCommitMessage

/** X316: one partitioned task's handshake — one payload per file the
  * value rotation produced (each single-valued on the partition
  * column by construction). */
private final case class GraftMultiCommitMessage(
    files: Seq[GraftCommitMessage]) extends WriterCommitMessage

private class GraftBatchWrite(root: String, schema: StructType,
    replaceAll: Boolean, retain: Int, failAt: Option[Int],
    conflictRetries: Int, txnId: Option[Long] = None,
    txnApp: Option[String] = None,
    partIdx: Option[(Seq[Int], GraftRotate)] = None,
    dynamicParts: Boolean = false)
    extends BatchWrite {
  require(txnApp.isEmpty || txnId.isDefined,
    "graft-table batch: option(\"txnappid\") namespaces the idempotence " +
      "watermark but carries no version of its own — pass " +
      "option(\"txnid\", n) with it")
  // transaction start: the snapshot this write expects to extend —
  // read ONCE on the driver, enforced again inside publish()
  private val base = TableCommit.currentVersion(root).getOrElse(0L)
  private val batch = "data/b_dsv2_" +
    java.util.UUID.randomUUID().toString.replace("-", "")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    GraftWriterFactory(root, batch, schema, failAt, partIdx)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // X288 idempotent BATCH write (`option("txnid", n)` — the Delta
    // txnAppId/txnVersion idea for orchestrator retries): a replayed
    // job whose id the table already carries lands ZERO rows and
    // sweeps its own re-written staging as debris.
    // ADVICE r13: `option("txnappid", app)` NAMESPACES the watermark
    // (the X291 `{"txna"}` map the streaming facet already uses) — on
    // a shared table the bare scalar slot is one global sequence, so a
    // legacy stream or a different pipeline that advanced it past this
    // job's id would silently swallow a genuinely fresh batch as a
    // replay. With an app id, only THIS app's own high-water gates.
    def applied = txnId.exists(t => (txnApp match {
      case Some(a) => TableCommit.lastTxnIdFor(root, a)
      case None    => TableCommit.lastTxnId(root)
    }).exists(_ >= t))
    if (applied) { abort(messages); return }
    def toEntry(m: GraftCommitMessage): TableCommit.Entry =
      TableCommit.Entry(m.relPath, m.part,
        stats = m.stats.map { case (c, (mn, mx)) =>
          c -> TableCommit.ColStats(mn, mx) },
        rows = Some(m.rows))
    val entries = messages.flatMap {
      case m: GraftCommitMessage => Seq(toEntry(m))
      // X316: a partitioned task commits one message per rotated file
      case GraftMultiCommitMessage(fs) => fs.map(toEntry)
      case _ => Seq.empty
    }.toSeq.sortBy(_.path)
    // X273 extended to the connector: an APPEND-mode DSv2 write is a
    // blind append — on a commit race (option("conflictretries", n))
    // the already-written task files republish against the new head,
    // manifest-sized work. mode("overwrite") stays strict: "the table
    // becomes exactly this batch" read the old state by definition, a
    // racing commit is a real conflict.
    var expected = base
    var attempt = 0
    var done = false
    while (!done) {
      try {
        // X303: appends publish DELTA manifests (checkpoint-folded),
        // so a SQL INSERT costs O(batch) manifest bytes, not O(table);
        // overwrite still swaps the whole list by definition
        if (dynamicParts)
          // X331: replace exactly the written layout keys; a commit
          // race recomputes the keep-set against the new head (the
          // overwrite's semantics are per-partition, so a racing
          // commit to an UNTOUCHED partition composes cleanly)
          TableCommit.publishDynamicOverwrite(root, expected, entries,
            retain)
        else if (replaceAll)
          TableCommit.publish(root, entries, retain,
            expected = Some(expected),
            txnId = if (txnApp.isEmpty) txnId else None,
            txnApp = for { a <- txnApp; t <- txnId } yield a -> t)
        else
          TableCommit.publishAppendAt(root, expected, entries, retain,
            txnId = if (txnApp.isEmpty) txnId else None,
            txnApp = for { a <- txnApp; t <- txnId } yield a -> t)
        done = true
      } catch {
        case e: TableCommit.ConcurrentCommitException =>
          attempt += 1
          if (replaceAll || attempt > conflictRetries) throw e
          expected = TableCommit.currentVersion(root).getOrElse(0L)
          // the race may have BEEN this txn (a duplicate orchestrator
          // retry): re-check before republishing
          if (applied) { abort(messages); done = true }
          else Thread.sleep(java.util.concurrent.ThreadLocalRandom
            .current().nextLong(2L, 20L) * attempt)
      }
    }
  }

  /** Job-level abort sweeps the ENTIRE attempt-unique batch directory
    * rather than trusting `messages`: Spark's contract delivers an
    * incomplete (raced) message array when the job dies mid-flight, so a
    * task that had already committed its file — whose task-side
    * `abort()` therefore never runs — would otherwise leave staged
    * debris. The directory name is job-unique (`data/b_dsv2_<uuid>`), so
    * a recursive delete can touch nobody else's files; readers never saw
    * the directory (nothing in it was published). */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(root, batch)
    try {
      if (java.nio.file.Files.isDirectory(dir)) {
        val files = java.nio.file.Files.list(dir)
        try files.forEach { f =>
          try java.nio.file.Files.deleteIfExists(f)
          catch { case _: Throwable => () }
        } finally files.close()
        java.nio.file.Files.deleteIfExists(dir)
      }
    } catch { case _: Throwable => () }
  }
}

/** X285: the NATIVE exactly-once streaming sink —
  * `df.writeStream.format("graft-table").option("root", r)` — the
  * X271 `foreachBatch` + `commitAppendTxn` pattern folded into the
  * connector itself, through Spark's V2 streaming two-phase commit:
  *
  *   - one StreamingWrite serves the whole query run; each micro-batch
  *     epoch's task files land under an EPOCH-UNIQUE subdirectory of a
  *     run-unique staged batch dir (task retries collide with nobody,
  *     an epoch sweeps without touching its neighbors);
  *   - driver-side `commit(epochId, …)` publishes the epoch's files
  *     with the epoch id as the `{"txn"}` header — data and progress
  *     are ONE atomic manifest link(2), the crash-in-the-unacked-window
  *     replay (Spark re-runs an epoch whose sink committed but whose
  *     commit log didn't) re-arrives with the same id, reads
  *     `lastTxnId ≥ id`, lands ZERO rows, and sweeps its own replayed
  *     files as debris;
  *   - a commit RACE (another writer on the table) rebases like the
  *     batch facet (`option("conflictretries", n)`) — the epoch's
  *     files republish against the new head, manifest-sized work; the
  *     applied check re-runs per attempt, so dual zombie writers of
  *     one checkpoint apply each epoch exactly once.
  *
  * `option("crashafterepoch", n)` is the DETERMINISTIC crash seam the
  * spec drives: publish epoch n, then die before acking — the restart
  * must replay n as a no-op. */
private class GraftStreamingWrite(root: String, schema: StructType,
    retain: Int, failAt: Option[Int], conflictRetries: Int,
    crashAfterEpoch: Option[Long], txnAppOpt: Option[String],
    txnMigrate: Option[String] = None,
    partIdx: Option[(Seq[Int], GraftRotate)] = None)
    extends StreamingWrite {
  private val batch = "data/b_stream_" +
    java.util.UUID.randomUUID().toString.replace("-", "")

  /** X291: the writer's exactly-once NAMESPACE — `option("txnappid")`
    * when given, else the query's STABLE id (the `sql.streaming.
    * queryId` local property Spark sets on the stream thread; it
    * lives in the checkpoint metadata, so a restart keeps it and a
    * checkpoint RESET mints a new one). Namespacing is what makes a
    * reset safe: new namespace → fresh watermark → epochs restarting
    * at 0 are applied, not mistaken for replays of another life. The
    * legacy scalar `{"txn"}` slot is the fallback only when neither
    * exists (a hand-driven StreamingWrite outside a real query). */
  private lazy val txnApp: Option[String] = txnAppOpt.orElse(
    Option(org.apache.spark.SparkContext.getOrCreate()
      .getLocalProperty("sql.streaming.queryId")))
  // epochs THIS instance published: abort(epoch) fires even when the
  // table-side commit already succeeded (anything thrown after it —
  // including the deliberate crash seam — makes Spark abort the
  // epoch), and sweeping a PUBLISHED epoch's files would be data loss.
  // Instance-local is sufficient: a different (restarted) instance has
  // a different batch uuid, so its sweeps can't reach these files.
  private val published =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

  private def epochDir(epochId: Long) = s"$batch/e$epochId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftStreamWriterFactory(root, batch, schema, failAt, partIdx)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    def applied = txnApp match {
      case Some(a) => TableCommit.lastTxnIdFor(root, a).exists(_ >= epochId)
      case None    => TableCommit.lastTxnId(root).exists(_ >= epochId)
    }
    // ORDER IS LOAD-BEARING (the publishStagedAppend discipline): read
    // the publish base BEFORE the applied check. Checked the other way
    // around, a twin writer can publish this epoch between our check
    // and our base read — our publish would then extend the POST-twin
    // head with no conflict and the epoch lands twice. This way the
    // CAS on `expected` forces any such race into the retry path,
    // which re-checks `applied` per attempt.
    var expected = TableCommit.currentVersion(root).getOrElse(0L)
    // ONE watermark walk serves both the applied check and the
    // migration guard on the happy path (the retry loop re-reads)
    val hws = txnApp.map(_ => TableCommit.txnHighWaters(root))
    val applied0 = txnApp match {
      case Some(a) => hws.get.get(a).exists(_ >= epochId)
      case None    => TableCommit.lastTxnId(root).exists(_ >= epochId)
    }
    if (applied0) { sweepEpoch(epochId); crashIfArmed(epochId); return }
    // Scalar→namespace MIGRATION ambiguity (review findings, two
    // rounds): a virgin namespace over a table whose legacy scalar
    // `{"txn"}` watermark covers this epoch is undecidable — this
    // stream's own pre-namespace life (replay) or another writer's id
    // space (fresh data). The guard fires ONLY while the table has
    // NEVER had any namespaced commit (`txna` empty): once any
    // namespace exists, the scalar watermark is known-legacy and a new
    // virgin namespace is a new stream/checkpoint reset — it applies.
    // `"scalar"` resolves the one genuine migration by SEEDING the
    // namespace at the scalar watermark (one metadata-only commit), so
    // a stale `txnmigrate` option left in the job config can never
    // silently swallow a later life's epochs.
    for (a <- txnApp; if hws.get.isEmpty;
         scalarHw <- TableCommit.lastTxnId(root);
         if scalarHw >= epochId) {
      txnMigrate match {
        case Some("scalar") =>
          var seeded = false
          while (!seeded) {
            try {
              TableCommit.publish(root,
                if (expected == 0L) Seq.empty
                else TableCommit.entriesAtVersion(root, expected),
                retain, expected = Some(expected),
                txnApp = Some(a -> scalarHw))
              seeded = true
            } catch {
              case _: TableCommit.ConcurrentCommitException =>
                expected = TableCommit.currentVersion(root).getOrElse(0L)
                if (applied) { // a twin seeded/applied first
                  sweepEpoch(epochId); crashIfArmed(epochId); return
                }
            }
          }
          expected = TableCommit.currentVersion(root).getOrElse(0L)
          // the namespace now carries the scalar watermark — this
          // epoch (≤ scalarHw by the guard) is a replay
          sweepEpoch(epochId); crashIfArmed(epochId); return
        case Some("fresh") => ()
        case _ => throw new IllegalStateException(
          s"graft-table sink at $root: namespace '$a' is virgin but " +
            s"the table's legacy scalar txn watermark already covers " +
            s"epoch $epochId — if this stream wrote the scalar ids " +
            "before the namespace upgrade, pass option(\"txnmigrate\"," +
            " \"scalar\") (treat them as this stream's replays); if " +
            "they belong to another writer, pass " +
            "option(\"txnmigrate\", \"fresh\")")
      }
    }
    def toEntry(m: GraftCommitMessage): TableCommit.Entry =
      TableCommit.Entry(m.relPath, m.part,
        stats = m.stats.map { case (c, (mn, mx)) =>
          c -> TableCommit.ColStats(mn, mx) },
        rows = Some(m.rows))
    val entries = messages.flatMap {
      case m: GraftCommitMessage => Seq(toEntry(m))
      // X323: a partitioned epoch commits one message per rotated file
      case GraftMultiCommitMessage(fs) => fs.map(toEntry)
      case _ => Seq.empty
    }.toSeq.sortBy(_.path)
    var attempt = 0
    var done = false
    while (!done) {
      try {
        // X303: each epoch publishes a DELTA manifest — O(epoch)
        // manifest bytes per micro-batch, not O(table)
        TableCommit.publishAppendAt(root, expected, entries, retain,
          txnId = if (txnApp.isEmpty) Some(epochId) else None,
          txnApp = txnApp.map(_ -> epochId))
        published.add(epochId)
        done = true
      } catch {
        case e: TableCommit.ConcurrentCommitException =>
          attempt += 1
          if (attempt > conflictRetries) throw e
          expected = TableCommit.currentVersion(root).getOrElse(0L)
          // the race may have BEEN this epoch (dual zombie writers of
          // one checkpoint): re-check before republishing
          if (applied) { sweepEpoch(epochId); done = true }
          else Thread.sleep(java.util.concurrent.ThreadLocalRandom
            .current().nextLong(2L, 20L) * attempt)
      }
    }
    crashIfArmed(epochId)
  }

  /** The table-side commit landed but Spark's commit log won't —
    * exactly the window the txn header exists for. */
  private def crashIfArmed(epochId: Long): Unit =
    crashAfterEpoch.filter(_ == epochId).foreach { e =>
      // "simulated crash at" is the bench listener's whitelist prefix
      // for deliberate kill-resume seams
      throw new RuntimeException(
        s"simulated crash at graft-table epoch $e (post-commit, " +
          "pre-ack window)")
    }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    if (!published.contains(epochId)) sweepEpoch(epochId)

  /** Sweep ONE epoch's staged subdirectory (replay debris / abort):
    * epoch-unique by construction, so neighbors and published files
    * are untouchable from here. */
  private def sweepEpoch(epochId: Long): Unit = {
    val dir = java.nio.file.Paths.get(root, epochDir(epochId))
    try {
      if (java.nio.file.Files.isDirectory(dir)) {
        val files = java.nio.file.Files.list(dir)
        try files.forEach { f =>
          try java.nio.file.Files.deleteIfExists(f)
          catch { case _: Throwable => () }
        } finally files.close()
        java.nio.file.Files.deleteIfExists(dir)
      }
    } catch { case _: Throwable => () }
  }
}

private final case class GraftStreamWriterFactory(root: String,
    batch: String, schema: StructType, failAt: Option[Int],
    partIdx: Option[(Seq[Int], GraftRotate)] = None)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    partIdx match {
      // X323: a streaming sink into a PARTITIONED/BUCKETED catalog
      // table rotates per key exactly like the batch write — an
      // unsorted epoch just costs extra files, never a multi-keyed
      // one, so replication into a layout table keeps its SPJ proof
      case Some((i, buckets)) =>
        new GraftPartitionedDataWriter(root, s"$batch/e$epochId",
          schema, partitionId, taskId, failAt, i, buckets)
      case None =>
        new GraftDataWriter(root, s"$batch/e$epochId", schema,
          partitionId, taskId, failAt)
    }
}

private final case class GraftWriterFactory(root: String, batch: String,
    schema: StructType, failAt: Option[Int],
    partIdx: Option[(Seq[Int], GraftRotate)] = None)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    partIdx match {
      case Some((is, rotate)) =>
        new GraftPartitionedDataWriter(root, batch, schema, partitionId,
          taskId, failAt, is, rotate)
      case None =>
        new GraftDataWriter(root, batch, schema, partitionId, taskId,
          failAt)
    }
}

/** One task attempt's writer: streams rows into an attempt-unique file
  * (partitionId × taskId — Spark's taskId is unique per ATTEMPT, so a
  * retry never truncates a file a zombie attempt still holds open, the
  * ADVICE-r9 avro lesson applied from the start). */
private class GraftDataWriter(root: String, batch: String,
    schema: StructType, partitionId: Int, taskId: Long,
    failAt: Option[Int], suffix: String = "")
    extends DataWriter[InternalRow] {

  private val relPath = s"$batch/part-$partitionId-$taskId$suffix.parquet"
  private val msgType = GraftDataWriter.messageType(schema)
  private var rows = 0L
  // X298: per-column min/max tracked AS WRITTEN (the footer-stats
  // analogue), riding the commit message into the manifest's X207
  // stats channel — so SQL-INSERTed tables get planning-time file
  // pruning and X290 aggregate pushdown exactly like Scala-API
  // appends with statsCols. Canonical string forms match the stats
  // comparator (decimal text for integers, Double.toString for
  // floats, raw text for strings). Colon-named columns are skipped
  // (the channel reserves ':' for engine keys).
  // ADVICE r15: min/max witness NON-NULL rows only — track whether any
  // null was written so commit() can mint the `nn:<col>` null-free
  // marker the all-rows consumers (X324 whole-file DML drop, X314
  // identity-cluster proof) require beside a min == max envelope
  private val statSawNull = new Array[Boolean](schema.fields.length)
  // r16 write-path rewrite (guide §1.2 step 2): the per-row loop is the
  // hottest code in every facet write (SQL INSERT/CTAS, DSv2 batch,
  // streaming epochs, rotation files), so the type dispatch is resolved
  // ONCE into an int tag and the per-row work is a branch on it — no
  // per-row pattern match, no closure, no boxing. Tags: -1 unsupported,
  // 0 long-kind (LongType/TimestampType), 1 int-kind (IntegerType/
  // DateType), 2 double, 3 string.
  private val typeTag: Array[Int] = schema.fields.map(_.dataType match {
    case LongType | TimestampType => 0
    case IntegerType | DateType   => 1
    case DoubleType               => 2
    case StringType               => 3
    case _                        => -1
  })
  private val statable = schema.fields.zipWithIndex.map { case (f, i) =>
    !f.name.contains(":") && typeTag(i) >= 0
  }
  // typed min/max slots (long-kind and int-kind share the long pair) so
  // stat tracking never allocates on the row path; strings hold cloned
  // UTF8Strings (row buffers are reused by the caller) compared in
  // UTF-8 byte order — UTF8String.compareTo IS binary order, matching
  // the prune side and parquet footer stats (ADVICE r14), never Java's
  // UTF-16 code-unit order
  private val statSet = new Array[Boolean](schema.fields.length)
  private val statMinL = new Array[Long](schema.fields.length)
  private val statMaxL = new Array[Long](schema.fields.length)
  private val statMinD = new Array[Double](schema.fields.length)
  private val statMaxD = new Array[Double](schema.fields.length)
  private val statMinS = new Array[UTF8String](schema.fields.length)
  private val statMaxS = new Array[UTF8String](schema.fields.length)

  private lazy val writer = {
    val p = new org.apache.hadoop.fs.Path(
      java.nio.file.Paths.get(root, relPath).toUri)
    new GraftDataWriter.RowWriterBuilder(p, msgType, typeTag,
      schema.fields.map(_.name))
      // one shared read-only Configuration: constructing a fresh one
      // loads the Hadoop XML defaults per FILE, which the rotation
      // writer (one file per layout key) paid hundreds of times per
      // INSERT
      .withConf(GraftDataWriter.sharedConf)
      .build()
  }

  override def write(row: InternalRow): Unit = {
    failAt.filter(_ == partitionId).foreach { p =>
      throw new RuntimeException(s"injected task failure at partition $p")
    }
    val n = typeTag.length
    var i = 0
    while (i < n) {
      if (row.isNullAt(i)) statSawNull(i) = true
      else if (statable(i)) typeTag(i) match {
        case 0 | 1 =>
          val v = if (typeTag(i) == 0) row.getLong(i) else row.getInt(i).toLong
          if (!statSet(i)) { statMinL(i) = v; statMaxL(i) = v; statSet(i) = true }
          else {
            if (v < statMinL(i)) statMinL(i) = v
            if (v > statMaxL(i)) statMaxL(i) = v
          }
        case 2 =>
          val v = row.getDouble(i)
          // NaN never enters the envelope (parquet's own rule): a NaN
          // min/max would order as "less than nothing" at prune time
          // and silently drop matching files
          if (!v.isNaN) {
            if (!statSet(i)) { statMinD(i) = v; statMaxD(i) = v; statSet(i) = true }
            else {
              if (v < statMinD(i)) statMinD(i) = v
              if (v > statMaxD(i)) statMaxD(i) = v
            }
          }
        case _ =>
          val v = row.getUTF8String(i)
          if (!statSet(i)) {
            val c = v.clone(); statMinS(i) = c; statMaxS(i) = c
            statSet(i) = true
          } else {
            if (v.compareTo(statMinS(i)) < 0) statMinS(i) = v.clone()
            if (v.compareTo(statMaxS(i)) > 0) statMaxS(i) = v.clone()
          }
      }
      i += 1
    }
    writer.write(row)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    // canonical stat text per ColStats' contract: ISO for DATE
    // (lexical = chronological), decimal text otherwise
    def canon(i: Int, maxSide: Boolean): String =
      schema.fields(i).dataType match {
        case DateType => java.time.LocalDate
          .ofEpochDay(if (maxSide) statMaxL(i) else statMinL(i)).toString
        case IntegerType =>
          (if (maxSide) statMaxL(i) else statMinL(i)).toString
        case LongType | TimestampType =>
          (if (maxSide) statMaxL(i) else statMinL(i)).toString
        case DoubleType =>
          (if (maxSide) statMaxD(i) else statMinD(i)).toString
        case _ =>
          (if (maxSide) statMaxS(i) else statMinS(i)).toString
      }
    val stats = schema.fields.indices.collect {
      case i if statSet(i) =>
        schema.fields(i).name -> (canon(i, maxSide = false),
          canon(i, maxSide = true))
    }.toMap
    val witnessed = schema.fields.indices.collect {
      case i if statSet(i) && !statSawNull(i) =>
        (graft.engine.TableCommit.NullFreePrefix +
          schema.fields(i).name) -> ("0", "0")
    }.toMap
    GraftCommitMessage(relPath, rows, stats ++ witnessed)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    try java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(root, relPath))
    catch { case _: Throwable => () }
  }

  override def close(): Unit = ()
}

/** X316: the partitioned task writer — ROTATES to a fresh file
  * whenever the partition column's value changes, so every written
  * file is single-valued on it by construction (the layout the X314
  * clustered scan proves back out of the manifest). The write plan's
  * required clustering + in-task ordering make each value one
  * contiguous run — one file per (task, value); an unsorted surprise
  * only costs extra files, never a multi-valued one. NULL partition
  * values refuse loudly (the stats channel cannot witness them). */
private class GraftPartitionedDataWriter(root: String, batch: String,
    schema: StructType, partitionId: Int, taskId: Long,
    failAt: Option[Int], partIdxs: Seq[Int],
    rotate: GraftRotate = GraftRotate.Identity)
    extends DataWriter[InternalRow] {
  private val partIdx = partIdxs.head
  private val dt = schema.fields(partIdx).dataType

  /** The identity value of column `i` — the tuple layout's per-column
    * rotation key component. */
  private def valueAt(row: InternalRow, i: Int): Any =
    schema.fields(i).dataType match {
      case LongType    => row.getLong(i)
      case IntegerType => row.getInt(i)
      case StringType  => row.getUTF8String(i).toString
      case DoubleType  => row.getDouble(i)
      case DateType    => row.getInt(i)
      case other => throw new IllegalArgumentException(
        s"graft-table: unsupported partition column type $other")
    }

  /** Canonical tag text for an identity value (ISO for DATE — the
    * stats channel's text). */
  private def tagText(i: Int, v: Any): String =
    schema.fields(i).dataType match {
      case DateType => java.time.LocalDate
        .ofEpochDay(v.asInstanceOf[Int].toLong).toString
      case _ => String.valueOf(v)
    }
  private var fileSeq = 0
  private var current: GraftDataWriter = null
  private var currentKey: Any = null
  private val done =
    scala.collection.mutable.ListBuffer.empty[GraftCommitMessage]

  /** The rotation key: the column's value (identity layout), or its
    * canonical bucket id (X320 — MUST equal what the catalog's
    * `bucket` ScalarFunction computes, which it does by sharing
    * [[GraftBucketFn]]). */
  private def keyOf(row: InternalRow): Any = rotate match {
    case GraftRotate.Bucket(n) => dt match {
      case LongType    => GraftBucketFn.bucketLong(n, row.getLong(partIdx))
      case IntegerType =>
        GraftBucketFn.bucketLong(n, row.getInt(partIdx).toLong)
      case StringType  =>
        GraftBucketFn.bucketString(n, row.getUTF8String(partIdx))
      case other => throw new IllegalArgumentException(
        s"graft-table: unsupported bucket column type $other")
    }
    // X327: time transforms floor the UTC-micros timestamp — the
    // canonical GraftTimeFn, the SAME function the catalog's SQL
    // scalar and the reported transform resolve to
    case GraftRotate.Time(unit) =>
      GraftTimeFn(unit, row.getLong(partIdx))
    // X328: the whole tuple is the rotation key (Seq equality)
    case GraftRotate.Tuple(_) => partIdxs.map(valueAt(row, _))
    case GraftRotate.Identity => valueAt(row, partIdx)
  }

  /** The manifest's layout-proof tag for the CURRENT file: bucket ids
    * ride [[TableCommit.Entry.part]] namespaced (identity layouts
    * prove through the stats channel instead, and carry the raw value
    * for the X319 report). */
  private def partTag: Option[String] = rotate match {
    case GraftRotate.Bucket(_) => Some(GraftBucketPart.render(
      currentKey.asInstanceOf[Int]))
    case GraftRotate.Time(unit) => Some(GraftTimePart.render(unit,
      currentKey.asInstanceOf[Int]))
    // X328: tuple tags name every column — `d=2024-01-01/region=EU`
    case GraftRotate.Tuple(_) =>
      Some(partIdxs.zip(currentKey.asInstanceOf[Seq[Any]])
        .map { case (i, v) =>
          s"${schema.fields(i).name}=${tagText(i, v)}" }.mkString("/"))
    // DATE tags render ISO — the same canonical text the stats channel
    // (and the X319 report) speaks for the column
    case GraftRotate.Identity => dt match {
      case DateType => Some(java.time.LocalDate
        .ofEpochDay(currentKey.asInstanceOf[Int].toLong).toString)
      case _ => Some(String.valueOf(currentKey))
    }
  }

  override def write(row: InternalRow): Unit = {
    require(partIdxs.forall(i => !row.isNullAt(i)),
      "graft partitioned table: NULL partition values are not " +
        "supported — filter or default them before the write")
    val k = keyOf(row)
    if (current == null || k != currentKey) {
      if (current != null)
        done += current.commit().asInstanceOf[GraftCommitMessage]
          .copy(part = partTag)
      current = new GraftDataWriter(root, batch, schema, partitionId,
        taskId, failAt, s"-$fileSeq")
      fileSeq += 1
      currentKey = k
    }
    current.write(row)
  }

  override def commit(): WriterCommitMessage = {
    if (current != null) {
      done += current.commit().asInstanceOf[GraftCommitMessage]
        .copy(part = partTag)
      current = null
    }
    GraftMultiCommitMessage(done.toList)
  }

  override def abort(): Unit = {
    if (current != null)
      try current.abort() catch { case _: Throwable => () }
    done.foreach(m =>
      try java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(root, m.relPath))
      catch { case _: Throwable => () })
  }

  override def close(): Unit =
    if (current != null) current.close()
}

/** Scan builder for the X289 read facet: collects the pruned column
  * set and the comparison filters usable for manifest-stat file
  * pruning. `pushFilters` deliberately returns EVERY filter as
  * still-to-evaluate — the pruning here skips files, never rows, so
  * it is lossless whatever the stats say. */
private class GraftScanBuilder(root: String, full: StructType,
    asOf: Option[Long] = None,
    toPhys: Map[String, String] = Map.empty,
    dvOnly: Boolean = false,
    cluster: Option[GraftClusterSpec] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = full
  private var usable: Array[Filter] = Array.empty
  private var anyFilter = false
  private var agg: Option[(StructType, Seq[Any])] = None

  /** X298: manifest stats and file bytes live under PHYSICAL names. */
  private def phys(c: String): String = toPhys.getOrElse(c, c)
  private def physSchema(s: StructType): StructType =
    if (toPhys.isEmpty) s
    else StructType(s.fields.toIndexedSeq.map(f =>
      f.copy(name = phys(f.name))))

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty pruning (e.g. COUNT(*)) still needs some column to drive
    // the row cursor — keep the first
    required =
      if (requiredSchema.fields.nonEmpty) requiredSchema
      else StructType(full.fields.take(1))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    anyFilter = filters.nonEmpty
    usable = filters.filter(GraftBatchScan.translatable(full))
    filters
  }
  override def pushedFilters(): Array[Filter] = usable

  // X290: ungrouped COUNT(*)/MIN/MAX answered from the MANIFEST — the
  // X218 metadata-only aggregates surfaced through Spark's own
  // planner: `SELECT COUNT(*) FROM view` opens ZERO data files.
  // COUNT(*) = Σ(rows − dvCount) (both manifest-carried, exact under
  // row-level deletes); MIN/MAX read the stats channel and are
  // refused the moment ANY file carries a DV (post-delete stats are
  // stale-but-superset — lossless for pruning, WRONG for extremes) or
  // lacks the column's stats. Spark only offers aggregate pushdown
  // when no residual filters exist; `anyFilter` double-locks it.
  override def supportCompletePushDown(a: Aggregation): Boolean =
    translateAgg(a).isDefined
  override def pushAggregation(a: Aggregation): Boolean = {
    agg = translateAgg(a)
    agg.isDefined
  }

  /** Stats-channel canonical text → catalyst value — ONE definition
    * shared with the SPJ partition keys ([[GraftKeyedPartition]]), so
    * aggregate pushdown and key grouping can never decode the same
    * stat differently (review finding). Callers gate on `statTypes`. */
  private def statVal(dt: DataType, s: String): Any =
    GraftKeyedPartition.catalystVal(dt, s)

  private def aggCol(e: org.apache.spark.sql.connector.expressions
      .Expression): Option[StructField] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      full.fields.find(_.name == nr.fieldNames()(0))
    case _ => None
  }

  private val statTypes: Set[DataType] = Set(LongType, IntegerType,
    ShortType, ByteType, DoubleType, FloatType, StringType)

  // Spark calls supportCompletePushDown then pushAggregation with the
  // SAME Aggregation — cache the translation so the manifest chain
  // resolves once per plan, not twice
  private var lastAgg: Option[(Aggregation, Option[(StructType, Seq[Any])])] =
    None

  private def translateAgg(
      a: Aggregation): Option[(StructType, Seq[Any])] =
    lastAgg match {
      case Some((prev, r)) if prev eq a => r
      case _ =>
        val r = computeAgg(a)
        lastAgg = Some((a, r))
        r
    }

  /** The MIN/MAX legs reuse [[TableCommit.statsEnvelope]] — the ONE
    * place that owns the "every entry has rows + stats, no DV
    * anywhere" poisoning rule — so this facet can't drift from the
    * API-level metadata aggregates. COUNT(*) is laxer on purpose: a
    * DV doesn't poison it (counts subtract exactly). */
  private def computeAgg(
      a: Aggregation): Option[(StructType, Seq[Any])] = {
    // statsEnvelope/entries are head-version; a time-travel pin falls
    // back to the real (versioned) scan rather than answering from
    // the wrong snapshot's manifest
    if (a.groupByExpressions.nonEmpty || anyFilter || asOf.isDefined ||
        dvOnly)
      return None
    // ONE snapshot for every leg: a COUNT and a MAX in one result row
    // must describe the SAME version, never a torn mix of two racing
    // commits' states
    val es = TableCommit.entries(root)
    def envelope(c: org.apache.spark.sql.connector.expressions
        .Expression): Option[(StructField, Any, Any)] =
      aggCol(c).filter(f => statTypes(f.dataType)).flatMap { f =>
        TableCommit.statsEnvelopeOf(es, phys(f.name),
          GraftBatchScan.lt(f.dataType)).map { case (_, mn, mx) =>
          (f.copy(nullable = true),
            statVal(f.dataType, mn), statVal(f.dataType, mx))
        }
      }
    val out = a.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        if (es.exists(_.rows.isEmpty)) None
        else Some(StructField("count_star", LongType, nullable = false) ->
          (es.map(e => e.rows.get - TableCommit.deletedCount(e)).sum: Any))
      case m: Min => envelope(m.column).map { case (f, mn, _) => f -> mn }
      case m: Max => envelope(m.column).map { case (f, _, mx) => f -> mx }
      case _ => None
    }
    if (out.exists(_.isEmpty)) None
    else Some(StructType(out.flatten.map(_._1)) -> out.flatten.map(_._2))
  }

  override def build(): Scan = agg match {
    case Some((schema, row)) => new GraftAggScan(root, schema, row)
    case None => new GraftBatchScan(root, required,
      physSchema(required), physSchema(full),
      usable.map(GraftBatchScan.mapFilter(phys)), asOf, dvOnly,
      phys, cluster)
  }
}

/** Test-observability seam for the facet's runtime-filter path (the
  * [[PagedScanProbe]] precedent): execution-time file pruning happens
  * inside Spark's BatchScanExec re-plan, so specs read the recorded
  * post-filter file count instead of guessing from metrics. */
private[graft] object GraftScanProbe {
  @volatile var lastRuntimeKept: Option[Int] = None
}

/** X314/X320: the layouts a scan can report as KeyGroupedPartitioning
  * — single-valued per file on a column (identity) or single-BUCKET
  * per file under the canonical [[GraftBucketFn]] hash. */
private[sources] sealed trait GraftClusterSpec { def col: String }
private[sources] final case class IdentityCluster(col: String)
    extends GraftClusterSpec
private[sources] final case class BucketCluster(col: String, n: Int)
    extends GraftClusterSpec
private[sources] final case class TimeCluster(col: String, unit: String)
    extends GraftClusterSpec
/** X328: single-valued per file on EVERY column of the tuple. */
private[sources] final case class TupleCluster(cols: Seq[String])
    extends GraftClusterSpec { def col: String = cols.head }

/** X327: HOW a partitioned write rotates files per key — identity on
  * the value, the canonical bucket hash, or a time transform
  * (`days`/`months`/`hours` over a TIMESTAMP, the [[GraftTimeFn]]
  * floors). ONE enum threaded from the catalog declaration through the
  * write plumbing to the task writers, so a layout can never be
  * half-declared. */
private[graft] sealed trait GraftRotate
private[graft] object GraftRotate {
  case object Identity extends GraftRotate
  final case class Bucket(n: Int) extends GraftRotate
  final case class Time(unit: String) extends GraftRotate {
    require(GraftTimePart.Units(unit), s"unknown time unit $unit")
  }
  /** X328: multi-column IDENTITY layout — the head column plus `rest`
    * (the standard (date, region) warehouse shape). Rotation keys on
    * the whole tuple; proofs hold per column. */
  final case class Tuple(rest: Seq[String]) extends GraftRotate {
    require(rest.nonEmpty, "Tuple layout needs at least two columns")
  }
}

/** X327: a time-rotated split's proof rides [[TableCommit.Entry.part]]
  * as `days=<ISO>` / `months=<int>` / `hours=<int>` — namespaced like
  * bucket tags so raw part values can never masquerade as layout
  * proof. Key text is canonical: ISO for days (what DateType's
  * [[GraftKeyedPartition.catalystVal]] parses), decimal for the int
  * transforms. */
private[graft] object GraftTimePart {
  val Units: Set[String] = Set("days", "months", "hours")

  def render(unit: String, key: Int): String = unit match {
    case "days" => s"days=${java.time.LocalDate.ofEpochDay(key.toLong)}"
    case u      => s"$u=$key"
  }

  /** The tag's canonical key text, or None when the tag is not this
    * unit's (raw values, bucket tags, the NULL-key default dir). */
  def parse(unit: String, tag: String): Option[String] =
    if (!tag.startsWith(unit + "=")) None
    else keyText(unit, tag.drop(unit.length + 1))

  private def keyText(unit: String, v: String): Option[String] =
    if (unit == "days")
      try { java.time.LocalDate.parse(v); Some(v) }
      catch { case _: java.time.format.DateTimeParseException => None }
    else v.toIntOption.map(_.toString)

  /** A staged `_p=` dir value re-tagged under the unit namespace when
    * it parses as the unit's key; anything else (the NULL-key default
    * partition) keeps its raw tag and the layout proof fails for that
    * file — lossless degrade, the [[GraftBucketPart]] contract. */
  def retag(unit: String, raw: String): String =
    keyText(unit, raw).fold(raw)(k => s"$unit=$k")
}

/** X320: a bucketed split's proof rides [[TableCommit.Entry.part]] as
  * `bucket=<id>` — namespaced so a value-keyed rewrite's raw part
  * values can never masquerade as bucket ids. */
private[graft] object GraftBucketPart {
  def render(id: Int): String = s"bucket=$id"
  def parse(s: String): Option[Int] =
    if (s.startsWith("bucket=")) s.drop(7).toIntOption else None
}

/** X314: an InputPartition carrying its file's PROVEN single value of
  * the cluster column — Spark's `HasPartitionKey` contract, the split
  * half of KeyGroupedPartitioning. The canonical stat string converts
  * to the column's catalyst form on demand (grouping compares
  * InternalRows under the key's data type). */
private case class GraftKeyedPartition(inner: CdfFilePartition,
    keys: Seq[String], dts: Seq[DataType]) extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      keys.zip(dts).map { case (k, dt) =>
        GraftKeyedPartition.catalystVal(dt, k) }.toArray[Any])
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

private object GraftKeyedPartition {
  /** Stats-channel canonical text → catalyst value, for exactly the
    * types [[GraftBatchScan.prunable]] admits. */
  def catalystVal(dt: DataType, s: String): Any = dt match {
    case LongType    => s.toLong
    case IntegerType => s.toInt
    case ShortType   => s.toShort
    case ByteType    => s.toByte
    case DoubleType  => s.toDouble
    case FloatType   => s.toFloat
    case StringType  =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case DateType    => java.time.LocalDate.parse(s).toEpochDay.toInt
    case other => throw new IllegalArgumentException(
      s"clusterby is not supported for type $other")
  }
}

/** The completed-pushdown aggregate scan: ONE partition emitting ONE
  * row computed on the driver from the manifest alone — no data file
  * is listed, opened, or read (the spec deletes every data file and
  * the answer still serves). */
private class GraftAggScan(root: String, schema: StructType,
    row: Seq[Any]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-table($root) manifest-agg=${schema.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftAggPartition(row))
  override def createReaderFactory(): PartitionReaderFactory =
    GraftAggReaderFactory
}

private final case class GraftAggPartition(row: Seq[Any])
    extends InputPartition

private object GraftAggReaderFactory extends PartitionReaderFactory {
  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var served = false
      private val vals = p.asInstanceOf[GraftAggPartition].row
      override def next(): Boolean =
        if (served) false else { served = true; true }
      override def get(): InternalRow = InternalRow.fromSeq(vals)
      override def close(): Unit = ()
    }
}

private[graft] object GraftBatchScan {
  /** Files below this size skip the planning-time footer consult for
    * row-group splits (X309) — a file smaller than a row group can't
    * hold two. Volatile test seam: specs lower it to drive split
    * planning on fixture-sized files. */
  @volatile private[graft] var splitFooterMin: Long = 96L * 1024 * 1024

  /** (path → row-group layout) cache: committed data files are
    * IMMUTABLE (part names carry the write's UUID, rewrites mint new
    * paths), so a footer never changes — without this, every plan of a
    * big-file table re-read every footer on the driver (review
    * finding). Crude bound: cleared past 100k entries (tuples are
    * bytes; 100k ≈ a few MB). */
  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, IndexedSeq[(Long, Long)]]()

  /** (path → bytes) cache for [[GraftBatchScan.estimateStatistics]] —
    * committed paths are immutable (same argument as [[footerCache]]),
    * so one `stat` per file ever, not one per plan. Same crude bound. */
  private val sizeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[sources] def fileSize(abs: String): Option[Long] = {
    val hit = sizeCache.get(abs)
    if (hit != null) return Some(hit.longValue())
    try {
      val n = java.nio.file.Files.size(java.nio.file.Paths.get(abs))
      if (sizeCache.size() > 100000) sizeCache.clear()
      sizeCache.put(abs, java.lang.Long.valueOf(n))
      Some(n)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The file's row groups as (startingPos, rowCount), oldest first —
    * or empty when the size gate says don't bother / the footer is
    * unreadable (the caller then plans one whole-file partition, which
    * is always correct). */
  private[sources] def rowGroups(abs: String): Seq[(Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    try {
      val p = java.nio.file.Paths.get(abs)
      if (java.nio.file.Files.size(p) < splitFooterMin) return Seq.empty
      val hit = footerCache.get(abs)
      if (hit != null) return hit
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri),
        new org.apache.hadoop.conf.Configuration()))
      val groups =
        try rd.getFooter.getBlocks.asScala.toIndexedSeq
          .map(b => (b.getStartingPos, b.getRowCount))
        finally rd.close()
      if (footerCache.size() > 100000) footerCache.clear()
      footerCache.put(abs, groups)
      groups
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  /** The column types whose canonical stat-string form the comparator
    * below actually orders (and whose pushed-literal `toString`
    * matches that form): integers (decimal text), floats
    * (`Double.toString`), strings (verbatim), DATE (ISO text — both
    * the stats channel and `java.sql.Date.toString`). Anything else —
    * timestamps (raw micros in footers vs ISO literals), decimals
    * (unscaled text), binary — must NOT prune: a lexical compare of
    * non-comparable forms silently drops matching files. */
  private val prunableTypes: Set[DataType] = Set(LongType, IntegerType,
    ShortType, ByteType, DoubleType, FloatType, StringType, DateType)

  private[sources] def prunable(dt: DataType): Boolean = prunableTypes(dt)

  /** Catalyst literal → the EXTERNAL form whose `toString` matches the
    * stats channel's canonical text (UTF8String → String, epoch-day
    * Int → java.sql.Date); None for anything the channel cannot judge.
    * ONE definition shared by the runtime-filter bridge and the
    * write-side DML pruner (review finding: two private copies of the
    * canonical-form rule would drift). */
  private[graft] def externalLiteral(v: Any, dt: DataType): Option[Any] =
    (v, dt) match {
      case (null, _) => None
      case (s: org.apache.spark.unsafe.types.UTF8String, _) =>
        Some(s.toString)
      case (d: java.lang.Integer, DateType) => Some(java.sql.Date
        .valueOf(java.time.LocalDate.ofEpochDay(d.toLong)))
      case (x: java.lang.Long, _)    => Some(x)
      case (x: java.lang.Integer, _) => Some(x)
      case (x: java.lang.Short, _)   => Some(x)
      case (x: java.lang.Byte, _)    => Some(x)
      case (x: java.lang.Double, _)  => Some(x)
      // widen exactly as footerStats canonicalizes FLOAT stats: the
      // channel stores (double)v's shortest string, so an unwidened
      // Float literal ("0.1") would compare against
      // "0.10000000149011612" and wrongly prune the file holding the
      // matching rows — lossy for X313 runtime filters and X317 DML
      // planning (ADVICE r15)
      case (x: java.lang.Float, _)   =>
        Some(java.lang.Double.valueOf(x.toDouble))
      case (x: String, _)            => Some(x)
      case (x: java.sql.Date, _)     => Some(x)
      case _ => None
    }

  /** Runtime-filter bridge: the V2 `Predicate`s Spark's dynamic-pruning
    * machinery hands [[GraftBatchScan.filter]] (IN-sets and equalities
    * from a completed broadcast build side), re-expressed as the v1
    * [[Filter]]s the manifest pruner already speaks. Literals arrive in
    * CATALYST form — UTF8String for strings, epoch-day Int for dates —
    * and are converted to the external form whose `toString` matches
    * the stats channel's canonical text. Anything unrecognized is
    * dropped (pruning stays lossless; Spark re-evaluates the join). */
  private[sources] def fromV2Predicate(schema: StructType)(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[Filter] = {
    import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, Literal => V2Literal, NamedReference => V2Ref}
    def colOf(e: V2Expr): Option[String] = e match {
      case r: V2Ref if r.fieldNames().length == 1 =>
        Some(r.fieldNames()(0))
      case _ => None
    }
    def valOf(e: V2Expr, dt: DataType): Option[Any] = e match {
      case l: V2Literal[_] => externalLiteral(l.value(), dt)
      case _ => None
    }
    val kids = p.children()
    p.name() match {
      case "IN" if kids.length >= 2 =>
        for {
          c <- colOf(kids.head)
          fld <- schema.fields.find(_.name == c)
          vs <- Some(kids.tail.flatMap(valOf(_, fld.dataType)))
          if vs.length == kids.length - 1
        } yield In(c, vs.toArray)
      case "=" if kids.length == 2 =>
        (for {
          c <- colOf(kids(0)); fld <- schema.fields.find(_.name == c)
          v <- valOf(kids(1), fld.dataType)
        } yield EqualTo(c, v)).orElse(for {
          c <- colOf(kids(1)); fld <- schema.fields.find(_.name == c)
          v <- valOf(kids(0), fld.dataType)
        } yield EqualTo(c, v))
      case _ => None
    }
  }

  /** String order for the stats channel: UTF-8 BYTE order (= code
    * point order) — the order Spark's UTF8String predicates evaluate
    * in AND the order parquet footer stats (the channel's other
    * producer) are written in. Java's `String#compareTo` orders by
    * UTF-16 code UNIT, which disagrees for supplementary-plane
    * characters (surrogates 0xD800–0xDFFF sort below 0xE000–0xFFFF
    * code units, while the code points they encode sort above) — a
    * pruned range filter using the wrong order can drop a file that
    * contains matching rows (ADVICE r14). Allocation-free: only chars
    * at/above the surrogate block need the standard shift. */
  private[graft] def utf8Lt(a: String, b: String): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i); val cb = b.charAt(i)
      if (ca != cb) {
        def adj(c: Char): Int =
          if (c < 0xD800) c.toInt
          else if (c >= 0xE000) c.toInt - 0x800 // BMP tail below...
          else c.toInt + 0x2000 // ...surrogates (suppl. planes) on top
        return adj(ca) < adj(cb)
      }
      i += 1
    }
    a.length < b.length
  }

  /** Stats-channel comparator for a column's CANONICAL string form —
    * numeric parse for numeric columns, UTF-8 byte order for strings,
    * lexical for ISO dates (pure ASCII, where the orders coincide)
    * (the [[TableCommit.ColStats]] contract). */
  private[sources] def lt(dt: DataType): (String, String) => Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      (a, b) => a.toLong < b.toLong
    case DoubleType | FloatType => (a, b) => a.toDouble < b.toDouble
    case StringType => utf8Lt
    // X327: TIMESTAMP stats are raw-micros decimal text; only filters
    // whose literal arrived CATALYST-side (a raw Long — translateDml
    // and the V2 runtime-filter bridge) are admitted by translatable,
    // so both sides here are always micros text
    case TimestampType => (a, b) => a.toLong < b.toLong
    case _ => (a, b) => a < b
  }

  private def cmpCol(f: Filter): Option[(String, Any)] = f match {
    case EqualTo(c, v)            => Some(c -> v)
    case GreaterThan(c, v)        => Some(c -> v)
    case GreaterThanOrEqual(c, v) => Some(c -> v)
    case LessThan(c, v)           => Some(c -> v)
    case LessThanOrEqual(c, v)    => Some(c -> v)
    case _                        => None
  }

  /** X298: rewrite a pushed filter's column names logical → physical
    * (only the shapes [[translatable]] admits can reach here). */
  def mapFilter(phys: String => String)(f: Filter): Filter = f match {
    case And(l, r) => And(mapFilter(phys)(l), mapFilter(phys)(r))
    case EqualTo(c, v)            => EqualTo(phys(c), v)
    case GreaterThan(c, v)        => GreaterThan(phys(c), v)
    case GreaterThanOrEqual(c, v) => GreaterThanOrEqual(phys(c), v)
    case LessThan(c, v)           => LessThan(phys(c), v)
    case LessThanOrEqual(c, v)    => LessThanOrEqual(phys(c), v)
    case In(c, vs)                => In(phys(c), vs)
    case other                    => other
  }

  def translatable(full: StructType)(f: Filter): Boolean = f match {
    case And(l, r) =>
      translatable(full)(l) && translatable(full)(r)
    // an In prunes losslessly whatever its value list holds (nulls
    // match nothing), so only the column's TYPE gates it. TIMESTAMP
    // columns (X327) are admitted ONLY when every literal is a raw
    // micros Long (catalyst form — translateDml and the V2 bridge):
    // an external java.sql.Timestamp's ISO toString would compare
    // garbage against the channel's micros text and silently
    // mis-prune, so it refuses here.
    case In(c, vs) => full.fields.exists(fd => fd.name == c &&
      (prunableTypes(fd.dataType) ||
        (fd.dataType == TimestampType &&
          vs.forall(v => v == null || v.isInstanceOf[java.lang.Long]))))
    case other => cmpCol(other).exists { case (c, v) =>
      v != null &&
        full.fields.exists(fd => fd.name == c &&
          (prunableTypes(fd.dataType) ||
            (fd.dataType == TimestampType &&
              v.isInstanceOf[java.lang.Long])))
    }
  }

  /** The types whose pushed-literal `toString` equals Spark's
    * `CAST(col AS STRING)` — the canonical form the bloom sidecar was
    * built from ([[TableCommit.withBloomStats]] hashes that cast).
    * Floats excluded: scientific-notation formatting can drift between
    * the two producers, and a drifted probe is a FALSE NEGATIVE. */
  private val bloomSafeTypes: Set[DataType] = Set(LongType, IntegerType,
    ShortType, ByteType, StringType, DateType)

  /** An equality probe can consult the file's bloom sidecar beside its
    * [min, max]: all-k-bits-set says maybe (read it), a clear bit says
    * provably absent (skip it); a file without a bloom for the column
    * keeps (the X207 missing-stat rule). */
  private def bloomKeeps(full: StructType, e: TableCommit.Entry,
      c: String, v: Any): Boolean =
    v == null || full.fields.find(_.name == c).forall(fld =>
      !bloomSafeTypes(fld.dataType) ||
        TableCommit.bloomKeeps(e, c, v.toString))

  /** TRUE only when the file's stats PROVE every row matches `f` — the
    * X324 whole-file DML-drop predicate, by ENVELOPE CONTAINMENT: an
    * equality/IN needs the file single-valued on the column (min ==
    * max, where "might match" and "all match" coincide); a range
    * conjunct needs the whole [min, max] envelope inside the predicate
    * region — which makes the daily-retention shape (`DELETE WHERE
    * d >= X AND d < Y` on a date-partitioned table) a pure metadata
    * commit too, one dropped file per in-range day. Min/max witness
    * NON-NULL rows only (every producer skips nulls), so each
    * referenced column must ALSO carry the `nn:<col>` null-free
    * witness — without it a file holding {5, NULL} rows reads
    * min = max = 5 and a whole-file drop on `c = 5` would erase the
    * NULL rows (ADVICE r15). Rotated catalog writes refuse NULLs and
    * witness automatically; a path-based or engine-API write earns
    * the witness from its footers; stat-less or pre-witness files
    * stay on the lossless DV-scan path. */
  def mustMatchAll(full: StructType, e: TableCommit.Entry,
      f: Filter): Boolean = {
    def env(c: String): Option[((String, String) => Boolean,
        TableCommit.ColStats)] =
      if (!TableCommit.nullFree(e, c)) None
      else for {
        cs <- e.stats.get(c)
        fld <- full.fields.find(_.name == c)
        if prunableTypes(fld.dataType) ||
          fld.dataType == TimestampType // X327: micros text, see lt
      } yield (lt(fld.dataType), cs)
    def eqAll(c: String, v: Any): Boolean = v != null &&
      env(c).exists { case (less, cs) =>
        val s = v.toString
        cs.min == cs.max && !less(s, cs.min) && !less(cs.min, s)
      }
    def proves(f: Filter): Boolean = f match {
      case And(l, r)     => proves(l) && proves(r)
      case EqualTo(c, v) => eqAll(c, v)
      case In(c, vs)     => vs.exists(eqAll(c, _))
      case GreaterThan(c, v) => v != null && env(c).exists {
        case (less, cs) => less(v.toString, cs.min) } // v < min
      case GreaterThanOrEqual(c, v) => v != null && env(c).exists {
        case (less, cs) => !less(cs.min, v.toString) } // min >= v
      case LessThan(c, v) => v != null && env(c).exists {
        case (less, cs) => less(cs.max, v.toString) } // max < v
      case LessThanOrEqual(c, v) => v != null && env(c).exists {
        case (less, cs) => !less(v.toString, cs.max) } // max <= v
      case _ => false
    }
    f.references.nonEmpty && proves(f)
  }

  /** Keep the file iff the filter MIGHT match its [min, max] — a
    * missing stat keeps the file (lossless by construction). */
  def mightMatch(full: StructType, e: TableCommit.Entry,
      f: Filter): Boolean = f match {
    case And(l, r) =>
      mightMatch(full, e, l) && mightMatch(full, e, r)
    // any one live value inside the envelope (and not bloom-refuted)
    // keeps the file; a null matches nothing under IN semantics
    case In(c, vs) =>
      (for {
        cs <- e.stats.get(c)
        fld <- full.fields.find(_.name == c)
      } yield {
        val less = lt(fld.dataType)
        vs.exists { v =>
          v != null && {
            val s = v.toString
            !less(s, cs.min) && !less(cs.max, s)
          } && bloomKeeps(full, e, c, v)
        }
      }).getOrElse(vs.exists(v => bloomKeeps(full, e, c, v)))
    case other => cmpCol(other).forall { case (c, v) =>
      (for {
        cs <- e.stats.get(c)
        fld <- full.fields.find(_.name == c)
      } yield {
        val less = lt(fld.dataType)
        val s = v.toString
        other match {
          case _: EqualTo            => (!less(s, cs.min) && !less(cs.max, s)) &&
            bloomKeeps(full, e, c, v)
          case _: GreaterThan        => less(s, cs.max)
          case _: GreaterThanOrEqual => !less(cs.max, s)
          case _: LessThan           => less(cs.min, s)
          case _: LessThanOrEqual    => !less(s, cs.min)
          case _                     => true
        }
      }).getOrElse(other match {
        // no [min,max] for the column: an equality can still consult a
        // bloom-only sidecar (reindex writes blooms beside whatever
        // stats exist; both absent keeps the file)
        case _: EqualTo => bloomKeeps(full, e, c, v)
        case _          => true
      })
    }
  }
}

/** One partition per live file surviving the stat prune; the shared
  * [[GraftCdfFileReader]] does the executor-side parquet decode and
  * DV anti-apply (`bare = true`: data columns only, no feed tail). */
private class GraftBatchScan(root: String, required: StructType,
    physRequired: StructType, physFull: StructType,
    pushed: Array[Filter], asOf: Option[Long] = None,
    dvOnly: Boolean = false, phys: String => String = identity,
    cluster: Option[GraftClusterSpec] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  // Spark matches the scan's output by THIS schema (logical names);
  // the partitions carry the physical-named twin for the file decode —
  // rows are positional, so only the parquet field lookup differs
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // X313: dynamic file pruning — the DPP analogue for a manifest-
  // planned table. A broadcast join whose build side resolves to few
  // keys hands this scan an IN-set at EXECUTION time (values only the
  // running query knows), and whole files drop against the manifest's
  // [min, max] stats and bloom sidecars before a single byte is read.
  // At 100 TB this is the difference between scanning the whole fact
  // table and scanning the handful of files the dim's surviving keys
  // can live in. Lossless like every prune here: Spark still
  // row-evaluates the join, so a kept-but-dead file costs I/O only.
  @volatile private var runtime: Array[Filter] = Array.empty

  override def filterAttributes(): Array[NamedReference] =
    required.fields.collect {
      case f if GraftBatchScan.prunable(f.dataType) =>
        org.apache.spark.sql.connector.expressions.Expressions
          .column(f.name)
    }

  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    // X329 (VERDICT r15 task 4): clustered scans ACCEPT runtime
    // filters too — the compose with the partitioning contract
    // happens in planInputPartitions (within-group pruning + a group
    // witness), which is exactly what Spark's post-filter check
    // requires: the surviving key-value set must be IDENTICAL.
    val translated = predicates
      .flatMap(GraftBatchScan.fromV2Predicate(required))
      .filter(GraftBatchScan.translatable(required))
    if (translated.nonEmpty)
      runtime ++= translated.map(GraftBatchScan.mapFilter(phys))
  }

  /** X314: one pinned entry list shared by the partitioning report and
    * the partition planner — both must describe the SAME snapshot (and
    * the same static-prune outcome), never a torn mix of two racing
    * commits' states. */
  private lazy val staticEntries: Seq[TableCommit.Entry] =
    asOf.map(v => TableCommit.entriesAtVersion(root, v))
      .getOrElse(TableCommit.entries(root))
      .filter(e => !dvOnly || e.stats.contains(TableCommit.DvKey))
      .filter(e => pushed.forall(f =>
        GraftBatchScan.mightMatch(physFull, e, f)))

  /** The admitted cluster layout, with each entry's proven KEY — only
    * when the manifest PROVES every surviving file single-keyed:
    * identity needs min == max stats on the column; bucket (X320)
    * needs every file's `bucket=<id>` part tag under the declared
    * count. A declared-but-unproven layout silently degrades to an
    * unpartitioned scan rather than lying to the planner. */
  private lazy val clusterInfo
      : Option[(GraftClusterSpec, Seq[StructField],
          Map[String, Seq[String]])] =
    cluster.flatMap { spec =>
      required.fields.find(_.name == spec.col).flatMap { f =>
        spec match {
          // X328: every column of the tuple single-valued + null-free
          case TupleCluster(cs)
              if cs.forall(c => required.fields.exists(fd =>
                  fd.name == c &&
                    GraftBatchScan.prunable(fd.dataType))) &&
                staticEntries.nonEmpty && staticEntries.forall(e =>
                  cs.forall(c =>
                    e.stats.get(phys(c)).exists(x => x.min == x.max) &&
                      TableCommit.nullFree(e, phys(c)))) =>
            val fs = cs.map(c => required.fields.find(_.name == c).get)
            Some((spec, fs, staticEntries.map(e =>
              e.path -> cs.map(c => e.stats(phys(c)).min)).toMap))
          // min == max proves single-valued for NON-NULL rows only —
          // the nn: null-free witness is required too, or a file mixing
          // one value with NULLs would report KeyGroupedPartitioning
          // and a "shuffle-free" GROUP BY would emit one NULL group
          // per task (ADVICE r15)
          case IdentityCluster(c)
              if GraftBatchScan.prunable(f.dataType) &&
                staticEntries.nonEmpty && staticEntries.forall(e =>
                  e.stats.get(phys(c)).exists(cs => cs.min == cs.max) &&
                    TableCommit.nullFree(e, phys(c))) =>
            Some((spec, Seq(f), staticEntries.map(e =>
              e.path -> Seq(e.stats(phys(c)).min)).toMap))
          case BucketCluster(_, n)
              if staticEntries.nonEmpty && staticEntries.forall(e =>
                e.part.flatMap(GraftBucketPart.parse)
                  .exists(id => id >= 0 && id < n)) =>
            Some((spec, Seq(f), staticEntries.map(e => e.path ->
              Seq(e.part.flatMap(GraftBucketPart.parse).get.toString))
              .toMap))
          // X327: time layouts prove through the namespaced part tag
          // (minted only by the NULL-refusing rotating writer and the
          // layout-preserving rewrites — a tag IS the null witness)
          case TimeCluster(_, unit)
              if staticEntries.nonEmpty && staticEntries.forall(e =>
                e.part.exists(p =>
                  GraftTimePart.parse(unit, p).isDefined)) =>
            Some((spec, Seq(f), staticEntries.map(e => e.path ->
              Seq(GraftTimePart.parse(unit, e.part.get).get)).toMap))
          case _ => None
        }
      }
    }

  /** X314/X320: storage-partitioned joins — a table whose files are
    * single-keyed on the cluster layout (single-valued on a column, or
    * single-BUCKET under the canonical hash — both provable from the
    * manifest alone) reports KeyGroupedPartitioning, so joining two
    * graft tables co-partitioned the same way plans with ZERO shuffle:
    * Spark groups same-key files into one task per key and aligns the
    * two sides. At 100 TB this removes the dominant exchange from the
    * standard fact-to-fact co-partitioned join (both sides land date-
    * or bucket-partitioned by the pipeline that wrote them). */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    clusterInfo match {
      case Some((spec, fs, keys)) =>
        import org.apache.spark.sql.connector.expressions.Expressions
        val exprs: Array[
            org.apache.spark.sql.connector.expressions.Expression] =
          spec match {
            case IdentityCluster(_) =>
              Array(Expressions.identity(fs.head.name))
            case BucketCluster(_, n) =>
              Array(Expressions.bucket(n, fs.head.name))
            case TimeCluster(_, "days") =>
              Array(Expressions.days(fs.head.name))
            case TimeCluster(_, "months") =>
              Array(Expressions.months(fs.head.name))
            case TimeCluster(_, _) =>
              Array(Expressions.hours(fs.head.name))
            case TupleCluster(_) =>
              fs.map(f => Expressions.identity(f.name)
                : org.apache.spark.sql.connector.expressions.Expression)
                .toArray
          }
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(exprs, keys.values.toSet.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }

  /** VERDICT r15 task 1: plan-time statistics from the manifest —
    * post-pushdown, post-static-prune Σ(file bytes) and DV-corrected
    * Σ(rows). Without this Spark assigns the facet relation its
    * DEFAULT size estimate, so a small graft dim never plan-time
    * auto-broadcasts and the reference's core fact⋈dim join (J1)
    * plans SMJ until AQE rescues it AFTER paying the dim's shuffle
    * map pass. Row counts come straight off the manifest; bytes are
    * one cached `stat` per planned file (immutable paths — same
    * argument as the footer cache), exactly what the split planner
    * already pays. Missing information degrades to empty(), never to
    * a guess. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val es = staticEntries
    val rows =
      if (es.forall(_.rows.isDefined))
        java.util.OptionalLong.of(es.iterator.map(e =>
          e.rows.get - TableCommit.deletedCount(e)).sum)
      else java.util.OptionalLong.empty()
    var bytes = 0L
    var ok = true
    es.foreach { e =>
      val abs =
        if (e.path.startsWith("/")) e.path else s"$root/${e.path}"
      GraftBatchScan.fileSize(abs) match {
        case Some(n) => bytes += n
        case None    => ok = false
      }
    }
    val size =
      if (ok) java.util.OptionalLong.of(bytes)
      else java.util.OptionalLong.empty()
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong = size
      override def numRows(): java.util.OptionalLong = rows
    }
  }

  /** The vectorized-decode verdict for this scan's projection — shared
    * by the partition planner and the plan description, so a demote to
    * the row-at-a-time Group reader is NEVER silent (VERDICT r14
    * task 4): `EXPLAIN` names the exact columns that cost the scan its
    * columnar shape. */
  private lazy val typeDemote: Seq[String] =
    GraftVectorized.unsupportedCols(physRequired)

  override def description(): String = {
    val mode =
      if (typeDemote.nonEmpty)
        s"mode=group-reader (type demote: ${typeDemote.mkString(", ")})"
      else if (dvOnly) "mode=vectorized-row-view (dv)"
      else "mode=vectorized"
    s"graft-table($root)${asOf.map(v => s" asOf=v$v").getOrElse("")} " +
      s"pruned=[${pushed.mkString(", ")}] $mode"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    def keep(e: TableCommit.Entry): Boolean =
      runtime.forall(f => GraftBatchScan.mightMatch(physFull, e, f))
    val es =
      if (runtime.isEmpty) staticEntries
      else clusterInfo match {
        // X329: runtime pruning WITHIN key groups — Spark's
        // post-filter check demands the surviving key-value set stay
        // identical, so a group whose files ALL prune keeps its
        // smallest file as the group witness (lossless: the join
        // re-evaluates rows). At 100 TB this is most of X313's win on
        // a clustered fact: a day with 1,000 files under a 3-day
        // IN-set plans 1,000 files for live days and ONE for dead.
        case Some((_, _, keys)) =>
          staticEntries.groupBy(e => keys(e.path)).values.flatMap { g =>
            val kept = g.filter(keep)
            if (kept.nonEmpty) kept
            else Seq(g.minBy(e => GraftBatchScan.fileSize(
              if (e.path.startsWith("/")) e.path
              else s"$root/${e.path}").getOrElse(Long.MaxValue)))
          }.toSeq
        case None => staticEntries.filter(keep)
      }
    if (runtime.nonEmpty) GraftScanProbe.lastRuntimeKept = Some(es.size)
    // X295: serve raw ColumnarBatches when the WHOLE scan can — every
    // file DV-free and every projected type vectorized-decodable.
    // Spark forbids mixing columnar and row partitions in one scan, so
    // a single DV'd file demotes the scan to the vectorized row view.
    val columnar = typeDemote.isEmpty &&
      es.forall(e => !e.stats.contains(TableCommit.DvKey))
    es.flatMap { e =>
      val abs =
        if (e.path.startsWith("/")) e.path else s"$root/${e.path}"
      val enc = e.stats.get(TableCommit.DvKey).map(_.min)
      def part(start: Long, end: Long, pBase: Long, pEnd: Long) =
        CdfFilePartition(abs, 0L, physRequired, root,
          encA = enc, encB = None,
          emitOnly = false, changeType = None, withIds = false,
          ridBase = None, bare = true, columnar = columnar,
          splitStart = start, splitEnd = end,
          posBase = pBase, posEnd = pEnd): InputPartition
      // X309 (VERDICT r14 task 5): a multi-row-group file plans one
      // partition PER GROUP — a multi-GB DV'd file keeps in-file
      // parallelism instead of one task owning its whole position
      // space (and a big clean facet file splits the same way). The
      // footer consult is gated on file SIZE, so planning stays O(1)
      // per ordinary file and footer-read-proportional only for the
      // files that can actually contain several groups.
      val groups =
        if (typeDemote.nonEmpty) Seq.empty // Group fallback risk: whole
        else GraftBatchScan.rowGroups(abs)
      val ps: Seq[InputPartition] =
        if (groups.size <= 1) Seq(part(0L, -1L, 0L, -1L))
        else {
          val size = java.nio.file.Files.size(
            java.nio.file.Paths.get(abs))
          var base = 0L
          groups.zipWithIndex.map { case ((off, rows), i) =>
            val start = if (i == 0) 0L else off
            val end =
              if (i == groups.size - 1) size else groups(i + 1)._1
            val p = part(start, end, base, base + rows)
            base += rows
            p
          }
        }
      // X314/X320: a clustered scan tags every split with its file's
      // proven key (the column value, or the bucket id), so Spark can
      // group same-key splits into one task
      clusterInfo match {
        case Some((spec, fs, keys)) =>
          val dts: Seq[DataType] = spec match {
            case IdentityCluster(_)     => Seq(fs.head.dataType)
            case BucketCluster(_, _)    => Seq(IntegerType)
            case TimeCluster(_, "days") => Seq(DateType)
            case TimeCluster(_, _)      => Seq(IntegerType)
            case TupleCluster(_)        => fs.map(_.dataType)
          }
          ps.map(p => GraftKeyedPartition(
            p.asInstanceOf[CdfFilePartition],
            keys(e.path), dts): InputPartition)
        case None => ps
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftCdfReaderFactory
}

private object GraftDataWriter {
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  /** One read-only Hadoop Configuration shared by every writer: the
    * constructor loads and parses the XML defaults, which at a file per
    * rotation key (X316 partitioned INSERTs plan one file per (task,
    * key)) was paid hundreds of times per statement. */
  lazy val sharedConf = new org.apache.hadoop.conf.Configuration()

  /** r16 write-path rewrite: direct InternalRow → RecordConsumer
    * WriteSupport. The previous writer went through parquet's example
    * Group API — per ROW one SimpleGroup allocation plus per VALUE a
    * name→index lookup and a boxed Primitive append; this emits each
    * value straight from the unsafe row into the column writers. The
    * emitted file is logically identical (same MessageType, same
    * optional-field skip for nulls, same UTF-8 string bytes — without
    * the UTF-16 String round trip). */
  private class InternalRowWriteSupport(msgType: MessageType,
      names: Array[String], typeTag: Array[Int])
      extends org.apache.parquet.hadoop.api.WriteSupport[InternalRow] {
    import org.apache.parquet.io.api.{Binary, RecordConsumer}
    private var consumer: RecordConsumer = _
    override def init(conf: org.apache.hadoop.conf.Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport.WriteContext =
      new org.apache.parquet.hadoop.api.WriteSupport.WriteContext(
        msgType, java.util.Collections.emptyMap[String, String]())
    override def prepareForWrite(rc: RecordConsumer): Unit = consumer = rc
    override def write(row: InternalRow): Unit = {
      val rc = consumer
      rc.startMessage()
      val n = typeTag.length
      var i = 0
      while (i < n) {
        if (!row.isNullAt(i)) {
          rc.startField(names(i), i)
          typeTag(i) match {
            case 0 => rc.addLong(row.getLong(i))
            case 1 => rc.addInteger(row.getInt(i))
            case 2 => rc.addDouble(row.getDouble(i))
            case 3 =>
              // getBytes copies out of the row buffer here (the string
              // sits inside an UnsafeRow, never exactly spanning its
              // backing array), so the Binary wrapper owns its bytes
              rc.addBinary(
                Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
            case _ => throw new IllegalArgumentException(
              s"graft-table: unsupported type for column ${names(i)}")
          }
          rc.endField(names(i), i)
        }
        i += 1
      }
      rc.endMessage()
    }
  }

  /** Standard ParquetWriter.Builder over [[InternalRowWriteSupport]] —
    * identical writer defaults (codec, page/row-group sizing, writer
    * version) to the example builder it replaces. */
  class RowWriterBuilder(path: org.apache.hadoop.fs.Path,
      msgType: MessageType, typeTag: Array[Int], names: Array[String])
      extends org.apache.parquet.hadoop.ParquetWriter.Builder[
        InternalRow, RowWriterBuilder](path) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(conf: org.apache.hadoop.conf.Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
      new InternalRowWriteSupport(msgType, names, typeTag)
  }

  /** StructType → parquet MessageType for the primitive column types the
    * commit-layer gates use. All fields optional (Spark nullability is
    * advisory); Spark's vectorized reader maps these back losslessly. */
  def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType    => b.addField(Types.optional(INT64).named(f.name))
        case IntegerType => b.addField(Types.optional(INT32).named(f.name))
        case DoubleType  => b.addField(Types.optional(DOUBLE).named(f.name))
        case StringType  => b.addField(Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name))
        // X327: DATE (epoch-day INT32) and TIMESTAMP (UTC-adjusted
        // micros INT64) — the types every date-partitioned warehouse
        // table carries; annotations match what Spark's own parquet
        // writer emits, so both readers decode identically
        case DateType => b.addField(Types.optional(INT32)
          .as(LogicalTypeAnnotation.dateType()).named(f.name))
        case TimestampType => b.addField(Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name))
        case other => throw new IllegalArgumentException(
          s"graft-table: unsupported type $other for column ${f.name}")
      }
    }
    b.named("graft")
  }
}
