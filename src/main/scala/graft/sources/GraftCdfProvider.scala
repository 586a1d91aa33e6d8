package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.engine.TableCommit

/** STREAMING change feed over the [[TableCommit]] log (X267, VERDICT
  * r10 task 4): `spark.readStream.format("graft-cdf")` turns a
  * committed table's own commit log into a Structured Streaming
  * source — COMMIT VERSIONS ARE THE OFFSETS. Each micro-batch reads
  * exactly the files the versions in `(start, end]` appended, tags
  * rows with `_commit_version`, and checkpoints the watermark through
  * Spark's offset log, so a consumer restarted mid-feed resumes at
  * the version boundary it committed — exactly-once without a
  * hand-rolled ledger (the X251 batch consumer's `readConsumerLedger`
  * flow, promoted into the engine the way the reference's
  * timer-trigger incremental load consumes its upstream,
  * /root/reference/azure-functions/function_app.py:540-587).
  *
  * Contract (same as [[TableCommit.readChanges]]): APPEND-ONLY — a
  * version that removed files or grew a deletion vector is not
  * expressible as insert rows and fails the batch LOUDLY at planning
  * time; rewrite-bearing histories are the full feed's job. Retention
  * must cover the consumer's lag (poll at least once per `retain`
  * commits), also exactly the batch feed's rule.
  *
  * Usage: the caller passes the FULL read schema — the table's data
  * columns PLUS a trailing `_commit_version LONG` — and `option
  * ("root", tableRoot)`. `maxversionspertrigger` bounds a batch's
  * version span (the `maxFilesPerTrigger` analogue; default: drain
  * everything available). `TriggerAvailableNow` pins the horizon at
  * prepare time and drains to it.
  *
  * Executor-side parquet reading uses parquet-hadoop's public Group
  * API — the read-side mirror of [[GraftDataWriter]]'s writer leg,
  * same primitive-type coverage (long/int/double/string), no private
  * Spark machinery. Planning is manifest-only on the driver; row
  * bytes never visit it.
  *
  * Scale: a batch plans one InputPartition per appended FILE, so read
  * parallelism tracks the change size, and a 100k-file table's feed
  * still reads only what each version added — change-proportional
  * cost, the entire point of consuming the log instead of diffing
  * snapshots. */
class GraftCdfProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-cdf"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-cdf needs an explicit schema: the table's columns plus a " +
        "trailing _commit_version LONG")
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftCdfTable(schema, properties)
}

private object GraftCdf {
  val VersionCol = "_commit_version"

  /** Split the full read schema into (data columns, version column) —
    * the version column must be the trailing field, LongType. */
  def dataSchema(full: StructType): StructType = {
    require(full.fields.nonEmpty &&
      full.fields.last.name == VersionCol &&
      full.fields.last.dataType == LongType,
      s"graft-cdf schema must end with `$VersionCol LONG`; got $full")
    StructType(full.fields.init)
  }
}

private class GraftCdfTable(schema0: StructType,
    properties: util.Map[String, String])
    extends Table with SupportsRead {
  private val root = Option(properties.get("root")).getOrElse(
    throw new IllegalArgumentException("graft-cdf requires option 'root'"))
  override def name(): String = s"graft-cdf($root)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema0
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream =
          new GraftCdfStream(root, schema0,
            Option(properties.get("maxversionspertrigger")).map(_.toLong),
            Option(properties.get("simulatecrashatversion")).map(_.toLong))
      }
    }
}

/** Offset = the highest fully-consumed commit version. */
private case class CdfOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private object CdfOffset {
  private val Re = """\{"version":(\d+)\}""".r
  def parse(json: String): CdfOffset = json.trim match {
    case Re(v) => CdfOffset(v.toLong)
    case other => throw new IllegalArgumentException(
      s"unparseable graft-cdf offset: $other")
  }
}

private class GraftCdfStream(root: String, fullSchema: StructType,
    maxVersionsPerTrigger: Option[Long], simulateCrashAtVersion: Option[Long])
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private val dataSchema = GraftCdf.dataSchema(fullSchema)
  /** AvailableNow horizon, pinned at prepare time so the drain is a
    * fixed target even while writers keep committing. */
  @volatile private var horizon: Option[Long] = None

  override def initialOffset(): Offset = CdfOffset(0L)
  override def prepareForTriggerAvailableNow(): Unit =
    horizon = Some(TableCommit.currentVersion(root).getOrElse(0L))
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control path")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CdfOffset]
    val cur = TableCommit.currentVersion(root).getOrElse(0L)
    // test-only crash seam (the X206 pattern): a "process death" at
    // this watermark — the checkpoint holds the committed prefix and
    // the restarted run must resume from it, not from zero
    simulateCrashAtVersion.foreach { at =>
      if (s.version >= at && s.version < horizon.getOrElse(cur))
        throw new IllegalStateException(
          s"simulated crash at version watermark ${s.version}")
    }
    val target = horizon.map(math.min(_, cur)).getOrElse(cur)
    val until = maxVersionsPerTrigger
      .map(span => math.min(s.version + span, target)).getOrElse(target)
    CdfOffset(math.max(until, s.version))
  }
  override def deserializeOffset(json: String): Offset =
    CdfOffset.parse(json)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[CdfOffset].version
    val until = end.asInstanceOf[CdfOffset].version
    if (from >= until) return Array.empty
    // same append-only + no-DV-delta contract as the batch feed —
    // enforced by readChanges' own checks, re-stated here at PLANNING
    // time so a rewrite version kills the stream loudly, never feeds a
    // half-truth downstream
    val chs = TableCommit.changesBetween(root, from, until)
    val nonAppend = chs.filter(_.removedPaths.nonEmpty)
    require(nonAppend.isEmpty,
      s"non-append version(s) ${nonAppend.map(_.version).mkString(", ")} " +
        s"in stream range ($from, $until] at $root — graft-cdf streams " +
        "the append-only feed; rewrites need the batch full feed")
    ((from + 1L) to until).foreach { v =>
      val prevDv = (if (v == 1L) Seq.empty[TableCommit.Entry]
                    else TableCommit.entriesAtVersion(root, v - 1L))
        .map(e => e.path -> TableCommit.deletedPositions(e)).toMap
      TableCommit.entriesAtVersion(root, v).foreach { e =>
        prevDv.get(e.path).foreach { before =>
          require(TableCommit.deletedPositions(e) == before,
            s"deletion-vector delta in version $v at $root — row " +
              "deletes aren't expressible in the append-only stream")
        }
      }
    }
    chs.flatMap { ch =>
      ch.added.map { e =>
        CdfFilePartition(
          if (e.path.startsWith("/")) e.path else s"$root/${e.path}",
          ch.version, dataSchema,
          TableCommit.deletedPositions(e).toArray): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftCdfReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One appended file of one version; `deleted` carries the file's
  * deletion-vector positions (a cloned-in file can arrive with one —
  * its dead rows were never content and must not stream). */
private case class CdfFilePartition(absPath: String, version: Long,
    dataSchema: StructType, deleted: Array[Long]) extends InputPartition

private object GraftCdfReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftCdfFileReader(p.asInstanceOf[CdfFilePartition])
}

/** Executor-side parquet reader: parquet-hadoop's Group API (the
  * read mirror of [[GraftDataWriter]]), emitting data columns + the
  * partition's commit version. Row position within the file is the
  * sequential read index — the same order `_metadata.row_index`
  * exposes — which is what the deletion-vector skip keys on. */
private class GraftCdfFileReader(p: CdfFilePartition)
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.example.data.Group

  private val reader: ParquetReader[Group] = {
    val path = new org.apache.hadoop.fs.Path(
      java.nio.file.Paths.get(p.absPath).toUri)
    ParquetReader.builder(new GroupReadSupport(), path)
      .withConf(new org.apache.hadoop.conf.Configuration())
      .build()
  }
  private val dead: java.util.HashSet[Long] = {
    val s = new java.util.HashSet[Long](p.deleted.length * 2 + 4)
    p.deleted.foreach(s.add(_))
    s
  }
  private var pos = -1L
  private var current: Group = _

  override def next(): Boolean = {
    var g = reader.read()
    pos += 1
    while (g != null && dead.contains(pos)) { g = reader.read(); pos += 1 }
    current = g
    g != null
  }

  override def get(): InternalRow = {
    val n = p.dataSchema.fields.length
    val vals = new Array[Any](n + 1)
    var i = 0
    while (i < n) {
      val f = p.dataSchema.fields(i)
      vals(i) =
        if (current.getFieldRepetitionCount(f.name) == 0) null
        else f.dataType match {
          case LongType    => current.getLong(f.name, 0)
          case IntegerType => current.getInteger(f.name, 0)
          case DoubleType  => current.getDouble(f.name, 0)
          case StringType  => UTF8String.fromString(
            current.getBinary(f.name, 0).toStringUsingUTF8)
          case other => throw new IllegalArgumentException(
            s"graft-cdf: unsupported type $other for column ${f.name}")
        }
      i += 1
    }
    vals(n) = p.version
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = reader.close()
}
