package graft.engine

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Minimal copy-on-write table format: versioned file manifests + an
  * atomic-rename pointer swap, so multi-file table rewrites get the
  * all-or-nothing commit the reference delegates to its warehouse
  * (MERGE at /root/reference/src/snowflake_loader.py:86-104; per-step
  * commit/rollback at
  * /root/reference/azure-functions/function_app.py:304-355).
  *
  * Layout under a table root:
  * {{{
  *   _log/v<20-digit>.json   one manifest per committed version; each line
  *                           is {"path": "<root-relative file>", "part":
  *                           "<partition dir segment>"|null}
  *   data/b_<uuid>/...       immutable data-file batches, one per commit
  * }}}
  *
  * The COMMITTED state is "the manifest with the highest version number".
  * A commit (a) writes a fresh batch directory — never touching live
  * files, so readers of version N and the in-flight writer share nothing —
  * then (b) publishes by atomically renaming a staged manifest to
  * `v<N+1>.json`. A crash before (b) leaves an orphan batch that no
  * manifest references: readers still see version N, a rerun republishes
  * from scratch, and the next successful commit's retention pass deletes
  * the orphan. This is exactly the generation discipline the streaming
  * CDC upsert pioneered (write successor snapshot, atomically adopt,
  * retire predecessor), promoted to a reusable utility.
  *
  * Partitioned tables keep the partition column IN the data files and
  * mirror it into the `_p=<value>` directory layout only to track which
  * files belong to which slice — manifest pruning happens at file-LISTING
  * time ([[readPruned]]), the table-format analogue of the S2 filename
  * predicate, and reads never depend on Hive directory inference.
  *
  * Scale/portability notes (the 100 TB design point):
  *   - The manifest is one small line per FILE, listed once per commit —
  *     no directory walking on read, which is what makes object-store
  *     tables plannable (a LIST of 100k files per query is not).
  *   - Atomic rename is the commit primitive; it holds on local FS and
  *     HDFS. An object store without atomic rename needs a conditional
  *     PUT or a catalog CAS on the version pointer — the `publish` seam
  *     is where that swap would go.
  *   - Retention defaults to minimal (current version only, the
  *     predecessor dies at publish): SINGLE WRITER, and readers re-resolve
  *     the pointer per query. Commits accept `retain = N` to keep the
  *     last N snapshots live — [[readAt]] then time-travels to any
  *     retained version (what production formats call snapshot
  *     isolation / VERSION AS OF); files referenced by NO retained
  *     manifest are still swept.
  */
object TableCommit {

  /** One committed data file: root-relative path + the `_p=` directory
    * segment it was written under (None for unpartitioned commits). */
  final case class Entry(path: String, part: Option[String])

  private def logDir(root: String): Path = Paths.get(root, "_log")

  private val VersionRe = "v(\\d{20})\\.json".r

  /** Highest committed version, or None for a never-committed root. */
  def currentVersion(root: String): Option[Long] = {
    val dir = logDir(root)
    if (!Files.isDirectory(dir)) return None
    val vs = Files.list(dir).iterator().asScala
      .flatMap(p => p.getFileName.toString match {
        case VersionRe(d) => Some(d.toLong)
        case _            => None
      }).toSeq
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Committed file list of the current version (empty if none). */
  def entries(root: String): Seq[Entry] = currentVersion(root) match {
    case None    => Seq.empty
    case Some(v) => readManifest(root, v)
  }

  private def manifestPath(root: String, v: Long): Path =
    logDir(root).resolve(f"v$v%020d.json")

  private def readManifest(root: String, v: Long): Seq[Entry] = {
    val PartRe = """\{"path": "([^"]*)", "part": (null|"([^"]*)")\}""".r
    Files.readAllLines(manifestPath(root, v)).asScala.toSeq.collect {
      case PartRe(path, p, value) =>
        Entry(path, if (p == "null") None else Some(value))
    }
  }

  /** Stage a new immutable batch directory for `df` WITHOUT publishing it
    * — the first half of a commit. Returns the staged entries. Exposed
    * `private[graft]` so the crash test can model "process died between
    * the data write and the pointer swap".
    *
    * Partitioned staging duplicates `partCol` into a `_p` column consumed
    * by `partitionBy`, so the real column survives inside the files and
    * the directory layout still names each slice. */
  private[graft] def stageBatch(df: DataFrame, root: String,
      partCol: Option[String] = None): Seq[Entry] = {
    val batch = s"data/b_${UUID.randomUUID().toString.replace("-", "")}"
    val dest = s"$root/$batch"
    partCol match {
      case Some(c) =>
        df.withColumn("_p", col(c)).write.partitionBy("_p").parquet(dest)
      case None =>
        df.write.parquet(dest)
    }
    val base = Paths.get(dest)
    Files.walk(base).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val rel = base.relativize(p).toString
        // stored part value = the dir segment minus the "_p=" marker, still
        // in Spark's escaped-dir-name form — both the replace set and the
        // pruning predicate see the same encoding, so matching is exact.
        val part = rel.split('/').find(_.startsWith("_p=")).map(_.drop(3))
        Entry(s"$batch/$rel", part)
      }.toSeq.sortBy(_.path)
  }

  /** Publish `newEntries` as the next version: stage the manifest to a
    * temp name, atomically rename it onto `v<N+1>.json`, then retire
    * everything the new version no longer references. The rename IS the
    * commit point — before it, readers resolve N; after it, N+1. */
  private[graft] def publish(root: String, newEntries: Seq[Entry],
      retain: Int = 1): Long = {
    val next = currentVersion(root).getOrElse(0L) + 1L
    Files.createDirectories(logDir(root))
    // Minimal JSON writer: paths are uuid/part-file names and parts are
    // partition values — escape the two JSON-active characters anyway so
    // a hostile partition value cannot corrupt the manifest.
    def js(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val body = newEntries.map(e =>
      s"""{"path": ${js(e.path)}, "part": ${e.part.map(js).getOrElse("null")}}""")
      .mkString("", "\n", "\n")
    val tmp = logDir(root).resolve(s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, body)
    try Files.move(tmp, manifestPath(root, next), StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp)
      throw new IllegalStateException(
        s"concurrent commit detected at $root v$next — TableCommit is single-writer")
    }
    retire(root, next, retain.max(1))
    next
  }

  /** Delete manifests older than the retention window and every data file
    * no RETAINED version references (covers both retired predecessors and
    * orphan batches from crashed commits), then prune empty directories.
    * Best-effort: a crash mid-retire leaves garbage the NEXT commit
    * removes, never a broken table. */
  private def retire(root: String, current: Long, retain: Int): Unit = {
    try {
      val oldest = current - retain + 1
      Files.list(logDir(root)).iterator().asScala.toSeq.foreach { p =>
        p.getFileName.toString match {
          case VersionRe(d) if d.toLong < oldest => Files.deleteIfExists(p)
          case n if n.startsWith(".tmp-")        => Files.deleteIfExists(p)
          case _                                 => ()
        }
      }
      val live = (oldest to current).flatMap { v =>
        try readManifest(root, v) catch { case _: Throwable => Seq.empty }
      }
      val dataDir = Paths.get(root, "data")
      if (Files.isDirectory(dataDir)) {
        val keep = live.map(e => Paths.get(root, e.path).toAbsolutePath).toSet
        val all = Files.walk(dataDir).iterator().asScala.toSeq
        all.filter(p => Files.isRegularFile(p) &&
            !keep.contains(p.toAbsolutePath))
          .foreach(p => Files.deleteIfExists(p))
        // empty dirs, deepest first
        all.filter(Files.isDirectory(_)).sortBy(-_.getNameCount)
          .foreach(p => try Files.delete(p) catch { case _: Throwable => () })
      }
    } catch { case _: Throwable => () }
  }

  /** Full-table replace: new snapshot's files are exactly this batch.
    * `retain` > 1 keeps that many trailing snapshots readable via
    * [[readAt]]. */
  def commitOverwrite(df: DataFrame, root: String, retain: Int = 1): Long =
    publish(root, stageBatch(df, root), retain)

  /** Insert-only append: new snapshot = predecessor's files + this batch.
    * Nothing is rewritten, so the J3 anti-join's build side can read the
    * live table while the batch stages — the files it reads are immutable
    * and stay referenced. */
  def commitAppend(df: DataFrame, root: String, retain: Int = 1): Long = {
    val staged = stageBatch(df, root)
    publish(root, entries(root) ++ staged, retain)
  }

  /** D1 partition-slice replace: slices present in `df` swap wholesale,
    * untouched slices carry their existing files forward. The replaced
    * set is derived from the staged batch's own `_p=` directories, so
    * "which slices does this load touch" is data-driven, never guessed. */
  def commitReplacePartitions(df: DataFrame, root: String,
      partCol: String): Long = {
    val staged = stageBatch(df, root, Some(partCol))
    val replaced = staged.flatMap(_.part).toSet
    val kept = entries(root).filterNot(_.part.exists(replaced))
    publish(root, kept ++ staged)
  }

  /** Read the current version; empty-with-schema for a virgin root (the
    * readOrEmpty idiom the MERGE bootstrap needs). */
  def read(spark: SparkSession, root: String, schema: StructType): DataFrame =
    entries(root) match {
      case Seq() =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case es =>
        spark.read.schema(schema).parquet(es.map(e => s"$root/${e.path}"): _*)
    }

  /** Time-travel read: the table AS OF `version`. The version must still
    * be inside the retention window its commits were made with —
    * manifests outside it are gone (that is what retention means), and
    * the error says so rather than returning an empty frame. */
  def readAt(spark: SparkSession, root: String, schema: StructType,
      version: Long): DataFrame = {
    require(Files.exists(manifestPath(root, version)),
      s"version $version not retained at $root " +
        s"(current: ${currentVersion(root).getOrElse(-1L)})")
    val es = readManifest(root, version)
    if (es.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else
      spark.read.schema(schema).parquet(es.map(e => s"$root/${e.path}"): _*)
  }

  /** Read the current version, inferring the schema (requires at least one
    * committed version — the streaming upsert always bootstraps one). */
  def readCurrent(spark: SparkSession, root: String): DataFrame = {
    val es = entries(root)
    require(es.nonEmpty, s"no committed version at $root")
    spark.read.parquet(es.map(e => s"$root/${e.path}"): _*)
  }

  /** Manifest-pruned read: keep only files whose partition-dir segment
    * passes `keep` — file-listing-time pruning from table metadata, no
    * directory walk, no post-scan filter. Unpartitioned files (part =
    * None) always survive. */
  def readPruned(spark: SparkSession, root: String, schema: StructType)(
      keep: String => Boolean): DataFrame = {
    val es = entries(root).filter(_.part.forall(keep))
    if (es.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else
      spark.read.schema(schema).parquet(es.map(e => s"$root/${e.path}"): _*)
  }
}
