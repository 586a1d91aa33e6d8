package graft.plans

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._
import graft.engine.TableCommit

/** X307 (VERDICT r14 task 3): SQL MAINTENANCE VERBS — the OPTIMIZE /
  * VACUUM surface a SQL-only session was missing. A session that can
  * CREATE/INSERT/UPDATE/MERGE/DELETE/ALTER and audit history (X304)
  * can now also maintain, through the same table-valued-function
  * spelling:
  *
  * {{{
  *   SELECT * FROM graft_melt('/data/wh/events', 0.2)      -- targeted
  *   SELECT * FROM graft_compact('/data/wh/events', 8)     -- full rewrite
  *   SELECT * FROM graft_vacuum('/data/wh/events', 0)      -- orphan sweep
  * }}}
  *
  * Each returns a ONE-ROW report relation. Unlike [[GraftHistoryTvf]]
  * (a read-only metadata walk, evaluated at planning time), these have
  * SIDE EFFECTS — so each resolves to a [[LeafRunnableCommand]], the
  * Catalyst node class whose execution Spark defers to statement run
  * time and caches per statement: `EXPLAIN` over one plans without
  * melting anything, and one SQL statement runs its maintenance action
  * exactly once.
  *
  * Tracked tables (row-id lineage) melt/compact with
  * `preserveRowIds = true` automatically, exactly like the Scala API's
  * recommended posture — SQL maintenance never severs lineage.
  *
  * Scale: the verbs inherit their engine paths' shapes — `graft_melt`
  * rewrites only the files whose dead fraction exceeds the threshold
  * (damage-proportional, the X279 contract), `graft_compact` is the
  * whole-snapshot rewrite it says it is, and `graft_vacuum` is a
  * listing-time sweep that never reads data pages. */
object GraftMaintenanceTvf {

  private def str(fn: String, e: Expression, what: String): String =
    e match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType)
          if s != null => s.toString
      case _ => throw new IllegalArgumentException(
        s"$fn: $what must be a STRING literal")
    }

  private def num(fn: String, e: Expression, what: String): Double =
    e match {
      case Literal(v, _: NumericType) if v != null => v match {
        case d: Decimal => d.toDouble
        case n: Number  => n.doubleValue()
        case _ => throw new IllegalArgumentException(
          s"$fn: $what must be a numeric literal")
      }
      case _ => throw new IllegalArgumentException(
        s"$fn: $what must be a numeric literal")
    }

  private def attrs(fields: (String, DataType)*): Seq[Attribute] =
    fields.map { case (n, t) => AttributeReference(n, t, nullable = false)() }

  /** `graft_melt('<root>', maxDeadRatio[, targetFiles])` →
    * [[TableCommit.commitMeltDeleted]]: rewrite only the files whose
    * deleted fraction exceeds the ratio. Report: the resulting version
    * (unchanged when nothing was fat enough), file counts before and
    * after, and how many files were melted away. */
  private def meltBuild(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2 || args.size == 3,
      "graft_melt takes (root STRING, maxDeadRatio DOUBLE" +
        "[, targetFiles INT]) — e.g. graft_melt('/wh/t', 0.2)")
    GraftMeltCommand(str("graft_melt", args.head, "root"),
      num("graft_melt", args(1), "maxDeadRatio"),
      if (args.size == 3) num("graft_melt", args(2), "targetFiles").toInt
      else 0)
  }

  /** `graft_compact('<root>', targetFiles)` →
    * [[TableCommit.commitCompact]]: the whole-snapshot rewrite (melts
    * every DV away, coalesces small files). */
  private def compactBuild(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2,
      "graft_compact takes (root STRING, targetFiles INT) — e.g. " +
        "graft_compact('/wh/t', 8)")
    GraftCompactCommand(str("graft_compact", args.head, "root"),
      num("graft_compact", args(1), "targetFiles").toInt)
  }

  /** `graft_vacuum('<root>'[, minAgeMs])` → [[TableCommit.vacuum]]:
    * sweep unreferenced data files and crashed-commit debris older
    * than the age gate (default 1 h — pass 0 only when no commit can
    * be in flight). Report: files swept. */
  private def vacuumBuild(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1 || args.size == 2,
      "graft_vacuum takes (root STRING[, minAgeMs BIGINT]) — e.g. " +
        "graft_vacuum('/wh/t')")
    GraftVacuumCommand(str("graft_vacuum", args.head, "root"),
      if (args.size == 2) num("graft_vacuum", args(1), "minAgeMs").toLong
      else 3600000L)
  }

  /** `graft_cluster('<root>', targetFiles, 'xCol', 'yCol'[, zBits])` →
    * [[TableCommit.commitCluster]]: Z-ORDER the snapshot on two
    * dimensions (Delta's `OPTIMIZE … ZORDER BY`) — column names are
    * the table's PHYSICAL names, exactly like every root-addressed
    * verb. */
  private def clusterBuild(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 4 || args.size == 5,
      "graft_cluster takes (root STRING, targetFiles INT, xCol " +
        "STRING, yCol STRING[, zBits INT]) — e.g. " +
        "graft_cluster('/wh/t', 8, 'x', 'y')")
    GraftClusterCommand(str("graft_cluster", args.head, "root"),
      num("graft_cluster", args(1), "targetFiles").toInt,
      str("graft_cluster", args(2), "xCol"),
      str("graft_cluster", args(3), "yCol"),
      if (args.size == 5) num("graft_cluster", args(4), "zBits").toInt
      else 8)
  }

  /** `graft_restore('<root>', version)` → [[TableCommit
    * .commitRestore]]: the operational UNDO — the next version carries
    * the retained target version's exact file list, metadata-only
    * (X283; high-waters never rewind, CDC emits the resurrections). */
  private def restoreBuild(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2,
      "graft_restore takes (root STRING, version BIGINT) — e.g. " +
        "graft_restore('/wh/t', 42)")
    GraftRestoreCommand(str("graft_restore", args.head, "root"),
      num("graft_restore", args(1), "version").toLong)
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    (FunctionIdentifier("graft_melt"),
      new ExpressionInfo(getClass.getName, "graft_melt"), meltBuild _),
    (FunctionIdentifier("graft_compact"),
      new ExpressionInfo(getClass.getName, "graft_compact"),
      compactBuild _),
    (FunctionIdentifier("graft_vacuum"),
      new ExpressionInfo(getClass.getName, "graft_vacuum"),
      vacuumBuild _),
    (FunctionIdentifier("graft_cluster"),
      new ExpressionInfo(getClass.getName, "graft_cluster"),
      clusterBuild _),
    (FunctionIdentifier("graft_restore"),
      new ExpressionInfo(getClass.getName, "graft_restore"),
      restoreBuild _))

  /** EVERY regular file under the root — data, log debris, sidecars —
    * so the vacuum report counts the log-directory sweeps too (review
    * finding: a data-only walk reported `swept = 0` from a vacuum that
    * removed crashed-commit `.tmp-` debris). */
  private[plans] def fileCount(root: String): Long = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return 0L
    val s = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.count(Files.isRegularFile(_)).toLong
    } finally s.close()
  }

  /** Retention for a maintenance publish: wide enough to preserve
    * every currently-retained version WHATEVER the table's writers
    * use (review finding: a hardcoded 64 could retire history a
    * higher-retain catalog kept), floored at the catalog default. */
  private[plans] def keepRetain(root: String): Int =
    math.max(64, TableCommit.retainAll(root))

  /** Files the maintenance commit REWROTE = paths that left the
    * manifest (review finding: a net file-count delta reports 0 for a
    * 1:1 melt that did rewrite every fat file). */
  private[plans] def rewrittenCount(before: Seq[TableCommit.Entry],
      after: Seq[TableCommit.Entry]): Long = {
    val kept = after.map(_.path).toSet
    before.count(e => !kept.contains(e.path)).toLong
  }

  private[plans] val reportAttrs: Seq[Attribute] = attrs(
    "version" -> LongType, "files_before" -> LongType,
    "files_after" -> LongType, "rewritten" -> LongType)
}

case class GraftMeltCommand(root: String, maxDeadRatio: Double,
    targetFiles: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenanceTvf.reportAttrs
  override def run(spark: SparkSession): Seq[Row] = {
    val before = TableCommit.entries(root)
    val layout = graft.sources.GraftCatalog.partitionLayoutOf(root)
    val v = TableCommit.commitMeltDeleted(spark, root, maxDeadRatio,
      targetFiles = targetFiles,
      retain = GraftMaintenanceTvf.keepRetain(root),
      preserveRowIds = TableCommit.isTracked(root),
      partCol = layout.collect {
        case (c, graft.sources.GraftRotate.Identity) => c },
      bucketSpec = layout.collect {
        case (c, graft.sources.GraftRotate.Bucket(n)) => (c, n) })
    val after = TableCommit.entries(root)
    Seq(Row(v, before.size.toLong, after.size.toLong,
      GraftMaintenanceTvf.rewrittenCount(before, after)))
  }
}

case class GraftCompactCommand(root: String, targetFiles: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenanceTvf.reportAttrs
  override def run(spark: SparkSession): Seq[Row] = {
    val before = TableCommit.entries(root)
    // X318/X321: a partitioned table's compact preserves its layout —
    // the rewrite stages per value (identity) or per bucket, so the
    // X314 SPJ proof survives OPTIMIZE
    val layout = graft.sources.GraftCatalog.partitionLayoutOf(root)
    val v = TableCommit.commitCompact(spark, root, targetFiles,
      retain = GraftMaintenanceTvf.keepRetain(root),
      preserveRowIds = TableCommit.isTracked(root),
      partCol = layout.collect {
        case (c, graft.sources.GraftRotate.Identity) => c },
      bucketSpec = layout.collect {
        case (c, graft.sources.GraftRotate.Bucket(n)) => (c, n) })
    val after = TableCommit.entries(root)
    Seq(Row(v, before.size.toLong, after.size.toLong,
      GraftMaintenanceTvf.rewrittenCount(before, after)))
  }
}

case class GraftClusterCommand(root: String, targetFiles: Int,
    xCol: String, yCol: String, zBits: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenanceTvf.reportAttrs
  override def run(spark: SparkSession): Seq[Row] = {
    val before = TableCommit.entries(root)
    val v = TableCommit.commitCluster(spark, root, targetFiles,
      xCol, yCol, retain = GraftMaintenanceTvf.keepRetain(root),
      zBits = zBits, preserveRowIds = TableCommit.isTracked(root))
    val after = TableCommit.entries(root)
    Seq(Row(v, before.size.toLong, after.size.toLong,
      GraftMaintenanceTvf.rewrittenCount(before, after)))
  }
}

case class GraftRestoreCommand(root: String, version: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenanceTvf.reportAttrs
  override def run(spark: SparkSession): Seq[Row] = {
    val before = TableCommit.entries(root)
    val v = TableCommit.commitRestore(root, version,
      retain = GraftMaintenanceTvf.keepRetain(root))
    val after = TableCommit.entries(root)
    Seq(Row(v, before.size.toLong, after.size.toLong,
      GraftMaintenanceTvf.rewrittenCount(before, after)))
  }
}

case class GraftVacuumCommand(root: String, minAgeMs: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("swept", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val before = GraftMaintenanceTvf.fileCount(root)
    TableCommit.vacuum(root, minAgeMs)
    val after = GraftMaintenanceTvf.fileCount(root)
    Seq(Row(math.max(0L, before - after)))
  }
}
