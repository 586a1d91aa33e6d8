package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.engine.TableCommit

/** X319: `DESCRIBE DETAIL` at FILE granularity through pure SQL — a
  * table-valued function over the current snapshot's manifest:
  *
  * {{{
  *   SELECT part_value, SUM(rows) AS n_rows, SUM(deleted) AS n_dead
  *   FROM graft_files('/data/wh/events') GROUP BY 1 ORDER BY 1
  * }}}
  *
  * One row per LIVE file: its manifest path, the partition value it is
  * provably single-valued on (the declared partition column's
  * min == max stat for X316 tables, or the partitioned-staging dir
  * value; NULL when neither pins it), its birth row count, its
  * deletion-vector count, and how many user columns carry stats. The
  * walk is manifest-only, evaluated at PLANNING time into a
  * [[LocalRelation]] — a metadata report sized by the FILE COUNT,
  * never the data (the operator's view of layout health: file sizes
  * skewing, DV fat accumulating, a partition value fragmenting). */
object GraftFilesTvf {
  private val schema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("part_value", StringType, nullable = true),
    StructField("rows", LongType, nullable = true),
    StructField("deleted", LongType, nullable = false),
    StructField("n_stats", IntegerType, nullable = false)))

  private def build(args: Seq[Expression]): LogicalPlan = {
    val root = args match {
      case Seq(Literal(s: UTF8String, StringType)) if s != null =>
        s.toString
      case _ => throw new IllegalArgumentException(
        "graft_files takes exactly one STRING literal: the table " +
          "root path, e.g. graft_files('/data/wh/events')")
    }
    val attrs: Seq[Attribute] = schema.fields.toIndexedSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
    val partCol = graft.sources.GraftCatalog.partitionColOf(root)
    val rows = TableCommit.entries(root).map { e =>
      val pv = partCol
        .flatMap(c => e.stats.get(c))
        .collect { case cs if cs.min == cs.max => cs.min }
        .orElse(e.part)
      InternalRow.fromSeq(Seq(
        UTF8String.fromString(e.path),
        pv.map(UTF8String.fromString).orNull,
        e.rows.map(Long.box).orNull,
        TableCommit.deletedCount(e),
        e.stats.keys.count(k => !k.contains(":"))))
    }
    LocalRelation(attrs, rows)
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq((
    FunctionIdentifier("graft_files"),
    new ExpressionInfo(getClass.getName, "graft_files"),
    build _))
}
