package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.engine.TableCommit

/** X304: `DESCRIBE HISTORY` through PURE SQL — a table-valued
  * function over the X282 commit-history introspection:
  *
  * {{{
  *   SELECT version, kind, n_added, n_removed, dv_grown, txn, rid_hw,
  *          mapped
  *   FROM graft_history('/data/wh/events')
  *   ORDER BY version DESC
  * }}}
  *
  * The walk is manifest-only ([[TableCommit.history]]: one incremental
  * diff pass + one header read per retained version; no data files
  * touched), evaluated at PLANNING time into a [[LocalRelation]] — the
  * natural shape for a metadata report whose size is the RETENTION
  * WINDOW, never the table. Registered by [[GraftExtensions]] beside
  * the scalar natives, so any SQL session with the extension sees it. */
object GraftHistoryTvf {
  private val schema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_added", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("dv_grown", LongType, nullable = false),
    StructField("txn", LongType, nullable = true),
    StructField("rid_hw", LongType, nullable = true),
    StructField("mapped", BooleanType, nullable = false)))

  private def build(args: Seq[Expression]): LogicalPlan = {
    val root = args match {
      case Seq(Literal(s: UTF8String, StringType)) if s != null =>
        s.toString
      case _ => throw new IllegalArgumentException(
        "graft_history takes exactly one STRING literal: the table " +
          "root path, e.g. graft_history('/data/wh/events')")
    }
    val attrs: Seq[Attribute] = schema.fields.toIndexedSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
    val rows = TableCommit.history(root).map { i =>
      InternalRow.fromSeq(Seq(
        i.version, UTF8String.fromString(i.kind), i.added, i.removed,
        i.dvGrown, i.txn.map(Long.box).orNull,
        i.ridHighWater.map(Long.box).orNull, i.mapped))
    }
    LocalRelation(attrs, rows)
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq((
    FunctionIdentifier("graft_history"),
    new ExpressionInfo(getClass.getName, "graft_history"),
    build _))
}
