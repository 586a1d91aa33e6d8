package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

/** MERGE-semantics traps (SURVEY.md §1.3): the dimension upsert is
  * LAST-write-wins for updatable columns but keeps the target's first_seen
  * (/root/reference/src/snowflake_loader.py:86-104), while the fact load is
  * FIRST-write-wins — insert-only, re-collections never refresh
  * (/root/reference/azure-functions/function_app.py:465-481). */
class MergeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("dim merge: source wins updatable cols, target keeps first_seen") {
    val target = Seq((1L, "old-name", 10.0, "2024-01-01"))
      .toDF("key", "t_name", "t_acctbal", "t_first_seen")
    val source = Seq((1L, "new-name", 99.0, "2024-06-01"),
      (2L, "brand-new", 5.0, "2024-06-01"))
      .toDF("key", "s_name", "s_acctbal", "s_first_seen")
    val out = Joins.mergeUpsert(target, source).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3))))
      .toMap
    // matched row: updatable columns take the SOURCE value (last write wins)
    assert(out(1L) === (("new-name", 99.0, "2024-01-01")))
    // unmatched source row inserted with its own first_seen
    assert(out(2L) === (("brand-new", 5.0, "2024-06-01")))
  }

  test("dim merge: a NULL source write clears the field (last write wins)") {
    val target = Seq((1L, "old-name", 10.0, "2024-01-01"))
      .toDF("key", "t_name", "t_acctbal", "t_first_seen")
    val source = Seq((1L, Option.empty[String], Option.empty[Double], "2024-06-01"))
      .toDF("key", "s_name", "s_acctbal", "s_first_seen")
    val row = Joins.mergeUpsert(target, source).head()
    // MERGE UPDATE sets the column to the source value even when NULL —
    // a coalesce-based merge would silently keep the old values
    assert(row.isNullAt(1), "name must be cleared by the NULL write")
    assert(row.isNullAt(2), "acctbal must be cleared by the NULL write")
    assert(row.getString(3) === "2024-01-01", "first_seen stays first-write")
  }

  test("dim merge: target-only rows survive untouched") {
    val target = Seq((7L, "keep-me", 1.0, "2023-12-31"))
      .toDF("key", "t_name", "t_acctbal", "t_first_seen")
    val source = Seq((8L, "other", 2.0, "2024-06-01"))
      .toDF("key", "s_name", "s_acctbal", "s_first_seen")
    val out = Joins.mergeUpsert(target, source)
    assert(out.count() === 2)
    val kept = out.filter(col("key") === 7).head()
    assert(kept.getString(1) === "keep-me")
    assert(kept.getString(3) === "2023-12-31")
  }

  test("fact insert-only: first write wins, duplicates never refresh") {
    val target = Seq((1L, "v1"), (2L, "v1")).toDF("video_id", "payload")
    val batch = Seq((2L, "v2"), (3L, "v2")).toDF("video_id", "payload")
    val inserted = Joins.insertOnlyNew(batch, target, "video_id")
    // only the genuinely new key lands; key 2 keeps its original payload
    assert(inserted.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((3L, "v2")))
  }

  test("insert-only is idempotent: re-running the same batch inserts nothing") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("video_id", "payload")
    val after = target.union(
      Joins.insertOnlyNew(target, target, "video_id"))
    assert(after.count() === target.count())
  }
}
