package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.TableCommit

/** X284 version pins + multi-table snapshot tags: a named, durable
  * (table → version) set — the "dataset release" a training run cites
  * and reproduces. Contracts under test: a pinned version survives any
  * retention window (retire keeps its chain, vacuum keeps its files);
  * a tag resolves every member to its captured version; tag creation
  * is atomic (any member failure rolls all pins back, duplicate names
  * lose cleanly); dropping a tag releases retention; orphan pins
  * (crash debris) sweep behind tagGc's age gate. */
class SnapshotTagSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def wh(): String =
    Files.createTempDirectory("graft_tag_spec_").toString

  private def df(from: Long, until: Long) =
    spark.range(from, until).select(col("id").as("k"),
      (col("id") * 10L).as("v")).repartition(2)

  test("a pinned version survives retain=1 churn and vacuum(0)") {
    val w = wh()
    val r = s"$w/t"
    val v1 = TableCommit.commitOverwrite(df(0L, 30L), r, retain = 1)
    TableCommit.pinVersion(r, "release", v1)
    (1 to 5).foreach(i =>
      TableCommit.commitOverwrite(df(100L * i, 100L * i + 10L), r,
        retain = 1))
    TableCommit.vacuum(r, minAgeMs = 0L)
    val got = TableCommit.readAt(spark, r, schema, v1)
      .collect().map(_.getLong(0)).toSet
    assert(got === (0L until 30L).toSet,
      "pinned snapshot must stay readable past the retention window")
    // unpin → the next commit's retire + aged vacuum release it
    TableCommit.unpinVersion(r, "release")
    TableCommit.commitOverwrite(df(900L, 910L), r, retain = 1)
    TableCommit.vacuum(r, minAgeMs = 0L)
    assert(!Files.exists(Paths.get(r, "_log", f"v$v1%020d.json")),
      "an unpinned old version is ordinary retention fodder")
  }

  test("a tag captures a consistent multi-table snapshot") {
    val w = wh()
    val docs = s"$w/docs"
    val embs = s"$w/embs"
    TableCommit.commitOverwrite(df(0L, 20L), docs, retain = 1)
    TableCommit.commitOverwrite(df(0L, 20L), embs, retain = 1)
    val captured = TableCommit.tagCreateCurrent(w, "rel-1",
      Seq("docs", "embs"))
    assert(captured === Map("docs" -> 1L, "embs" -> 1L))
    // both tables move on — differently
    TableCommit.commitOverwrite(df(50L, 90L), docs, retain = 1)
    TableCommit.commitAppend(df(20L, 25L), embs, retain = 1)
    TableCommit.vacuum(docs, minAgeMs = 0L)
    TableCommit.vacuum(embs, minAgeMs = 0L)
    assert(TableCommit.tagTables(w, "rel-1") ===
      Map("docs" -> 1L, "embs" -> 1L))
    val d = TableCommit.readAtTag(spark, w, "rel-1", "docs", schema)
    val e = TableCommit.readAtTag(spark, w, "rel-1", "embs", schema)
    assert(d.join(e, "k").count() === 20L,
      "the tagged join must see both members at their captured versions")
    // non-member and missing tag fail loudly
    intercept[IllegalArgumentException] {
      TableCommit.readAtTag(spark, w, "rel-1", "nope", schema)
    }
    intercept[IllegalArgumentException] {
      TableCommit.tagTables(w, "rel-9")
    }
  }

  test("tag creation is atomic: member failure rolls back all pins") {
    val w = wh()
    val r = s"$w/a"
    val v1 = TableCommit.commitOverwrite(df(0L, 10L), r, retain = 1)
    // second member's version does not exist → the whole tag fails
    intercept[IllegalArgumentException] {
      TableCommit.tagCreate(w, "bad", Map("a" -> v1, "missing" -> 7L))
    }
    assert(TableCommit.pinnedVersions(r).isEmpty,
      "a failed tag must leave no pins behind")
    assert(!Files.exists(Paths.get(w, "_tags", "bad")))
    // duplicate tag names lose cleanly and roll back their own pins
    TableCommit.tagCreate(w, "rel", Map("a" -> v1))
    val e = intercept[IllegalStateException] {
      TableCommit.tagCreate(w, "rel", Map("a" -> v1))
    }
    assert(e.getMessage.contains("already exists"))
    assert(TableCommit.pinnedVersions(r).size === 1,
      "the losing creator must not disturb the winner's pin")
  }

  test("tagDrop releases retention; tagGc sweeps aged orphan pins") {
    val w = wh()
    val r = s"$w/t"
    val v1 = TableCommit.commitOverwrite(df(0L, 10L), r, retain = 1)
    TableCommit.tagCreate(w, "rel", Map("t" -> v1))
    TableCommit.tagDrop(w, "rel")
    assert(TableCommit.pinnedVersions(r).isEmpty)
    TableCommit.tagDrop(w, "rel") // idempotent
    // orphan pin (simulated crash between pin and tag file): young →
    // kept, aged → swept; a NON-tag pin is never touched
    TableCommit.pinVersion(r, "tag-ghost", v1)
    TableCommit.pinVersion(r, "keep-forever", v1)
    TableCommit.tagGc(w, minAgeMs = 3600000L)
    assert(TableCommit.pinnedVersions(r).keySet ===
      Set("tag-ghost", "keep-forever"))
    TableCommit.tagGc(w, minAgeMs = 0L)
    assert(TableCommit.pinnedVersions(r).keySet === Set("keep-forever"))
  }

  test("vacuum restores aged retire trash (crash recovery = undo)") {
    val w = wh()
    val r = s"$w/t"
    TableCommit.commitOverwrite(df(0L, 10L), r, retain = 4)
    TableCommit.commitOverwrite(df(10L, 20L), r, retain = 4)
    // simulate a retire pass that crashed between trash and confirm
    val m = Paths.get(r, "_log", f"v${1L}%020d.json")
    val t = m.resolveSibling(s".trash-${m.getFileName}")
    Files.move(m, t)
    intercept[Exception] {
      TableCommit.readAt(spark, r, schema, 1L) // trashed = not retained
    }
    // a YOUNG trash freezes vacuum's sweeps and is left alone
    TableCommit.vacuum(r, minAgeMs = 3600000L)
    assert(Files.exists(t))
    // an AGED trash restores to its original name — undo, not delete
    TableCommit.vacuum(r, minAgeMs = 0L)
    assert(Files.exists(m) && !Files.exists(t))
    assert(TableCommit.readAt(spark, r, schema, 1L).count() === 10L)
  }

  test("pin name exclusivity and validation") {
    val w = wh()
    val r = s"$w/t"
    val v1 = TableCommit.commitOverwrite(df(0L, 10L), r, retain = 1)
    TableCommit.pinVersion(r, "p", v1)
    intercept[IllegalStateException] {
      TableCommit.pinVersion(r, "p", v1)
    }
    intercept[IllegalArgumentException] {
      TableCommit.pinVersion(r, "a/b", v1)
    }
    intercept[IllegalArgumentException] {
      TableCommit.pinVersion(r, "p2", v1 + 99L) // not retained
    }
  }
}
