package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.TableCommit

/** The DSv2 write facet (X239, `graft-table`): Spark's two-phase commit
  * protocol driven into the TableCommit log — version arithmetic,
  * truncate-overwrite, task-failure atomicity, staged-file cleanup. */
class TableWriteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def root(): String =
    Files.createTempDirectory("graft_tw_spec_").toString + "/t"

  private def write(df: org.apache.spark.sql.DataFrame, r: String,
      mode: String, opts: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("graft-table").option("root", r).mode(mode)
    opts.foreach { case (k, v) => w.option(k, v) }
    w.save()
  }

  test("append commits bump one version each and accumulate rows") {
    val r = root()
    write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), r, "append")
    assert(TableCommit.currentVersion(r) === Some(1L))
    write(Seq((3L, "c")).toDF("k", "v"), r, "append")
    assert(TableCommit.currentVersion(r) === Some(2L))
    assert(TableCommit.read(spark, r, schema)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    // row counts rode the commit messages into the manifest (X218)
    assert(TableCommit.entries(r).flatMap(_.rows).sum === 3L)
  }

  test("overwrite truncate-replaces the whole table in one swap") {
    val r = root()
    write(Seq((1L, "junk")).toDF("k", "v"), r, "append")
    write(Seq((7L, "x"), (8L, "y")).toDF("k", "v"), r, "overwrite")
    assert(TableCommit.read(spark, r, schema)
      .collect().map(_.getLong(0)).toSet === Set(7L, 8L))
    assert(TableCommit.currentVersion(r) === Some(2L))
  }

  test("a failing task aborts the whole job: no version, no visible rows, no staged debris") {
    val r = root()
    write(Seq((1L, "a")).toDF("k", "v"), r, "append")
    val before = TableCommit.entries(r).map(_.path).toSet
    intercept[Exception] {
      write(Seq((2L, "b"), (3L, "c")).toDF("k", "v").repartition(2), r,
        "append", Map("failatpartition" -> "1"))
    }
    // table unchanged — the failed job never published
    assert(TableCommit.currentVersion(r) === Some(1L))
    assert(TableCommit.read(spark, r, schema)
      .collect().map(_.getLong(0)).toSet === Set(1L))
    assert(TableCommit.entries(r).map(_.path).toSet === before)
    // and the aborted attempts' files are gone (task+job abort cleanup);
    // only the committed batch's directory remains under data/
    val dataDir = Paths.get(r, "data")
    val stray = {
      val s = Files.walk(dataDir)
      try {
        val it = s.iterator()
        val buf = scala.collection.mutable.ListBuffer.empty[java.nio.file.Path]
        while (it.hasNext) buf += it.next()
        buf.toList
      } finally s.close()
    }
    val live = before.map(p => Paths.get(r, p).toAbsolutePath)
    val strayFiles = stray.filter(p => Files.isRegularFile(p) &&
      p.getFileName.toString.endsWith(".parquet") &&
      !live.contains(p.toAbsolutePath))
    assert(strayFiles.isEmpty, s"aborted staged files survived: $strayFiles")
  }

  test("written files round-trip through Spark's parquet reader with full fidelity") {
    val r = root()
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("k", "v")
    write(df, r, "append")
    val got = TableCommit.read(spark, r, schema).collect()
      .map(row => (row.getLong(0),
        Option(row.getString(1)))).toSet
    assert(got === Set((1L, Some("a")), (2L, None), (3L, Some("c"))))
  }

  test("append-mode write with conflictretries rebases over a racing commit; overwrite stays strict (X273)") {
    val r = root()
    write(Seq((1L, "a")).toDF("k", "v"), r, "append")
    // the racing append lands inside the DSv2 commit's publish window
    TableCommit.publishRaceHook = () => {
      TableCommit.publishRaceHook = () => ()
      TableCommit.commitAppend(Seq((50L, "z")).toDF("k", "v"), r,
        retain = 8)
      ()
    }
    try write(Seq((2L, "b")).toDF("k", "v"), r, "append",
      Map("conflictretries" -> "4", "retain" -> "8"))
    finally TableCommit.publishRaceHook = () => ()
    assert(TableCommit.read(spark, r, schema)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 50L),
      "the rebased write must keep BOTH the racing and its own rows")
    assert(TableCommit.currentVersion(r) === Some(3L))
    // overwrite NEVER rebases — "become exactly this batch" read the
    // old state by definition
    TableCommit.publishRaceHook = () => {
      TableCommit.publishRaceHook = () => ()
      TableCommit.commitAppend(Seq((60L, "w")).toDF("k", "v"), r,
        retain = 8)
      ()
    }
    try {
      val e = intercept[Exception] {
        write(Seq((9L, "o")).toDF("k", "v"), r, "overwrite",
          Map("conflictretries" -> "4", "retain" -> "8"))
      }
      def hasConflict(t: Throwable): Boolean =
        t != null && (t.isInstanceOf[TableCommit.ConcurrentCommitException]
          || hasConflict(t.getCause))
      assert(hasConflict(e), s"expected a commit conflict, got $e")
    } finally TableCommit.publishRaceHook = () => ()
  }
}
