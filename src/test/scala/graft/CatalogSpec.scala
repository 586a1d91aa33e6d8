package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.TableCommit

/** X292 `GraftCatalog`: graft tables through pure Spark SQL — DDL
  * (CREATE/DROP/RENAME with create-exclusive schema claims), DML
  * (INSERT INTO/OVERWRITE via the DSv2 write, DELETE FROM via
  * deletion vectors with zero data bytes moved), and queries through
  * the X289 read facet. */
class CatalogSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog(): (String, String) = {
    val wh = Files.createTempDirectory("graft_cat_spec_").toString
    val cat = "graft_cat_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def dataFingerprint(root: String): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(Paths.get(root, "data"))
    try s.iterator().asScala.filter(Files.isRegularFile(_)).map { p =>
      p.toString -> (Files.size(p), Files.getLastModifiedTime(p).toMillis)
    }.toMap finally s.close()
  }

  test("DDL + DML + query round-trip through pure SQL") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING)")
    // duplicate CREATE loses the exclusive claim, loudly
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING)")
    }
    spark.range(100L).select(col("id").as("k"),
      concat(lit("v"), pmod(col("id"), lit(3L))).as("v"))
      .createOrReplaceTempView("cat_spec_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM cat_spec_src")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").collect()(0)
      .getLong(0) === 100L)
    // DELETE FROM is a deletion-vector commit: zero data bytes move
    val before = dataFingerprint(s"$wh/t")
    spark.sql(s"DELETE FROM $cat.t WHERE v = 'v1'")
    assert(dataFingerprint(s"$wh/t") === before,
      "SQL DELETE must not touch a single data byte")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t WHERE k >= 0")
      .collect()(0).getLong(0) === 67L)
    // INSERT OVERWRITE truncate-replaces
    spark.sql(s"INSERT OVERWRITE $cat.t SELECT * FROM cat_spec_src " +
      "WHERE k < 10")
    assert(spark.sql(s"SELECT SUM(k) FROM $cat.t WHERE k >= 0")
      .collect()(0).getLong(0) === 45L)
    spark.catalog.dropTempView("cat_spec_src")
  }

  test("catalog lifecycle: list, rename, drop; ALTER refuses") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.a (k BIGINT)")
    spark.sql(s"CREATE TABLE $cat.b (k BIGINT)")
    assert(spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSet === Set("a", "b"))
    spark.sql(s"ALTER TABLE $cat.a RENAME TO c")
    assert(Files.exists(Paths.get(wh, "c", "_schema.json")))
    assert(!Files.exists(Paths.get(wh, "a")))
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.c ADD COLUMN x BIGINT")
    }
    spark.sql(s"DROP TABLE $cat.c")
    assert(!Files.exists(Paths.get(wh, "c")))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM $cat.c")
    }
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF; TRUNCATE is metadata-only (X293)") {
    import java.nio.file.attribute.FileTime
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING)")
    spark.range(10L).select(col("id").as("k"), lit("a").as("v"))
      .createOrReplaceTempView("cat_tt_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM cat_tt_src") // v1
    spark.sql(s"INSERT INTO $cat.t SELECT k + 10, v FROM cat_tt_src") // v2
    spark.sql(s"DELETE FROM $cat.t WHERE k < 5") // v3
    def stamp(v: Long, t: Long): Unit =
      Files.setLastModifiedTime(Paths.get(wh, "t", "_log",
        f"v$v%020d.json"), FileTime.fromMillis(t))
    stamp(1L, 1000L); stamp(2L, 2000L); stamp(3L, 3000L)
    def n(sql: String): Long =
      spark.sql(sql).collect()(0).getLong(0)
    assert(n(s"SELECT COUNT(*) FROM $cat.t") === 15L)
    assert(n(s"SELECT COUNT(*) FROM $cat.t VERSION AS OF 1") === 10L)
    assert(n(s"SELECT COUNT(*) FROM $cat.t VERSION AS OF 2") === 20L)
    // TIMESTAMP AS OF resolves by manifest mtime (epoch 2.5 s → v2);
    // the deleted rows are visible again at that snapshot
    assert(n(s"SELECT COUNT(*) FROM $cat.t TIMESTAMP AS OF " +
      "'1970-01-01 00:00:02.5'") === 20L)
    assert(n(s"SELECT SUM(k) FROM $cat.t VERSION AS OF 1 WHERE k >= 0")
      === 45L)
    // TRUNCATE = one metadata-only empty commit
    spark.sql(s"TRUNCATE TABLE $cat.t")
    assert(n(s"SELECT COUNT(*) FROM $cat.t") === 0L)
    assert(graft.engine.TableCommit.entries(s"$wh/t").isEmpty)
    spark.catalog.dropTempView("cat_tt_src")
  }

  test("reserved names and nesting are refused: SQL can't reach table internals") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")
    // identifiers resolving into table internals are unnameable
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.t.data (k BIGINT)")
    }
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.`_tags` (k BIGINT)")
    }
    // a table cannot nest INSIDE another table's root
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.t.sub (k BIGINT)")
    }
    // an existing non-empty directory is never adopted
    Files.createDirectories(Paths.get(wh, "foreign"))
    Files.write(Paths.get(wh, "foreign", "x"), Array[Byte](1))
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.foreign (k BIGINT)")
    }
    assert(Files.exists(Paths.get(wh, "foreign", "x")),
      "the refused CREATE must leave foreign contents untouched")
  }

  test("DELETE with an untranslatable predicate fails loudly, table intact") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING)")
    spark.range(20L).select(col("id").as("k"), lit("x").as("v"))
      .createOrReplaceTempView("cat_spec_src2")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM cat_spec_src2")
    intercept[Exception] {
      spark.sql(s"DELETE FROM $cat.t WHERE k % 2 = 0") // no V1 Filter
    }
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").collect()(0)
      .getLong(0) === 20L, "a refused DELETE must change nothing")
    spark.catalog.dropTempView("cat_spec_src2")
  }
}
