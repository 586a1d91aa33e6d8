package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D1 slice-replacement semantics: dynamic partition overwrite rewrites ONLY
  * the partitions present in the incoming batch and leaves every other
  * partition untouched (the reference's DELETE-today-then-reinsert refresh,
  * /root/reference/src/snowflake_loader.py:136-155). */
class PartitionSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String = {
    val p: Path = Files.createTempDirectory("graft_sink_spec_")
    p.toFile.deleteOnExit()
    p.toString + "/t"
  }

  test("dynamic overwrite replaces only the written slice") {
    val path = freshDir()
    Seq((1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c"))
      .toDF("id", "day", "v")
      .write.partitionBy("day").parquet(path)
    // refresh day d2 only, with different content
    Seq((9, "d2", "refreshed")).toDF("id", "day", "v")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(path)
    val back = spark.read.parquet(path)
    // d1 survived byte-for-byte; d2 was fully replaced
    assert(back.filter(col("day") === "d1").select("id", "v")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
      === Set((1, "a"), (2, "b")))
    assert(back.filter(col("day") === "d2").select("id", "v")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
      === Set((9, "refreshed")))
  }

  test("static overwrite (the default) would drop other partitions — guard") {
    val path = freshDir()
    Seq((1, "d1", "a"), (2, "d2", "b")).toDF("id", "day", "v")
      .write.partitionBy("day").parquet(path)
    Seq((9, "d2", "x")).toDF("id", "day", "v")
      .write.mode("overwrite") // no dynamic option: whole-table semantics
      .partitionBy("day").parquet(path)
    assert(spark.read.parquet(path).count() === 1)
  }

  test("re-running the same slice refresh is idempotent") {
    val path = freshDir()
    val full = Seq((1, "d1", "a"), (3, "d2", "c")).toDF("id", "day", "v")
    full.write.partitionBy("day").parquet(path)
    val refresh = Seq((3, "d2", "c")).toDF("id", "day", "v")
    refresh.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").partitionBy("day").parquet(path)
    refresh.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").partitionBy("day").parquet(path)
    val back = spark.read.parquet(path).select("id", "v")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(back === Set((1, "a"), (3, "c")))
  }
}
