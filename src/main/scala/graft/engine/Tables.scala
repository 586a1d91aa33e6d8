package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness-provided parquet tables (see /root/repo/TESTDATA.md).
  *
  * Every operator in the engine takes `(SparkSession, sfDir)` and reads through
  * here, so scans stay declarative: Catalyst handles column pruning and filter
  * pushdown into the parquet reader, and at cluster scale the same code picks
  * up splittable multi-file layouts without change.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Identifier-safe tag for sfDir-keyed table/fixture names. Lower-cased
    * up front because Spark's catalog folds identifiers case-insensitively.
    * Distinct for any two dirs that differ in an alphanumeric — unlike a
    * 32-bit hashCode, which collides on arbitrary unrelated paths (and
    * whose abs(Int.MinValue) is negative, an illegal identifier). Dirs
    * differing ONLY in substituted punctuation (a/sf0.1 vs a/sf0_1) still
    * fold together — don't run those concurrently in one session. */
  def sfTag(sfDir: String): String =
    sfDir.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9]", "_")

  def region(spark: SparkSession, d: String): DataFrame    = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = table(spark, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) (read as a nanos long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set at session build in
    * Verify/Bench/tests) and parquet TIMESTAMP(MICROS) (read as Spark
    * TIMESTAMP_NTZ). Normalize either to the engine's ONE ts contract —
    * TIMESTAMP (LTZ) at microsecond precision — so operators never see the
    * file encoding. Same instants either way: the nanos `div` truncation
    * equals floor for the post-epoch data the harness generates (min ts
    * 2024-01-01) and matches DuckDB's nanos→µs truncation, and the NTZ→LTZ
    * cast is identity under the fixed UTC session timezone (DuckDB reads
    * MICROS natively, so the oracle side is unchanged too). */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _                => df
  }

  def events(spark: SparkSession, d: String): DataFrame =
    normalizeTs(table(spark, d, "events"))
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
