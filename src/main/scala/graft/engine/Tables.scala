package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

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

  /** Identifier-safe tag for sfDir-keyed table/fixture names. Injective on
    * path content modulo the substituted chars — unlike a 32-bit hashCode,
    * two different sfDirs can't silently share (and clobber) a
    * saveAsTable'd fixture, and the result is always a legal identifier
    * (hashCode could yield Int.MinValue, whose abs is negative). */
  def sfTag(sfDir: String): String = sfDir.replaceAll("[^A-Za-z0-9]", "_")

  def region(spark: SparkSession, d: String): DataFrame    = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = table(spark, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects by default
    * while DuckDB truncates to microseconds. Read the nanos as a long
    * (requires `spark.sql.legacy.parquet.nanosAsLong=true`, set at session
    * build in Verify/Bench/tests — not mutated here) and divide to µs.
    * `div` truncates toward zero, which equals floor for the post-epoch data
    * the harness generates (min ts 2024-01-01); matches DuckDB's nanos→µs
    * truncation. */
  def events(spark: SparkSession, d: String): DataFrame =
    table(spark, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
