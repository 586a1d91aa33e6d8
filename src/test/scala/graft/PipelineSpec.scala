package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Fixtures, Medallion}

/** End-to-end medallion pipeline semantics (SURVEY.md §5.3):
  * rerun-idempotence, latest-file-wins dim, first-write-wins fact,
  * P3 null gates, corrupt-file tolerance. */
class PipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def freshRun(): (String, String) = {
    val base = Files.createTempDirectory("graft_pipe_spec_").toString
    val raw = Fixtures.writeRaw(base)
    val wh = s"$base/warehouse"
    (raw, wh)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("rerunning the full load leaves every layer identical (idempotence)") {
    val (raw, wh) = freshRun()
    Medallion.run(spark, raw, wh)
    val agg1 = canon(Medallion.readAgg(spark, wh))
    val dim1 = canon(Medallion.readDim(spark, wh))
    val fact1 = canon(Medallion.readFact(spark, wh))
    Medallion.run(spark, raw, wh)
    assert(canon(Medallion.readAgg(spark, wh)) === agg1)
    assert(canon(Medallion.readDim(spark, wh)) === dim1)
    assert(canon(Medallion.readFact(spark, wh)) === fact1)
  }

  test("crash between the dim data write and its commit leaves every layer intact") {
    val (raw, wh) = freshRun()
    Medallion.run(spark, raw, wh)
    val agg1 = canon(Medallion.readAgg(spark, wh))
    val dim1 = canon(Medallion.readDim(spark, wh))
    val fact1 = canon(Medallion.readFact(spark, wh))
    // Simulate a second load killed AFTER writing the dim MERGE snapshot
    // files but BEFORE the atomic manifest rename: stage a batch (with
    // content that would be visibly wrong if adopted), never publish.
    val dimPath = s"$wh/core/dim_channels"
    val staged = graft.engine.TableCommit.stageBatch(
      Medallion.readDim(spark, wh).limit(1), dimPath)
    assert(staged.nonEmpty)
    // The orphan batch is on disk but invisible: readers still resolve the
    // committed version.
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dimPath/${staged.head.path}")))
    assert(canon(Medallion.readDim(spark, wh)) === dim1)
    // Recovery = just rerun the load: every layer converges to the same
    // state. Successor commits deliberately leave the orphan alone (it
    // is indistinguishable from a concurrent writer's in-flight stage);
    // the age-gated vacuum is what sweeps crash leftovers.
    Medallion.run(spark, raw, wh)
    assert(canon(Medallion.readAgg(spark, wh)) === agg1)
    assert(canon(Medallion.readDim(spark, wh)) === dim1)
    assert(canon(Medallion.readFact(spark, wh)) === fact1)
    graft.engine.TableCommit.vacuum(dimPath, minAgeMs = 0L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dimPath/${staged.head.path}")))
    assert(canon(Medallion.readDim(spark, wh)) === dim1)
  }

  test("dim: latest file wins; missing country defaults to UNKNOWN") {
    val (raw, wh) = freshRun()
    Medallion.run(spark, raw, wh)
    val dim = Medallion.readDim(spark, wh).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(dim("C2") === (("Beta v2", "IN"))) // file-2 version won
    assert(dim("C5")._2 === "UNKNOWN") // null country defaulted
    assert(dim.size === 5) // null channel_id row rejected
  }

  test("fact: first write wins and null video_id rows are rejected") {
    val (raw, wh) = freshRun()
    Medallion.run(spark, raw, wh)
    val fact = Medallion.readFact(spark, wh)
    // V1 appears in both files; the day-1 counts must have won
    val v1 = fact.filter(col("video_id") === "V1").head()
    assert(v1.getAs[Long]("view_count") === 1000L)
    assert(v1.getAs[String]("collection_date") === "2024-01-01")
    // null-id row filtered; V4's exact duplicate collapsed
    assert(fact.filter(col("video_id").isNull).count() === 0)
    assert(fact.filter(col("video_id") === "V4").count() === 1)
  }

  test("malformed raw file flows through the corrupt-record column, not a crash") {
    val (raw, wh) = freshRun()
    Medallion.loadStaging(spark, raw, wh)
    val staged = spark.read.parquet(s"$wh/staging/videos")
    val corrupt = staged.filter(col("_corrupt").isNotNull)
    assert(corrupt.count() === 1) // the malformed file -> one corrupt row
    assert(staged.filter(col("_corrupt").isNull).count() >= 10)
  }

  test("staging is truncated after the load (S7)") {
    val (raw, wh) = freshRun()
    Medallion.run(spark, raw, wh)
    assert(spark.read.parquet(s"$wh/staging/videos").count() === 0)
  }

  test("enrichment exercises the real tags array through combinedText") {
    val (raw, wh) = freshRun()
    Medallion.loadStaging(spark, raw, wh)
    val enriched = Medallion.enrich(spark.read.parquet(s"$wh/staging/videos"))
    // V6: tags ["fast","fast","growth"] -> pos counts fast ONCE + growth -> POSITIVE
    val v6 = enriched.filter(col("video_id") === "V6").head()
    assert(v6.getAs[String]("final_sentiment") === "POSITIVE")
    assert(v6.getAs[String]("classification_method") === "KEYWORD_BASED")
    // V2: "a complete failure", no tags/description -> substring NEGATIVE
    val v2 = enriched.filter(col("video_id") === "V2").head()
    assert(v2.getAs[String]("final_sentiment") === "NEGATIVE")
    assert(v2.getAs[Double]("engagement_rate") === 0.0) // zero views
    // V3: tie -> NEUTRAL with HALF_EVEN engagement
    val v3 = enriched.filter(col("video_id") === "V3").head()
    assert(v3.getAs[String]("final_sentiment") === "NEUTRAL")
    assert(v3.getAs[Double]("engagement_rate") === 0.7812)
  }
}
