package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Num, Tables}

/** Text-analysis operators for the LLM-training-data pipeline (SURVEY.md
  * §2.11). They generalize the reference's text handling — P8 keyword
  * containment (/root/reference/src/youtube_collector.py:77-78) and the
  * summary histograms (:241-268) — into corpus-level statistics.
  *
  * All are single-shuffle groupBy programs with map-side partial aggregation:
  * at 100 TB the shuffle carries one row per (group × input partition).
  * Averages are derived from exact integer sums divided once at the end, so
  * the doubles are deterministic cross-engine.
  */
object TextAnalysis {

  /** X4 `q_text_stats`: per-language corpus statistics over `documents` —
    * doc count, distinct sources, exact char totals and extrema, and an
    * average derived from the exact sum. */
  def textStatsQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(
        Num.countStar.as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / Num.countStar).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"))

  val textStatsOracle: String =
    """SELECT lang, COUNT(*) AS n_docs,
      | COUNT(DISTINCT source) AS n_sources,
      | SUM(n_chars) AS total_chars,
      | CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      | MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
}
