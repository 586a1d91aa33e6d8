package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Num, Tables}

/** Deduplication operators for the LLM-training-data pipeline (SURVEY.md
  * §2.11). These generalize the reference's dedup shapes — W1 window dedup
  * (/root/reference/src/snowflake_loader.py:82) and J3 insert-only MERGE
  * (/root/reference/azure-functions/function_app.py:439-482) — to
  * content-addressed exact dedup and MinHash/LSH near-dedup over the
  * `documents` table.
  */
object Dedup {

  /** X1 `q_dedup_hash`: exact dedup by content hash. Every document is
    * bucketed by sha2(text) and the smallest doc_id per bucket wins
    * (deterministic keeper). Scale: a single hash-partitioned groupBy with
    * map-side partial aggregation — the shuffle carries one row per distinct
    * content, not per document; at 100 TB the 64-hex-char key keeps the
    * exchange narrow (no full text moves). */
  def dedupHashQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), sha2(col("text"), 256).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keeper_doc_id"),
        Num.countStar.as("n_copies"))
      .orderBy(col("keeper_doc_id"))

  val dedupHashOracle: String =
    """SELECT sha256(text) AS content_hash,
      | MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keeper_doc_id""".stripMargin
}
