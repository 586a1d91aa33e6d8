package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One `queries` entry per implemented operator from SURVEY.md §2, each a pure
  * `(SparkSession, sfDir) => DataFrame`, plus DuckDB-dialect oracle SQL where
  * the semantics are SQL-expressible. Column names are aliased identically on
  * both sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: the reference's core computation — fact⋈dim join + grouped
    * rollup + sorted report (src/snowflake_loader.py:140-155,179-185) — on
    * sf0.001. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.aggDailyRegion(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_fact_dim"       -> Joins.joinFactDim _,
    "q_antijoin_new_facts"  -> Joins.antiJoinNewFacts _,
    "q_merge_dim"           -> Joins.mergeDim _,
    "q_agg_daily_region"    -> Aggregates.aggDailyRegion _,
    "q_agg_pricing"         -> Aggregates.aggPricing _,
    "q_report_sorted"       -> Aggregates.reportSorted _,
    "q_sentiment_dist"      -> Aggregates.sentimentDist _,
    "q_scalar_subquery"     -> Aggregates.scalarSubquery _,
    "q_distinct"            -> Aggregates.distinctRows _,
    "q_keyword_count"       -> Enrichment.keywordCountQ _,
    "q_sentiment"           -> Enrichment.sentimentQ _,
    "q_engagement"          -> Enrichment.engagementQ _,
    "q_extract_cast"        -> Enrichment.extractCastQ _,
    "q_flatten_record"      -> Enrichment.flattenRecordQ _,
    "q_scan_meta"           -> Relational.scanMetaQ _,
    "q_scan_meta_footer"    -> Relational.scanMetaFooterQ _,
    "q_dedup_latest"        -> Relational.dedupLatestQ _,
    "q_topk_per_group"      -> Relational.topkPerGroupQ _,
    "q_explode"             -> Relational.explodeQ _,
    "q_sink_partitioned"    -> Relational.sinkPartitionedQ _,
    "q_dedup_hash"          -> Dedup.dedupHashQ _,
    "q_text_stats"          -> TextAnalysis.textStatsQ _,
    "q_sessionize"          -> Sessionize.sessionizeQ _,
    "q_cosine_topk"         -> Similarity.cosineTopkQ _,
    "q_dedup_minhash"       -> Dedup.dedupMinhashQ _,
    "q_pipeline_daily_agg"  -> graft.pipeline.Medallion.dailyAggQ _,
    "q_token_stats"         -> TextAnalysis.tokenStatsQ _,
    "q_lang_id"             -> TextAnalysis.langIdQ _,
    "q_quality_score"       -> TextAnalysis.qualityScoreQ _,
    "q_fingerprint"         -> TextAnalysis.fingerprintQ _,
    "q_simhash"             -> TextAnalysis.simhashQ _,
    "q_ann_lsh"             -> Similarity.annLshQ _,
    "q_multimodal_meta"     -> MultiModal.multimodalMetaQ _,
    "q_dedup_embedding"     -> Similarity.dedupEmbeddingQ _,
    "q_dedup_ngram"         -> Dedup.dedupNgramQ _,
    "q_ann_ivf"             -> Similarity.annIvfQ _,
    "q_agg_salted"          -> Aggregates.aggSalted _,
    "q_star_join"           -> Joins.starJoin _,
    "q_rollup_text"         -> TextAnalysis.rollupTextQ _,
    "q_asof_join"           -> Joins.asofJoinQ _,
    "q_range_join"          -> Joins.rangeJoinQ _,
    "q_percentiles"         -> Stats.percentilesQ _,
    "q_kmv_distinct"        -> Stats.kmvDistinctQ _,
    "q_word_topk"           -> TextAnalysis.wordTopkQ _,
    "q_tfidf"               -> TextAnalysis.tfidfQ _,
    "q_simhash_pairs"       -> TextAnalysis.simhashPairsQ _,
    "q_time_window"         -> Stats.timeWindowQ _,
    "q_set_ops"             -> Aggregates.setOpsQ _,
    "q_pivot"               -> Aggregates.pivotQ _,
    "q_centroids"           -> Similarity.centroidsQ _,
    "q_split"               -> Curation.splitQ _,
    "q_decontaminate"       -> Curation.decontaminateQ _,
    "q_repetition"          -> Curation.repetitionQ _,
    "q_redact"              -> Curation.redactQ _,
    "q_knn_classify"        -> Similarity.knnClassifyQ _,
    "q_multimodal_frames"   -> MultiModal.multimodalFramesQ _,
    "q_semi_join"           -> Joins.semiJoinQ _,
    "q_bucketed_join"       -> Joins.bucketedJoinQ _,
    "q_cube_text"           -> TextAnalysis.cubeTextQ _,
    "q_moving_sum"          -> Stats.movingSumQ _,
    "q_dedup_latest_salted" -> Relational.dedupLatestSaltedQ _,
    "q_keyword_count_ac"    -> Enrichment.keywordCountAcQ _,
    "q_sample_stratified"   -> Curation.sampleStratifiedQ _,
    "q_pack_sequences"      -> Curation.packSequencesQ _,
    "q_cms_heavy"           -> Stats.cmsHeavyQ _,
    "q_dedup_clusters"      -> Dedup.dedupClustersQ _,
    "q_zorder_layout"       -> Relational.zorderLayoutQ _,
    "q_window_analytics"    -> Stats.windowAnalyticsQ _,
    "q_batched_lookup"      -> Joins.batchedLookupQ _,
    "q_streaming_window"    -> graft.streaming.Incremental.streamingWindowQ _,
    "q_streaming_dedup"     -> graft.streaming.Incremental.streamingDedupQ _,
    "q_search_matrix"       -> Relational.searchMatrixQ _,
    "q_quantile_sketch"     -> Stats.quantileSketchQ _,
    "q_ann_ivf2"            -> Similarity.annIvf2Q _,
    "q_ann_lsh_mp"          -> Similarity.annLshMpQ _,
    "q_streaming_state"     -> graft.streaming.Incremental.streamingStateQ _,
    "q_bm25"                -> TextAnalysis.bm25Q _,
    "q_scd2"                -> Joins.scd2Q _,
    "q_profile"             -> Stats.profileQ _,
    "q_pagerank"            -> Graph.pagerankQ _,
    "q_ann_pq"              -> Similarity.annPqQ _,
    "q_ann_pq_rerank"       -> Similarity.annPqRerankQ _,
    "q_hll_distinct"        -> Stats.hllDistinctQ _,
    "q_gap_fill"            -> Sessionize.gapFillQ _,
    "q_outliers"            -> Stats.outliersQ _,
    "q_bloom_join"          -> Joins.bloomJoinQ _,
    "q_triangles"           -> Graph.trianglesQ _,
    "q_dedup_incremental"   -> Dedup.dedupIncrementalQ _,
    "q_hll_merge"           -> Stats.hllMergeQ _,
    "q_streaming_join"      -> graft.streaming.Incremental.streamingJoinQ _,
    "q_skew_profile"        -> Stats.skewProfileQ _,
    "q_basket_pairs"        -> Aggregates.basketPairsQ _,
    "q_vocab_encode"        -> TextAnalysis.vocabEncodeQ _,
    "q_join_card_est"       -> Stats.joinCardEstQ _,
    "q_forget"              -> Curation.forgetQ _,
    "q_funnel"              -> Behavior.funnelQ _,
    "q_cohort_retention"    -> Behavior.cohortRetentionQ _,
    "q_event_paths"         -> Behavior.eventPathsQ _,
    "q_mad_outliers"        -> Stats.madOutliersQ _,
    "q_linfit"              -> Stats.linfitQ _,
    "q_cdc_diff"            -> Joins.cdcDiffQ _,
    "q_ngram_lm"            -> TextAnalysis.ngramLmQ _,
    "q_lm_quality"          -> TextAnalysis.lmQualityQ _,
    "q_mix_sources"         -> Curation.mixSourcesQ _,
    "q_streaming_sessions"  -> graft.streaming.Incremental.streamingSessionsQ _,
    "q_domain_cap"          -> Curation.domainCapQ _,
    "q_embed_quantize"      -> Similarity.embedQuantizeQ _,
    "q_chunk_cdc"           -> Dedup.chunkCdcQ _,
    "q_audience_overlap"    -> Behavior.audienceOverlapQ _,
    "q_concentration"       -> Stats.concentrationQ _,
    "q_schema_merge"        -> Relational.schemaMergeQ _,
    "q_session_paths"       -> Sessionize.sessionPathsQ _,
    "q_stream_backfill"     -> graft.streaming.Incremental.streamBackfillQ _,
    "q_spearman"            -> Stats.spearmanQ _,
    "q_churn"               -> Behavior.churnQ _,
    "q_ab_lift"             -> Behavior.abLiftQ _,
    "q_csv_roundtrip"       -> Relational.csvRoundtripQ _,
    "q_orc_roundtrip"       -> Relational.orcRoundtripQ _,
    "q_compact"             -> Relational.compactQ _,
    "q_image_decode"        -> MultiModal.imageDecodeQ _,
    "q_audio_decode"        -> MultiModal.audioDecodeQ _,
    "q_image_resize"        -> MultiModal.imageResizeQ _,
    "q_gif_frames"          -> MultiModal.gifFramesQ _,
    "q_concurrency"         -> Sessionize.peakConcurrencyQ _,
    "q_pps_sample"          -> Curation.ppsSampleQ _,
    "q_table_checksum"      -> Relational.tableChecksumQ _,
    "q_grouping_sets"       -> Aggregates.groupingSetsQ _,
    "q_cumulative_users"    -> Behavior.cumulativeUsersQ _,
    "q_winsorize"           -> Stats.winsorizeQ _,
    "q_wau"                 -> Behavior.wauQ _,
    "q_pseudonymize"        -> Curation.pseudonymizeQ _,
    "q_jsonl_roundtrip"     -> Relational.jsonlRoundtripQ _,
    "q_corrupt_audit"       -> Relational.corruptAuditQ _,
    "q_twap"                -> Stats.twapQ _,
    "q_unpivot"             -> Aggregates.unpivotQ _,
  )

  def oracleSql: Map[String, String] = Map(
    "q_join_fact_dim" ->
      """SELECT o.o_orderkey, n.n_name AS nation, o.o_orderstatus, o.o_totalprice
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY o.o_orderkey""".stripMargin,
    "q_antijoin_new_facts" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders b
        |WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND NOT EXISTS (SELECT 1 FROM orders t
        |                  WHERE t.o_orderkey % 7 = 0 AND t.o_orderkey = b.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_merge_dim" ->
      """WITH target AS (
        |  SELECT c_custkey AS key, c_name AS t_name, c_acctbal AS t_acctbal,
        |         '2024-01-01' AS t_first_seen
        |  FROM customer WHERE c_custkey % 3 = 0),
        |source AS (
        |  SELECT c_custkey AS key, c_name || '#v2' AS s_name,
        |         c_acctbal + 100.0 AS s_acctbal, '2024-06-01' AS s_first_seen
        |  FROM customer WHERE c_custkey % 2 = 0)
        |SELECT COALESCE(t.key, s.key) AS key,
        |       COALESCE(s.s_name, t.t_name) AS name,
        |       COALESCE(s.s_acctbal, t.t_acctbal) AS acctbal,
        |       COALESCE(t.t_first_seen, s.s_first_seen) AS first_seen
        |FROM target t FULL OUTER JOIN source s ON t.key = s.key
        |ORDER BY key""".stripMargin,
    "q_agg_daily_region" ->
      """SELECT n.n_name AS nation, o.o_orderstatus,
        |       COUNT(*) AS video_count,
        |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |GROUP BY n.n_name, o.o_orderstatus
        |ORDER BY nation, o_orderstatus""".stripMargin,
    "q_report_sorted" ->
      """SELECT n.n_name AS nation, o.o_orderpriority,
        |       COUNT(*) AS order_count,
        |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name, o.o_orderpriority
        |ORDER BY nation ASC, order_count DESC, o_orderpriority ASC""".stripMargin,
    "q_sentiment_dist" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  floor(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER () * 100.0 + 0.5)
        |    / 100.0 AS pct
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT (SELECT COUNT(*) FROM customer) AS channels,
        |       (SELECT COUNT(*) FROM orders)   AS videos,
        |       (SELECT COUNT(*) FROM nation)   AS aggregations""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_agg_pricing"      -> Aggregates.aggPricingOracle,
    "q_keyword_count"    -> Enrichment.keywordCountOracle,
    "q_sentiment"        -> Enrichment.sentimentOracle,
    "q_engagement"       -> Enrichment.engagementOracle,
    "q_extract_cast"     -> Enrichment.extractCastOracle,
    "q_flatten_record"   -> Enrichment.flattenRecordOracle,
    "q_scan_meta"        -> Relational.scanMetaOracle,
    "q_scan_meta_footer" -> Relational.scanMetaOracle,
    "q_dedup_latest"     -> Relational.dedupLatestOracle,
    "q_topk_per_group"   -> Relational.topkPerGroupOracle,
    "q_explode"          -> Relational.explodeOracle,
    "q_sink_partitioned" -> Relational.sinkPartitionedOracle,
    "q_dedup_hash"       -> Dedup.dedupHashOracle,
    "q_text_stats"       -> TextAnalysis.textStatsOracle,
    "q_sessionize"       -> Sessionize.sessionizeOracle,
    "q_cosine_topk"      -> Similarity.cosineTopkOracle,
    "q_dedup_minhash"    -> Dedup.dedupMinhashOracle,
    "q_pipeline_daily_agg" -> graft.pipeline.Medallion.dailyAggOracle,
    "q_token_stats"      -> TextAnalysis.tokenStatsOracle,
    "q_lang_id"          -> TextAnalysis.langIdOracle,
    "q_quality_score"    -> TextAnalysis.qualityScoreOracle,
    "q_fingerprint"      -> TextAnalysis.fingerprintOracle,
    "q_simhash"          -> TextAnalysis.simhashOracle,
    "q_ann_lsh"          -> Similarity.annLshOracle,
    "q_multimodal_meta"  -> MultiModal.multimodalMetaOracle,
    "q_dedup_embedding"  -> Similarity.dedupEmbeddingOracle,
    "q_dedup_ngram"      -> Dedup.dedupNgramOracle,
    "q_ann_ivf"          -> Similarity.annIvfOracle,
    "q_agg_salted"       -> Aggregates.aggSaltedOracle,
    "q_star_join"        -> Joins.starJoinOracle,
    "q_rollup_text"      -> TextAnalysis.rollupTextOracle,
    "q_asof_join"        -> Joins.asofJoinOracle,
    "q_range_join"       -> Joins.rangeJoinOracle,
    "q_percentiles"      -> Stats.percentilesOracle,
    "q_kmv_distinct"     -> Stats.kmvDistinctOracle,
    "q_word_topk"        -> TextAnalysis.wordTopkOracle,
    "q_tfidf"            -> TextAnalysis.tfidfOracle,
    "q_simhash_pairs"    -> TextAnalysis.simhashPairsOracle,
    "q_time_window"      -> Stats.timeWindowOracle,
    "q_set_ops"          -> Aggregates.setOpsOracle,
    "q_pivot"            -> Aggregates.pivotOracle,
    "q_centroids"        -> Similarity.centroidsOracle,
    "q_split"            -> Curation.splitOracle,
    "q_decontaminate"    -> Curation.decontaminateOracle,
    "q_repetition"       -> Curation.repetitionOracle,
    "q_redact"           -> Curation.redactOracle,
    "q_knn_classify"     -> Similarity.knnClassifyOracle,
    "q_multimodal_frames" -> MultiModal.multimodalFramesOracle,
    "q_semi_join"        -> Joins.semiJoinOracle,
    "q_bucketed_join"    -> Joins.bucketedJoinOracle,
    "q_cube_text"        -> TextAnalysis.cubeTextOracle,
    "q_moving_sum"       -> Stats.movingSumOracle,
    "q_dedup_latest_salted" -> Relational.dedupLatestSaltedOracle,
    "q_keyword_count_ac" -> Enrichment.keywordCountAcOracle,
    "q_sample_stratified" -> Curation.sampleStratifiedOracle,
    "q_pack_sequences"   -> Curation.packSequencesOracle,
    "q_cms_heavy"        -> Stats.cmsHeavyOracle,
    "q_dedup_clusters"   -> Dedup.dedupClustersOracle,
    "q_zorder_layout"    -> Relational.zorderLayoutOracle,
    "q_window_analytics" -> Stats.windowAnalyticsOracle,
    "q_batched_lookup"   -> Joins.batchedLookupOracle,
    // Streaming drains the same rows the batch window sees; the oracle IS
    // the batch-twin SQL (complete-mode sink == all-data rollup).
    "q_streaming_window" -> Stats.timeWindowOracle,
    // Key-only streaming dedup emits exactly the distinct key set.
    "q_streaming_dedup"  -> graft.streaming.Incremental.streamingDedupOracle,
    "q_search_matrix"    -> Relational.searchMatrixOracle,
    "q_quantile_sketch"  -> Stats.quantileSketchOracle,
    "q_ann_ivf2"         -> Similarity.annIvf2Oracle,
    "q_ann_lsh_mp"       -> Similarity.annLshMpOracle,
    // Monotone running counts: the final state per key == the batch count.
    "q_streaming_state"  -> graft.streaming.Incremental.streamingStateOracle,
    "q_bm25"             -> TextAnalysis.bm25Oracle,
    "q_scd2"             -> Joins.scd2Oracle,
    "q_profile"          -> Stats.profileOracle,
    "q_pagerank"         -> Graph.pagerankOracle,
    "q_ann_pq"           -> Similarity.annPqOracle,
    "q_ann_pq_rerank"    -> Similarity.annPqRerankOracle,
    "q_hll_distinct"     -> Stats.hllDistinctOracle,
    "q_gap_fill"         -> Sessionize.gapFillOracle,
    "q_outliers"         -> Stats.outliersOracle,
    "q_bloom_join"       -> Joins.bloomJoinOracle,
    "q_triangles"        -> Graph.trianglesOracle,
    "q_dedup_incremental" -> Dedup.dedupIncrementalOracle,
    "q_hll_merge"        -> Stats.hllMergeOracle,
    "q_streaming_join"   -> graft.streaming.Incremental.streamingJoinOracle,
    "q_skew_profile"     -> Stats.skewProfileOracle,
    "q_basket_pairs"     -> Aggregates.basketPairsOracle,
    "q_vocab_encode"     -> TextAnalysis.vocabEncodeOracle,
    "q_join_card_est"    -> Stats.joinCardEstOracle,
    "q_forget"           -> Curation.forgetOracle,
    "q_funnel"           -> Behavior.funnelOracle,
    "q_cohort_retention" -> Behavior.cohortRetentionOracle,
    "q_event_paths"      -> Behavior.eventPathsOracle,
    "q_mad_outliers"     -> Stats.madOutliersOracle,
    "q_linfit"           -> Stats.linfitOracle,
    "q_cdc_diff"         -> Joins.cdcDiffOracle,
    "q_ngram_lm"         -> TextAnalysis.ngramLmOracle,
    "q_lm_quality"       -> TextAnalysis.lmQualityOracle,
    "q_mix_sources"      -> Curation.mixSourcesOracle,
    "q_streaming_sessions" -> graft.streaming.Incremental.streamingSessionsOracle,
    "q_domain_cap"       -> Curation.domainCapOracle,
    "q_embed_quantize"   -> Similarity.embedQuantizeOracle,
    "q_chunk_cdc"        -> Dedup.chunkCdcOracle,
    "q_audience_overlap" -> Behavior.audienceOverlapOracle,
    "q_concentration"    -> Stats.concentrationOracle,
    "q_schema_merge"     -> Relational.schemaMergeOracle,
    "q_session_paths"    -> Sessionize.sessionPathsOracle,
    "q_stream_backfill"  -> graft.streaming.Incremental.streamBackfillOracle,
    "q_spearman"         -> Stats.spearmanOracle,
    "q_churn"            -> Behavior.churnOracle,
    "q_ab_lift"          -> Behavior.abLiftOracle,
    "q_csv_roundtrip"    -> Relational.csvRoundtripOracle,
    "q_orc_roundtrip"    -> Relational.orcRoundtripOracle,
    "q_compact"          -> Relational.compactOracle,
    "q_image_decode"     -> MultiModal.imageDecodeOracle,
    "q_audio_decode"     -> MultiModal.audioDecodeOracle,
    "q_image_resize"     -> MultiModal.imageResizeOracle,
    "q_gif_frames"       -> MultiModal.gifFramesOracle,
    "q_concurrency"      -> Sessionize.peakConcurrencyOracle,
    "q_pps_sample"       -> Curation.ppsSampleOracle,
    "q_table_checksum"   -> Relational.tableChecksumOracle,
    "q_grouping_sets"    -> Aggregates.groupingSetsOracle,
    "q_cumulative_users" -> Behavior.cumulativeUsersOracle,
    "q_winsorize"        -> Stats.winsorizeOracle,
    "q_wau"              -> Behavior.wauOracle,
    "q_pseudonymize"     -> Curation.pseudonymizeOracle,
    "q_jsonl_roundtrip"  -> Relational.jsonlRoundtripOracle,
    "q_corrupt_audit"    -> Relational.corruptAuditOracle,
    "q_twap"             -> Stats.twapOracle,
    "q_unpivot"          -> Aggregates.unpivotOracle,
  )
}
