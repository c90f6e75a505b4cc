package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * entry maps to. Every `queries` key with a SQL-expressible semantic has a
  * DuckDB oracle in `oracleSql` with IDENTICAL column names/types.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.A reference ETL semantics
    "upsert_latest_wins"       -> (MergeOps.qUpsertLatestWins _),
    "lake_merge_asof"          -> (MergeOps.qLakeMergeAsof _),
    "lake_delete_asof"         -> (MergeOps.qLakeDeleteAsof _),
    "lake_change_feed"         -> (MergeOps.qLakeChangeFeed _),
    "lake_compact_read"        -> (MergeOps.qLakeCompactRead _),
    "lake_schema_evolve"       -> (MergeOps.qLakeSchemaEvolve _),
    "lake_incremental_mv"      -> (MergeOps.qLakeIncrementalMv _),
    "lake_prune_read"          -> (MergeOps.qLakePruneRead _),
    "lake_partition_prune"     -> (MergeOps.qLakePartitionPrune _),
    "lake_sql_ddl"             -> (MergeOps.qLakeSqlDdl _),
    "lake_merge_into"          -> (MergeOps.qLakeMergeInto _),
    "lake_partition_evolve"    -> (MergeOps.qLakePartitionEvolve _),
    "lake_sql_call"            -> (MergeOps.qLakeSqlCall _),
    "lake_zorder_scan"         -> (MergeOps.qLakeZorderScan _),
    "lake_clone_merge"         -> (MergeOps.qLakeCloneMerge _),
    "lake_sql_source"          -> (MergeOps.qLakeSqlSource _),
    "lake_restore_read"        -> (MergeOps.qLakeRestoreRead _),
    "lake_evolve_feed"         -> (MergeOps.qLakeEvolveFeed _),
    "lake_rename_feed"         -> (MergeOps.qLakeRenameFeed _),
    "lake_delete_dv"           -> (MergeOps.qLakeDeleteDV _),
    "lake_delete_pos"          -> (MergeOps.qLakeDeletePos _),
    "lake_bloom_skip"          -> (MergeOps.qLakeBloomSkip _),
    "lake_agg_push"            -> (MergeOps.qLakeAggPush _),
    "lake_compact_where"       -> (MergeOps.qLakeCompactWhere _),
    "lake_concurrent_merge"    -> (MergeOps.qLakeConcurrentMerge _),
    "lake_sql_alter"           -> (MergeOps.qLakeSqlAlter _),
    "lake_merge_row"           -> (MergeOps.qLakeMergeRow _),
    "lake_zorder_call"         -> (MergeOps.qLakeZorderCall _),
    "lake_cluster_join"        -> (MergeOps.qLakeClusterJoin _),
    "lake_cluster_fold"        -> (MergeOps.qLakeClusterFold _),
    "lake_sql_ctas"            -> (MergeOps.qLakeSqlCtas _),
    "lake_runtime_prune"       -> (MergeOps.qLakeRuntimePrune _),
    "lake_column_map"          -> (MergeOps.qLakeColumnMap _),
    "lake_convert"             -> (MergeOps.qLakeConvert _),
    "upsert_cdc_apply"         -> (MergeOps.qUpsertCdcApply _),
    "dedup_pk_latest"          -> (MergeOps.qDedupPkLatest _),
    "incremental_changed_rows" -> (MergeOps.qIncrementalChangedRows _),
    "upsert_scd2_history"      -> (MergeOps.qUpsertScd2History _),
    "enum_validate"            -> (EtlOps.qEnumValidate _),
    "date_parse_safe"          -> (EtlOps.qDateParseSafe _),
    "json_extract"             -> (EtlOps.qJsonExtract _),
    "json_variant"             -> (EtlOps.qJsonVariant _),
    "coalesce_nested"          -> (EtlOps.qCoalesceNested _),
    // §2.B relational analytics
    "q1_pricing_summary"  -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q4_order_priority"   -> (Relational.q4OrderPriority _),
    "q6_forecast_revenue" -> (Relational.q6ForecastRevenue _),
    "q10_returned_items"  -> (Relational.q10ReturnedItems _),
    "q_cross_join"        -> (Relational.qCrossJoin _),
    "q_full_outer_join"   -> (Relational.qFullOuterJoin _),
    "q5_local_supplier"   -> (Relational.q5LocalSupplier _),
    "q_groupby_having"    -> (Relational.qGroupByHaving _),
    "q_broadcast_join"    -> (Relational.qBroadcastJoin _),
    "q_semi_join"         -> (Relational.qSemiJoin _),
    "q_anti_join"         -> (Relational.qAntiJoin _),
    "q_count_distinct"    -> (Relational.qCountDistinct _),
    "q_approx_distinct"   -> (Relational.qApproxDistinct _),
    "q_rollup"            -> (Relational.qRollup _),
    "q_cube"              -> (Relational.qCube _),
    "q_set_ops"           -> (Relational.qSetOps _),
    "q_string_funcs"      -> (Relational.qStringFuncs _),
    "q_date_funcs"        -> (Relational.qDateFuncs _),
    "q_scalar_subquery"   -> (Relational.qScalarSubquery _),
    "q_null_safe_join"    -> (Relational.qNullSafeJoin _),
    "q_pivot"             -> (Relational.qPivot _),
    "q_percentiles"       -> (Relational.qPercentiles _),
    "q_approx_percentiles" -> (Relational.qApproxPercentiles _),
    "q_time_buckets"      -> (Relational.qTimeBuckets _),
    // §2.B extended relational surface
    "q2_min_acct_supplier" -> (RelationalExt.q2MinAcctSupplier _),
    "q7_volume_shipping"  -> (RelationalExt.q7VolumeShipping _),
    "q8_market_share"     -> (RelationalExt.q8MarketShare _),
    "q9_product_profit"   -> (RelationalExt.q9ProductProfit _),
    "q14_promo_revenue"   -> (RelationalExt.q14PromoRevenue _),
    "q11_important_stock" -> (RelationalExt.q11ImportantStock _),
    "q12_late_lines"      -> (RelationalExt.q12LateLines _),
    "q13_cust_distribution" -> (RelationalExt.q13CustomerDistribution _),
    "q15_top_supplier"    -> (RelationalExt.q15TopSupplier _),
    "q16_part_supplier_cnt" -> (RelationalExt.q16PartSupplierCnt _),
    "q17_small_qty_revenue" -> (RelationalExt.q17SmallQtyRevenue _),
    "q18_large_orders"    -> (RelationalExt.q18LargeOrders _),
    "q19_disjunctive_pred" -> (RelationalExt.q19DisjunctivePred _),
    "q20_excess_inventory" -> (RelationalExt.q20ExcessInventory _),
    "q21_waiting_orders"  -> (RelationalExt.q21WaitingOrders _),
    "q22_sales_opportunity" -> (RelationalExt.q22SalesOpportunity _),
    "q_grouping_sets"     -> (RelationalExt.qGroupingSets _),
    "q_conditional_agg"   -> (RelationalExt.qConditionalAgg _),
    "q_distinct_agg_multi" -> (RelationalExt.qDistinctAggMulti _),
    "q_window_range_frame" -> (RelationalExt.qWindowRangeFrame _),
    "q_window_rank_stats" -> (RelationalExt.qWindowRankStats _),
    "q_gap_fill"          -> (RelationalExt.qGapFill _),
    "q_stats_moments"     -> (RelationalExt.qStatsMoments _),
    "q_recursive_chain"   -> (RelationalExt.qRecursiveChain _),
    "q_lateral_topk"      -> (RelationalExt.qLateralTopk _),
    "q_unpivot"           -> (RelationalExt.qUnpivot _),
    "q_listagg"           -> (RelationalExt.qListagg _),
    "q_hll_distinct"      -> (RelationalExt.qHllDistinct _),
    "q_skyline"           -> (RelationalExt.qSkyline _),
    "q_profile_columns"   -> (RelationalExt.qProfileColumns _),
    "q_pagerank"          -> (GraphOps.qPagerank _),
    "q_dq_rules"          -> (EtlOps.qDqRules _),
    "q_incremental_agg_merge" -> (RelationalExt.qIncrementalAggMerge _),
    "q_window_topk"       -> (WindowOps.qWindowTopK _),
    "q_topk_custom_plan"  -> (WindowOps.qTopKCustomPlan _),
    "q_window_running"    -> (WindowOps.qWindowRunning _),
    "q_window_lead_lag"   -> (WindowOps.qWindowLeadLag _),
    "q_window_ntile"      -> (WindowOps.qWindowNtile _),
    "q_histogram"         -> (Relational.qHistogram _),
    "q_sessionize"        -> (WindowOps.qSessionize _),
    "q_event_funnel"      -> (WindowOps.qEventFunnel _),
    "q_retention_cohort"  -> (WindowOps.qRetentionCohort _),
    "q_event_anomaly"     -> (WindowOps.qEventAnomaly _),
    "q_event_paths"       -> (WindowOps.qEventPaths _),
    "q_asof_join"         -> (JoinOps.qAsofJoin _),
    "q_range_join"        -> (JoinOps.qRangeJoin _),
    "q_skew_salted_join"  -> (JoinOps.qSkewSaltedJoin _),
    "q_bloom_semijoin"    -> (JoinOps.qBloomSemijoin _),
    "q_skew_diagnose"     -> (JoinOps.qSkewDiagnose _),
    "q_time_skew_diagnose" -> (JoinOps.qTimeSkewDiagnose _),
    "q_zorder_prune"      -> (Bucketing.qZorderPrune _),
    "q_zorder3_prune"     -> (Bucketing.qZorder3Prune _),
    "q_compact_read"      -> (Bucketing.qCompactRead _),
    "q_partition_prune"   -> (Bucketing.qPartitionPrune _),
    "q_bucketed_join"     -> (Bucketing.qBucketedJoin _),
    // §2.A JSON ingest (rows-only: synthesized Scryfall-shaped input)
    "ingest_json_cards"   -> (graft.ingest.IngestOps.qIngestJsonCards _),
    "ingest_json_cards_file" -> (graft.ingest.IngestOps.qIngestJsonCardsFile _),
    "ingest_csv_cards"    -> (graft.ingest.IngestOps.qIngestCsvCards _),
    "ingest_orc_cards"    -> (graft.ingest.IngestOps.qIngestOrcCards _),
    "ingest_avro_cards"   -> (graft.ingest.IngestOps.qIngestAvroCards _),
    "ingest_json_sets"    -> (graft.ingest.IngestOps.qIngestJsonSets _),
    "ingest_schema_drift" -> (graft.ingest.IngestOps.qIngestSchemaDrift _),
    "ingest_parquet_evolve" -> (graft.operators.Bucketing.qIngestParquetEvolve _),
    "ingest_avro_evolve"  -> (graft.ingest.IngestOps.qIngestAvroEvolve _),
    "q_sql_adhoc"         -> (graft.ingest.IngestOps.qSqlAdhoc _),
    "q_cards_per_set"     -> (graft.ingest.IngestOps.qCardsPerSet _),
    "q_cards_keyword_filter" -> (graft.ingest.IngestOps.qCardsKeywordFilter _),
    "q_cards_text_search" -> (graft.ingest.IngestOps.qCardsTextSearch _),
    "q_cards_name_trgm"   -> (graft.ingest.IngestOps.qCardsNameTrgm _),
    "q_cards_text_trgm"   -> (graft.ingest.IngestOps.qCardsTextTrgm _),
    "text_fulltext_search" -> (graft.text.TextOps.qFulltextSearch _),
    "text_heavy_hitters"  -> (graft.text.TextOps.qHeavyHitters _),
    "q_cards_cmc_range"   -> (graft.ingest.IngestOps.qCardsCmcRange _),
    "q_cards_fuzzy_join"  -> (graft.ingest.IngestOps.qCardsFuzzyJoin _),
    "q_cards_oracle_lookup" -> (graft.ingest.IngestOps.qCardsOracleLookup _),
    // §2.C dedup & similarity
    "dedup_exact"         -> (graft.dedup.DedupOps.qDedupExact _),
    "dedup_incremental"   -> (graft.dedup.DedupOps.qDedupIncremental _),
    "dedup_index_serve"   -> (graft.dedup.DedupOps.qDedupIndexServe _),
    "dedup_index_maintain" -> (graft.dedup.DedupOps.qDedupIndexMaintain _),
    "dedup_normalized"    -> (graft.dedup.DedupOps.qDedupNormalized _),
    "dedup_clusters"      -> (graft.dedup.DedupOps.qDedupClusters _),
    "dedup_minhash_lsh"   -> (graft.dedup.DedupOps.qDedupMinhashLsh _),
    "dedup_simhash"       -> (graft.dedup.DedupOps.qDedupSimhash _),
    // ngram_jaccard is the AllPairs prefix-filtered miner (the scale-safe
    // default since round 8); the count-aggregation form stays registered
    // so its small-corpus fast path keeps an oracle row and a scaling slope
    "ngram_jaccard"       -> (graft.dedup.DedupOps.qNgramJaccard _),
    "ngram_jaccard_countagg" -> (graft.dedup.DedupOps.ngramJaccardCountAgg _),
    "dedup_containment"   -> (graft.dedup.DedupOps.qDedupContainment _),
    "dedup_bloom_probe"   -> (graft.dedup.DedupOps.qDedupBloomProbe _),
    "dedup_decision"      -> (graft.dedup.DedupOps.qDedupDecision _),
    "embed_neardup_cosine" -> (graft.similarity.SimilarityOps.qEmbedNeardupCosine _),
    "embed_label_centroids" -> (graft.similarity.SimilarityOps.qEmbedLabelCentroids _),
    "ann_topk_brute"      -> (graft.similarity.SimilarityOps.qAnnTopkBrute _),
    "ann_topk_lsh"        -> (graft.similarity.SimilarityOps.qAnnTopkLsh _),
    "ann_topk_ivf"        -> (graft.similarity.SimilarityOps.qAnnTopkIvf _),
    "embed_quantize_int8" -> (graft.similarity.SimilarityOps.qEmbedQuantizeInt8 _),
    "embed_cluster_dedup" -> (graft.similarity.SimilarityOps.qEmbedClusterDedup _),
    "embed_project_rand"  -> (graft.similarity.SimilarityOps.qEmbedProjectRand _),
    "embed_kmeans"        -> (graft.similarity.SimilarityOps.qEmbedKmeans _),
    "embed_pca_power"     -> (graft.similarity.SimilarityOps.qEmbedPcaPower _),
    "ann_topk_ivfpq"      -> (graft.similarity.SimilarityOps.qAnnTopkIvfPq _),
    "ann_knn_join"        -> (graft.similarity.SimilarityOps.qAnnKnnJoin _),
    "embed_knn_density"   -> (graft.similarity.SimilarityOps.qEmbedKnnDensity _),
    "ann_range_search"    -> (graft.similarity.SimilarityOps.qAnnRangeSearch _),
    "ann_index_serve"     -> (graft.similarity.SimilarityOps.qAnnIndexServe _),
    "ann_index_maintain"  -> (graft.similarity.SimilarityOps.qAnnIndexMaintain _),
    "embed_mips"          -> (graft.similarity.SimilarityOps.qEmbedMips _),
    "ann_mips_lsh"        -> (graft.similarity.SimilarityOps.qAnnMipsLsh _),
    "gdpr_forget_keys"    -> (graft.operators.GovernanceOps.qGdprForgetKeys _),
    "gdpr_forget_batch"   -> (graft.operators.GovernanceOps.qGdprForgetBatch _),
    "gdpr_k_anonymity"    -> (graft.operators.GovernanceOps.qKAnonymity _),
    "gdpr_access_report"  -> (graft.operators.GovernanceOps.qGdprAccessReport _),
    "ingest_events_jsonl" -> (graft.ingest.IngestOps.qIngestEventsJsonl _),
    "ingest_freshness_refresh" -> (graft.ingest.IngestOps.qIngestFreshness _),
    "upsert_jdbc_protocol" -> (graft.operators.MergeOps.qUpsertJdbcProtocol _),
    "q_market_basket"     -> (graft.operators.AssocOps.qMarketBasket _),
    // §2.D text analysis
    "text_token_count"    -> (graft.text.TextOps.qTokenCount _),
    "text_quality_score"  -> (graft.text.TextOps.qQualityScore _),
    "text_quality_classifier" -> (graft.text.TextOps.qQualityClassifier _),
    "text_lang_id"        -> (graft.text.TextOps.qLangId _),
    "doc_fingerprint"     -> (graft.text.TextOps.qDocFingerprint _),
    "text_ngram_freq"     -> (graft.text.TextOps.qNgramFreq _),
    "text_stratified_sample" -> (graft.text.TextOps.qStratifiedSample _),
    "text_weighted_sample" -> ((s: SparkSession, d: String) => graft.text.TextOps.qWeightedSample(s, d)),
    "text_bpe_pairs"      -> (graft.text.TextOps.qBpePairs _),
    "text_bpe_encode"     -> (graft.text.TextOps.qBpeEncode _),
    "text_lm_perplexity"  -> (graft.text.TextOps.qLmPerplexity _),
    "text_pii_scrub"      -> (graft.text.TextOps.qPiiScrub _),
    "text_repetition_ratio" -> (graft.text.TextOps.qRepetitionRatio _),
    "text_boilerplate_spans" -> (graft.text.TextOps.qBoilerplateSpans _),
    "text_rare_word_ratio" -> (graft.text.TextOps.qRareWordRatio _),
    "text_contamination"  -> (graft.text.TextOps.qContamination _),
    "text_budget_select"  -> (graft.text.TextOps.qBudgetSelect _),
    "text_domain_mix"     -> (graft.text.TextOps.qDomainMix _),
    "text_temperature_mix" -> (graft.text.TextOps.qTemperatureMix _),
    "text_temperature_mix_tau" -> (graft.text.TextOps.qTemperatureMixTau _),
    "text_epoch_plan"     -> (graft.text.TextOps.qEpochPlan _),
    "text_domain_stats"   -> (graft.text.TextOps.qDomainStats _),
    "text_pack_sequences" -> (graft.text.TextOps.qPackSequences _),
    "text_chunk_windows"  -> (graft.text.TextOps.qTextChunkWindows _),
    "text_chunk_dedup"    -> (graft.text.TextOps.qTextChunkDedup _),
    "text_chunk_doc_purge" -> (graft.text.TextOps.qTextChunkDocPurge _),
    "text_chunk_minhash"  -> (graft.text.TextOps.qTextChunkMinhash _),
    "text_chunk_pack"     -> (graft.text.TextOps.qTextChunkPack _),
    "text_global_shuffle" -> (graft.text.TextOps.qTextGlobalShuffle _),
    "pipeline_e2e"        -> (graft.text.TextOps.qPipelineE2e _),
    "pipeline_funnel"     -> (graft.text.TextOps.qPipelineFunnel _),
    "text_bigram_novelty" -> (graft.text.TextOps.qBigramNovelty _),
    "text_vocab_encode"   -> (graft.text.TextOps.qVocabEncode _),
    "text_tfidf_topterms" -> (graft.text.TextOps.qTfidfTopTerms _),
    "text_unigram_entropy" -> (graft.text.TextOps.qUnigramEntropy _),
    "text_dsir_weights"   -> (graft.text.TextOps.qDsirWeights _),
    "text_ccnet_bucket"   -> (graft.text.TextOps.qCcnetBucket _),
    "text_substring_dedup" -> (graft.text.TextOps.qSubstringDedup _),
    "text_sentence_dedup" -> (graft.text.TextOps.qSentenceDedup _),
    "text_train_split"    -> (graft.text.TextOps.qTrainSplit _),
    "text_lang_source_mi" -> (graft.text.TextOps.qLangSourceMi _),
    // §2.E multimodal
    "mm_binary_stats"     -> (graft.multimodal.MultimodalOps.qMmBinaryStats _),
    "mm_decode"           -> (graft.multimodal.MultimodalOps.qMmDecode _),
    "mm_resize"           -> (graft.multimodal.MultimodalOps.qMmResize _),
    "mm_frame_sample"     -> (graft.multimodal.MultimodalOps.qMmFrameSample _),
    "mm_scene_cut"        -> (graft.multimodal.MultimodalOps.qMmSceneCut _),
    "mm_audio_meta"       -> (graft.multimodal.MultimodalOps.qMmAudioMeta _),
    "mm_audio_energy"     -> (graft.multimodal.MultimodalOps.qMmAudioEnergy _),
    "mm_audio_vad"        -> (graft.multimodal.MultimodalOps.qMmAudioVad _),
    "mm_pixel_decode"     -> (graft.multimodal.MultimodalOps.qMmPixelDecode _),
    "mm_image_stats"      -> (graft.multimodal.MultimodalOps.qMmImageStats _),
    "mm_phash"            -> (graft.multimodal.MultimodalOps.qMmPhash _),
    "mm_phash_neardup"    -> (graft.multimodal.MultimodalOps.qMmPhashNeardup _),
    "mm_phash_clusters"   -> (graft.multimodal.MultimodalOps.qMmPhashClusters _),
    "mm_jpeg_decode"      -> (graft.multimodal.MultimodalOps.qMmJpegDecode _),
    // §2.F streaming (batch-equivalent registrations; streaming paths in specs)
    "stream_window_counts" -> (graft.streaming.EventStreams.qStreamWindowCounts _),
    "stream_enrich_join"  -> (graft.streaming.EventStreams.qStreamEnrichJoin _),
    "stream_interval_join" -> (graft.streaming.EventStreams.qStreamIntervalJoin _),
    "stream_dedup"        -> (graft.streaming.EventStreams.qStreamDedup _),
    "stream_top_users"    -> (graft.streaming.EventStreams.qStreamTopUsers _),
    "q_array_funcs"       -> (graft.operators.Relational.qArrayFuncs _),
    "stream_sessionize"   -> (graft.streaming.EventStreams.qStreamSessionize _),
    "stream_late_data"    -> (graft.streaming.EventStreams.qStreamLateData _),
    "stream_upsert_sink"  -> (graft.streaming.EventStreams.qStreamUpsertSink _),
    "stream_lake_sink"    -> (graft.streaming.EventStreams.qStreamLakeSink _),
    "stream_lake_cdf"     -> (graft.streaming.EventStreams.qStreamLakeCdf _),
    "stream_lake_source"  -> (graft.streaming.EventStreams.qStreamLakeSource _),
    "stream_quality_filter" -> (graft.streaming.EventStreams.qStreamQualityFilter _),
    "stream_chunk_dedup"  -> (graft.streaming.EventStreams.qStreamChunkDedup _)
  )

  /** Shared oracle bodies — one string, referenced per entry, so a
    * threshold or schema change cannot silently diverge one variant. */
  private val AnnGateOracle =
    """WITH q AS (SELECT vec_id FROM embeddings WHERE vec_id % 25 = 0),
        |st AS (SELECT greatest(1, CAST(ceil(count(*) / 64.0) AS BIGINT)) AS stride FROM q)
        |SELECT vec_id + 1000000 AS query_id, CAST(10 AS BIGINT) AS k,
        |  TRUE AS mean_recall_ok, TRUE AS top1_ok
        |FROM q, st WHERE (vec_id // 25) % stride = 0 ORDER BY query_id""".stripMargin

  /** The fastText-quality scoring replay (weight table → md5 bucket →
    * per-doc logit sum over unigram+bigram features), shared by the
    * batch classifier and the streaming filter so the model literal and
    * feature construction live in ONE SQL body; `finalSelect` supplies
    * each entry's projection / keep-filter over the `sc` CTE and
    * `source` the corpus relation (the pipeline entries score an
    * amplified ingest). */
  private def qualityScoreOracle(finalSelect: String,
      source: String = "documents"): String =
    (s"""WITH src AS (SELECT doc_id, text FROM $source),
      |""".stripMargin +
     """w(term, wt) AS (VALUES
      |  ('click', -1000000), ('buy', -900000), ('free', -950000),
      |  ('offer', -850000), ('subscribe', -800000),
      |  ('click here', -1500000), ('buy now', -1400000),
      |  ('because', 900000), ('therefore', 950000), ('with', 750000),
      |  ('of', 700000), ('and', 650000),
      |  ('because therefore', 1100000), ('of the', 800000), ('the', 1000)),
      |wb AS (SELECT ('0x' || substr(md5(term), 1, 16))::UBIGINT % 2097152 AS b,
      |         CAST(sum(wt) AS BIGINT) AS wt FROM w GROUP BY 1),
      |d AS (SELECT doc_id, text ||
      |    CASE WHEN doc_id % 5 = 0 THEN ' click here buy now subscribe free offer'
      |         WHEN doc_id % 5 = 1 THEN ' because therefore of the and with'
      |         ELSE '' END AS t FROM src),
      |toks AS (SELECT doc_id, string_split_regex(trim(t), '\s+') AS ws FROM d),
      |feats AS (SELECT doc_id,
      |    unnest(ws || list_transform(generate_series(1, len(ws) - 1),
      |      i -> ws[i] || ' ' || ws[i + 1])) AS f FROM toks),
      |h AS (SELECT doc_id,
      |    ('0x' || substr(md5(f), 1, 16))::UBIGINT % 2097152 AS b FROM feats),
      |sc AS (SELECT doc_id, count(*) AS n_features,
      |         sum(CASE WHEN wt IS NOT NULL THEN 1 ELSE 0 END) AS n_hits,
      |         sum(coalesce(wt, 0)) AS logit_sum
      |       FROM h LEFT JOIN wb USING (b) GROUP BY doc_id)
      |""" + finalSelect).stripMargin

  /** The end-to-end pipeline ledger replay: extends the quality-scoring
    * CTE chain with the lang-ID argmax, the cumulative stage flags, and
    * the among-survivors exact-dedup rep election; `finalSelect`
    * projects either the packed manifest (pipeline_e2e) or the funnel
    * counts (pipeline_funnel) off the `fin` CTE. `en` wins stopword-hit
    * ties because it is first in the Spark fold order, so lang_keep is
    * exactly `hits_en = greatest(...) AND greatest(...) > 0`. The
    * ingest is the twin-amplified corpus (prose-class docs duplicated
    * at +1,000,000 — see [[graft.text.TextOps.pipelineLedger]]). */
  private def pipelineLedgerOracle(finalSelect: String): String =
    qualityScoreOracle(
      """, t2 AS (SELECT doc_id, text,
        |    string_split_regex(trim(lower(text)), '\s+') AS lt,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM src),
        |lp AS (SELECT doc_id, text, n_tokens,
        |    len(list_filter(lt, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS he,
        |    greatest(
        |      len(list_filter(lt, x -> list_contains(['the','a','of','and','to','in','is'], x))),
        |      len(list_filter(lt, x -> list_contains(['der','die','und','das','ist','nicht'], x))),
        |      len(list_filter(lt, x -> list_contains(['le','les','et','est','une','dans'], x))),
        |      len(list_filter(lt, x -> list_contains(['el','los','que','una','por','con'], x))),
        |      len(list_filter(lt, x -> list_contains(['的','是','了','在','我','有'], x)))) AS hb
        |  FROM t2),
        |led AS (SELECT lp.doc_id, lp.text, lp.n_tokens,
        |    (he = hb AND hb > 0) AS lang_keep,
        |    (he = hb AND hb > 0 AND sc.logit_sum > 0) AS q_keep
        |  FROM lp JOIN sc USING (doc_id)),
        |rep AS (SELECT *, min(CASE WHEN q_keep THEN doc_id END)
        |    OVER (PARTITION BY text) AS rep_id FROM led),
        |fin AS (SELECT *, (q_keep AND doc_id = rep_id) AS dedup_keep FROM rep)
        |""".stripMargin + finalSelect,
      source = """documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 1""".stripMargin)

  /** The forget-propagation oracle, parameterized by the erasure
    * predicate (as a function of an id-expression string) so the
    * single-set and batched-queue entries replay the SAME two-generation
    * SQL with only the request membership swapped. */
  private def gdprForgetOracle(p: String => String): String =
    raw"""WITH RECURSIVE
      |bB AS (SELECT doc_id, text FROM documents),
      |bA AS (SELECT doc_id, text FROM documents WHERE NOT ${p("doc_id")}),
      |dB AS (SELECT doc_id, text FROM bB
      |  UNION ALL SELECT doc_id + 1000000, text FROM bB WHERE doc_id % 10 = 0),
      |hB AS (SELECT doc_id,
      |  CAST((('0x' || substr(md5(text), 1, 16))::UBIGINT >> 1) AS BIGINT) AS th FROM dB),
      |eB AS (SELECT th, min(doc_id) AS exact_rep FROM hB GROUP BY th),
      |sB AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(words[i:i+2], ' ') FOR i IN range(1, greatest(len(words)-2, 1)+1)]) AS s
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM bB)),
      |mined AS MATERIALIZED (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sB a JOIN sB b ON a.doc_id < b.doc_id
      |  WHERE 2 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
      |prB AS MATERIALIZED (
      |  SELECT doc_a, doc_b FROM mined
      |  UNION ALL
      |  SELECT doc_id, doc_id + 1000000 FROM bB WHERE doc_id % 10 = 0),
      |gB AS MATERIALIZED (
      |  SELECT doc_a AS src, doc_b AS dst FROM prB
      |  UNION ALL SELECT doc_b, doc_a FROM prB),
      |wB AS (
      |  SELECT doc_id, doc_id AS label FROM dB
      |  UNION
      |  SELECT e.src AS doc_id, w.label FROM wB w JOIN gB e ON w.doc_id = e.dst),
      |lB AS (SELECT doc_id, min(label) AS cluster FROM wB GROUP BY doc_id),
      |decB AS (SELECT h.doc_id, l.cluster,
      |  CASE WHEN h.doc_id <> e.exact_rep THEN 'exact_dup'
      |       WHEN h.doc_id <> l.cluster THEN 'near_dup' ELSE 'keep' END AS decision
      |  FROM hB h JOIN eB e USING (th) JOIN lB l USING (doc_id)),
      |dA AS (SELECT doc_id, text FROM bA
      |  UNION ALL SELECT doc_id + 1000000, text FROM bA WHERE doc_id % 10 = 0),
      |hA AS (SELECT doc_id,
      |  CAST((('0x' || substr(md5(text), 1, 16))::UBIGINT >> 1) AS BIGINT) AS th FROM dA),
      |eA AS (SELECT th, min(doc_id) AS exact_rep FROM hA GROUP BY th),
      |prA AS MATERIALIZED (
      |  SELECT doc_a, doc_b FROM mined
      |  WHERE NOT ${p("doc_a")} AND NOT ${p("doc_b")}
      |  UNION ALL
      |  SELECT doc_id, doc_id + 1000000 FROM bA WHERE doc_id % 10 = 0),
      |gA AS MATERIALIZED (
      |  SELECT doc_a AS src, doc_b AS dst FROM prA
      |  UNION ALL SELECT doc_b, doc_a FROM prA),
      |wA AS (
      |  SELECT doc_id, doc_id AS label FROM dA
      |  UNION
      |  SELECT e.src AS doc_id, w.label FROM wA w JOIN gA e ON w.doc_id = e.dst),
      |lA AS (SELECT doc_id, min(label) AS cluster FROM wA GROUP BY doc_id),
      |decA AS (SELECT h.doc_id, l.cluster,
      |  CASE WHEN h.doc_id <> e.exact_rep THEN 'exact_dup'
      |       WHEN h.doc_id <> l.cluster THEN 'near_dup' ELSE 'keep' END AS decision
      |  FROM hA h JOIN eA e USING (th) JOIN lA l USING (doc_id)),
      |tkB AS (SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n FROM bB),
      |pkB AS (SELECT doc_id,
      |  CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start
      |  FROM tkB),
      |tkA AS (SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n FROM bA),
      |pkA AS (SELECT doc_id,
      |  CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start
      |  FROM tkA)
      |SELECT 'documents' AS frame,
      |  (SELECT count(*) FROM bB) AS rows_before,
      |  (SELECT count(*) FROM bA) AS rows_after,
      |  (SELECT count(*) FROM bB) - (SELECT count(*) FROM bA) AS purged,
      |  (SELECT count(*) FROM bA WHERE ${p("doc_id")}) AS residual_refs,
      |  CAST(0 AS BIGINT) AS n_changed
      |UNION ALL
      |SELECT 'dedup_decision',
      |  (SELECT count(*) FROM decB),
      |  (SELECT count(*) FROM decA),
      |  (SELECT count(*) FROM decB) - (SELECT count(*) FROM decA),
      |  (SELECT count(*) FROM decA WHERE ${p("(doc_id % 1000000)")}),
      |  (SELECT count(*) FROM decB b JOIN decA a USING (doc_id)
      |   WHERE b.decision <> a.decision OR b.cluster <> a.cluster)
      |UNION ALL
      |SELECT 'pack_sequences',
      |  (SELECT count(*) FROM pkB),
      |  (SELECT count(*) FROM pkA),
      |  (SELECT count(*) FROM pkB) - (SELECT count(*) FROM pkA),
      |  (SELECT count(*) FROM pkA WHERE ${p("doc_id")}),
      |  (SELECT count(*) FROM pkB b JOIN pkA a USING (doc_id)
      |   WHERE b.token_start <> a.token_start OR b.token_start // 2048 <> a.token_start // 2048)
      |ORDER BY frame""".stripMargin

  /** The synthesized cards corpus regenerated from range(): shared by the
    * in-memory ingest and the JSON-file / CSV / ORC / Avro source-parity
    * entries (identical pipeline + projection — a mismatch isolates the
    * source). */
  private val CardsIngestOracle =
    """SELECT
        |  'card-' || CAST(i AS VARCHAR) AS id,
        |  'Card ' || CAST(i AS VARCHAR) AS name,
        |  TRY_CAST(CASE WHEN i % 7 = 0 THEN 'not-a-date'
        |    ELSE '19' || lpad(CAST(i % 30 + 70 AS VARCHAR), 2, '0')
        |         || '-0' || CAST(i % 9 + 1 AS VARCHAR) || '-1' || CAST(i % 9 AS VARCHAR)
        |    END AS DATE) AS released_date,
        |  CASE WHEN i % 11 = 0 THEN 'weird'
        |    ELSE (['normal','split','flip','transform','modal_dfc','meld','leveler',
        |           'class','case','saga','adventure','mutate','prototype','battle',
        |           'planar','scheme','vanguard','token','double_faced_token','emblem',
        |           'augment','host','art_series','reversible_card'])[CAST(i % 24 AS INT) + 1]
        |    END AS layout,
        |  i % 11 <> 0 AS layout_valid,
        |  CAST(i % 12 AS DOUBLE) AS cmc,
        |  CASE WHEN i % 5 = 0 THEN NULL ELSE (i % 300) * 100 + (i % 100) END AS price_cents,
        |  CASE WHEN i % 3 = 0 THEN 'https://img/face_' || CAST(i AS VARCHAR) || '_0.jpg'
        |       ELSE 'https://img/card_' || CAST(i AS VARCHAR) || '.jpg' END AS image_normal,
        |  'S' || CAST(i % 40 AS VARCHAR) AS set_code,
        |  (['common','uncommon','rare','mythic'])[CAST(i % 4 AS INT) + 1] AS rarity,
        |  CAST(i % 5 + 1 AS INT) AS n_colors,
        |  CAST(i % 20000 AS INT) AS edhrec_rank,
        |  CAST(2 AS INT) AS n_faces
        |FROM range(0, 500) t(i) ORDER BY id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // CDC replay: the oracle takes the last (ts, event_id)-ordered op per
    // user with a window and drops keys whose final op is a DELETE; the
    // Spark side must reach the same state through its max(struct) agg
    "upsert_cdc_apply" ->
      """WITH log AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_id % 17 = 0 THEN 'D'
        |         WHEN event_id % 3 = 0 THEN 'I' ELSE 'U' END AS op,
        |    value
        |  FROM events),
        |last AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM log)
        |SELECT user_id, event_id AS last_event_id, ts AS last_ts,
        |  op AS last_op, round(value, 2) AS value
        |FROM last WHERE rn = 1 AND op <> 'D' ORDER BY user_id""".stripMargin,
    "upsert_latest_wins" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice,2) AS o_totalprice, o_orderdate
        |FROM orders WHERE o_orderkey % 10 <> 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |  CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST('1.1' AS DECIMAL(3,1)), 2) AS DOUBLE) AS o_totalprice, o_orderdate
        |FROM orders WHERE o_orderkey % 10 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "dedup_pk_latest" ->
      """SELECT user_id, event_id, ts, event_type, round(value,2) AS value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    // replays BOTH committed table states: version 1 = the raw base,
    // version 2 = latest-wins merge of the update+insert batch — the
    // engine side reads v1 via the as-of manifest AFTER v2 committed
    "lake_merge_asof" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |updates AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1000 AS DOUBLE) AS o_totalprice
        |  FROM base WHERE o_orderkey % 7 = 3
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, 'N', o_totalprice
        |  FROM base WHERE o_orderkey % 97 = 0),
        |v2 AS (
        |  SELECT * FROM updates
        |  UNION ALL
        |  SELECT b.* FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = b.o_orderkey))
        |SELECT 1 AS version, o_orderkey, o_orderstatus,
        |  round(o_totalprice, 2) AS o_totalprice FROM base
        |UNION ALL
        |SELECT 2, o_orderkey, o_orderstatus, round(o_totalprice, 2) FROM v2
        |ORDER BY version, o_orderkey""".stripMargin,
    "upsert_scd2_history" ->
      """WITH versions AS (
        |  SELECT o_orderkey, o_orderstatus, o_orderdate AS change_ts FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'U', o_orderdate + INTERVAL 1 DAY FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT o_orderkey, o_orderstatus,
        |  change_ts AS valid_from,
        |  lead(change_ts, 1) OVER (PARTITION BY o_orderkey ORDER BY change_ts) AS valid_to,
        |  lead(change_ts, 1) OVER (PARTITION BY o_orderkey ORDER BY change_ts) IS NULL AS is_current
        |FROM versions ORDER BY o_orderkey, valid_from""".stripMargin,
    "incremental_changed_rows" ->
      """WITH snapshot AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 13 = 0 THEN round(o_totalprice*0.5,2) ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate
        |  FROM orders WHERE o_orderkey % 11 <> 0)
        |SELECT f.o_orderkey,
        |  CASE WHEN s.o_orderkey IS NULL THEN 'new' ELSE 'changed' END AS change_type
        |FROM orders f LEFT JOIN snapshot s ON f.o_orderkey = s.o_orderkey
        |WHERE s.o_orderkey IS NULL
        |   OR f.o_custkey <> s.o_custkey OR f.o_orderstatus <> s.o_orderstatus
        |   OR f.o_totalprice <> s.o_totalprice OR f.o_orderdate <> s.o_orderdate
        |ORDER BY f.o_orderkey""".stripMargin,
    "enum_validate" ->
      """SELECT o_orderpriority, o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM') AS is_valid, count(*) AS n
        |FROM orders GROUP BY 1,2 ORDER BY 1""".stripMargin,
    "date_parse_safe" ->
      """SELECT o_orderkey,
        |  TRY_CAST(CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-date' ELSE strftime(o_orderdate, '%Y-%m-%d') END AS DATE) AS parsed_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props,'$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  max(CAST(json_extract_string(props,'$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "json_variant" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props,'$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  max(CAST(json_extract_string(props,'$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "coalesce_nested" ->
      """SELECT event_id,
        |  CASE WHEN CAST(json_extract_string(props,'$.k') AS INTEGER) % 3 = 0
        |       THEN 'face_' || json_extract_string(props,'$.k') || '_0'
        |       ELSE 'img_' || json_extract_string(props,'$.k') END AS top_img
        |FROM events ORDER BY event_id""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |  round(avg(l_quantity),2) AS avg_qty,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= '1998-09-02'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < '1998-03-15' AND l_shipdate > '1998-03-15'
        |GROUP BY 1,2,3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount),2) AS revenue, count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)),2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R' AND o_orderdate >= '1997-01-01' AND o_orderdate < '1997-07-01'
        |GROUP BY 1,2,3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_cross_join" ->
      """SELECT r_name, count(*) AS n_pairs, count(DISTINCT n_nationkey) AS n_nations
        |FROM region CROSS JOIN nation
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_full_outer_join" ->
      """WITH spenders AS (
        |  SELECT o_custkey, sum(o_totalprice) AS spend FROM orders GROUP BY 1 HAVING sum(o_totalprice) > 400000),
        |rich AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000)
        |SELECT CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NOT NULL THEN 'both'
        |            WHEN c_custkey IS NULL THEN 'spender_only' ELSE 'rich_only' END AS side,
        |  count(*) AS n, round(sum(coalesce(spend, 0.0)),2) AS total_spend
        |FROM spenders FULL OUTER JOIN rich ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_groupby_having" ->
      """SELECT o_orderpriority, count(*) AS n_orders, round(sum(o_totalprice),2) AS total_price
        |FROM orders GROUP BY 1 HAVING count(*) > 10 ORDER BY 1""".stripMargin,
    "q_broadcast_join" ->
      """SELECT p_brand, round(sum(l_extendedprice),2) AS revenue, count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_count_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_suppliers,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal),2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_set_ops" ->
      """WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |u AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |tagged AS (
        |  SELECT 'both' AS set_op, c_custkey FROM (SELECT * FROM b INTERSECT SELECT * FROM u)
        |  UNION ALL SELECT 'building_only', c_custkey FROM (SELECT * FROM b EXCEPT SELECT * FROM u)
        |  UNION ALL SELECT 'urgent_only', c_custkey FROM (SELECT * FROM u EXCEPT SELECT * FROM b))
        |SELECT set_op, count(*) AS n FROM tagged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(substr(p_name, 1, 8)) AS name_prefix,
        |  length(p_name) AS name_len,
        |  regexp_replace(p_name, '\s+', '_', 'g') AS name_snake
        |FROM part WHERE p_name LIKE '%bolt%' ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year, count(*) AS n,
        |  count(DISTINCT month(o_orderdate)) AS n_months,
        |  min(datediff('day', o_orderdate, DATE '1998-12-31')) AS min_age_days,
        |  max(datediff('day', o_orderdate, DATE '1998-12-31')) AS max_age_days
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_null_safe_join" ->
      """WITH cust AS (
        |  SELECT c_acctbal,
        |    CASE WHEN c_acctbal > 10.0 THEN 'pos' WHEN c_acctbal < -10.0 THEN 'neg' END AS bal_key
        |  FROM customer),
        |dim(bal_key, bucket_name) AS (VALUES ('pos','in_credit'), ('neg','in_debt'), (NULL,'flat'))
        |SELECT bucket_name, count(*) AS n, round(sum(c_acctbal),2) AS total_bal
        |FROM cust JOIN dim ON cust.bal_key IS NOT DISTINCT FROM dim.bal_key
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS o_totalprice
        |FROM orders o
        |WHERE o_totalprice = (SELECT max(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_pivot" ->
      """SELECT l_linestatus,
        |  round(sum(CASE WHEN l_returnflag='A' THEN l_quantity END),2) AS "A",
        |  round(sum(CASE WHEN l_returnflag='N' THEN l_quantity END),2) AS "N",
        |  round(sum(CASE WHEN l_returnflag='R' THEN l_quantity END),2) AS "R"
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5),2) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.9),2) AS p90_qty,
        |  quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) AS median_price_cents
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // tolerance gates: the sketch estimates are engine-specific, so the
    // spark side emits exact values + in-bound booleans and the oracle
    // asserts the booleans as literal TRUE (out-of-bound => hash mismatch)
    "q_approx_distinct" ->
      """SELECT l_linestatus,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  TRUE AS parts_ok, TRUE AS orders_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_approx_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5),2) AS exact_median_qty,
        |  quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) AS exact_p50_price_cents,
        |  quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.9) AS exact_p90_price_cents,
        |  TRUE AS median_qty_ok, TRUE AS p50_price_ok, TRUE AS p90_price_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_time_buckets" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type, count(*) AS n, round(sum(value),2) AS total_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT supp_nation, cust_nation, ship_year,
        |  round(sum(rev), 2) AS revenue, count(*) AS n_items
        |FROM (
        |  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |    year(l.l_shipdate) AS ship_year,
        |    l.l_extendedprice * (1.0 - l.l_discount) AS rev
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  WHERE sn.n_name IN ('NATION_3','NATION_8')
        |    AND cn.n_name IN ('NATION_3','NATION_8')
        |    AND sn.n_name <> cn.n_name) t
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """WITH base AS (
        |  SELECT year(o.o_orderdate) AS order_year,
        |    CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100, 0) AS BIGINT) AS rev_cents,
        |    sn.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey)
        |SELECT order_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_cents ELSE 0 END) AS BIGINT) AS nation_cents,
        |  CAST(sum(rev_cents) AS BIGINT) AS total_cents,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_cents ELSE 0 END) * 1000000
        |    // sum(rev_cents) AS BIGINT) AS share_ppm
        |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_product_profit" ->
      """SELECT sn.n_name AS supp_nation, year(o.o_orderdate) AS order_year,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100, 0) AS BIGINT)
        |    - CAST(round((0.1 * p.p_retailprice) * l.l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS profit_cents
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q14_promo_revenue" ->
      """WITH b AS (
        |  SELECT CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0) AS BIGINT) AS rev_cents, p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01')
        |SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_cents ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(sum(rev_cents) AS BIGINT) AS total_cents,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_cents ELSE 0 END) * 1000000
        |    // sum(rev_cents) AS BIGINT) AS promo_ppm
        |FROM b""".stripMargin,
    "q11_important_stock" ->
      """WITH value AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(round(p_retailprice * 100, 0) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |    WHERE n_name = 'NATION_3')
        |  GROUP BY 1)
        |SELECT l_partkey, value_cents FROM value
        |WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM value) * 2
        |ORDER BY value_cents DESC, l_partkey""".stripMargin,
    "q12_late_lines" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE date_diff('day', o_orderdate, l_shipdate) > 60
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_cust_distribution" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
        |    ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist FROM per_cust
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_cents = (SELECT max(total_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_part_supplier_cnt" ->
      """WITH bridge AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        |  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        |SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM bridge JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT * FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#2')),
        |avg_q AS (
        |  SELECT l_partkey AS pk, CAST(sum(l_quantity) AS BIGINT) AS sum_q,
        |    count(*) AS n_q
        |  FROM li GROUP BY 1)
        |SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) // 7 AS BIGINT) AS avg_yearly_cents
        |FROM li JOIN avg_q ON l_partkey = pk
        |WHERE CAST(l_quantity AS BIGINT) * n_q * 5 < sum_q""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_cents, sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q19_disjunctive_pred" ->
      """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q2_min_acct_supplier" ->
      """WITH shipped AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |cand AS (
        |  SELECT p_partkey, p_brand, p_size,
        |    CAST(round(s_acctbal * 100, 0) AS BIGINT) AS acct_cents, s_suppkey
        |  FROM shipped
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE p_size <= 5)
        |SELECT p_partkey, p_brand, p_size, acct_cents, s_suppkey FROM (
        |  SELECT *, row_number() OVER (PARTITION BY p_partkey ORDER BY acct_cents, s_suppkey) AS rn
        |  FROM cand) t
        |WHERE rn = 1 ORDER BY p_partkey""".stripMargin,
    "q20_excess_inventory" ->
      """WITH qualifying AS (
        |  SELECT DISTINCT l_suppkey FROM (
        |    SELECT l_suppkey, l_partkey, CAST(sum(l_quantity) AS BIGINT) AS shipped_qty
        |    FROM lineitem
        |    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        |      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'LARGE')
        |    GROUP BY 1, 2 HAVING sum(l_quantity) > 60))
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM qualifying)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_orders" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    date_diff('day', o_orderdate, l_shipdate) > 90 AS is_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |per_order AS (
        |  SELECT l_orderkey AS ok FROM li GROUP BY 1
        |  HAVING count(DISTINCT l_suppkey) >= 2
        |     AND count(DISTINCT CASE WHEN is_late THEN l_suppkey END) = 1),
        |waiting AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM li
        |  WHERE is_late AND l_orderkey IN (SELECT ok FROM per_order))
        |SELECT s_name, count(*) AS numwait
        |FROM waiting JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY numwait DESC, s_name""".stripMargin,
    "q22_sales_opportunity" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS acct_cents
        |  FROM customer),
        |thresh AS (
        |  SELECT CAST(sum(acct_cents) AS BIGINT) AS sum_pos, count(*) AS n_pos
        |  FROM cust WHERE acct_cents > 0)
        |SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(acct_cents) AS BIGINT) AS totacct_cents
        |FROM cust, thresh
        |WHERE acct_cents * n_pos > sum_pos
        |  AND c_custkey NOT IN (
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(grouping(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q_conditional_agg" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
        |  max_by(o_orderkey, CAST(round(o_totalprice * 100, 0) AS BIGINT)::HUGEINT * 1000000000000 + o_orderkey) AS biggest_order,
        |  min_by(o_orderkey, CAST(round(o_totalprice * 100, 0) AS BIGINT)::HUGEINT * 1000000000000 + o_orderkey) AS smallest_order,
        |  bool_or(o_orderstatus = 'F') AS any_filled,
        |  bool_and(o_totalprice > 0.0) AS all_positive
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_distinct_agg_multi" ->
      """SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT year(o_orderdate)) AS n_years, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_range_frame" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS o_cents
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, day, o_cents,
        |  CAST(sum(o_cents) OVER w AS BIGINT) AS rolling_cents,
        |  count(*) OVER w AS n_in_window
        |FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q_window_rank_stats" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS acct_cents
        |  FROM customer)
        |SELECT c_custkey, c_nationkey, acct_cents,
        |  CAST(dense_rank() OVER w AS BIGINT) AS d_rank,
        |  percent_rank() OVER w AS p_rank,
        |  cume_dist() OVER w AS c_dist
        |FROM c WINDOW w AS (PARTITION BY c_nationkey ORDER BY acct_cents)
        |ORDER BY c_custkey""".stripMargin,
    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT c_mktsegment AS seg,
        |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS day_cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |spine AS (
        |  SELECT seg, unnest(generate_series(0, (SELECT max(day) FROM daily))) AS day
        |  FROM (SELECT DISTINCT seg FROM daily) s)
        |SELECT seg, day,
        |  last_value(day_cents IGNORE NULLS) OVER (PARTITION BY seg ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
        |FROM spine LEFT JOIN daily USING (seg, day)
        |ORDER BY seg, day""".stripMargin,
    "q_stats_moments" ->
      """WITH o AS (
        |  SELECT o_orderpriority, CAST(round(o_totalprice, 0) AS BIGINT) AS x,
        |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS y
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
        |  CAST(sum(x * y) AS BIGINT) AS sum_xy,
        |  CAST(sum(x * x) AS BIGINT) AS sum_xx,
        |  CAST(sum(y * y) AS BIGINT) AS sum_yy
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_recursive_chain" ->
      """WITH RECURSIVE walk AS (
        |  SELECT s_suppkey AS node, s_suppkey AS anc, CAST(0 AS BIGINT) AS steps FROM supplier
        |  UNION ALL
        |  SELECT node, anc // 2, steps + 1 FROM walk WHERE anc > 1
        |)
        |SELECT node AS s_suppkey, CAST(max(steps) + 1 AS BIGINT) AS depth,
        |  CAST(sum(anc) AS BIGINT) AS path_sum
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,
    "q_lateral_topk" ->
      """SELECT n.n_name, t.c_custkey, t.acct_cents
        |FROM nation n, LATERAL (
        |  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS acct_cents
        |  FROM customer WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        |) t
        |ORDER BY n.n_name, t.acct_cents DESC, t.c_custkey""".stripMargin,
    "q_listagg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    // mergeable-HLL distinct counting: exact counts hash-gated, the
    // sketch/union path contract-gated by the in-plan ±5% boolean
    // (the text_heavy_hitters CMS gate shape)
    "q_hll_distinct" ->
      """SELECT grp, n_exact, TRUE AS est_ok FROM (
        |  SELECT o_orderpriority AS grp,
        |    count(DISTINCT o_custkey) AS n_exact
        |  FROM orders GROUP BY 1
        |  UNION ALL
        |  SELECT 'ALL', count(DISTINCT o_custkey) FROM orders)
        |ORDER BY grp""".stripMargin,
    // 2-D skyline: the oracle states the dominance rule LITERALLY as a
    // NOT EXISTS self-join; the implementation's running-max scan must
    // reproduce it row-for-row (ties at a frontier point all survive)
    "q_skyline" ->
      """WITH p AS (
        |  SELECT p_partkey,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
        |    CAST(p_size AS BIGINT) AS p_size
        |  FROM part)
        |SELECT a.p_partkey, a.price_cents, a.p_size
        |FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
        |    AND (b.price_cents < a.price_cents OR b.p_size > a.p_size))
        |ORDER BY a.price_cents, a.p_partkey""".stripMargin,
    // one-pass column profiling: per-column UNION ALL report, money as
    // exact cents, min/max canonicalized to strings
    "q_profile_columns" ->
      """WITH o AS (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents FROM orders)
        |SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |  count(*) - count(o_orderkey) AS n_null, count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS VARCHAR) AS min_str, CAST(max(o_orderkey) AS VARCHAR) AS max_str FROM o
        |UNION ALL
        |SELECT 'o_custkey', count(*), count(*) - count(o_custkey), count(DISTINCT o_custkey),
        |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM o
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus),
        |  min(o_orderstatus), max(o_orderstatus) FROM o
        |UNION ALL
        |SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority), count(DISTINCT o_orderpriority),
        |  min(o_orderpriority), max(o_orderpriority) FROM o
        |UNION ALL
        |SELECT 'total_cents', count(*), count(*) - count(total_cents), count(DISTINCT total_cents),
        |  CAST(min(total_cents) AS VARCHAR), CAST(max(total_cents) AS VARCHAR) FROM o
        |ORDER BY col_name""".stripMargin,
    // journey paths: the sessionize break rule + (ts, event_id) ordered
    // string_agg, frequency-ranked — replayed literally
    "q_event_paths" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sessions AS (
        |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id) AS rn
        |  FROM sessions
        |), p AS (
        |  SELECT user_id, session_seq, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 8 GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM p
        |GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    // MAD anomaly flags: lower medians stated literally as rank
    // (m+1)//2 in (value, hour) order — integer-exact on both engines
    "q_event_anomaly" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS ts_hour, count(*) AS n FROM events GROUP BY 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY n, ts_hour) AS rn, count(*) OVER () AS m FROM h),
        |med AS (SELECT n AS med FROM r WHERE rn = (m + 1) // 2),
        |rd AS (SELECT h.ts_hour, h.n, abs(h.n - med.med) AS dev FROM h, med),
        |r2 AS (SELECT *, row_number() OVER (ORDER BY dev, ts_hour) AS rn, count(*) OVER () AS m FROM rd),
        |mad AS (SELECT dev AS mad FROM r2 WHERE rn = (m + 1) // 2)
        |SELECT rd.ts_hour, rd.n, CAST(rd.dev AS BIGINT) AS deviation,
        |  rd.dev > 3 * mad.mad AS is_anomaly
        |FROM rd, mad ORDER BY rd.ts_hour""".stripMargin,
    // bloom semi-join reduction: the oracle is the PLAIN join — passing
    // proves the bloom pre-filter is semantically free (fp-safe)
    "q_bloom_semijoin" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'AUTOMOBILE'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // PageRank: the oracle UNROLLS the 5 damped integer-exact iterations
    // as chained CTEs (aggregation over a recursive reference is not
    // portable SQL — the k-means precedent); every rank is replayed
    // bit-for-bit in ppm units with truncating division
    "q_pagerank" ->
      """WITH nodes AS (SELECT s_suppkey AS v FROM supplier),
        |edges AS (
        |  SELECT s_suppkey AS src, s_suppkey // 2 AS dst FROM supplier WHERE s_suppkey >= 1
        |  UNION ALL
        |  SELECT s_suppkey, s_suppkey // 3 FROM supplier WHERE s_suppkey >= 1),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        |ed AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d USING (src)),
        |r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS rank FROM nodes),
        |r1 AS (SELECT n.v, CAST(150000 + (850000 * coalesce(sum(r.rank // e.outdeg), 0)) // 1000000 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN ed e ON e.dst = n.v LEFT JOIN r0 r ON r.v = e.src GROUP BY n.v),
        |r2 AS (SELECT n.v, CAST(150000 + (850000 * coalesce(sum(r.rank // e.outdeg), 0)) // 1000000 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN ed e ON e.dst = n.v LEFT JOIN r1 r ON r.v = e.src GROUP BY n.v),
        |r3 AS (SELECT n.v, CAST(150000 + (850000 * coalesce(sum(r.rank // e.outdeg), 0)) // 1000000 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN ed e ON e.dst = n.v LEFT JOIN r2 r ON r.v = e.src GROUP BY n.v),
        |r4 AS (SELECT n.v, CAST(150000 + (850000 * coalesce(sum(r.rank // e.outdeg), 0)) // 1000000 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN ed e ON e.dst = n.v LEFT JOIN r3 r ON r.v = e.src GROUP BY n.v),
        |r5 AS (SELECT n.v, CAST(150000 + (850000 * coalesce(sum(r.rank // e.outdeg), 0)) // 1000000 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN ed e ON e.dst = n.v LEFT JOIN r4 r ON r.v = e.src GROUP BY n.v)
        |SELECT v AS s_suppkey, rank AS rank_ppm FROM r5 ORDER BY s_suppkey""".stripMargin,
    // data-quality rules: the oracle states each rule literally; the
    // accepted-values rule excludes the real 'P' status on purpose so
    // the report carries genuine violation traffic
    "q_dq_rules" ->
      """WITH agg AS (
        |  SELECT count(*) AS n_rows,
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_pk,
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F') THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_nulldate
        |  FROM orders),
        |fk AS (
        |  SELECT CAST(count(*) AS BIGINT) AS v_fk
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |  WHERE c_custkey IS NULL)
        |SELECT 'fk_custkey_in_customer' AS rule, v_fk AS violations, n_rows, v_fk = 0 AS passed FROM agg, fk
        |UNION ALL SELECT 'orderdate_not_null', v_nulldate, n_rows, v_nulldate = 0 FROM agg, fk
        |UNION ALL SELECT 'pk_unique_orderkey', v_pk, n_rows, v_pk = 0 FROM agg, fk
        |UNION ALL SELECT 'status_in_accepted_set', v_status, n_rows, v_status = 0 FROM agg, fk
        |UNION ALL SELECT 'totalprice_positive', v_price, n_rows, v_price = 0 FROM agg, fk
        |ORDER BY rule""".stripMargin,
    // incremental aggregate maintenance: the oracle is the FULL direct
    // recompute — passing proves merge(partial(base), partial(delta))
    // equals agg(whole), the law the materialized-view refresh rests on
    "q_incremental_agg_merge" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
        |  CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_unpivot" ->
      """SELECT l_returnflag, metric, val FROM (
        |  SELECT l_returnflag,
        |    CAST(sum(l_quantity) AS BIGINT) AS qty,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
        |  FROM lineitem GROUP BY l_returnflag
        |) UNPIVOT (val FOR metric IN (qty, price_cents))
        |ORDER BY l_returnflag, metric""".stripMargin,
    "q_window_topk" ->
      """SELECT o_orderpriority, rank_in_group, o_orderkey, round(o_totalprice,2) AS o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_group
        |  FROM orders) t
        |WHERE rank_in_group <= 3 ORDER BY o_orderpriority, rank_in_group""".stripMargin,
    "q_window_lead_lag" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  lag(o_orderdate, 1) OVER w AS prev_date,
        |  lead(o_orderdate, 1) OVER w AS next_date,
        |  datediff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS days_since_prev
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_topk_custom_plan" ->
      """SELECT o_orderpriority, o_orderkey, round(o_totalprice,2) AS o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_window_ntile" ->
      """SELECT o_orderpriority, quartile, count(*) AS n, round(sum(o_totalprice),2) AS total FROM (
        |  SELECT o_orderpriority, o_totalprice,
        |    ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS quartile
        |  FROM orders) t
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_retention_cohort" ->
      """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM d GROUP BY user_id),
        |a AS (SELECT DISTINCT d.user_id, f.cohort,
        |        CAST((d.d - f.cohort) // 7 AS BIGINT) AS week_offset
        |      FROM d JOIN f USING (user_id))
        |SELECT cohort, week_offset, count(*) AS n_active
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_event_funnel" ->
      """WITH t_s AS (
        |  SELECT user_id, min(ts) AS t_signup FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |t_c AS (
        |  SELECT e.user_id, min(ts) AS t_click
        |  FROM events e JOIN t_s USING (user_id)
        |  WHERE event_type = 'click'
        |    AND ts >= t_signup AND ts <= t_signup + INTERVAL 12 HOUR
        |  GROUP BY 1),
        |t_p AS (
        |  SELECT e.user_id, min(ts) AS t_purchase
        |  FROM events e JOIN t_c USING (user_id)
        |  WHERE event_type = 'purchase'
        |    AND ts >= t_click AND ts <= t_click + INTERVAL 12 HOUR
        |  GROUP BY 1),
        |per_user AS (
        |  SELECT u.user_id,
        |    CASE WHEN t_purchase IS NOT NULL THEN 3
        |         WHEN t_click IS NOT NULL THEN 2
        |         WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END AS funnel_stage
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  LEFT JOIN t_s USING (user_id)
        |  LEFT JOIN t_c USING (user_id)
        |  LEFT JOIN t_p USING (user_id))
        |SELECT funnel_stage, count(*) AS n_users
        |FROM per_user GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sessions AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, min(ts) AS session_start, count(*) AS n_events, round(sum(value),2) AS session_value
        |FROM sessions GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // watermark-lateness accounting: the oracle replays the arrival order
    // (event_id) with an exclusive running-max window — the per-event
    // watermark — and recomputes every per-hour drop metric exactly
    "stream_late_data" ->
      """WITH o AS (
        |  SELECT event_id, ts,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    max(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_us
        |  FROM events),
        |c AS (
        |  SELECT date_trunc('hour', ts) AS bucket,
        |    CASE WHEN wm_us IS NOT NULL AND ts_us < wm_us - 7200000000 THEN 1 ELSE 0 END AS late,
        |    CASE WHEN wm_us IS NOT NULL AND ts_us < wm_us - 7200000000
        |      THEN (wm_us - 7200000000 - ts_us) // 1000000 ELSE 0 END AS late_s
        |  FROM o)
        |SELECT bucket, count(*) AS n_total,
        |  CAST(sum(late) AS BIGINT) AS n_dropped,
        |  CAST(count(*) - sum(late) AS BIGINT) AS n_kept,
        |  CAST(max(late_s) AS BIGINT) AS max_late_s
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical rows contract to q_sessionize (batch/stream equivalence is
    // the point of the operator), so it shares the same oracle SQL
    "stream_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sessions AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, min(ts) AS session_start, count(*) AS n_events, round(sum(value),2) AS session_value
        |FROM sessions GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, v.event_id AS view_event_id, round(v.value,2) AS view_value
        |FROM (SELECT * FROM events WHERE event_type='purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='view') v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_range_join" ->
      """SELECT size_class, count(*) AS n_parts, round(avg(p_retailprice),2) AS avg_price
        |FROM part JOIN (VALUES (0,10,'small'),(10,25,'medium'),(25,40,'large'),(40,1000,'huge')) AS b(lo,hi,size_class)
        |  ON p_size >= lo AND p_size < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_skew_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_events, round(sum(value),2) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the oracle reads the RAW table: the Z-ordered rewrite must be
    // row-for-row lossless under the 2-D box predicate
    "q_zorder_prune" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem
        |WHERE l_partkey BETWEEN 20 AND 120 AND l_suppkey BETWEEN 2 AND 8
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_zorder3_prune" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem
        |WHERE l_partkey BETWEEN 20 AND 120 AND l_suppkey BETWEEN 2 AND 8
        |  AND l_quantity BETWEEN 10 AND 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_skew_diagnose" ->
      """WITH pk AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
        |top AS (SELECT string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY cnt DESC, user_id) AS top_keys
        |        FROM (SELECT * FROM pk ORDER BY cnt DESC, user_id LIMIT 3))
        |SELECT count(*) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(max(cnt) AS BIGINT) AS max_cnt,
        |  CAST(max(cnt) * count(*) * 1000000 // sum(cnt) AS BIGINT) AS skew_ppm,
        |  CAST(max(cnt) * 1000000 // sum(cnt) AS BIGINT) AS top_share_ppm,
        |  (SELECT top_keys FROM top) AS top_keys
        |FROM pk""".stripMargin,
    "q_time_skew_diagnose" ->
      """WITH pb AS (SELECT date_trunc('hour', ts) AS bucket, count(*) AS cnt FROM events GROUP BY 1),
        |top AS (SELECT string_agg(CAST(bucket AS VARCHAR), ',' ORDER BY cnt DESC, bucket) AS top_buckets
        |        FROM (SELECT * FROM pb ORDER BY cnt DESC, bucket LIMIT 3))
        |SELECT count(*) AS n_buckets,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(max(cnt) AS BIGINT) AS max_cnt,
        |  CAST(max(cnt) * count(*) * 1000000 // sum(cnt) AS BIGINT) AS skew_ppm,
        |  CAST(max(cnt) * 1000000 // sum(cnt) AS BIGINT) AS top_share_ppm,
        |  (SELECT top_buckets FROM top) AS top_buckets
        |FROM pb""".stripMargin,
    // raw-table oracle: the shatter -> compact round-trip must be
    // row-for-row lossless
    "q_compact_read" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // raw-table oracle again: the hive-partitioned rewrite must be
    // row-for-row lossless under the month filter
    "q_partition_prune" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  round(o_totalprice, 2) AS o_totalprice, o_orderdate,
        |  strftime(o_orderdate, '%Y-%m') AS order_month
        |FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '1996-03'
        |ORDER BY o_orderkey""".stripMargin,
    // bucketed co-located join: the oracle computes the same join +
    // per-priority aggregates from the raw tables — a bucket misroute or
    // sort violation on the Spark side joins partially and breaks the hash
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the synthesized card/set corpus is a pure function of the row index,
    // so the oracles regenerate it from range() — no fixture tables needed
    "ingest_json_cards" -> CardsIngestOracle,
    // the file path reads the SAME 500 cards back from disk (plus 5
    // corrupt lines the PERMISSIVE policy must drop), so its oracle is
    // identical to ingest_json_cards — a hash mismatch means the file
    // scan, split handling, or corrupt-record policy broke
    "ingest_json_cards_file" -> CardsIngestOracle,
    // identical corpus read back from CSV (scalars typed, nested
    // columns as JSON strings, 5 malformed lines dropped by PERMISSIVE)
    // and from ORC (full nested schema native) — same oracle as the
    // JSON file path, so a mismatch isolates the source implementation
    // and from Avro container files (full nested schema as generic
    // records through the Hadoop AvroKeyInputFormat — the environment
    // has no spark-avro DataSource, so graft.sources.AvroTable maps
    // records<->rows in the scan/write tasks)
    "ingest_csv_cards" -> CardsIngestOracle,
    "ingest_orc_cards" -> CardsIngestOracle,
    "ingest_avro_cards" -> CardsIngestOracle,
    "ingest_json_sets" ->
      """SELECT
        |  'setid-' || CAST(i AS VARCHAR) AS id,
        |  'S' || CAST(i AS VARCHAR) AS code,
        |  'Set ' || CAST(i AS VARCHAR) AS name,
        |  TRY_CAST(CASE WHEN i % 7 = 0 THEN 'bogus'
        |    ELSE '20' || lpad(CAST(i % 25 AS VARCHAR), 2, '0') || '-01-15' END AS DATE) AS released_date,
        |  (['expansion','core','masters','token'])[CAST(i % 4 AS INT) + 1] AS set_type,
        |  CAST(i % 300 + 50 AS INT) AS card_count,
        |  CASE WHEN i % 5 = 0 THEN 'S' || CAST(i + 1 AS VARCHAR) ELSE NULL END AS parent_set_code,
        |  i % 11 = 0 AS digital
        |FROM range(0, 40) t(i) ORDER BY id""".stripMargin,
    // drift oracle: the planted novel fields are deterministic in i, so
    // DuckDB recomputes the values the VARIANT _rest column must yield via
    // variant_get — a mismatch means drift fields were dropped or mangled
    "ingest_schema_drift" ->
      """SELECT
        |  'card-' || CAST(i AS VARCHAR) AS id,
        |  'Card ' || CAST(i AS VARCHAR) AS name,
        |  i % 11 <> 0 AS layout_valid,
        |  CASE WHEN i % 4 = 0 THEN 2 ELSE 0 END AS n_rest_fields,
        |  CASE WHEN i % 4 = 0 THEN i % 7 END AS power_level,
        |  CASE WHEN i % 4 = 0 THEN 't' || CAST(i % 3 AS VARCHAR) END AS first_tag
        |FROM range(0, 500) t(i) ORDER BY id""".stripMargin,
    // parquet schema evolution: the raw table replayed through the same
    // parity split — early-generation rows must aggregate as a NULL
    // group for the late-added columns, money in exact cents
    "ingest_parquet_evolve" ->
      """WITH ev AS (
        |  SELECT l_orderkey % 2 AS gen,
        |    CASE WHEN l_orderkey % 2 = 1 THEN l_returnflag END AS l_returnflag,
        |    l_quantity,
        |    CASE WHEN l_orderkey % 2 = 1 THEN l_extendedprice END AS l_extendedprice
        |  FROM lineitem)
        |SELECT CAST(gen AS BIGINT) AS gen, l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Avro reader-schema evolution: same parity split and aggregate as
    // the parquet footer-merge twin — the mechanism under test differs
    // (per-file writer-vs-reader resolution with [null,T] defaults),
    // the truth does not
    "ingest_avro_evolve" ->
      """WITH ev AS (
        |  SELECT l_orderkey % 2 AS gen,
        |    CASE WHEN l_orderkey % 2 = 1 THEN l_returnflag END AS l_returnflag,
        |    l_quantity,
        |    CASE WHEN l_orderkey % 2 = 1 THEN l_extendedprice END AS l_extendedprice
        |  FROM lineitem)
        |SELECT CAST(gen AS BIGINT) AS gen, l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the README's ad-hoc SQL example: layout='split' cards joined to sets.
    // layout cycles over the 24 allowed values except every 11th card
    // ('weird'); 'split' is index 1 -> i % 24 = 1, minus the %11 overlap
    "q_sql_adhoc" ->
      """SELECT
        |  'card-' || CAST(i AS VARCHAR) AS id,
        |  'Card ' || CAST(i AS VARCHAR) AS name,
        |  'split' AS layout,
        |  (['common','uncommon','rare','mythic'])[CAST(i % 4 AS INT) + 1] AS rarity,
        |  'Set ' || CAST(i % 40 AS VARCHAR) AS set_name,
        |  -- the joined set is S(i % 40) and its set_type cycles %4; 40 is
        |  -- divisible by 4 so the card's own i%4 indexes the same value
        |  (['expansion','core','masters','token'])[CAST(i % 4 AS INT) + 1] AS set_type
        |FROM range(0, 500) t(i)
        |WHERE i % 24 = 1 AND i % 11 <> 0
        |ORDER BY id""".stripMargin,
    "q_cards_keyword_filter" ->
      """WITH cards AS (
        |  SELECT i,
        |    'card-' || CAST(i AS VARCHAR) AS id,
        |    'Card ' || CAST(i AS VARCHAR) AS name,
        |    'S' || CAST(i % 40 AS VARCHAR) AS set_code,
        |    (['common','uncommon','rare','mythic'])[CAST(i % 4 AS INT) + 1] AS rarity,
        |    ['Flying', 'Keyword' || CAST(i % 6 AS VARCHAR)] AS kw,
        |    (['W','U','B','R','G'])[1:CAST(i % 5 AS INT) + 1] AS ci
        |  FROM range(0, 500) t(i))
        |SELECT id, name, set_code, rarity,
        |  array_to_string(kw, ',') AS keywords,
        |  array_to_string(ci, '') AS color_id
        |FROM cards
        |WHERE list_contains(kw, 'Keyword3')
        |  AND len(list_filter(ci, c -> c NOT IN ('W','U'))) = 0
        |ORDER BY id""".stripMargin,
    "q_cards_text_search" ->
      """WITH cards AS (
        |  SELECT
        |    'card-' || CAST(i AS VARCHAR) AS id,
        |    'Card ' || CAST(i AS VARCHAR) AS name,
        |    'Rules text for card ' || CAST(i AS VARCHAR) || '.' AS oracle_text
        |  FROM range(0, 500) t(i)),
        |flags AS (
        |  SELECT id, name, oracle_text,
        |    contains(lower(name), 'card 12') AS name_match,
        |    list_contains(string_split_regex(lower(oracle_text), '\s+'), '12.') AS text_match
        |  FROM cards)
        |SELECT id, name, oracle_text, name_match, text_match
        |FROM flags WHERE name_match OR text_match ORDER BY id""".stripMargin,
    "q_cards_cmc_range" ->
      """SELECT 'card-' || CAST(i AS VARCHAR) AS id,
        |  'Card ' || CAST(i AS VARCHAR) AS name,
        |  CAST(i % 12 AS DOUBLE) AS cmc,
        |  (['common','uncommon','rare','mythic'])[CAST(i % 4 AS INT) + 1] AS rarity
        |FROM range(0, 500) t(i)
        |WHERE i % 12 BETWEEN 2 AND 4
        |ORDER BY id""".stripMargin,
    "q_cards_oracle_lookup" ->
      """SELECT 'card-' || CAST(i AS VARCHAR) AS id,
        |  'oracle-' || CAST(i % 400 AS VARCHAR) AS oracle_id,
        |  'Card ' || CAST(i AS VARCHAR) AS name,
        |  'S' || CAST(i % 40 AS VARCHAR) AS set_code,
        |  (['common','uncommon','rare','mythic'])[CAST(i % 4 AS INT) + 1] AS rarity
        |FROM range(0, 500) t(i)
        |WHERE i % 400 = 42
        |ORDER BY id""".stripMargin,
    "q_cards_per_set" ->
      """WITH cards AS (
        |  SELECT i,
        |    'S' || CAST(i % 40 AS VARCHAR) AS code,
        |    i % 12 AS cmc,
        |    CASE WHEN i % 5 = 0 THEN NULL ELSE (i % 300) * 100 + (i % 100) END AS price_cents,
        |    i % 11 <> 0 AS layout_valid
        |  FROM range(0, 500) t(i)),
        |sets AS (
        |  SELECT 'S' || CAST(i AS VARCHAR) AS code, 'Set ' || CAST(i AS VARCHAR) AS set_name
        |  FROM range(0, 40) t(i))
        |SELECT s.code, s.set_name, count(*) AS n_cards,
        |  CAST(sum(CASE WHEN layout_valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_layout,
        |  CAST(sum(cmc) AS BIGINT) AS sum_cmc,
        |  CAST(sum(price_cents) AS BIGINT) AS sum_price_cents
        |FROM cards c JOIN sets s ON c.code = s.code
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // the oracle recomputes the probe decisions FROM SCRATCH (exact
    // Jaccard of probe class vs base ∪ appended) — a hash match
    // certifies that probing the persisted postings+shingles index is
    // decision-identical to full recomputation, including the appended
    // generation (n_from_append would zero out if the append never
    // landed in the store)
    "dedup_index_serve" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(words[i:i+2], ' ') FOR i IN range(1, greatest(len(words)-2, 1)+1)]) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents)),
        |probe AS (SELECT * FROM sh WHERE doc_id % 7 = 3),
        |idx AS (SELECT * FROM sh WHERE doc_id % 7 <> 3),
        |near AS (
        |  SELECT p.doc_id, count(*) AS n_near_dups,
        |    sum(CASE WHEN i.doc_id % 7 = 5 THEN 1 ELSE 0 END) AS n_from_append
        |  FROM probe p JOIN idx i
        |    ON 2 * len(list_intersect(p.s, i.s)) >= len(p.s) + len(i.s) - len(list_intersect(p.s, i.s))
        |  GROUP BY 1)
        |SELECT p.doc_id,
        |  CAST(coalesce(n.n_near_dups, 0) AS BIGINT) AS n_near_dups,
        |  CAST(coalesce(n.n_from_append, 0) AS BIGINT) AS n_from_append,
        |  CAST(CASE WHEN coalesce(n.n_near_dups, 0) = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_novel
        |FROM probe p LEFT JOIN near n USING (doc_id) ORDER BY p.doc_id""".stripMargin,
    // maintenance replay: the oracle recomputes probe decisions over the
    // SURVIVOR set (base ∪ appended minus the retracted ≡ 5 mod 14
    // class) — a retraction leaking a dropped doc's postings or losing a
    // survivor's shifts a count; compaction must be row-invisible
    "dedup_index_maintain" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(words[i:i+2], ' ') FOR i IN range(1, greatest(len(words)-2, 1)+1)]) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents)),
        |probe AS (SELECT * FROM sh WHERE doc_id % 7 = 3),
        |idx AS (SELECT * FROM sh WHERE doc_id % 7 <> 3 AND doc_id % 14 <> 5),
        |near AS (
        |  SELECT p.doc_id, count(*) AS n_near_dups,
        |    sum(CASE WHEN i.doc_id % 7 = 5 THEN 1 ELSE 0 END) AS n_from_append
        |  FROM probe p JOIN idx i
        |    ON 2 * len(list_intersect(p.s, i.s)) >= len(p.s) + len(i.s) - len(list_intersect(p.s, i.s))
        |  GROUP BY 1)
        |SELECT p.doc_id,
        |  CAST(coalesce(n.n_near_dups, 0) AS BIGINT) AS n_near_dups,
        |  CAST(coalesce(n.n_from_append, 0) AS BIGINT) AS n_from_append,
        |  CAST(CASE WHEN coalesce(n.n_near_dups, 0) = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_novel
        |FROM probe p LEFT JOIN near n USING (doc_id) ORDER BY p.doc_id""".stripMargin,
    // v2 = the post-merge state read AS-OF (after v3 committed); v3 = the
    // live post-delete state — erased keys must be readable in v2 and
    // gone from v3, exactly the time-travel/erasure split the manifest
    // format promises (vacuum, the physical-erasure half, is spec-pinned)
    "lake_delete_asof" ->
      """WITH v2 AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 1 THEN 'U' ELSE o_orderstatus END AS o_orderstatus
        |  FROM orders),
        |v3 AS (SELECT * FROM v2 WHERE o_orderkey % 53 <> 0)
        |SELECT 2 AS version, o_orderkey, o_orderstatus FROM v2
        |UNION ALL
        |SELECT 3, o_orderkey, o_orderstatus FROM v3
        |ORDER BY version, o_orderkey""".stripMargin,
    // v1->v3 diff = updates for the merged class (minus erased keys),
    // deletes for the erased class, after-image NULL on deletes;
    // v2->v3 must contain ONLY the deletes (the merge landed before v2)
    "lake_change_feed" ->
      """SELECT 1 AS from_v, 3 AS to_v, o_orderkey,
        |  CASE WHEN o_orderkey % 53 = 0 THEN 'delete' ELSE 'update' END AS _change_type,
        |  CASE WHEN o_orderkey % 53 = 0 THEN NULL ELSE 'U' END AS o_orderstatus
        |FROM orders WHERE o_orderkey % 53 = 0 OR o_orderkey % 11 = 1
        |UNION ALL
        |SELECT 2, 3, o_orderkey, 'delete', CAST(NULL AS VARCHAR)
        |FROM orders WHERE o_orderkey % 53 = 0
        |ORDER BY from_v, o_orderkey""".stripMargin,
    // compaction must be state-preserving: the post-compaction read is
    // bit-identical to the plain post-merge state (file-layout halves
    // are spec-pinned — SQL cannot see them)
    "lake_compact_read" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 1013 = 1 THEN 'U' ELSE o_orderstatus END AS o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // the evolved snapshot: merged rows carry the new column, every
    // surviving old row reads NULL in it (old files keep their on-disk
    // schema; the table schema is the union)
    "lake_schema_evolve" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 13 = 2 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 13 = 2 THEN o_orderpriority END AS o_priority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // the Z-order layout serves a 2-D box from manifest stats: the
    // entry REQUIRES the box pruned >= half the files; the oracle scans
    // the raw table under the same box
    "lake_zorder_scan" ->
      """WITH b AS (
        |  SELECT CAST(max(l_partkey) AS BIGINT) AS mp,
        |         CAST(max(l_suppkey) AS BIGINT) AS ms FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
        |FROM lineitem, b
        |WHERE l_partkey BETWEEN mp // 10 AND mp // 10 + greatest(mp // 20, 1)
        |  AND l_suppkey BETWEEN ms // 5 AND ms // 5 + greatest(ms // 5, 1)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // ALTER ADD COLUMN is a header-only commit (entry REQUIRES zero
    // files moved and the pre-ALTER version keeping its 2-col schema);
    // pre-evolution rows read the new column as null, the upserted key
    // class carries values — the oracle replays the final state
    "lake_sql_alter" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 53 = 7 THEN 'A' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 53 = 7 THEN 'note' ELSE CAST(NULL AS VARCHAR) END AS o_note
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // the row-level MERGE forms, replayed clause by clause: statement 1
    // deletes even-custkey matched rows (first clause wins), partially
    // updates the rest with a two-sided value (ck -> 2ck+7, 'R'),
    // inserts offset keys ('I', 42); statement 2 marks matched %3=0
    // keys 'K', NMBS-deletes %5=1 keys, NMBS-updates ck>100 to 'X'
    "lake_merge_row" ->
      """WITH t1 AS (
        |  SELECT o_orderkey, 'R' AS st, 2 * o_custkey + 7 AS ck FROM orders
        |  WHERE o_orderkey % 31 = 4 AND o_custkey % 2 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_custkey FROM orders
        |  WHERE o_orderkey % 31 <> 4
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, 'I', 42 FROM orders WHERE o_orderkey % 31 = 4
        |)
        |SELECT o_orderkey,
        |  CASE WHEN o_orderkey < 1000000000 AND o_orderkey % 3 = 0 THEN 'K'
        |       WHEN ck > 100 THEN 'X'
        |       ELSE st END AS o_orderstatus,
        |  ck AS o_custkey
        |FROM t1
        |WHERE (o_orderkey < 1000000000 AND o_orderkey % 3 = 0) OR o_orderkey % 5 <> 1
        |ORDER BY o_orderkey""".stripMargin,
    // CALL system.zorder re-clustered a hash layout (entry REQUIRES the
    // box to prune nothing before and >= half after); the box scan is
    // row-exact against the raw range predicate
    "lake_zorder_call" ->
      """WITH b AS (
        |  SELECT CAST(max(l_partkey) AS BIGINT) AS mp,
        |         CAST(max(l_suppkey) AS BIGINT) AS ms FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
        |FROM lineitem, b
        |WHERE l_partkey BETWEEN mp // 10 AND mp // 10 + greatest(mp // 20, 1)
        |  AND l_suppkey BETWEEN ms // 5 AND ms // 5 + greatest(ms // 5, 1)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // CREATE TABLE AS SELECT (entry REQUIRES 3 versions: create + CTAS
    // write + upsert); the follow-up INSERT must upsert, not append
    "lake_sql_ctas" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 61 = 13 THEN 'C' ELSE o_orderstatus END AS o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // two cluster_buckets=16 lake tables joined on the clustering key
    // (entry REQUIRES a shuffle-family join with ZERO Exchange — the
    // storage-partitioned join); the oracle replays the join over the
    // raw tables, so a bucket misalignment loses or duplicates rows
    "lake_cluster_join" ->
      """SELECT o.o_orderkey, o.o_orderstatus, l.line_cnt, l.ln_sum
        |FROM orders o
        |JOIN (SELECT l_orderkey, count(*) AS line_cnt,
        |        CAST(sum(l_linenumber) AS BIGINT) AS ln_sum
        |      FROM lineitem GROUP BY l_orderkey) l
        |  ON o.o_orderkey = l.l_orderkey
        |ORDER BY o.o_orderkey""".stripMargin,
    // a 16x8 clustered pair joins EXCHANGE-FREE (the entry requires the
    // zero-Exchange plan — the 16-side folds bucket % 8 via the
    // ReducibleFunction contract); the oracle replays the join rows
    "lake_cluster_fold" ->
      """SELECT o.o_orderkey, o.o_orderstatus, l.line_cnt
        |FROM orders o
        |JOIN (SELECT l_orderkey, count(*) AS line_cnt
        |      FROM lineitem GROUP BY l_orderkey) l
        |  ON o.o_orderkey = l.l_orderkey
        |ORDER BY o.o_orderkey""".stripMargin,
    // a dimension filter's surviving join keys prune the lake fact scan
    // at RUNTIME (entry REQUIRES the dynamic-pruning filter in the
    // executed plan and >= 4x manifest-entry skipping); the oracle
    // replays the semi-join, so a wrongly-skipped file breaks the hash
    "lake_runtime_prune" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey IN (
        |  SELECT dk FROM (SELECT o_orderkey AS dk FROM orders
        |                  ORDER BY o_orderkey LIMIT 40)
        |  WHERE dk % 2 = 0)
        |ORDER BY o_orderkey""".stripMargin,
    // header-only RENAME/DROP/re-ADD via column mapping (entry REQUIRES
    // zero data files moved across all three ALTERs, the as-of read
    // keeping its version's names/values, and NULL for every pre-add
    // row of the re-added column); the upsert lands under new names
    "lake_column_map" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 37 = 5 THEN 'R' ELSE o_orderstatus END AS status,
        |  CASE WHEN o_orderkey % 37 = 5 THEN o_totalprice ELSE NULL END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // a plain parquet directory converted to a lake table IN PLACE
    // (entry REQUIRES v1 to reference exactly the pre-existing files —
    // zero data I/O), then merged/DV-deleted/time-traveled over
    "lake_convert" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 41 = 6 THEN 'C' ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice
        |FROM orders WHERE o_orderkey % 53 <> 17
        |ORDER BY o_orderkey""".stripMargin,
    // plain SQL over the registered graftlake source at versionAsOf=2:
    // the low-band merge ('Q' for keys < 400) is visible, the predicate
    // pushes down to manifest pruning, the residual re-applies
    "lake_sql_source" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey < 400 THEN 'Q' ELSE o_orderstatus END AS o_orderstatus
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 3000
        |ORDER BY o_orderkey""".stripMargin,
    // two branches of one zero-copy clone: the clone's merge applies to
    // its branch only; the source must read bit-unchanged
    "lake_clone_merge" ->
      """SELECT 'clone' AS branch, o_orderkey,
        |  CASE WHEN o_orderkey % 19 = 4 THEN 'C' ELSE o_orderstatus END AS o_orderstatus
        |FROM orders
        |UNION ALL
        |SELECT 'src', o_orderkey, o_orderstatus FROM orders
        |ORDER BY branch, o_orderkey""".stripMargin,
    // restore rolls the BAD merge (%23=3 -> 'B') out of the live state;
    // only the post-restore GOOD merge survives
    "lake_restore_read" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 29 = 5 THEN 'G' ELSE o_orderstatus END AS o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // the evolving commit's diff in the TARGET schema: updates carry the
    // new column, pre-images read null in it, rewritten-verbatim
    // survivors stay silent
    "lake_evolve_feed" ->
      """SELECT o_orderkey, 'update' AS _change_type, 'U' AS o_orderstatus,
        |  o_orderpriority AS o_priority, o_orderstatus AS _before_o_orderstatus
        |FROM orders WHERE o_orderkey % 13 = 2 ORDER BY o_orderkey""".stripMargin,
    // the scoped partition healed its sidecars, unscoped partitions
    // carried by reference and still apply theirs at read (both
    // entry-gated); the oracle replays the delete over the raw table
    "lake_compact_where" ->
      """SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
        |WHERE o_orderkey % 17 <> 3 ORDER BY o_orderkey""".stripMargin,
    // phase 1 answered metadata-only from the manifest (entry-gated),
    // phase 2 after a DV delete fell back to the row scan (also
    // entry-gated); the oracle replays both phases from the raw table
    "lake_agg_push" ->
      """SELECT 'clean' AS phase, CAST(count(*) AS BIGINT) AS n_orders,
        |  min(o_orderkey) AS min_k, max(o_orderkey) AS max_k FROM orders
        |UNION ALL
        |SELECT 'deleted', CAST(count(*) AS BIGINT),
        |  min(o_orderkey), max(o_orderkey)
        |FROM orders WHERE o_orderkey % 19 <> 6 AND o_orderkey % 13 <> 4
        |UNION ALL
        |SELECT 'posdel', CAST(count(*) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |FROM orders WHERE o_orderkey % 19 <> 6
        |ORDER BY phase""".stripMargin,
    // the MV maintained from ONE change feed crossing a RENAME commit
    // (v2 batch under the old name, v4 under the new): the oracle
    // recomputes the final per-status counts with both batches applied
    // — the later batch wins where they overlap
    "lake_rename_feed" ->
      """SELECT CASE WHEN o_orderkey % 11 = 5 THEN 'X'
        |            WHEN o_orderkey % 7 = 3 THEN 'U'
        |            ELSE o_orderstatus END AS status,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // the engine answers this interval from a manifest-stats-pruned
    // file subset (the entry REQUIRES pruning bit); the oracle scans the
    // raw table — a wrongly-skipped file loses rows and breaks the hash
    "lake_prune_read" ->
      """SELECT o_orderkey, o_orderstatus, o_orderdate
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 3000
        |ORDER BY o_orderkey""".stripMargin,
    // the whole lifecycle ran through spark.sql only (CREATE TABLE /
    // INSERT-as-merge / DELETE-as-DV-commit / SELECT); the oracle
    // replays update-then-delete over the raw table
    "lake_sql_ddl" ->
      """WITH st AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 41 = 6 THEN 'U' ELSE o_orderstatus END AS o_orderstatus
        |  FROM orders)
        |SELECT o_orderkey, o_orderstatus FROM st
        |WHERE NOT (o_orderstatus = 'F' AND o_orderkey < 1000)
        |ORDER BY o_orderkey""".stripMargin,
    // table services ran as SQL stored procedures (CALL compact +
    // history, gated in-entry on the exact op list); the oracle replays
    // the upsert — compaction must be row-identical
    "lake_sql_call" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 47 = 11 THEN 'U' ELSE o_orderstatus END AS o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // a header-only commit evolved the layout (entry REQUIRES zero
    // files rewritten and a genuinely MIXED snapshot after the merge);
    // old files read the partition column from data, new from the
    // directory — the oracle replays the merge over the raw table
    "lake_partition_evolve" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 29 = 7 AND o_orderkey < 100 THEN 'E'
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // SQL MERGE INTO (upsert as ONE version) -> UPDATE (partial SET,
    // target-row predicate) -> MERGE ... WHEN MATCHED DELETE, all
    // through spark.sql over the catalog table; the oracle replays the
    // three statements over the raw table in order
    "lake_merge_into" ->
      """WITH m AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 37 = 5 THEN 'M' ELSE o_orderstatus END AS st
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey, 'I' AS st
        |  FROM orders WHERE o_orderkey % 37 = 5
        |), u AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 71 = 9 THEN 'Z' ELSE st END AS o_orderstatus
        |  FROM m
        |)
        |SELECT o_orderkey, o_orderstatus FROM u
        |WHERE NOT (o_orderkey % 43 = 1 AND o_orderkey < 10000000)
        |ORDER BY o_orderkey""".stripMargin,
    // the engine answers the partition predicate from whole pruned
    // `o_orderpriority=<v>` DIRECTORIES (the entry REQUIRES ≤ 1/3 of
    // the files survived pruning at v1), with the partition-local
    // merge's updates visible and the partition column reconstructed
    // from manifest values — the oracle replays both over the raw table
    "lake_partition_prune" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 97 = 3 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  o_orderpriority
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,
    // v1 = pre-delete (time travel must still see the erased keys);
    // v2 = the live merge-on-read state, where the equality-delete
    // sidecar — committed WITHOUT rewriting any data file, which the
    // entry requires — anti-joins them out
    "lake_delete_dv" ->
      """SELECT 1 AS version, o_orderkey, o_orderstatus FROM orders
        |UNION ALL
        |SELECT 2, o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 59 <> 0
        |ORDER BY version, o_orderkey""".stripMargin,
    // point lookup on a declared SECONDARY index column: the engine
    // probes per-file bloom bits (>=4x file skipping required by the
    // entry); the oracle recomputes the same three lookup ids from the
    // raw table — a wrongly-skipped file loses rows (no-false-negative)
    "lake_bloom_skip" ->
      """WITH ids AS (
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 997 = 1
        |  ORDER BY o_orderkey LIMIT 3)
        |SELECT o.o_orderkey, 'u' || CAST(o.o_orderkey AS VARCHAR) AS o_uid,
        |  o.o_orderstatus
        |FROM orders o JOIN ids USING (o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    // v2 = post-merge state (time travel must still see the rows the
    // positional delete later dooms); v3 = the live state after a
    // PREDICATE delete on a NON-key column, committed as a positional
    // (file, row-ordinal) sidecar WITHOUT rewriting any data file —
    // which the entry requires bit-identically
    "lake_delete_pos" ->
      """WITH st AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 13 = 2 THEN 'U' ELSE o_orderstatus END AS o_orderstatus
        |  FROM orders)
        |SELECT 2 AS version, o_orderkey, o_custkey, o_orderstatus FROM st
        |UNION ALL
        |SELECT 3, o_orderkey, o_custkey, o_orderstatus FROM st WHERE o_custkey % 59 <> 0
        |ORDER BY version, o_orderkey""".stripMargin,
    // two racing disjoint-key writers both land (v2, v3) under the
    // optimistic-concurrency retry; the final state is order-independent
    // because the key classes are disjoint
    "lake_concurrent_merge" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 1 THEN 'A'
        |       WHEN o_orderkey % 7 = 2 THEN 'B'
        |       ELSE o_orderstatus END AS o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // the oracle computes the v3 per-status counts DIRECTLY; the engine
    // maintains them incrementally from the v1 aggregate + the change
    // feed's before/after images — any retraction error shifts a count
    "lake_incremental_mv" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders
        |FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 1 THEN 'U' ELSE o_orderstatus END AS o_orderstatus
        |  FROM orders WHERE o_orderkey % 53 <> 0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "dedup_incremental" ->
      """WITH sh AS (
        |  SELECT doc_id, text,
        |    list_distinct([array_to_string(words[i:i+2], ' ') FOR i IN range(1, greatest(len(words)-2, 1)+1)]) AS s
        |  FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS words FROM documents)),
        |batch AS (SELECT * FROM sh WHERE doc_id % 7 = 3),
        |base AS (SELECT * FROM sh WHERE doc_id % 7 <> 3),
        |near AS (
        |  SELECT b.doc_id, count(*) AS n_near_dups
        |  FROM batch b JOIN base c
        |    ON 2 * len(list_intersect(b.s, c.s)) >= len(b.s) + len(c.s) - len(list_intersect(b.s, c.s))
        |  GROUP BY 1),
        |ex AS (
        |  SELECT b.doc_id,
        |    CASE WHEN b.text IN (SELECT text FROM base) THEN 1 ELSE 0 END AS is_exact_dup
        |  FROM batch b)
        |SELECT e.doc_id, CAST(e.is_exact_dup AS BIGINT) AS is_exact_dup,
        |  CAST(coalesce(n.n_near_dups, 0) AS BIGINT) AS n_near_dups,
        |  CAST(CASE WHEN e.is_exact_dup = 0 AND coalesce(n.n_near_dups, 0) = 0
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_novel
        |FROM ex e LEFT JOIN near n USING (doc_id) ORDER BY e.doc_id""".stripMargin,
    "dedup_exact" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM all_docs GROUP BY text ORDER BY keep_id""".stripMargin,
    "dedup_normalized" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 2000000, upper(text) || '  !!' FROM documents WHERE doc_id % 7 = 0)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM all_docs
        |GROUP BY trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'), '\s+', ' ', 'g'))
        |ORDER BY keep_id""".stripMargin,
    // Same answer as ngram_jaccard by construction: the LSH banding only
    // ROUTES candidate generation; verification is exact Jaccard >= 0.5
    // over the same 3-word shingles. The oracle computes the full exact
    // pair list, so a hash match also certifies LSH recall on this corpus.
    "dedup_minhash_lsh" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(words[i:i+2], ' ') FOR i IN range(1, greatest(len(words)-2, 1)+1)]) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  len(list_intersect(a.s, b.s)) AS inter_n,
        |  len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS union_n
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE 2 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Recomputes the ENTIRE simhash pipeline: the token hash is the first
    // 8 md5 digest bytes big-endian (engine-portable, = Spark's
    // DedupOps.md5Hash64), per-bit majority (2*ones > n) packs the
    // fingerprint, all-pairs hamming <= 3 is the answer — banding on the
    // Spark side is routing only (pigeonhole guarantees recall).
    "dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, list_transform(string_split_regex(trim(lower(text)), '\s+'),
        |    t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT) AS hs
        |  FROM documents),
        |bits AS (
        |  SELECT doc_id,
        |    [CASE WHEN 2 * len(list_filter(hs, h -> (h >> i) & 1 <> 0)) > len(hs) THEN 1 ELSE 0 END
        |     FOR i IN range(0, 64)] AS b
        |  FROM toks)
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(len(list_filter(range(0, 64), i -> a.b[i+1] <> b.b[i+1])) AS BIGINT) AS hamming
        |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id) p
        |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // connected components as a recursive reachability walk: min over all
    // labels a node can reach = the component minimum = Spark's converged
    // min-label propagation (DedupOps.dedupClusters), singletons included
    "dedup_clusters" ->
      """WITH RECURSIVE sh AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(words[i:i+2], ' ') FOR i IN range(1, greatest(len(words)-2, 1)+1)]) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents)),
        |pairs AS MATERIALIZED (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE 2 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
        |edges AS MATERIALIZED (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |walk AS (
        |  SELECT doc_id, doc_id AS label FROM documents
        |  UNION
        |  SELECT e.src AS doc_id, w.label
        |  FROM walk w JOIN edges e ON w.doc_id = e.dst)
        |SELECT doc_id, min(label) AS cluster FROM walk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // k-anonymity: the oracle states the quasi-identifier grouping and
    // the k=5 release rule literally
    "gdpr_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
        |  count(*) AS group_n, count(*) < 5 AS violates_k,
        |  CASE WHEN count(*) < 5 THEN 'suppress' ELSE 'release' END AS action
        |FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // streaming upsert sink: the oracle replays keyed last-write-wins
    // over events — the state the multi-batch stage-then-swap merges
    // must converge to regardless of how files split across batches
    "stream_upsert_sink" ->
      """SELECT user_id, event_id, ts, event_type, value
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    // same final-state contract as stream_upsert_sink, but each
    // micro-batch lands as ONE atomic lake version (conditional-merge
    // recency election composed from LakeTable.merge) — a wrong
    // cross-batch precedence or a lost commit changes the final state
    "stream_lake_sink" ->
      """SELECT user_id, event_id, ts, event_type, value
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    // the MV maintenance TRAJECTORY across four lake commits: the oracle
    // computes each version's per-status counts directly; the engine
    // maintains them from the O(delta) change feed only — a missed
    // retraction at any step shifts that step's counts and breaks the
    // hash (flag-on, the same fold runs as a real stream tailing the
    // manifest log with in-entry parity)
    // the registered streaming source's full CDC feed across the four
    // commits: every version's events replayed from generation
    // arithmetic — a wrong pre-image, a mis-sequenced version, or a
    // leaked rewritten-verbatim row breaks the hash
    "stream_lake_source" ->
      """WITH v2s AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 1 THEN 'U' ELSE o_orderstatus END AS s,
        |    o_orderstatus AS s0
        |  FROM orders),
        |v3s AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 17 = 2 THEN 'X' ELSE s END AS s,
        |    s AS s2
        |  FROM v2s)
        |SELECT o_orderkey, 'update' AS _change_type, 'U' AS o_orderstatus,
        |  s0 AS _before_o_orderstatus, CAST(2 AS BIGINT) AS _commit_version
        |FROM v2s WHERE o_orderkey % 11 = 1
        |UNION ALL
        |SELECT o_orderkey, 'update', 'X', s2, 3 FROM v3s WHERE o_orderkey % 17 = 2
        |UNION ALL
        |SELECT o_orderkey, 'delete', CAST(NULL AS VARCHAR), s, 4
        |FROM v3s WHERE o_orderkey % 53 = 0
        |ORDER BY _commit_version, o_orderkey""".stripMargin,
    "stream_lake_cdf" ->
      """WITH v2 AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 1 THEN 'U' ELSE o_orderstatus END AS s
        |  FROM orders),
        |v3 AS (
        |  SELECT o_orderkey, CASE WHEN o_orderkey % 17 = 2 THEN 'X' ELSE s END AS s
        |  FROM v2),
        |v4 AS (SELECT * FROM v3 WHERE o_orderkey % 53 <> 0)
        |SELECT 2 AS version, s AS o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders
        |FROM v2 GROUP BY 2
        |UNION ALL SELECT 3, s, CAST(count(*) AS BIGINT) FROM v3 GROUP BY 2
        |UNION ALL SELECT 4, s, CAST(count(*) AS BIGINT) FROM v4 GROUP BY 2
        |ORDER BY version, o_orderstatus""".stripMargin,
    // JDBC upsert protocol: the oracle replays the versioned input with
    // last-per-key-by-seq semantics and aggregates the same final state
    "upsert_jdbc_protocol" ->
      """WITH v AS (
        |  SELECT o_orderkey, CAST(0 AS BIGINT) AS seq, o_orderstatus AS status,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 1, 'U', CAST(round(o_totalprice * 100) AS BIGINT) + 100
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |last AS (
        |  SELECT * FROM v
        |  QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) = 1)
        |SELECT status, count(*) AS n_rows,
        |  CAST(sum(price_cents) AS BIGINT) AS sum_price_cents,
        |  CAST(sum(seq) AS BIGINT) AS n_upserted
        |FROM last GROUP BY status ORDER BY status""".stripMargin,
    // events JSONL round-trip: the oracle states the invariants — every
    // parquet row survives the JSONL export/import (n_parsed = n_rows),
    // exactly the one planted junk line goes corrupt, and the multiset
    // compare found zero drift
    "ingest_events_jsonl" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_parsed,
        |  CAST(1 AS BIGINT) AS n_corrupt,
        |  TRUE AS parity_ok
        |FROM events""".stripMargin,
    // freshness refresh lifecycle: the oracle regenerates both payload
    // generations from dense-id arithmetic (row_number over orders,
    // capped — the range() convention) and states the protocol's
    // decision/counter sequence literally: one download for the first
    // fetch, NONE for the fresh hit, one more for the stale refresh
    "ingest_freshness_refresh" ->
      """WITH ids AS (
        |  SELECT id FROM (
        |    SELECT row_number() OVER () - 1 AS id FROM orders) WHERE id < 250000),
        |v1 AS (
        |  SELECT id, (id*7919)%1000000 AS pc, 1 AS v FROM ids WHERE id%7 <> 0),
        |v2 AS (
        |  SELECT id,
        |    (id*7919)%1000000 + CASE WHEN id%7 = 0 THEN 250 ELSE 0 END AS pc,
        |    CASE WHEN id%7 = 0 THEN 2 ELSE 1 END AS v
        |  FROM ids),
        |s1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(id*1000 + pc + v) AS BIGINT) AS c FROM v1),
        |s3 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(id*1000 + pc + v) AS BIGINT) AS c FROM v2)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'first_fetch' AS scenario,
        |    'initial_load' AS decision, TRUE AS downloaded,
        |    CAST(1 AS BIGINT) AS n_catalog_gets, CAST(1 AS BIGINT) AS n_downloads,
        |    n AS local_rows, c AS local_checksum FROM s1
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'fresh_hit', 'up_to_date', FALSE,
        |    CAST(2 AS BIGINT), CAST(1 AS BIGINT), n, c FROM s1
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'stale_refresh', 'refresh', TRUE,
        |    CAST(3 AS BIGINT), CAST(2 AS BIGINT), n, c FROM s3)
        |ORDER BY step""".stripMargin,
    // domain/URL rollup: the oracle regenerates the derived URLs with the
    // same (doc_id, source) arithmetic, re-parses them with its own string
    // functions (canonicalization rules stated literally), and rolls up
    // with the same 63-bit content-hash dup convention
    "text_domain_stats" ->
      """WITH d0 AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 10 = 0),
        |u AS (
        |  SELECT doc_id, text,
        |    'HTTPS://' ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'WWW.' WHEN doc_id % 4 = 1 THEN 'cdn.' ELSE '' END ||
        |    CASE WHEN doc_id % 6 = 0 THEN upper(source) ELSE source END || '.' ||
        |    CASE WHEN doc_id % 3 = 0 THEN 'co.uk' WHEN doc_id % 3 = 1 THEN 'com' ELSE 'org' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
        |    '/articles/' || CAST(doc_id % 50 AS VARCHAR) ||
        |    CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&utm_campaign=c' || CAST(doc_id % 3 AS VARCHAR) || '&id=' || CAST(doc_id % 20 AS VARCHAR) ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN '#sec' || CAST(doc_id % 4 AS VARCHAR) ELSE '' END AS url
        |  FROM d0),
        |p AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1)), '^www\.', '') AS host,
        |    regexp_extract(url, '^[A-Za-z]+://[^/?#]*(/[^?#]*)', 1) AS path,
        |    list_filter(string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |      x -> x <> '' AND NOT starts_with(x, 'utm_')) AS kept
        |  FROM u),
        |c AS (
        |  SELECT doc_id,
        |    'https://' || host || path ||
        |      CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&') ELSE '' END AS canon,
        |    CASE WHEN host LIKE '%.co.uk'
        |      THEN array_to_string(string_split(host, '.')[-3:], '.')
        |      ELSE array_to_string(string_split(host, '.')[-2:], '.') END AS domain,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |    CAST((('0x' || substr(md5(text), 1, 16))::UBIGINT >> 1) AS BIGINT) AS th
        |  FROM p),
        |m AS (SELECT *, count(*) OVER (PARTITION BY th) AS copies FROM c)
        |SELECT domain,
        |  count(*) AS n_docs,
        |  count(DISTINCT canon) AS n_distinct_urls,
        |  CAST(SUM(n_tokens) AS BIGINT) AS token_mass,
        |  CAST(SUM(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
        |  CAST(SUM(CASE WHEN copies > 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS dup_share_ppm
        |FROM m GROUP BY domain ORDER BY domain""".stripMargin,
    // GDPR delete propagation: the oracle replays BOTH generations of
    // each derived frame (decision components + prefix-sum packing, the
    // dedup_decision / text_pack_sequences oracle bodies verbatim, once
    // over the full corpus and once over the erased corpus) and derives
    // the same integer audit counts
    "gdpr_forget_keys" -> gdprForgetOracle(id => s"$id % 97 = 13"),
    // the BATCHED erasure-queue shape (r12, VERDICT r11 ask #6 made
    // gated): two independent request sets - mod-97 and mod-101 -
    // drained by ONE derived-frame rebuild through the keyed kernel,
    // same audit contract
    "gdpr_forget_batch" ->
      gdprForgetOracle(id => s"($id % 97 = 13 OR $id % 101 = 7)"),
    // the READ twin (DSAR / Article 15): per requested key, presence,
    // chunk inventory, classifier verdict, exact-dup status, and packed
    // position; the quality CTE chain supplies the verdict, the rest
    // replay the chunk-count formula, the text-hash rep election, and
    // the pack cumsum; two planted never-held keys gate the absent path
    "gdpr_access_report" -> qualityScoreOracle(
      """, req AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 29
        |    UNION ALL SELECT CAST(x AS BIGINT) FROM (VALUES (9999991), (9999997)) v(x)),
        |ch AS (SELECT doc_id,
        |    CAST(1 + ceil(greatest(len(string_split_regex(trim(text), '\s+')) - 32, 0) / 24.0) AS BIGINT) AS n_chunks
        |  FROM documents),
        |hh AS (SELECT doc_id,
        |    CAST((('0x' || substr(md5(text), 1, 16))::UBIGINT >> 1) AS BIGINT) AS th
        |  FROM documents),
        |reps AS (SELECT th, min(doc_id) AS rep FROM hh GROUP BY th),
        |st AS (SELECT h.doc_id,
        |    CASE WHEN h.doc_id = r.rep THEN 'rep' ELSE 'exact_dup' END AS dedup_status
        |  FROM hh h JOIN reps r USING (th)),
        |pk AS (SELECT doc_id,
        |    CAST(coalesce(sum(len(string_split_regex(trim(text), '\s+')))
        |      OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start
        |  FROM documents)
        |SELECT r.doc_id,
        |  CAST(CASE WHEN ch.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS held,
        |  CAST(coalesce(ch.n_chunks, 0) AS BIGINT) AS n_chunks,
        |  CASE WHEN sc.doc_id IS NULL THEN 'not_held'
        |       WHEN sc.logit_sum > 0 THEN 'keep' ELSE 'drop' END AS quality_label,
        |  coalesce(st.dedup_status, 'not_held') AS dedup_status,
        |  CAST(coalesce(pk.token_start, -1) AS BIGINT) AS token_start
        |FROM req r
        |LEFT JOIN ch USING (doc_id)
        |LEFT JOIN sc USING (doc_id)
        |LEFT JOIN st USING (doc_id)
        |LEFT JOIN pk USING (doc_id)
        |ORDER BY r.doc_id"""),
    // dedup decision: exact groups on the SAME md5-64 keys as the
    // implementation, components via literal recursive reachability over
    // the jaccard pairs + planted copy edges, precedence stated as CASE
    "dedup_decision" ->
      """WITH RECURSIVE base AS (SELECT doc_id, text FROM documents),
        |docs AS (SELECT doc_id, text FROM base
        |  UNION ALL SELECT doc_id + 1000000, text FROM base WHERE doc_id % 10 = 0),
        |hashed AS (SELECT doc_id,
        |  CAST((('0x' || substr(md5(text), 1, 16))::UBIGINT >> 1) AS BIGINT) AS th FROM docs),
        |er AS (SELECT th, min(doc_id) AS exact_rep FROM hashed GROUP BY th),
        |sh AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(words[i:i+2], ' ') FOR i IN range(1, greatest(len(words)-2, 1)+1)]) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM base)),
        |pairs AS MATERIALIZED (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE 2 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
        |  UNION ALL
        |  SELECT doc_id, doc_id + 1000000 FROM base WHERE doc_id % 10 = 0),
        |edges AS MATERIALIZED (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |walk AS (
        |  SELECT doc_id, doc_id AS label FROM docs
        |  UNION
        |  SELECT e.src AS doc_id, w.label FROM walk w JOIN edges e ON w.doc_id = e.dst),
        |lab AS (SELECT doc_id, min(label) AS cluster FROM walk GROUP BY doc_id)
        |SELECT h.doc_id, l.cluster,
        |  CASE WHEN h.doc_id <> e.exact_rep THEN 'exact_dup'
        |       WHEN h.doc_id <> l.cluster THEN 'near_dup' ELSE 'keep' END AS decision
        |FROM hashed h JOIN er e USING (th) JOIN lab l USING (doc_id)
        |ORDER BY h.doc_id""".stripMargin,
    "ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(words[i:i+2], ' ') FOR i IN range(1, greatest(len(words)-2, 1)+1)]) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  len(list_intersect(a.s, b.s)) AS inter_n,
        |  len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS union_n
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE 2 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
        |ORDER BY doc_a, doc_b""".stripMargin,
    // the count-aggregation form is exact (DedupSpec asserts equality
    // with the prefix-filtered default), so it shares the same all-pairs
    // oracle
    "ngram_jaccard_countagg" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(words[i:i+2], ' ') FOR i IN range(1, greatest(len(words)-2, 1)+1)]) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  len(list_intersect(a.s, b.s)) AS inter_n,
        |  len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS union_n
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE 2 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_containment" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
        |allw AS (
        |  SELECT doc_id, words FROM w
        |  UNION ALL
        |  SELECT doc_id + 10000000, words[1:greatest((len(words)*2)//5, 3)] FROM w WHERE doc_id % 50 = 0),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(words[i:i+2], ' ') FOR i IN range(1, greatest(len(words)-2, 1)+1)]) AS s
        |  FROM allw)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter_n,
        |  CAST(len(a.s) AS BIGINT) AS n_a, CAST(len(b.s) AS BIGINT) AS n_b
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE 5 * len(list_intersect(a.s, b.s)) >= 4 * least(len(a.s), len(b.s))
        |ORDER BY doc_a, doc_b""".stripMargin,
    // the bloom itself is Spark-side sketch state the oracle cannot (and
    // must not) rebuild — the oracle recomputes the EXACT dup flags and
    // pins the sketch's contract booleans at literal TRUE (a bloom has no
    // false negatives; realized fpp must sit under the sized bound), the
    // same gate shape as text_heavy_hitters' CMS columns
    "dedup_bloom_probe" ->
      """WITH base AS (SELECT text FROM documents WHERE doc_id % 7 <> 0),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 10000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 7 <> 0 AND doc_id % 11 = 0)
        |SELECT b.doc_id,
        |  CAST(CASE WHEN b.text IN (SELECT text FROM base) THEN 1 ELSE 0 END AS BIGINT) AS is_dup,
        |  TRUE AS no_false_negative,
        |  TRUE AS fp_ok
        |FROM batch b ORDER BY b.doc_id""".stripMargin,
    "embed_neardup_cosine" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        |all_v AS (
        |  SELECT vec_id, vec FROM base
        |  UNION ALL SELECT vec_id + 1000000, list_transform(vec, x -> x * 1.01) FROM base WHERE vec_id % 25 = 0)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  CAST(round(list_cosine_similarity(a.vec, b.vec) * 1000000.0) AS BIGINT) AS cos_ppm
        |FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.vec, b.vec) >= 0.99
        |ORDER BY vec_a, vec_b""".stripMargin,
    // integer-exact Lloyd k-means (k=8, 2 update rounds, init = vec_id<8,
    // ties to the lowest cell): dims quantized to shifted micro-units so
    // truncating division is floor division on both engines; the oracle
    // replays every assignment and centroid update exactly
    "embed_kmeans" ->
      """WITH v AS (
        |  SELECT vec_id,
        |    unnest(list_transform(embedding,
        |      e -> CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT) + 2000000)) AS x,
        |    unnest(range(1, len(embedding) + 1)) AS dim
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cell, dim, x AS cx FROM v WHERE vec_id < 8),
        |d1 AS (SELECT v.vec_id, c.cell,
        |         CAST(sum((v.x - c.cx) * (v.x - c.cx)) AS BIGINT) AS dist
        |       FROM v JOIN c0 c USING (dim) GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cell FROM d1
        |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1),
        |u1 AS (SELECT a.cell, v.dim, CAST(sum(v.x) AS BIGINT) // count(*) AS cx
        |       FROM a1 a JOIN v USING (vec_id) GROUP BY 1, 2),
        |c1 AS (SELECT * FROM u1 UNION ALL
        |       SELECT cell, dim, cx FROM c0 WHERE cell NOT IN (SELECT cell FROM u1)),
        |d2 AS (SELECT v.vec_id, c.cell,
        |         CAST(sum((v.x - c.cx) * (v.x - c.cx)) AS BIGINT) AS dist
        |       FROM v JOIN c1 c USING (dim) GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cell FROM d2
        |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1),
        |u2 AS (SELECT a.cell, v.dim, CAST(sum(v.x) AS BIGINT) // count(*) AS cx
        |       FROM a2 a JOIN v USING (vec_id) GROUP BY 1, 2),
        |c2 AS (SELECT * FROM u2 UNION ALL
        |       SELECT cell, dim, cx FROM c1 WHERE cell NOT IN (SELECT cell FROM u2)),
        |d3 AS (SELECT v.vec_id, c.cell,
        |         CAST(sum((v.x - c.cx) * (v.x - c.cx)) AS BIGINT) AS dist
        |       FROM v JOIN c2 c USING (dim) GROUP BY 1, 2)
        |SELECT vec_id, cell, dist FROM d3
        |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) = 1
        |ORDER BY vec_id""".stripMargin,
    "embed_label_centroids" ->
      """WITH flat AS (
        |  SELECT label,
        |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
        |    unnest(embedding::DOUBLE[]) AS x
        |  FROM embeddings)
        |SELECT label, dim, CAST(round(avg(x) * 1000000.0) AS BIGINT) AS mean_ppm
        |FROM flat GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ann_topk_brute" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        |q AS (SELECT vec_id AS query_id, vec AS qvec FROM v WHERE vec_id < 10),
        |s AS (SELECT query_id, vec_id, list_cosine_similarity(qvec, vec) AS c
        |      FROM q, v WHERE vec_id <> query_id)
        |SELECT query_id, rank, vec_id, cos_ppm FROM (
        |  SELECT query_id, vec_id, CAST(round(c * 1000000.0) AS BIGINT) AS cos_ppm,
        |    row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
        |  FROM s) t WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // the ANN tolerance gates (VERDICT r6 ask #2): the Spark side computes
    // exact brute top-10 recall in-plan over a bounded deterministic
    // query sample (<= 64 — the gate must stay LINEAR in corpus size)
    // and emits booleans; the oracle reproduces the sample with the same
    // id arithmetic and asserts the booleans literally TRUE — recall
    // floors measured via graft.RecallProbe, documented at the thresholds
    "ann_topk_lsh" -> AnnGateOracle,
    "ann_topk_ivf" -> AnnGateOracle,
    "ann_topk_ivfpq" -> AnnGateOracle,
    // corpus-scale kNN-graph join: same gate contract — the full graph
    // is computed in-plan; the sampled twins' booleans (vs the GRAPH
    // brute truth, self excluded) are what the oracle asserts
    "ann_knn_join" -> AnnGateOracle,
    // brute MIPS: the corpus ships unit-norm (MIPS would be hollow
    // cosine), so both engines re-scale by f(id) = 1 + (id%7)/4 — pure
    // id arithmetic in doubles — and rank by exact inner product
    "embed_mips" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        |sc AS (SELECT vec_id,
        |         list_transform(vec, x -> x * (1 + (vec_id % 7) / 4.0)) AS vec FROM v),
        |q AS (SELECT vec_id AS query_id, vec AS qvec FROM v WHERE vec_id < 10),
        |s AS (SELECT query_id, vec_id, list_inner_product(qvec, vec) AS c
        |      FROM q, sc WHERE vec_id <> query_id)
        |SELECT query_id, rank, vec_id, ip_ppm FROM (
        |  SELECT query_id, vec_id, CAST(round(c * 1000000.0) AS BIGINT) AS ip_ppm,
        |    row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
        |  FROM s) t WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // MIPS-LSH gate: booleans vs in-plan brute MIPS truth over the
    // fixed 10-query set (the AnnGateOracle contract, non-planted
    // query ids)
    "ann_mips_lsh" ->
      """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS k,
        |  TRUE AS mean_recall_ok, TRUE AS top1_ok
        |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin,
    // persisted-index lifecycle (write → append → reload → serve): same
    // gate contract as the session-built path (AnnIndexStoreSpec proves
    // serve parity), plus the appended exact-copy twin pinned at rank 2
    "ann_index_serve" ->
      """WITH q AS (SELECT vec_id FROM embeddings WHERE vec_id % 25 = 0),
        |st AS (SELECT greatest(1, CAST(ceil(count(*) / 64.0) AS BIGINT)) AS stride FROM q)
        |SELECT vec_id + 1000000 AS query_id, CAST(10 AS BIGINT) AS k,
        |  TRUE AS mean_recall_ok, TRUE AS top1_ok, TRUE AS append_rank2_ok
        |FROM q, st WHERE (vec_id // 25) % stride = 0 ORDER BY query_id""".stripMargin,
    // the maintained index (append x2, compact, retract the odd-half
    // twins) must keep every lifecycle boolean TRUE: the recall floor
    // over the SURVIVOR corpus, top1 = planted base twin, surviving
    // twins at rank 2, retracted twins NEVER served (a stranded code or
    // rerank vector flips append_ok)
    "ann_index_maintain" ->
      """WITH q AS (SELECT vec_id FROM embeddings WHERE vec_id % 25 = 0),
        |st AS (SELECT greatest(1, CAST(ceil(count(*) / 64.0) AS BIGINT)) AS stride FROM q)
        |SELECT vec_id + 1000000 AS query_id, CAST(10 AS BIGINT) AS k,
        |  TRUE AS mean_recall_ok, TRUE AS top1_ok, TRUE AS append_ok
        |FROM q, st WHERE (vec_id // 25) % stride = 0 ORDER BY query_id""".stripMargin,
    // kNN-graph density: same sampled-twin contract; n_scored is the
    // exact corpus+twins row count (proves the pass covered the graph),
    // the booleans are the discriminative property (twin density above
    // the corpus median; best neighbor near-unit)
    "embed_knn_density" ->
      """WITH q AS (SELECT vec_id FROM embeddings WHERE vec_id % 25 = 0),
        |st AS (SELECT greatest(1, CAST(ceil(count(*) / 64.0) AS BIGINT)) AS stride FROM q),
        |ns AS (SELECT count(*) + (SELECT count(*) FROM q) AS n_scored FROM embeddings)
        |SELECT vec_id + 1000000 AS query_id, CAST(10 AS BIGINT) AS k, ns.n_scored,
        |  TRUE AS above_median_ok, TRUE AS src_near_ok
        |FROM q, st, ns WHERE (vec_id // 25) % stride = 0 ORDER BY query_id""".stripMargin,
    // radius search: same sampled-twin id arithmetic; precision is exact
    // by construction (candidates are exact-cosine verified), so the
    // booleans carry the source-hit and micro-averaged recall contracts
    "ann_range_search" ->
      """WITH q AS (SELECT vec_id FROM embeddings WHERE vec_id % 25 = 0),
        |st AS (SELECT greatest(1, CAST(ceil(count(*) / 64.0) AS BIGINT)) AS stride FROM q)
        |SELECT vec_id + 1000000 AS query_id, CAST(350000 AS BIGINT) AS tau_ppm,
        |  TRUE AS src_found_ok, TRUE AS recall_floor_ok
        |FROM q, st WHERE (vec_id // 25) % stride = 0 ORDER BY query_id""".stripMargin,
    // market-basket lift: literal 2-itemset counting over per-order
    // distinct part sets, integer-DIV ppm lift, support >= 3
    "q_market_basket" ->
      """WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |no AS (SELECT count(*) AS n_orders FROM orders),
        |pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
        |  FROM lines a JOIN lines b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |pc AS (SELECT l_partkey, count(*) AS n_p FROM lines GROUP BY 1)
        |SELECT p.part_a, p.part_b, p.n_ab, ca.n_p AS n_a, cb.n_p AS n_b,
        |  p.n_ab * no.n_orders * 1000000 // (ca.n_p * cb.n_p) AS lift_ppm
        |FROM pairs p
        |JOIN pc ca ON p.part_a = ca.l_partkey
        |JOIN pc cb ON p.part_b = cb.l_partkey, no
        |ORDER BY lift_ppm DESC, p.part_a, p.part_b LIMIT 20""".stripMargin,
    "q_cards_text_trgm" ->
      """WITH cards AS (
        |  SELECT 'card-' || CAST(i AS VARCHAR) AS id,
        |    'Rules text for card ' || CAST(i AS VARCHAR) || '.' AS oracle_text
        |  FROM range(0, 500) t(i)),
        |tg AS (SELECT id, oracle_text,
        |  list_distinct([substr(lower(oracle_text), i, 3) FOR i IN range(1, greatest(length(oracle_text)-2, 0)+1)]) AS t
        |  FROM cards),
        |q AS (SELECT list_distinct([substr('rules text for carb 41', i, 3) FOR i IN range(1, length('rules text for carb 41')-2+1)]) AS qt)
        |SELECT * FROM (
        |  SELECT id, oracle_text,
        |    len(list_intersect(t, qt)) AS inter_n,
        |    len(t) + len(qt) - len(list_intersect(t, qt)) AS union_n,
        |    CAST(round(len(list_intersect(t, qt)) * 10000.0
        |      / (len(t) + len(qt) - len(list_intersect(t, qt)))) AS BIGINT) AS sim_bp
        |  FROM tg, q) s
        |WHERE sim_bp >= 6500
        |ORDER BY sim_bp DESC, id""".stripMargin,
    "q_cards_name_trgm" ->
      """WITH cards AS (
        |  SELECT 'card-' || CAST(i AS VARCHAR) AS id, 'Card ' || CAST(i AS VARCHAR) AS name
        |  FROM range(0, 500) t(i)),
        |tg AS (SELECT id, name,
        |  list_distinct([substr(lower(name), i, 3) FOR i IN range(1, greatest(length(name)-2, 0)+1)]) AS t
        |  FROM cards),
        |q AS (SELECT list_distinct([substr('card 41', i, 3) FOR i IN range(1, length('card 41')-2+1)]) AS qt)
        |SELECT * FROM (
        |  SELECT id, name,
        |    len(list_intersect(t, qt)) AS inter_n,
        |    len(t) + len(qt) - len(list_intersect(t, qt)) AS union_n,
        |    CAST(round(len(list_intersect(t, qt)) * 10000.0
        |      / (len(t) + len(qt) - len(list_intersect(t, qt)))) AS BIGINT) AS sim_bp
        |  FROM tg, q) s
        |WHERE sim_bp >= 6000
        |ORDER BY sim_bp DESC, id""".stripMargin,
    // fuzzy JOIN: the oracle ranks by LITERAL all-pairs list Jaccard,
    // so the inverted-index candidates must be complete to match rank 1
    "q_cards_fuzzy_join" ->
      """WITH cards AS (
        |  SELECT 'card-' || CAST(i AS VARCHAR) AS id, lower('Card ' || CAST(i AS VARCHAR)) AS lname
        |  FROM range(0, 500) t(i)),
        |tg AS (SELECT id, lname,
        |  list_distinct([substr(lname, i, 3) FOR i IN range(1, greatest(length(lname)-2, 0)+1)]) AS t
        |  FROM cards),
        |probes AS (
        |  SELECT id AS probe_id, replace(lname, ' ', 'x') AS probe_name
        |  FROM cards WHERE CAST(substr(id, 6) AS INTEGER) % 25 = 0),
        |ptg AS (SELECT probe_id,
        |  list_distinct([substr(probe_name, i, 3) FOR i IN range(1, greatest(length(probe_name)-2, 0)+1)]) AS pt
        |  FROM probes),
        |cand AS (
        |  SELECT p.probe_id, c.id,
        |    len(list_intersect(p.pt, c.t)) AS inter_n,
        |    CAST(round(len(list_intersect(p.pt, c.t)) * 10000.0
        |      / (len(p.pt) + len(c.t) - len(list_intersect(p.pt, c.t)))) AS BIGINT) AS sim_bp
        |  FROM ptg p, tg c
        |  WHERE len(list_intersect(p.pt, c.t)) >= 1)
        |SELECT probe_id, id AS matched_id, CAST(inter_n AS BIGINT) AS inter_n, sim_bp
        |FROM (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY sim_bp DESC, id) AS rn FROM cand)
        |WHERE rn = 1 ORDER BY probe_id""".stripMargin,
    "text_fulltext_search" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\W+') AS toks FROM documents),
        |c AS (SELECT doc_id,
        |  len(list_filter(toks, x -> x = 'data')) AS n_data,
        |  len(list_filter(toks, x -> x = 'spark')) AS n_spark FROM t)
        |SELECT doc_id, n_data, n_spark, n_data + n_spark AS score
        |FROM c WHERE n_data > 0 AND n_spark > 0
        |ORDER BY score DESC, doc_id""".stripMargin,
    // clusters over the EXACT cos>=0.99 pair graph (the engine routes
    // candidates through LSH; recall-1 by the 8-table argument in
    // SimilarityOps, so the exact graph is the contract)
    "embed_cluster_dedup" ->
      """WITH RECURSIVE base AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        |all_v AS MATERIALIZED (
        |  SELECT vec_id, vec FROM base
        |  UNION ALL SELECT vec_id + 1000000, list_transform(vec, x -> x * 1.01) FROM base WHERE vec_id % 25 = 0),
        |pairs AS MATERIALIZED (
        |  SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.vec, b.vec) >= 0.99),
        |edges AS MATERIALIZED (
        |  SELECT va AS src, vb AS dst FROM pairs UNION ALL SELECT vb, va FROM pairs),
        |walk AS (
        |  SELECT vec_id, vec_id AS label FROM all_v
        |  UNION
        |  SELECT e.src AS vec_id, w.label FROM walk w JOIN edges e ON w.vec_id = e.dst)
        |SELECT vec_id, min(label) AS cluster, vec_id = min(label) AS is_rep
        |FROM walk GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // sliding-window chunking: W=32 / stride 24, chunk count
    // 1 + ceil(max(n-W,0)/S); the fingerprint is the sum of per-token
    // md5-64 >> 20 over the chunk slice (unsigned shift keeps every
    // term < 2^44, so 128-term sums sit far inside BIGINT both engines)
    "text_chunk_windows" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |n AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n FROM t),
        |c AS (SELECT doc_id, ws, n,
        |        1 + CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT) AS n_chunks FROM n),
        |e AS (SELECT doc_id, ws, n, unnest(range(0, n_chunks)) AS chunk_idx FROM c),
        |f AS (SELECT doc_id, chunk_idx, chunk_idx * 24 AS start_tok,
        |        least(32, n - chunk_idx * 24) AS n_tokens, ws FROM e)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(start_tok AS BIGINT) AS start_tok,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(coalesce(list_reduce(list_transform(
        |      ws[CAST(start_tok + 1 AS BIGINT):CAST(start_tok + n_tokens AS BIGINT)],
        |      x -> CAST(('0x' || substr(md5(x), 1, 16))::UBIGINT >> 20 AS BIGINT)),
        |    (a, b) -> a + b), 0) AS BIGINT) AS fingerprint
        |FROM f ORDER BY doc_id, chunk_idx""".stripMargin,
    // chunk-level exact dedup: positional md5-64 of each window's token
    // string (>>1 keeps it in signed-BIGINT space, the dedup_exact
    // convention); first (doc_id, chunk_idx) per key is the rep
    "text_chunk_dedup" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |n AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n FROM t),
        |c AS (SELECT doc_id, ws, n,
        |        1 + CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT) AS n_chunks FROM n),
        |e AS (SELECT doc_id, ws, n, unnest(range(0, n_chunks)) AS chunk_idx FROM c),
        |g AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |        CAST((('0x' || substr(md5(array_to_string(
        |          ws[CAST(chunk_idx * 24 + 1 AS BIGINT):CAST(chunk_idx * 24 + least(32, n - chunk_idx * 24) AS BIGINT)],
        |          ' ')), 1, 16))::UBIGINT >> 1) AS BIGINT) AS chunk_key
        |      FROM e),
        |r AS (SELECT doc_id, chunk_idx, chunk_key,
        |        first_value(doc_id) OVER (PARTITION BY chunk_key ORDER BY doc_id, chunk_idx) AS rep_doc,
        |        first_value(chunk_idx) OVER (PARTITION BY chunk_key ORDER BY doc_id, chunk_idx) AS rep_chunk
        |      FROM g)
        |SELECT doc_id, chunk_idx, chunk_key,
        |  CASE WHEN doc_id = rep_doc AND chunk_idx = rep_chunk THEN 'keep'
        |       ELSE 'drop_dup' END AS decision,
        |  rep_doc, rep_chunk
        |FROM r ORDER BY doc_id, chunk_idx""".stripMargin,
    // doc purge over chunk-dup mass: majority-duplicated docs drop whole
    // (2*dup > total in integers), minority-dup docs flag partial; same
    // chunk-key/rep-election pipeline as text_chunk_dedup
    "text_chunk_doc_purge" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |n AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n FROM t),
        |c AS (SELECT doc_id, ws, n,
        |        1 + CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT) AS n_chunks FROM n),
        |e AS (SELECT doc_id, ws, n, unnest(range(0, n_chunks)) AS chunk_idx FROM c),
        |g AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |        CAST((('0x' || substr(md5(array_to_string(
        |          ws[CAST(chunk_idx * 24 + 1 AS BIGINT):CAST(chunk_idx * 24 + least(32, n - chunk_idx * 24) AS BIGINT)],
        |          ' ')), 1, 16))::UBIGINT >> 1) AS BIGINT) AS chunk_key
        |      FROM e),
        |r AS (SELECT doc_id, chunk_idx,
        |        first_value(doc_id) OVER (PARTITION BY chunk_key ORDER BY doc_id, chunk_idx) AS rep_doc,
        |        first_value(chunk_idx) OVER (PARTITION BY chunk_key ORDER BY doc_id, chunk_idx) AS rep_chunk
        |      FROM g),
        |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |        CAST(sum(CASE WHEN NOT (doc_id = rep_doc AND chunk_idx = rep_chunk)
        |                      THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
        |      FROM r GROUP BY doc_id)
        |SELECT doc_id, n_chunks, n_dup_chunks,
        |  CASE WHEN n_dup_chunks * 2 > n_chunks THEN 'drop_doc'
        |       WHEN n_dup_chunks > 0 THEN 'partial_dup'
        |       ELSE 'keep_clean' END AS decision
        |FROM d ORDER BY doc_id""".stripMargin,
    // chunk near-dup: the oracle computes the EXACT J>=0.8 chunk-pair
    // list (string shingles, shared-shingle equi-join — never all-pairs),
    // so an LSH recall miss on the Spark side is a hash mismatch, the
    // dedup_minhash_lsh convention; <3-token tails have no 3-gram and
    // sit out on both engines
    "text_chunk_minhash" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |n AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n FROM t),
        |c AS (SELECT doc_id, ws, n,
        |        1 + CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT) AS n_chunks FROM n),
        |e AS (SELECT doc_id, ws, n, unnest(range(0, n_chunks)) AS chunk_idx FROM c),
        |ch AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |         ws[CAST(chunk_idx * 24 + 1 AS BIGINT):CAST(chunk_idx * 24 + least(32, n - chunk_idx * 24) AS BIGINT)] AS cw
        |       FROM e),
        |sh AS (SELECT doc_id, chunk_idx,
        |         list_distinct(list_transform(range(1, len(cw) - 1),
        |           i -> array_to_string(cw[i:i+2], ' '))) AS shingles
        |       FROM ch WHERE len(cw) >= 3),
        |ex AS (SELECT doc_id, chunk_idx, unnest(shingles) AS s, len(shingles) AS sz FROM sh),
        |p AS (SELECT a.doc_id AS doc_a, a.chunk_idx AS chunk_a,
        |        b.doc_id AS doc_b, b.chunk_idx AS chunk_b,
        |        CAST(count(*) AS BIGINT) AS inter_n,
        |        CAST(any_value(a.sz) + any_value(b.sz) - count(*) AS BIGINT) AS union_n
        |      FROM ex a JOIN ex b ON a.s = b.s
        |        AND (a.doc_id < b.doc_id OR (a.doc_id = b.doc_id AND a.chunk_idx < b.chunk_idx))
        |      GROUP BY 1, 2, 3, 4)
        |SELECT doc_a, chunk_a, doc_b, chunk_b, inter_n, union_n
        |FROM p WHERE inter_n * 5 >= union_n * 4
        |ORDER BY doc_a, chunk_a, doc_b, chunk_b""".stripMargin,
    // deterministic global shuffle: the contract is ONE global
    // row_number over the hashed-key order (the engine side computes it
    // as a distributed rank — range bands + driver offsets)
    "text_global_shuffle" ->
      """WITH k AS (SELECT doc_id,
        |    CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT >> 1) AS BIGINT) AS shuffle_key
        |  FROM documents)
        |SELECT doc_id, shuffle_key,
        |  CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS BIGINT) AS shuffle_rank
        |FROM k ORDER BY doc_id""".stripMargin,
    // chunk-granularity packing: rep election (the text_chunk_dedup
    // CTEs), keep only representatives, cumsum in (doc_id, chunk_idx)
    // order — the passage-level twin of text_pack_sequences
    "text_chunk_pack" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |n AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n FROM t),
        |c AS (SELECT doc_id, ws, n,
        |        1 + CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT) AS n_chunks FROM n),
        |e AS (SELECT doc_id, ws, n, unnest(range(0, n_chunks)) AS chunk_idx FROM c),
        |g AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |        CAST((('0x' || substr(md5(array_to_string(
        |          ws[CAST(chunk_idx * 24 + 1 AS BIGINT):CAST(chunk_idx * 24 + least(32, n - chunk_idx * 24) AS BIGINT)],
        |          ' ')), 1, 16))::UBIGINT >> 1) AS BIGINT) AS chunk_key,
        |        CAST(least(32, n - chunk_idx * 24) AS BIGINT) AS n_tokens
        |      FROM e),
        |r AS (SELECT *,
        |        first_value(doc_id) OVER (PARTITION BY chunk_key ORDER BY doc_id, chunk_idx) AS rep_doc,
        |        first_value(chunk_idx) OVER (PARTITION BY chunk_key ORDER BY doc_id, chunk_idx) AS rep_chunk
        |      FROM g),
        |k AS (SELECT doc_id, chunk_idx, n_tokens FROM r
        |      WHERE doc_id = rep_doc AND chunk_idx = rep_chunk),
        |cs AS (SELECT doc_id, chunk_idx, n_tokens,
        |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id, chunk_idx
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start
        |      FROM k)
        |SELECT doc_id, chunk_idx, n_tokens, token_start,
        |  token_start // 2048 AS seq_first,
        |  (token_start + n_tokens - 1) // 2048 AS seq_last,
        |  token_start % 2048 AS seq_offset
        |FROM cs ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_pack_sequences" ->
      """WITH t AS (SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start
        |  FROM t)
        |SELECT doc_id, n_tokens, token_start,
        |  token_start // 2048 AS seq_first,
        |  (token_start + n_tokens - 1) // 2048 AS seq_last,
        |  token_start % 2048 AS seq_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    // vocab = top-16 words by (count DESC, word) with contiguous ids
    // (16 < the synthetic corpus's 31-token vocabulary, so OOV→UNK
    // carries real traffic); the position-weighted checksum makes the id
    // SEQUENCE order-sensitive so any ranking/tokenization drift breaks
    // the hash
    "text_vocab_encode" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
        |tok AS (SELECT doc_id, words[i] AS w, i AS pos
        |        FROM d, unnest(range(1, len(words) + 1)) AS t(i)),
        |vocab AS (
        |  SELECT w, CAST(row_number() OVER (ORDER BY cnt DESC, w) AS BIGINT) AS id
        |  FROM (SELECT w, count(*) AS cnt FROM tok GROUP BY w
        |        ORDER BY cnt DESC, w LIMIT 16))
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
        |  CAST(sum(pos * coalesce(v.id, 0)) AS BIGINT) AS ids_checksum
        |FROM tok LEFT JOIN vocab v USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // per-doc top-3 TF-IDF terms: idf quantized to integer micronats per
    // TERM before the multiply (the perplexity precedent), score an exact
    // long, ties broken by term — the oracle replays every value
    "text_tfidf_topterms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |idf AS (
        |  SELECT term,
        |    CAST(round(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
        |      / count(DISTINCT doc_id)) * 1000000) AS BIGINT) AS idf_unat
        |  FROM toks GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, tf.tf * idf.idf_unat AS score_unat
        |  FROM tf JOIN idf USING (term))
        |SELECT doc_id,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY score_unat DESC, term) AS rank,
        |  term, tf, score_unat
        |FROM scored
        |QUALIFY rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,
    // per-doc unigram entropy: each word's surprisal ln(n/c) quantized to
    // integer micronats BEFORE the weighted sum (the perplexity/tfidf
    // precedent) so the gate compares exact longs
    "text_unigram_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
        |wn AS (SELECT doc_id, w, c, SUM(c) OVER (PARTITION BY doc_id) AS n FROM tf),
        |q AS (SELECT doc_id, c, n,
        |        CAST(round(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS s_unat
        |      FROM wn)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
        |  count(*) AS n_distinct_words,
        |  CAST(SUM(c * s_unat) AS BIGINT) AS entropy_sum_unat,
        |  CAST(floor(SUM(c * s_unat) / max(n)) AS BIGINT) AS mean_entropy_unat
        |FROM q GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_bigram_novelty" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
        |bg AS (SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] AS g
        |       FROM w, unnest(range(1, len(words))) AS t(i)),
        |dfreq AS (SELECT g, count(*) AS df FROM bg GROUP BY g),
        |agg AS (
        |  SELECT b.doc_id, count(*) AS n_distinct_bigrams,
        |    CAST(SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM bg b JOIN dfreq USING (g) GROUP BY b.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(a.n_distinct_bigrams, 0) AS n_distinct_bigrams,
        |  COALESCE(a.n_novel, 0) AS n_novel,
        |  CASE WHEN a.n_distinct_bigrams IS NULL THEN 0
        |       ELSE CAST(round(a.n_novel * 10000.0 / a.n_distinct_bigrams) AS BIGINT) END AS novelty_bp
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "text_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents),
        |c AS (SELECT w, count(*) AS exact_n FROM t GROUP BY w)
        |SELECT w, exact_n, TRUE AS est_ok
        |FROM c ORDER BY exact_n DESC, w LIMIT 20""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mixture reweighting: per-source token mass vs the uniform target
    // share, all floor-division integer arithmetic
    "text_domain_mix" ->
      """WITH ps AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |               count(*) AS n_sources FROM ps),
        |tg AS (SELECT ps.*, total_tokens // n_sources AS t FROM ps, tot),
        |-- overflow-safe floor(t*1e6/n): q1*1000 + (r1*1000)//n with
        |-- q1 = (t*1000)//n, r1 = (t*1000)%n — mirrors the Spark side
        |rt AS (SELECT tg.*, least(1000000,
        |         (t * 1000 // n_tokens) * 1000
        |           + ((t * 1000 % n_tokens) * 1000) // n_tokens) AS rate
        |       FROM tg)
        |SELECT source, n_docs, n_tokens, t AS target_tokens,
        |  CAST(rate AS BIGINT) AS keep_rate_ppm,
        |  CAST((n_tokens // 1000000) * rate
        |    + ((n_tokens % 1000000) * rate) // 1000000 AS BIGINT) AS expected_tokens
        |FROM rt ORDER BY source""".stripMargin,
    // temperature mixing at τ=1/2: integer sqrt weights (IEEE sqrt is
    // correctly rounded in both engines), then the same overflow-split
    // integer arithmetic as text_domain_mix
    "text_temperature_mix" ->
      """WITH ps AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT ps.*, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS sqrt_w FROM ps),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |               CAST(SUM(sqrt_w) AS BIGINT) AS w_sum FROM w),
        |tg AS (SELECT w.*, (total_tokens // w_sum) * sqrt_w
        |         + ((total_tokens % w_sum) * sqrt_w) // w_sum AS t
        |       FROM w, tot),
        |rt AS (SELECT tg.*, least(1000000,
        |         (t * 1000 // n_tokens) * 1000
        |           + ((t * 1000 % n_tokens) * 1000) // n_tokens) AS rate
        |       FROM tg)
        |SELECT source, n_docs, n_tokens, sqrt_w, CAST(t AS BIGINT) AS target_tokens,
        |  CAST(rate AS BIGINT) AS keep_rate_ppm,
        |  CAST((n_tokens // 1000000) * rate
        |    + ((n_tokens % 1000000) * rate) // 1000000 AS BIGINT) AS expected_tokens
        |FROM rt ORDER BY source""".stripMargin,
    // general-τ weights replayed EXACTLY: a double-pow seed window
    // [w0-2, w0+2] plus a 128-bit integer certificate (w^q <= mass^3)
    // picks floor(mass^(3/10)) and floor(mass^(3/4)) — the engine side
    // computes the same floors in BigInteger with no floats at all
    "text_temperature_mix_tau" ->
      """WITH ps AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |seed AS (
        |  SELECT *, greatest(CAST(floor(pow(n_tokens, 0.3)) AS BIGINT), 2) - 2 AS s310,
        |            greatest(CAST(floor(pow(n_tokens, 0.75)) AS BIGINT), 2) - 2 AS s34
        |  FROM ps),
        |w AS (
        |  SELECT source, any_value(n_docs) AS n_docs, any_value(n_tokens) AS n_tokens,
        |    max(CASE WHEN
        |      CAST(s310+k AS HUGEINT)*(s310+k)*(s310+k)*(s310+k)*(s310+k)
        |        *(s310+k)*(s310+k)*(s310+k)*(s310+k)*(s310+k)
        |      <= CAST(n_tokens AS HUGEINT)*n_tokens*n_tokens
        |      THEN s310+k END) AS w310,
        |    max(CASE WHEN
        |      CAST(s34+k AS HUGEINT)*(s34+k)*(s34+k)*(s34+k)
        |      <= CAST(n_tokens AS HUGEINT)*n_tokens*n_tokens
        |      THEN s34+k END) AS w34
        |  FROM seed, range(0, 5) t(k) GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |               CAST(SUM(w310) AS BIGINT) AS ws310,
        |               CAST(SUM(w34) AS BIGINT) AS ws34 FROM w),
        |st AS (
        |  SELECT CAST(300000 AS BIGINT) AS tau_ppm, source, n_docs, n_tokens,
        |    w310 AS w, total_tokens, ws310 AS w_sum FROM w, tot
        |  UNION ALL
        |  SELECT CAST(750000 AS BIGINT), source, n_docs, n_tokens,
        |    w34, total_tokens, ws34 FROM w, tot),
        |tg AS (SELECT st.*, (total_tokens // w_sum) * w
        |         + ((total_tokens % w_sum) * w) // w_sum AS t FROM st)
        |SELECT tau_ppm, source, n_docs, n_tokens, CAST(w AS BIGINT) AS w,
        |  CAST(t AS BIGINT) AS target_tokens,
        |  CAST(least(1000000, (t * 1000 // n_tokens) * 1000
        |    + ((t * 1000 % n_tokens) * 1000) // n_tokens) AS BIGINT) AS keep_rate_ppm
        |FROM tg ORDER BY tau_ppm, source""".stripMargin,
    // the upsampling half of temperature mixing: whole-source epoch
    // repeats + a ppm remainder pass; same integer conventions
    "text_epoch_plan" ->
      """WITH ps AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT ps.*, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS sqrt_w FROM ps),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |               CAST(SUM(sqrt_w) AS BIGINT) AS w_sum FROM w),
        |tg AS (SELECT w.*, (total_tokens // w_sum) * sqrt_w
        |         + ((total_tokens % w_sum) * sqrt_w) // w_sum AS t
        |       FROM w, tot),
        |ep AS (SELECT tg.*, t // n_tokens AS fe,
        |         ((t % n_tokens) * 1000 // n_tokens) * 1000
        |           + (((t % n_tokens) * 1000 % n_tokens) * 1000) // n_tokens AS rr
        |       FROM tg)
        |SELECT source, n_tokens, CAST(t AS BIGINT) AS target_tokens,
        |  CAST(fe AS BIGINT) AS full_epochs,
        |  CAST(rr AS BIGINT) AS rem_rate_ppm,
        |  CAST(fe * n_tokens + (n_tokens // 1000000) * rr
        |    + ((n_tokens % 1000000) * rr) // 1000000 AS BIGINT) AS expected_tokens
        |FROM ep ORDER BY source""".stripMargin,
    "text_quality_score" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(toks) AS n_tokens,
        |  CAST(round(length(text) * 10000.0 / len(toks)) AS BIGINT) AS chars_per_token_bp,
        |  CAST(round(length(regexp_replace(text, '[\w\s]', '', 'g')) * 10000.0 / length(text)) AS BIGINT) AS punct_ratio_bp,
        |  CAST(round(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) * 10000.0 / len(toks)) AS BIGINT) AS stopword_ratio_bp
        |FROM t ORDER BY doc_id""".stripMargin,
    // fastText-style hashed linear scorer: the oracle rebuilds the SAME
    // 2^21-bucket weight table from the literal model (md5-64 bucket,
    // colliding weights sum), regenerates the planted suffixes from
    // doc_id arithmetic, and replays unigram+bigram hashing and the
    // keep/drop rule integer-exactly
    "text_quality_classifier" -> qualityScoreOracle(
      """SELECT doc_id, CAST(n_features AS BIGINT) AS n_features,
        |  CAST(n_hits AS BIGINT) AS n_hits,
        |  CAST(logit_sum AS BIGINT) AS logit_sum,
        |  CASE WHEN logit_sum > 0 THEN 'keep' ELSE 'drop' END AS label
        |FROM sc ORDER BY doc_id"""),
    // the streaming filter scores the IDENTICAL feature stream through
    // the shuffle-free per-row form and keeps logit>0 docs — the oracle
    // is the classifier's replay restricted to the kept set
    "stream_quality_filter" -> qualityScoreOracle(
      """SELECT doc_id, CAST(n_features AS BIGINT) AS n_features,
        |  CAST(logit_sum AS BIGINT) AS logit_sum
        |FROM sc WHERE logit_sum > 0 ORDER BY doc_id"""),
    // streaming passage-identity dedup: the distinct chunk-key set (the
    // text_chunk_dedup chunker SQL, projected to identity — n_tokens is
    // a function of the key, so DISTINCT over the pair is key-distinct)
    "stream_chunk_dedup" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |n AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n FROM t),
        |c AS (SELECT doc_id, ws, n,
        |        1 + CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT) AS n_chunks FROM n),
        |e AS (SELECT doc_id, ws, n, unnest(range(0, n_chunks)) AS chunk_idx FROM c),
        |g AS (SELECT
        |        CAST((('0x' || substr(md5(array_to_string(
        |          ws[CAST(chunk_idx * 24 + 1 AS BIGINT):CAST(chunk_idx * 24 + least(32, n - chunk_idx * 24) AS BIGINT)],
        |          ' ')), 1, 16))::UBIGINT >> 1) AS BIGINT) AS chunk_key,
        |        CAST(least(32, n - chunk_idx * 24) AS BIGINT) AS n_tokens
        |      FROM e)
        |SELECT DISTINCT chunk_key, n_tokens FROM g ORDER BY chunk_key""".stripMargin,
    // the composed pipeline: each stage is the standalone entry's SQL
    // replayed in CTE composition, then the pack cumsum over survivors
    "pipeline_e2e" -> pipelineLedgerOracle(
      """SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS seq_first,
        |  CAST((coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n_tokens - 1) // 2048 AS BIGINT) AS seq_last,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) % 2048 AS BIGINT) AS seq_offset
        |FROM fin WHERE dedup_keep ORDER BY doc_id"""),
    "pipeline_funnel" -> pipelineLedgerOracle(
      """SELECT stage, n_docs, n_tokens FROM (
        |  SELECT '0_ingest' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM fin
        |  UNION ALL SELECT '1_lang_en',
        |    CAST(sum(CASE WHEN lang_keep THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(sum(CASE WHEN lang_keep THEN n_tokens ELSE 0 END) AS BIGINT) FROM fin
        |  UNION ALL SELECT '2_quality',
        |    CAST(sum(CASE WHEN q_keep THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(sum(CASE WHEN q_keep THEN n_tokens ELSE 0 END) AS BIGINT) FROM fin
        |  UNION ALL SELECT '3_dedup',
        |    CAST(sum(CASE WHEN dedup_keep THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(sum(CASE WHEN dedup_keep THEN n_tokens ELSE 0 END) AS BIGINT) FROM fin)
        |ORDER BY stage"""),
    // the oracle states the selection CONTRACT literally (global ordered
    // window cumsum); the spark side implements it by histogram cutoff —
    // a hash mismatch means the phased selection diverged from the greedy
    // global rule
    "text_budget_select" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(round(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) * 10000.0 / len(toks)) AS BIGINT) AS score_bp,
        |    CAST(len(toks) AS BIGINT) AS n_tokens
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)),
        |b AS (SELECT CAST(sum(n_tokens) AS BIGINT) // 10 AS budget FROM d),
        |r AS (SELECT d.*, sum(n_tokens) OVER (ORDER BY score_bp DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM d)
        |SELECT doc_id, score_bp, n_tokens FROM r, b WHERE cum <= budget
        |ORDER BY doc_id""".stripMargin,
    "text_lang_id" ->
      """WITH t AS (SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
        |h AS (SELECT doc_id, lang,
        |  len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS hits_en,
        |  len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','nicht'], x))) AS hits_de,
        |  len(list_filter(toks, x -> list_contains(['le','les','et','est','une','dans'], x))) AS hits_fr,
        |  len(list_filter(toks, x -> list_contains(['el','los','que','una','por','con'], x))) AS hits_es,
        |  len(list_filter(toks, x -> list_contains(['的','是','了','在','我','有'], x))) AS hits_zh
        |  FROM t)
        |SELECT doc_id, lang,
        |  CASE WHEN greatest(hits_en,hits_de,hits_fr,hits_es,hits_zh) = 0 THEN 'und'
        |       WHEN hits_en = greatest(hits_en,hits_de,hits_fr,hits_es,hits_zh) THEN 'en'
        |       WHEN hits_de = greatest(hits_en,hits_de,hits_fr,hits_es,hits_zh) THEN 'de'
        |       WHEN hits_fr = greatest(hits_en,hits_de,hits_fr,hits_es,hits_zh) THEN 'fr'
        |       WHEN hits_es = greatest(hits_en,hits_de,hits_fr,hits_es,hits_zh) THEN 'es'
        |       ELSE 'zh' END AS pred_lang,
        |  greatest(hits_en,hits_de,hits_fr,hits_es,hits_zh) AS top_hits
        |FROM h ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_ngram_freq" ->
      """WITH w AS (SELECT string_split_regex(trim(text), '\s+') AS words FROM documents),
        |b AS (SELECT words[i] || ' ' || words[i+1] AS bigram
        |      FROM w, unnest(range(1, len(words))) AS t(i))
        |SELECT bigram, count(*) AS n FROM b GROUP BY 1 ORDER BY n DESC, bigram LIMIT 100""".stripMargin,
    // bucket = bits 8..14 of the md5-based 64-bit id hash (engine-portable
    // by construction); en kept under 32/128, minority languages under 64
    "text_stratified_sample" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT >> 8) & 127 AS BIGINT) AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM h
        |WHERE bucket < CASE WHEN lang = 'en' THEN 32 ELSE 64 END
        |ORDER BY doc_id""".stripMargin,
    // A-ES keys are doubles (ln), but only the selected ID SET is output
    // and compared — adjacent keys differ by orders of magnitude more
    // than a libm ulp, so the set is engine-stable
    "text_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT doc_id, n_chars,
        |    ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT >> 11) + 1)
        |       / 9007199254740992.0) / n_chars AS k
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, n_chars
        |FROM (SELECT doc_id, n_chars FROM keyed ORDER BY k DESC LIMIT 100)
        |ORDER BY doc_id""".stripMargin,
    "text_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents),
        |wf AS (SELECT word, count(*) AS f FROM w WHERE len(word) >= 2 GROUP BY word),
        |p AS (SELECT unnest([substr(word, i, 2) FOR i IN range(1, len(word))]) AS pair, f FROM wf)
        |SELECT pair, CAST(sum(f) AS BIGINT) AS n
        |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin,
    // BPE encode: the oracle replays the PLANTED merge table (the chain
    // below is generated from the same TextOps.BpeMerges literal) with
    // the identical doubled-delimiter replace semantics, then re-derives
    // subword ids, the position-weighted checksum, and the round-trip
    "text_bpe_encode" -> {
      val chain = graft.text.TextOps.BpeMerges.foldLeft(
        "regexp_replace(word, '(.)', ' \\1', 'g') || ' '") {
        case (s, (l, r)) =>
          s"replace(replace(replace($s, ' ', '  '), ' $l  $r ', ' $l$r '), '  ', ' ')"
      }
      """WITH w AS (
        |  SELECT word, count(*) AS f
        |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents)
        |  WHERE len(word) >= 1 GROUP BY word),
        |enc AS (
        |  SELECT word, f, string_split(trim(""".stripMargin + chain +
        """), ' ') AS subwords FROM w),
        |ids AS (
        |  SELECT sub, CAST(row_number() OVER (ORDER BY sub) AS BIGINT) AS id
        |  FROM (SELECT DISTINCT unnest(subwords) AS sub FROM enc)),
        |ex AS (
        |  SELECT word, f, CAST(length(word) AS BIGINT) AS n_chars,
        |    CAST(len(subwords) AS BIGINT) AS n_subwords,
        |    array_to_string(subwords, '') = word AS roundtrip_ok,
        |    CAST(generate_subscripts(subwords, 1) AS BIGINT) AS pos,
        |    unnest(subwords) AS sub
        |  FROM enc)
        |SELECT e.word, min(e.f) AS f, min(e.n_chars) AS n_chars,
        |  min(e.n_subwords) AS n_subwords,
        |  CAST(sum(e.pos * i.id) AS BIGINT) AS ids_checksum,
        |  bool_and(e.roundtrip_ok) AS roundtrip_ok
        |FROM ex e JOIN ids i USING (sub)
        |GROUP BY e.word ORDER BY e.word""".stripMargin
    },
    // per-bigram integer micronat quantization BEFORE the sum: a sum of
    // doubles is partition-order-dependent and engine-divergent; a sum
    // of per-row-rounded longs is exact on both sides
    "text_lm_perplexity" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
        |refw AS (SELECT unnest(words) AS w FROM d WHERE doc_id % 5 = 0),
        |uni AS (SELECT w, count(*) AS c1 FROM refw GROUP BY w),
        |vocab AS (SELECT count(*) AS v FROM uni),
        |refbg AS (
        |  SELECT unnest([words[i] || ' ' || words[i+1] FOR i IN range(1, len(words))]) AS bg
        |  FROM d WHERE doc_id % 5 = 0 AND len(words) >= 2),
        |bi AS (SELECT bg, count(*) AS c12 FROM refbg GROUP BY bg),
        |inst AS (
        |  SELECT doc_id,
        |    unnest([words[i] FOR i IN range(1, len(words))]) AS w1,
        |    unnest([words[i] || ' ' || words[i+1] FOR i IN range(1, len(words))]) AS bg
        |  FROM d WHERE doc_id % 5 <> 0 AND len(words) >= 2),
        |nll AS (
        |  SELECT i.doc_id,
        |    CAST(round(ln((coalesce(u.c1, 0) + (SELECT v FROM vocab))
        |                  / (coalesce(b.c12, 0) + 1)) * 1000000.0) AS BIGINT) AS nll_unat
        |  FROM inst i LEFT JOIN uni u ON i.w1 = u.w LEFT JOIN bi b ON i.bg = b.bg)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(nll_unat) AS BIGINT) AS nll_sum_unat,
        |  CAST(sum(nll_unat) // count(*) AS BIGINT) AS mean_nll_unat
        |FROM nll GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // metadata MI audit: joint/marginal counts and the micronat PMI
    // replayed literally (double factors multiplied in the same order)
    "text_lang_source_mi" ->
      """WITH cells AS (SELECT lang, source, count(*) AS n_ls FROM documents GROUP BY 1, 2),
        |lm AS (SELECT lang, sum(n_ls) AS n_l FROM cells GROUP BY 1),
        |sm AS (SELECT source, sum(n_ls) AS n_s FROM cells GROUP BY 1),
        |tot AS (SELECT sum(n_ls) AS n FROM cells)
        |SELECT c.lang, c.source, c.n_ls,
        |  CAST(round(ln(CAST(c.n_ls AS DOUBLE) * CAST(t.n AS DOUBLE)
        |    / (CAST(l.n_l AS DOUBLE) * CAST(s.n_s AS DOUBLE))) * 1000000.0) AS BIGINT) AS pmi_unat,
        |  CAST(c.n_ls * CAST(round(ln(CAST(c.n_ls AS DOUBLE) * CAST(t.n AS DOUBLE)
        |    / (CAST(l.n_l AS DOUBLE) * CAST(s.n_s AS DOUBLE))) * 1000000.0) AS BIGINT) AS BIGINT) AS contrib_unat
        |FROM cells c JOIN lm l USING (lang) JOIN sm s USING (source), tot t
        |ORDER BY c.lang, c.source""".stripMargin,
    // dedup-aware split: md5 buckets replayed exactly; the leak flag
    // re-states the Jaccard pair rule literally and joins across splits
    "text_train_split" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(words[i:i+2], ' ') FOR i IN range(1, greatest(len(words)-2, 1)+1)]) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents)),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE 2 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
        |lab AS (
        |  SELECT doc_id,
        |    CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |          CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT >> 8) % 100 AS BIGINT) AS bucket
        |        FROM documents)),
        |leaky AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT p.doc_a AS doc_id FROM pairs p
        |      JOIN lab x ON p.doc_a = x.doc_id JOIN lab y ON p.doc_b = y.doc_id
        |      WHERE x.split <> y.split
        |    UNION ALL
        |    SELECT p.doc_b FROM pairs p
        |      JOIN lab x ON p.doc_a = x.doc_id JOIN lab y ON p.doc_b = y.doc_id
        |      WHERE x.split <> y.split))
        |SELECT l.doc_id, l.split, k.doc_id IS NOT NULL AS is_leaky
        |FROM lab l LEFT JOIN leaky k ON l.doc_id = k.doc_id
        |ORDER BY l.doc_id""".stripMargin,
    // DSIR importance weights: the oracle replays the smoothed unigram
    // log-ratio per word occurrence in integer micronats (factors cast
    // to double before multiplying, matching the implementation exactly)
    "text_dsir_weights" ->
      """WITH d AS (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS words FROM documents),
        |occ AS (SELECT doc_id, source IN ('src0', 'src1', 'src2', 'src3') AS tgt, unnest(words) AS w FROM d),
        |raw AS (SELECT w, count(*) AS cr FROM occ GROUP BY w),
        |tgt AS (SELECT w, count(*) AS ct FROM occ WHERE tgt GROUP BY w),
        |sc AS (SELECT count(*) AS nr, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS nt,
        |         count(DISTINCT w) AS v FROM occ),
        |lw AS (
        |  SELECT o.doc_id,
        |    CAST(round(ln(
        |      (CAST(coalesce(t.ct, 0) + 1 AS DOUBLE) * CAST(s.nr + s.v AS DOUBLE)) /
        |      (CAST(r.cr + 1 AS DOUBLE) * CAST(s.nt + s.v AS DOUBLE))) * 1000000.0) AS BIGINT) AS lw_unat
        |  FROM occ o JOIN raw r USING (w) LEFT JOIN tgt t USING (w), sc s)
        |SELECT doc_id, count(*) AS n_words,
        |  CAST(sum(lw_unat) AS BIGINT) AS logw_sum_unat,
        |  CAST(sum(lw_unat) // count(*) AS BIGINT) AS mean_logw_unat
        |FROM lw GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // CCNet bucketing: the perplexity CTE chain above, then discrete
    // per-language tercile cutoffs from the md5-bucket sample and an
    // integer comparison — replayed value-for-value
    "text_ccnet_bucket" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
        |refw AS (SELECT unnest(words) AS w FROM d WHERE doc_id % 5 = 0),
        |uni AS (SELECT w, count(*) AS c1 FROM refw GROUP BY w),
        |vocab AS (SELECT count(*) AS v FROM uni),
        |refbg AS (
        |  SELECT unnest([words[i] || ' ' || words[i+1] FOR i IN range(1, len(words))]) AS bg
        |  FROM d WHERE doc_id % 5 = 0 AND len(words) >= 2),
        |bi AS (SELECT bg, count(*) AS c12 FROM refbg GROUP BY bg),
        |inst AS (
        |  SELECT doc_id,
        |    unnest([words[i] FOR i IN range(1, len(words))]) AS w1,
        |    unnest([words[i] || ' ' || words[i+1] FOR i IN range(1, len(words))]) AS bg
        |  FROM d WHERE doc_id % 5 <> 0 AND len(words) >= 2),
        |nll AS (
        |  SELECT i.doc_id,
        |    CAST(round(ln((coalesce(u.c1, 0) + (SELECT v FROM vocab))
        |                  / (coalesce(b.c12, 0) + 1)) * 1000000.0) AS BIGINT) AS nll_unat
        |  FROM inst i LEFT JOIN uni u ON i.w1 = u.w LEFT JOIN bi b ON i.bg = b.bg),
        |sc AS (SELECT doc_id, CAST(sum(nll_unat) // count(*) AS BIGINT) AS mean_nll_unat
        |       FROM nll GROUP BY doc_id),
        |wl AS (SELECT s.doc_id, dd.lang, s.mean_nll_unat FROM sc s JOIN documents dd USING (doc_id)),
        |np AS (SELECT least(1024, (1024 * 1000 + count(*) - 1) // count(*)) AS cap FROM documents),
        |samp AS (
        |  SELECT wl.* FROM wl, np
        |  WHERE CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT >> 8) & 1023 AS BIGINT) < cap),
        |ranked AS (
        |  SELECT lang, mean_nll_unat,
        |    row_number() OVER (PARTITION BY lang ORDER BY mean_nll_unat, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS m
        |  FROM samp),
        |cuts AS (
        |  SELECT lang,
        |    max(CASE WHEN rn = (m + 2) // 3 THEN mean_nll_unat END) AS tc1,
        |    max(CASE WHEN rn = (2 * m + 2) // 3 THEN mean_nll_unat END) AS tc2
        |  FROM ranked GROUP BY lang),
        |granked AS (
        |  SELECT mean_nll_unat,
        |    row_number() OVER (ORDER BY mean_nll_unat, doc_id) AS grn,
        |    count(*) OVER () AS gm
        |  FROM samp),
        |gcuts AS (
        |  SELECT max(CASE WHEN grn = (gm + 2) // 3 THEN mean_nll_unat END) AS g1,
        |    max(CASE WHEN grn = (2 * gm + 2) // 3 THEN mean_nll_unat END) AS g2
        |  FROM granked)
        |SELECT w.doc_id, w.lang, w.mean_nll_unat,
        |  CASE WHEN w.mean_nll_unat <= coalesce(c.tc1, g.g1) THEN 'head'
        |       WHEN w.mean_nll_unat <= coalesce(c.tc2, g.g2) THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM wl w LEFT JOIN cuts c USING (lang), gcuts g ORDER BY w.doc_id""".stripMargin,
    // exact-substring dedup: positional 8-gram postings on the SAME
    // 63-bit md5 keys as the implementation (identical hash, identical
    // collisions), diagonal runs via pos - row_number grouping
    "text_substring_dedup" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |g0 AS (SELECT doc_id, unnest(range(1, greatest(len(w) - 7, 0) + 1)) AS pos, w
        |       FROM d WHERE len(w) >= 8),
        |g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |        CAST((('0x' || substr(md5(array_to_string(w[pos:pos+7], ' ')), 1, 16))::UBIGINT >> 1) AS BIGINT) AS gram_h
        |      FROM g0),
        |rare AS (SELECT gram_h FROM (SELECT gram_h, count(DISTINCT doc_id) AS df
        |                             FROM g GROUP BY gram_h) WHERE df <= 32),
        |cg AS (SELECT g.* FROM g JOIN rare USING (gram_h)),
        |hits AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, a.pos - b.pos AS diag
        |  FROM cg a JOIN cg b ON a.gram_h = b.gram_h AND a.doc_id < b.doc_id),
        |runs AS (
        |  SELECT doc_a, doc_b, diag,
        |    pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
        |  FROM hits),
        |rl AS (SELECT doc_a, doc_b, diag, grp, count(*) AS run_len
        |       FROM runs GROUP BY doc_a, doc_b, diag, grp)
        |SELECT doc_a, doc_b, CAST(max(run_len) + 7 AS BIGINT) AS longest_words,
        |  CAST(sum(run_len) AS BIGINT) AS n_shared_grams
        |FROM rl GROUP BY doc_a, doc_b HAVING max(run_len) + 7 >= 9
        |ORDER BY doc_a, doc_b""".stripMargin,
    // span dedup + reconstruction: strided 10-word chunks on the SAME
    // 63-bit md5 keys as the implementation; corpus-wide first
    // occurrence by (doc_id, chunk_no) survives, text reassembled
    "text_sentence_dedup" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |c0 AS (SELECT doc_id, unnest(range(0, (len(w) - 1) // 10 + 1)) AS chunk_no, w FROM d),
        |ch AS (SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
        |         array_to_string(w[chunk_no*10+1 : chunk_no*10+10], ' ') AS chunk
        |       FROM c0),
        |h AS (SELECT *, CAST((('0x' || substr(md5(chunk), 1, 16))::UBIGINT >> 1) AS BIGINT) AS gram_h
        |      FROM ch),
        |k AS (SELECT *, row_number() OVER (PARTITION BY gram_h ORDER BY doc_id, chunk_no) = 1 AS kept
        |      FROM h)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  coalesce(array_to_string(list(chunk ORDER BY chunk_no) FILTER (WHERE kept), ' '), '') AS kept_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_repetition_ratio" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
        |b AS (SELECT doc_id, words,
        |        CASE WHEN len(words) >= 2
        |          THEN [array_to_string(words[i:i+1], ' ') FOR i IN range(1, len(words))]
        |        END AS bg
        |      FROM w)
        |SELECT doc_id, len(words) AS n_words,
        |  CAST(round((len(words) - len(list_distinct(words))) * 10000.0 / len(words)) AS BIGINT) AS dup_word_bp,
        |  CAST(round((len(bg) - len(list_distinct(bg))) * 10000.0 / len(bg)) AS BIGINT) AS dup_bigram_bp
        |FROM b ORDER BY doc_id""".stripMargin,
    "text_rare_word_ratio" ->
      """WITH ex AS (
        |  SELECT doc_id, len(ws) AS n_distinct_words, unnest(ws) AS w
        |  FROM (SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS ws
        |        FROM documents)),
        |wdf AS (SELECT *, count(*) OVER (PARTITION BY w) AS df FROM ex)
        |SELECT doc_id, max(n_distinct_words) AS n_distinct_words,
        |  CAST(sum(CASE WHEN df * 10 < (SELECT count(*) FROM documents) THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |  CAST(round(sum(CASE WHEN df * 10 < (SELECT count(*) FROM documents) THEN 1 ELSE 0 END) * 10000.0
        |    / max(n_distinct_words)) AS BIGINT) AS rare_word_bp
        |FROM wdf GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_boilerplate_spans" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(words[i:i+4], ' ') FOR i IN range(1, greatest(len(words)-4, 1)+1)]) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents)),
        |ex AS (SELECT doc_id, len(s) AS n_spans, unnest(s) AS g FROM sh),
        |cnt AS (SELECT g, count(DISTINCT doc_id) AS nd FROM ex GROUP BY g)
        |SELECT e.doc_id, max(e.n_spans) AS n_spans,
        |  CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  CAST(round(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) * 10000.0 / max(e.n_spans)) AS BIGINT) AS boilerplate_bp
        |FROM ex e JOIN cnt c USING (g)
        |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin,
    "text_contamination" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(words[i:i+4], ' ') FOR i IN range(1, greatest(len(words)-4, 1)+1)]) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents)),
        |bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
        |ev AS (SELECT doc_id, len(s) AS n_spans, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0)
        |SELECT doc_id, max(n_spans) AS n_spans,
        |  CAST(sum(CASE WHEN g IN (SELECT g FROM bench) THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |  CAST(round(sum(CASE WHEN g IN (SELECT g FROM bench) THEN 1 ELSE 0 END) * 10000.0 / max(n_spans)) AS BIGINT) AS contam_bp
        |FROM ev GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // quantize-then-project in pure integer arithmetic: sums are
    // order-independent, so the oracle replays every projected value
    // exactly with no float-summation-order hazard
    // power-iteration PCA: three unrolled integer-exact rounds (milli
    // quantization, truncating mean-centering, DIV-1024 dot scores,
    // max-abs-1000 renorm) — every intermediate replayed bit-for-bit
    "embed_pca_power" ->
      """WITH e AS (SELECT vec_id, unnest(range(64)) AS dim, embedding FROM embeddings),
        |q AS (SELECT vec_id, CAST(dim AS BIGINT) AS dim,
        |        CAST(round(CAST(embedding[dim + 1] AS DOUBLE) * 1000) AS BIGINT) AS q FROM e),
        |m AS (SELECT dim, sum(q) // count(*) AS mu FROM q GROUP BY dim),
        |c AS (SELECT vec_id, q.dim, q - mu AS c FROM q JOIN m USING (dim)),
        |d1 AS (SELECT vec_id, sum(c * 1000) // 1024 AS s FROM c GROUP BY vec_id),
        |y1 AS (SELECT dim, sum(c * s) AS y FROM c JOIN d1 USING (vec_id) GROUP BY dim),
        |x1 AS (SELECT greatest(max(abs(y)), 1) AS mx FROM y1),
        |v1 AS (SELECT dim, (y * 1000) // mx AS v FROM y1, x1),
        |d2 AS (SELECT vec_id, sum(c * v) // 1024 AS s FROM c JOIN v1 USING (dim) GROUP BY vec_id),
        |y2 AS (SELECT dim, sum(c * s) AS y FROM c JOIN d2 USING (vec_id) GROUP BY dim),
        |x2 AS (SELECT greatest(max(abs(y)), 1) AS mx FROM y2),
        |v2 AS (SELECT dim, (y * 1000) // mx AS v FROM y2, x2),
        |d3 AS (SELECT vec_id, sum(c * v) // 1024 AS s FROM c JOIN v2 USING (dim) GROUP BY vec_id),
        |y3 AS (SELECT dim, sum(c * s) AS y FROM c JOIN d3 USING (vec_id) GROUP BY dim),
        |x3 AS (SELECT greatest(max(abs(y)), 1) AS mx FROM y3),
        |v3 AS (SELECT dim, (y * 1000) // mx AS v FROM y3, x3)
        |SELECT dim, CAST(v AS BIGINT) AS component FROM v3 ORDER BY dim""".stripMargin,
    "embed_project_rand" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |m AS (SELECT vec_id, vec,
        |        list_max(list_transform(vec, x -> abs(x))) AS maxabs FROM v),
        |q AS (SELECT vec_id,
        |        CASE WHEN maxabs = 0 THEN list_transform(vec, x -> 0)
        |             ELSE list_transform(vec,
        |               x -> CAST(round(x / maxabs * 127.0) AS INTEGER)) END AS qvec
        |      FROM m),
        |d AS (SELECT vec_id, qvec, unnest(range(8)) AS dim FROM q)
        |SELECT vec_id, dim,
        |  CAST(list_sum(list_transform(range(len(qvec)),
        |    j -> qvec[j + 1] * ((j * 131 + dim * 17 + j * dim * 29) % 257 % 7 - 3))) AS BIGINT) AS y
        |FROM d ORDER BY vec_id, dim""".stripMargin,
    "embed_quantize_int8" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |m AS (SELECT vec_id, vec,
        |        list_max(list_transform(vec, x -> abs(x))) AS maxabs FROM v)
        |SELECT vec_id, maxabs,
        |  CASE WHEN maxabs = 0
        |    THEN array_to_string(list_transform(vec, x -> '0'), ',')
        |    ELSE array_to_string(list_transform(vec,
        |      x -> CAST(CAST(round(x / maxabs * 127.0) AS INTEGER) AS VARCHAR)), ',')
        |  END AS qvec_csv
        |FROM m ORDER BY vec_id""".stripMargin,
    "text_pii_scrub" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |    text || ' contact bob' || doc_id || '@mail.example.com' ||
        |    ' visit https://ex.example/x' || doc_id || ' acct ' || (doc_id + 10000000) AS d
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(d,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^\s]+', '<URL>', 'g'),
        |    '\d{7,}', '<NUM>', 'g') AS clean,
        |  length(d) - length(regexp_replace(regexp_replace(regexp_replace(d,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^\s]+', '<URL>', 'g'),
        |    '\d{7,}', '<NUM>', 'g')) AS n_chars_redacted
        |FROM dirty ORDER BY doc_id""".stripMargin,
    "mm_binary_stats" ->
      """SELECT doc_id, source, octet_length(encode(text)) AS n_bytes, md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // recomputes the audio metadata the Scala side must RECOVER by parsing
    // its own RIFF container — a builder/parser offset bug breaks the match
    "mm_audio_meta" ->
      """SELECT doc_id,
        |  8000 + (doc_id % 5) * 4000 AS sample_rate,
        |  1 + doc_id % 2 AS n_channels,
        |  CAST(16 AS BIGINT) AS bits_per_sample,
        |  octet_length(encode(text)) // ((1 + doc_id % 2) * 2) AS n_samples,
        |  (octet_length(encode(text)) // ((1 + doc_id % 2) * 2)) * 1000000
        |    // (8000 + (doc_id % 5) * 4000) AS duration_us
        |FROM documents ORDER BY doc_id""".stripMargin,
    // windowed PCM energy replayed from byte arithmetic: sample s's two
    // little-endian bytes are (id*31 + 2s) and (id*31 + 2s + 1) mod 256,
    // int16 sign handled explicitly — the Spark side must chunk-walk to
    // the data offset and decode real signed samples to reproduce it
    "mm_audio_energy" ->
      """WITH p AS (
        |  SELECT d.doc_id, 1 + d.doc_id % 2 AS ch, w.i AS window_idx,
        |    c.i AS channel, j.i AS j
        |  FROM documents d, range(8) w(i), range(2) c(i), range(64) j(i)
        |  WHERE c.i < 1 + d.doc_id % 2
        |    AND w.i < (512 // (1 + d.doc_id % 2)) // 64),
        |s AS (
        |  SELECT doc_id, channel, window_idx,
        |    (doc_id * 31 + ((window_idx * 64 + j) * ch + channel) * 2) % 256
        |      + 256 * ((doc_id * 31 + ((window_idx * 64 + j) * ch + channel) * 2 + 1) % 256)
        |      AS raw
        |  FROM p),
        |v AS (
        |  SELECT doc_id, channel, window_idx,
        |    CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
        |  FROM s)
        |SELECT doc_id, channel, window_idx, count(*) AS n_samples,
        |  CAST(SUM(v * v) AS BIGINT) AS sum_sq,
        |  CAST(MAX(ABS(v)) AS BIGINT) AS peak_abs
        |FROM v GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // VAD spans: the energy replay above, then the adaptive per-channel
    // mean threshold and index − row_number run grouping, all integer
    "mm_audio_vad" ->
      """WITH p AS (
        |  SELECT d.doc_id, 1 + d.doc_id % 2 AS ch, w.i AS window_idx,
        |    c.i AS channel, j.i AS j
        |  FROM documents d, range(8) w(i), range(2) c(i), range(64) j(i)
        |  WHERE c.i < 1 + d.doc_id % 2
        |    AND w.i < (512 // (1 + d.doc_id % 2)) // 64),
        |s AS (
        |  SELECT doc_id, channel, window_idx,
        |    (doc_id * 31 + ((window_idx * 64 + j) * ch + channel) * 2) % 256
        |      + 256 * ((doc_id * 31 + ((window_idx * 64 + j) * ch + channel) * 2 + 1) % 256)
        |      AS raw
        |  FROM p),
        |v AS (
        |  SELECT doc_id, channel, window_idx,
        |    CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
        |  FROM s),
        |e AS (SELECT doc_id, channel, window_idx, CAST(SUM(v * v) AS BIGINT) AS sum_sq
        |      FROM v GROUP BY 1, 2, 3),
        |st AS (SELECT doc_id, channel, count(*) AS n_windows,
        |         sum(sum_sq) // count(*) AS thr
        |       FROM e GROUP BY 1, 2),
        |act AS (
        |  SELECT e.doc_id, e.channel, e.window_idx,
        |    e.window_idx - row_number() OVER (PARTITION BY e.doc_id, e.channel ORDER BY e.window_idx) AS grp
        |  FROM e JOIN st USING (doc_id, channel) WHERE e.sum_sq > st.thr),
        |sp AS (SELECT doc_id, channel, grp, count(*) AS len
        |       FROM act GROUP BY 1, 2, 3),
        |agg AS (SELECT doc_id, channel, sum(len) AS act_n, count(*) AS span_n, max(len) AS longest
        |        FROM sp GROUP BY 1, 2)
        |SELECT st.doc_id, st.channel, st.n_windows,
        |  CAST(coalesce(a.act_n, 0) AS BIGINT) AS n_active,
        |  CAST(coalesce(a.span_n, 0) AS BIGINT) AS n_spans,
        |  CAST(coalesce(a.longest, 0) AS BIGINT) AS longest_span
        |FROM st LEFT JOIN agg a USING (doc_id, channel)
        |ORDER BY st.doc_id, st.channel""".stripMargin,
    // the decoded-pixel aggregate recomputed from pure arithmetic: the
    // raster is (doc_id*31 + k) mod 256 by construction, so DuckDB can
    // replay the sum over a lateral range() without any image library —
    // the Spark side must invert real PNG (inflate + unfilter) / BMP
    // (bottom-up BGR) containers to reproduce it
    "mm_pixel_decode" ->
      """SELECT d.doc_id,
        |  CASE WHEN d.doc_id % 4 = 3 THEN 'bmp' ELSE 'png' END AS format,
        |  16 + d.doc_id % 16 AS width,
        |  8 + d.doc_id % 8 AS height,
        |  CAST(CASE d.doc_id % 4 WHEN 0 THEN 1 WHEN 2 THEN 4 ELSE 3 END AS BIGINT) AS channels,
        |  (16 + d.doc_id % 16) * (8 + d.doc_id % 8)
        |    * (CASE d.doc_id % 4 WHEN 0 THEN 1 WHEN 2 THEN 4 ELSE 3 END) AS n_raster_bytes,
        |  CAST(SUM((d.doc_id * 31 + t.k) % 256) AS BIGINT) AS pixel_sum
        |-- 1860 = 31*15*4, the max raster size; this DuckDB's range() takes
        |-- no lateral column args, so over-generate and filter
        |FROM documents d, range(1860) t(k)
        |WHERE t.k < (16 + d.doc_id % 16) * (8 + d.doc_id % 8)
        |    * (CASE d.doc_id % 4 WHEN 0 THEN 1 WHEN 2 THEN 4 ELSE 3 END)
        |GROUP BY 1,2,3,4,5,6
        |ORDER BY d.doc_id""".stripMargin,
    // full perceptual-dedup pipeline replayed arithmetically: hashes for
    // the corpus PLUS planted perturbed variants, all-pairs popcount
    // distance, hamming <= 3 cut (the engine's banded join is recall-exact
    // by pigeonhole, so the all-pairs oracle is the same set)
    "mm_phash_neardup" ->
      """WITH ids AS (
        |  SELECT doc_id, doc_id AS src, 0 AS pert FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, doc_id, 1 FROM documents WHERE doc_id % 8 = 0),
        |px AS (
        |  SELECT i.doc_id, i.src, i.pert,
        |    16 + i.src % 16 AS W, 8 + i.src % 8 AS H,
        |    CASE i.src % 4 WHEN 0 THEN 1 WHEN 2 THEN 4 ELSE 3 END AS C,
        |    t.k AS p
        |  FROM ids i, range(465) t(k)
        |  WHERE t.k < (16 + i.src % 16) * (8 + i.src % 8)),
        |lum AS (
        |  SELECT doc_id, src, pert, W, H, p,
        |    CAST(SUM((src * 31 + p * C + c.i
        |      + CASE WHEN pert = 1 AND (p * C + c.i) % 97 = 0 THEN 8 ELSE 0 END) % 256) AS BIGINT) AS lsum
        |  FROM px, range(4) c(i) WHERE c.i < C
        |  GROUP BY doc_id, src, pert, W, H, p),
        |cells AS (
        |  SELECT doc_id, ((p % W) * 8) // W AS gx, ((p // W) * 8) // H AS gy,
        |    CAST(SUM(lsum) AS BIGINT) AS csum, COUNT(*) AS cn
        |  FROM lum GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, CAST(SUM(csum) AS BIGINT) AS tsum, CAST(SUM(cn) AS BIGINT) AS tn
        |        FROM cells GROUP BY doc_id),
        |bits AS (
        |  SELECT c.doc_id, gy * 8 + gx AS pos,
        |    CASE WHEN c.csum * t.tn > t.tsum * c.cn THEN 1 ELSE 0 END AS b
        |  FROM cells c JOIN tot t USING (doc_id)),
        |hashes AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN pos < 32 THEN b * (CAST(1 AS BIGINT) << pos) ELSE 0 END) AS BIGINT) AS hash_lo,
        |    CAST(SUM(CASE WHEN pos >= 32 THEN b * (CAST(1 AS BIGINT) << (pos - 32)) ELSE 0 END) AS BIGINT) AS hash_hi
        |  FROM bits GROUP BY doc_id)
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(bit_count(xor(a.hash_lo, b.hash_lo)) + bit_count(xor(a.hash_hi, b.hash_hi)) AS BIGINT) AS hamming
        |  FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id) s
        |WHERE hamming <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    // image dedup clusters: the neardup hash arithmetic above, then
    // LITERAL reachability (recursive min-label walk) over the pair
    // graph — the pointer-jumping implementation must reproduce it
    "mm_phash_clusters" ->
      """WITH RECURSIVE ids AS MATERIALIZED (
        |  SELECT doc_id, doc_id AS src, 0 AS pert FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, doc_id, 1 FROM documents WHERE doc_id % 8 = 0),
        |px AS (
        |  SELECT i.doc_id, i.src, i.pert,
        |    16 + i.src % 16 AS W, 8 + i.src % 8 AS H,
        |    CASE i.src % 4 WHEN 0 THEN 1 WHEN 2 THEN 4 ELSE 3 END AS C,
        |    t.k AS p
        |  FROM ids i, range(465) t(k)
        |  WHERE t.k < (16 + i.src % 16) * (8 + i.src % 8)),
        |lum AS (
        |  SELECT doc_id, src, pert, W, H, p,
        |    CAST(SUM((src * 31 + p * C + c.i
        |      + CASE WHEN pert = 1 AND (p * C + c.i) % 97 = 0 THEN 8 ELSE 0 END) % 256) AS BIGINT) AS lsum
        |  FROM px, range(4) c(i) WHERE c.i < C
        |  GROUP BY doc_id, src, pert, W, H, p),
        |cells AS (
        |  SELECT doc_id, ((p % W) * 8) // W AS gx, ((p // W) * 8) // H AS gy,
        |    CAST(SUM(lsum) AS BIGINT) AS csum, COUNT(*) AS cn
        |  FROM lum GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, CAST(SUM(csum) AS BIGINT) AS tsum, CAST(SUM(cn) AS BIGINT) AS tn
        |        FROM cells GROUP BY doc_id),
        |bits AS (
        |  SELECT c.doc_id, gy * 8 + gx AS pos,
        |    CASE WHEN c.csum * t.tn > t.tsum * c.cn THEN 1 ELSE 0 END AS b
        |  FROM cells c JOIN tot t USING (doc_id)),
        |hashes AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN pos < 32 THEN b * (CAST(1 AS BIGINT) << pos) ELSE 0 END) AS BIGINT) AS hash_lo,
        |    CAST(SUM(CASE WHEN pos >= 32 THEN b * (CAST(1 AS BIGINT) << (pos - 32)) ELSE 0 END) AS BIGINT) AS hash_hi
        |  FROM bits GROUP BY doc_id),
        |pairs AS MATERIALIZED (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.hash_lo, b.hash_lo)) + bit_count(xor(a.hash_hi, b.hash_hi)) <= 3),
        |edges AS MATERIALIZED (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |walk AS (
        |  SELECT doc_id, doc_id AS label FROM ids
        |  UNION
        |  SELECT e.src AS doc_id, w.label FROM walk w JOIN edges e ON w.doc_id = e.dst),
        |lab AS (SELECT doc_id, min(label) AS cluster FROM walk GROUP BY doc_id),
        |sz AS (SELECT cluster, count(*) AS n_members FROM lab GROUP BY cluster)
        |SELECT l.doc_id, l.cluster, CAST(s.n_members AS BIGINT) AS n_members,
        |  l.doc_id = l.cluster AS is_rep
        |FROM lab l JOIN sz s USING (cluster) ORDER BY l.doc_id""".stripMargin,
    // every aHash bit recomputed from the raster's defining arithmetic:
    // pixel p's luminance sum, 8x8 grid cell box sums, bit = cell mean
    // above global mean by exact integer cross-multiplication
    "mm_phash" ->
      """WITH px AS (
        |  SELECT d.doc_id,
        |    16 + d.doc_id % 16 AS W, 8 + d.doc_id % 8 AS H,
        |    CASE d.doc_id % 4 WHEN 0 THEN 1 WHEN 2 THEN 4 ELSE 3 END AS C,
        |    t.k AS p
        |  FROM documents d, range(465) t(k)
        |  WHERE t.k < (16 + d.doc_id % 16) * (8 + d.doc_id % 8)),
        |lum AS (
        |  SELECT doc_id, W, H, p,
        |    CAST(SUM((doc_id * 31 + p * C + c.i) % 256) AS BIGINT) AS lsum
        |  FROM px, range(4) c(i) WHERE c.i < C
        |  GROUP BY doc_id, W, H, p),
        |cells AS (
        |  SELECT doc_id, ((p % W) * 8) // W AS gx, ((p // W) * 8) // H AS gy,
        |    CAST(SUM(lsum) AS BIGINT) AS csum, COUNT(*) AS cn
        |  FROM lum GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, CAST(SUM(csum) AS BIGINT) AS tsum, CAST(SUM(cn) AS BIGINT) AS tn
        |        FROM cells GROUP BY doc_id),
        |bits AS (
        |  SELECT c.doc_id, gy * 8 + gx AS pos,
        |    CASE WHEN c.csum * t.tn > t.tsum * c.cn THEN 1 ELSE 0 END AS b
        |  FROM cells c JOIN tot t USING (doc_id))
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN pos < 32 THEN b * (CAST(1 AS BIGINT) << pos) ELSE 0 END) AS BIGINT) AS hash_lo,
        |  CAST(SUM(CASE WHEN pos >= 32 THEN b * (CAST(1 AS BIGINT) << (pos - 32)) ELSE 0 END) AS BIGINT) AS hash_hi
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the JPEG round-trip replayed arithmetically: flat 16x16 tiles at
    // quant 1 are DC-only and bit-exact through any conformant codec
    // (spec-asserted), so each doc's decoded pixel sum is just
    // channels * 256 * sum(tile values) — the Spark side must run a real
    // third-party-written JPEG through the full entropy-decode pipeline
    // to reproduce it
    "mm_jpeg_decode" ->
      """SELECT d.doc_id,
        |  16 * (1 + d.doc_id % 3) AS width,
        |  16 * (1 + d.doc_id % 2) AS height,
        |  CAST(CASE WHEN d.doc_id % 2 = 0 THEN 1 ELSE 3 END AS BIGINT) AS channels,
        |  16 * (1 + d.doc_id % 3) * 16 * (1 + d.doc_id % 2)
        |    * (CASE WHEN d.doc_id % 2 = 0 THEN 1 ELSE 3 END) AS n_raster_bytes,
        |  CAST(SUM((d.doc_id * 31 + t.k * 17) % 256) * 256
        |    * (CASE WHEN d.doc_id % 2 = 0 THEN 1 ELSE 3 END) AS BIGINT) AS pixel_sum
        |FROM documents d, range(6) t(k)
        |WHERE t.k < (1 + d.doc_id % 3) * (1 + d.doc_id % 2)
        |GROUP BY 1,2,3,4,5
        |ORDER BY d.doc_id""".stripMargin,
    // decode + feature extract replayed arithmetically: the raster is
    // (doc_id*31 + k) mod 256 by construction, so min/max and the 4-bin
    // histogram are recomputable without any image library — the Spark
    // side must run the real header parse + container decode to agree
    "mm_decode" ->
      """SELECT d.doc_id,
        |  CASE WHEN d.doc_id % 4 = 3 THEN 'bmp' ELSE 'png' END AS format,
        |  16 + d.doc_id % 16 AS width,
        |  8 + d.doc_id % 8 AS height,
        |  CAST(CASE d.doc_id % 4 WHEN 0 THEN 1 WHEN 2 THEN 4 ELSE 3 END AS BIGINT) AS channels,
        |  CAST(MIN((d.doc_id * 31 + t.k) % 256) AS BIGINT) AS sample_min,
        |  CAST(MAX((d.doc_id * 31 + t.k) % 256) AS BIGINT) AS sample_max,
        |  CAST(SUM(CASE WHEN (d.doc_id * 31 + t.k) % 256 < 64 THEN 1 ELSE 0 END) AS BIGINT) AS hist_0,
        |  CAST(SUM(CASE WHEN (d.doc_id * 31 + t.k) % 256 BETWEEN 64 AND 127 THEN 1 ELSE 0 END) AS BIGINT) AS hist_1,
        |  CAST(SUM(CASE WHEN (d.doc_id * 31 + t.k) % 256 BETWEEN 128 AND 191 THEN 1 ELSE 0 END) AS BIGINT) AS hist_2,
        |  CAST(SUM(CASE WHEN (d.doc_id * 31 + t.k) % 256 >= 192 THEN 1 ELSE 0 END) AS BIGINT) AS hist_3
        |FROM documents d, range(1860) t(k)
        |WHERE t.k < (16 + d.doc_id % 16) * (8 + d.doc_id % 8)
        |    * (CASE d.doc_id % 4 WHEN 0 THEN 1 WHEN 2 THEN 4 ELSE 3 END)
        |GROUP BY 1,2,3,4,5
        |ORDER BY d.doc_id""".stripMargin,
    // the box-filter resample replayed arithmetically: every source pixel
    // maps forward to output cell (sx*OW//W, sy*OH//H); each output
    // sample is the floor-divided cell mean; the emitted sum covers every
    // resampled sample — decode, fit arithmetic, and the resample kernel
    // are all inside this hash
    "mm_resize" ->
      """WITH dims AS (
        |  SELECT doc_id, 16 + doc_id % 16 AS W, 8 + doc_id % 8 AS H,
        |    CASE doc_id % 4 WHEN 0 THEN 1 WHEN 2 THEN 4 ELSE 3 END AS C
        |  FROM documents),
        |od AS (
        |  SELECT *, CAST(8 AS BIGINT) AS OW, greatest((H * 8) // W, 1) AS OH
        |  FROM dims),
        |cells AS (
        |  SELECT doc_id, W, H, OW, OH,
        |    (((t.k // C) % W) * OW) // W AS ox,
        |    (((t.k // C) // W) * OH) // H AS oy,
        |    t.k % C AS ch,
        |    SUM((doc_id * 31 + t.k) % 256) // COUNT(*) AS v
        |  FROM od, range(1860) t(k)
        |  WHERE t.k < W * H * C
        |  GROUP BY ALL)
        |SELECT doc_id, CAST(W AS BIGINT) AS width, CAST(H AS BIGINT) AS height,
        |  OW AS out_width, CAST(OH AS BIGINT) AS out_height,
        |  CAST(COUNT(*) AS BIGINT) AS out_n_samples,
        |  CAST(SUM(v) AS BIGINT) AS out_pixel_sum
        |FROM cells GROUP BY 1,2,3,4,5 ORDER BY doc_id""".stripMargin,
    // strided sampling over a real multi-frame container: frame f of doc
    // d has raster (d*31 + f*7 + k) mod 256 at doc-derived dims; kept
    // frames are the even indices — the container walk, stride, and
    // per-frame decode must all agree with this arithmetic
    "mm_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, 4 + (doc_id % 3) * 4 AS W, 4 AS H, t.k AS frame_idx
        |  FROM documents, range(8) t(k)
        |  WHERE t.k < 2 + doc_id % 7 AND t.k % 2 = 0)
        |SELECT doc_id, frame_idx, CAST(W AS BIGINT) AS width,
        |  CAST(H AS BIGINT) AS height,
        |  CAST(SUM((doc_id * 31 + frame_idx * 7 + s.k) % 256) AS BIGINT) AS pixel_sum
        |FROM f, range(144) s(k)
        |WHERE s.k < W * H * 3
        |GROUP BY 1,2,3,4 ORDER BY doc_id, frame_idx""".stripMargin,
    // adjacent-frame differences over the scene-structured container:
    // both rasters are id arithmetic, so every |a-b| sum and the cut
    // boolean replay exactly — the Spark side must decode real BMP
    // frames out of the walked container to reproduce them
    "mm_scene_cut" ->
      """WITH p AS (
        |  SELECT d.doc_id, t.f, s.k,
        |    (d.doc_id * 31 + (t.f // 3) * 1000 + (t.f % 3) * 7 + s.k) % 256 AS a,
        |    (d.doc_id * 31 + ((t.f + 1) // 3) * 1000 + ((t.f + 1) % 3) * 7 + s.k) % 256 AS b
        |  FROM documents d, range(8) t(f), range(96) s(k))
        |SELECT doc_id, f AS frame_from, f + 1 AS frame_to,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(ABS(a - b)) AS BIGINT) AS diff_sum,
        |  SUM(ABS(a - b)) > 31 * COUNT(*) AS is_cut
        |FROM p GROUP BY 1, 2, 3 ORDER BY doc_id, frame_from""".stripMargin,
    "mm_image_stats" ->
      """SELECT d.doc_id,
        |  t.k % (CASE d.doc_id % 4 WHEN 0 THEN 1 WHEN 2 THEN 4 ELSE 3 END) AS channel,
        |  count(*) AS n_samples,
        |  CAST(SUM((d.doc_id * 31 + t.k) % 256) AS BIGINT) AS sample_sum
        |FROM documents d, range(1860) t(k)
        |WHERE t.k < (16 + d.doc_id % 16) * (8 + d.doc_id % 8)
        |    * (CASE d.doc_id % 4 WHEN 0 THEN 1 WHEN 2 THEN 4 ELSE 3 END)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "stream_window_counts" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type, count(*) AS n, round(sum(value),2) AS total_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "stream_enrich_join" ->
      """SELECT date_trunc('hour', ts) AS bucket, c_mktsegment, count(*) AS n, round(sum(value),2) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "stream_interval_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  date_diff('second', c.ts, p.ts) AS gap_s
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
        |ORDER BY c.user_id, purchase_id, click_id""".stripMargin,
    "stream_dedup" ->
      """SELECT DISTINCT event_id, user_id, ts, event_type, round(value,2) AS value
        |FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
        |ORDER BY event_id""".stripMargin,
    "stream_top_users" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY user_id
        |ORDER BY n_events DESC, user_id LIMIT 20""".stripMargin,
    "q_array_funcs" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |SELECT o_orderpriority,
        |  array_to_string(list_sort(list(cents)), ',') AS top_prices_cents,
        |  count(*) AS n_top,
        |  max(cents) AS max_price_cents
        |FROM ranked WHERE rk <= 3
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
