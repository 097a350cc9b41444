package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see SURVEY.md §2 for the operator inventory.
  *
  * Every key in [[queries]] has a matching DuckDB oracle in [[oracleSql]]
  * (same column names, same ordering) unless the operator is not
  * SQL-expressible, in which case the driver records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_local_supplier" -> (Relational.q5LocalSupplier _),
    "q_filter_pushdown" -> (Relational.qFilterPushdown _),
    "q_window_rank" -> (Relational.qWindowRank _),
    "q_distinct_agg" -> (Relational.qDistinctAgg _),
    "q_anti_join" -> (Relational.qAntiJoin _),
    "q_semi_join" -> (Relational.qSemiJoin _),
    "q_events_hourly" -> (Relational.qEventsHourly _),
    "q_sessionize" -> (Relational.qSessionize _),
    "q_json_extract" -> (Relational.qJsonExtract _),
    "q_manifest_discovery" -> (Catalog.qManifestDiscovery _),
    "q_manifest_regex" -> (Catalog.qManifestRegex _),
    "q_catalog_dedup_bases" -> (Catalog.qCatalogDedupBases _),
    "q_catalog_parse" -> (Catalog.qCatalogParse _),
    "q_sensor_cursor" -> (Catalog.qSensorCursor _),
    "q_ingest_dedup" -> (Catalog.qIngestDedup _),
    "q_run_requests" -> (Catalog.qRunRequests _),
    "q_text_tokens" -> (TextAnalysis.qTextTokens _),
    "q_text_quality" -> (TextAnalysis.qTextQuality _),
    "q_text_langid" -> (TextAnalysis.qTextLangid _),
    "q_text_fingerprint" -> (TextAnalysis.qTextFingerprint _),
    "q_dedup_exact" -> (Dedup.qDedupExact _),
    "q_dedup_ngram_jaccard" -> (Dedup.qDedupNgramJaccard _),
    "q_dedup_minhash" -> (Dedup.qDedupMinhash _),
    "q_dedup_simhash" -> (Dedup.qDedupSimhash _),
    "q_embed_neardup" -> (Similarity.qEmbedNeardup _),
    "q_ann_topk" -> (Similarity.qAnnTopk _),
    "q_ann_lsh" -> (Similarity.qAnnLsh _),
    "q_rollup_agg" -> (Analytics.qRollupAgg _),
    "q_percentiles" -> (Analytics.qPercentiles _),
    "q_moving_avg" -> (Analytics.qMovingAvg _),
    "q_asof_join" -> (Analytics.qAsofJoin _),
    "q_set_ops" -> (Analytics.qSetOps _),
    "q_scalar_subquery" -> (Analytics.qScalarSubquery _),
    "q_pivot" -> (Analytics.qPivot _),
    "q_explode_wordcount" -> (Analytics.qExplodeWordcount _),
    "q_ann_ivf" -> (Similarity.qAnnIvf _),
    "q_funnel" -> (Behavioral.qFunnel _),
    "q_retention_cohort" -> (Behavioral.qRetentionCohort _),
    "q_interval_join" -> (Behavioral.qIntervalJoin _),
    "q_cube_agg" -> (Behavioral.qCubeAgg _),
    "q_dedup_cluster" -> (Dedup.qDedupCluster _),
    "q_tfidf" -> (TextAnalysis.qTfidf _),
    "q_histogram" -> (Analytics.qHistogram _),
    "q_corr" -> (Analytics.qCorr _),
    "q_catalog_skip_malformed" -> (Catalog.qCatalogSkipMalformed _),
    "q_argmax_agg" -> (Analytics.qArgmaxAgg _),
    "q_string_agg" -> (Analytics.qStringAgg _),
    "q_nullsafe_join" -> (Analytics.qNullsafeJoin _),
    "q_skew_salted_join" -> (Behavioral.qSkewSaltedJoin _),
    "q_full_outer" -> (Analytics.qFullOuter _),
    "q_corpus_filter" -> (TextAnalysis.qCorpusFilter _),
    "q_window_ntile" -> (Analytics.qWindowNtile _),
    "q_lead_lag" -> (Analytics.qLeadLag _),
    // self-certifying: exact twin + within_bound boolean, oracle asserts
    // the bound holds (DuckDB recomputes the exact side independently)
    "q_sketch_distinct" -> (Sketches.qSketchDistinct _),
    "q_sketch_percentile" -> (Sketches.qSketchPercentile _),
  )

  /** DuckDB oracle SQL per query key (same parquet tables, same column
    * names/ordering as the Spark result).
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Relational.q1Oracle,
    "q3_shipping_priority" -> Relational.q3Oracle,
    "q5_local_supplier" -> Relational.q5Oracle,
    "q_filter_pushdown" -> Relational.qFilterPushdownOracle,
    "q_window_rank" -> Relational.qWindowRankOracle,
    "q_distinct_agg" -> Relational.qDistinctAggOracle,
    "q_anti_join" -> Relational.qAntiJoinOracle,
    "q_semi_join" -> Relational.qSemiJoinOracle,
    "q_events_hourly" -> Relational.qEventsHourlyOracle,
    "q_sessionize" -> Relational.qSessionizeOracle,
    "q_json_extract" -> Relational.qJsonExtractOracle,
    "q_manifest_discovery" -> Catalog.qManifestDiscoveryOracle,
    "q_manifest_regex" -> Catalog.qManifestRegexOracle,
    "q_catalog_dedup_bases" -> Catalog.qCatalogDedupBasesOracle,
    "q_catalog_parse" -> Catalog.qCatalogParseOracle,
    "q_sensor_cursor" -> Catalog.qSensorCursorOracle,
    "q_ingest_dedup" -> Catalog.qIngestDedupOracle,
    "q_run_requests" -> Catalog.qRunRequestsOracle,
    "q_text_tokens" -> TextAnalysis.qTextTokensOracle,
    "q_text_quality" -> TextAnalysis.qTextQualityOracle,
    "q_text_langid" -> TextAnalysis.qTextLangidOracle,
    "q_text_fingerprint" -> TextAnalysis.qTextFingerprintOracle,
    "q_dedup_exact" -> Dedup.qDedupExactOracle,
    "q_dedup_ngram_jaccard" -> Dedup.qDedupNgramJaccardOracle,
    "q_dedup_minhash" -> Dedup.qDedupMinhashOracle,
    "q_dedup_simhash" -> Dedup.qDedupSimhashOracle,
    "q_embed_neardup" -> Similarity.qEmbedNeardupOracle,
    "q_ann_topk" -> Similarity.qAnnTopkOracle,
    "q_ann_lsh" -> Similarity.qAnnLshOracle,
    "q_rollup_agg" -> Analytics.qRollupAggOracle,
    "q_percentiles" -> Analytics.qPercentilesOracle,
    "q_moving_avg" -> Analytics.qMovingAvgOracle,
    "q_asof_join" -> Analytics.qAsofJoinOracle,
    "q_set_ops" -> Analytics.qSetOpsOracle,
    "q_scalar_subquery" -> Analytics.qScalarSubqueryOracle,
    "q_pivot" -> Analytics.qPivotOracle,
    "q_explode_wordcount" -> Analytics.qExplodeWordcountOracle,
    "q_ann_ivf" -> Similarity.qAnnIvfOracle,
    "q_funnel" -> Behavioral.qFunnelOracle,
    "q_retention_cohort" -> Behavioral.qRetentionCohortOracle,
    "q_interval_join" -> Behavioral.qIntervalJoinOracle,
    "q_cube_agg" -> Behavioral.qCubeAggOracle,
    "q_dedup_cluster" -> Dedup.qDedupClusterOracle,
    "q_tfidf" -> TextAnalysis.qTfidfOracle,
    "q_histogram" -> Analytics.qHistogramOracle,
    "q_corr" -> Analytics.qCorrOracle,
    "q_catalog_skip_malformed" -> Catalog.qCatalogSkipMalformedOracle,
    "q_argmax_agg" -> Analytics.qArgmaxAggOracle,
    "q_string_agg" -> Analytics.qStringAggOracle,
    "q_nullsafe_join" -> Analytics.qNullsafeJoinOracle,
    "q_skew_salted_join" -> Behavioral.qSkewSaltedJoinOracle,
    "q_full_outer" -> Analytics.qFullOuterOracle,
    "q_corpus_filter" -> TextAnalysis.qCorpusFilterOracle,
    "q_window_ntile" -> Analytics.qWindowNtileOracle,
    "q_lead_lag" -> Analytics.qLeadLagOracle,
    "q_sketch_distinct" -> Sketches.qSketchDistinctOracle,
    "q_sketch_percentile" -> Sketches.qSketchPercentileOracle,
  )
}
