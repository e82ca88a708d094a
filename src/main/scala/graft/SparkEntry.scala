package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each `queries` entry is one operator from SURVEY.md §2 (or a pipeline
  * extension operator); `oracleSql` holds the DuckDB-equivalent SQL the
  * driver hash-compares against (omitted only for ops DuckDB cannot
  * express, e.g. fnv1a sharding).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full fetch path: clamp -> archive selection -> rollup -> gap-fill.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.tsFetchArchive(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TSDB core (SURVEY §2.2-§2.6)
    "ts_align_dedup" -> (Queries.tsAlignDedup _),
    "ts_rollup_avg" -> (Queries.tsRollupAvg _),
    "ts_rollup_sum" -> (Queries.tsRollupSum _),
    "ts_rollup_last" -> (Queries.tsRollupLast _),
    "ts_rollup_minmax" -> (Queries.tsRollupMinMax _),
    "ts_gapfill" -> (Queries.tsGapfill _),
    "ts_cache_merge" -> (Queries.tsCacheMerge _),
    "ts_hot_view" -> (Queries.tsHotView _),
    "catalog_spine" -> (Queries.catalogSpine _),
    "blacklist_filter" -> (Queries.blacklistFilter _),
    "ts_sliding_window" -> (Queries.tsSlidingWindow _),
    "ts_session_window" -> (Queries.tsSessionWindow _),
    "pivot_export" -> (Queries.pivotExport _),
    "ts_age_route" -> (Queries.tsAgeRoute _),
    "ts_fetch_archive" -> (Queries.tsFetchArchive _),
    "fnv1a_shard" -> (Queries.fnv1aShard _),
    // relational coverage
    "q1_pricing" -> (Queries.q1Pricing _),
    "q3_shipping" -> (Queries.q3Shipping _),
    "q5_region" -> (Queries.q5Region _),
    "window_topk" -> (Queries.windowTopk _),
    "semi_anti" -> (Queries.semiAnti _),
    "set_ops" -> (Queries.setOps _),
    "part_brand_revenue" -> (PipelineQueries.partBrandRevenue _),
    // training-data pipeline operators
    "dedup_exact" -> (PipelineQueries.dedupExact _),
    "dedup_minhash_lsh" -> (PipelineQueries.dedupMinhashLsh _),
    "dedup_clusters" -> (PipelineQueries.dedupClusters _),
    "dedup_ngram_jaccard" -> (PipelineQueries.dedupNgramJaccard _),
    "dedup_simhash" -> (PipelineQueries.dedupSimhash _),
    "dedup_simhash_pairs" -> (PipelineQueries.dedupSimhashPairs _),
    "embed_cosine_neardup" -> (PipelineQueries.embedCosineNearDup _),
    "knn_bruteforce" -> (PipelineQueries.knnBruteForce _),
    "ann_lsh" -> (PipelineQueries.annLsh _),
    "text_langid" -> (PipelineQueries.textLangid _),
    "text_quality" -> (PipelineQueries.textQuality _),
    "text_tokens" -> (PipelineQueries.textTokens _),
    "text_vocab" -> (PipelineQueries.textVocab _),
    "doc_fingerprint" -> (PipelineQueries.docFingerprint _),
    "multimodal_meta" -> (PipelineQueries.multimodalMeta _),
    // training-data pipeline operators (round 3): repetition quality,
    // benchmark decontamination, quantization audit, mixture rebalance
    "text_repetition" -> (PipelineQueries.textRepetition _),
    "text_decontaminate" -> (PipelineQueries.textDecontaminate _),
    "embed_quantize" -> (PipelineQueries.embedQuantize _),
    "sample_rebalance" -> (PipelineQueries.sampleRebalance _),
    "pack_chunks" -> (PipelineQueries.packChunks _),
    // extended operators (round 2): temporal joins, sketches, sampling, IVF
    "asof_join" -> (ExtQueries.asofJoin _),
    "range_join" -> (ExtQueries.rangeJoin _),
    "hll_distinct" -> (ExtQueries.hllDistinct _),
    "ann_ivf" -> (ExtQueries.annIvf _),
    "ts_rollup_salted" -> (ExtQueries.tsRollupSalted _),
    "cms_heavy_hitters" -> (ExtQueries.cmsHeavyHitters _),
    "quantile_summary" -> (ExtQueries.quantileSummary _),
    "sample_stratified" -> (ExtQueries.sampleStratified _),
    "sample_weighted" -> (ExtQueries.sampleWeighted _),
    // extended operators (round 4): derived series, semi-structured
    // extraction, OLAP rollup, TF-IDF, unicode canonicalization
    "ts_rate" -> (AnalyticsQueries.tsRate _),
    "ts_moving_avg" -> (AnalyticsQueries.tsMovingAvg _),
    "tfidf_topk" -> (AnalyticsQueries.tfidfTopk _),
    "json_props_agg" -> (AnalyticsQueries.jsonPropsAgg _),
    "olap_rollup" -> (AnalyticsQueries.olapRollup _),
    "text_normalize" -> (AnalyticsQueries.textNormalize _),
  )

  def oracleSql: Map[String, String] = Map(
    "ts_align_dedup" -> Queries.tsAlignDedupSql,
    "ts_rollup_avg" -> Queries.tsRollupAvgSql,
    "ts_rollup_sum" -> Queries.tsRollupSumSql,
    "ts_rollup_last" -> Queries.tsRollupLastSql,
    "ts_rollup_minmax" -> Queries.tsRollupMinMaxSql,
    "ts_gapfill" -> Queries.tsGapfillSql,
    "ts_cache_merge" -> Queries.tsCacheMergeSql,
    "ts_hot_view" -> Queries.tsHotViewSql,
    "catalog_spine" -> Queries.catalogSpineSql,
    "blacklist_filter" -> Queries.blacklistFilterSql,
    "ts_sliding_window" -> Queries.tsSlidingWindowSql,
    "ts_session_window" -> Queries.tsSessionWindowSql,
    "pivot_export" -> Queries.pivotExportSql,
    "ts_age_route" -> Queries.tsAgeRouteSql,
    "ts_fetch_archive" -> Queries.tsFetchArchiveSql,
    // fnv1a_shard: the hash itself is not DuckDB-expressible, but the
    // closed metric namespace lets the oracle join precomputed shard values
    "fnv1a_shard" -> Queries.fnv1aShardSql,
    "q1_pricing" -> Queries.q1PricingSql,
    "q3_shipping" -> Queries.q3ShippingSql,
    "q5_region" -> Queries.q5RegionSql,
    "window_topk" -> Queries.windowTopkSql,
    "semi_anti" -> Queries.semiAntiSql,
    "set_ops" -> Queries.setOpsSql,
    "part_brand_revenue" -> PipelineQueries.partBrandRevenueSql,
    "dedup_exact" -> PipelineQueries.dedupExactSql,
    "dedup_minhash_lsh" -> PipelineQueries.dedupMinhashLshSql,
    "dedup_clusters" -> PipelineQueries.dedupClustersSql,
    "dedup_ngram_jaccard" -> PipelineQueries.dedupNgramJaccardSql,
    "dedup_simhash" -> PipelineQueries.dedupSimhashSql,
    "dedup_simhash_pairs" -> PipelineQueries.dedupSimhashPairsSql,
    "embed_cosine_neardup" -> PipelineQueries.embedCosineNearDupSql,
    "knn_bruteforce" -> PipelineQueries.knnBruteForceSql,
    "ann_lsh" -> PipelineQueries.annLshSql,
    "text_langid" -> PipelineQueries.textLangidSql,
    "text_quality" -> PipelineQueries.textQualitySql,
    "text_tokens" -> PipelineQueries.textTokensSql,
    "text_vocab" -> PipelineQueries.textVocabSql,
    "doc_fingerprint" -> PipelineQueries.docFingerprintSql,
    "multimodal_meta" -> PipelineQueries.multimodalMetaSql,
    "text_repetition" -> PipelineQueries.textRepetitionSql,
    "text_decontaminate" -> PipelineQueries.textDecontaminateSql,
    "embed_quantize" -> PipelineQueries.embedQuantizeSql,
    "sample_rebalance" -> PipelineQueries.sampleRebalanceSql,
    "pack_chunks" -> PipelineQueries.packChunksSql,
    "asof_join" -> ExtQueries.asofJoinSql,
    "range_join" -> ExtQueries.rangeJoinSql,
    "hll_distinct" -> ExtQueries.hllDistinctSql,
    "ann_ivf" -> ExtQueries.annIvfSql,
    "ts_rollup_salted" -> ExtQueries.tsRollupSaltedSql,
    "cms_heavy_hitters" -> ExtQueries.cmsHeavyHittersSql,
    "quantile_summary" -> ExtQueries.quantileSummarySql,
    "sample_stratified" -> ExtQueries.sampleStratifiedSql,
    "sample_weighted" -> ExtQueries.sampleWeightedSql,
    "ts_rate" -> AnalyticsQueries.tsRateSql,
    "ts_moving_avg" -> AnalyticsQueries.tsMovingAvgSql,
    "tfidf_topk" -> AnalyticsQueries.tfidfTopkSql,
    "json_props_agg" -> AnalyticsQueries.jsonPropsAggSql,
    "olap_rollup" -> AnalyticsQueries.olapRollupSql,
    "text_normalize" -> AnalyticsQueries.textNormalizeSql,
  )
}
