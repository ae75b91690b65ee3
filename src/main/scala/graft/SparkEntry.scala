package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.{ReferencePipeline => RP, Routing}
import graft.ops.{AsofJoin, Dedup, Multimodal, Relational, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the extended LLM-data-pipeline
  * ops) is a named pure query `(SparkSession, sfDir) => DataFrame` with an
  * equivalent DuckDB SQL oracle. Implementations live in graft.pipeline
  * (reference surface) and graft.ops (relational + extended ops).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Step-2 transaction enrichment — the reference's core query
    * (/root/reference/updatescript.py:57-108, SURVEY.md §3.2).
    */
  def entry(spark: SparkSession): DataFrame =
    RP.txEnrich(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- reference pipeline surface (SURVEY.md §2/§3) --
    "tx_enrich" -> (RP.txEnrich _),
    "daily_price" -> (RP.dailyPriceQuery _),
    "price_backfill" -> (RP.priceBackfill _),
    "stats_rollup" -> (RP.statsRollup _),
    "watermark_advance" -> (RP.watermarkAdvance _),
    "route_nominations" -> (Routing.polkadotNominations _),
    "route_amountstaked" -> (Routing.polkadotAmountStaked _),
    "route_nominations_kusama" -> (Routing.kusamaNominations _),
    "route_aum" -> (Routing.aum _),
    "first_seen_stash" -> (Routing.firstSeenStash _),
    // -- general relational shapes --
    "q1_agg" -> (Relational.q1Agg _),
    "top_customers" -> (Relational.topCustomers _),
    "props_parse" -> (Relational.propsParse _),
    "user_sessions" -> (Relational.userSessions _),
    "agg_rollup" -> (Relational.aggRollup _),
    "agg_cube" -> (Relational.aggCube _),
    "event_quantiles" -> (Relational.eventQuantiles _),
    "approx_stats" -> (Relational.approxStats _),
    "top_users_per_chain" -> (Relational.topUsersPerChain _),
    "salted_user_volume" -> (Relational.saltedUserVolume _),
    "purchasers_no_error" -> (Relational.purchasersNoError _),
    "tx_enrich_asof" -> (AsofJoin.txEnrichAsof _),
    "tx_enrich_asof_native" -> (AsofJoin.txEnrichAsofNative _),
    "tx_enrich_range" -> (AsofJoin.txEnrichRange _),
    // -- LLM-data-pipeline ops (north star) --
    "dedup_exact" -> (Dedup.dedupExact _),
    "dedup_minhash" -> (Dedup.dedupMinhash _),
    "dedup_incremental" -> (Dedup.dedupIncremental _),
    "dedup_simhash" -> (Dedup.dedupSimhash _),
    "dedup_simhash_pairs" -> (Dedup.dedupSimhashPairs _),
    "dedup_ngram_jaccard" -> (Dedup.dedupNgramJaccard _),
    "dedup_substring" -> (Dedup.dedupSubstring _),
    "dedup_substring_maximal" -> (Dedup.dedupSubstringMaximal _),
    "dedup_winnow" -> (Dedup.dedupWinnow _),
    "dedup_embedding" -> (Dedup.dedupEmbedding _),
    "dedup_clusters" -> (Dedup.dedupClusters _),
    "dedup_embedding_clusters" -> (Dedup.embeddingClusters _),
    "dedup_containment" -> (Dedup.dedupContainment _),
    "simsearch_topk" -> (Similarity.simsearchTopk _),
    "simsearch_ivf" -> (Similarity.simsearchIvf _),
    "simsearch_ivf_kmeans" -> (Similarity.simsearchIvfKmeans _),
    "simsearch_ivf_probe" -> (Similarity.simsearchIvfProbe _),
    "simsearch_recall" -> (Similarity.simsearchRecall _),
    "simsearch_sq" -> (Similarity.simsearchSq _),
    "simsearch_ivf_sq" -> (Similarity.simsearchIvfSq _),
    "simsearch_pq" -> (Similarity.simsearchPq _),
    "simsearch_recall_quant" -> (Similarity.simsearchRecallQuant _),
    "text_langid" -> (TextAnalysis.textLangid _),
    "text_quality" -> (TextAnalysis.textQuality _),
    "text_tokens" -> (TextAnalysis.textTokens _),
    "text_bpe_tokens" -> (TextAnalysis.textBpeTokens _),
    "text_repetition" -> (TextAnalysis.textRepetition _),
    "text_unigram_logprob" -> (TextAnalysis.textUnigramLogprob _),
    "text_bigram_logprob" -> (TextAnalysis.textBigramLogprob _),
    "text_quality_model" -> (TextAnalysis.textQualityModel _),
    "text_tfidf" -> (TextAnalysis.textTfidf _),
    "text_sample" -> (TextAnalysis.textSample _),
    "text_sample_stratified" -> (TextAnalysis.textSampleStratified _),
    "text_pii_scrub" -> (TextAnalysis.textPiiScrub _),
    "text_fingerprint" -> (TextAnalysis.textFingerprint _),
    "text_corpus_filter" -> (TextAnalysis.textCorpusFilter _),
    "text_pack" -> (TextAnalysis.textPack _),
    "text_decontam" -> (TextAnalysis.textDecontam _),
    "text_domain_filter" -> (TextAnalysis.textDomainFilter _),
    "dedup_semantic" -> (Similarity.dedupSemantic _),
    "dedup_cluster_best" -> (Dedup.dedupClusterBest _),
    "text_mix" -> (TextAnalysis.textMix _),
    "text_bpe_train" -> (TextAnalysis.textBpeTrain _),
    "event_funnel" -> (Relational.eventFunnel _),
    "event_retention" -> (Relational.eventRetention _),
    "simsearch_recall_dim" -> (Similarity.simsearchRecallDim _),
    "simsearch_hard_negatives" -> (Similarity.simsearchHardNegatives _),
    "text_length_outliers" -> (TextAnalysis.textLengthOutliers _),
    "multimodal_meta" -> (Multimodal.multimodalMeta _),
    "multimodal_frames" -> (Multimodal.multimodalFrames _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "tx_enrich" -> RP.txEnrichSql,
    "daily_price" -> RP.dailyPriceSql,
    "price_backfill" -> RP.priceBackfillSql,
    "stats_rollup" -> RP.statsRollupSql,
    "watermark_advance" -> RP.watermarkAdvanceSql,
    "route_nominations" -> Routing.polkadotNominationsSql,
    "route_amountstaked" -> Routing.polkadotAmountStakedSql,
    "route_nominations_kusama" -> Routing.kusamaNominationsSql,
    "route_aum" -> Routing.aumSql,
    "first_seen_stash" -> Routing.firstSeenStashSql,
    "q1_agg" -> Relational.q1AggSql,
    "top_customers" -> Relational.topCustomersSql,
    "props_parse" -> Relational.propsParseSql,
    "user_sessions" -> Relational.userSessionsSql,
    "agg_rollup" -> Relational.aggRollupSql,
    "agg_cube" -> Relational.aggCubeSql,
    "event_quantiles" -> Relational.eventQuantilesSql,
    "top_users_per_chain" -> Relational.topUsersPerChainSql,
    "salted_user_volume" -> Relational.saltedUserVolumeSql,
    "purchasers_no_error" -> Relational.purchasersNoErrorSql,
    "tx_enrich_asof" -> AsofJoin.txEnrichAsofSql,
    "tx_enrich_asof_native" -> AsofJoin.txEnrichAsofSql,
    "tx_enrich_range" -> AsofJoin.txEnrichRangeSql,
    "dedup_exact" -> Dedup.dedupExactSql,
    "dedup_minhash" -> Dedup.dedupMinhashSql,
    "dedup_incremental" -> Dedup.dedupIncrementalSql,
    "dedup_simhash" -> Dedup.dedupSimhashSql,
    "dedup_simhash_pairs" -> Dedup.dedupSimhashPairsSql,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccardSql,
    "dedup_substring" -> Dedup.dedupSubstringSql,
    "dedup_substring_maximal" -> Dedup.dedupSubstringMaximalSql,
    "dedup_winnow" -> Dedup.dedupWinnowSql,
    "dedup_embedding" -> Dedup.dedupEmbeddingSql,
    "dedup_clusters" -> Dedup.dedupClustersSql,
    "dedup_embedding_clusters" -> Dedup.dedupEmbeddingClustersSql,
    "dedup_containment" -> Dedup.dedupContainmentSql,
    "simsearch_topk" -> Similarity.simsearchTopkSql,
    "simsearch_ivf" -> Similarity.simsearchIvfSql,
    "simsearch_ivf_kmeans" -> Similarity.simsearchIvfKmeansSql,
    "simsearch_ivf_probe" -> Similarity.simsearchIvfProbeSql,
    "simsearch_recall" -> Similarity.simsearchRecallSql,
    "simsearch_sq" -> Similarity.simsearchSqSql,
    "simsearch_ivf_sq" -> Similarity.simsearchIvfSqSql,
    "simsearch_pq" -> Similarity.simsearchPqSql,
    "simsearch_recall_quant" -> Similarity.simsearchRecallQuantSql,
    "text_langid" -> TextAnalysis.textLangidSql,
    "text_quality" -> TextAnalysis.textQualitySql,
    "text_tokens" -> TextAnalysis.textTokensSql,
    "text_bpe_tokens" -> TextAnalysis.textBpeTokensSql,
    "text_repetition" -> TextAnalysis.textRepetitionSql,
    "text_unigram_logprob" -> TextAnalysis.textUnigramLogprobSql,
    "text_bigram_logprob" -> TextAnalysis.textBigramLogprobSql,
    "text_quality_model" -> TextAnalysis.textQualityModelSql,
    "text_tfidf" -> TextAnalysis.textTfidfSql,
    "text_sample" -> TextAnalysis.textSampleSql,
    "text_sample_stratified" -> TextAnalysis.textSampleStratifiedSql,
    "text_pii_scrub" -> TextAnalysis.textPiiScrubSql,
    "text_fingerprint" -> TextAnalysis.textFingerprintSql,
    "text_corpus_filter" -> TextAnalysis.textCorpusFilterSql,
    "text_pack" -> TextAnalysis.textPackSql,
    "text_decontam" -> TextAnalysis.textDecontamSql,
    "text_domain_filter" -> TextAnalysis.textDomainFilterSql,
    "dedup_semantic" -> Similarity.dedupSemanticSql,
    "dedup_cluster_best" -> Dedup.dedupClusterBestSql,
    "text_mix" -> TextAnalysis.textMixSql,
    "text_bpe_train" -> TextAnalysis.textBpeTrainSql,
    "event_funnel" -> Relational.eventFunnelSql,
    "event_retention" -> Relational.eventRetentionSql,
    "simsearch_recall_dim" -> Similarity.simsearchRecallDimSql,
    "simsearch_hard_negatives" -> Similarity.simsearchHardNegativesSql,
    "text_length_outliers" -> TextAnalysis.textLengthOutliersSql,
    "multimodal_meta" -> Multimodal.multimodalMetaSql,
    "multimodal_frames" -> Multimodal.multimodalFramesSql,
  )
}
