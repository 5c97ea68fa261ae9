package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for the LLM-pipeline extension operators (SURVEY.md §2.9). */
object ExtQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (Dedup.dedupExact _),
    "dedup_fuzzy" -> (Dedup.dedupFuzzy _),
    "dedup_ngram_jaccard" -> (Dedup.dedupNgramJaccard _),
    "dedup_minhash" -> (Dedup.dedupMinhash _),
    "dedup_simhash" -> (Dedup.dedupSimhash _),
    "dedup_simhash_pairs" -> (Dedup.dedupSimhashPairs _),
    "dedup_embedding" -> (Dedup.dedupEmbedding _),
    "dedup_cluster" -> (Dedup.dedupCluster _),
    "dedup_incremental" -> (Dedup.dedupIncremental _),
    "sessionize" -> (PipelineOps.sessionize _),
    "sessionize_scalable" -> (PipelineOps.sessionizeScalable _),
    "sample_stratified" -> (PipelineOps.sampleStratified _),
    "source_mix" -> (PipelineOps.sourceMix _),
    "source_cap" -> (PipelineOps.sourceCap _),
    "text_pii_scrub" -> (PipelineOps.textPiiScrub _),
    "shard_pack" -> (PipelineOps.shardPack _),
    "shard_pack_scalable" -> (PipelineOps.shardPackScalable _),
    "similarity_topk" -> (Similarity.similarityTopk _),
    "similarity_topk_agg" -> (Similarity.similarityTopkAgg _),
    "similarity_ann_ivf" -> (Similarity.similarityAnnIvf _),
    "similarity_ann_kmeans" -> (Similarity.similarityAnnKmeans _),
    "similarity_ann_pq" -> (Similarity.similarityAnnPq _),
    "embed_quantize" -> (Similarity.embedQuantize _),
    "multimodal_join" -> (Similarity.multimodalJoin _),
    "multimodal_extract" -> (Multimodal.multimodalExtract _),
    "multimodal_resize" -> (Multimodal.multimodalResize _),
    "multimodal_frame_sample" -> (Multimodal.multimodalFrameSample _),
    "text_token_stats" -> (TextAnalysis.textTokenStats _),
    "text_quality" -> (TextAnalysis.textQuality _),
    "text_langid" -> (TextAnalysis.textLangid _),
    "text_token_count" -> (TextAnalysis.textTokenCount _),
    "token_docfreq" -> (TextAnalysis.tokenDocfreq _),
    "text_lm_score" -> (TextAnalysis.textLmScore _),
    "token_len_quantiles" -> (TextAnalysis.tokenLenQuantiles _),
    "doc_fingerprint" -> (TextAnalysis.docFingerprint _),
    "dedup_collapse" -> (Curation.dedupCollapse _),
    "decontaminate" -> (Curation.decontaminate _),
    "decontaminate_frac" -> (Curation.decontaminateFrac _),
    "text_repetition" -> (Curation.textRepetition _),
    "split_assign" -> (Curation.splitAssign _),
    "split_assign_safe" -> (Curation.splitAssignSafe _),
    "curate" -> (Curation.curate _),
    "text_boilerplate" -> (TextAnalysis.textBoilerplate _),
    "dsir_weight" -> (Curation.dsirWeight _),
    "zorder_key" -> (Layout.zorderKey _)
  )

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" -> Dedup.dedupExactSql,
    "dedup_fuzzy" -> Dedup.dedupFuzzySql,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccardSql,
    "dedup_minhash" -> Dedup.dedupMinhashSql,
    "dedup_simhash" -> Dedup.dedupSimhashSql,
    "dedup_simhash_pairs" -> Dedup.dedupSimhashPairsSql,
    "dedup_embedding" -> Dedup.dedupEmbeddingSql,
    "dedup_cluster" -> Dedup.dedupClusterSql,
    "dedup_incremental" -> Dedup.dedupIncrementalSql,
    "sessionize" -> PipelineOps.sessionizeSql,
    // the two-pass skew-safe form must match the single-window form
    // byte-for-byte — one oracle covers both
    "sessionize_scalable" -> PipelineOps.sessionizeSql,
    "sample_stratified" -> PipelineOps.sampleStratifiedSql,
    "source_mix" -> PipelineOps.sourceMixSql,
    "source_cap" -> PipelineOps.sourceCapSql,
    "text_pii_scrub" -> PipelineOps.textPiiScrubSql,
    "shard_pack" -> PipelineOps.shardPackSql,
    // the scalable form is pinned row-identical to the direct form
    // (PipelineOpsSpec), so it shares the one oracle
    "shard_pack_scalable" -> PipelineOps.shardPackSql,
    "similarity_topk" -> Similarity.similarityTopkSql,
    // the Aggregator form must match the window form byte-for-byte —
    // one oracle covers both
    "similarity_topk_agg" -> Similarity.similarityTopkSql,
    "similarity_ann_ivf" -> Similarity.similarityAnnIvfSql,
    "similarity_ann_kmeans" -> Similarity.similarityAnnKmeansSql,
    "similarity_ann_pq" -> Similarity.similarityAnnPqSql,
    "embed_quantize" -> Similarity.embedQuantizeSql,
    "multimodal_join" -> Similarity.multimodalJoinSql,
    "multimodal_extract" -> Multimodal.multimodalExtractSql,
    "multimodal_resize" -> Multimodal.multimodalResizeSql,
    "multimodal_frame_sample" -> Multimodal.multimodalFrameSampleSql,
    "text_token_stats" -> TextAnalysis.textTokenStatsSql,
    "text_quality" -> TextAnalysis.textQualitySql,
    "text_langid" -> TextAnalysis.textLangidSql,
    "text_token_count" -> TextAnalysis.textTokenCountSql,
    "token_docfreq" -> TextAnalysis.tokenDocfreqSql,
    "text_lm_score" -> TextAnalysis.textLmScoreSql,
    "token_len_quantiles" -> TextAnalysis.tokenLenQuantilesSql,
    "doc_fingerprint" -> TextAnalysis.docFingerprintSql,
    "dedup_collapse" -> Curation.dedupCollapseSql,
    "decontaminate" -> Curation.decontaminateSql,
    "decontaminate_frac" -> Curation.decontaminateFracSql,
    "text_repetition" -> Curation.textRepetitionSql,
    "split_assign" -> Curation.splitAssignSql,
    "split_assign_safe" -> Curation.splitAssignSafeSql,
    "curate" -> Curation.curateSql,
    "text_boilerplate" -> TextAnalysis.textBoilerplateSql,
    "dsir_weight" -> Curation.dsirWeightSql,
    "zorder_key" -> Layout.zorderKeySql
  )
}
