package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each implemented SURVEY §2 operator to a query over the
  * driver's parquet tables; `oracleSql` holds the DuckDB twin with matching
  * column aliases (driver sorts columns by name, then hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full clinical ETL pipeline end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    Remaining.pipelineClinicalE2e(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _),
    "j1_multi_join" -> (Relational.j1MultiJoin _),
    "j3_full_outer" -> (Relational.j3FullOuter _),
    "j4_left_join" -> (Relational.j4LeftJoin _),
    "j5_anti_join" -> (Relational.j5AntiJoin _),
    "j6_semi_join" -> (Relational.j6SemiJoin _),
    "j9_update_join" -> (Relational.j9UpdateJoin _),
    "w1_first_value" -> (Relational.w1FirstValue _),
    "w2_keep_one" -> (Relational.w2KeepOne _),
    "a3_pivot" -> (Relational.a3Pivot _),
    "a4_dup_detect" -> (Relational.a4DupDetect _),
    "a5_null_consistency" -> (Relational.a5NullConsistency _),
    "u1_set_ops" -> (Relational.u1SetOps _),
    "p2_melt" -> (Relational.p2Melt _),
    "p1_eav_explode" -> (TreeAndEav.p1EavExplode _),
    "a1_type_inference" -> (TreeAndEav.a1TypeInference _),
    "eav_observation_fact" -> (TreeAndEav.eavObservationFact _),
    "p7_fill_in_tree" -> (TreeAndEav.p7FillInTree _),
    "a8_concept_counts" -> (TreeAndEav.a8ConceptCounts _),
    "a9_children_counts" -> (TreeAndEav.a9ChildrenCounts _),
    "fn_path_scalars" -> (TreeAndEav.fnPathScalars _),
    "f1_fix_column" -> (TreeAndEav.f1FixColumn _),
    "f2_value_cleanup" -> (TreeAndEav.f2ValueCleanup _),
    "f6_usubjid" -> (TreeAndEav.f6Usubjid _),
    "a7_zscore" -> (StatsAndTime.a7Zscore _),
    "a10_summary_stats" -> (StatsAndTime.a10SummaryStats _),
    "a2_group_guard" -> (StatsAndTime.a2GroupGuard _),
    "a12_existence_guards" -> (StatsAndTime.a12ExistenceGuards _),
    "j10_regex_join" -> (StatsAndTime.j10RegexJoin _),
    "fn_timepoint" -> (StatsAndTime.fnTimepoint _),
    "fn_json_extract" -> (StatsAndTime.fnJsonExtract _),
    "w3_sessionize" -> (StatsAndTime.w3Sessionize _),
    "dedup_exact" -> (TrainingData.dedupExact _),
    "dedup_ngram_jaccard" -> (TrainingData.dedupNgramJaccard _),
    "dedup_minhash_lsh" -> (TrainingData.dedupMinhashLsh _),
    "dedup_two_stage" -> (TrainingData.dedupTwoStage _),
    "dedup_incremental" -> (TrainingData.dedupIncremental _),
    "dedup_simhash" -> (TrainingData.dedupSimhash _),
    "dedup_simhash_pairs" -> (TrainingData.dedupSimhashPairs _),
    "dedup_clusters" -> (TrainingData.dedupClusters _),
    "text_lang_id" -> (TrainingData.textLangId _),
    "text_quality" -> (TrainingData.textQuality _),
    "ann_cosine_topk" -> (TrainingData.annCosineTopk _),
    "ann_lsh_buckets" -> (TrainingData.annLshBuckets _),
    "ann_ivf" -> (TrainingData.annIvf _),
    "dedup_embedding" -> (TrainingData.dedupEmbedding _),
    "sample_stratified" -> (TrainingData.sampleStratified _),
    "sample_shuffle" -> (TrainingData.sampleShuffle _),
    "text_repetition" -> (TrainingData.textRepetition _),
    "text_contacts" -> (TrainingData.textContacts _),
    "pack_sequences" -> (TrainingData.packSequences _),
    "text_chunks" -> (TrainingData.textChunks _),
    "decontaminate" -> (TrainingData.decontaminate _),
    "pipeline_training_e2e" -> (TrainingData.pipelineTrainingE2e _),
    "dedup_segments" -> (TrainingData.dedupSegments _),
    "text_tfidf" -> (TrainingData.textTfidf _),
    "text_bm25" -> (TrainingData.textBm25 _),
    "text_perplexity" -> (TrainingData.textPerplexity _),
    "sample_dsir" -> (TrainingData.sampleDsir _),
    "sample_weighted" -> (TrainingData.sampleWeighted _),
    "sample_split" -> (TrainingData.sampleSplit _),
    "topk_per_group" -> (TrainingData.topkPerGroup _),
    "text_bigram_lm" -> (TrainingData.textBigramLm _),
    "sketch_hll_distinct" -> (TrainingData.sketchHllDistinct _),
    "sketch_kmv_distinct" -> (TrainingData.sketchKmvDistinct _),
    "asof_click_view" -> (StatsAndTime.asofClickView _),
    "asof_next_view" -> (StatsAndTime.asofNextView _),
    "asof_nearest_view" -> (StatsAndTime.asofNearestView _),
    "range_points_regions" -> (OmicsQueries.rangePointsRegions _),
    "range_interval_overlap" -> (OmicsQueries.rangeIntervalOverlap _),
    "sketch_cm_tokens" -> (TrainingData.sketchCmTokens _),
    "sketch_heavy_hitters" -> (TrainingData.sketchHeavyHitters _),
    "sketch_kmv_jaccard" -> (TrainingData.sketchKmvJaccard _),
    "sketch_quantile" -> (TrainingData.sketchQuantile _),
    "sketch_quantile_gate" -> (TrainingData.sketchQuantileGate _),
    "sketch_bloom_contains" -> (TrainingData.sketchBloomContains _),
    "ann_ivf_kmeans" -> (TrainingData.annIvfKmeans _),
    "embed_project" -> (TrainingData.embedProject _),
    "ann_projected" -> (TrainingData.annProjected _),
    "multimodal_image_dups" -> (TrainingData.multimodalImageDups _),
    "multimodal_video_dups" -> (TrainingData.multimodalVideoDups _),
    "sample_temperature" -> (TrainingData.sampleTemperature _),
    "dedup_semantic" -> (TrainingData.dedupSemantic _),
    "ann_pq_adc" -> (TrainingData.annPqAdc _),
    "ann_ivfpq" -> (TrainingData.annIvfPq _),
    "dedup_url" -> (TrainingData.dedupUrl _),
    "text_quality_flags" -> (TrainingData.textQualityFlags _),
    "f3_tag_substitution" -> (Remaining.f3TagSubstitution _),
    "f5_visit_suppress" -> (Remaining.f5VisitSuppress _),
    "f8_validation" -> (Remaining.f8Validation _),
    "fn_replace_last" -> (Remaining.fnReplaceLast _),
    "w4_window_agg" -> (Remaining.w4WindowAgg _),
    "a6_probe_avg" -> (Remaining.a6ProbeAvg _),
    "a11_min_record" -> (Remaining.a11MinRecord _),
    "seq_surrogate_ids" -> (Remaining.seqSurrogateIds _),
    "pipeline_clinical_e2e" -> (Remaining.pipelineClinicalE2e _),
    "pipeline_omics_e2e" -> (Remaining.pipelineOmicsE2e _),
    "merge_replace" -> (MergeQueries.mergeReplace _),
    "merge_update" -> (MergeQueries.mergeUpdate _),
    "merge_append" -> (MergeQueries.mergeAppend _),
    "merge_update_variables" -> (MergeQueries.mergeUpdateVariables _),
    "study_move" -> (MergeQueries.studyMove _),
    "study_delete" -> (MergeQueries.studyDelete _),
    "p3_acgh_melt" -> (SourcesAndOps.p3AcghMelt _),
    "p4_vcf_summary" -> (SourcesAndOps.p4VcfSummary _),
    "p5_vcf_info" -> (SourcesAndOps.p5VcfInfo _),
    "fn_metadata_xml" -> (SourcesAndOps.fnMetadataXml _),
    "security_ops" -> (SourcesAndOps.securityOps _),
    "node_ops" -> (SourcesAndOps.nodeOps _),
    "annotation_registry" -> (OmicsQueries.annotationRegistry _),
    "load_samples_mapping" -> (OmicsQueries.loadSamplesMapping _),
    "load_samples_facts" -> (OmicsQueries.loadSamplesFacts _),
    "chrom_region" -> (OmicsQueries.chromRegion _),
    "acgh_facts" -> (OmicsQueries.acghFacts _),
    "annot_proteomics" -> (OmicsQueries.annotProteomics _),
    "annot_rna" -> (OmicsQueries.annotRna _),
    "annot_mirna" -> (OmicsQueries.annotMirna _),
    "annot_rbm" -> (OmicsQueries.annotRbm _),
    "annot_metabolomics" -> (OmicsQueries.annotMetabolomics _),
    "annot_metab_sub_pathways" -> (OmicsQueries.annotMetabSubPathways _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Oracles.relational ++ Oracles.treeAndEav ++ Oracles.statsAndTime ++
      Oracles.trainingData ++ Oracles.remaining ++ Oracles.merges ++
      Oracles.sourcesAndOps ++ Oracles.omicsDeep
}
