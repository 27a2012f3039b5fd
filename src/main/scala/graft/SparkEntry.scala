package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{Analytics, Dedup, Events, LocationResolve, Multimodal,
  Pipeline, Relational, Sampling, Similarity, TextAnalysis, Transform}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt;
  * COVERAGE.md maps every SURVEY §2 operator to its query/test gate.
  *
  * Query naming: `<family><nn>_<slug>`:
  *  - g: aggregations (g01 TPC-H-Q1 shape, g02 count-distinct, g03 exact
  *    percentiles)
  *  - j: joins (j01 broadcast dims, j02 semi, j03 anti, j04 range/theta)
  *  - w: windows (w01 row_number top-k, w02 running frame, w03 lag,
  *    w04 interval RANGE frame)
  *  - s: set ops + sources (s01 except, s02 intersect, s03 union,
  *    s04 DataSource-V2 paged source)
  *  - r: multi-dim grouping (r01 rollup, r02 cube, r03 pivot,
  *    r04 grouping sets); t: top-k; d: distinct
  *  - n: NLP (n01 normalize, n03 tokenize, n06 tier-1/2 relational
  *    resolution, n08 levenshtein, n10 cleaner columns)
  *  - q: composed reference queries (q1 pairs, q2 stats, q3 details,
  *    q4 master transform); a: array ops (a03 pair generator)
  *  - e: event streams (e01 windows, e02 sessions, e03 json, e04 dedup)
  *  - x: LLM-pipeline extensions (x1x dedup family, x2x similarity /
  *    sketch dedup, x3x text analytics, x4x multimodal + curation,
  *    x5x splitting/sampling)
  *
  * Every query has a DuckDB oracle except the rows-only set pinned by
  * RegistrySpec (the single source of truth for its membership) —
  * queries whose output is engine-specific or not SQL-expressible by
  * design (HLL sketches, simhash, the ANN family, bloom
  * decontamination, approx-percentile prune, iterative BPE, IVF
  * prototypicality). Those get the driver's rows-only check plus
  * equality / recall / tolerance / clean-room-reference gates in the
  * test suites.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Transform.q4Master(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_agg_pricing"    -> (Relational.g01AggPricing _),
    "g02_count_distinct" -> (Relational.g02CountDistinct _),
    "j01_region_revenue" -> (Relational.j01RegionRevenue _),
    "j02_semi_urgent"    -> (Relational.j02SemiUrgent _),
    "j03_anti_recent"    -> (Relational.j03AntiRecent _),
    "j04_range_band"     -> (Relational.j04RangeBand _),
    "w01_top_per_customer" -> (Relational.w01TopPerCustomer _),
    "w02_running_revenue"  -> (Relational.w02RunningRevenue _),
    "w03_lag_days"         -> (Relational.w03LagDays _),
    "s01_except_active"    -> (Relational.s01ExceptActive _),
    "s02_intersect_active" -> (Relational.s02IntersectActive _),
    "s03_union_years"      -> (Relational.s03UnionYears _),
    "t01_top30_orders"     -> (Relational.t01Top30Orders _),
    "d01_distinct_flags"   -> (Relational.d01DistinctFlags _),
    "r01_rollup_status"    -> (Relational.r01RollupStatus _),
    "r02_cube_flags"       -> (Relational.r02CubeFlags _),
    "r03_pivot_revenue"    -> (Relational.r03PivotRevenue _),
    "r04_grouping_sets"    -> (Relational.r04GroupingSets _),
    "w04_range_30d"        -> (Relational.w04Range30d _),
    "g03_percentiles"      -> (Relational.g03Percentiles _),
    "g04_typed_agg"        -> (graft.ops.TypedOps.g04TypedAgg _),
    "n08_levenshtein"      -> (Analytics.levenshteinQuery _),
    "x01_approx_distinct"  -> (Relational.x01ApproxDistinct _),
    "q4_master"            -> (Transform.q4Master _),
    "q5_trip_cycle"        -> (Transform.q5TripCycle _),
    "q1_location_pairs"    -> (Analytics.q1LocationPairs _),
    "q2_location_stats"    -> (Analytics.q2LocationStats _),
    "q3_multi_details"     -> (Analytics.q3MultiDetails _),
    "n01_normalize"        -> (Analytics.normalizeQuery _),
    "n03_tokenize"         -> (Analytics.tokenizeQuery _),
    "n06_tier12_relational" -> (LocationResolve.tier12Locations _),
    "n07_tier12_broadcast"  -> (LocationResolve.tier12LocationsBroadcast _),
    "n09_dict_scale"        -> (LocationResolve.dictScale _),
    // rows-only: token_sort_ratio argmax is not SQL-expressible in
    // DuckDB; gated by DictionaryScaleSpec's blocked-vs-exhaustive
    // equivalence test instead
    "n11_fuzzy_blocked"     -> (LocationResolve.fuzzyDictScale _),
    "n12_tiered_locations"  -> (LocationResolve.tieredLocations _),
    "n13_gram_blocked"      -> (LocationResolve.gramDictScale _),
    "n14_cross_shape"       -> (LocationResolve.crossDictScale _),
    "n15_multi_shape"       -> (LocationResolve.multiDictScale _),
    "n10_nlp_columns"      -> (Analytics.nlpColumns _),
    "x10_dedup_exact"      -> (Dedup.exactDedup _),
    "x11_dedup_minhash_lsh" -> (Dedup.minhashLshPairs _),
    "x12_dedup_simhash"    -> (Dedup.simhashPairs _),
    "x13_dedup_jaccard"    -> (Dedup.jaccardPairs _),
    "x14_cosine_neardup"   -> (Similarity.cosineNearDupPairs _),
    "x78_semantic_decontaminate" -> (Similarity.semanticDecontaminate _),
    "x79_semantic_decontam_celled" -> (Similarity.semanticDecontaminateCelled _),
    "x15_neardup_survivors" -> (Dedup.nearDupSurvivors _),
    "x17_dup_clusters"     -> (Dedup.dupClusters _),
    "x28_soft_dedup"       -> (Dedup.softDedup _),
    "x18_incremental_dedup" -> (Dedup.incrementalDedup _),
    "x19_decontaminate"    -> (Dedup.decontaminate _),
    "x27_bloom_decontaminate" -> (Dedup.bloomDecontaminate _),
    "x47_span_decontaminate" -> (Dedup.spanDecontaminate _),
    "x16_corpus_curation"  -> (Dedup.corpusCuration _),
    "x20_ann_bruteforce"   -> (Similarity.bruteForceTopK _),
    "x21_ann_lsh"          -> (Similarity.lshTopK _),
    "x22_ann_ivf"          -> (Similarity.ivfTopK _),
    "x23_semantic_dedup"   -> (Similarity.semanticDedup _),
    "x24_semantic_dedup_celled" -> (Similarity.semanticDedupCelled _),
    "x29_semantic_dedup_cc" -> (Similarity.semanticDedupCC _),
    "x59_dedup_keep_best"  -> (Dedup.dedupKeepBest _),
    "x60_repeated_spans"   -> (Dedup.repeatedSpans _),
    "x61_prototypicality"  -> (Similarity.prototypicality _),
    "x25_ann_pq"           -> (Similarity.pqTopK _),
    "x26_ann_ivfpq"        -> (Similarity.ivfPqTopK _),
    "x30_text_quality"     -> (TextAnalysis.textQuality _),
    "x31_lang_id"          -> (TextAnalysis.langId _),
    "x32_fingerprint"      -> (TextAnalysis.fingerprint _),
    "x33_fnv_fingerprint"  -> (TextAnalysis.fnvFingerprint _),
    "x34_pii_scrub"        -> (TextAnalysis.piiScrub _),
    "x35_top_ngrams"       -> (TextAnalysis.topNgrams _),
    "x36_boilerplate_lines" -> (TextAnalysis.boilerplateScrub _),
    "x38_quality_prune"    -> (TextAnalysis.qualityPrune _),
    "x39_quality_prune_approx" -> (TextAnalysis.qualityPruneApprox _),
    "x37_tfidf_top_term"   -> (TextAnalysis.tfidfTopTerm _),
    "a03_pairs_generator"  -> (Analytics.pairsViaGenerator _),
    "x40_multimodal_meta"  -> (Multimodal.mediaMeta _),
    "x41_frame_sample"     -> (Multimodal.frameSample _),
    "x48_wav_decode"       -> (Multimodal.wavDecode _),
    "x57_bmp_decode"       -> (Multimodal.bmpDecode _),
    "x58_avi_decode"       -> (Multimodal.aviDecode _),
    "x63_png_decode"       -> (Multimodal.pngDecode _),
    "x64_jpeg_decode"      -> (Multimodal.jpegDecode _),
    "x65_bmp_pixel_stats"  -> (Multimodal.bmpPixelStats _),
    "x80_image_ahash_dedup" -> (Multimodal.imageAHashPairs _),
    "x81_audio_fingerprint_dedup" -> (Multimodal.audioFingerprintPairs _),
    "x66_pipeline_e2e"     -> (Pipeline.pipelineE2e _),
    "x69_quality_classifier" -> (TextAnalysis.qualityClassifier _),
    "x70_substring_rewrite" -> (Dedup.substringDedupRewrite _),
    "x71_leakage_free_split" -> (Sampling.leakageFreeSplit _),
    "x72_shuffle_shards"   -> (Sampling.shuffleShards _),
    "x73_corpus_datasheet" -> (Pipeline.corpusDatasheet _),
    "x74_datasheet_approx" -> (Pipeline.corpusDatasheetApprox _),
    "x75_pipeline_v2"      -> (Pipeline.pipelineV2 _),
    "x76_decontam_rewrite" -> (Dedup.decontaminateRewrite _),
    "x77_rejection_ledger" -> (Pipeline.rejectionLedger _),
    "x82_snapshot_diff"    -> (Pipeline.snapshotDiff _),
    "x86_delta_reprocess"  -> (Pipeline.deltaReprocess _),
    "x83_knn_graph"        -> (Similarity.knnGraph _),
    "x84_knn_clusters"     -> (Similarity.knnClusters _),
    "x85_knn_density_prune" -> (Similarity.knnDensityPrune _),
    "x87_label_propagation" -> (Similarity.labelPropagation _),
    "x67_wav_pcm_stats"    -> (Multimodal.wavPcmStats _),
    "x68_png_pixel_stats"  -> (Multimodal.pngPixelStats _),
    "x42_repetition_filter" -> (TextAnalysis.repetitionFilter _),
    "x43_chunk_tokens"     -> (TextAnalysis.chunkTokens _),
    "x44_line_dedup"       -> (TextAnalysis.lineDedup _),
    "x45_unigram_surprise" -> (TextAnalysis.unigramSurprise _),
    "x62_bigram_surprise"  -> (TextAnalysis.bigramSurprise _),
    "x46_ref_coverage"     -> (TextAnalysis.refCoverage _),
    "x55_bpe_merges"       -> (TextAnalysis.bpeMerges _),
    "x56_bpe_tokenize"     -> (TextAnalysis.bpeTokenize _),
    "e01_window_agg"       -> (Events.windowAgg _),
    "e02_sessionize"       -> (Events.sessionize _),
    "e03_json_props"       -> (Events.jsonProps _),
    "e04_first_event"      -> (Events.firstEventPerUserType _),
    "e05_asof_enrich"      -> (Events.asofEnrich _),
    "e06_sliding_window"   -> (Events.slidingWindowAgg _),
    "e07_interval_join"    -> (Events.intervalJoin _),
    "s04_paged_source"     -> (graft.sources.PagedLanding.pagedSourceAgg _),
    "j05_bucketed_colocated" -> (Relational.j05BucketedColocated _),
    "g05_salted_skew_agg"  -> (Relational.g05SaltedSkewAgg _),
    "x50_split_counts"     -> (graft.ops.Sampling.splitCounts _),
    "x51_source_cap"       -> (graft.ops.Sampling.sourceCap _),
    "x52_mixture_sample"   -> (graft.ops.Sampling.mixtureSample _),
    "x53_token_budget"     -> (graft.ops.Sampling.tokenBudget _),
    "x54_unimax_alloc"     -> (graft.ops.Sampling.unimaxAlloc _),
    "x49_sequence_pack"    -> (graft.ops.Sampling.sequencePack _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "g01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "g02_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "j01_region_revenue" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "j02_semi_urgent" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "j03_anti_recent" ->
      """SELECT c_nationkey, COUNT(*) AS n_inactive
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate > TIMESTAMP '2000-12-31 00:00:00')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "j04_range_band" ->
      """SELECT l_returnflag, COUNT(*) AS n_in_band
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |  AND l_extendedprice >= p_retailprice * 0.5
        |  AND l_extendedprice <= p_retailprice * 20.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "w01_top_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "w02_running_revenue" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "w03_lag_days" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(DATE_DIFF('day',
        |    CAST(LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC, o_orderkey ASC) AS DATE),
        |    CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "s01_except_active" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "s02_intersect_active" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
        |INTERSECT
        |SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "s03_union_years" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice, CAST(1995 AS BIGINT) AS yr FROM orders
        |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, CAST(1996 AS BIGINT) AS yr FROM orders
        |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1996) t
        |ORDER BY yr, o_orderkey""".stripMargin,
    "t01_top30_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 30""".stripMargin,
    "d01_distinct_flags" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "r01_rollup_status" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "r02_cube_flags" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "r03_pivot_revenue"     -> Relational.r03PivotRevenueSql,
    "r04_grouping_sets"     -> Relational.r04GroupingSetsSql,
    "w04_range_30d"         -> Relational.w04Range30dSql,
    "g03_percentiles"       -> Relational.g03PercentilesSql,
    "g04_typed_agg"         -> graft.ops.TypedOps.g04TypedAggSql,
    "n08_levenshtein"       -> Analytics.levenshteinSql,
    "q4_master"             -> Transform.q4MasterSql,
    "q5_trip_cycle"         -> Transform.q5TripCycleSql,
    "q1_location_pairs"     -> Analytics.q1Sql,
    "q2_location_stats"     -> Analytics.q2Sql,
    "q3_multi_details"      -> Analytics.q3Sql,
    "n01_normalize"         -> Analytics.normalizeSql,
    "n03_tokenize"          -> Analytics.tokenizeSql,
    "n06_tier12_relational" -> LocationResolve.tier12Sql,
    "n07_tier12_broadcast"  -> LocationResolve.tier12Sql, // same semantics, broadcast form
    "n09_dict_scale"        -> LocationResolve.dictScaleSql,
    "n12_tiered_locations"  -> LocationResolve.tieredLocationsSql,
    "n13_gram_blocked"      -> LocationResolve.gramDictScaleSql,
    "n14_cross_shape"       -> LocationResolve.crossDictScaleSql,
    "n15_multi_shape"       -> LocationResolve.multiDictScaleSql,
    "n10_nlp_columns"       -> Analytics.nlpColumnsSql,
    "x10_dedup_exact"       -> Dedup.exactDedupSql,
    "x11_dedup_minhash_lsh" -> Dedup.jaccardPairsSql, // LSH verified == exact
    "x13_dedup_jaccard"     -> Dedup.jaccardPairsSql,
    "x14_cosine_neardup"    -> Similarity.cosineNearDupPairsSql,
    "x78_semantic_decontaminate" -> Similarity.semanticDecontaminateSql,
    "x79_semantic_decontam_celled" -> Similarity.semanticDecontaminateCelledSql,
    "x15_neardup_survivors" -> Dedup.nearDupSurvivorsSql,
    "x17_dup_clusters"      -> Dedup.dupClustersSql,
    "x28_soft_dedup"        -> Dedup.softDedupSql,
    "x18_incremental_dedup" -> Dedup.incrementalDedupSql,
    "x19_decontaminate"     -> Dedup.decontaminateSql,
    "x47_span_decontaminate" -> Dedup.spanDecontaminateSql,
    "x16_corpus_curation"   -> Dedup.corpusCurationSql,
    "x20_ann_bruteforce"    -> Similarity.bruteForceTopKSql,
    "x23_semantic_dedup"    -> Similarity.semanticDedupSql,
    "x29_semantic_dedup_cc" -> Similarity.semanticDedupCCSql,
    "x59_dedup_keep_best"   -> Dedup.dedupKeepBestSql,
    "x60_repeated_spans"    -> Dedup.repeatedSpansSql,
    "x30_text_quality"      -> TextAnalysis.textQualitySql,
    "x31_lang_id"           -> TextAnalysis.langIdSql,
    "x32_fingerprint"       -> TextAnalysis.fingerprintSql,
    "x33_fnv_fingerprint"   -> TextAnalysis.fnvFingerprintSql,
    "x12_dedup_simhash"     -> Dedup.simhashPairsSql,
    "x21_ann_lsh"           -> Similarity.lshTopKSql,
    "x55_bpe_merges"        -> TextAnalysis.bpeMergesSql,
    "x56_bpe_tokenize"      -> TextAnalysis.bpeTokenizeSql,
    "x22_ann_ivf"           -> Similarity.ivfTopKSql,
    "x24_semantic_dedup_celled" -> Similarity.semanticDedupCelledSql,
    "x61_prototypicality"   -> Similarity.prototypicalitySql,
    "x25_ann_pq"            -> Similarity.pqTopKSql,
    "x26_ann_ivfpq"         -> Similarity.ivfPqTopKSql,
    "a03_pairs_generator"   -> Analytics.pairsViaGeneratorSql,
    "x34_pii_scrub"         -> TextAnalysis.piiScrubSql,
    "x35_top_ngrams"        -> TextAnalysis.topNgramsSql,
    "x36_boilerplate_lines" -> TextAnalysis.boilerplateScrubSql,
    "x38_quality_prune"     -> TextAnalysis.qualityPruneSql,
    "x37_tfidf_top_term"    -> TextAnalysis.tfidfTopTermSql,
    "x40_multimodal_meta"   -> Multimodal.mediaMetaSql,
    "x41_frame_sample"      -> Multimodal.frameSampleSql,
    "x48_wav_decode"        -> Multimodal.wavDecodeSql,
    "x57_bmp_decode"        -> Multimodal.bmpDecodeSql,
    "x58_avi_decode"        -> Multimodal.aviDecodeSql,
    "x63_png_decode"        -> Multimodal.pngDecodeSql,
    "x64_jpeg_decode"       -> Multimodal.jpegDecodeSql,
    "x65_bmp_pixel_stats"   -> Multimodal.bmpPixelStatsSql,
    "x80_image_ahash_dedup" -> Multimodal.imageAHashPairsSql,
    "x81_audio_fingerprint_dedup" -> Multimodal.audioFingerprintPairsSql,
    "x66_pipeline_e2e"      -> Pipeline.pipelineE2eSql,
    "x69_quality_classifier" -> TextAnalysis.qualityClassifierSql,
    "x70_substring_rewrite"  -> Dedup.substringDedupRewriteSql,
    "x71_leakage_free_split" -> Sampling.leakageFreeSplitSql,
    "x72_shuffle_shards"     -> Sampling.shuffleShardsSql,
    "x73_corpus_datasheet"   -> Pipeline.corpusDatasheetSql,
    "x75_pipeline_v2"        -> Pipeline.pipelineV2Sql,
    "x76_decontam_rewrite"   -> Dedup.decontaminateRewriteSql,
    "x77_rejection_ledger"   -> Pipeline.rejectionLedgerSql,
    "x82_snapshot_diff"      -> Pipeline.snapshotDiffSql,
    "x86_delta_reprocess"    -> Pipeline.deltaReprocessSql,
    "x83_knn_graph"          -> Similarity.knnGraphSql,
    "x84_knn_clusters"       -> Similarity.knnClustersSql,
    "x85_knn_density_prune"  -> Similarity.knnDensityPruneSql,
    "x87_label_propagation"  -> Similarity.labelPropagationSql,
    "x67_wav_pcm_stats"     -> Multimodal.wavPcmStatsSql,
    "x68_png_pixel_stats"   -> Multimodal.pngPixelStatsSql,
    "x42_repetition_filter" -> TextAnalysis.repetitionFilterSql,
    "x43_chunk_tokens"      -> TextAnalysis.chunkTokensSql,
    "x44_line_dedup"        -> TextAnalysis.lineDedupSql,
    "x45_unigram_surprise"  -> TextAnalysis.unigramSurpriseSql,
    "x62_bigram_surprise"   -> TextAnalysis.bigramSurpriseSql,
    "x46_ref_coverage"      -> TextAnalysis.refCoverageSql,
    "e01_window_agg"        -> Events.windowAggSql,
    "e02_sessionize"        -> Events.sessionizeSql,
    "e03_json_props"        -> Events.jsonPropsSql,
    "e04_first_event"       -> Events.firstEventPerUserTypeSql,
    "e05_asof_enrich"       -> Events.asofEnrichSql,
    "e06_sliding_window"    -> Events.slidingWindowAggSql,
    "e07_interval_join"     -> Events.intervalJoinSql,
    "s04_paged_source"      -> graft.sources.PagedLanding.pagedSourceAggSql,
    "j05_bucketed_colocated" -> Relational.j05BucketedColocatedSql,
    "g05_salted_skew_agg"   -> Relational.g05SaltedSkewAggSql,
    "x50_split_counts"      -> graft.ops.Sampling.splitCountsSql,
    "x51_source_cap"        -> graft.ops.Sampling.sourceCapSql,
    "x52_mixture_sample"    -> graft.ops.Sampling.mixtureSampleSql,
    "x53_token_budget"      -> graft.ops.Sampling.tokenBudgetSql,
    "x54_unimax_alloc"      -> graft.ops.Sampling.unimaxAllocSql,
    "x49_sequence_pack"     -> graft.ops.Sampling.sequencePackSql,
  )
}
