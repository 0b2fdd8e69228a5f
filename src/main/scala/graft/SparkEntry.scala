package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Behavior, TextOps}
import graft.operators.{Ann, AsofJoin, CorpusClean, Dedup, KMeansIter, Multimodal, PageRankIter, RangeJoin, ScalePatterns, Sketches, TrainPrep}
import graft.ingest.Ingest

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A: ingestion (reference surface)
    "ingest_manifest"  -> (Ingest.ingestManifest _),
    "zipcsv_read"      -> (Ingest.zipcsvRead _),
    "decision_parse"   -> (Ingest.decisionParse _),
    "snowflake_decode" -> (Ingest.snowflakeDecode _),
    "dedup_upsert"     -> (Ingest.dedupUpsert _),
    "ingest_stats"     -> (Ingest.ingestStats _),
    "jdbc_sink"        -> (Ingest.jdbcSink _),
    "stream_ingest"    -> (Ingest.streamIngest _),
    "fetch_ingest"     -> (Ingest.fetchIngest _),
    "table_sizes"      -> (Ingest.tableSizes _),
    "incremental_upsert" -> (Ingest.incrementalUpsert _),
    "decision_roundtrip" -> (graft.ingest.Decisions.decisionRoundtrip _),
    "decision_quality" -> (graft.ingest.Decisions.decisionQuality _),
    "stream_decisions" -> (graft.streaming.StreamDecisions.run _),
    "stream_late_data" -> (graft.streaming.StreamLateData.run _),
    "stream_sessionize" -> ((s: SparkSession, dir: String) => {
      graft.streaming.StreamSessionize.runToMemory(s, dir, "stream_sess_mem")
      s.table("stream_sess_mem")
    }),
    // B: query surface
    "q1_agg"           -> (Analytics.q1Agg _),
    "q3_join_topn"     -> (Analytics.q3JoinTopn _),
    "q5_multijoin"     -> (Analytics.q5Multijoin _),
    "topn_per_group"   -> (Analytics.topnPerGroup _),
    "windowed_counts"  -> (Analytics.windowedCounts _),
    "sessionize"       -> (Analytics.sessionize _),
    "semi_anti_join"   -> (Analytics.semiAntiJoin _),
    "rollup_agg"       -> (Analytics.rollupAgg _),
    "pivot_events"     -> (Analytics.pivotEvents _),
    "percentiles"      -> (Analytics.percentiles _),
    "array_explode_agg" -> (Analytics.arrayExplodeAgg _),
    "json_extract"     -> (Analytics.jsonExtract _),
    "funnel"           -> (Behavior.funnel _),
    "retention"        -> (Behavior.retention _),
    "rolling_window"   -> (Behavior.rollingWindow _),
    "cube_agg"         -> (Behavior.cubeAgg _),
    "kmv_distinct"     -> (Sketches.kmvDistinct _),
    "sample_quantiles" -> (Sketches.sampleQuantiles _),
    "scd2_history"     -> (graft.ingest.Decisions.scd2History _),
    "asof_join"        -> (AsofJoin.asofJoinQ _),
    "range_join"       -> (RangeJoin.rangeJoinQ _),
    "skew_agg"         -> (ScalePatterns.skewAgg _),
    "skew_join"        -> (ScalePatterns.skewJoin _),
    "merge_delete"     -> (graft.operators.Maintenance.mergeDelete _),
    "snapshot_diff"    -> (graft.operators.Maintenance.snapshotDiff _),
    "bucketed_join"    -> (ScalePatterns.bucketedJoin _),
    "pruned_scan"      -> (ScalePatterns.prunedScan _),
    "zorder_layout"    -> (ScalePatterns.zorderLayout _),
    "compact_files"    -> (ScalePatterns.compactFiles _),
    "bloom_semi_join"  -> (ScalePatterns.bloomSemiJoin _),
    "sample_split"     -> (TrainPrep.sampleSplit _),
    "stratified_sample" -> (TrainPrep.stratifiedSample _),
    "vocab_topk"       -> (TrainPrep.vocabTopk _),
    "mix_sources"      -> (Dedup.mixSources _),
    "seq_pack"         -> (TrainPrep.seqPack _),
    "decontaminate"    -> (TrainPrep.decontaminate _),
    "curate"           -> (TrainPrep.curate _),
    // E: text analysis
    "lang_id"          -> (TextOps.langId _),
    "text_quality"     -> (TextOps.textQuality _),
    "token_count"      -> (TextOps.tokenCount _),
    "doc_fingerprint"  -> (TextOps.docFingerprintQ _),
    "bm25_topk"        -> (TextOps.bm25Topk _),
    "tfidf_topterms"   -> (TextOps.tfidfTopterms _),
    "dataset_card"     -> (TrainPrep.datasetCard _),
    "scrub_pii"        -> (TextOps.scrubPii _),
    "chunk_docs"       -> (TrainPrep.chunkDocs _),
    // C: dedup
    "dedup_exact"      -> (Dedup.dedupExact _),
    "dedup_minhash_lsh" -> (Dedup.dedupMinhashLsh _),
    "dedup_simhash"    -> (Dedup.dedupSimhash _),
    "dedup_simhash_wide" -> (Dedup.dedupSimhashWide _),
    "ngram_jaccard"    -> (Dedup.ngramJaccard _),
    "dedup_embedding"  -> (Dedup.dedupEmbedding _),
    "dedup_clusters"   -> (Dedup.dedupClusters _),
    // D: similarity search
    "ann_bruteforce"   -> (Ann.annBruteforce _),
    "ann_lsh"          -> (Ann.annLsh _),
    "ann_ivf"          -> (Ann.annIvf _),
    "knn_join"         -> (Ann.knnJoin _),
    "emb_quantize"     -> (Ann.embQuantize _),
    // F: multimodal plumbing
    "mm_schema"        -> (Multimodal.mmSchema _),
    "mm_decode"        -> (Multimodal.mmDecode _),
    "mm_framesample"   -> (Multimodal.mmFramesample _),
    // I: round-4 additions
    "line_dedup"       -> (CorpusClean.lineDedup _),
    "repetition_score" -> (CorpusClean.repetitionScore _),
    "substring_dedup"  -> (CorpusClean.substringDedup _),
    "bpe_pairs"        -> (CorpusClean.bpePairs _),
    "kmeans_iter"      -> (KMeansIter.kmeansIter _),
    "quantile_bins"    -> (graft.queries.Robust.quantileBins _),
    "outlier_mad"      -> (graft.queries.Robust.outlierMad _),
    "schema_drift"     -> (ScalePatterns.schemaDrift _),
    "stream_join"      -> (graft.streaming.StreamJoin.run _),
    "pagerank_iter"    -> (PageRankIter.pagerankIter _),
    "kmv_merge"        -> (Sketches.kmvMerge _),
    "key_skew_stats"   -> (Sketches.keySkewStats _),
    "filter_funnel"    -> (TrainPrep.filterFunnel _),
    "collocations"     -> (CorpusClean.collocations _),
    // J: round-4 continuation
    "triangle_count"   -> (graft.operators.Graph.triangleCount _),
    "heavy_hitters"    -> (Sketches.heavyHitters _),
    "dist_drift"       -> (graft.queries.Robust.distDrift _),
    "winsorize"        -> (graft.queries.Robust.winsorize _),
    "lm_score"         -> (CorpusClean.lmScore _),
    "vec_health"       -> (Ann.vecHealth _),
    "token_budget_mix" -> (TrainPrep.tokenBudgetMix _),
    "chunk_reassemble" -> (TrainPrep.chunkReassemble _)
  )

  /** DuckDB-runnable ANSI SQL twin for each oracle-able query; keys
    * absent here get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "ingest_manifest"  -> Ingest.ingestManifestSql,
    "zipcsv_read"      -> Ingest.zipcsvReadSql,
    "decision_parse"   -> Ingest.decisionParseSql,
    "snowflake_decode" -> Ingest.snowflakeDecodeSql,
    "dedup_upsert"     -> Ingest.dedupUpsertSql,
    "ingest_stats"     -> Ingest.ingestStatsSql,
    "jdbc_sink"        -> Ingest.jdbcSinkSql,
    "stream_ingest"    -> Ingest.streamIngestSql,
    "fetch_ingest"     -> Ingest.fetchIngestSql,
    // table_sizes is rows-only: parquet file sizes are invisible to
    // the oracle's table views (spec asserts filesystem equality).
    // incremental merge must equal the full recompute — same oracle
    // as dedup_upsert by design (associativity of total-order LWW)
    "incremental_upsert" -> Ingest.dedupUpsertSql,
    "decision_roundtrip" -> graft.ingest.Decisions.decisionRoundtripSql,
    "decision_quality" -> graft.ingest.Decisions.decisionQualitySql,
    // streaming twin of the Decision pipeline — same oracle
    "stream_decisions" -> graft.ingest.Decisions.decisionRoundtripSql,
    // streaming twin of B6 — same oracle
    "stream_sessionize" -> Analytics.sessionizeSql,
    "stream_late_data" -> graft.streaming.StreamLateData.sql,
    "q1_agg"           -> Analytics.q1AggSql,
    "q3_join_topn"     -> Analytics.q3JoinTopnSql,
    "q5_multijoin"     -> Analytics.q5MultijoinSql,
    "topn_per_group"   -> Analytics.topnPerGroupSql,
    "windowed_counts"  -> Analytics.windowedCountsSql,
    "sessionize"       -> Analytics.sessionizeSql,
    "semi_anti_join"   -> Analytics.semiAntiJoinSql,
    "rollup_agg"       -> Analytics.rollupAggSql,
    "pivot_events"     -> Analytics.pivotEventsSql,
    "percentiles"      -> Analytics.percentilesSql,
    "array_explode_agg" -> Analytics.arrayExplodeAggSql,
    "json_extract"     -> Analytics.jsonExtractSql,
    "funnel"           -> Behavior.funnelSql,
    "retention"        -> Behavior.retentionSql,
    "rolling_window"   -> Behavior.rollingWindowSql,
    "cube_agg"         -> Behavior.cubeAggSql,
    "kmv_distinct"     -> Sketches.kmvDistinctSql,
    "sample_quantiles" -> Sketches.sampleQuantilesSql,
    "scd2_history"     -> graft.ingest.Decisions.scd2HistorySql,
    "asof_join"        -> AsofJoin.asofJoinSql,
    "range_join"       -> RangeJoin.rangeJoinSql,
    "skew_agg"         -> ScalePatterns.skewAggSql,
    "skew_join"        -> ScalePatterns.skewJoinSql,
    "merge_delete"     -> graft.operators.Maintenance.mergeDeleteSql,
    "snapshot_diff"    -> graft.operators.Maintenance.snapshotDiffSql,
    "bucketed_join"    -> ScalePatterns.bucketedJoinSql,
    "pruned_scan"      -> ScalePatterns.prunedScanSql,
    // compact_files is rows-only: file layout is invisible to the
    // oracle's table views (spec asserts row invariance + layout).
    "zorder_layout"    -> ScalePatterns.zorderLayoutSql,
    "bloom_semi_join"  -> ScalePatterns.bloomSemiJoinSql,
    "sample_split"     -> TrainPrep.sampleSplitSql,
    "stratified_sample" -> TrainPrep.stratifiedSampleSql,
    "vocab_topk"       -> TrainPrep.vocabTopkSql,
    "mix_sources"      -> Dedup.mixSourcesSql,
    "seq_pack"         -> TrainPrep.seqPackSql,
    "decontaminate"    -> TrainPrep.decontaminateSql,
    "curate"           -> TrainPrep.curateSql,
    // doc_fingerprint is rows-only: xxhash64 has no DuckDB twin.
    "lang_id"          -> TextOps.langIdSql,
    "text_quality"     -> TextOps.textQualitySql,
    "token_count"      -> TextOps.tokenCountSql,
    "bm25_topk"        -> TextOps.bm25TopkSql,
    "tfidf_topterms"   -> TextOps.tfidfTopTermsSql,
    "dataset_card"     -> TrainPrep.datasetCardSql,
    "scrub_pii"        -> TextOps.scrubPiiSql,
    "chunk_docs"       -> TrainPrep.chunkDocsSql,
    // dedup_simhash is rows-only: sketch has no cross-engine twin.
    "dedup_exact"      -> Dedup.dedupExactSql,
    "dedup_minhash_lsh" -> Dedup.dedupMinhashLshSql,
    "ngram_jaccard"    -> Dedup.ngramJaccardSql,
    "dedup_embedding"  -> Dedup.dedupEmbeddingSql,
    "dedup_clusters"   -> Dedup.dedupClustersSql,
    // ann_lsh is rows-only: hyperplanes derive from xxhash64.
    "ann_bruteforce"   -> Ann.annBruteforceSql,
    "ann_ivf"          -> Ann.annIvfSql,
    "knn_join"         -> Ann.knnJoinSql,
    "emb_quantize"     -> Ann.embQuantizeSql,
    "mm_schema"        -> Multimodal.mmSchemaSql,
    "mm_decode"        -> Multimodal.mmDecodeSql,
    "mm_framesample"   -> Multimodal.mmFramesampleSql,
    "line_dedup"       -> CorpusClean.lineDedupSql,
    "repetition_score" -> CorpusClean.repetitionScoreSql,
    "substring_dedup"  -> CorpusClean.substringDedupSql,
    "bpe_pairs"        -> CorpusClean.bpePairsSql,
    "kmeans_iter"      -> KMeansIter.kmeansIterSql,
    "quantile_bins"    -> graft.queries.Robust.quantileBinsSql,
    "outlier_mad"      -> graft.queries.Robust.outlierMadSql,
    "schema_drift"     -> ScalePatterns.schemaDriftSql,
    "stream_join"      -> graft.streaming.StreamJoin.sql,
    "pagerank_iter"    -> PageRankIter.pagerankIterSql,
    "kmv_merge"        -> Sketches.kmvMergeSql,
    "key_skew_stats"   -> Sketches.keySkewStatsSql,
    "filter_funnel"    -> TrainPrep.filterFunnelSql,
    "collocations"     -> CorpusClean.collocationsSql,
    "triangle_count"   -> graft.operators.Graph.triangleCountSql,
    "heavy_hitters"    -> Sketches.heavyHittersSql,
    "dist_drift"       -> graft.queries.Robust.distDriftSql,
    "winsorize"        -> graft.queries.Robust.winsorizeSql,
    "lm_score"         -> CorpusClean.lmScoreSql,
    "vec_health"       -> Ann.vecHealthSql,
    "token_budget_mix" -> TrainPrep.tokenBudgetMixSql,
    "chunk_reassemble" -> TrainPrep.chunkReassembleSql
  )
}
