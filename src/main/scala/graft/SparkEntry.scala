package graft

import graft.llm.{Dedup, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an implemented operator from SURVEY.md §2
  * (or a beyond-parity LLM-pipeline operator); [[oracleSql]] holds the
  * DuckDB-equivalent SQL for the driver's hash compare. Column names and
  * value renderings (timestamps cast to string, exact-decimal sums) are
  * aligned between both sides by construction.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q1 returns one row per (returnflag, linestatus) group — a sturdier
    * smoke than q5, which collapses to a single row at tiny scale. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // analytics core (joins/aggs/windows/sort/limit — SURVEY §2.4)
    "q1_pricing_summary" -> (Queries.q1PricingSummary(_, _)),
    "q3_top_orders" -> (Queries.q3TopOrders(_, _)),
    "q10_returned_customers" -> (Queries.q10ReturnedCustomers(_, _)),
    "q16_parts_supplier" -> (Queries.q16PartsSupplier(_, _)),
    "q4_order_priority" -> (Queries.q4OrderPriority(_, _)),
    "q17_small_quantity" -> (Queries.q17SmallQuantity(_, _)),
    "q18_large_orders" -> (Queries.q18LargeOrders(_, _)),
    "q21_waiting_suppliers" -> (Queries.q21WaitingSuppliers(_, _)),
    "q22_global_sales" -> (Queries.q22GlobalSales(_, _)),
    "q5_region_revenue" -> (Queries.q5RegionRevenue(_, _)),
    "q2_min_cost_supplier" -> (Queries.q2MinCostSupplier(_, _)),
    "q6_forecast_revenue" -> (Queries.q6ForecastRevenue(_, _)),
    "q7_volume_shipping" -> (Queries.q7VolumeShipping(_, _)),
    "q8_market_share" -> (Queries.q8MarketShare(_, _)),
    "q9_product_profit" -> (Queries.q9ProductProfit(_, _)),
    "q11_important_stock" -> (Queries.q11ImportantStock(_, _)),
    "q12_priority_shipping" -> (Queries.q12PriorityShipping(_, _)),
    "q13_customer_distribution" -> (Queries.q13CustomerDistribution(_, _)),
    "q14_promo_revenue" -> (Queries.q14PromoRevenue(_, _)),
    "q15_top_supplier" -> (Queries.q15TopSupplier(_, _)),
    "q19_discount_revenue" -> (Queries.q19DiscountRevenue(_, _)),
    "q20_excess_suppliers" -> (Queries.q20ExcessSuppliers(_, _)),
    "events_window" -> (Queries.eventsWindow(_, _)),
    "events_frames" -> (Queries.eventsFrames(_, _)),
    "funnel_steps" -> (Queries.funnelSteps(_, _)),
    "funnel_windowed" -> (Queries.funnelWindowed(_, _)),
    "funnel_conversion_stats" -> (Queries.funnelConversionStats(_, _)),
    "funnel_anchor_policy" -> (Queries.funnelAnchorPolicy(_, _)),
    "events_json" -> (Queries.eventsJson(_, _)),
    "grouping_sets" -> (Queries.groupingSetsRevenue(_, _)),
    "rollup_revenue" -> (Queries.rollupRevenue(_, _)),
    "cube_revenue" -> (Queries.cubeRevenue(_, _)),
    "pivot_status" -> (Queries.pivotStatus(_, _)),
    "unpivot_measures" -> (Queries.unpivotMeasures(_, _)),
    "windowed_counts" -> (Queries.windowedCounts(_, _)),
    "setops_customers" -> (Queries.setOpsCustomers(_, _)),
    // metadata-hash core + write patterns (SURVEY §1.4, §2.2)
    "key_data_hash" -> (Queries.keyDataHash(_, _)),
    "append_basic" -> (Queries.appendBasic(_, _)),
    "append_managed" -> (Queries.appendManaged(_, _)),
    "overwrite_managed" -> (Queries.overwriteManaged(_, _)),
    "table_maintenance" -> (Queries.tableMaintenance(_, _)),
    "data_skipping" -> (Queries.dataSkipping(_, _)),
    "zorder_skipping" -> (Queries.zorderSkipping(_, _)),
    "hilbert_skipping" -> (Queries.hilbertSkipping(_, _)),
    "restore_snapshot" -> (Queries.restoreSnapshot(_, _)),
    "dml_delete_update" -> (Queries.dmlDeleteUpdate(_, _)),
    // skew-safe two-stage distinct count (operators/SkewOps.scala):
    // exact because salting partitions the value space
    "skew_distinct" -> ((s, d) => graft.operators.SkewOps.saltedDistinctCount(
      Queries.pq(s, d, "orders"), Seq("o_orderpriority"), "o_custkey")),
    "salted_join" -> (Queries.saltedJoinAgg(_, _)),
    // time-series joins + sketch summaries (operators/{AsOfJoin,RangeJoin,Sketches})
    "asof_join" -> (Queries.asofAttribution(_, _)),
    "temporal_join" -> (Queries.temporalJoin(_, _)),
    "range_join" -> (Queries.rangeJoinActivity(_, _)),
    "sketch_distinct" -> (Queries.sketchDistinct(_, _)),
    "heavy_hitters" -> (Queries.heavyHittersDocs(_, _)),
    "dataset_card" -> (Queries.datasetCardDocs(_, _)),
    "quality_classifier" -> (Queries.qualityClassifier(_, _)),
    "quality_classifier_incremental" ->
      (Queries.qualityClassifierIncremental(_, _)),
    "classifier_view_refresh" -> (Queries.classifierViewRefresh(_, _)),
    "bloom_prune_join" -> (Queries.bloomPruneJoin(_, _)),
    "bucketed_join" -> (Queries.bucketedJoin(_, _)),
    // deterministic sampling + packing (operators/Sampling, llm/Packing)
    "hash_sample" -> (Queries.hashSampleDocs(_, _)),
    "weighted_sample" -> (Queries.weightedSampleDocs(_, _)),
    "stratified_sample" -> (Queries.stratifiedSampleDocs(_, _)),
    "hash_split" -> (Queries.hashSplitDocs(_, _)),
    "cap_per_group" -> (Queries.capPerSource(_, _)),
    "pack_sequences" -> (Queries.packDocs(_, _)),
    "pack_incremental" -> (Queries.packIncremental(_, _)),
    "export_shards" -> (Queries.exportShardsDocs(_, _)),
    "export_shard_files" -> (Queries.exportShardFiles(_, _)),
    "contamination_check" -> (Queries.contaminationCheck(_, _)),
    "decontaminate_train" -> (Queries.decontaminateTrain(_, _)),
    "decontaminate_incremental" -> (Queries.decontaminateIncremental(_, _)),
    // rows-only: rank-greedy BPE has no DuckDB-expressible oracle (see
    // Bpe.scala scaladoc); exactness is BpeSpec's reference-parity pins
    "bpe_token_count" -> (Queries.bpeTokenCount(_, _)),
    // rows-only for the same reason as bpe_token_count: Viterbi
    // segmentation has no DuckDB expression; gates + UnigramLmSpec
    "unigram_token_count" -> (Queries.unigramTokenCount(_, _)),
    // rows-only: greedy longest-match has no DuckDB expression; gated
    // in-query (planted encodes + concatenation identity) + WordPieceSpec
    "wordpiece_token_count" -> (Queries.wordpieceTokenCount(_, _)),
    "cap_tokens_per_group" -> (Queries.capTokensPerLang(_, _)),
    "pii_redact" -> (Queries.piiRedact(_, _)),
    "chunk_documents" -> (Queries.chunkDocs(_, _)),
    "dedup_incremental" -> (Queries.dedupIncremental(_, _)),
    "dedup_batch_action" -> (Queries.dedupBatchAction(_, _)),
    "dedup_spans" -> (Queries.dedupSpans(_, _)),
    "dedup_spans_action" -> (Queries.dedupSpansAction(_, _)),
    "dedup_spans_incremental" -> (Queries.dedupSpansIncremental(_, _)),
    "incremental_view" -> (Queries.incrementalView(_, _)),
    "incremental_join_view" -> (Queries.incrementalJoinView(_, _)),
    "agg_view_highcard" -> (Queries.aggViewHighcard(_, _)),
    "view_auto_maintain" -> (Queries.viewAutoMaintain(_, _)),
    "auto_vacuum" -> (Queries.autoVacuum(_, _)),
    "stream_join_view" -> (Queries.streamJoinView(_, _)),
    "stream_dim_trigger" -> (Queries.streamDimTrigger(_, _)),
    "incremental_view_minmax" -> (Queries.incrementalViewMinMax(_, _)),
    "column_rename" -> (Queries.columnRename(_, _)),
    "countmin_rollup" -> (Queries.countminRollup(_, _)),
    "kmv_overlap" -> (Queries.kmvOverlap(_, _)),
    "expectations_drift" -> (Queries.expectationsDrift(_, _)),
    "fuzzy_join" -> (Queries.fuzzyJoinParts(_, _)),
    "fuzzy_dedup" -> (Queries.fuzzyDedupParts(_, _)),
    "export_manifest" -> (Queries.exportManifest(_, _)),
    "deletion_vectors" -> (Queries.deletionVectors(_, _)),
    "table_clone" -> (Queries.tableClone(_, _)),
    "bloom_skipping" -> (Queries.bloomSkipping(_, _)),
    "cluster_on_write" -> (Queries.clusterOnWrite(_, _)),
    "cluster_incremental" -> (Queries.clusterIncremental(_, _)),
    "sql_table_dml" -> (Queries.sqlTableDml(_, _)),
    "sql_table_ctas" -> (Queries.sqlTableCtas(_, _)),
    "sql_create_view" -> (Queries.sqlCreateView(_, _)),
    "sql_show_objects" -> (Queries.sqlShowObjects(_, _)),
    "sql_table_time_travel" -> (Queries.sqlTableTimeTravel(_, _)),
    "sql_table_merge" -> (Queries.sqlTableMerge(_, _)),
    "sql_call_maintenance" -> (Queries.sqlCallMaintenance(_, _)),
    "table_constraints" -> (Queries.tableConstraints(_, _)),
    "type_widening" -> (Queries.typeWidening(_, _)),
    "expectations_check" -> (Queries.expectationsCheck(_, _)),
    "selective_overwrite" -> (Queries.selectiveOverwriteManaged(_, _)),
    "scd1_upsert" -> (Queries.scd1Upsert(_, _)),
    "scd1_evolve" -> (Queries.scd1Evolve(_, _)),
    "scd1_partitioned" -> (Queries.scd1Partitioned(_, _)),
    "scd1_file_scoped" -> (Queries.scd1FileScoped(_, _)),
    "merge_maintenance" -> (Queries.mergeMaintenance(_, _)),
    "scd1_string_scoped" -> (Queries.scd1StringScoped(_, _)),
    "scd2_initial" -> (Queries.scd2Initial(_, _)),
    "scd2_two_loads" -> (Queries.scd2TwoLoads(_, _)),
    "scd3_shift" -> (Queries.scd3Shift(_, _)),
    "constraint_violations" -> (Queries.constraintViolations(_, _)),
    "time_travel" -> (Queries.timeTravel(_, _)),
    // task model + features + CDC + streaming (SURVEY §2.3, §2.7, §2.8, §2.9)
    "task_e2e_csv_append" -> (Queries.taskE2eCsvAppend(_, _)),
    "json_source_agg" -> (Queries.jsonSourceAgg(_, _)),
    "cdc_two_runs" -> (Queries.cdcTwoRuns(_, _)),
    "cdc_change_feed" -> (Queries.cdcChangeFeed(_, _)),
    "stream_append" -> (Queries.streamAppend(_, _)),
    "stream_table_source" -> (Queries.streamTableSource(_, _)),
    "stream_table_sink" -> (Queries.streamTableSink(_, _)),
    "stream_curate" -> (Queries.streamCurate(_, _)),
    "stream_funnel" -> (Queries.streamFunnel(_, _)),
    "stream_funnel_ooo" -> (Queries.streamFunnelOoo(_, _)),
    "stream_decontaminate" -> (Queries.streamDecontaminate(_, _)),
    "stream_heavy_hitters" -> (Queries.streamHeavyHitters(_, _)),
    "stream_distinct" -> (Queries.streamDistinct(_, _)),
    "stream_dedup" -> (Queries.streamDedup(_, _)),
    "stream_neardup" -> (Queries.streamNearDup(_, _)),
    "stream_semantic" -> (Queries.streamSemanticDedup(_, _)),
    "stream_join" -> (Queries.streamJoin(_, _)),
    "sessionize" -> (Queries.sessionizeEvents(_, _)),
    // LLM-pipeline text operators
    "dedup_exact" -> ((s, d) => TextOps.exactDedupStats(Queries.pq(s, d, "documents"))),
    "text_quality" -> ((s, d) => TextOps.textQuality(Queries.pq(s, d, "documents"))),
    "token_count" -> ((s, d) => TextOps.tokenCount(Queries.pq(s, d, "documents"))),
    // SQL surface: the same operators invoked as TVFs from pure SQL text
    // (SparkSessionExtensions-injected — the spliced plan is identical to
    // the Scala call's, so the oracle answers must be identical too)
    "sql_tvf_token_count" -> ((s, d) => {
      Queries.pq(s, d, "documents").createOrReplaceTempView("documents")
      s.sql("SELECT * FROM graft_token_count('documents')")
    }),
    "sql_tvf_chunk" -> ((s, d) => {
      Queries.pq(s, d, "documents").createOrReplaceTempView("documents")
      s.sql("SELECT * FROM graft_chunk('documents', 40, 10)")
    }),
    "lang_id" -> ((s, d) => TextOps.langId(Queries.pq(s, d, "documents"))),
    "doc_fingerprint" -> ((s, d) => TextOps.fingerprint(Queries.pq(s, d, "documents"))),
    "repetition_signals" -> ((s, d) =>
      TextOps.repetitionSignals(Queries.pq(s, d, "documents"))),
    "quality_gopher" -> ((s, d) => TextOps.gopherQuality(Queries.pq(s, d, "documents"))),
    "gopher_repetition" -> ((s, d) =>
      TextOps.gopherRepetition(Queries.pq(s, d, "documents"))),
    "c4_line_filter" -> ((s, d) => TextOps.c4LineFilter(Queries.pq(s, d, "documents"))),
    "rare_tokens" -> ((s, d) => TextOps.rareTokenScore(Queries.pq(s, d, "documents"))),
    "bigram_fluency" -> (Queries.bigramFluency(_, _)),
    "bigram_fluency_incremental" -> (Queries.bigramFluencyIncremental(_, _)),
    // daily-ingest path: the standing 90% corpus trains the LM, the 10%
    // batch is scored against it — unseen tokens are maximally rare
    "rare_tokens_incremental" -> ((s, d) => {
      val docs = Queries.pq(s, d, "documents")
      TextOps.rareTokenScoreWith(
        docs.filter(col("doc_id") % 10 === 0),
        TextOps.unigramModel(docs.filter(col("doc_id") % 10 =!= 0)))
    }),
    "corpus_profile" -> ((s, d) =>
      TextOps.corpusProfile(Queries.pq(s, d, "documents"))),
    "column_profile" -> (Queries.columnProfileDocs(_, _)),
    "tfidf_keywords" -> ((s, d) => TextOps.tfidfKeywords(Queries.pq(s, d, "documents"))),
    "bm25_topk" -> (Queries.bm25TopKDocs(_, _)),
    "bm25_incremental" -> (Queries.bm25IncrementalDocs(_, _)),
    "bm25_view_refresh" -> (Queries.bm25ViewRefresh(_, _)),
    "bm25_view_delete" -> (Queries.bm25ViewDelete(_, _)),
    "stream_bm25_view" -> (Queries.streamBm25View(_, _)),
    "bm25_view_bulk_delete" -> (Queries.bm25ViewBulkDelete(_, _)),
    "multi_view_refresh" -> (Queries.multiViewRefresh(_, _)),
    "view_maintenance" -> (Queries.viewMaintenance(_, _)),
    "view_time_travel" -> (Queries.viewTimeTravel(_, _)),
    "lm_view_refresh" -> (Queries.lmViewRefresh(_, _)),
    "stream_lm_view" -> (Queries.streamLmView(_, _)),
    "neardup_view_refresh" -> (Queries.neardupViewRefresh(_, _)),
    "semantic_view_refresh" -> (Queries.semanticViewRefresh(_, _)),
    "benchmark_view_refresh" -> (Queries.benchmarkViewRefresh(_, _)),
    "phrase_view_refresh" -> (Queries.phraseViewRefresh(_, _)),
    "view_retention" -> (Queries.viewRetention(_, _)),
    "ann_view_refresh" -> (Queries.annViewRefresh(_, _)),
    "ann_view_reinit" -> (Queries.annViewReinit(_, _)),
    "phrase_search" -> (Queries.phraseSearchDocs(_, _)),
    "cascade_rerank" -> (Queries.cascadeRerankDocs(_, _)),
    "cooccurrence_pmi" -> (Queries.cooccurrenceDocs(_, _)),
    "hybrid_search" -> (Queries.hybridSearchDocs(_, _)),
    "hybrid_search_indexed" -> (Queries.hybridSearchIndexed(_, _)),
    "hybrid_view_search" -> (Queries.hybridViewSearch(_, _)),
    "collocations_topk" -> (Queries.collocationsDocs(_, _)),
    "cohort_retention" -> (Queries.cohortRetentionEvents(_, _)),
    "resample_locf" -> (Queries.resampleEvents(_, _)),
    "normalize_text" -> ((s, d) => TextOps.normalizeText(Queries.pq(s, d, "documents"))),
    "mixture_sample" -> (Queries.mixtureSampleDocs(_, _)),
    "temperature_quotas" -> (Queries.temperatureQuotasDocs(_, _)),
    "quantile_sketch" -> (Queries.quantileSketchDocs(_, _)),
    "stream_quantiles" -> (Queries.streamQuantiles(_, _)),
    "temperature_mixture" -> (Queries.temperatureMixtureDocs(_, _)),
    "training_order" -> (Queries.trainingOrderDocs(_, _)),
    "dedup_paragraphs" -> ((s, d) => TextOps.dedupParagraphs(Queries.pq(s, d, "documents"))),
    // near-dup + similarity + multimodal (MinHash-LSH / SimHash / ANN)
    "dedup_minhash" -> ((s, d) =>
      Dedup.nearDupPairs(Queries.pq(s, d, "documents"), threshold = 0.8)),
    // exact prefix-filtered Jaccard at a threshold where LSH banding
    // would lose recall — this operator is deterministic-exact
    "dedup_ngram" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Queries.pq(s, d, "documents"), threshold = 0.7)),
    "dedup_near_corpus" -> ((s, d) =>
      Dedup.dedupNear(Queries.pq(s, d, "documents"), threshold = 0.8)
        .select("doc_id", "lang", "source")),
    // transitive components, best-quality survivor (n_chars as quality)
    "dedup_near_best" -> ((s, d) =>
      Dedup.dedupNearBest(Queries.pq(s, d, "documents"), "n_chars",
          threshold = 0.8)
        .select("doc_id", "lang")),
    // two planted zero-token docs gate the empty-doc guard: token-less
    // docs all fingerprint to 0 and must be excluded from pairing (k of
    // them would otherwise make k²/2 distance-0 pairs), so no output row
    // may carry a negative id — the oracle pairs only token-ful docs too
    "simhash_neardup" -> { (s, d) =>
      import org.apache.spark.sql.functions.{col, lit}
      val docs = Queries.pq(s, d, "documents").select("doc_id", "text")
      val planted = s.range(1).select(lit(-1L).as("doc_id"), lit("").as("text"))
        .unionByName(s.range(1).select(lit(-2L).as("doc_id"), lit("?!.,").as("text")))
      Dedup.simhashPairs(docs.unionByName(planted), maxDistance = 3)
    },
    // composed cleaning chain: quality -> lang-id -> exact dedup -> near-dup
    "corpus_clean" -> (Queries.corpusClean(_, _)),
    "knn_bruteforce" -> { (s, d) =>
      val emb = Queries.pq(s, d, "embeddings")
      import org.apache.spark.sql.functions.col
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20), 10)
        .select("query_id", "rank", "neighbor_id")
    },
    // planted-copy ground truth + in-query recall gate vs brute force —
    // see Queries.annTopKVerified for why both checks are hard
    "ann_topk" -> (Queries.annTopKVerified(_, _)),
    "ann_ivf" -> (Queries.ivfTopKVerified(_, _)),
    "ann_pq" -> (Queries.pqTopKVerified(_, _)),
    "ann_sq8" -> (Queries.sq8TopKVerified(_, _)),
    "ann_ivfpq" -> (Queries.ivfPqTopKVerified(_, _)),
    "ann_ivfpq_incremental" -> (Queries.ivfPqIncrementalVerified(_, _)),
    "semantic_dedup" -> (Queries.semanticDedupVerified(_, _)),
    "semantic_dedup_incremental" -> (Queries.semanticDedupIncremental(_, _)),
    // the synthetic embeddings carry no natural near-dups (max pairwise
    // cos ≈ 0.51), so the scenario plants exact copies shifted by +10000:
    // the LSH bucket join must find precisely those pairs.
    "embedding_neardup" -> { (s, d) =>
      import org.apache.spark.sql.functions.col
      val emb = Queries.pq(s, d, "embeddings").select("vec_id", "embedding")
      Queries.assertPlantedIdHeadroom(emb, offset = 10000)
      val planted = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
      // planted copies are exact (hamming 0 under any hyperplane set), so
      // probeDistance=1 keeps guaranteed recall at a quarter of the
      // candidate volume of the default 2
      Similarity.embeddingNearDups(emb.unionByName(planted), threshold = 0.99,
        probeDistance = 1)
        .select("id1", "id2")
    },
    "multimodal_decode" -> (Queries.multimodalDecode(_, _)))

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Queries.q1Sql,
    "q3_top_orders" -> Queries.q3Sql,
    "q10_returned_customers" -> Queries.q10Sql,
    "q16_parts_supplier" -> Queries.q16Sql,
    "q4_order_priority" -> Queries.q4Sql,
    "q17_small_quantity" -> Queries.q17Sql,
    "q18_large_orders" -> Queries.q18Sql,
    "q21_waiting_suppliers" -> Queries.q21Sql,
    "q22_global_sales" -> Queries.q22Sql,
    "q5_region_revenue" -> Queries.q5Sql,
    "q2_min_cost_supplier" -> Queries.q2Sql,
    "q6_forecast_revenue" -> Queries.q6Sql,
    "q7_volume_shipping" -> Queries.q7Sql,
    "q8_market_share" -> Queries.q8Sql,
    "q9_product_profit" -> Queries.q9Sql,
    "q11_important_stock" -> Queries.q11Sql,
    "q12_priority_shipping" -> Queries.q12Sql,
    "q13_customer_distribution" -> Queries.q13Sql,
    "q14_promo_revenue" -> Queries.q14Sql,
    "q15_top_supplier" -> Queries.q15Sql,
    "q19_discount_revenue" -> Queries.q19Sql,
    "q20_excess_suppliers" -> Queries.q20Sql,
    "events_window" -> Queries.eventsWindowSql,
    "events_frames" -> Queries.eventsFramesSql,
    "funnel_steps" -> Queries.funnelStepsSql,
    "funnel_windowed" -> Queries.funnelWindowedSql,
    "funnel_conversion_stats" -> Queries.funnelConversionStatsSql,
    "funnel_anchor_policy" -> Queries.funnelAnchorPolicySql,
    "events_json" -> Queries.eventsJsonSql,
    "grouping_sets" -> Queries.groupingSetsRevenueSql,
    "rollup_revenue" -> Queries.rollupRevenueSql,
    "cube_revenue" -> Queries.cubeRevenueSql,
    "pivot_status" -> Queries.pivotStatusSql,
    "unpivot_measures" -> Queries.unpivotMeasuresSql,
    "windowed_counts" -> Queries.windowedCountsSql,
    "setops_customers" -> Queries.setOpsCustomersSql,
    "key_data_hash" -> Queries.keyDataHashSql,
    "append_basic" -> Queries.appendBasicSql,
    "append_managed" -> Queries.appendManagedSql,
    "overwrite_managed" -> Queries.overwriteManagedSql,
    "table_maintenance" -> Queries.tableMaintenanceSql,
    "data_skipping" -> Queries.dataSkippingSql,
    "zorder_skipping" -> Queries.zorderSkippingSql,
    "hilbert_skipping" -> Queries.hilbertSkippingSql,
    "restore_snapshot" -> Queries.restoreSnapshotSql,
    "dml_delete_update" -> Queries.dmlDeleteUpdateSql,
    "skew_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_distinct
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "salted_join" -> Queries.saltedJoinAggSql,
    "asof_join" -> Queries.asofAttributionSql,
    "temporal_join" -> Queries.temporalJoinSql,
    "range_join" -> Queries.rangeJoinActivitySql,
    "sketch_distinct" -> Queries.sketchDistinctSql,
    "heavy_hitters" -> Queries.heavyHittersDocsSql,
    "dataset_card" -> Queries.datasetCardDocsSql,
    "quality_classifier" -> Queries.qualityClassifierSql,
    "quality_classifier_incremental" ->
      Queries.qualityClassifierIncrementalSql,
    "classifier_view_refresh" -> Queries.classifierViewRefreshSql,
    "bloom_prune_join" -> Queries.bloomPruneJoinSql,
    "bucketed_join" -> Queries.bucketedJoinSql,
    "hash_sample" -> Queries.hashSampleDocsSql,
    "weighted_sample" -> Queries.weightedSampleDocsSql,
    "stratified_sample" -> Queries.stratifiedSampleDocsSql,
    "hash_split" -> Queries.hashSplitDocsSql,
    "cap_per_group" -> Queries.capPerSourceSql,
    "pack_sequences" -> Queries.packDocsSql,
    "pack_incremental" -> Queries.packIncrementalSql,
    "export_shards" -> Queries.exportShardsDocsSql,
    "export_shard_files" -> Queries.exportShardFilesSql,
    "contamination_check" -> Queries.contaminationCheckSql,
    "decontaminate_train" -> Queries.decontaminateTrainSql,
    "decontaminate_incremental" -> Queries.decontaminateIncrementalSql,
    "cap_tokens_per_group" -> Queries.capTokensPerLangSql,
    "pii_redact" -> Queries.piiRedactSql,
    "chunk_documents" -> Queries.chunkDocsSql,
    "dedup_incremental" -> Queries.dedupIncrementalSql,
    "dedup_batch_action" -> Queries.dedupBatchActionSql,
    "dedup_spans" -> Queries.dedupSpansSql,
    "dedup_spans_action" -> Queries.dedupSpansActionSql,
    "dedup_spans_incremental" -> Queries.dedupSpansIncrementalSql,
    "incremental_view" -> Queries.incrementalViewSql,
    "incremental_join_view" -> Queries.incrementalJoinViewSql,
    "agg_view_highcard" -> Queries.aggViewHighcardSql,
    "view_auto_maintain" -> Queries.viewAutoMaintainSql,
    "auto_vacuum" -> Queries.autoVacuumSql,
    "stream_join_view" -> Queries.streamJoinViewSql,
    "stream_dim_trigger" -> Queries.streamDimTriggerSql,
    "incremental_view_minmax" -> Queries.incrementalViewMinMaxSql,
    "column_rename" -> Queries.columnRenameSql,
    "countmin_rollup" -> Queries.countminRollupSql,
    "kmv_overlap" -> Queries.kmvOverlapSql,
    "expectations_drift" -> Queries.expectationsDriftSql,
    "fuzzy_join" -> Queries.fuzzyJoinPartsSql,
    "fuzzy_dedup" -> Queries.fuzzyDedupPartsSql,
    "export_manifest" -> Queries.exportManifestSql,
    "deletion_vectors" -> Queries.deletionVectorsSql,
    "table_clone" -> Queries.tableCloneSql,
    "bloom_skipping" -> Queries.bloomSkippingSql,
    "cluster_on_write" -> Queries.clusterOnWriteSql,
    "cluster_incremental" -> Queries.clusterIncrementalSql,
    "sql_table_dml" -> Queries.sqlTableDmlSql,
    "sql_table_ctas" -> Queries.sqlTableCtasSql,
    "sql_create_view" -> Queries.sqlCreateViewSql,
    "sql_show_objects" -> Queries.sqlShowObjectsSql,
    "sql_table_time_travel" -> Queries.sqlTableTimeTravelSql,
    "sql_table_merge" -> Queries.sqlTableMergeSql,
    "sql_call_maintenance" -> Queries.sqlCallMaintenanceSql,
    "table_constraints" -> Queries.tableConstraintsSql,
    "type_widening" -> Queries.typeWideningSql,
    "expectations_check" -> Queries.expectationsCheckSql,
    "selective_overwrite" -> Queries.selectiveOverwriteManagedSql,
    "scd1_upsert" -> Queries.scd1UpsertSql,
    "scd1_evolve" -> Queries.scd1EvolveSql,
    "scd1_file_scoped" -> Queries.scd1FileScopedSql,
    "merge_maintenance" -> Queries.mergeMaintenanceSql,
    "scd1_string_scoped" -> Queries.scd1StringScopedSql,
    "scd1_partitioned" -> Queries.scd1PartitionedSql,
    "scd2_initial" -> Queries.scd2InitialSql,
    "scd2_two_loads" -> Queries.scd2TwoLoadsSql,
    "scd3_shift" -> Queries.scd3ShiftSql,
    "constraint_violations" -> Queries.constraintViolationsSql,
    "time_travel" -> Queries.timeTravelSql,
    "task_e2e_csv_append" -> Queries.taskE2eCsvAppendSql,
    "json_source_agg" -> Queries.jsonSourceAggSql,
    "cdc_two_runs" -> Queries.cdcTwoRunsSql,
    "cdc_change_feed" -> Queries.cdcChangeFeedSql,
    "stream_append" -> Queries.streamAppendSql,
    "stream_table_source" -> Queries.streamTableSourceSql,
    "stream_table_sink" -> Queries.streamTableSinkSql,
    "stream_curate" -> Queries.streamCurateSql,
    "stream_funnel" -> Queries.streamFunnelSql,
    "stream_funnel_ooo" -> Queries.streamFunnelOooSql,
    "stream_decontaminate" -> Queries.streamDecontaminateSql,
    "stream_heavy_hitters" -> Queries.streamHeavyHittersSql,
    "stream_distinct" -> Queries.streamDistinctSql,
    "stream_dedup" -> Queries.streamDedupSql,
    "stream_neardup" -> Queries.streamNearDupSql,
    "stream_semantic" -> Queries.streamSemanticDedupSql,
    "stream_join" -> Queries.streamJoinSql,
    "sessionize" -> Queries.sessionizeEventsSql,
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        | length(text) AS n_chars,
        | length(text) - length(replace(text, ' ', '')) AS n_spaces,
        | len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
        | len(regexp_extract_all(text, '[.!?]')) AS n_sentence_punct,
        | len(regexp_extract_all(text, '[0-9]')) AS n_digits,
        | length(text) - length(replace(text, ' the ', '')) AS stopword_score
        |FROM documents""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        | len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
        | len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_word_tokens,
        | len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS n_bpeish_tokens
        |FROM documents""".stripMargin,
    // TVF-routed twins: same answers as the API-routed queries, reached
    // through the SQL surface — a TVF regression shows up as a missing
    // or divergent result here, not just an sbt failure
    "sql_tvf_token_count" ->
      """SELECT doc_id,
        | len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
        | len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_word_tokens,
        | len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS n_bpeish_tokens
        |FROM documents""".stripMargin,
    "sql_tvf_chunk" -> Queries.chunkDocsSql,
    "lang_id" ->
      """WITH t AS (SELECT doc_id, ' ' || lower(text) || ' ' AS tx FROM documents),
        |s AS (SELECT doc_id,
        | (length(tx) - length(replace(tx, ' the ', ''))) + (length(tx) - length(replace(tx, ' and ', ''))) + (length(tx) - length(replace(tx, ' a ', ''))) AS score_en,
        | (length(tx) - length(replace(tx, ' der ', ''))) + (length(tx) - length(replace(tx, ' und ', ''))) + (length(tx) - length(replace(tx, ' die ', ''))) AS score_de,
        | (length(tx) - length(replace(tx, ' le ', ''))) + (length(tx) - length(replace(tx, ' et ', ''))) + (length(tx) - length(replace(tx, ' la ', ''))) AS score_fr,
        | (length(tx) - length(replace(tx, ' el ', ''))) + (length(tx) - length(replace(tx, ' y ', ''))) + (length(tx) - length(replace(tx, ' los ', ''))) AS score_es
        | FROM t)
        |SELECT doc_id, score_en, score_de, score_fr, score_es,
        | CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
        |      WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
        |      WHEN score_fr >= score_es THEN 'fr'
        |      ELSE 'es' END AS predicted_lang
        |FROM s""".stripMargin,
    "doc_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fingerprint,
        | len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
        |FROM documents""".stripMargin,
    "quality_gopher" ->
      """WITH s AS (SELECT doc_id,
        |  regexp_split_to_array(trim(text), '\s+') AS ws,
        |  list_transform(str_split(text, chr(10)), x -> trim(x)) AS lines,
        |  ' ' || lower(text) || ' ' AS padded,
        |  (length(text) - length(replace(text, '...', ''))) // 3 AS n_ell,
        |  len(regexp_extract_all(text, '#')) AS n_hash
        | FROM documents),
        |c AS (SELECT doc_id,
        |  len(ws) AS n_words,
        |  CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS n_word_chars,
        |  len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) AS n_alpha_words,
        |  n_hash + n_ell AS n_symbols,
        |  len(lines) AS n_lines,
        |  len(list_filter(lines, x -> regexp_matches(x, '^[-*]'))) AS n_bullet_lines,
        |  len(list_filter(lines, x -> regexp_matches(x, '\.\.\.$'))) AS n_ellipsis_lines,
        |  (CASE WHEN contains(padded, ' the ') THEN 1 ELSE 0 END) +
        |  (CASE WHEN contains(padded, ' be ') THEN 1 ELSE 0 END) +
        |  (CASE WHEN contains(padded, ' to ') THEN 1 ELSE 0 END) +
        |  (CASE WHEN contains(padded, ' of ') THEN 1 ELSE 0 END) +
        |  (CASE WHEN contains(padded, ' and ') THEN 1 ELSE 0 END) +
        |  (CASE WHEN contains(padded, ' that ') THEN 1 ELSE 0 END) +
        |  (CASE WHEN contains(padded, ' have ') THEN 1 ELSE 0 END) +
        |  (CASE WHEN contains(padded, ' with ') THEN 1 ELSE 0 END) AS n_stopwords
        | FROM s)
        |SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_symbols,
        | n_lines, n_bullet_lines, n_ellipsis_lines, n_stopwords,
        | CASE WHEN n_words BETWEEN 50 AND 100000
        |      AND n_word_chars BETWEEN n_words * 3 AND n_words * 10
        |      AND n_symbols * 10 < n_words
        |      AND n_bullet_lines * 10 < n_lines * 9
        |      AND n_ellipsis_lines * 10 < n_lines * 3
        |      AND n_alpha_words * 10 > n_words * 8
        |      AND n_stopwords >= 2 THEN 1 ELSE 0 END AS passes_gopher
        |FROM c""".stripMargin,
    // gopher_repetition: the same item/count pipeline as the Spark-side
    // per-doc kernel, expressed relationally (unnest -> two group-bys).
    // Every aggregate is CAST AS BIGINT (DuckDB sum() is HUGEINT).
    "gopher_repetition" ->
      """WITH base AS (
        | SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS s
        | FROM documents),
        |items AS (
        |  SELECT doc_id, 'L' AS kind, 1 AS n,
        |   unnest(list_filter(list_transform(str_split(text, chr(10)), x -> trim(x)), x -> x <> '')) AS item FROM base
        |  UNION ALL SELECT doc_id, 'P', 1,
        |   unnest(list_filter(list_transform(str_split(text, chr(10) || chr(10)), x -> trim(x)), x -> x <> '')) FROM base
        |  UNION ALL SELECT doc_id, 'g1', 1, unnest(s) FROM base
        |  UNION ALL SELECT doc_id, 'g2', 2, unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) FROM base
        |  UNION ALL SELECT doc_id, 'g3', 3, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s) - 1)]) FROM base
        |  UNION ALL SELECT doc_id, 'g4', 4, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2] || ' ' || s[i+3] for i in range(1, len(s) - 2)]) FROM base
        |  UNION ALL SELECT doc_id, 'g5', 5, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2] || ' ' || s[i+3] || ' ' || s[i+4] for i in range(1, len(s) - 3)]) FROM base
        |  UNION ALL SELECT doc_id, 'g6', 6, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2] || ' ' || s[i+3] || ' ' || s[i+4] || ' ' || s[i+5] for i in range(1, len(s) - 4)]) FROM base
        |  UNION ALL SELECT doc_id, 'g7', 7, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2] || ' ' || s[i+3] || ' ' || s[i+4] || ' ' || s[i+5] || ' ' || s[i+6] for i in range(1, len(s) - 5)]) FROM base
        |  UNION ALL SELECT doc_id, 'g8', 8, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2] || ' ' || s[i+3] || ' ' || s[i+4] || ' ' || s[i+5] || ' ' || s[i+6] || ' ' || s[i+7] for i in range(1, len(s) - 6)]) FROM base
        |  UNION ALL SELECT doc_id, 'g9', 9, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2] || ' ' || s[i+3] || ' ' || s[i+4] || ' ' || s[i+5] || ' ' || s[i+6] || ' ' || s[i+7] || ' ' || s[i+8] for i in range(1, len(s) - 7)]) FROM base
        |  UNION ALL SELECT doc_id, 'g10', 10, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2] || ' ' || s[i+3] || ' ' || s[i+4] || ' ' || s[i+5] || ' ' || s[i+6] || ' ' || s[i+7] || ' ' || s[i+8] || ' ' || s[i+9] for i in range(1, len(s) - 8)]) FROM base),
        |counted AS (
        | SELECT doc_id, kind, item, count(*) AS cnt, length(item) - (n - 1) AS chars
        | FROM items GROUP BY doc_id, kind, item, n),
        |perkind AS (
        | SELECT doc_id, kind,
        |  CAST(sum(cnt) AS BIGINT) AS total,
        |  CAST(sum(cnt) - count(*) AS BIGINT) AS dups,
        |  CAST(sum(cnt * chars) AS BIGINT) AS total_chars,
        |  CAST(sum(CASE WHEN cnt > 1 THEN (cnt - 1) * chars ELSE 0 END) AS BIGINT) AS dup_chars,
        |  CAST(max({'c': cnt, 'm': cnt * chars}).m AS BIGINT) AS top_mass
        | FROM counted GROUP BY doc_id, kind),
        |piv AS (
        | SELECT b.doc_id,
        |  coalesce(max(CASE WHEN kind = 'g1' THEN total END), 0) AS n_words,
        |  coalesce(max(CASE WHEN kind = 'g1' THEN total_chars END), 0) AS n_word_chars,
        |  coalesce(max(CASE WHEN kind = 'L' THEN total END), 0) AS n_lines,
        |  coalesce(max(CASE WHEN kind = 'L' THEN dups END), 0) AS n_dup_lines,
        |  coalesce(max(CASE WHEN kind = 'L' THEN total_chars END), 0) AS n_line_chars,
        |  coalesce(max(CASE WHEN kind = 'L' THEN dup_chars END), 0) AS n_dup_line_chars,
        |  coalesce(max(CASE WHEN kind = 'P' THEN total END), 0) AS n_paras,
        |  coalesce(max(CASE WHEN kind = 'P' THEN dups END), 0) AS n_dup_paras,
        |  coalesce(max(CASE WHEN kind = 'P' THEN total_chars END), 0) AS n_para_chars,
        |  coalesce(max(CASE WHEN kind = 'P' THEN dup_chars END), 0) AS n_dup_para_chars,
        |  coalesce(max(CASE WHEN kind = 'g2' THEN top_mass END), 0) AS top_2gram_chars,
        |  coalesce(max(CASE WHEN kind = 'g3' THEN top_mass END), 0) AS top_3gram_chars,
        |  coalesce(max(CASE WHEN kind = 'g4' THEN top_mass END), 0) AS top_4gram_chars,
        |  coalesce(max(CASE WHEN kind = 'g5' THEN dup_chars END), 0) AS dup_5gram_chars,
        |  coalesce(max(CASE WHEN kind = 'g6' THEN dup_chars END), 0) AS dup_6gram_chars,
        |  coalesce(max(CASE WHEN kind = 'g7' THEN dup_chars END), 0) AS dup_7gram_chars,
        |  coalesce(max(CASE WHEN kind = 'g8' THEN dup_chars END), 0) AS dup_8gram_chars,
        |  coalesce(max(CASE WHEN kind = 'g9' THEN dup_chars END), 0) AS dup_9gram_chars,
        |  coalesce(max(CASE WHEN kind = 'g10' THEN dup_chars END), 0) AS dup_10gram_chars
        | FROM base b LEFT JOIN perkind p USING (doc_id) GROUP BY b.doc_id)
        |SELECT doc_id,
        | CAST(n_words AS BIGINT) AS n_words,
        | CAST(n_word_chars AS BIGINT) AS n_word_chars,
        | CAST(n_lines AS BIGINT) AS n_lines,
        | CAST(n_dup_lines AS BIGINT) AS n_dup_lines,
        | CAST(n_line_chars AS BIGINT) AS n_line_chars,
        | CAST(n_dup_line_chars AS BIGINT) AS n_dup_line_chars,
        | CAST(n_paras AS BIGINT) AS n_paras,
        | CAST(n_dup_paras AS BIGINT) AS n_dup_paras,
        | CAST(n_para_chars AS BIGINT) AS n_para_chars,
        | CAST(n_dup_para_chars AS BIGINT) AS n_dup_para_chars,
        | CAST(top_2gram_chars AS BIGINT) AS top_2gram_chars,
        | CAST(top_3gram_chars AS BIGINT) AS top_3gram_chars,
        | CAST(top_4gram_chars AS BIGINT) AS top_4gram_chars,
        | CAST(dup_5gram_chars AS BIGINT) AS dup_5gram_chars,
        | CAST(dup_6gram_chars AS BIGINT) AS dup_6gram_chars,
        | CAST(dup_7gram_chars AS BIGINT) AS dup_7gram_chars,
        | CAST(dup_8gram_chars AS BIGINT) AS dup_8gram_chars,
        | CAST(dup_9gram_chars AS BIGINT) AS dup_9gram_chars,
        | CAST(dup_10gram_chars AS BIGINT) AS dup_10gram_chars,
        | CASE WHEN n_words > 0
        |      AND n_dup_lines * 10 <= n_lines * 3
        |      AND n_dup_paras * 10 <= n_paras * 3
        |      AND n_dup_line_chars * 5 <= n_line_chars
        |      AND n_dup_para_chars * 5 <= n_para_chars
        |      AND top_2gram_chars * 5 <= n_word_chars
        |      AND top_3gram_chars * 50 <= n_word_chars * 9
        |      AND top_4gram_chars * 25 <= n_word_chars * 4
        |      AND dup_5gram_chars * 20 <= n_word_chars * 3
        |      AND dup_6gram_chars * 50 <= n_word_chars * 7
        |      AND dup_7gram_chars * 100 <= n_word_chars * 13
        |      AND dup_8gram_chars * 25 <= n_word_chars * 3
        |      AND dup_9gram_chars * 100 <= n_word_chars * 11
        |      AND dup_10gram_chars * 10 <= n_word_chars
        |      THEN 1 ELSE 0 END AS passes_repetition
        |FROM piv""".stripMargin,
    "c4_line_filter" ->
      """WITH k AS (SELECT doc_id, text,
        |  list_filter(list_transform(str_split(text, chr(10)), x -> trim(x)),
        |    x -> regexp_matches(x, '[.!?"]$')
        |         AND len(regexp_split_to_array(x, '\s+')) >= 5
        |         AND NOT contains(lower(x), 'javascript')) AS kept,
        |  len(str_split(text, chr(10))) AS n_lines
        | FROM documents)
        |SELECT doc_id,
        | array_to_string(kept, chr(10)) AS clean_text,
        | n_lines,
        | len(kept) AS n_lines_kept,
        | CASE WHEN len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]')) >= 3
        |      AND NOT contains(lower(text), 'lorem ipsum')
        |      AND NOT contains(text, '{') THEN 1 ELSE 0 END AS keep_doc
        |FROM k""".stripMargin,
    "bigram_fluency" -> Queries.bigramFluencySql,
    "bigram_fluency_incremental" -> Queries.bigramFluencyIncrementalSql,
    "rare_tokens" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        | FROM documents),
        |dt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY doc_id, tok),
        |lm AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS freq FROM dt GROUP BY tok),
        |agg AS (SELECT dt.doc_id,
        |         CAST(sum(dt.tf) AS BIGINT) AS n_tokens,
        |         CAST(count(*) AS BIGINT) AS n_distinct_tokens,
        |         CAST(sum(CASE WHEN lm.freq < 3 THEN dt.tf ELSE 0 END) AS BIGINT)
        |           AS n_rare_tokens
        |        FROM dt JOIN lm USING (tok) GROUP BY dt.doc_id)
        |SELECT d.doc_id,
        | coalesce(a.n_tokens, 0) AS n_tokens,
        | coalesce(a.n_distinct_tokens, 0) AS n_distinct_tokens,
        | coalesce(a.n_rare_tokens, 0) AS n_rare_tokens,
        | CASE WHEN coalesce(a.n_tokens, 0) > 0
        |       AND coalesce(a.n_rare_tokens, 0) * 5 <= coalesce(a.n_tokens, 0)
        |      THEN 1 ELSE 0 END AS passes_rarity
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin,
    "rare_tokens_incremental" ->
      """WITH tokc AS (SELECT doc_id,
        |  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        | FROM documents),
        |dtb AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |        FROM tokc WHERE doc_id % 10 = 0 GROUP BY doc_id, tok),
        |lm AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq
        |       FROM tokc WHERE doc_id % 10 <> 0 GROUP BY tok),
        |agg AS (SELECT dtb.doc_id,
        |         CAST(sum(dtb.tf) AS BIGINT) AS n_tokens,
        |         CAST(count(*) AS BIGINT) AS n_distinct_tokens,
        |         CAST(sum(CASE WHEN coalesce(lm.freq, 0) < 3
        |                       THEN dtb.tf ELSE 0 END) AS BIGINT) AS n_rare_tokens
        |        FROM dtb LEFT JOIN lm USING (tok) GROUP BY dtb.doc_id)
        |SELECT d.doc_id,
        | coalesce(a.n_tokens, 0) AS n_tokens,
        | coalesce(a.n_distinct_tokens, 0) AS n_distinct_tokens,
        | coalesce(a.n_rare_tokens, 0) AS n_rare_tokens,
        | CASE WHEN coalesce(a.n_tokens, 0) > 0
        |       AND coalesce(a.n_rare_tokens, 0) * 5 <= coalesce(a.n_tokens, 0)
        |      THEN 1 ELSE 0 END AS passes_rarity
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
        |LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin,
    "column_profile" ->
      """WITH ranked AS (
        | SELECT 'doc_id' AS c, CAST(doc_id AS DOUBLE) AS v,
        |  row_number() OVER (ORDER BY doc_id) AS rn,
        |  count(*) OVER () AS nn
        | FROM documents WHERE doc_id IS NOT NULL
        | UNION ALL
        | SELECT 'n_chars', CAST(n_chars AS DOUBLE),
        |  row_number() OVER (ORDER BY n_chars),
        |  count(*) OVER ()
        | FROM documents WHERE n_chars IS NOT NULL),
        |med AS (
        | SELECT c AS column_name,
        |  MAX(CASE WHEN rn = CEIL(0.25 * nn) THEN v END) AS p25_value,
        |  MAX(CASE WHEN rn = CEIL(0.5 * nn) THEN v END) AS median_value,
        |  MAX(CASE WHEN rn = CEIL(0.75 * nn) THEN v END) AS p75_value,
        |  MAX(CASE WHEN rn = CEIL(0.95 * nn) THEN v END) AS p95_value
        | FROM ranked GROUP BY c),
        |base AS (
        | SELECT 'doc_id' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(doc_id) AS BIGINT) AS n_nonnull,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
        |  CAST(min(doc_id) AS VARCHAR) AS min_value,
        |  CAST(max(doc_id) AS VARCHAR) AS max_value
        | FROM documents
        | UNION ALL
        | SELECT 'lang', CAST(count(*) AS BIGINT), CAST(count(lang) AS BIGINT),
        |  CAST(count(DISTINCT lang) AS BIGINT),
        |  CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
        | FROM documents
        | UNION ALL
        | SELECT 'source', CAST(count(*) AS BIGINT), CAST(count(source) AS BIGINT),
        |  CAST(count(DISTINCT source) AS BIGINT),
        |  CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        | FROM documents
        | UNION ALL
        | SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(count(n_chars) AS BIGINT),
        |  CAST(count(DISTINCT n_chars) AS BIGINT),
        |  CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        | FROM documents)
        |SELECT base.column_name, n_rows, n_nonnull, n_distinct, min_value,
        | max_value, med.p25_value, med.median_value, med.p75_value,
        | med.p95_value
        |FROM base LEFT JOIN med ON base.column_name = med.column_name""".stripMargin,
    "corpus_profile" ->
      """WITH stats AS (SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        | FROM documents GROUP BY lang),
        |r AS (SELECT lang, CAST(n_chars AS BIGINT) AS n_chars,
        |  row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn
        | FROM documents)
        |SELECT s.lang, s.n_docs, s.total_chars, s.min_chars, s.max_chars,
        | m.n_chars AS median_chars
        |FROM stats s
        |JOIN r m ON m.lang = s.lang AND m.rn = (s.n_docs + 1) // 2""".stripMargin,
    "bm25_topk" -> Queries.bm25TopKSql,
    "bm25_incremental" -> Queries.bm25IncrementalSql,
    "bm25_view_refresh" -> Queries.bm25ViewRefreshSql,
    "bm25_view_delete" -> Queries.bm25ViewDeleteSql,
    "stream_bm25_view" -> Queries.streamBm25ViewSql,
    "bm25_view_bulk_delete" -> Queries.bm25ViewBulkDeleteSql,
    "multi_view_refresh" -> Queries.multiViewRefreshSql,
    "view_maintenance" -> Queries.viewMaintenanceSql,
    "view_time_travel" -> Queries.viewTimeTravelSql,
    "lm_view_refresh" -> Queries.lmViewRefreshSql,
    "stream_lm_view" -> Queries.streamLmViewSql,
    "neardup_view_refresh" -> Queries.neardupViewRefreshSql,
    "semantic_view_refresh" -> Queries.semanticViewRefreshSql,
    "benchmark_view_refresh" -> Queries.benchmarkViewRefreshSql,
    "phrase_view_refresh" -> Queries.phraseViewRefreshSql,
    "view_retention" -> Queries.viewRetentionSql,
    "ann_view_refresh" -> Queries.annViewRefreshSql,
    "ann_view_reinit" -> Queries.annViewReinitSql,
    "phrase_search" -> Queries.phraseSearchSql,
    "cascade_rerank" -> Queries.cascadeRerankSql,
    "cooccurrence_pmi" -> Queries.cooccurrenceSql,
    "hybrid_search" -> Queries.hybridSearchSql,
    "hybrid_search_indexed" -> Queries.hybridSearchIndexedSql,
    "hybrid_view_search" -> Queries.hybridViewSearchSql,
    "collocations_topk" -> Queries.collocationsSql,
    "cohort_retention" -> Queries.cohortRetentionSql,
    "resample_locf" -> Queries.resampleSql,
    "tfidf_keywords" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        | FROM documents),
        |dt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY doc_id, tok),
        |dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY tok),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |s AS (SELECT dt.doc_id, dt.tok, dt.tf, dfreq.df,
        |       CAST(dt.tf * n.n_docs AS DOUBLE) / dfreq.df AS score,
        |       row_number() OVER (PARTITION BY dt.doc_id
        |         ORDER BY CAST(dt.tf * n.n_docs AS DOUBLE) / dfreq.df DESC,
        |                  dt.tok) AS kw_rank
        |      FROM dt JOIN dfreq USING (tok) CROSS JOIN n)
        |SELECT doc_id, kw_rank, tok, tf, df, score FROM s WHERE kw_rank <= 3""".stripMargin,
    "normalize_text" ->
      """WITH c AS (SELECT doc_id, length(text) AS n_chars_raw,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(text,
        |      '\t', ' ', 'g'),
        |      '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
        |    '  +', ' ', 'g'),
        |    ' *\n *', '\n', 'g'),
        |    '\n\n\n+', '\n\n', 'g'),
        |    '^[ \n]+|[ \n]+$', '', 'g') AS clean_text
        | FROM documents)
        |SELECT doc_id, clean_text, n_chars_raw,
        | length(clean_text) AS n_chars_clean
        |FROM c""".stripMargin,
    "mixture_sample" -> Queries.mixtureSampleDocsSql,
    "temperature_quotas" -> Queries.temperatureQuotasDocsSql,
    "quantile_sketch" -> Queries.quantileSketchDocsSql,
    "stream_quantiles" -> Queries.streamQuantilesSql,
    "temperature_mixture" -> Queries.temperatureMixtureDocsSql,
    "training_order" -> Queries.trainingOrderDocsSql,
    "dedup_paragraphs" ->
      """WITH p AS (SELECT doc_id,
        |  unnest(str_split(text, chr(10))) AS para,
        |  unnest(range(len(str_split(text, chr(10))))) AS para_idx
        | FROM documents),
        |k AS (SELECT doc_id, para_idx, para,
        |  (trim(para) = '' OR row_number() OVER (
        |     PARTITION BY md5(trim(para)) ORDER BY doc_id, para_idx) = 1) AS keep
        | FROM p)
        |SELECT doc_id,
        | coalesce(array_to_string(list(para ORDER BY para_idx) FILTER (WHERE keep), chr(10)), '') AS clean_text,
        | CAST(count(*) AS BIGINT) AS n_paras,
        | CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_paras_kept
        |FROM k GROUP BY doc_id""".stripMargin,
    "repetition_signals" ->
      """SELECT doc_id,
        | len(str_split(text, chr(10))) AS n_lines,
        | len(list_distinct(str_split(text, chr(10)))) AS n_distinct_lines,
        | GREATEST(len(s) - 1, 0) AS n_word_2grams,
        | len(list_distinct([s[i] || ' ' || s[i+1] for i in range(1, len(s))])) AS n_distinct_2grams
        |FROM (SELECT doc_id, text,
        |      regexp_extract_all(lower(text), '[a-z0-9]+') AS s FROM documents)""".stripMargin,
    // dedup_minhash: Spark generates candidates with MinHash-LSH then
    // verifies with EXACT jaccard, so the result equals the oracle's
    // all-pairs answer (oracle may go quadratic; the engine must not).
    "dedup_minhash" ->
      """WITH d AS (SELECT doc_id,
        |  list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
        |                 for i in range(1, len(s)-1)]) AS sh
        | FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS s
        |       FROM documents)),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  len(list_intersect(a.sh, b.sh))::DOUBLE /
        |  len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        | FROM d a JOIN d b ON a.doc_id < b.doc_id)
        |SELECT id1, id2, jaccard FROM p WHERE jaccard >= 0.8""".stripMargin,
    // dedup_ngram: prefix filtering is EXACT at any threshold, so the
    // all-pairs oracle at 0.7 must match row-for-row (at 0.7 an LSH
    // method could not make this guarantee — that's the point)
    "dedup_ngram" ->
      """WITH d AS (SELECT doc_id,
        |  list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
        |                 for i in range(1, len(s)-1)]) AS sh
        | FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS s
        |       FROM documents)),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  len(list_intersect(a.sh, b.sh))::DOUBLE /
        |  len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        | FROM d a JOIN d b ON a.doc_id < b.doc_id WHERE len(a.sh) > 0 AND len(b.sh) > 0)
        |SELECT id1, id2, jaccard FROM p WHERE jaccard >= 0.7""".stripMargin,
    "dedup_near_corpus" ->
      """WITH d AS (SELECT doc_id,
        |  list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
        |                 for i in range(1, len(s)-1)]) AS sh
        | FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS s
        |       FROM documents)),
        |losers AS (SELECT DISTINCT b.doc_id AS doc_id
        | FROM d a JOIN d b ON a.doc_id < b.doc_id
        | WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
        |       len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8)
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,
    "dedup_near_best" ->
      """WITH RECURSIVE d AS (SELECT doc_id,
        |  list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
        |                 for i in range(1, len(s)-1)]) AS sh
        | FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS s
        |       FROM documents)),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2
        | FROM d a JOIN d b ON a.doc_id < b.doc_id
        | WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
        |       len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
        |e AS (SELECT id1 AS a, id2 AS b FROM p
        |      UNION SELECT id2, id1 FROM p),
        |reach(s, t) AS (SELECT a, b FROM e
        | UNION SELECT r.s, e.b FROM reach r JOIN e ON r.t = e.a),
        |root AS (SELECT s AS doc_id,
        |  LEAST(s, MIN(t)) AS comp FROM reach GROUP BY s)
        |SELECT doc_id, lang FROM (
        | SELECT dd.doc_id, dd.lang,
        |  ROW_NUMBER() OVER (PARTITION BY r.comp
        |   ORDER BY dd.n_chars DESC, dd.doc_id ASC) AS rn
        | FROM documents dd JOIN root r ON dd.doc_id = r.doc_id)
        |WHERE rn = 1
        |UNION ALL
        |SELECT doc_id, lang FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM root)""".stripMargin,
    "knn_bruteforce" ->
      """SELECT query_id, rank, neighbor_id FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |            c.vec_id ASC) AS rank
        | FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        | WHERE q.vec_id < 20)
        |WHERE rank <= 10""".stripMargin,
    "embedding_neardup" ->
      """SELECT vec_id AS id1, vec_id + 10000 AS id2
        |FROM embeddings WHERE vec_id < 50""".stripMargin,
    // all three formerly-rows-only queries now carry hard oracles:
    // ann_topk via planted exact copies (provable top-1) + an in-query
    // recall gate; simhash via full DuckDB recomputation (md5 token
    // hashes) + all-pairs hamming; multimodal via byte-function payloads
    "ann_topk" -> Queries.annTopKSql,
    "ann_ivf" -> Queries.ivfTopKSql,
    "ann_pq" -> Queries.pqTopKSql,
    "ann_sq8" -> Queries.sq8TopKSql,
    "ann_ivfpq" -> Queries.ivfPqTopKSql,
    "ann_ivfpq_incremental" -> Queries.ivfPqIncrementalSql,
    "semantic_dedup" -> Queries.semanticDedupSql,
    "semantic_dedup_incremental" -> Queries.semanticDedupIncrementalSql,
    "simhash_neardup" -> Queries.simhashPairsSql,
    "corpus_clean" -> Queries.corpusCleanSql,
    "multimodal_decode" -> Queries.multimodalDecodeSql)
}
