package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.functions._
import graft.sources.SinkQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` keys follow SURVEY.md §2's operator inventory verbatim;
  * every key with a DuckDB-expressible equivalent also appears in
  * `oracleSql` (same column names/aliases on both sides — the driver
  * sorts columns by name and hash-compares values). Keys absent from
  * `oracleSql` get the weaker rows-only check and are covered by
  * ScalaTest/ScalaCheck specs instead (SURVEY.md §5.2).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan → filter → project → aggregate → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.aggGroupSum(spark, "/root/testdata/sf0.001")

  /** Serialize an `array<long>` signature column to a CSV string for the
    * driver comparator (it sorts rows by every column before hashing;
    * array columns are unhashable there).
    */
  private def sigAsCsv(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(col("source"),
      array_join(transform(col("corpus_sig"), _.cast("string")), ",")
        .as("corpus_sig"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.A scans / sources / sinks
    "scan_parquet" -> (Relational.scanParquet _),
    "scan_projection_pushdown" -> (Relational.scanProjectionPushdown _),
    "preview" -> (Relational.preview _),
    "sink_parquet" -> (SinkQueries.sinkParquet _),
    "sink_partitioned" -> (SinkQueries.sinkPartitioned _),
    // read-side partition pruning: the predicate resolves against
    // directory names at planning time (PartitionFilters, plan-pinned
    // in PlanShapeSpec) — the #1 cost lever on a partitioned lake
    "scan_partition_prune" -> (SinkQueries.scanPartitionPrune _),
    "sink_append" -> (SinkQueries.sinkAppend _),
    "sink_replace_partition" -> (SinkQueries.sinkReplacePartition _),
    "sink_schema_evolution" -> (SinkQueries.sinkSchemaEvolution _),
    "sink_zorder" -> (SinkQueries.sinkZorder _),
    "sink_compact" -> (SinkQueries.sinkCompact _),
    "lake_history" -> (SinkQueries.lakeHistory _),
    "lake_report" -> (SinkQueries.lakeReport _),
    "lake_report_counts" -> (SinkQueries.lakeReportCounts _),
    "lake_time_travel" -> (SinkQueries.lakeTimeTravel _),
    "lake_vacuum" -> (SinkQueries.lakeVacuum _),
    // clone-aware retention: a vacuum that would delete a version
    // pinned by a live shallow-clone manifest refuses atomically;
    // deleting the clone releases the pin and the vacuum proceeds
    "lake_vacuum_safe" -> (SinkQueries.lakeVacuumSafe _),
    // CDF retention coordination, hash-gated: dropped commits' _cdf
    // reaps with them, the persistent commit log keeps refusing a
    // range spanning the vacuumed (uncaptured) commit, and the
    // retained tail keeps serving its churn-sized feed
    "lake_vacuum_cdf" -> (SinkQueries.lakeVacuumCdf _),
    // history spanning schemas: pinned old versions read ALIGNED to
    // the head schema (typed null fill), raw version meta untouched;
    // diff/merge refuse drifted inputs instead of dropping columns
    "lake_schema_evolution" -> (SinkQueries.lakeSchemaEvolution _),
    "lake_changes" -> (SinkQueries.lakeChanges _),
    "lake_restore" -> (SinkQueries.lakeRestore _),
    // rollback WITH write-time capture: restoreVersionCdf publishes the
    // undo as a captured commit — the declared output is the (2, 3]
    // feed a replica would consume to follow the rollback
    "lake_restore_cdf" -> (SinkQueries.lakeRestoreCdf _),
    // dev-branch composition: zero-copy clone + the branch's OWN
    // forward write + the source's independent write — four pinned
    // snapshots, two divergent chains, no cross-chain leakage
    "lake_branch" -> (SinkQueries.lakeBranch _),
    // the branch workflow's second half: keyed three-way merge of the
    // diverged branch back into its source (base = the cloned version)
    // with a declared destination-wins conflict policy; the merged
    // snapshot publishes as the source's next version and the output
    // reads it back by pin, stamped with the conflict count
    "lake_merge_branch" -> (SinkQueries.lakeMergeBranch _),
    // write-time CDF capture: per-commit change files land beside each
    // version; the captured feed attributes rows to THEIR commit —
    // the fidelity lake_changes' snapshot diff cannot provide
    "lake_write_cdf" -> (SinkQueries.lakeWriteCdf _),
    // zero-copy shallow clone: manifest-only version dir pinning the
    // source's v0; immune to the source's later writes
    "lake_clone" -> (SinkQueries.lakeClone _),
    "lake_apply_changes" -> (SinkQueries.lakeApplyChanges _),
    "dedup_incremental_cdf" -> (SinkQueries.dedupIncrementalCdf _),
    "merge_upsert" -> (SinkQueries.mergeUpsert _),
    "merge_scd2" -> (SinkQueries.mergeScd2 _),
    "join_bucketed" -> (SinkQueries.joinBucketed _),
    "source_csv" -> (SinkQueries.sourceCsv _),
    "source_json" -> (SinkQueries.sourceJson _),
    "source_orc" -> (SinkQueries.sourceOrc _),
    "source_xml" -> (SinkQueries.sourceXml _),
    "source_text" -> (SinkQueries.sourceText _),
    "source_binary" -> (SinkQueries.sourceBinary _),
    "source_json_corrupt" -> (SinkQueries.sourceJsonCorrupt _),
    "table_meta" -> (SinkQueries.tableMeta _),
    "table_meta_types" -> (SinkQueries.tableMetaTypes _),
    "list_tables" -> (SinkQueries.listTables _),
    // oracle shadow of list_tables: catalog listing restricted to the
    // fixture views (independent of saveAsTable process state)
    "list_tables_fixture" -> (SinkQueries.listTablesFixture _),
    // §2.B projection / filter
    "project_arith" -> (Relational.projectArith _),
    "filter_conj" -> (Relational.filterConj _),
    "filter_in_between_like" -> (Relational.filterInBetweenLike _),
    "project_distinct" -> (Relational.projectDistinct _),
    "filter_subquery_in" -> (Relational.filterSubqueryIn _),
    "filter_not_in_null" -> (Relational.filterNotInNull _),
    "filter_exists" -> (Relational.filterExists _),
    "scalar_subquery" -> (Relational.scalarSubquery _),
    "join_lateral" -> (Relational.joinLateral _),
    // §2.C joins
    "join_inner_hash" -> (Joins.joinInnerHash _),
    "join_broadcast" -> (Joins.joinBroadcast _),
    "join_left_outer" -> (Joins.joinLeftOuter _),
    "join_right_outer" -> (Joins.joinRightOuter _),
    "join_full_outer" -> (Joins.joinFullOuter _),
    "join_semi" -> (Joins.joinSemi _),
    "join_anti" -> (Joins.joinAnti _),
    "join_cross" -> (Joins.joinCross _),
    "join_theta_range" -> (Joins.joinThetaRange _),
    "join_asof" -> (Joins.joinAsOf _),
    "join_asof_forward" -> (Joins.joinAsOfForward _),
    "join_asof_tolerance" -> ((s: SparkSession, d: String) =>
      Joins.joinAsOfTolerance(s, d)),
    "join_asof_nearest" -> (Joins.joinAsOfNearest _),
    "join_asof_split" -> ((s: SparkSession, d: String) =>
      Joins.joinAsOfSplit(s, d)),
    "join_fuzzy" -> ((s: SparkSession, d: String) =>
      Joins.joinFuzzy(s, d)),
    "join_null_safe" -> (Joins.joinNullSafe _),
    "fn_url" -> (ScalarFns.fnUrl _),
    "fn_geo" -> (ScalarFns.fnGeo _),
    "join_spatial_grid" -> ((s: SparkSession, d: String) =>
      Joins.joinSpatialGrid(s, d)),
    "join_point_in_polygon" -> (Joins.joinPointInPolygon _),
    "join_polygon_grid" -> (Joins.joinPolygonGrid _),
    "stream_static_join" -> (EventWindows.streamStaticJoinBatch _),
    // full DSv2 connector (graft.sources.SynthDocsSource): deterministic
    // generation means the DuckDB oracle regenerates the identical
    // corpus from range() — the connector's output is hash-matched
    "multimodal_dedup" -> (Multimodal.dedupAssets _),
    "multimodal_phash" -> ((s: SparkSession, d: String) =>
      Multimodal.phashPairs(s, d)),
    "multimodal_phash_incremental" -> ((s: SparkSession, d: String) =>
      Multimodal.phashIncremental(s, d)),
    // video-tier near-dup: per-frame dHash signatures (row-local frame
    // windows — blobs never shuffle), lossless banded frame matching,
    // exact-integer bidirectional containment >= 1/2
    "multimodal_video_dedup" -> ((s: SparkSession, d: String) =>
      Multimodal.multimodalVideoDedup(s, d)),
    // audio-tier near-dup: per-frame Haitsma–Kalker sub-fingerprints
    // (band-gradient × time-derivative bits across consecutive
    // overlapping windows — row-local), lossless banded frame
    // matching, exact-integer bidirectional containment >= 1/2
    "multimodal_audio_dedup" -> ((s: SparkSession, d: String) =>
      Multimodal.multimodalAudioDedup(s, d)),
    // candidates shadow: every band-colliding frame pair with its exact
    // Hamming distance (no threshold) — non-vacuous at every SF where
    // the thresholded row legitimately finds nothing
    "multimodal_audio_dedup_cand" -> ((s: SparkSession, d: String) =>
      Multimodal.multimodalAudioDedupCand(s, d)),
    // daily-crawl forms at the signature-set tiers: delta clips drop on
    // bidirectional containment vs the store or a smaller-id delta —
    // the phash-incremental seen-store contract lifted to frame SETS
    "multimodal_video_dedup_incremental" -> ((s: SparkSession, d: String) =>
      Multimodal.videoDedupIncremental(s, d)),
    "multimodal_audio_dedup_incremental" -> ((s: SparkSession, d: String) =>
      Multimodal.audioDedupIncremental(s, d)),
    "pipeline_curate" -> ((s: SparkSession, d: String) =>
      TextOps.pipelineCurate(s, d)),
    "win_range_interval" -> (Windows.winRangeInterval _),
    "win_groups_frame" -> (Windows.winGroupsFrame _),
    "source_custom" -> ((s: SparkSession, d: String) =>
      s.read.format("graft-synth")
        .option("rows", "1000").option("partitions", "8").load()
        .filter(org.apache.spark.sql.functions.col("doc_id") >= 100 &&
          org.apache.spark.sql.functions.col("doc_id") < 600)
        .orderBy("doc_id")),
    "join_skew_salted" -> (Joins.joinSkewSalted _),
    "join_multiway" -> (Joins.joinMultiway _),
    "join_interval_overlap" -> (Joins.joinIntervalOverlap _),
    // TPC-H-shaped composite macro queries (VERDICT r7 #2) — multi-join
    // + agg + top-k composed on one plan; see operators/MacroQueries
    "q_shaped_q3" -> (MacroQueries.qShapedQ3 _),
    "q_shaped_q5" -> (MacroQueries.qShapedQ5 _),
    "q_shaped_q4" -> (MacroQueries.qShapedQ4 _),
    "q_shaped_q7" -> (MacroQueries.qShapedQ7 _),
    "q_shaped_q14" -> (MacroQueries.qShapedQ14 _),
    "q_shaped_q22" -> (MacroQueries.qShapedQ22 _),
    "q_shaped_q10" -> (MacroQueries.qShapedQ10 _),
    "q_shaped_q18" -> (MacroQueries.qShapedQ18 _),
    "q_shaped_q21" -> (MacroQueries.qShapedQ21 _),
    "q_shaped_q8" -> (MacroQueries.qShapedQ8 _),
    "q_shaped_q13" -> (MacroQueries.qShapedQ13 _),
    "q_shaped_q15" -> (MacroQueries.qShapedQ15 _),
    "q_shaped_q17" -> (MacroQueries.qShapedQ17 _),
    "q_shaped_q19" -> (MacroQueries.qShapedQ19 _),
    // §2.D aggregations
    "agg_group_sum" -> (Aggregates.aggGroupSum _),
    "agg_count_distinct" -> (Aggregates.aggCountDistinct _),
    "agg_approx_distinct" -> (Aggregates.aggApproxDistinct _),
    "agg_approx_distinct_ok" -> (Aggregates.aggApproxDistinctOk _),
    "agg_rollup" -> (Aggregates.aggRollup _),
    "agg_grouping_fn" -> (Aggregates.aggGroupingFn _),
    "agg_cube" -> (Aggregates.aggCube _),
    "agg_grouping_sets" -> (Aggregates.aggGroupingSets _),
    "agg_having" -> (Aggregates.aggHaving _),
    "agg_stats" -> (Aggregates.aggStats _),
    "agg_histogram" -> (Aggregates.aggHistogram _),
    "agg_mode_median" -> (Aggregates.aggModeMedian _),
    "agg_conditional" -> (Aggregates.aggConditional _),
    "agg_pivot" -> (Aggregates.aggPivot _),
    "agg_unpivot" -> (Aggregates.aggUnpivot _),
    "agg_percentile" -> (Aggregates.aggPercentile _),
    "agg_approx_percentile" -> (Aggregates.aggApproxPercentile _),
    "agg_approx_percentile_ok" -> (Aggregates.aggApproxPercentileOk _),
    "agg_map_agg" -> (Aggregates.aggMapAgg _),
    "agg_argmax" -> (Aggregates.aggArgMax _),
    "agg_hll_rollup" -> (Aggregates.aggHllRollup _),
    "agg_bitmap_rollup" -> (Aggregates.aggBitmapRollup _),
    "agg_theta_sketch" -> (Aggregates.aggThetaSketch _),
    "table_stats" -> (Aggregates.tableStats _),
    "table_stats_approx" -> (Aggregates.tableStatsApprox _),
    "dq_checks" -> (Aggregates.dqChecks _),
    // row-level expectations with quarantine (the DLT/GE shape): the
    // violating ROWS with sorted violated-rule labels, one scan
    "dq_quarantine" -> (Aggregates.dqQuarantine _),
    "dq_drift" -> (Aggregates.dqDrift _),
    // the freshness pillar: per-series last event + whole-hour lag
    // behind the corpus max, stale flag past 48h
    "dq_freshness" -> ((s: SparkSession, d: String) =>
      Aggregates.dqFreshness(s, d)),
    "agg_corr" -> (Aggregates.aggCorr _),
    "agg_filter_clause" -> (Aggregates.aggFilterClause _),
    "sample_weighted" -> ((s: SparkSession, d: String) =>
      Aggregates.sampleWeighted(s, d)),
    "event_path" -> (EventWindows.eventPath _),
    // MATCH_RECOGNIZE-style pattern counts over per-user code strings
    // (lazy-regex automaton scan, identical Java/RE2 semantics)
    "event_pattern" -> (EventWindows.eventPattern _),
    "event_pattern_sessioned" -> ((s: SparkSession, d: String) =>
      EventWindows.eventPatternSessioned(s, d)),
    "agg_collect" -> (Aggregates.aggCollect _),
    "agg_listagg" -> (Aggregates.aggListagg _),
    "agg_sortagg" -> (Aggregates.aggSortAgg _),
    // §2.E windows
    "win_rank" -> (Windows.winRank _),
    "win_named_sql" -> (Windows.winNamedSql _),
    "win_lag_lead" -> (Windows.winLagLead _),
    "win_running" -> (Windows.winRunning _),
    "win_moving_avg" -> (Windows.winMovingAvg _),
    "win_first_last" -> (Windows.winFirstLast _),
    "win_distribution" -> (Windows.winDistribution _),
    "win_range_frame" -> (Windows.winRangeFrame _),
    "win_ignore_nulls" -> (Windows.winIgnoreNulls _),
    "win_nth" -> (Windows.winNth _),
    "topk_per_group" -> (Windows.topkPerGroup _),
    // §2.F sort / limit
    "sort_multikey" -> (Relational.sortMultikey _),
    "limit_topk" -> (Relational.limitTopk _),
    // §2.G set ops
    "set_union_all" -> (Relational.setUnionAll _),
    "set_union_distinct" -> (Relational.setUnionDistinct _),
    "set_intersect" -> (Relational.setIntersect _),
    "set_intersect_all" -> (Relational.setIntersectAll _),
    "set_except" -> (Relational.setExcept _),
    "set_except_all" -> (Relational.setExceptAll _),
    "set_union_by_name" -> (Relational.setUnionByNameQuery _),
    // §2.H scalar function families
    "fn_string" -> (ScalarFns.fnString _),
    "fn_string2" -> (ScalarFns.fnString2 _),
    "fn_array_hof" -> (ScalarFns.fnArrayHof _),
    "fn_explode_outer" -> (ScalarFns.fnExplodeOuter _),
    "fn_tz" -> (ScalarFns.fnTz _),
    "fn_try" -> (ScalarFns.fnTry _),
    // Presto/Athena function-name shims, exercised through raw SQL —
    // the novlake Lake.query migration surface (round 12)
    "fn_presto_compat" -> (ScalarFns.fnPrestoCompat _),
    "fn_pad_trim" -> (ScalarFns.fnPadTrim _),
    "fn_date" -> (ScalarFns.fnDate _),
    "fn_math" -> (ScalarFns.fnMath _),
    "fn_cond" -> (ScalarFns.fnCond _),
    "fn_bitwise" -> (ScalarFns.fnBitwise _),
    "fn_regex" -> (ScalarFns.fnRegex _),
    "fn_interval" -> (ScalarFns.fnInterval _),
    "sample_hash" -> ((s: SparkSession, d: String) => ScalarFns.sampleHash(s, d)),
    // leakage-free train/val/test: split key = md5 of NORMALIZED
    // CONTENT, so exact dups can never straddle a split boundary
    "sample_split" -> (ScalarFns.sampleSplit _),
    "fn_array" -> (ScalarFns.fnArray _),
    "fn_json" -> (ScalarFns.fnJson _),
    "fn_variant" -> (ScalarFns.fnVariant _),
    "fn_map" -> (ScalarFns.fnMap _),
    "fn_hash" -> (ScalarFns.fnHash _),
    "fn_hash_md5" -> (ScalarFns.fnHashMd5 _),
    // cardinality/value shadow of fn_hash (sha256 cross-engine,
    // xxhash64/crc32 by distinct-count — ScalarFns.fnHashProps notes)
    "fn_hash_props" -> (ScalarFns.fnHashProps _),
    // §2.I streaming (batch-equivalent forms; incremental forms in
    // graft.streaming.Streams, MemoryStream-tested)
    "stream_tumbling" -> (EventWindows.tumbling _),
    "stream_sliding" -> (EventWindows.sliding _),
    "stream_session" -> (EventWindows.sessionize _),
    "stream_dedup" -> (EventWindows.dedupEvents _),
    "stream_anomaly" -> (EventWindows.streamAnomalyBatch _),
    "stream_watermark_late_ok" -> (graft.streaming.Streams.watermarkLateOk _),
    "stream_sink_ok" -> (graft.streaming.Streams.streamSinkOk _),
    "stream_join" -> (EventWindows.streamJoinBatch _),
    "stream_join_outer" -> (EventWindows.streamJoinOuterBatch _),
    "stream_join_full" -> (EventWindows.streamJoinFullBatch _),
    "stream_join_semi" -> (EventWindows.streamJoinSemiBatch _),
    "ts_anomaly" -> (EventWindows.tsAnomaly _),
    // day-of-week seasonal means + deseasonalized residuals (STL-style
    // seasonal step; three keyed aggs/joins, no window)
    "ts_seasonal" -> (EventWindows.tsSeasonal _),
    // full additive decomposition (classical decompose / STL-lite):
    // trend = centered 7-day moving mean kept RATIONAL, seasonal =
    // weekday mean of exactly-detrended days (420 = lcm(1..7) clears
    // the denominators), residual = the rest; no mid-pipeline division
    "ts_stl" -> (EventWindows.tsStl _),
    // the periodicity DIAGNOSTIC: per-series ACF at lags 1..7 over the
    // daily series; exact integer sums (y = n·x − S clears the mean's
    // denominator), one division at the 6dp output boundary
    "ts_acf" -> ((s: SparkSession, d: String) =>
      EventWindows.tsAcf(s, d)),
    // Holt linear-trend smoothing: exact BIGINT fixed-point fold per
    // series (aggregate HOF), one-step-ahead prequential forecasts
    "ts_forecast" -> (EventWindows.tsForecast _),
    "ts_forecast_seasonal" -> (EventWindows.tsForecastSeasonal _),
    // Page's CUSUM level-shift detection: one keyed shuffle, the
    // mu/MAD/CUSUM recursion as three row-local integer HOF passes
    "ts_changepoint" -> (EventWindows.tsChangepoint _),
    // day-over-day binned-histogram KS per event series (dq_drift made
    // prequential); streaming form in Streams.driftScores
    "ts_drift" -> (EventWindows.tsDrift _),
    // the streaming form as a declared hash-gated row (real
    // transformWithState replay + sentinel; shares ts_drift's oracle)
    "stream_drift_ok" -> (graft.streaming.Streams.streamDriftOk _),
    // the streaming Page-CUSUM monitor, driver-gated: real replay
    // through ChangepointProcessor, oracle = the recursive CTE with
    // the reference window pinned to the online refDays = 7
    "stream_changepoint_ok" ->
      (graft.streaming.Streams.streamChangepointOk _),
    // the streaming Holt-Winters monitor, driver-gated: real replay
    // through HoltWintersProcessor, oracle = ts_forecast_seasonal's
    // recursive CTE verbatim
    "stream_forecast_ok" ->
      (graft.streaming.Streams.streamForecastOk _),
    // the streaming temporal (as-of) join, driver-gated: real replay
    // through AsofProcessor on the shared mux; oracle = the batch
    // as-of window formulation
    "stream_join_asof_ok" ->
      (graft.streaming.Streams.streamJoinAsofOk _),
    // the timer-closed sessionizer, driver-gated: real replay through
    // SessionTimerProcessor on the shared mux; oracle = the batch
    // gap-and-island islands without the session_id rank
    "stream_session_ok" ->
      (graft.streaming.Streams.streamSessionOk _),
    "ts_gapfill" -> (EventWindows.tsGapfill _),
    "ts_resample" -> (EventWindows.tsResample _),
    "ts_interpolate" -> (EventWindows.tsInterpolate _),
    "event_funnel" -> (EventWindows.eventFunnel _),
    "event_attribution" -> ((s: SparkSession, d: String) =>
      EventWindows.eventAttribution(s, d)),
    "retention_cohort" -> (EventWindows.retentionCohort _),
    "stream_stateful" -> (EventWindows.statefulRunningTotal _),
    "stream_state_ttl" -> (EventWindows.stateTtlBatch _),
    // §2.J UDF / UDAF / UDTF
    "udf_scalar" -> (Udfs.udfScalar _),
    "udtf_generator" -> (Udfs.udtfGenerator _),
    // corpus_sig is array<long> for library callers; the declared query
    // serializes it to CSV — the driver comparator can't sort/hash array
    // columns even for the rows-only check (VERDICT r1 #1).
    "udaf_typed" -> ((s: SparkSession, d: String) =>
      sigAsCsv(Udfs.corpusSignature(s, d))),
    "udaf_imperative" -> ((s: SparkSession, d: String) =>
      sigAsCsv(Udfs.corpusSignatureImperative(s, d))),
    // oracle shadow of the two above: group-key set, contributing-doc
    // cardinality, signature width, typed≡imperative — everything but
    // the engine-hash values themselves (Udfs.udafShape notes)
    "udaf_typed_shape" -> ((s: SparkSession, d: String) =>
      Udfs.udafShape(s, d)),
    "udaf_topk" -> ((s: SparkSession, d: String) => Udfs.topkHeap(s, d)),
    "expr_custom" -> (SimSearch.exprCustom _),
    // the whole-operator custom-plan surface: logical node + strategy +
    // physical exec (bounded per-group heaps), via GraftExtensions
    "plan_custom_topk" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      GraftExtensions.install(s)
      graft.plans.PlanOps.topKPerGroup(
        graft.sources.Tables.orders(s, d),
        Seq("o_orderpriority"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("o_orderpriority").asc, col("o_totalprice").desc,
          col("o_orderkey").asc)
    }),
    // §2.K LLM-data-pipeline operators
    "dedup_exact" -> (TextOps.dedupExact _),
    "dedup_minhash" -> ((s: SparkSession, d: String) => MinHashDedup.dedupMinhash(s, d)),
    "dedup_minhash_incremental" -> ((s: SparkSession, d: String) =>
      MinHashDedup.dedupMinhashIncremental(s, d)),
    // the STREAMING twin: 2-micro-batch file replay through the
    // band-bucket-keyed BandDedupProcessor (RocksDB ListState), gated
    // on the SAME oracle as the batch operator
    "stream_dedup_minhash_ok" -> ((s: SparkSession, d: String) =>
      graft.streaming.Streams.streamDedupMinhashOk(s, d)),
    // NEAR-DUP decontamination: corpus bands join BROADCAST benchmark
    // bands cross-set (no self-join anywhere); exact-Jaccard verify on
    // candidates; benchMod=19 so planted dups cross the split at all SFs
    "decontaminate_minhash" -> ((s: SparkSession, d: String) =>
      MinHashDedup.decontaminateMinhash(s, d)),
    "dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => MinHashDedup.ngramJaccard(s, d)),
    "dedup_span" -> ((s: SparkSession, d: String) =>
      MinHashDedup.dedupSpan(s, d)),
    "agg_minhash_union" -> ((s: SparkSession, d: String) =>
      MinHashDedup.aggMinhashUnion(s, d)),
    "dedup_span_mask" -> ((s: SparkSession, d: String) =>
      MinHashDedup.dedupSpanMask(s, d)),
    // directional containment — the sub-document-duplication signal
    // Jaccard misses; a third view of the memoized similarity pass
    "dedup_containment" -> ((s: SparkSession, d: String) =>
      MinHashDedup.ngramContainment(s, d)),
    "dedup_cluster" -> ((s: SparkSession, d: String) => MinHashDedup.dedupCluster(s, d)),
    "dedup_cluster_stats" -> ((s: SparkSession, d: String) =>
      MinHashDedup.dedupClusterStats(s, d)),
    "dedup_simhash" -> (MinHashDedup.simhash _),
    // shadow of dedup_simhash (VERDICT r2 #8): the fingerprints are
    // engine-specific xxhash64 values, but WHICH docs get one is not —
    // the id set hash-matches the oracle, cross-checking cardinality
    "dedup_simhash_ids" -> ((s: SparkSession, d: String) =>
      MinHashDedup.simhash(s, d).select("doc_id")),
    // LSH candidates + exact cosine verify at recall-first banding
    // (12 bands × 4 bits: per-pair miss ≈ 2e-6 even for pairs exactly at
    // the 0.95 threshold, so the result equals the exact operator's and
    // the all-pairs oracle hash-matches — while the plan stays a keyed
    // equi-join, never a product join; VERDICT r2 #2). The exact
    // cartesian form survives as the spec-only cross-check
    // (SimSearch.dedupEmbeddingExact, DedupSpec agreement tests).
    // carryVectors=false: shallow bands collide often, so the pair set
    // dedups as bare ids and the vectors re-attach by keyed join —
    // the cheap-shuffle strategy for recall-first banding
    "dedup_embedding" -> ((s: SparkSession, d: String) =>
      SimSearch.dedupEmbeddingLsh(s, d, threshold = 0.95,
        nBits = 48, nBands = 12, carryVectors = false)),
    // SemDeDup: k-means-bucketed semantic dedup — cell-local pair
    // search + keep-lowest-id survivors (stride codebook, oracled)
    "dedup_semantic" -> ((s: SparkSession, d: String) =>
      SimSearch.semDedup(s, d)),
    // SemDeDup's daily-crawl form: yesterday's codebook + persisted
    // cell index, delta-only assignment, seen-store drop rule
    "dedup_semantic_incremental" -> ((s: SparkSession, d: String) =>
      SimSearch.semDedupIncremental(s, d)),
    // chunk-granular SemDeDup: doc_chunking -> deterministic stub
    // chunk embeddings -> the doc tier's cent_id-keyed near-dup;
    // catches copied passages a whole-doc embedding averages away
    "dedup_semantic_chunk" -> ((s: SparkSession, d: String) =>
      SimSearch.semDedupChunk(s, d)),
    // the STREAMING twin: 2-micro-batch file replay through the
    // cent_id-keyed SemanticDedupProcessor (RocksDB ListState, pinned
    // store codebook), gated on the SAME oracle as the batch operator
    "stream_dedup_semantic_ok" -> ((s: SparkSession, d: String) =>
      graft.streaming.Streams.streamDedupSemanticOk(s, d)),
    // the perceptual tier's streaming twin (fourth and last): banded
    // 8-byte fingerprints into the seen-store bucket processor,
    // lossless at Hamming<=3 — gated on the exact all-pairs oracle
    "stream_dedup_phash_ok" -> ((s: SparkSession, d: String) =>
      graft.streaming.Streams.streamDedupPhashOk(s, d)),
    // the write-time CDF consumed as a STREAM: commit-per-micro-batch
    // file replay through a foreachBatch replica fold (replayChanges,
    // commit-ordered even within a merged batch) — the final replica
    // must BE the v2 snapshot the oracle recomputes from orders
    "stream_cdf_apply_ok" -> ((s: SparkSession, d: String) =>
      graft.streaming.Streams.streamCdfApplyOk(s, d)),
    // the PRODUCER half of the streaming lake story: churn micro-
    // batches fold into a versioned table through a version-fenced
    // foreachBatch → saveVersionCdf commit loop (at-least-once replays
    // skip on the fence), and the declared output is the produced
    // table's OWN captured feed — gated on lake_write_cdf's oracle
    // verbatim
    "stream_write_cdf_ok" -> ((s: SparkSession, d: String) =>
      graft.streaming.Streams.streamWriteCdfOk(s, d)),
    // streaming ingest into the persisted vector index: delta vectors
    // encode at ingest under the PINNED store quantizers (foreachBatch,
    // row-local) and append into the cent_id layout — gated on the
    // simsearch_index_incremental oracle verbatim
    "stream_index_append_ok" -> ((s: SparkSession, d: String) =>
      graft.streaming.Streams.streamIndexAppendOk(s, d)),
    // production-default banding (deeper bands → ~linear candidate set;
    // recall tunes per corpus); no oracle (xxhash64-derived hyperplanes
    // aren't DuckDB-expressible) — agreement with the exact operator is
    // spec-asserted in DedupSpec
    "dedup_embedding_lsh" -> ((s: SparkSession, d: String) => SimSearch.dedupEmbeddingLsh(s, d)),
    // candidates shadow of dedup_embedding_lsh: threshold −1 keeps EVERY
    // band-colliding pair with its exact cosine, so the banding itself
    // (bucket bits, band split, self-join, verify arithmetic) is
    // hash-matched non-vacuously — at sf0.01 no pair clears 0.95, which
    // would make the thresholded oracle a vacuous 0=0 (VERDICT r4 #2)
    "dedup_embedding_lsh_cand" -> ((s: SparkSession, d: String) =>
      SimSearch.dedupEmbeddingLsh(s, d, threshold = -1.0)),
    "simsearch_knn" -> ((s: SparkSession, d: String) => SimSearch.knnBruteForce(s, d)),
    // radius (range) search — the other half of the vector-store read
    // API (FAISS range_search): every neighbor above minSim, no rank
    // window at all (the radius test is a row-local filter)
    "simsearch_range" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchRange(s, d)),
    // range search at ANN scale: IVF cell probe bounds candidates,
    // radius filters them — always a subset of the exact operator
    "simsearch_range_ivf" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchRangeIvf(s, d)),
    "simsearch_lsh" -> ((s: SparkSession, d: String) => SimSearch.simsearchLsh(s, d)),
    "simsearch_ivf" -> ((s: SparkSession, d: String) => SimSearch.simsearchIvf(s, d)),
    "ann_recall" -> ((s: SparkSession, d: String) => SimSearch.annRecall(s, d)),
    "simsearch_hybrid" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchHybrid(s, d)),
    "simsearch_hybrid_ivf" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchHybridIvf(s, d)),
    // product-quantized ANN: per-subspace codes + broadcast lookup
    // table — the vector-compression half of a production index
    // two-stage retrieval: PQ shortlist (nCand=20) -> keyed full-vector
    // fetch -> exact-cosine re-rank (ADC + refine)
    "simsearch_rerank" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchRerank(s, d)),
    // metadata-filtered ANN, PRE-filter order: the attribute predicate
    // (candidate label = query label) is a join key, pruning candidates
    // before any distance math — exact over the qualifying subset
    "simsearch_filtered" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchFiltered(s, d)),
    // filtered search at ANN scale: (cent_id, label) as a compound
    // broadcast-hash-join key — IVF cell prune × attribute prune in one
    "simsearch_filtered_ivf" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchFilteredIvf(s, d)),
    // LEARNED codebook as a declared path: deterministic integer Lloyd
    // (1e-6-unit quantization, exact Long argmin-L2, floorDiv updates)
    // — the oracle recomputes the same 5 iterations in unrolled CTEs
    "simsearch_ivf_kmeans" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchIvfKmeans(s, d)),
    // OPQ-family deterministic rotation: exact permutation 27i mod 64
    // spreads subspace energy; everything downstream is simsearch_pq
    "simsearch_pq_rotated" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchPqRotated(s, d)),
    "simsearch_opq_pca" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchOpqPca(s, d)),
    "simsearch_pq" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchPq(s, d)),
    // IVF cell pruning + PQ lookup scoring — the FAISS IVFPQ read path;
    // closes simsearch_pq's corpus-sized rank window
    "simsearch_ivfpq" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchIvfPq(s, d)),
    // the index-as-artifact round trip: encode once → parquet
    // partitioned by cent_id → serve from the artifact only (dynamic
    // partition pruning on the probed cells; no embedding re-read)
    "simsearch_index_persisted" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchIndexPersisted(s, d)),
    // daily-delta index maintenance: yesterday's pinned codebooks,
    // delta-only encode, pure APPEND into the partitioned artifact
    // (re-learning the quantizers = a reindex event, never a batch)
    "simsearch_index_incremental" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchIndexIncremental(s, d)),
    // the remove side of the lifecycle: tombstone-mask artifact,
    // serve-time anti-join after the cell probe — the index files are
    // never rewritten (FAISS remove_ids' lazy form)
    "simsearch_index_delete" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchIndexDelete(s, d)),
    // the compaction event the tombstone design defers: rewrite the
    // index with the mask applied, retire the mask, serve with NO
    // anti-join — gated on the delete oracle verbatim
    "simsearch_index_compact" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchIndexCompact(s, d)),
    // the rebuild trigger: cell-population drift (exact-integer KS +
    // total variation) of the current corpus vs the build-time store
    // under the PINNED quantizer — tv over threshold schedules reindex
    "simsearch_index_health" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchIndexHealth(s, d)),
    // acting on the verdict: planted exact drift (abs-copy corpus —
    // the positive-orthant fold, matching the oracle's list_transform
    // (embedding, x -> abs(x)); abs is float-exact like negation)
    // crosses the tv threshold; the codebook re-learns on the drifted
    // corpus, the rebuilt index persists + serves, and BOTH indexes are
    // judged per-query against exact KNN (the ann_recall machinery) —
    // closing the lifecycle loop: create → append → delete → compact →
    // health → REBUILD
    "simsearch_index_rebuild" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchIndexRebuild(s, d)),
    // the post-rebuild serve calibration: sweep nProbe on the rebuilt
    // index and pick (integer-gated, oracle-rederivable) the smallest
    // setting recovering the old index's recall, declaring recall AND
    // candidates-scanned for every setting — the decision the rebuild
    // row's honest recall dip leaves open
    "simsearch_index_rebuild_tuned" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchIndexRebuildTuned(s, d)),
    // graph-structured ANN (r19): banded-LSH-built bounded-degree
    // neighbor graph, greedy beam-search serve, judged vs IVF at
    // matched scan cost by the exact-KNN harness
    "simsearch_graph" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchGraph(s, d)),
    // graph-index maintenance (the lifecycle family): delta ingest
    // with reverse linking + re-prune, provably == the batch graph
    "simsearch_graph_incremental" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchGraphIncremental(s, d)),
    // graph-index deletion: tombstones masked at emit, waypoints kept
    "simsearch_graph_delete" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchGraphDelete(s, d)),
    // predicate-filtered graph search: unfiltered walk, label at emit
    "simsearch_graph_filtered" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchGraphFiltered(s, d)),
    // the graph as a persisted artifact: build once, serve from store
    "simsearch_graph_persisted" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchGraphPersisted(s, d)),
    // residual encoding (FAISS's default): PQ codes quantize
    // x − coarse(cell) via the ResidualNearestCentroidSlice kernel;
    // score = per-(q,cell) coarse dot + m residual lookups
    "simsearch_ivfpq_residual" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchIvfPqResidual(s, d)),
    "simsearch_hybrid_lsh" -> ((s: SparkSession, d: String) =>
      SimSearch.simsearchHybridLsh(s, d)),
    "text_stats" -> (TextOps.textStats _),
    "token_count" -> (TextOps.tokenCount _),
    "text_tfidf" -> (TextOps.textTfIdf _),
    "quality_filter" -> (TextOps.qualityFilter _),
    "lang_id" -> (TextOps.langId _),
    "text_normalize" -> (TextOps.textNormalize _),
    "pii_scrub" -> (TextOps.piiScrub _),
    "pack_sequences" -> ((s: SparkSession, d: String) => TextOps.packSequences(s, d)),
    "doc_chunking" -> ((s: SparkSession, d: String) => TextOps.docChunk(s, d)),
    "embedding_quantize" -> (SimSearch.embeddingQuantize _),
    // one-pass d×d covariance via the custom TypedImperativeAggregate
    // (the distributed-PCA moments step)
    "embedding_covariance" -> ((s: SparkSession, d: String) =>
      SimSearch.embeddingCovariance(s, d)),
    // the embeddings dataset card: counts, zero vectors, norm stats,
    // extreme-variance dims — one pass through the moments aggregate
    "embedding_report" -> ((s: SparkSession, d: String) =>
      SimSearch.embeddingReport(s, d)),
    // top principal direction: same moments pass + exact fixed-point
    // power iteration solved in-task (graph_pagerank discipline)
    "embedding_pca" -> ((s: SparkSession, d: String) =>
      SimSearch.embeddingPca(s, d)),
    // row-local exact projection onto the learned direction
    "embedding_pca_project" -> ((s: SparkSession, d: String) =>
      SimSearch.embeddingPcaProject(s, d)),
    "sample_stratified" -> (TextOps.sampleStratified _),
    // round-3 pipeline additions
    "decontaminate" -> ((s: SparkSession, d: String) =>
      TextOps.decontaminate(s, d)),
    "decontaminate_bloom" -> ((s: SparkSession, d: String) =>
      TextOps.decontaminateBloom(s, d)),
    "dedup_url" -> (TextOps.dedupUrl _),
    "pipeline_curate_v2" -> ((s: SparkSession, d: String) =>
      TextOps.pipelineCurateV2(s, d)),
    "pipeline_curate_v3" -> ((s: SparkSession, d: String) =>
      TextOps.pipelineCurateV3(s, d)),
    // the daily-update capstone: near-dup incremental dedup against the
    // signature store, then the standing curation chain on the delta
    "pipeline_curate_v4" -> ((s: SparkSession, d: String) =>
      TextOps.pipelineCurateV4(s, d)),
    // the RELEASE-PREP capstone: quality gate → exact dedup → NEAR-DUP
    // decontamination → content-keyed split → train-only epoch
    // upsampling — one row per shipped sequence source
    "pipeline_curate_v5" -> ((s: SparkSession, d: String) =>
      TextOps.pipelineCurateV5(s, d)),
    // the INCREMENTAL-DAY capstone (r19): the corpus is a versioned
    // CDF lake table, each day curates its CAPTURED churn against the
    // previous version as seen-store, and the budget mix re-balances
    // the curated corpus to date — day∘day ≡ batch (PipelineSpec law)
    "pipeline_curate_v6" -> ((s: SparkSession, d: String) =>
      TextOps.pipelineCurateV6(s, d)),
    // the DELETES day: takedowns propagate through the captured feed
    // into the shipped set (seen-store deliberately unretracted)
    "pipeline_takedown" -> ((s: SparkSession, d: String) =>
      TextOps.pipelineTakedown(s, d)),
    "repetition_score" -> (TextOps.repetitionScore _),
    "quality_classifier" -> (TextOps.qualityClassifier _),
    "vocab_topk" -> ((s: SparkSession, d: String) => TextOps.vocabTopk(s, d)),
    "vocab_topk_approx" -> ((s: SparkSession, d: String) =>
      TextOps.vocabTopkApprox(s, d)),
    "dedup_incremental" -> (TextOps.dedupIncremental _),
    "ngram_lm" -> ((s: SparkSession, d: String) => TextOps.ngramLm(s, d)),
    "ngram_pmi" -> ((s: SparkSession, d: String) => TextOps.ngramPmi(s, d)),
    "mix_budget" -> ((s: SparkSession, d: String) => TextOps.mixBudget(s, d)),
    "mix_budget_approx" -> ((s: SparkSession, d: String) =>
      TextOps.mixBudgetApprox(s, d)),
    "mix_weighted" -> ((s: SparkSession, d: String) =>
      TextOps.mixWeighted(s, d)),
    // fractional-epoch UP-sampling (the GPT-3/LLaMA mixture-table
    // form): floor(e) copies per doc + one more on an id-keyed md5
    // coin under frac(e) — the only mix op that repeats rather than
    // subsets; row-local explode, no shuffle
    "mix_epochs" -> ((s: SparkSession, d: String) =>
      TextOps.mixEpochs(s, d)),
    // mixture weights derived from the corpus (n^0.5 smoothing), same
    // bucket-pruned prefix selection
    "mix_temperature" -> ((s: SparkSession, d: String) =>
      TextOps.mixTemperature(s, d)),
    // curriculum schedule: CCNet tercile phase + md5-prefix within-
    // phase order, riding the memoized lm-score pass
    "mix_curriculum" -> (TextOps.mixCurriculum _),
    // dataset-card rollup: one GROUPING SETS pass over the corpus
    "corpus_report" -> (TextOps.corpusReport _),
    // the windowless scale sibling: cutoff phases on boundary-safe
    // docs (quality_lm_bucket_approx precedent), same schedule shape
    "mix_curriculum_approx" -> (TextOps.mixCurriculumApprox _),
    "graph_pagerank" -> ((s: SparkSession, d: String) =>
      GraphOps.graphPagerank(s, d)),
    // degree-oriented wedge triangle enumeration over the part
    // co-purchase graph (Suri & Vassilvitskii WWW'11 formulation)
    "graph_triangles" -> ((s: SparkSession, d: String) =>
      GraphOps.graphTriangles(s, d)),
    // connected components: hash-min label propagation to the FIXPOINT
    // (schedule-independent, so the oracle's transitive closure
    // computes the identical labels); corpus pays once, rounds are
    // graph-sized
    "graph_cc" -> ((s: SparkSession, d: String) =>
      GraphOps.graphCc(s, d)),
    "graph_sssp" -> ((s: SparkSession, d: String) =>
      GraphOps.graphSssp(s, d)),
    // seed-sampled closeness centrality: ONE multi-source BFS carrying
    // (vertex, seed) pairs over the shared edge memo; exact integer
    // seed counts + total hop distance, closeness = n/sum(d) at 4dp
    "graph_closeness" -> ((s: SparkSession, d: String) =>
      GraphOps.graphCloseness(s, d)),
    // seed-pair betweenness (Brandes–Pich pivot sampling, both
    // endpoints sampled so every σ comes from the ONE BFS): exact
    // integer σ level-DP, per-term 1e6-fixed-point floor, integer
    // sums; stress (Shimbel) declared alongside
    "graph_betweenness" -> ((s: SparkSession, d: String) =>
      GraphOps.graphBetweenness(s, d)),
    "graph_widest" -> ((s: SparkSession, d: String) =>
      GraphOps.graphWidest(s, d)),
    // community detection: 4 synchronous rounds of weighted label
    // propagation, tie rule (max summed co DESC, min label) — pinned
    // schedule, so the oracle unrolls the rounds as chained CTEs
    "graph_labelprop" -> ((s: SparkSession, d: String) =>
      GraphOps.graphLabelprop(s, d)),
    // density: 4 pinned synchronous peel sweeps to the k-core (k=3),
    // early-exiting at the monotone fixpoint; survivors + core degree
    "graph_kcore" -> ((s: SparkSession, d: String) =>
      GraphOps.graphKcore(s, d)),
    // item-item similarity: neighbor-set Jaccard via ONE wedge join
    // keyed on the shared neighbor (pair work bounded by sum deg^2)
    "graph_jaccard" -> ((s: SparkSession, d: String) =>
      GraphOps.graphJaccard(s, d)),
    // Watts-Strogatz local clustering coefficient: per-vertex closed
    // wedge fraction (wedge join keyed on the center + one edge join)
    "graph_clustcoef" -> ((s: SparkSession, d: String) =>
      GraphOps.graphClustcoef(s, d)),
    // the DISTRIBUTED formulation of the same arithmetic (unrolled keyed
    // joins over the cached edge aggregate) — the scale path for graphs
    // too large for one task, driver-gated on the same oracle (the
    // join_asof_split precedent, VERDICT r11 #3)
    "graph_pagerank_dist" -> ((s: SparkSession, d: String) =>
      GraphOps.graphPagerankUnrolled(s, d)),
    // word-level BPE merge training: k=8 iterations of pair-count →
    // deterministic argmax → greedy left-to-right merge; oracle unrolls
    // the iterations as chained CTEs (round 12)
    "bpe_train" -> ((s: SparkSession, d: String) =>
      BpeTrain.bpeTrain(s, d)),
    // the inference half: the corpus re-segmented by the trained merge
    // table (shares ONE memoized training with bpe_train)
    "bpe_encode" -> ((s: SparkSession, d: String) =>
      BpeTrain.bpeEncode(s, d)),
    // per-language fertility report: third view of the one training
    "bpe_fertility" -> ((s: SparkSession, d: String) =>
      BpeTrain.bpeFertility(s, d)),
    // the tokenize-and-pack capstone: the SAME memoized training →
    // per-doc BPE unit counts → pack_sequences' budget packing over
    // TOKENIZER units (the composition a real pipeline ships)
    "pipeline_tokenize" -> ((s: SparkSession, d: String) =>
      BpeTrain.pipelineTokenize(s, d)),
    // unigram-LM (SentencePiece-family) trainer: seeded candidates →
    // integer Viterbi EM → prune; oracle replays the DP as a recursive
    // CTE carrying (dp, back) lists
    "unigram_train" -> ((s: SparkSession, d: String) =>
      UnigramTrain.unigramTrain(s, d)),
    // per-language fertility under the unigram segmentation: second
    // view of the one memoized training
    "unigram_fertility" -> ((s: SparkSession, d: String) =>
      UnigramTrain.unigramFertility(s, d)),
    // the inference half: corpus re-segmented by the trained unigram
    // vocabulary (third view of the one training)
    "unigram_encode" -> ((s: SparkSession, d: String) =>
      UnigramTrain.unigramEncode(s, d)),
    // WordPiece (BERT-family) — the THIRD production tokenizer:
    // char-level merges over the distinct-word table scored by the
    // exact fixed-point likelihood ratio c_ab/(c_a*c_b); oracle
    // unrolls the k argmaxes as chained CTEs
    "wordpiece_train" -> ((s: SparkSession, d: String) =>
      WordpieceTrain.wordpieceTrain(s, d)),
    // the inference half: greedy longest-match-first (maximal munch —
    // NOT merge replay; WordpieceSpec plants the divergence) with ##
    // continuation marks
    "wordpiece_encode" -> ((s: SparkSession, d: String) =>
      WordpieceTrain.wordpieceEncode(s, d)),
    // per-language pieces-per-word under the greedy segmentation:
    // third view of the one memoized training
    "wordpiece_fertility" -> ((s: SparkSession, d: String) =>
      WordpieceTrain.wordpieceFertility(s, d)),
    "lm_doc_score" -> (TextOps.lmDocScore _),
    "quality_lm_bucket" -> (TextOps.qualityLmBucket _),
    // the approx-cutoff SCALE variant of quality_lm_bucket (no ntile
    // window — sketch cuts + row-local compare), oracled on the docs
    // provably away from the tercile boundaries (TextOps notes)
    "quality_lm_bucket_approx" -> ((s: SparkSession, d: String) =>
      TextOps.qualityLmBucketApprox(s, d)),
    "doc_fingerprint" -> (TextOps.docFingerprint _),
    // shadow of doc_fingerprint: hash values are engine-specific, but the
    // id set AND the per-doc gram count (max(nTok−k,0)+1, k=3) are exact
    // cross-engine — hash-matched against a DuckDB token count
    "doc_fingerprint_ids" -> ((s: SparkSession, d: String) =>
      TextOps.docFingerprint(s, d).select("doc_id", "n_grams")),
    // novlake's primary surface is `Lake.query(sql)` → Athena; this is
    // the same ANSI SQL executed by Catalyst over registered tables,
    // declared end-to-end (the DataFrame-API queries above cover the
    // operators; this covers the passthrough itself)
    // Spark 4 SQL pipe syntax: each |> stage is a plain relational op,
    // so the plan is identical to the classic form — the surface, not
    // the execution, is what's declared here
    "sql_pipe" -> ((s: SparkSession, d: String) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql(
        """FROM lineitem
          ||> WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          |         AND l_shipdate < TIMESTAMP '1998-01-01'
          ||> AGGREGATE
          |     CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
          |       AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          |     COUNT(1) AS n_items
          |   GROUP BY l_returnflag
          ||> ORDER BY l_returnflag ASC""".stripMargin)
    }),
    "agg_group_by_all" -> ((s: SparkSession, d: String) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
          |    AS sum_qty,
          |  COUNT(1) AS cnt
          |FROM lineitem
          |GROUP BY ALL
          |ORDER BY ALL""".stripMargin)
    }),
    // collation-aware equality (Spark 4 COLLATE): the UTF8_LCASE
    // comparison must match DuckDB's lower()-normalized equality
    "fn_collation" -> ((s: SparkSession, d: String) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql(
        """SELECT c_mktsegment,
          |  COUNT(1) AS n,
          |  COUNT(1) FILTER (
          |    WHERE c_mktsegment COLLATE UTF8_LCASE = 'building')
          |    AS n_building_ci,
          |  COUNT(1) FILTER (WHERE c_mktsegment = 'building')
          |    AS n_building_cs
          |FROM customer
          |GROUP BY c_mktsegment
          |ORDER BY c_mktsegment ASC""".stripMargin)
    }),
    "sql_passthrough" -> ((s: SparkSession, d: String) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql(
        """SELECT n_name, count(DISTINCT c.c_custkey) AS n_custs,
          |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
          |       AS DECIMAL(18,4))) AS DOUBLE) AS revenue
          |FROM customer c
          |JOIN orders o ON c.c_custkey = o.o_custkey
          |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          |JOIN nation n ON c.c_nationkey = n.n_nationkey
          |WHERE o.o_orderstatus = 'F'
          |GROUP BY n_name
          |ORDER BY n_name ASC""".stripMargin)
    }),
    // `WITH RECURSIVE` on the Spark SQL surface (VERDICT r3 #4 — the
    // last Presto/DuckDB SQL-surface item a Lake.query user could
    // type). Spark 4.1 supports UNION ALL recursion (UNION-distinct is
    // rejected: UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE, verified), so the
    // declared query is the classic hierarchy walk — each customer key
    // ascends its decimal-digit ancestor chain (parent = key div 10, a
    // synthetic but deterministic 10-ary hierarchy) until the root
    // digit. Depth grows with log10(|customer|): recursion actually
    // iterates (5 levels at sf0.1), and the per-iteration frame stays
    // |customer| rows — bounded, no cycle risk (node strictly
    // shrinks). The cyclic-graph closure form (path-guarded UNION ALL)
    // is spec-asserted ≡ dedupClusterDocs in DedupSpec.
    "sql_recursive_cte" -> ((s: SparkSession, d: String) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql(
        """WITH RECURSIVE up(c_custkey, node, depth) AS (
          |  SELECT c_custkey, c_custkey, 0 FROM customer
          |  UNION ALL
          |  SELECT c_custkey, node DIV 10, depth + 1 FROM up
          |  WHERE node >= 10
          |)
          |SELECT c_custkey, CAST(max(depth) AS BIGINT) AS hops,
          |       CAST(max_by(node, depth) AS BIGINT) AS root_digit
          |FROM up GROUP BY c_custkey
          |ORDER BY c_custkey ASC""".stripMargin)
    }),
    "multimodal_stats" -> (Multimodal.multimodalStats _),
    "multimodal_frames" -> (Multimodal.multimodalFrames _),
    "multimodal_resize" -> (Multimodal.multimodalResize _),
    "multimodal_schema" -> (Multimodal.multimodalSchema _)
  )

  // DuckDB-dialect equivalents. Shared SQL fragments:
  /** The quality_lm_bucket_approx oracle (boundary-safe approx
    * terciles) — shared verbatim by its own row and the
    * mix_curriculum_approx wrapper. */
  private lazy val qlbApproxSql: String =
    raw"""WITH $lmScoreCtes,
        |sc AS (SELECT lm.doc_id AS doc_id, documents.lang AS lang,
        |         lm.avg_logp AS avg_logp
        |       FROM lm JOIN documents ON lm.doc_id = documents.doc_id),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY lang
        |           ORDER BY avg_logp ASC, doc_id ASC) AS rk,
        |         count(*) OVER (PARTITION BY lang) AS n
        |       FROM sc),
        |bounds AS (SELECT lang, max(n) AS n,
        |    (3 + (max(n) // 10000))::INT AS w,
        |    round(max(n) / 3.0)::INT AS r1,
        |    round(max(n) * 2.0 / 3.0)::INT AS r2
        |  FROM rk GROUP BY lang),
        |iv AS (SELECT r.lang,
        |    min(CASE WHEN r.rk = greatest(1, b.r1 - b.w)
        |        THEN r.avg_logp END) AS lo1,
        |    min(CASE WHEN r.rk = least(b.n, b.r1 + b.w)
        |        THEN r.avg_logp END) AS hi1,
        |    min(CASE WHEN r.rk = greatest(1, b.r2 - b.w)
        |        THEN r.avg_logp END) AS lo2,
        |    min(CASE WHEN r.rk = least(b.n, b.r2 + b.w)
        |        THEN r.avg_logp END) AS hi2
        |  FROM rk r JOIN bounds b ON r.lang = b.lang GROUP BY r.lang),
        |cuts AS (SELECT lang, quantile_disc(avg_logp, 1.0/3) AS c1,
        |           quantile_disc(avg_logp, 2.0/3) AS c2
        |         FROM sc GROUP BY lang)
        |SELECT s.doc_id, s.lang, s.avg_logp,
        |  CASE WHEN s.avg_logp >= c.c2 THEN 'head'
        |       WHEN s.avg_logp >= c.c1 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM sc s JOIN iv i ON s.lang = i.lang
        |          JOIN cuts c ON s.lang = c.lang
        |WHERE NOT (s.avg_logp BETWEEN i.lo1 AND i.hi1)
        |  AND NOT (s.avg_logp BETWEEN i.lo2 AND i.hi2)
        |ORDER BY s.doc_id ASC""".stripMargin

  /** The ts_changepoint oracle, parameterized on the reference-window
    * expression: the declared batch row uses the adaptive
    * greatest(7, n/4); stream_changepoint_ok pins the online w = 7. */
  /** Shared by `ts_forecast_seasonal` and its streaming twin
    * `stream_forecast_ok` (same declared semantics, two engines).
    */
  private lazy val tsForecastSeasonalSql: String =
    """WITH RECURSIVE daily AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    (SUM(CAST(value AS DECIMAL(18,4))) * 10000)::BIGINT AS x
        |  FROM events GROUP BY 1, 2),
        |seq AS (SELECT event_type, day, x,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY day ASC) AS rn
        |  FROM daily),
        |sd AS (SELECT event_type, rn,
        |    list(x) OVER (PARTITION BY event_type ORDER BY rn
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS w
        |  FROM seq),
        |anchor AS (SELECT event_type, rn,
        |    CAST(list_sum(w) AS BIGINT) // 7 AS l,
        |    CAST(0 AS BIGINT) AS b,
        |    list_transform(w,
        |      v -> v - CAST(list_sum(w) AS BIGINT) // 7) AS s
        |  FROM sd WHERE rn = 7),
        |f AS (
        |  SELECT event_type, rn, CAST(NULL AS DATE) AS day,
        |    CAST(NULL AS BIGINT) AS x, l, b, s,
        |    CAST(NULL AS BIGINT) AS fc
        |  FROM anchor
        |  UNION ALL
        |  SELECT q.event_type, q.rn, q.day, q.x,
        |    (q.x - f.s[CAST((q.rn-1)%7+1 AS INT)] + f.l + f.b) // 2,
        |    (((q.x - f.s[CAST((q.rn-1)%7+1 AS INT)] + f.l + f.b) // 2)
        |      - f.l + f.b) // 2,
        |    list_transform(range(1, 8), j ->
        |      CASE WHEN j = (q.rn-1)%7+1
        |        THEN ((q.x - ((q.x - f.s[CAST((q.rn-1)%7+1 AS INT)]
        |                + f.l + f.b) // 2))
        |              + f.s[CAST((q.rn-1)%7+1 AS INT)]) // 2
        |        ELSE f.s[CAST(j AS INT)] END),
        |    f.l + f.b + f.s[CAST((q.rn-1)%7+1 AS INT)]
        |  FROM f JOIN seq q ON q.event_type = f.event_type
        |    AND q.rn = f.rn + 1)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |  round(x / 10000.0, 4) AS actual,
        |  round(fc / 10000.0, 4) AS forecast,
        |  round((x - fc) / 10000.0, 4) AS err
        |FROM f WHERE rn > 7
        |ORDER BY event_type ASC, day ASC""".stripMargin

  private def tsChangepointSql(wExpr: String,
      minDays: Int = 0): String =
    raw"""WITH RECURSIVE daily AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    (SUM(CAST(value AS DECIMAL(18,4))) * 10000)::BIGINT AS x
        |  FROM events d0
        |  WHERE (SELECT count(DISTINCT date_trunc('day', e2.ts))
        |         FROM events e2
        |         WHERE e2.event_type = d0.event_type) >= $minDays
        |  GROUP BY 1, 2),
        |seq AS (SELECT event_type, day, x,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY day ASC) AS rn
        |  FROM daily),
        |p0 AS (SELECT event_type, $wExpr AS w
        |  FROM daily GROUP BY 1),
        |p1 AS (SELECT s.event_type, SUM(s.x) // count(*) AS mu
        |  FROM seq s JOIN p0 USING (event_type)
        |  WHERE s.rn <= p0.w GROUP BY s.event_type),
        |p2 AS (SELECT s.event_type,
        |    SUM(abs(s.x - p1.mu)) // count(*) AS mad
        |  FROM seq s JOIN p0 USING (event_type)
        |    JOIN p1 ON p1.event_type = s.event_type
        |  WHERE s.rn <= p0.w GROUP BY s.event_type),
        |p3 AS (SELECT p1.event_type, p1.mu, p2.mad, p2.mad // 2 AS k
        |  FROM p1 JOIN p2 USING (event_type)),
        |f AS (
        |  SELECT s.event_type, s.day, s.x, s.rn,
        |    greatest(0, (s.x - p3.mu) - p3.k) AS sp,
        |    greatest(0, -(s.x - p3.mu) - p3.k) AS sn
        |  FROM seq s JOIN p3 USING (event_type) WHERE s.rn = 1
        |  UNION ALL
        |  SELECT s.event_type, s.day, s.x, s.rn,
        |    greatest(0, f.sp + (s.x - p3.mu) - p3.k),
        |    greatest(0, f.sn - (s.x - p3.mu) - p3.k)
        |  FROM f JOIN seq s ON s.event_type = f.event_type
        |    AND s.rn = f.rn + 1
        |  JOIN p3 ON p3.event_type = s.event_type)
        |SELECT f.event_type, strftime(f.day, '%Y-%m-%d') AS day,
        |  round(f.x / 10000.0, 4) AS day_value,
        |  round(f.sp / 10000.0, 4) AS cusum_pos,
        |  round(f.sn / 10000.0, 4) AS cusum_neg,
        |  (CASE WHEN f.sp > p3.mad * 5 OR f.sn > p3.mad * 5
        |        THEN 1 ELSE 0 END)::INT AS changepoint
        |FROM f JOIN p3 USING (event_type)
        |ORDER BY event_type ASC, day ASC""".stripMargin

  private val normT =
    raw"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

  /** Shared dHash CTE chain (`multimodal_phash` family): stub-decoded
    * codepoint pixels of qualified (>= 252-char) docs -> 63 segment
    * sums -> 62 gradient-sign bits packed into one BIGINT. Bits are
    * packed with an integer left shift (`1::BIGINT << i`), never pow():
    * DuckDB `**` is DOUBLE pow and loses low-bit precision above 2^53,
    * which would silently corrupt Hamming distances near the top bits.
    */
  private lazy val phashCtes: String =
    """WITH px AS (
      |  SELECT doc_id AS asset_id,
      |    list_transform(range(1, 253),
      |      j -> ord(substr(text, CAST(j AS INT), 1))) AS p
      |  FROM documents WHERE length(text) >= 252),
      |seg AS (
      |  SELECT asset_id,
      |    list_transform(range(0, 63), b -> CAST(list_sum(
      |      p[CAST(b*4+1 AS INT):CAST(b*4+4 AS INT)]) AS BIGINT)) AS s
      |  FROM px),
      |ph AS (
      |  SELECT asset_id, CAST(list_sum(list_transform(range(0, 62),
      |      i -> CASE WHEN s[CAST(i+1 AS INT)] > s[CAST(i+2 AS INT)]
      |                THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
      |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
      |  FROM seg)""".stripMargin

  /** Shared by `dedup_incremental` and `dedup_incremental_cdf` (the
    * CDF-fed form — same declared semantics, the delta derived from
    * LakeIO.changes instead of a hand-cut filter).
    */
  /** Shared CTE chain for the `multimodal_audio_dedup` family: audio
    * docs (doc_id % 3 = 1, ≥ 352 chars = ≥ 2 frames) → consecutive
    * (prev, cur) 252-char windows at stride 100 → 63 band energies per
    * window → Haitsma–Kalker difference-of-differences sign bits (the
    * band gradient of frame k vs frame k−1) packed with integer left
    * shifts → the distinct signature set `f` → the 4×16-bit banding
    * `bb`. Mirrors Multimodal.hkFingerprintExpr/audioFrames stage for
    * stage in exact integer arithmetic.
    */
  private lazy val audioHkCtes: String =
    """WITH af AS (
      |  SELECT doc_id AS asset_id,
      |    unnest(range(1,
      |      greatest((length(text) - 252) // 100 + 1, 1))) AS k,
      |    text
      |  FROM documents WHERE doc_id % 3 = 1 AND length(text) >= 352),
      |w AS (SELECT asset_id,
      |    substr(text, CAST((k-1)*100+1 AS INT), 252) AS wp,
      |    substr(text, CAST(k*100+1 AS INT), 252) AS wc FROM af),
      |px AS (SELECT asset_id,
      |    list_transform(range(1, 253),
      |      j -> ord(substr(wc, CAST(j AS INT), 1))) AS pc,
      |    list_transform(range(1, 253),
      |      j -> ord(substr(wp, CAST(j AS INT), 1))) AS pp
      |  FROM w),
      |seg AS (SELECT asset_id,
      |    list_transform(range(0, 63), b -> CAST(list_sum(
      |      pc[CAST(b*4+1 AS INT):CAST(b*4+4 AS INT)]) AS BIGINT)) AS sc,
      |    list_transform(range(0, 63), b -> CAST(list_sum(
      |      pp[CAST(b*4+1 AS INT):CAST(b*4+4 AS INT)]) AS BIGINT)) AS sp
      |  FROM px),
      |ph AS (SELECT asset_id, CAST(list_sum(list_transform(range(0, 62),
      |    i -> CASE WHEN (sc[CAST(i+1 AS INT)] - sc[CAST(i+2 AS INT)])
      |                 > (sp[CAST(i+1 AS INT)] - sp[CAST(i+2 AS INT)])
      |              THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
      |              ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS fph
      |  FROM seg),
      |f AS (SELECT DISTINCT asset_id, fph FROM ph),
      |b AS (SELECT asset_id, fph, unnest(range(0, 4)) AS band FROM f),
      |bb AS (SELECT asset_id, fph, band,
      |    (fph >> CAST(band*16 AS INT)) & 65535 AS bval FROM b)""".stripMargin

  /** Shared CTE chain for the `multimodal_video_dedup` family: video
    * docs (doc_id % 3 = 2, ≥ 252 chars) → 252-char frame windows at
    * stride 100 → per-frame dHash (the phashCtes integer arithmetic
    * over the window) → the distinct signature set `f` + sizes `sz` +
    * the 4×16-bit banding `bb`.
    */
  private lazy val videoFrameCtes: String =
    """WITH vf AS (
      |  SELECT doc_id AS asset_id,
      |    unnest(range(0,
      |      greatest((length(text) - 252) // 100 + 1, 0))) AS k,
      |    text
      |  FROM documents WHERE doc_id % 3 = 2 AND length(text) >= 252),
      |w AS (SELECT asset_id,
      |    substr(text, CAST(k*100+1 AS INT), 252) AS w FROM vf),
      |px AS (SELECT asset_id, list_transform(range(1, 253),
      |    j -> ord(substr(w, CAST(j AS INT), 1))) AS p FROM w),
      |seg AS (SELECT asset_id,
      |    list_transform(range(0, 63), b -> CAST(list_sum(
      |      p[CAST(b*4+1 AS INT):CAST(b*4+4 AS INT)]) AS BIGINT)) AS s
      |  FROM px),
      |ph AS (SELECT asset_id, CAST(list_sum(list_transform(range(0, 62),
      |    i -> CASE WHEN s[CAST(i+1 AS INT)] > s[CAST(i+2 AS INT)]
      |              THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
      |              ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS fph
      |  FROM seg),
      |f AS (SELECT DISTINCT asset_id, fph FROM ph),
      |sz AS (SELECT asset_id, count(*)::BIGINT AS n FROM f GROUP BY 1),
      |b AS (SELECT asset_id, fph, unnest(range(0, 4)) AS band FROM f),
      |bb AS (SELECT asset_id, fph, band,
      |    (fph >> CAST(band*16 AS INT)) & 65535 AS bval FROM b)""".stripMargin

  /** Seen-store incremental tail over a signature-set CTE chain
    * (expects `f`/`sz`/`bb` in scope): a delta clip (asset_id % 10 ≥
    * 8) drops iff it clears bidirectional containment 2m ≥ n at
    * Hamming ≤ 3 against ANY store clip or a smaller-id delta clip;
    * short (signature-less) delta clips survive by construction.
    */
  private def signatureIncrementalTail(daPredicate: String,
      mime: String): String =
    s""",
      |da AS (SELECT doc_id AS asset_id, '$mime' AS mime FROM documents
      |  WHERE $daPredicate AND doc_id % 10 >= 8),
      |m AS (SELECT DISTINCT nb.asset_id AS n_id, ob.asset_id AS o_id,
      |    nb.fph AS n_fph, ob.fph AS o_fph
      |  FROM bb nb JOIN bb ob
      |    ON nb.band = ob.band AND nb.bval = ob.bval
      |  WHERE nb.asset_id % 10 >= 8
      |    AND (ob.asset_id % 10 < 8
      |         OR (ob.asset_id % 10 >= 8 AND ob.asset_id < nb.asset_id))
      |    AND bit_count(xor(nb.fph, ob.fph)) <= 3),
      |dropped AS (SELECT DISTINCT n_id FROM (
      |    SELECT n_id, o_id,
      |      count(DISTINCT n_fph)::BIGINT AS m_n,
      |      count(DISTINCT o_fph)::BIGINT AS m_o
      |    FROM m GROUP BY 1, 2) mm
      |  JOIN sz sn ON mm.n_id = sn.asset_id
      |  JOIN sz so ON mm.o_id = so.asset_id
      |  WHERE 2*m_n >= sn.n AND 2*m_o >= so.n)
      |SELECT asset_id, mime FROM da
      |WHERE asset_id NOT IN (SELECT n_id FROM dropped)
      |ORDER BY asset_id ASC""".stripMargin

  /** Shared by `multimodal_phash_incremental` and its streaming twin
    * `stream_dedup_phash_ok` (the minhashIncrementalSql precedent):
    * delta assets drop iff Hamming ≤ 3 to ANY store asset or a
    * smaller-id delta asset — the exact all-pairs formulation (the
    * banding is lossless at this radius, so no recall caveat).
    */
  private lazy val phashIncrementalSql: String = phashCtes + """,
    |da AS (SELECT doc_id AS asset_id,
    |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
    |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
    |         ELSE 'video/mp4' END AS mime
    |  FROM documents WHERE doc_id % 10 >= 8),
    |dph AS (SELECT da.asset_id, da.mime, ph.phash
    |  FROM da LEFT JOIN ph ON ph.asset_id = da.asset_id),
    |matched AS (SELECT DISTINCT d.asset_id FROM dph d JOIN
    |    (SELECT asset_id, phash, FALSE AS dd FROM ph
    |       WHERE asset_id % 10 < 8
    |     UNION ALL
    |     SELECT asset_id, phash, TRUE FROM dph
    |       WHERE phash IS NOT NULL) o
    |  ON d.phash IS NOT NULL
    |    AND bit_count(xor(d.phash, o.phash)) <= 3
    |    AND (NOT o.dd OR o.asset_id < d.asset_id))
    |SELECT asset_id, mime FROM dph
    |WHERE asset_id NOT IN (SELECT asset_id FROM matched)
    |ORDER BY asset_id ASC""".stripMargin

  private lazy val dedupIncrementalSql: String =
    raw"""WITH e AS (SELECT DISTINCT md5($normT) AS h FROM documents
      |           WHERE doc_id % 10 < 8),
      |b AS (SELECT doc_id, lang, source, md5($normT) AS h FROM documents
      |      WHERE doc_id % 10 >= 8)
      |SELECT doc_id, lang, source FROM b
      |WHERE h NOT IN (SELECT h FROM e)
      |ORDER BY doc_id ASC""".stripMargin

  /** Shared by `dedup_minhash_incremental` and its streaming twin
    * `stream_dedup_minhash_ok` (same declared semantics, two engines).
    */
  private val minhashIncrementalSql: String =
    raw"""WITH d AS (SELECT doc_id,
        |    string_split($normT, ' ') AS toks
        |  FROM documents WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |s AS (SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(toks) - 3, 0) + 1),
        |    i -> array_to_string(toks[i+1:i+3], ' '))) AS sh FROM d),
        |tok AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |inter AS (SELECT n.doc_id AS n_id, o.doc_id AS o_id, count(*) AS ni
        |  FROM tok n JOIN tok o ON n.g = o.g
        |  WHERE n.doc_id % 10 >= 8
        |    AND (o.doc_id % 10 < 8
        |         OR (o.doc_id % 10 >= 8 AND o.doc_id < n.doc_id))
        |  GROUP BY 1, 2),
        |dropped AS (SELECT DISTINCT n_id FROM inter
        |  JOIN sizes sn ON n_id = sn.doc_id
        |  JOIN sizes so ON o_id = so.doc_id
        |  WHERE round(ni::DOUBLE / (sn.n::DOUBLE + so.n::DOUBLE
        |      - ni::DOUBLE), 4) >= 0.5)
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id % 10 >= 8
        |  AND doc_id NOT IN (SELECT n_id FROM dropped)
        |ORDER BY doc_id ASC""".stripMargin

  /** Shared by `dedup_semantic_incremental` and its streaming twin
    * `stream_dedup_semantic_ok` (same declared semantics, two engines —
    * the minhashIncrementalSql precedent).
    */
  private val semanticIncrementalSql: String =
    """WITH cbc AS (SELECT vec_id AS cent_id, embedding AS c_v,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> x::DOUBLE * x::DOUBLE))) AS cnrm
      |  FROM embeddings WHERE vec_id % 10 < 8 AND vec_id % 127 = 0),
      |asg AS (SELECT c_id, cent_id FROM (
      |  SELECT e.vec_id AS c_id, cbc.cent_id,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_sum(list_transform(range(1, len(e.embedding) + 1),
      |        i -> e.embedding[i]::DOUBLE
      |           * (cbc.c_v[i]::DOUBLE / cbc.cnrm))) DESC,
      |      cbc.cent_id ASC) AS rn
      |  FROM embeddings e CROSS JOIN cbc) WHERE rn = 1),
      |dropped AS (SELECT DISTINCT nn.c_id AS n_id
      |  FROM asg nn JOIN asg oo
      |    ON nn.cent_id = oo.cent_id AND nn.c_id <> oo.c_id
      |  JOIN embeddings n ON n.vec_id = nn.c_id
      |  JOIN embeddings o ON o.vec_id = oo.c_id
      |  WHERE nn.c_id % 10 >= 8
      |    AND (oo.c_id % 10 < 8 OR oo.c_id < nn.c_id)
      |    AND round(
      |      list_sum(list_transform(range(1, len(n.embedding) + 1),
      |        i -> n.embedding[i]::DOUBLE * o.embedding[i]::DOUBLE))
      |      / (sqrt(list_sum(list_transform(n.embedding,
      |           x -> x::DOUBLE * x::DOUBLE)))
      |       * sqrt(list_sum(list_transform(o.embedding,
      |           x -> x::DOUBLE * x::DOUBLE)))), 4) >= 0.40)
      |SELECT asg.c_id AS vec_id, asg.cent_id
      |FROM asg LEFT JOIN dropped ON asg.c_id = dropped.n_id
      |WHERE dropped.n_id IS NULL AND asg.c_id % 10 >= 8
      |ORDER BY vec_id ASC""".stripMargin

  /** The MLE-bigram LM scoring pipeline as CTEs ending in `lm`
    * (doc_id, n_bigrams, avg_logp) — shared by the lm_doc_score oracle
    * and the quality_lm_bucket tercile oracle.
    */
  private val lmScoreCtes: String =
    raw"""d AS (SELECT doc_id, string_split($normT, ' ') AS toks
        |           FROM documents
        |           WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |bg AS (SELECT doc_id, toks[i+1] AS w1, toks[i+2] AS w2
        |       FROM d, unnest(range(0, len(toks) - 1)) AS t(i)
        |       WHERE len(toks) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |pb AS (SELECT bg.doc_id,
        |    round(ln(c12.c12::DOUBLE / c1.c1::DOUBLE), 6)::DECIMAL(28,6) AS lp
        |  FROM bg JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
        |          JOIN c1 ON bg.w1 = c1.w1),
        |lm AS (SELECT doc_id, count(*) AS n_bigrams,
        |    (CASE WHEN sum(lp) < 0 THEN -1 ELSE 1 END *
        |     ((abs(CAST(sum(lp) * 1000000 AS BIGINT)) + 50 * count(*))
        |        // (100 * count(*))))::DOUBLE / 10000.0 AS avg_logp
        |  FROM pb GROUP BY doc_id)""".stripMargin

  /** The token-budget selection shared verbatim by `mix_budget` and its
    * bucket-pruned scale twin `mix_budget_approx` (same output by
    * construction — the pruning only drops rows the budget rule drops).
    */
  private lazy val mixBudgetSql: String =
    raw"""WITH t AS (SELECT doc_id, lang,
      |    len(string_split($normT, ' '))::BIGINT AS n_tokens,
      |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS rk
      |  FROM documents),
      |c AS (SELECT doc_id, lang, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY lang
      |      ORDER BY rk ASC, doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0)::BIGINT AS before_toks
      |  FROM t)
      |SELECT doc_id, lang, n_tokens,
      |  (before_toks + n_tokens)::BIGINT AS cum_tokens
      |FROM c WHERE before_toks < 5000
      |ORDER BY doc_id ASC""".stripMargin

  /** The `mix_weighted` oracle: [[mixBudgetSql]]'s selection with the
    * per-language budget CASE generated from the operator's own
    * weights literal (exact integer shares of the 10000-token total).
    */
  private lazy val mixWeightedSql: String = {
    val cases = graft.operators.TextOps.DefaultMixWeights
      .map { case (lg, w) => s"WHEN lang = '$lg' THEN ${10000L * w / 1000}" }
      .mkString(" ")
    raw"""WITH t AS (SELECT doc_id, lang,
      |    len(string_split($normT, ' '))::BIGINT AS n_tokens,
      |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS rk
      |  FROM documents),
      |c AS (SELECT doc_id, lang, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY lang
      |      ORDER BY rk ASC, doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0)::BIGINT AS before_toks
      |  FROM t)
      |SELECT doc_id, lang, n_tokens,
      |  (before_toks + n_tokens)::BIGINT AS cum_tokens
      |FROM c WHERE before_toks < (CASE $cases ELSE 0 END)
      |ORDER BY doc_id ASC""".stripMargin
  }

  /** The `mix_temperature` oracle: per-language budgets derived in SQL
    * (⌊√Σtokens⌋ smoothed weights, integer shares of the 10000 total —
    * IEEE sqrt/floor and `//`-on-non-negatives agree with the
    * operator's driver-side arithmetic), then [[mixBudgetSql]]'s
    * selection against the joined budget.
    */
  private lazy val mixTemperatureSql: String =
    raw"""WITH t AS (SELECT doc_id, lang,
      |    len(string_split($normT, ' '))::BIGINT AS n_tokens,
      |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS rk
      |  FROM documents),
      |w AS (SELECT lang,
      |    FLOOR(SQRT(CAST(SUM(n_tokens) AS DOUBLE)))::BIGINT AS w
      |  FROM t GROUP BY lang),
      |b AS (SELECT lang,
      |    ((10000 * w) // (SELECT SUM(w) FROM w))::BIGINT AS budget
      |  FROM w),
      |c AS (SELECT doc_id, lang, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY lang
      |      ORDER BY rk ASC, doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0)::BIGINT AS before_toks
      |  FROM t)
      |SELECT doc_id, c.lang AS lang, n_tokens,
      |  (before_toks + n_tokens)::BIGINT AS cum_tokens
      |FROM c JOIN b ON c.lang = b.lang
      |WHERE before_toks < budget
      |ORDER BY doc_id ASC""".stripMargin

  /** The `ts_drift` oracle — shared VERBATIM by `stream_drift_ok`
    * (the streaming replay emits the identical rows; the
    * join_asof_split shared-oracle precedent). Day-over-day binned KS
    * in pure BIGINT; `day + 1` routes each histogram into the next
    * day's comparison.
    */
  private lazy val tsDriftSql: String =
    raw"""WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(FLOOR(value) AS BIGINT) AS bin, count(*) AS cnt
      |  FROM events GROUP BY 1, 2, 3),
      |u AS (SELECT event_type, pair_day, bin,
      |    SUM(cc)::BIGINT AS cc, SUM(cp)::BIGINT AS cp FROM (
      |      SELECT event_type, day AS pair_day, bin, cnt AS cc, 0 AS cp
      |      FROM c
      |      UNION ALL
      |      SELECT event_type, day + 1, bin, 0, cnt FROM c)
      |  GROUP BY 1, 2, 3),
      |w AS (SELECT event_type, pair_day,
      |    SUM(cc) OVER (PARTITION BY event_type, pair_day ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
      |      AS cumc,
      |    SUM(cp) OVER (PARTITION BY event_type, pair_day ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
      |      AS cump,
      |    SUM(cc) OVER (PARTITION BY event_type, pair_day)::BIGINT AS tc,
      |    SUM(cp) OVER (PARTITION BY event_type, pair_day)::BIGINT AS tp
      |  FROM u)
      |SELECT event_type, strftime(pair_day, '%Y-%m-%d') AS day,
      |  MAX(ABS(cumc*tp - cump*tc))::BIGINT AS ks_num,
      |  MAX(tc)::BIGINT AS n_cur, MAX(tp)::BIGINT AS n_prev,
      |  CAST(MAX(ABS(cumc*tp - cump*tc)) AS DOUBLE)
      |    / (CAST(MAX(tc) AS DOUBLE) * CAST(MAX(tp) AS DOUBLE)) AS ks
      |FROM w GROUP BY event_type, pair_day
      |HAVING MAX(tc) > 0 AND MAX(tp) > 0
      |ORDER BY event_type ASC, day ASC""".stripMargin

  /** The `embedding_pca` oracle: the covariance-numerator integer
    * matrix N = n·P − S·Sᵀ from the same DOUBLE-snapped DECIMAL(18,4)
    * element frame as the `embedding_covariance` oracle, then the 20
    * power iterations UNROLLED as chained MATERIALIZED CTEs in
    * HUGEINT (the pagerank technique — MATERIALIZED is load-bearing:
    * plain CTEs re-inline the chain exponentially and K=20 never
    * finishes). HUGEINT `//` and Scala BigInt `/` both truncate toward
    * zero (verified on negatives), so the fixed-point vector is
    * bit-identical at every step.
    */
  /** The power-iteration CTE chain alone (no WITH/final SELECT), shared
    * by `embedding_pca`, `embedding_pca_project`, and the
    * `simsearch_opq_pca` rotation oracle.
    */
  private lazy val embeddingPcaCtes: String = {
    val F = "1000000000000"
    val iterCtes = (1 to 20).map { k =>
      raw"""w$k AS MATERIALIZED (SELECT nm.i AS i, SUM(nm.nv * v.v) AS w
        |  FROM nm JOIN v${k - 1} v ON nm.j = v.i GROUP BY 1),
        |m$k AS MATERIALIZED (SELECT GREATEST(MAX(ABS(w)) // $F, 1) AS m2
        |  FROM w$k),
        |v$k AS MATERIALIZED (SELECT i, w // (SELECT m2 FROM m$k) AS v
        |  FROM w$k)""".stripMargin
    }.mkString(",\n")
    raw"""x AS MATERIALIZED (SELECT vec_id, CAST(t.i AS INT) AS i,
      |    CAST(CAST(embedding[t.i] AS DOUBLE) AS DECIMAL(18,4)) AS xd
      |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
      |cnt AS MATERIALIZED (SELECT COUNT(*)::HUGEINT AS n FROM embeddings),
      |s AS MATERIALIZED (SELECT i, CAST(SUM(xd) * 10000 AS HUGEINT) AS si
      |  FROM x GROUP BY i),
      |p AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
      |    CAST(SUM(a.xd * b.xd) * 100000000 AS HUGEINT) AS pij
      |  FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY 1, 2),
      |nm AS MATERIALIZED (SELECT p.i, p.j,
      |    (SELECT n FROM cnt) * pij - sa.si * sb.si AS nv
      |  FROM p JOIN s sa ON p.i = sa.i JOIN s sb ON p.j = sb.i),
      |v0 AS MATERIALIZED (SELECT CAST(r.range AS INT) AS i,
      |    CAST($F AS HUGEINT) AS v FROM range(1, 65) r),
      |""".stripMargin + iterCtes
  }

  private lazy val embeddingPcaSql: String =
    "WITH " + embeddingPcaCtes + "\n" +
    raw"""SELECT i - 1 AS dim, v::BIGINT AS v_fp,
      |  CAST(v AS DOUBLE) / 1e12 AS loading
      |FROM v20 ORDER BY dim ASC""".stripMargin

  /** The `simsearch_opq_pca` oracle: the PCA chain → |loading| ranking
    * → round-robin dealing as a permutation list (pl[rr+1] = the dim
    * ranked rr; output slot j reads rank (j%16)*4 + j//16) → the
    * simsearch_pq CTEs verbatim over the permuted frame.
    */
  private lazy val simsearchOpqPcaSql: String =
    "WITH " + embeddingPcaCtes + ",\n" +
    raw"""rankp AS (SELECT i - 1 AS dim,
      |    row_number() OVER (ORDER BY ABS(v) DESC, i ASC) - 1 AS rr
      |  FROM v20),
      |perml AS (SELECT list(dim ORDER BY rr ASC) AS pl FROM rankp),
      |re AS (SELECT vec_id, list_transform(range(0, 64),
      |    j -> embedding[pl[CAST((j % 16) * 4 + j // 16 AS INT) + 1]
      |                   + 1]) AS embedding
      |  FROM embeddings, perml),
      |cb AS (SELECT vec_id AS code, embedding AS cv
      |  FROM re WHERE vec_id % 127 = 0
      |  ORDER BY vec_id LIMIT 256),
      |ss AS (SELECT unnest(range(0, 4)) AS s),
      |codes AS (SELECT c_id, s, code FROM (
      |  SELECT e.vec_id AS c_id, r.s, cb.code,
      |    row_number() OVER (PARTITION BY e.vec_id, r.s ORDER BY
      |      (list_sum(list_transform(range(1, 17),
      |         i -> e.embedding[r.s * 16 + i]::DOUBLE
      |            * cb.cv[r.s * 16 + i]::DOUBLE))
      |       - list_sum(list_transform(range(1, 17),
      |         i -> cb.cv[r.s * 16 + i]::DOUBLE
      |            * cb.cv[r.s * 16 + i]::DOUBLE)) / 2) DESC,
      |      cb.code ASC) AS rn
      |  FROM re e CROSS JOIN ss r CROSS JOIN cb) WHERE rn = 1),
      |lut AS (SELECT q.vec_id AS q_id, r.s, cb.code,
      |    round(list_sum(list_transform(range(1, 17),
      |      i -> q.embedding[r.s * 16 + i]::DOUBLE
      |         * cb.cv[r.s * 16 + i]::DOUBLE)) * 1000000.0, 0)::BIGINT
      |      AS pdot_u
      |  FROM re q CROSS JOIN ss r CROSS JOIN cb
      |  WHERE q.vec_id < 10),
      |sc AS (SELECT l.q_id, c.c_id, sum(l.pdot_u) AS score_u
      |  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
      |  WHERE c.c_id <> l.q_id GROUP BY 1, 2)
      |SELECT q_id, c_id,
      |  round(score_u::DOUBLE / 1000000.0, 6) AS approx_score,
      |  rn::INT AS rn
      |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY score_u DESC, c_id ASC) AS rn FROM sc)
      |WHERE rn <= 5 ORDER BY q_id ASC, rn ASC""".stripMargin

  /** The `graph_pagerank` oracle: the nation-trade edge aggregation,
    * then the 5 power iterations UNROLLED as chained CTEs — the same
    * 1e12-scaled integer arithmetic as [[graft.operators.GraphOps]]
    * (HUGEINT products where Spark uses DECIMAL(38,0); `//` and `DIV`
    * agree on non-negative operands), so the fixed-point ranks are
    * bit-identical and the hash compare is exact.
    */
  private lazy val pagerankSql: String = {
    val iterCtes = (1 to 5).map { i =>
      val prev = s"p${i - 1}"
      raw"""s$i AS (SELECT r.dst AS v,
        |    sum((p.p::HUGEINT * r.r) // 1000000000000)::BIGINT AS s
        |  FROM $prev p JOIN r ON p.v = r.u GROUP BY r.dst),
        |d$i AS (SELECT coalesce(sum(p.p), 0)::BIGINT AS dm FROM $prev p
        |        WHERE p.v NOT IN (SELECT u FROM outs)),
        |p$i AS (SELECT p.v,
        |    (((15 * 1000000000000) // 100) // nn.nn
        |     + (85 * (coalesce(s.s, 0) + d.dm // nn.nn)) // 100)::BIGINT
        |      AS p
        |  FROM $prev p LEFT JOIN s$i s ON p.v = s.v, d$i d, nn)""".stripMargin
    }.mkString(",\n")
    raw"""WITH e AS (SELECT s_nationkey AS u, c_nationkey AS dst,
      |    count(*)::BIGINT AS w
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2),
      |outs AS (SELECT u, sum(w)::BIGINT AS outw FROM e GROUP BY u),
      |r AS (SELECT u, dst,
      |    ((w::HUGEINT * 1000000000000) // outw)::BIGINT AS r
      |  FROM e JOIN outs USING (u)),
      |nn AS (SELECT count(*)::BIGINT AS nn FROM nation),
      |p0 AS (SELECT n_nationkey AS v,
      |    (1000000000000 // nn.nn)::BIGINT AS p FROM nation, nn),
      |""".stripMargin + iterCtes + "\n" +
    raw"""SELECT n_name AS nation, p5.p AS pr_fp,
      |  round(p5.p::DOUBLE / 1000000000000.0, 9) AS pagerank
      |FROM p5 JOIN nation ON p5.v = n_nationkey
      |ORDER BY pr_fp DESC, nation ASC""".stripMargin
  }

  /** The `bpe_train` oracle: k=8 BPE iterations unrolled as chained
    * CTEs (the pagerank technique). Each iteration re-derives the
    * pair counts from the CURRENT segmentation string, takes the
    * (count DESC, a ASC, b ASC) argmax, and applies the SAME
    * boundary-flanked `replace` as [[graft.operators.BpeTrain]] —
    * u001f/u001e control chars embedded in the SQL literals verbatim
    * (Verify's JSON dump escapes them as \\u sequences).
    */
  private val bpeK = 8

  /** The shared k-iteration BPE CTE chain (`WITH it0 …, pc_i, m_i,
    * it_i …`) — consumed by BOTH the `bpe_train` oracle (union of the
    * m_i argmaxes) and the `bpe_encode` oracle (projection of the
    * final it_k state), mirroring how the two queries share one memoized
    * training on the Spark side.
    */
  private lazy val bpeCtes: String = {
    val S = graft.operators.BpeTrain.Sep
    val SS = S + S
    val M = graft.operators.BpeTrain.MergeJ
    val iterCtes = (1 to bpeK).map { i =>
      val prev = s"it${i - 1}"
      raw"""pc$i AS (SELECT p.a AS a, p.b AS b, count(*) AS c FROM (
        |    SELECT unnest(list_transform(range(1, len(t)),
        |      j -> {'a': t[j], 'b': t[j + 1]})) AS p
        |    FROM (SELECT list_filter(string_split(s, '$S'),
        |          x -> x <> '') AS t FROM $prev)) GROUP BY 1, 2),
        |m$i AS (SELECT a, b, c FROM pc$i
        |        ORDER BY c DESC, a ASC, b ASC LIMIT 1),
        |it$i AS (SELECT i.doc_id,
        |    replace(i.s, '$S' || m.a || '$SS' || m.b || '$S',
        |      '$S' || m.a || '$M' || m.b || '$S') AS s
        |  FROM $prev i CROSS JOIN m$i m)""".stripMargin
    }.mkString(",\n")
    raw"""WITH it0 AS (SELECT doc_id,
      |    '$SS' || array_to_string(toks, '$SS') || '$SS' AS s
      |  FROM (SELECT doc_id, list_filter(string_split($normT, ' '),
      |        x -> x <> '') AS toks FROM documents)
      |  WHERE len(toks) >= 1),
      |""".stripMargin + iterCtes
  }

  /** Shared CTE chain for the unigram-LM trainer oracles: seed counts
    * → capped vocab → fixed-point ln scores → Viterbi DP as a
    * recursive CTE carrying (dp, back) lists (the ts_forecast_seasonal
    * technique) → back-pointer walk recovering the segmentation.
    * Mirrors UnigramTrain.trainWords stage for stage, including the
    * shortest-piece-first strict-improvement tie rule and the len<=24
    * word qualification.
    */
  private lazy val unigramCtes: String =
    raw"""WITH RECURSIVE w AS (
      |  SELECT word, count(*)::BIGINT AS wf
      |  FROM (SELECT unnest(string_split($normT, ' ')) AS word
      |        FROM documents)
      |  WHERE word <> '' AND len(word) <= 24
      |  GROUP BY 1),
      |lw AS (
      |  SELECT lang, word, count(*)::BIGINT AS wfl
      |  FROM (SELECT lang,
      |      unnest(string_split($normT, ' ')) AS word FROM documents)
      |  WHERE word <> '' AND len(word) <= 24
      |  GROUP BY 1, 2),
      |cand AS (
      |  SELECT substr(word, CAST(pos AS INT), CAST(plen AS INT)) AS piece,
      |    sum(wf)::BIGINT AS c
      |  FROM w, range(1, 25) r1(pos), range(1, 4) r2(plen)
      |  WHERE pos + plen - 1 <= len(word)
      |  GROUP BY 1),
      |vocab AS (
      |  SELECT piece, c FROM cand WHERE len(piece) = 1
      |  UNION ALL
      |  SELECT piece, c FROM (
      |    SELECT piece, c FROM cand WHERE len(piece) >= 2
      |    ORDER BY c DESC, piece ASC LIMIT 64)),
      |tot AS (SELECT sum(c)::BIGINT AS t FROM vocab),
      |sc AS (SELECT piece, c,
      |    CAST(CAST(round(ln(c / t), 6) AS DECIMAL(18,6)) * 1000000
      |      AS BIGINT) AS s
      |  FROM vocab, tot),
      |vit AS (
      |  SELECT word, wf, 0 AS i,
      |    [CAST(0 AS BIGINT)] AS dp, [CAST(0 AS INT)] AS back
      |  FROM w
      |  UNION ALL
      |  SELECT word, wf, p,
      |    list_append(dp,
      |      CASE WHEN v3 IS NOT NULL AND v3 > b12 THEN v3 ELSE b12 END),
      |    list_append(back,
      |      CASE WHEN v3 IS NOT NULL AND v3 > b12 THEN p-3 ELSE j12 END)
      |  FROM (
      |    SELECT v.word, v.wf, v.i + 1 AS p, v.dp, v.back,
      |      v.dp[v.i + 1] + s1.s AS v1,
      |      CASE WHEN v.i >= 1 AND s2.s IS NOT NULL
      |        THEN v.dp[v.i] + s2.s END AS v2,
      |      CASE WHEN v.i >= 2 AND s3.s IS NOT NULL
      |        THEN v.dp[v.i - 1] + s3.s END AS v3
      |    FROM vit v
      |    JOIN sc s1 ON s1.piece = substr(v.word, v.i + 1, 1)
      |    LEFT JOIN sc s2 ON v.i >= 1
      |      AND s2.piece = substr(v.word, v.i, 2)
      |    LEFT JOIN sc s3 ON v.i >= 2
      |      AND s3.piece = substr(v.word, v.i - 1, 3)
      |    WHERE v.i < len(v.word)) q0
      |  CROSS JOIN LATERAL (SELECT
      |    CASE WHEN v2 IS NOT NULL AND v2 > v1 THEN v2 ELSE v1 END AS b12,
      |    CASE WHEN v2 IS NOT NULL AND v2 > v1 THEN p-2 ELSE p-1 END
      |      AS j12) q1),
      |bt AS (
      |  SELECT word, wf, CAST(len(word) AS INT) AS i, back
      |  FROM vit WHERE i = len(word)
      |  UNION ALL
      |  SELECT word, wf, back[i + 1] AS i, back FROM bt WHERE i > 0),
      |pcs AS (
      |  SELECT word, wf, i,
      |    substr(word, back[i + 1] + 1, i - back[i + 1]) AS piece
      |  FROM bt WHERE i > 0)""".stripMargin

  private lazy val unigramTrainSql: String =
    unigramCtes + raw""",
      |em AS (SELECT pcs.piece AS epiece, sum(wf)::BIGINT AS em_count
      |  FROM pcs GROUP BY 1)
      |SELECT sc.piece, sc.c AS seed_count, em.em_count, sc.s AS score_fp
      |FROM sc JOIN em ON em.epiece = sc.piece
      |ORDER BY em_count DESC, piece ASC""".stripMargin

  private lazy val unigramEncodeSql: String =
    unigramCtes + raw""",
      |segstr AS (SELECT word, count(*)::BIGINT AS np,
      |    string_agg(piece, '_' ORDER BY i ASC) AS enc
      |  FROM pcs GROUP BY word),
      |dw AS (SELECT doc_id, j, word FROM (
      |    SELECT doc_id, generate_subscripts(words, 1) AS j,
      |      unnest(words) AS word
      |    FROM (SELECT doc_id, string_split($normT, ' ') AS words
      |          FROM documents) t)
      |  WHERE word <> '' AND len(word) <= 24)
      |SELECT doc_id, count(*)::BIGINT AS n_words,
      |  sum(np)::BIGINT AS n_pieces,
      |  string_agg(enc, ' ' ORDER BY j ASC) AS encoded
      |FROM dw JOIN segstr USING (word)
      |GROUP BY doc_id ORDER BY doc_id ASC""".stripMargin

  private lazy val unigramFertilitySql: String =
    unigramCtes + raw""",
      |np AS (SELECT word, count(*)::BIGINT AS np FROM pcs GROUP BY 1)
      |SELECT lang, sum(wfl)::BIGINT AS n_words,
      |  sum(np.np * wfl)::BIGINT AS n_pieces,
      |  ((sum(np.np * wfl)::BIGINT * 20000 + sum(wfl)::BIGINT)
      |    // (2 * sum(wfl)::BIGINT))::DOUBLE / 10000 AS fertility
      |FROM lw JOIN np USING (word)
      |GROUP BY lang ORDER BY lang ASC""".stripMargin

  /** Shared CTE chain for the WordPiece-family oracles: the
    * distinct-word frequency table → char-unit state strings → k
    * unrolled likelihood-merge iterations (each re-deriving the
    * wf-weighted unit and adjacent-pair counts and the exact
    * fixed-point score argmax) → the learned vocab → per-position
    * longest-match lengths → the greedy maximal-munch recursion.
    * Mirrors WordpieceTrain stage for stage.
    */
  private val wpK = 6

  private lazy val wordpieceCtes: String = {
    val S = graft.operators.WordpieceTrain.Sep
    val SS = S + S
    val M = graft.operators.WordpieceTrain.MergeJ
    val iterCtes = (1 to wpK).map { i =>
      val prev = s"wst${i - 1}"
      raw"""wun$i AS MATERIALIZED (SELECT u, sum(wf)::BIGINT AS c FROM (
        |    SELECT wf, unnest(list_filter(string_split(s, '$S'),
        |      x -> x <> '')) AS u FROM $prev) GROUP BY 1),
        |wpc$i AS MATERIALIZED (SELECT p.a AS a, p.b AS b, sum(wf)::BIGINT AS c FROM (
        |    SELECT wf, unnest(list_transform(range(1, len(t)),
        |      j -> {'a': t[j], 'b': t[j + 1]})) AS p
        |    FROM (SELECT wf, list_filter(string_split(s, '$S'),
        |          x -> x <> '') AS t FROM $prev)) GROUP BY 1, 2),
        |wm$i AS MATERIALIZED (SELECT wpc$i.a AS a, wpc$i.b AS b, wpc$i.c AS c,
        |    ua.c AS ua, ub.c AS ub,
        |    (wpc$i.c * 1000000000000) // (ua.c * ub.c) AS score_fp
        |  FROM wpc$i
        |  JOIN wun$i ua ON wpc$i.a = ua.u
        |  JOIN wun$i ub ON wpc$i.b = ub.u
        |  ORDER BY score_fp DESC, c DESC, a ASC, b ASC LIMIT 1),
        |wst$i AS MATERIALIZED (SELECT w.word, w.wf,
        |    replace(w.s, '$S' || m.a || '$SS' || m.b || '$S',
        |      '$S' || m.a || '$M' || m.b || '$S') AS s
        |  FROM $prev w CROSS JOIN wm$i m)""".stripMargin
    }.mkString(",\n")
    val vocUnions = (1 to wpK).map(i =>
      s"SELECT replace(a || b, '$M', '') AS piece FROM wm$i")
      .mkString("\n  UNION ")
    raw"""WITH RECURSIVE w AS MATERIALIZED (
      |  SELECT word, count(*)::BIGINT AS wf
      |  FROM (SELECT unnest(string_split($normT, ' ')) AS word
      |        FROM documents)
      |  WHERE word <> '' AND len(word) <= 24
      |  GROUP BY 1),
      |wst0 AS MATERIALIZED (SELECT word, wf,
      |    '$SS' || array_to_string(list_transform(
      |      range(1, len(word) + 1),
      |      j -> substr(word, CAST(j AS INT), 1)), '$SS') || '$SS' AS s
      |  FROM w),
      |""".stripMargin + iterCtes + raw""",
      |voc AS MATERIALIZED (
      |  SELECT DISTINCT substr(word, CAST(j AS INT), 1) AS piece
      |  FROM w, range(1, 25) r(j) WHERE j <= len(word)
      |  UNION $vocUnions),
      |wlm AS MATERIALIZED (SELECT s.word, s.i, max(len(v.piece)) AS l
      |  FROM (SELECT word, j - 1 AS i FROM w, range(1, 25) r(j)
      |        WHERE j <= len(word)) s
      |  JOIN voc v ON substr(s.word, CAST(s.i + 1 AS INT),
      |    CAST(len(v.piece) AS INT)) = v.piece
      |  GROUP BY 1, 2),
      |genc AS (
      |  SELECT word, 0 AS i, 0 AS stp FROM w
      |  UNION ALL
      |  SELECT e.word, CAST(e.i + wlm.l AS INT) AS i, e.stp + 1 AS stp
      |  FROM genc e JOIN wlm ON wlm.word = e.word AND wlm.i = e.i
      |  WHERE e.i < len(e.word)),
      |wpcs AS MATERIALIZED (SELECT e.word, e.stp,
      |    substr(e.word, CAST(e.i + 1 AS INT), CAST(wlm.l AS INT))
      |      AS piece
      |  FROM genc e JOIN wlm ON wlm.word = e.word AND wlm.i = e.i
      |  WHERE e.i < len(e.word))""".stripMargin
  }

  private lazy val wordpieceTrainSql: String = {
    val M = graft.operators.WordpieceTrain.MergeJ
    wordpieceCtes + "\n" +
    (1 to wpK).map(i =>
      s"SELECT $i AS step, replace(a, '$M', '') AS lhs, " +
        s"replace(b, '$M', '') AS rhs, c AS pair_count, " +
        s"ua AS unit_lhs, ub AS unit_rhs, score_fp FROM wm$i")
      .mkString("", "\nUNION ALL ", "\nORDER BY step ASC")
  }

  private lazy val wordpieceEncodeSql: String =
    wordpieceCtes + raw""",
      |wseg AS (SELECT word, count(*)::BIGINT AS np,
      |    string_agg(CASE WHEN stp = 0 THEN piece
      |                    ELSE '##' || piece END, '_'
      |      ORDER BY stp ASC) AS enc
      |  FROM wpcs GROUP BY word),
      |dw AS (SELECT doc_id, j, word FROM (
      |    SELECT doc_id, generate_subscripts(words, 1) AS j,
      |      unnest(words) AS word
      |    FROM (SELECT doc_id, string_split($normT, ' ') AS words
      |          FROM documents) t)
      |  WHERE word <> '' AND len(word) <= 24)
      |SELECT doc_id, count(*)::BIGINT AS n_words,
      |  sum(np)::BIGINT AS n_pieces,
      |  string_agg(enc, ' ' ORDER BY j ASC) AS encoded
      |FROM dw JOIN wseg USING (word)
      |GROUP BY doc_id ORDER BY doc_id ASC""".stripMargin

  private lazy val wordpieceFertilitySql: String =
    wordpieceCtes + raw""",
      |wnp AS (SELECT word, count(*)::BIGINT AS np FROM wpcs GROUP BY 1),
      |wlw AS (SELECT lang, word, count(*)::BIGINT AS wfl
      |  FROM (SELECT lang,
      |      unnest(string_split($normT, ' ')) AS word FROM documents)
      |  WHERE word <> '' AND len(word) <= 24
      |  GROUP BY 1, 2)
      |SELECT lang, sum(wfl)::BIGINT AS n_words,
      |  sum(wnp.np * wfl)::BIGINT AS n_pieces,
      |  ((sum(wnp.np * wfl)::BIGINT * 20000 + sum(wfl)::BIGINT)
      |    // (2 * sum(wfl)::BIGINT))::DOUBLE / 10000 AS fertility
      |FROM wlw JOIN wnp USING (word)
      |GROUP BY lang ORDER BY lang ASC""".stripMargin

  private lazy val bpeTrainSql: String = {
    val M = graft.operators.BpeTrain.MergeJ
    bpeCtes + "\n" +
    (1 to bpeK).map(i =>
      s"SELECT $i AS step, replace(a, '$M', ' ') AS lhs, " +
        s"replace(b, '$M', ' ') AS rhs, c AS pair_count FROM m$i")
      .mkString("", "\nUNION ALL ", "\nORDER BY step ASC")
  }

  private lazy val bpeEncodeSql: String = {
    val S = graft.operators.BpeTrain.Sep
    val M = graft.operators.BpeTrain.MergeJ
    bpeCtes + "\n" +
    raw"""SELECT doc_id,
      |  len(list_filter(t, x -> contains(x, '$M')))::INT
      |    AS n_merged_units,
      |  len(t)::INT AS n_units,
      |  array_to_string(list_transform(t, x -> replace(x, '$M', '_')),
      |    ' ') AS encoded
      |FROM (SELECT doc_id, list_filter(string_split(s, '$S'),
      |      x -> x <> '') AS t FROM it$bpeK)
      |ORDER BY doc_id ASC""".stripMargin
  }

  /** The `bpe_fertility` oracle: per-language aggregate over the same
    * final it_k state the `bpe_encode` oracle projects — the third
    * consumer of [[bpeCtes]], mirroring the third memo view Spark-side.
    */
  private lazy val bpeFertilitySql: String = {
    val S = graft.operators.BpeTrain.Sep
    val M = graft.operators.BpeTrain.MergeJ
    bpeCtes + "\n" +
    raw"""SELECT lang, count(*)::BIGINT AS n_docs,
      |  SUM(len(t))::BIGINT AS total_units,
      |  SUM(len(list_filter(t, x -> contains(x, '$M'))))::BIGINT
      |    AS merged_units,
      |  SUM(n_chars)::BIGINT AS total_chars,
      |  CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(len(t)) AS DOUBLE)
      |    AS chars_per_unit
      |FROM (SELECT doc_id, list_filter(string_split(s, '$S'),
      |      x -> x <> '') AS t FROM it$bpeK) e
      |JOIN documents USING (doc_id)
      |GROUP BY lang
      |ORDER BY lang ASC""".stripMargin
  }

  /** The `pipeline_tokenize` oracle: the fourth consumer of
    * [[bpeCtes]] (mirroring the fourth memo view Spark-side) — the
    * final it_k segmentation's unit counts fed through the
    * pack_sequences window verbatim.
    */
  private lazy val pipelineTokenizeSql: String = {
    val S = graft.operators.BpeTrain.Sep
    bpeCtes + ",\n" +
    raw"""enc AS (SELECT doc_id,
      |    len(list_filter(string_split(s, '$S'), x -> x <> ''))::INT
      |      AS n_tok FROM it$bpeK),
      |tt AS (SELECT d.source, e.doc_id, e.n_tok
      |       FROM enc e JOIN documents d USING (doc_id)),
      |cc AS (SELECT source, doc_id, n_tok,
      |    coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_before
      |  FROM tt)
      |SELECT source, doc_id, n_tok,
      |  (cum_before // 512)::BIGINT AS pack_id,
      |  (cum_before % 512)::BIGINT AS pack_offset
      |FROM cc ORDER BY source ASC, doc_id ASC""".stripMargin
  }

  /** The df-capped ngram-Jaccard pair pipeline as CTEs ending in `p`
    * (source, a_id, b_id, jaccard) — shared by the dedup_ngram_jaccard
    * oracle and the dedup_cluster recursive-closure oracle.
    */
  private lazy val ngramPairCtes: String =
    raw"""d AS (SELECT doc_id, source,
      |        string_split($normT, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, source,
      |        list_distinct(list_transform(
      |          range(0, greatest(len(toks) - 2, 0) + 1),
      |          i -> array_to_string(toks[i+1:i+2], ' '))) AS sh
      |      FROM d),
      |src_n AS (SELECT source, count(*) AS src_n FROM d GROUP BY source),
      |tok AS (SELECT source, doc_id, unnest(sh) AS h FROM s),
      |keep AS (SELECT t.source, t.h FROM tok t
      |         JOIN src_n n ON t.source = n.source
      |         GROUP BY t.source, t.h, n.src_n
      |         HAVING count(*) <= least(n.src_n * 0.3, 10000)),
      |kept AS (SELECT t.source, t.doc_id, t.h FROM tok t
      |         JOIN keep k ON t.source = k.source AND t.h = k.h),
      |sizes AS (SELECT source, doc_id, count(*) AS n_sh
      |          FROM kept GROUP BY source, doc_id),
      |inter AS (SELECT a.source AS source, a.doc_id AS a_id,
      |            b.doc_id AS b_id, count(*) AS n_inter
      |          FROM kept a JOIN kept b
      |            ON a.source = b.source AND a.h = b.h
      |               AND a.doc_id < b.doc_id
      |          GROUP BY a.source, a.doc_id, b.doc_id),
      |p AS (SELECT i.source, i.a_id, i.b_id,
      |        round(i.n_inter::DOUBLE /
      |          (sa.n_sh::DOUBLE + sb.n_sh::DOUBLE - i.n_inter::DOUBLE),
      |          4) AS jaccard
      |      FROM inter i
      |      JOIN sizes sa ON i.source = sa.source AND i.a_id = sa.doc_id
      |      JOIN sizes sb ON i.source = sb.source AND i.b_id = sb.doc_id)""".stripMargin

  /** The ≥0.2-similarity transitive-closure labels as CTEs ending in
    * `lbl` (id, cluster) — shared by the dedup_cluster oracle and the
    * dedup_cluster_stats histogram oracle.
    */
  private lazy val clusterLblCtes: String =
    raw"""$ngramPairCtes,
      |prs AS (SELECT a_id, b_id FROM p WHERE jaccard >= 0.2),
      |edges AS (SELECT a_id AS u, b_id AS v FROM prs
      |          UNION SELECT b_id, a_id FROM prs),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |lbl AS (SELECT u AS id, least(u, min(v)) AS cluster
      |        FROM reach GROUP BY u)""".stripMargin

  /** DuckDB replication of `LshMix.comp` (VectorExpressions.scala:161) —
    * the seedless splitmix64-style hyperplane mix behind FloatVecLshBits.
    * Java's 64-bit wrap-around arithmetic is emulated in HUGEINT: each
    * multiply is split at 2³² (a·b mod 2⁶⁴ = ((a_hi·b mod 2³²)·2³² +
    * a_lo·b) mod 2⁶⁴, every partial ≤ 2⁹⁶ < HUGEINT max), `>>>` is
    * division of the non-negative unsigned form, xor runs on UBIGINT,
    * and Java's floorMod-on-signed is the CASE + double-% at the end.
    * Ends in `wv` (p, wts: DOUBLE[dim] ordered by dimension) — making
    * the LSH bucket surfaces fully oracle-checkable rather than
    * spec-only (VERDICT r4 next-round #2).
    */
  private def lshWeightCtes(nBits: Int, dim: Int): String =
    raw"""planes AS (SELECT unnest(range(0, $nBits)) AS p),
      |dims AS (SELECT unnest(range(0, $dim)) AS d),
      |mix0 AS (SELECT p, d,
      |  (p::HUGEINT * 11400714819323198485 + d::HUGEINT * 13787848793156543929
      |   + 10723151780598845931) % 18446744073709551616::HUGEINT AS z0
      |  FROM planes CROSS JOIN dims),
      |mix1 AS (SELECT p, d,
      |  ((((xor(z0::UBIGINT, (z0 // 1073741824)::UBIGINT)::HUGEINT) // 4294967296)
      |     * 13787848793156543929) % 4294967296) * 4294967296
      |  + ((xor(z0::UBIGINT, (z0 // 1073741824)::UBIGINT)::HUGEINT) % 4294967296)
      |     * 13787848793156543929 AS t1
      |  FROM mix0),
      |mix2 AS (SELECT p, d, t1 % 18446744073709551616::HUGEINT AS z1 FROM mix1),
      |mix3 AS (SELECT p, d,
      |  ((((xor(z1::UBIGINT, (z1 // 134217728)::UBIGINT)::HUGEINT) // 4294967296)
      |     * 10723151780598845931) % 4294967296) * 4294967296
      |  + ((xor(z1::UBIGINT, (z1 // 134217728)::UBIGINT)::HUGEINT) % 4294967296)
      |     * 10723151780598845931 AS t2
      |  FROM mix2),
      |mix4 AS (SELECT p, d, t2 % 18446744073709551616::HUGEINT AS z2 FROM mix3),
      |mix5 AS (SELECT p, d,
      |  xor(z2::UBIGINT, (z2 // 2147483648)::UBIGINT)::HUGEINT AS z FROM mix4),
      |w AS (SELECT p, d,
      |  ((((CASE WHEN z >= 9223372036854775808::HUGEINT
      |       THEN z - 18446744073709551616::HUGEINT ELSE z END) % 2000000)
      |    + 2000000) % 2000000)::DOUBLE / 1000000.0 - 1.0 AS wt
      |  FROM mix5),
      |wv AS (SELECT p, list(wt ORDER BY d) AS wts FROM w GROUP BY p)""".stripMargin

  /** Banded-LSH candidate verification as CTEs ending in `ver`
    * (a_id, b_id, cos_sim) — the full dedup_embedding_lsh pipeline
    * (48-bit buckets → 4×12 bands → same-band pairs → exact cosine)
    * replicated in DuckDB on top of [[lshWeightCtes]]; shared by the
    * threshold-0.95 and candidates (threshold −1) oracles.
    */
  private lazy val lshBandVerifyCtes: String =
    raw"""${lshWeightCtes(48, 64)},
      |bits AS (SELECT e.vec_id, wv.p,
      |  CASE WHEN list_sum(list_transform(range(1, len(e.embedding) + 1),
      |      i -> e.embedding[i]::DOUBLE * wv.wts[i])) >= 0
      |    THEN 1 ELSE 0 END AS bit
      |  FROM embeddings e CROSS JOIN wv),
      |bands AS (SELECT vec_id, p // 12 AS bno,
      |    sum(bit::BIGINT << (p % 12))::BIGINT AS bkey
      |  FROM bits GROUP BY vec_id, p // 12),
      |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      |  FROM bands a JOIN bands b ON a.bno = b.bno AND a.bkey = b.bkey
      |  WHERE a.vec_id < b.vec_id),
      |v AS (SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
      |  FROM embeddings),
      |ver AS (SELECT c.a_id, c.b_id,
      |  round(list_sum(list_transform(range(1, len(va.embedding) + 1),
      |      i -> va.embedding[i]::DOUBLE * vb.embedding[i]::DOUBLE))
      |    / (va.nrm * vb.nrm), 4) AS cos_sim
      |  FROM cand c JOIN v va ON c.a_id = va.vec_id
      |              JOIN v vb ON c.b_id = vb.vec_id)""".stripMargin

  /** The three ANN-searcher oracles live in vals so `ann_recall` can
    * compose them as nested-WITH derived tables (recall@k is then plain
    * relational algebra over the three already-verified result sets).
    */
  private lazy val knnOracleSql: String =
    """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
      |           FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings),
      |p AS (SELECT q_id, c_id,
      |  round(
      |    list_sum(list_transform(range(1, len(q_emb) + 1),
      |      i -> q_emb[i]::DOUBLE * c_emb[i]::DOUBLE))
      |    / (sqrt(list_sum(list_transform(q_emb, x -> x::DOUBLE * x::DOUBLE)))
      |     * sqrt(list_sum(list_transform(c_emb, x -> x::DOUBLE * x::DOUBLE)))),
      |    4) AS cos_sim
      |  FROM c CROSS JOIN q WHERE q_id <> c_id)
      |SELECT q_id, c_id, cos_sim, rn::INT AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos_sim DESC, c_id ASC) AS rn FROM p
      |) WHERE rn <= 5 ORDER BY q_id ASC, rn ASC""".stripMargin

  /** BM25 lexical CTE chain shared by the hybrid retriever oracles
    * (`simsearch_hybrid`/`_lsh`): corpus (cd/ce, docs⋈embeddings on
    * id), tokenization, tf/dl/df, corpus stats, query vocabulary, and
    * the 1e-6-unit fixed-point contribution sum ending in the `lex`
    * top-20 rank list. Mirrors SimSearch.hybridOver op for op.
    */
  private lazy val hybridLexCtes: String =
    raw"""cd AS (SELECT d.doc_id, d.text FROM documents d
      |         JOIN embeddings e ON d.doc_id = e.vec_id),
      |ce AS (SELECT e.vec_id, e.embedding FROM embeddings e
      |       JOIN documents d ON e.vec_id = d.doc_id),
      |tok AS (SELECT doc_id, unnest(string_split($normT, ' ')) AS term
      |        FROM cd),
      |tok2 AS (SELECT doc_id, term FROM tok WHERE length(term) > 0),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2
      |       GROUP BY doc_id, term),
      |dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
      |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |stats AS (SELECT count(*)::DOUBLE AS n_docs,
      |          sum(dl)::DOUBLE / count(*) AS avgdl,
      |          count(*) AS n_docs_l FROM dl),
      |qt AS (SELECT DISTINCT doc_id AS q_id, term FROM tok2
      |       WHERE doc_id < 10),
      |contrib AS (SELECT q.q_id, t.doc_id AS c_id,
      |    round(
      |      ln((((s.n_docs - f.df::DOUBLE) + 0.5)
      |          / (f.df::DOUBLE + 0.5)) + 1.0)
      |      * ((t.tf::DOUBLE * 2.2)
      |        / (t.tf::DOUBLE
      |          + 1.2 * (0.25 + 0.75 * (l.dl::DOUBLE / s.avgdl))))
      |      * 1000000.0, 0)::BIGINT AS c_u
      |  FROM qt q JOIN tf t ON q.term = t.term AND t.doc_id <> q.q_id
      |  JOIN dfq f ON q.term = f.term
      |  JOIN dl l ON t.doc_id = l.doc_id
      |  CROSS JOIN stats s
      |  WHERE f.df * 1000 <= s.n_docs_l * 800),
      |lex AS (SELECT q_id, c_id, lex_rn FROM (
      |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
      |      ORDER BY score_u DESC, c_id ASC) AS lex_rn
      |    FROM (SELECT q_id, c_id, sum(c_u) AS score_u FROM contrib
      |          GROUP BY q_id, c_id))
      |  WHERE lex_rn <= 20)""".stripMargin

  /** Fixed-point RRF fusion tail shared by the hybrid oracles: expects
    * `lex` (q_id, c_id, lex_rn) and `vec` (q_id, c_id, vec_rn) CTEs.
    */
  private lazy val hybridFusionSql: String =
    raw"""fused AS (SELECT coalesce(l.q_id, v.q_id) AS q_id,
      |    coalesce(l.c_id, v.c_id) AS c_id, l.lex_rn, v.vec_rn,
      |    coalesce(1000000 // (60 + l.lex_rn), 0)
      |      + coalesce(1000000 // (60 + v.vec_rn), 0) AS rrf_u
      |  FROM lex l FULL OUTER JOIN vec v
      |    ON l.q_id = v.q_id AND l.c_id = v.c_id)
      |SELECT q_id, c_id, coalesce(lex_rn, 0)::INT AS lex_rn,
      |  coalesce(vec_rn, 0)::INT AS vec_rn,
      |  round(rrf_u::DOUBLE / 1000000.0, 6) AS rrf_score, rn::INT AS rn
      |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY rrf_u DESC, c_id ASC) AS rn FROM fused)
      |WHERE rn <= 10 ORDER BY q_id ASC, rn ASC""".stripMargin

  private lazy val lshOracleSql: String =
    raw"""WITH ${lshWeightCtes(8, 64)},
      |bits AS (SELECT e.vec_id, wv.p,
      |  CASE WHEN list_sum(list_transform(range(1, len(e.embedding) + 1),
      |      i -> e.embedding[i]::DOUBLE * wv.wts[i])) >= 0
      |    THEN (1::BIGINT << p) ELSE 0::BIGINT END AS bit
      |  FROM embeddings e CROSS JOIN wv),
      |bkt AS (SELECT vec_id, sum(bit)::BIGINT AS bucket
      |        FROM bits GROUP BY vec_id),
      |eb AS (SELECT e.vec_id, e.embedding, b.bucket
      |       FROM embeddings e JOIN bkt b USING (vec_id)),
      |q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket
      |      FROM eb WHERE vec_id < 10),
      |c AS (SELECT vec_id AS c_id, embedding AS c_emb, bucket FROM eb),
      |p2 AS (SELECT q_id, c_id,
      |  round(
      |    list_sum(list_transform(range(1, len(q_emb) + 1),
      |      i -> q_emb[i]::DOUBLE * c_emb[i]::DOUBLE))
      |    / (sqrt(list_sum(list_transform(q_emb, x -> x::DOUBLE * x::DOUBLE)))
      |     * sqrt(list_sum(list_transform(c_emb, x -> x::DOUBLE * x::DOUBLE)))),
      |    4) AS cos_sim
      |  FROM c JOIN q USING (bucket) WHERE q_id <> c_id)
      |SELECT q_id, c_id, cos_sim, rn::INT AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos_sim DESC, c_id ASC) AS rn FROM p2
      |) WHERE rn <= 5 ORDER BY q_id ASC, rn ASC""".stripMargin

  /** The `simsearch_graph` / `simsearch_graph_incremental` oracle
    * parts: the 8-bit LSH signature → two 4-bit bands →
    * bounded-degree edge set, then the beam rounds UNROLLED (cosine
    * round-4 with id-asc ties at every rank) and the graph serve
    * judged against the exact-KNN CTE — integer hits, one row per
    * (idx, q). Constants come from graft.operators.SimSearch so the
    * engine and the oracle cannot drift. Multi-consumer CTEs are
    * MATERIALIZED (SURVEY §5.3 discipline). The incremental twin
    * shares the WHOLE chain: its maintenance path provably
    * reproduces the batch graph (top-k merge — SimSearch notes), so
    * its oracle is the batch serve relabeled.
    */
  private def graphDotSql(qa: String, ca: String) =
    s"""round(list_sum(list_transform(range(1, len($qa.q_emb) + 1),
       |      i -> $qa.q_emb[i]::DOUBLE * $ca.c_emb[i]::DOUBLE))
       |    / ($qa.q_nrm * $ca.c_nrm), 4)""".stripMargin

  private lazy val graphServeCtes: String = {
    val degree = graft.operators.SimSearch.GraphDegree
    val beam = graft.operators.SimSearch.GraphBeam
    val hops = graft.operators.SimSearch.GraphHops
    def hop(h: Int) =
      s"""b${h - 1} AS (SELECT q_id, c_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, c_id ASC) AS rn FROM v${h - 1})
         |  WHERE rn <= $beam),
         |f$h AS (SELECT DISTINCT b.q_id, e.dst AS c_id
         |  FROM b${h - 1} b JOIN edges e ON e.src = b.c_id),
         |n$h AS (SELECT f.q_id, f.c_id, ${graphDotSql("q", "c")} AS cos_sim
         |  FROM f$h f JOIN q ON q.q_id = f.q_id
         |  JOIN c ON c.c_id = f.c_id WHERE f.c_id <> f.q_id),
         |v$h AS MATERIALIZED (SELECT q_id, c_id, max(cos_sim) AS cos_sim
         |  FROM (SELECT * FROM v${h - 1} UNION ALL SELECT * FROM n$h)
         |  GROUP BY 1, 2)""".stripMargin
    raw"""WITH ${lshWeightCtes(8, 64)},
      |bits AS (SELECT e.vec_id, wv.p,
      |  CASE WHEN list_sum(list_transform(range(1, len(e.embedding) + 1),
      |      i -> e.embedding[i]::DOUBLE * wv.wts[i])) >= 0
      |    THEN (1::BIGINT << p) ELSE 0::BIGINT END AS bit
      |  FROM embeddings e CROSS JOIN wv),
      |bkt AS (SELECT vec_id, sum(bit)::BIGINT AS bucket
      |        FROM bits GROUP BY vec_id),
      |eb AS MATERIALIZED (SELECT e.vec_id, e.embedding,
      |    sqrt(list_sum(list_transform(e.embedding,
      |      x -> x::DOUBLE * x::DOUBLE))) AS nrm, b.bucket
      |  FROM embeddings e JOIN bkt b USING (vec_id)),
      |bands AS MATERIALIZED (
      |  SELECT vec_id, 'h' || (bucket // 16)::VARCHAR AS band FROM eb
      |  UNION ALL
      |  SELECT vec_id, 'l' || (bucket % 16)::VARCHAR AS band FROM eb),
      |pairs AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
      |  FROM bands a JOIN bands b USING (band)
      |  WHERE a.vec_id <> b.vec_id),
      |edges AS MATERIALIZED (SELECT src, dst FROM (
      |  SELECT p.src, p.dst, row_number() OVER (PARTITION BY p.src
      |      ORDER BY round(list_sum(list_transform(
      |          range(1, len(s.embedding) + 1),
      |          i -> s.embedding[i]::DOUBLE * d.embedding[i]::DOUBLE))
      |        / (s.nrm * d.nrm), 4) DESC, p.dst ASC) AS rn
      |  FROM pairs p JOIN eb s ON s.vec_id = p.src
      |  JOIN eb d ON d.vec_id = p.dst) WHERE rn <= $degree),
      |q AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS q_emb,
      |    nrm AS q_nrm FROM eb WHERE vec_id < 10),
      |c AS MATERIALIZED (SELECT vec_id AS c_id, embedding AS c_emb,
      |    nrm AS c_nrm FROM eb),
      |v0 AS MATERIALIZED (SELECT q.q_id, c.c_id,
      |    ${graphDotSql("q", "c")} AS cos_sim
      |  FROM q CROSS JOIN c
      |  WHERE c.c_id % 127 = 0 AND c.c_id <> q.q_id),
      |${(1 to hops).map(hop).mkString(",\n")},
      |ex AS MATERIALIZED (SELECT q_id, c_id FROM (
      |  SELECT q.q_id, c.c_id, row_number() OVER (PARTITION BY q.q_id
      |      ORDER BY ${graphDotSql("q", "c")} DESC, c.c_id ASC) AS rn
      |  FROM c CROSS JOIN q WHERE q.q_id <> c.c_id) WHERE rn <= 5),
      |gsv AS (SELECT q_id, c_id FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos_sim DESC, c_id ASC) AS rn FROM v$hops) WHERE rn <= 5),
      |ghit AS (SELECT s.q_id, count(*)::BIGINT AS hits FROM gsv s
      |  JOIN ex ON ex.q_id = s.q_id AND ex.c_id = s.c_id GROUP BY 1),
      |gscn AS (SELECT q_id, count(*)::BIGINT AS candidates_scanned
      |  FROM v$hops GROUP BY 1)""".stripMargin
  }

  private lazy val simsearchGraphOracleSql: String =
    graphServeCtes + ",\n" + raw"""cbv AS MATERIALIZED (SELECT vec_id AS cent_id, embedding AS c_v,
      |    nrm AS cnrm FROM eb WHERE vec_id % 127 = 0),
      |asg AS MATERIALIZED (SELECT c_id, cent_id FROM (
      |  SELECT e.vec_id AS c_id, cb2.cent_id,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_sum(list_transform(range(1, len(e.embedding) + 1),
      |        i -> e.embedding[i]::DOUBLE * (cb2.c_v[i]::DOUBLE / cb2.cnrm)))
      |      DESC, cb2.cent_id ASC) AS rn
      |  FROM eb e CROSS JOIN cbv cb2) WHERE rn = 1),
      |qcell AS (SELECT q_id, cent_id FROM (
      |  SELECT q.q_id, cb2.cent_id,
      |    row_number() OVER (PARTITION BY q.q_id ORDER BY
      |      list_sum(list_transform(range(1, len(q.q_emb) + 1),
      |        i -> q.q_emb[i]::DOUBLE * cb2.c_v[i]::DOUBLE))
      |      / (q.q_nrm * cb2.cnrm) DESC, cb2.cent_id ASC) AS rn
      |  FROM q CROSS JOIN cbv cb2) WHERE rn <= 2),
      |iv AS MATERIALIZED (SELECT q.q_id, a.c_id,
      |    ${graphDotSql("q", "c")} AS cos_sim
      |  FROM qcell JOIN asg a USING (cent_id)
      |  JOIN q ON q.q_id = qcell.q_id JOIN c ON c.c_id = a.c_id
      |  WHERE qcell.q_id <> a.c_id),
      |isv AS (SELECT q_id, c_id FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos_sim DESC, c_id ASC) AS rn FROM iv) WHERE rn <= 5),
      |ihit AS (SELECT s.q_id, count(*)::BIGINT AS hits FROM isv s
      |  JOIN ex ON ex.q_id = s.q_id AND ex.c_id = s.c_id GROUP BY 1),
      |iscn AS (SELECT q_id, count(*)::BIGINT AS candidates_scanned
      |  FROM iv GROUP BY 1)
      |SELECT idx, q_id, hits, recall, candidates_scanned FROM (
      |  SELECT 'graph' AS idx, n.q_id,
      |    coalesce(h.hits, 0)::BIGINT AS hits,
      |    round(coalesce(h.hits, 0)::DOUBLE / 5.0, 4) AS recall,
      |    n.candidates_scanned
      |  FROM gscn n LEFT JOIN ghit h ON h.q_id = n.q_id
      |  UNION ALL
      |  SELECT 'ivf', n.q_id, coalesce(h.hits, 0)::BIGINT,
      |    round(coalesce(h.hits, 0)::DOUBLE / 5.0, 4),
      |    n.candidates_scanned
      |  FROM iscn n LEFT JOIN ihit h ON h.q_id = n.q_id)
      |ORDER BY idx ASC, q_id ASC""".stripMargin

  private lazy val simsearchGraphIncrOracleSql: String =
    graphServeCtes + "\n" + raw"""SELECT 'graph_incr' AS idx, n.q_id,
      |  coalesce(h.hits, 0)::BIGINT AS hits,
      |  round(coalesce(h.hits, 0)::DOUBLE / 5.0, 4) AS recall,
      |  n.candidates_scanned
      |FROM gscn n LEFT JOIN ghit h ON h.q_id = n.q_id
      |ORDER BY n.q_id ASC""".stripMargin

  /** The `simsearch_graph_delete` oracle: the shared batch-graph
    * serve chain, with ground truth over the SURVIVOR corpus and the
    * tombstone mask applied at emit only — scanned still counts the
    * waypoints (v-chain unfiltered).
    */
  private lazy val simsearchGraphDelOracleSql: String = {
    val hops = graft.operators.SimSearch.GraphHops
    graphServeCtes + ",\n" + raw"""exd AS MATERIALIZED (SELECT q_id, c_id FROM (
      |  SELECT q.q_id, c.c_id, row_number() OVER (PARTITION BY q.q_id
      |      ORDER BY ${graphDotSql("q", "c")} DESC, c.c_id ASC) AS rn
      |  FROM c CROSS JOIN q
      |  WHERE q.q_id <> c.c_id AND c.c_id % 17 <> 3) WHERE rn <= 5),
      |dsv AS (SELECT q_id, c_id FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos_sim DESC, c_id ASC) AS rn
      |  FROM v$hops WHERE c_id % 17 <> 3) WHERE rn <= 5),
      |dhit AS (SELECT s.q_id, count(*)::BIGINT AS hits FROM dsv s
      |  JOIN exd ON exd.q_id = s.q_id AND exd.c_id = s.c_id GROUP BY 1)
      |SELECT 'graph_del' AS idx, n.q_id,
      |  coalesce(h.hits, 0)::BIGINT AS hits,
      |  round(coalesce(h.hits, 0)::DOUBLE / 5.0, 4) AS recall,
      |  n.candidates_scanned
      |FROM gscn n LEFT JOIN dhit h ON h.q_id = n.q_id
      |ORDER BY n.q_id ASC""".stripMargin
  }

  /** The `simsearch_graph_filtered` oracle: shared serve chain;
    * label-match at emit only, ground truth label-constrained,
    * scanned = the unfiltered walk.
    */
  private lazy val simsearchGraphFiltOracleSql: String = {
    val hops = graft.operators.SimSearch.GraphHops
    graphServeCtes + ",\n" + raw"""lbl AS MATERIALIZED (
      |  SELECT vec_id, label FROM embeddings),
      |fex AS MATERIALIZED (SELECT q_id, c_id FROM (
      |  SELECT q.q_id, c.c_id, row_number() OVER (PARTITION BY q.q_id
      |      ORDER BY ${graphDotSql("q", "c")} DESC, c.c_id ASC) AS rn
      |  FROM c CROSS JOIN q
      |  JOIN lbl cl ON cl.vec_id = c.c_id
      |  JOIN lbl ql ON ql.vec_id = q.q_id
      |  WHERE q.q_id <> c.c_id AND cl.label = ql.label) WHERE rn <= 5),
      |fsv AS (SELECT q_id, c_id FROM (
      |  SELECT v.q_id, v.c_id, row_number() OVER (PARTITION BY v.q_id
      |    ORDER BY v.cos_sim DESC, v.c_id ASC) AS rn
      |  FROM v$hops v
      |  JOIN lbl cl ON cl.vec_id = v.c_id
      |  JOIN lbl ql ON ql.vec_id = v.q_id
      |  WHERE cl.label = ql.label) WHERE rn <= 5),
      |fhit AS (SELECT s.q_id, count(*)::BIGINT AS hits FROM fsv s
      |  JOIN fex ON fex.q_id = s.q_id AND fex.c_id = s.c_id GROUP BY 1)
      |SELECT 'graph_filt' AS idx, n.q_id,
      |  coalesce(h.hits, 0)::BIGINT AS hits,
      |  round(coalesce(h.hits, 0)::DOUBLE / 5.0, 4) AS recall,
      |  n.candidates_scanned
      |FROM gscn n LEFT JOIN fhit h ON h.q_id = n.q_id
      |ORDER BY n.q_id ASC""".stripMargin
  }

  /** The `simsearch_graph_persisted` oracle: the artifact round trip
    * is lossless, so the oracle is the batch-graph serve relabeled.
    */
  private lazy val simsearchGraphStoreOracleSql: String =
    graphServeCtes + "\n" + raw"""SELECT 'graph_store' AS idx, n.q_id,
      |  coalesce(h.hits, 0)::BIGINT AS hits,
      |  round(coalesce(h.hits, 0)::DOUBLE / 5.0, 4) AS recall,
      |  n.candidates_scanned
      |FROM gscn n LEFT JOIN ghit h ON h.q_id = n.q_id
      |ORDER BY n.q_id ASC""".stripMargin

  /** Unrolled integer-Lloyd CTE chain for the `simsearch_ivf_kmeans`
    * oracle: quantize the stride sample to 1e-6 BIGINT units, init from
    * the first kCents sample vectors, then nIter exact iterations —
    * assignment by argmax(2·dot − ‖c‖², integer, ties to lowest cent),
    * update by floor-division means (DuckDB `//` = Math.floorDiv),
    * empty cells keeping their centroid. Integer sums are associative,
    * so both engines agree bit-for-bit regardless of aggregation order.
    * MATERIALIZED per the chained-CTE discipline (SURVEY §5.3). Yields
    * `c{nIter}` (cent, i, v) — the learned codebook in long form.
    */
  private def lloydCtes(kCents: Int, nIter: Int,
      sampleStride: Long): String = {
    val init =
      s"""dims AS (SELECT unnest(range(1, 65)) AS i),
         |sl AS MATERIALIZED (
         |  SELECT e.vec_id AS s_id, d.i,
         |    floor(e.embedding[d.i]::DOUBLE * 1000000 + 0.5)::BIGINT AS v
         |  FROM embeddings e CROSS JOIN dims d
         |  WHERE e.vec_id % $sampleStride = 0),
         |c0 AS MATERIALIZED (
         |  SELECT dense_rank() OVER (ORDER BY s_id) - 1 AS cent, i, v
         |  FROM sl WHERE s_id IN (SELECT s_id FROM (
         |    SELECT DISTINCT s_id FROM sl ORDER BY s_id LIMIT $kCents)))"""
        .stripMargin
    val iters = (0 until nIter).map { n =>
      s"""a$n AS MATERIALIZED (SELECT s_id, cent FROM (
         |  SELECT d.s_id, d.cent, row_number() OVER (PARTITION BY d.s_id
         |    ORDER BY d.dot2 - n.nsq DESC, d.cent ASC) AS rn
         |  FROM (SELECT s.s_id, c.cent, 2 * sum(s.v * c.v) AS dot2
         |        FROM sl s JOIN c$n c USING (i) GROUP BY 1, 2) d
         |  JOIN (SELECT cent, sum(v * v) AS nsq FROM c$n GROUP BY 1) n
         |    USING (cent)) WHERE rn = 1),
         |c${n + 1} AS MATERIALIZED (
         |  SELECT p.cent, p.i, coalesce(u.nv, p.v) AS v
         |  FROM c$n p LEFT JOIN (
         |    SELECT a.cent, s.i, sum(s.v) // count(*) AS nv
         |    FROM a$n a JOIN sl s ON a.s_id = s.s_id GROUP BY 1, 2) u
         |  ON p.cent = u.cent AND p.i = u.i)""".stripMargin
    }
    (init +: iters).mkString(",\n")
  }

  /** The IVF probe pipeline as CTEs ending in `p3` (q_id, c_id,
    * cos_sim over the nProbe=2 probed cells) — shared by the
    * `simsearch_ivf` top-k oracle and the `simsearch_range_ivf`
    * radius oracle (same index read path, two query shapes).
    */
  private lazy val ivfProbeCtes: String =
    """WITH cb AS (SELECT vec_id AS cent_id, embedding AS c_v,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> x::DOUBLE * x::DOUBLE))) AS cnrm
      |  FROM embeddings WHERE vec_id % 127 = 0),
      |asg AS (SELECT c_id, c_emb, c_nrm, cent_id FROM (
      |  SELECT e.vec_id AS c_id, e.embedding AS c_emb,
      |    sqrt(list_sum(list_transform(e.embedding,
      |      x -> x::DOUBLE * x::DOUBLE))) AS c_nrm,
      |    cb.cent_id,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_sum(list_transform(range(1, len(e.embedding) + 1),
      |        i -> e.embedding[i]::DOUBLE * (cb.c_v[i]::DOUBLE / cb.cnrm))) DESC,
      |      cb.cent_id ASC) AS rn
      |  FROM embeddings e CROSS JOIN cb) WHERE rn = 1),
      |qc AS (SELECT q_id, q_emb, q_nrm, cent_id FROM (
      |  SELECT e.vec_id AS q_id, e.embedding AS q_emb,
      |    sqrt(list_sum(list_transform(e.embedding,
      |      x -> x::DOUBLE * x::DOUBLE))) AS q_nrm,
      |    cb.cent_id,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_sum(list_transform(range(1, len(e.embedding) + 1),
      |        i -> e.embedding[i]::DOUBLE * cb.c_v[i]::DOUBLE))
      |      / (sqrt(list_sum(list_transform(e.embedding,
      |           x -> x::DOUBLE * x::DOUBLE))) * cb.cnrm) DESC,
      |      cb.cent_id ASC) AS rn
      |  FROM embeddings e CROSS JOIN cb WHERE e.vec_id < 10) WHERE rn <= 2),
      |p3 AS (SELECT q.q_id, a.c_id,
      |  round(list_sum(list_transform(range(1, len(q.q_emb) + 1),
      |      i -> q.q_emb[i]::DOUBLE * a.c_emb[i]::DOUBLE))
      |    / (q.q_nrm * a.c_nrm), 4) AS cos_sim
      |  FROM qc q JOIN asg a USING (cent_id)
      |  WHERE q.q_id <> a.c_id)""".stripMargin

  private lazy val ivfOracleSql: String =
    ivfProbeCtes + "\n" +
    """SELECT q_id, c_id, cos_sim, rn::INT AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos_sim DESC, c_id ASC) AS rn FROM p3
      |) WHERE rn <= 5 ORDER BY q_id ASC, rn ASC""".stripMargin

  /** The `simsearch_range_ivf` oracle: the same probe CTEs, radius
    * filter instead of top-k.
    */
  private lazy val rangeIvfOracleSql: String =
    ivfProbeCtes + "\n" +
    """SELECT q_id, c_id, cos_sim FROM p3 WHERE cos_sim >= 0.30
      |ORDER BY q_id ASC, c_id ASC""".stripMargin

  /** The `mix_epochs` oracle: the epoch table inlined as a VALUES CTE
    * from the SAME spec-as-data list the operator consumes
    * ([[graft.operators.TextOps.DefaultEpochs]]), the md5 coin, and
    * range-unnest for the copies.
    */
  private lazy val mixEpochsSql: String = {
    val vals = graft.operators.TextOps.DefaultEpochs
      .map { case (s, p) => s"('$s', $p)" }.mkString(", ")
    raw"""WITH ep(source, e_pct) AS (VALUES $vals),
      |t AS (SELECT d.doc_id, d.lang, d.source, ep.e_pct,
      |    (('0x' || substring(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
      |      % 100) AS coin
      |  FROM documents d JOIN ep USING (source)),
      |n AS (SELECT doc_id, lang, source,
      |    (e_pct // 100
      |     + CASE WHEN coin < e_pct % 100 THEN 1 ELSE 0 END) AS n_copies
      |  FROM t)
      |SELECT doc_id, lang, source,
      |  unnest(range(0, n_copies))::INT AS copy_id
      |FROM n WHERE n_copies > 0
      |ORDER BY doc_id ASC, copy_id ASC""".stripMargin
  }

  /** The `pipeline_curate_v4` / `pipeline_curate_v6` oracle: the
    * incremental-day composition — seen-store near-dup dedup of the
    * delta (all-pairs exact Jaccard in the m-chain; inherits
    * dedup_minhash_incremental's banding-miss caveat: the engine gates
    * through 8x4 banding, safe because fixture near-dups sit at
    * J >= 0.9), then quality gate → exact dedup → decontaminate →
    * per-language token-budget mix. v4 runs it as ONE batch; v6 runs
    * it as two CDF-fed DAYS whose composition equals the batch (the
    * associativity law PipelineSpec pins), so both share this SQL and
    * differ only in budget.
    */
  private def pipelineCurateIncrSql(budget: Long,
      takedownPred: String = "TRUE"): String =
    raw"""WITH md AS (SELECT doc_id, string_split($normT, ' ') AS toks
      |  FROM documents WHERE len(regexp_extract_all(text, '\S+')) > 0),
      |ms AS (SELECT doc_id, list_distinct(list_transform(
      |    range(0, greatest(len(toks) - 3, 0) + 1),
      |    i -> array_to_string(toks[i+1:i+3], ' '))) AS sh FROM md),
      |mtok AS (SELECT doc_id, unnest(sh) AS g FROM ms),
      |msz AS (SELECT doc_id, count(*) AS n FROM mtok GROUP BY doc_id),
      |mint AS (SELECT n.doc_id AS n_id, o.doc_id AS o_id,
      |    count(*) AS ni
      |  FROM mtok n JOIN mtok o ON n.g = o.g
      |  WHERE n.doc_id % 10 >= 8
      |    AND (o.doc_id % 10 < 8
      |         OR (o.doc_id % 10 >= 8 AND o.doc_id < n.doc_id))
      |  GROUP BY 1, 2),
      |mdrop AS (SELECT DISTINCT n_id FROM mint
      |  JOIN msz sn ON n_id = sn.doc_id
      |  JOIN msz so ON o_id = so.doc_id
      |  WHERE round(ni::DOUBLE / (sn.n::DOUBLE + so.n::DOUBLE
      |      - ni::DOUBLE), 4) >= 0.5),
      |msurv AS (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8
      |  AND doc_id NOT IN (SELECT n_id FROM mdrop)),
      |q0 AS (SELECT doc_id, source, lang, n_chars, text,
      |        $normT AS t FROM documents
      |  WHERE doc_id IN (SELECT doc_id FROM msurv)),
      |m AS (SELECT doc_id, source, lang, t,
      |    len(string_split(t, ' '))::INT AS n_tokens, n_chars,
      |    round(length(replace(t, ' ', ''))::DOUBLE
      |          / len(string_split(t, ' ')), 4) AS mwl
      |  FROM q0),
      |keepq AS (SELECT * FROM m
      |  WHERE lang IN ('en','de','es','fr')
      |    AND n_tokens BETWEEN 3 AND 10000
      |    AND n_chars BETWEEN 20 AND 100000
      |    AND mwl BETWEEN 2.0 AND 12.0),
      |ded AS (SELECT *, row_number() OVER (
      |    PARTITION BY md5(t) ORDER BY doc_id ASC) AS rn FROM keepq),
      |surv AS (SELECT doc_id, lang, n_tokens FROM ded
      |  WHERE rn = 1 AND doc_id % 97 <> 0),
      |g AS (SELECT doc_id, unnest(sh) AS h FROM ms),
      |bench AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0),
      |cont AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (h)
      |  WHERE g.doc_id % 97 <> 0),
      |fin AS (SELECT sv.* FROM surv sv LEFT JOIN cont c
      |  ON sv.doc_id = c.doc_id WHERE c.doc_id IS NULL),
      |mx AS (SELECT doc_id, lang, n_tokens,
      |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS rk
      |  FROM fin WHERE $takedownPred),
      |p AS (SELECT doc_id, lang, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY lang
      |      ORDER BY rk ASC, doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0)::BIGINT AS before_toks
      |  FROM mx)
      |SELECT doc_id, lang, n_tokens,
      |  (before_toks + n_tokens)::BIGINT AS cum_tokens
      |FROM p WHERE before_toks < $budget
      |ORDER BY doc_id ASC""".stripMargin

  /** The `pipeline_curate_v5` oracle: the release-prep composition —
    * quality gate + exact dedup (the v4 keepq/ded CTEs), near-dup
    * decontamination (the decontaminate_minhash CTEs with the %19
    * split), the content-keyed split bucket, and train-only epoch
    * upsampling from the SAME spec-as-data epoch table the operator
    * consumes.
    */
  private lazy val pipelineCurateV5Sql: String = {
    val vals = graft.operators.TextOps.DefaultEpochs
      .map { case (s, p) => s"('$s', $p)" }.mkString(", ")
    raw"""WITH ep(source, e_pct) AS (VALUES $vals),
      |d0 AS (SELECT doc_id, string_split($normT, ' ') AS toks
      |  FROM documents WHERE len(regexp_extract_all(text, '\S+')) > 0),
      |s0 AS (SELECT doc_id, list_distinct(list_transform(
      |    range(0, greatest(len(toks) - 3, 0) + 1),
      |    i -> array_to_string(toks[i+1:i+3], ' '))) AS sh FROM d0),
      |tok AS (SELECT doc_id, unnest(sh) AS g FROM s0),
      |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      |inter AS (SELECT c.doc_id AS c_id, b.doc_id AS b_id,
      |    count(*) AS ni
      |  FROM tok c JOIN tok b ON c.g = b.g
      |  WHERE c.doc_id % 19 <> 0 AND b.doc_id % 19 = 0
      |  GROUP BY 1, 2),
      |cont AS (SELECT DISTINCT c_id AS doc_id FROM inter
      |  JOIN sz sc ON c_id = sc.doc_id
      |  JOIN sz sb ON b_id = sb.doc_id
      |  WHERE round(ni::DOUBLE / (sc.n::DOUBLE + sb.n::DOUBLE
      |      - ni::DOUBLE), 4) >= 0.5),
      |m AS (SELECT doc_id, source, lang, $normT AS t,
      |    len(string_split($normT, ' '))::INT AS n_tokens, n_chars,
      |    round(length(replace($normT, ' ', ''))::DOUBLE
      |          / len(string_split($normT, ' ')), 4) AS mwl
      |  FROM documents),
      |keepq AS (SELECT * FROM m
      |  WHERE lang IN ('en','de','es','fr')
      |    AND n_tokens BETWEEN 3 AND 10000
      |    AND n_chars BETWEEN 20 AND 100000
      |    AND mwl BETWEEN 2.0 AND 12.0),
      |ded AS (SELECT *, row_number() OVER (
      |    PARTITION BY md5(t) ORDER BY doc_id ASC) AS rn FROM keepq),
      |clean AS (SELECT dd.doc_id, dd.lang, dd.source, dd.t FROM ded dd
      |  LEFT JOIN cont c ON dd.doc_id = c.doc_id
      |  WHERE dd.rn = 1 AND dd.doc_id % 19 <> 0 AND c.doc_id IS NULL),
      |ws AS (SELECT doc_id, lang, source,
      |    CASE (('0x' || substring(md5(t), 1, 8))::BIGINT % 100)
      |      WHEN 0 THEN 'test' WHEN 1 THEN 'val' ELSE 'train' END
      |      AS split
      |  FROM clean),
      |n AS (SELECT ws.doc_id, ws.lang, ws.source, ws.split,
      |    CASE WHEN ws.split <> 'train' THEN 1
      |         ELSE (ep.e_pct // 100
      |           + CASE WHEN ('0x' || substring(
      |               md5(ws.doc_id::VARCHAR), 1, 8))::BIGINT % 100
      |               < ep.e_pct % 100 THEN 1 ELSE 0 END)
      |    END AS n_copies
      |  FROM ws JOIN ep USING (source))
      |SELECT doc_id, lang, source, split,
      |  unnest(range(0, n_copies))::INT AS copy_id
      |FROM n WHERE n_copies > 0
      |ORDER BY doc_id ASC, copy_id ASC""".stripMargin
  }

  /** The IVFPQ oracle — shared verbatim by `simsearch_ivfpq` and
    * the persisted-index round trip `simsearch_index_persisted`
    * (same codebooks, deterministic encode, lossless BIGINT
    * artifact). `simsearch_index_incremental` consumes the SAME
    * template with the codebook CTEs restricted to the STORE
    * (yesterday's pinned quantizers): encode is row-local and
    * deterministic, so store-encode ∪ delta-encode ≡ the full-corpus
    * encode this SQL computes under those codebooks.
    */
  private def ivfPqOracle(cbFilter: String,
      candFilter: String = ""): String =
      s"""WITH cbc AS (SELECT vec_id AS cent_id, embedding AS c_v,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS cnrm
        |  FROM embeddings WHERE ${cbFilter}vec_id % 127 = 0),
        |asg AS (SELECT c_id, cent_id FROM (
        |  SELECT e.vec_id AS c_id, cbc.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> e.embedding[i]::DOUBLE
        |           * (cbc.c_v[i]::DOUBLE / cbc.cnrm))) DESC,
        |      cbc.cent_id ASC) AS rn
        |  FROM embeddings e CROSS JOIN cbc) WHERE rn = 1),
        |qc AS (SELECT q_id, cent_id FROM (
        |  SELECT e.vec_id AS q_id, cbc.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> e.embedding[i]::DOUBLE * cbc.c_v[i]::DOUBLE))
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |           x -> x::DOUBLE * x::DOUBLE))) * cbc.cnrm) DESC,
        |      cbc.cent_id ASC) AS rn
        |  FROM embeddings e CROSS JOIN cbc WHERE e.vec_id < 10)
        |  WHERE rn <= 2),
        |cbp AS (SELECT vec_id AS code, embedding AS cv
        |  FROM embeddings WHERE ${cbFilter}vec_id % 61 = 0
        |  ORDER BY vec_id LIMIT 256),
        |ss AS (SELECT unnest(range(0, 4)) AS s),
        |codes AS (SELECT c_id, s, code FROM (
        |  SELECT e.vec_id AS c_id, r.s, cbp.code,
        |    row_number() OVER (PARTITION BY e.vec_id, r.s ORDER BY
        |      (list_sum(list_transform(range(1, 17),
        |         i -> e.embedding[r.s * 16 + i]::DOUBLE
        |            * cbp.cv[r.s * 16 + i]::DOUBLE))
        |       - list_sum(list_transform(range(1, 17),
        |         i -> cbp.cv[r.s * 16 + i]::DOUBLE
        |            * cbp.cv[r.s * 16 + i]::DOUBLE)) / 2) DESC,
        |      cbp.code ASC) AS rn
        |  FROM embeddings e CROSS JOIN ss r CROSS JOIN cbp) WHERE rn = 1),
        |lut AS (SELECT q.vec_id AS q_id, r.s, cbp.code,
        |    round(list_sum(list_transform(range(1, 17),
        |      i -> q.embedding[r.s * 16 + i]::DOUBLE
        |         * cbp.cv[r.s * 16 + i]::DOUBLE)) * 1000000.0, 0)::BIGINT
        |      AS pdot_u
        |  FROM embeddings q CROSS JOIN ss r CROSS JOIN cbp
        |  WHERE q.vec_id < 10),
        |cand AS (SELECT q.q_id, a.c_id FROM asg a
        |  JOIN qc q USING (cent_id) WHERE a.c_id <> q.q_id$candFilter),
        |sc AS (SELECT cand.q_id, cand.c_id, sum(l.pdot_u) AS score_u
        |  FROM cand JOIN codes c ON c.c_id = cand.c_id
        |  JOIN lut l ON l.q_id = cand.q_id AND l.s = c.s
        |    AND l.code = c.code
        |  GROUP BY 1, 2)
        |SELECT q_id, c_id,
        |  round(score_u::DOUBLE / 1000000.0, 6) AS approx_score,
        |  rn::INT AS rn
        |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY score_u DESC, c_id ASC) AS rn FROM sc)
        |WHERE rn <= 5 ORDER BY q_id ASC, rn ASC""".stripMargin

  private lazy val ivfPqOracleSql: String = ivfPqOracle("")

  /** lake_write_cdf's oracle — two INDEPENDENT snapshot diffs, each
    * row stamped with ITS commit — shared VERBATIM by the streaming
    * producer twin `stream_write_cdf_ok` (the shared-oracle
    * precedent): both declare the captured feed of the same planted
    * three-commit churn.
    */
  private lazy val lakeWriteCdfOracle: String = {
    def diff(a: String, b: String, v: Int) =
      s"""  SELECT $b.*, 'insert' AS _change_type,
         |    $v AS _commit_version FROM $b
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM $a WHERE $a.o_orderkey = $b.o_orderkey)
         |  UNION ALL
         |  SELECT $a.*, 'delete', $v FROM $a
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM $b WHERE $b.o_orderkey = $a.o_orderkey)
         |  UNION ALL
         |  SELECT $a.*, 'update_preimage', $v FROM $a
         |  WHERE o_orderkey IN (SELECT o_orderkey FROM upd$v)
         |  UNION ALL
         |  SELECT $b.*, 'update_postimage', $v FROM $b
         |  WHERE o_orderkey IN (SELECT o_orderkey FROM upd$v)""".stripMargin
    s"""WITH base AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
       |s0 AS (SELECT * FROM base WHERE o_orderkey % 3 <> 0),
       |s1 AS (SELECT o_orderkey, o_orderstatus,
       |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0
       |         ELSE o_totalprice END AS o_totalprice
       |  FROM base WHERE o_orderkey % 19 <> 0),
       |s2 AS (SELECT o_orderkey, o_orderstatus,
       |    CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 2000.0
       |         ELSE o_totalprice END AS o_totalprice
       |  FROM s1 WHERE o_orderkey % 23 <> 0),
       |upd1 AS (SELECT s0.o_orderkey FROM s0 JOIN s1 USING (o_orderkey)
       |  WHERE s0.o_totalprice <> s1.o_totalprice
       |     OR s0.o_orderstatus <> s1.o_orderstatus),
       |upd2 AS (SELECT s1.o_orderkey FROM s1 JOIN s2 USING (o_orderkey)
       |  WHERE s1.o_totalprice <> s2.o_totalprice
       |     OR s1.o_orderstatus <> s2.o_orderstatus)
       |SELECT o_orderkey, o_orderstatus, o_totalprice, _change_type,
       |  CAST(_commit_version AS INTEGER) AS _commit_version FROM (
       |${diff("s0", "s1", 1)}
       |  UNION ALL
       |${diff("s1", "s2", 2)})
       |ORDER BY o_orderkey ASC, _commit_version ASC,
       |  _change_type ASC""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    // --- §2.A ---
    "scan_parquet" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey ASC",
    "scan_projection_pushdown" ->
      """SELECT l_orderkey, l_extendedprice FROM lineitem
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey ASC, l_extendedprice ASC""".stripMargin,
    "preview" ->
      "SELECT * FROM orders ORDER BY o_orderkey ASC LIMIT 10",
    "sink_parquet" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > 400000.0 ORDER BY o_orderkey ASC""".stripMargin,
    "sink_partitioned" ->
      "SELECT p_partkey, p_brand, p_size FROM part ORDER BY p_partkey ASC",
    // the pruning itself is a plan property (PlanShapeSpec pins
    // PartitionFilters + files-read); the oracle gates the VALUES the
    // pruned read returns, incl. the '#'→'%23' dir-name round-trip
    "scan_partition_prune" ->
      """SELECT p_partkey, p_brand, p_size FROM part
        |WHERE p_brand = 'Brand#13' ORDER BY p_partkey ASC""".stripMargin,
    "sink_append" ->
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
        |WHERE o_orderstatus IN ('F','O')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus ASC""".stripMargin,
    "sink_replace_partition" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
        |ORDER BY o_orderkey ASC""".stripMargin,
    // schema-drift append: pre-evolution rows must surface NULL for the
    // late-added column through the mergeSchema read
    "sink_schema_evolution" ->
      """SELECT o_orderkey, o_totalprice, NULL::VARCHAR AS o_orderpriority
        |FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_orderkey ASC""".stripMargin,
    "join_bucketed" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment ASC""".stripMargin,
    // lake_history/lake_vacuum (r7 #5): the versioned write path's
    // OBSERVABLE contract — which versions exist, the pinned per-write
    // file count (8 round-robin writer tasks, all non-empty at every
    // fixture SF), the latest flag, each snapshot's exact row count,
    // and (vacuum) how many snapshots were physically deleted
    "lake_history" ->
      """SELECT 0 AS version, 8 AS n_files, FALSE AS is_latest,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 400000.0) AS n_rows
        |UNION ALL
        |SELECT 1, 8, FALSE,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 300000.0)
        |UNION ALL
        |SELECT 2, 8, TRUE,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 200000.0)
        |ORDER BY version ASC""".stripMargin,
    // pinned-version reads: each version's content recomputed from the
    // source slice that produced it
    "lake_time_travel" ->
      """SELECT 0 AS version,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 200000.0)
        |    AS n_rows,
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |   FROM orders WHERE o_totalprice > 200000.0) AS revenue
        |UNION ALL
        |SELECT 1,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 300000.0),
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |   FROM orders WHERE o_totalprice > 300000.0)
        |UNION ALL
        |SELECT 2,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 400000.0),
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |   FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY version ASC""".stripMargin,
    // Lake.report's generated GROUPING SETS card, replicated literally:
    // level = '+'-joined live dims ('all' for the grand total), grouped-
    // out dims render '(all)', real NULLs '(null)'; SUMs cast ::BIGINT
    // (the corpus_report dtype class — DuckDB HUGEINT would land float64)
    "lake_report" ->
      raw"""SELECT coalesce(nullif(concat_ws('+',
        |    CASE WHEN grouping(lang) = 0 THEN 'lang' END,
        |    CASE WHEN grouping(source) = 0 THEN 'source' END), ''),
        |    'all') AS level,
        |  CASE WHEN grouping(lang) = 1 THEN '(all)'
        |       ELSE coalesce(CAST(lang AS VARCHAR), '(null)') END AS lang,
        |  CASE WHEN grouping(source) = 1 THEN '(all)'
        |       ELSE coalesce(CAST(source AS VARCHAR), '(null)') END
        |    AS source,
        |  COUNT(1) AS n_rows,
        |  SUM(n_chars)::BIGINT AS sum_n_chars
        |FROM documents
        |GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
        |ORDER BY level ASC, lang ASC, source ASC""".stripMargin,
    "lake_report_counts" ->
      raw"""SELECT coalesce(nullif(concat_ws('+',
        |    CASE WHEN grouping(lang) = 0 THEN 'lang' END), ''),
        |    'all') AS level,
        |  CASE WHEN grouping(lang) = 1 THEN '(all)'
        |       ELSE coalesce(CAST(lang AS VARCHAR), '(null)') END AS lang,
        |  COUNT(1) AS n_rows
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), ())
        |ORDER BY level ASC, lang ASC""".stripMargin,
    "lake_vacuum" ->
      """SELECT 2 AS version, 8 AS n_files, FALSE AS is_latest,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 200000.0) AS n_rows,
        |  2 AS n_dropped
        |UNION ALL
        |SELECT 3, 8, TRUE,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 100000.0), 2
        |ORDER BY version ASC""".stripMargin,
    // clone-aware vacuum lifecycle: refusal + atomicity + pin release,
    // each field an assertion; slice counts recomputed from orders
    "lake_vacuum_safe" ->
      """SELECT TRUE AS refused, 3 AS n_versions_on_refusal,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 200000.0)
        |    AS clone_rows,
        |  2 AS n_dropped_after_release, TRUE AS final_is_head_only,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 400000.0)
        |    AS head_rows,
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS DOUBLE) FROM orders WHERE o_totalprice > 400000.0)
        |    AS head_revenue""".stripMargin,
    // evolved-history read: v0's raw meta stays 2-col while its
    // evolved read fills the added column with NULL for every row;
    // v1 reads as-is — all three cardinalities from the slice defs
    "lake_schema_evolution" ->
      """SELECT 0 AS version, 2 AS n_cols_raw,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 400000.0)
        |    AS n_rows,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 400000.0)
        |    AS null_status_rows
        |UNION ALL
        |SELECT 1, 3,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 300000.0),
        |  0
        |ORDER BY version ASC""".stripMargin,
    // retention coordination lifecycle: constants pin the reap +
    // refusal, head/tail cardinalities recompute from the churn moduli
    // (v3 = the %19/%23/%29 filter chain; the %3 slice was REPLACED by
    // the v1 full-base commit, so it does not constrain the head)
    "lake_vacuum_cdf" ->
      """WITH v3 AS (SELECT o_orderkey FROM orders
        |  WHERE o_orderkey % 19 <> 0 AND o_orderkey % 23 <> 0
        |    AND o_orderkey % 29 <> 0)
        |SELECT TRUE AS refused, 4 AS n_dropped, 1 AS n_cdf_left,
        |  TRUE AS final_is_head_only,
        |  (SELECT count(*) FROM v3) AS head_rows,
        |  (SELECT 2 * count(*) FROM v3 WHERE o_orderkey % 13 = 0)
        |    AS tail_rows,
        |  (SELECT count(*) FROM v3 WHERE o_orderkey % 13 = 0)
        |    AS tail_update_keys""".stripMargin,
    // CDF between pinned versions: the oracle recomputes both snapshot
    // definitions directly from orders and diffs them — inserts/deletes
    // via NOT EXISTS, updates via value inequality (+1000.0 is exact in
    // binary, so repriced rows differ deterministically in both engines)
    // restore = forward publish of the pinned content: v3 == v0 by
    // definition, so the oracle recomputes the three filter snapshots
    // and repeats v0's aggregates as the restored latest
    "lake_restore" ->
      """WITH v AS (
        |  SELECT 0 AS version, 200000.0 AS t UNION ALL
        |  SELECT 1, 300000.0 UNION ALL SELECT 2, 400000.0 UNION ALL
        |  SELECT 3, 200000.0)
        |SELECT v.version,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > v.t)
        |    AS n_rows,
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS DOUBLE) FROM orders WHERE o_totalprice > v.t)
        |    AS revenue,
        |  v.version = 3 AS is_latest
        |FROM v ORDER BY version ASC""".stripMargin,
    // the streaming CDF consumer: replica(v0) + captured commit 1 +
    // captured commit 2, folded commit-by-commit — the final replica
    // is the v2 snapshot definition recomputed directly from orders
    "stream_cdf_apply_ok" ->
      """WITH s1 AS (SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 19 <> 0)
        |SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 2000.0
        |       ELSE o_totalprice END AS o_totalprice
        |FROM s1 WHERE o_orderkey % 23 <> 0
        |ORDER BY o_orderkey ASC""".stripMargin,
    // apply(v0, changes(0,1)) must reconstruct v1: the oracle is the
    // v1 snapshot definition recomputed directly
    "lake_apply_changes" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey % 19 <> 0
        |ORDER BY o_orderkey ASC""".stripMargin,
    "lake_changes" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |s0 AS (SELECT * FROM base WHERE o_orderkey % 3 <> 0),
        |s1 AS (SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base WHERE o_orderkey % 19 <> 0),
        |upd AS (SELECT s0.o_orderkey FROM s0 JOIN s1 USING (o_orderkey)
        |  WHERE s0.o_totalprice <> s1.o_totalprice
        |     OR s0.o_orderstatus <> s1.o_orderstatus)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, _change_type,
        |  CAST(1 AS INTEGER) AS _commit_version FROM (
        |  SELECT s1.*, 'insert' AS _change_type FROM s1
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM s0 WHERE s0.o_orderkey = s1.o_orderkey)
        |  UNION ALL
        |  SELECT s0.*, 'delete' FROM s0
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM s1 WHERE s1.o_orderkey = s0.o_orderkey)
        |  UNION ALL
        |  SELECT s0.*, 'update_preimage' FROM s0
        |  WHERE o_orderkey IN (SELECT o_orderkey FROM upd)
        |  UNION ALL
        |  SELECT s1.*, 'update_postimage' FROM s1
        |  WHERE o_orderkey IN (SELECT o_orderkey FROM upd))
        |ORDER BY o_orderkey ASC, _change_type ASC""".stripMargin,
    // the clone resolves the PINNED v0 slice, not the source's latest
    "lake_clone" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 200000.0
        |ORDER BY o_orderkey ASC""".stripMargin,
    // write-time capture = two INDEPENDENT snapshot diffs, each row
    // stamped with ITS commit — the per-commit fidelity the range
    // read must preserve (and the v0 insert feed must stay pruned out)
    "lake_write_cdf" -> lakeWriteCdfOracle,
    // the streaming PRODUCER twin: the declared output is the produced
    // table's captured feed over the same planted churn — the
    // shared-oracle precedent, lake_write_cdf's SQL verbatim (a
    // producer that drops/double-applies/reorders a streamed commit,
    // or whose write-time capture mis-diffs the fold, hash-mismatches)
    "stream_write_cdf_ok" -> lakeWriteCdfOracle,
    // dev branch: four slice definitions, two chains — branch v0 pins
    // the source's v0, branch v1 is the branch's own write, src v1 is
    // the source's independent forward write
    "lake_branch" ->
      """WITH v AS (
        |  SELECT 'src' AS chain, 0 AS version, 200000.0 AS t UNION ALL
        |  SELECT 'src', 1, 300000.0 UNION ALL
        |  SELECT 'branch', 0, 200000.0 UNION ALL
        |  SELECT 'branch', 1, 400000.0)
        |SELECT v.chain, v.version,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > v.t)
        |    AS n_rows,
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS DOUBLE) FROM orders WHERE o_totalprice > v.t)
        |    AS revenue
        |FROM v ORDER BY chain ASC, version ASC""".stripMargin,
    // three-way merge, destination-wins: a base key survives unless
    // ours deleted it (%23) or theirs deleted it with ours unchanged
    // (%19 ∧ ¬%5); price takes ours' +500 on %5 (covers the %35
    // update/update and the %5∧%19 update-vs-delete conflicts), else
    // theirs' +1000 on %7, else base; both disjoint insert slices
    // arrive; conflicts = both-changed-differently base keys (both-
    // deleted excluded)
    "lake_merge_branch" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_totalprice > 200000.0),
        |m AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 500.0
        |         WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base
        |  WHERE o_orderkey % 23 <> 0
        |    AND NOT (o_orderkey % 19 = 0 AND o_orderkey % 5 <> 0)
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_totalprice > 150000.0 AND o_totalprice <= 200000.0),
        |c AS (SELECT count(*)::BIGINT AS n_conflicts FROM base
        |  WHERE (o_orderkey % 23 = 0 OR o_orderkey % 5 = 0)
        |    AND (o_orderkey % 19 = 0 OR o_orderkey % 7 = 0)
        |    AND NOT (o_orderkey % 23 = 0 AND o_orderkey % 19 = 0))
        |SELECT m.o_orderkey, m.o_orderstatus, m.o_totalprice,
        |  c.n_conflicts
        |FROM m CROSS JOIN c ORDER BY o_orderkey ASC""".stripMargin,
    // rollback capture: the v2→v1 diff (the UNDO as churn) stamped
    // with the restore commit 3 — inserts resurrect the %23 deletes,
    // updates revert the %11 reprice; s2 ⊆ s1 keys so no delete rows
    "lake_restore_cdf" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |s1 AS (SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base WHERE o_orderkey % 19 <> 0),
        |s2 AS (SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 2000.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM s1 WHERE o_orderkey % 23 <> 0),
        |upd3 AS (SELECT s2.o_orderkey FROM s2 JOIN s1 USING (o_orderkey)
        |  WHERE s2.o_totalprice <> s1.o_totalprice
        |     OR s2.o_orderstatus <> s1.o_orderstatus)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, _change_type,
        |  CAST(3 AS INTEGER) AS _commit_version FROM (
        |  SELECT s1.*, 'insert' AS _change_type FROM s1
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM s2 WHERE s2.o_orderkey = s1.o_orderkey)
        |  UNION ALL
        |  SELECT s2.*, 'delete' FROM s2
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM s1 WHERE s1.o_orderkey = s2.o_orderkey)
        |  UNION ALL
        |  SELECT s2.*, 'update_preimage' FROM s2
        |  WHERE o_orderkey IN (SELECT o_orderkey FROM upd3)
        |  UNION ALL
        |  SELECT s1.*, 'update_postimage' FROM s1
        |  WHERE o_orderkey IN (SELECT o_orderkey FROM upd3))
        |ORDER BY o_orderkey ASC, _change_type ASC""".stripMargin,
    // z-order clustering changes file LAYOUT only — content round-trips
    "sink_zorder" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey ASC""".stripMargin,
    // compaction changes file LAYOUT only — content round-trips
    "sink_compact" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > 300000.0 ORDER BY o_orderkey ASC""".stripMargin,
    // MERGE semantics: target = 'F' orders; source = all orders above
    // the price cut with +100000.0 (exact in binary — bit-identical
    // double arithmetic in both engines); source wins on key collision,
    // unmatched target rows survive
    "merge_upsert" ->
      """WITH tgt AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice
        |  FROM orders WHERE o_orderstatus = 'F'),
        |src AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 100000.0 AS o_totalprice
        |  FROM orders WHERE o_totalprice > 400000.0)
        |SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT t.o_orderkey, t.o_custkey, t.o_totalprice FROM tgt t
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey)
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM src)
        |ORDER BY o_orderkey ASC""".stripMargin,
    // SCD2 semantics: unchanged update rows are no-ops; changed keys
    // close v1 and open v2; the +256.0 delta is exact in binary
    "merge_scd2" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
        |upd AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 256.0
        |         ELSE c_acctbal END AS c_acctbal,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_mktsegment || '-R'
        |         ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer
        |  WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 0
        |     OR c_custkey % 13 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 97 = 0),
        |chg AS (
        |  SELECT u.c_custkey FROM upd u JOIN cur c USING (c_custkey)
        |  WHERE u.c_acctbal <> c.c_acctbal
        |     OR u.c_mktsegment <> c.c_mktsegment)
        |SELECT c_custkey, c_acctbal, c_mktsegment,
        |       valid_from, valid_to, is_current FROM (
        |  SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment,
        |    1 AS valid_from, 2 AS valid_to, FALSE AS is_current
        |  FROM cur c WHERE c.c_custkey IN (SELECT c_custkey FROM chg)
        |  UNION ALL
        |  SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment,
        |    1, NULL::INT, TRUE
        |  FROM cur c
        |  WHERE c.c_custkey NOT IN (SELECT c_custkey FROM chg)
        |  UNION ALL
        |  SELECT u.c_custkey, u.c_acctbal, u.c_mktsegment,
        |    2, NULL::INT, TRUE
        |  FROM upd u WHERE u.c_custkey IN (SELECT c_custkey FROM chg)
        |  UNION ALL
        |  SELECT u.c_custkey, u.c_acctbal, u.c_mktsegment,
        |    2, NULL::INT, TRUE
        |  FROM upd u
        |  WHERE u.c_custkey NOT IN (SELECT c_custkey FROM cur))
        |ORDER BY c_custkey ASC, valid_from ASC""".stripMargin,
    "source_csv" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey ASC",
    "source_json" ->
      "SELECT event_id, user_id, event_type FROM events ORDER BY event_id ASC",
    "source_orc" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_suppkey ASC""".stripMargin,
    "source_xml" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey ASC",
    "source_text" ->
      raw"""SELECT count(*)::BIGINT AS n_lines,
        |  sum(length(regexp_replace(text, '[\r\n]+', ' ', 'g')))::BIGINT
        |    AS total_chars
        |FROM documents""".stripMargin,
    // {SFDIR} is substituted by Verify at dump time (the oracle needs
    // the fixture FILES, not the table views): DuckDB read_blob stats
    // the same *.parquet set the binaryFile source scans. ASSUMES
    // single-file fixture tables (true of every sf* dir) — a multi-part
    // table directory would be listed differently by read_blob vs the
    // recursive binaryFile source, so this oracle is pinned to the
    // driver's single-file fixtures (ADVICE r7)
    "source_binary" ->
      """SELECT list_extract(string_split(filename, '/'), -1) AS file_name,
        |  size AS length
        |FROM read_blob('{SFDIR}/*.parquet')
        |ORDER BY file_name ASC""".stripMargin,
    // static expectation for the fixture-view catalog listing: every
    // fixture table must surface through the real catalog API as a
    // TEMPORARY entry (the Spark tableType for temp views)
    "list_tables_fixture" ->
      """SELECT * FROM (VALUES
        |  ('customer', 'TEMPORARY'), ('documents', 'TEMPORARY'),
        |  ('embeddings', 'TEMPORARY'), ('events', 'TEMPORARY'),
        |  ('lineitem', 'TEMPORARY'), ('nation', 'TEMPORARY'),
        |  ('orders', 'TEMPORARY'), ('part', 'TEMPORARY'),
        |  ('region', 'TEMPORARY'), ('supplier', 'TEMPORARY'))
        |  AS t(table_name, table_type)
        |ORDER BY table_name ASC""".stripMargin,
    // static expected frame for PERMISSIVE corrupt-record ingest: the
    // fixture file is deterministic, so the oracle pins which rows
    // parse, which fields NULL, and where the raw lines land
    "source_json_corrupt" ->
      """SELECT * FROM (VALUES
        |  (NULL::BIGINT, NULL::VARCHAR, NULL::DOUBLE,
        |   '{"id": 5, "name": [broken'),
        |  (NULL::BIGINT, NULL::VARCHAR, NULL::DOUBLE, 'not json at all'),
        |  (1::BIGINT, 'alpha', 10.5, NULL::VARCHAR),
        |  (2, 'beta', 20.0, NULL),
        |  (3, 'gamma', NULL::DOUBLE, NULL),
        |  (4, 'delta', 40.25, NULL),
        |  (6, 'zeta', -1.5, NULL))
        |  AS t(id, name, v, corrupt_raw)
        |ORDER BY id ASC NULLS FIRST, corrupt_raw ASC NULLS FIRST""".stripMargin,
    // canonical-type shadow of table_meta: both engines project their
    // native type names onto int64/utf8/f64/ts (catalog-drift gate)
    "table_meta_types" ->
      """SELECT column_name AS col_name,
        |  CASE column_type WHEN 'BIGINT' THEN 'int64'
        |    WHEN 'VARCHAR' THEN 'utf8' WHEN 'DOUBLE' THEN 'f64'
        |    WHEN 'TIMESTAMP' THEN 'ts'
        |    ELSE lower(column_type) END AS ctype
        |FROM (DESCRIBE orders) ORDER BY col_name ASC""".stripMargin,
    // --- §2.B ---
    "project_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(CAST(l_extendedprice AS DECIMAL(18,4))
        |             * (1 - CAST(l_discount AS DECIMAL(18,4))), 2)::DOUBLE
        |         AS revenue
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey ASC, l_linenumber ASC""".stripMargin,
    "filter_conj" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity < 24.0 AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey ASC, l_linenumber ASC""".stripMargin,
    "filter_in_between_like" ->
      """SELECT p_partkey, p_brand, p_type, p_size FROM part
        |WHERE p_brand IN ('Brand#11','Brand#22','Brand#33')
        |  AND p_size BETWEEN 5 AND 25 AND p_type LIKE 'PROMO%'
        |  AND p_name IS NOT NULL
        |ORDER BY p_partkey ASC""".stripMargin,
    "project_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus ASC, o_orderpriority ASC""".stripMargin,
    "filter_subquery_in" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey ASC""".stripMargin,
    // same ANSI SQL on both engines: NOT IN over a NULL-bearing
    // subquery must collapse to 0 (three-valued logic), while the
    // filtered NOT IN and NOT EXISTS agree on the real count
    "filter_not_in_null" -> Relational.notInNullSql,
    "filter_exists" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_quantity >= 49.5)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l2
        |                  WHERE l2.l_orderkey = o.o_orderkey
        |                    AND l2.l_discount > 0.09)
        |ORDER BY o_orderkey ASC""".stripMargin,
    "scalar_subquery" ->
      """SELECT c_custkey, c_name,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT max(o_totalprice) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c
        |WHERE c_custkey <= 300
        |ORDER BY c_custkey ASC""".stripMargin,
    "join_lateral" ->
      """SELECT o_orderkey, l.lk, l.price
        |FROM orders,
        |LATERAL (SELECT l_linenumber AS lk, l_extendedprice AS price
        |         FROM lineitem WHERE l_orderkey = o_orderkey
        |         ORDER BY l_extendedprice DESC, l_linenumber ASC
        |         LIMIT 1) l
        |ORDER BY o_orderkey ASC""".stripMargin,
    "win_named_sql" ->
      """SELECT event_id,
        |  (rank() OVER w)::INT AS rnk,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w2 AS DOUBLE)
        |    AS cum_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC),
        |       w2 AS (PARTITION BY user_id ORDER BY event_id
        |              ROWS UNBOUNDED PRECEDING)
        |ORDER BY event_id ASC""".stripMargin,
    // --- §2.C ---
    "join_inner_hash" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 450000.0 ORDER BY o_orderkey ASC""".stripMargin,
    "join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_partkey, p_brand, l_quantity
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#11' AND l_quantity > 45.0
        |ORDER BY l_orderkey ASC, l_linenumber ASC""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000.0) c
        |LEFT JOIN (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |           WHERE o_totalprice > 420000.0) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "join_right_outer" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000.0) c
        |RIGHT JOIN (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |            WHERE o_totalprice > 420000.0) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY o_orderkey ASC, c_custkey ASC NULLS FIRST""".stripMargin,
    "join_full_outer" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000.0) c
        |FULL JOIN (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |           WHERE o_totalprice > 420000.0) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey ASC""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT'
        |                    AND o_totalprice > 150000.0)
        |ORDER BY c_custkey ASC""".stripMargin,
    "join_cross" ->
      """SELECT n_nationkey, n_name, r_regionkey, r_name
        |FROM nation CROSS JOIN region
        |ORDER BY n_nationkey ASC, r_regionkey ASC""".stripMargin,
    "join_theta_range" ->
      """SELECT p.event_id AS p_id, e.event_id AS e_id, p.user_id AS user_id
        |FROM events p JOIN events e
        |  ON p.user_id = e.user_id AND e.ts > p.ts
        | AND e.ts <= p.ts + INTERVAL 1 HOUR
        |WHERE p.event_type = 'purchase' AND e.event_type = 'error'
        |ORDER BY p_id ASC, e_id ASC""".stripMargin,
    "join_asof" ->
      """WITH tagged AS (
        |  SELECT o_custkey AS ukey, o_orderdate AS at_ts,
        |         NULL::BIGINT AS event_id, o_orderkey AS o_key, 0 AS side
        |  FROM orders
        |  UNION ALL
        |  SELECT user_id, ts::DATE::TIMESTAMP, event_id, NULL::BIGINT, 1
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT event_id, ukey AS user_id,
        |       last_value(o_key IGNORE NULLS) OVER (
        |         PARTITION BY ukey ORDER BY at_ts ASC, side ASC, o_key ASC NULLS LAST
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey
        |FROM tagged QUALIFY side = 1 ORDER BY event_id ASC""".stripMargin,
    // blocked fuzzy match: candidates from the blocking equi-join,
    // levenshtein only on candidates; both engines implement classic
    // edit distance
    "join_fuzzy" ->
      """SELECT a.c_nationkey AS c_nationkey,
        |  count(*) AS n_fuzzy_pairs,
        |  count(DISTINCT a.c_custkey) AS n_left_members
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey
        | AND length(a.c_name) = length(b.c_name)
        | AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |GROUP BY a.c_nationkey
        |ORDER BY c_nationkey ASC""".stripMargin,
    // the range-split + boundary-carry form is exactly equivalent to
    // the single-window as-of, so its oracle is join_asof's, verbatim
    "join_asof_split" ->
      """WITH tagged AS (
        |  SELECT o_custkey AS ukey, o_orderdate AS at_ts,
        |         NULL::BIGINT AS event_id, o_orderkey AS o_key, 0 AS side
        |  FROM orders
        |  UNION ALL
        |  SELECT user_id, ts::DATE::TIMESTAMP, event_id, NULL::BIGINT, 1
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT event_id, ukey AS user_id,
        |       last_value(o_key IGNORE NULLS) OVER (
        |         PARTITION BY ukey ORDER BY at_ts ASC, side ASC, o_key ASC NULLS LAST
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey
        |FROM tagged QUALIFY side = 1 ORDER BY event_id ASC""".stripMargin,
    "join_asof_forward" ->
      """WITH tagged AS (
        |  SELECT user_id AS ukey, ts::DATE::TIMESTAMP AS at_ts,
        |         event_id, NULL::BIGINT AS o_key, 0 AS side
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT o_custkey, o_orderdate, NULL::BIGINT, o_orderkey, 1
        |  FROM orders
        |)
        |SELECT event_id, ukey AS user_id,
        |       first_value(o_key IGNORE NULLS) OVER (
        |         PARTITION BY ukey ORDER BY at_ts ASC, side ASC, o_key ASC NULLS LAST
        |         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_orderkey
        |FROM tagged QUALIFY side = 0 ORDER BY event_id ASC""".stripMargin,
    // both IGNORE NULLS carries read the same last order row, so key
    // and timestamp stay consistent; gap > Joins.AsOfTolDays days nulls
    // the match — the bound is interpolated from the SAME constant the
    // Spark default uses, so query and oracle cannot drift (ADVICE r7)
    "join_asof_tolerance" ->
      s"""WITH tagged AS (
        |  SELECT o_custkey AS ukey, o_orderdate AS at_ts,
        |         NULL::BIGINT AS event_id, o_orderkey AS o_key, 0 AS side,
        |         o_orderdate AS o_ts
        |  FROM orders
        |  UNION ALL
        |  SELECT user_id, ts::DATE::TIMESTAMP, event_id, NULL::BIGINT, 1,
        |         NULL::TIMESTAMP
        |  FROM events WHERE event_type = 'purchase'
        |), carried AS (
        |  SELECT event_id, ukey, at_ts, side,
        |    last_value(o_key IGNORE NULLS) OVER (
        |      PARTITION BY ukey ORDER BY at_ts ASC, side ASC, o_key ASC NULLS LAST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_key,
        |    last_value(o_ts IGNORE NULLS) OVER (
        |      PARTITION BY ukey ORDER BY at_ts ASC, side ASC, o_key ASC NULLS LAST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_ts
        |  FROM tagged
        |)
        |SELECT event_id, ukey AS user_id,
        |  CASE WHEN date_diff('day', asof_ts, at_ts) <= ${Joins.AsOfTolDays}
        |       THEN asof_key END AS asof_orderkey,
        |  CASE WHEN date_diff('day', asof_ts, at_ts) <= ${Joins.AsOfTolDays}
        |       THEN date_diff('day', asof_ts, at_ts)::INT END AS gap_days
        |FROM carried WHERE side = 1 ORDER BY event_id ASC""".stripMargin,
    // nearest = row-local argmin over the backward and forward carries
    // (both frames over one sorted pass); ties go backward. Runs within
    // events (purchase ↔ nearest error) so both directions compete
    "join_asof_nearest" ->
      """WITH tagged AS (
        |  SELECT user_id AS ukey, ts AS at_ts,
        |         NULL::BIGINT AS event_id, event_id AS o_key, 0 AS side,
        |         ts AS o_ts
        |  FROM events WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, NULL::BIGINT, 1, NULL::TIMESTAMP
        |  FROM events WHERE event_type = 'purchase'
        |), carried AS (
        |  SELECT event_id, ukey, at_ts, side,
        |    last_value(o_key IGNORE NULLS) OVER wb AS back_key,
        |    last_value(o_ts IGNORE NULLS) OVER wb AS back_ts,
        |    first_value(o_key IGNORE NULLS) OVER wf AS fwd_key,
        |    first_value(o_ts IGNORE NULLS) OVER wf AS fwd_ts
        |  FROM tagged
        |  WINDOW
        |    wb AS (PARTITION BY ukey
        |           ORDER BY at_ts ASC, side ASC, o_key ASC NULLS LAST
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY ukey
        |           ORDER BY at_ts ASC, side ASC, o_key ASC NULLS LAST
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT event_id, ukey AS user_id,
        |  CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL::BIGINT
        |       WHEN fwd_ts IS NULL THEN back_key
        |       WHEN back_ts IS NULL THEN fwd_key
        |       WHEN date_diff('microsecond', back_ts, at_ts)
        |            <= date_diff('microsecond', at_ts, fwd_ts)
        |         THEN back_key
        |       ELSE fwd_key END AS nearest_error_id,
        |  CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL::BIGINT
        |       WHEN fwd_ts IS NULL
        |         THEN date_diff('microsecond', back_ts, at_ts)
        |       WHEN back_ts IS NULL
        |         THEN date_diff('microsecond', at_ts, fwd_ts)
        |       ELSE least(date_diff('microsecond', back_ts, at_ts),
        |                  date_diff('microsecond', at_ts, fwd_ts))
        |  END AS gap_us
        |FROM carried WHERE side = 1 ORDER BY event_id ASC""".stripMargin,
    "join_null_safe" ->
      """WITH o AS (SELECT o_orderkey, nullif(o_custkey % 1000, 0) AS k
        |           FROM orders),
        |c AS (SELECT c_custkey, nullif(c_custkey % 1000, 0) AS ck
        |      FROM customer)
        |SELECT (CASE WHEN k IS NULL THEN 'null_keys'
        |        ELSE 'value_keys' END) AS key_class,
        |  count(*) AS n_matches
        |FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.ck
        |GROUP BY 1 ORDER BY key_class ASC""".stripMargin,
    "join_skew_salted" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, s_name
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE l_quantity > 45.0
        |ORDER BY l_orderkey ASC, l_linenumber ASC""".stripMargin,
    "join_multiway" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY n_name ASC""".stripMargin,
    // --- TPC-H-shaped composites (r7 #2): revenue desc + unique-key
    // tiebreaker makes every ORDER BY total, so the LIMIT is
    // deterministic on both engines ---
    "q_shaped_q3" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate  > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q_shaped_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q_shaped_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC""".stripMargin,
    "q_shaped_q22" ->
      """WITH t AS (SELECT
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |      / count(*) AS thr
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey % 10 AS code, count(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_bal
        |FROM customer, t
        |WHERE c_acctbal > thr
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 400000)
        |GROUP BY code
        |ORDER BY code ASC""".stripMargin,
    "q_shaped_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_19')
        |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_12'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation ASC, cust_nation ASC, l_year ASC""".stripMargin,
    "q_shaped_q14" ->
      """SELECT
        |  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
        |    AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
        |  COUNT(1) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate <  TIMESTAMP '1997-10-01'""".stripMargin,
    "q_shaped_q18" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 180)
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "q_shaped_q21" ->
      """SELECT s_name, count(*) AS numwait FROM (
        |  SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
        |  FROM lineitem l1
        |  JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |    AND o.o_orderstatus = 'F'
        |  WHERE l1.l_returnflag = 'R'
        |    AND EXISTS (SELECT 1 FROM lineitem l2
        |                WHERE l2.l_orderkey = l1.l_orderkey
        |                  AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                WHERE l3.l_orderkey = l1.l_orderkey
        |                  AND l3.l_suppkey <> l1.l_suppkey
        |                  AND l3.l_returnflag = 'R')
        |) b JOIN supplier ON s_suppkey = b.l_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 20""".stripMargin,
    "q_shaped_q8" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_10'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
        |    AS DECIMAL(18,4))) AS DOUBLE) AS nation_revenue,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region   ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'ECONOMY'
        |  AND r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY o_year
        |ORDER BY o_year ASC""".stripMargin,
    "q_shaped_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_shaped_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |      AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE rev_dec = (SELECT max(rev_dec) FROM revenue)
        |ORDER BY s_suppkey ASC""".stripMargin,
    "q_shaped_q17" ->
      """WITH b AS (
        |  SELECT l_quantity, l_extendedprice,
        |    SUM(CAST(l_quantity AS BIGINT))
        |      OVER (PARTITION BY l_partkey) AS sum_qty,
        |    COUNT(*) OVER (PARTITION BY l_partkey) AS cnt_qty
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#23')
        |SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_price,
        |  COUNT(1) AS n_small
        |FROM b
        |WHERE CAST(l_quantity AS BIGINT) * 5 * cnt_qty < sum_qty""".stripMargin,
    "q_shaped_q19" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(1) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |         AND l_quantity BETWEEN 1 AND 11)
        |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |         AND l_quantity BETWEEN 10 AND 20)
        |    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        |         AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
    "q_shaped_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    // --- §2.D ---
    "agg_group_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC, l_linestatus ASC""".stripMargin,
    "agg_count_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs,
        |       count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC""".stripMargin,
    // shadow of agg_approx_distinct: the oracle asserts the 5% error
    // contract (TRUE for every group) — a sketch deviating past the
    // bound makes Spark emit FALSE and breaks the hash-match
    "agg_approx_distinct_ok" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS within_5pct
        |FROM events GROUP BY event_type
        |ORDER BY event_type ASC""".stripMargin,
    // fn_hash shadow: sha256 is value-checked cross-engine (hex match);
    // the engine-specific xxhash64/crc32 are checked by cardinality —
    // collision-free on the fixed fixture, so distinct-hash count =
    // distinct-text count deterministically
    "fn_hash_props" ->
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT text) AS n_text,
        |  count(DISTINCT text) AS n_xx64,
        |  count(DISTINCT text) AS n_crc,
        |  count(DISTINCT sha256(text)) AS n_sha,
        |  min(sha256(text)) AS min_sha,
        |  max(sha256(text)) AS max_sha,
        |  TRUE AS crc_in_range
        |FROM documents""".stripMargin,
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_grouping_fn" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  GROUPING(o_orderstatus)::INT AS g_status,
        |  GROUPING(o_orderpriority)::INT AS g_prio
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS LAST,
        |  o_orderpriority ASC NULLS LAST""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  count(*) AS cnt
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |       COUNT(1) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,
    "agg_histogram" ->
      """WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |           FROM orders)
        |SELECT least(floor((o_totalprice - lo) / ((hi - lo) / 10)), 9)::INT
        |         AS bucket,
        |  count(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders, b GROUP BY 1 ORDER BY 1 ASC""".stripMargin,
    // mode pinned to smallest-value-among-most-frequent (raw mode() is
    // engine-arbitrary on ties); median is the interpolated quantile in
    // both engines
    "agg_mode_median" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
        |           FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT l_returnflag, l_quantity AS mode_qty,
        |        row_number() OVER (PARTITION BY l_returnflag
        |          ORDER BY cnt DESC, l_quantity ASC) AS rn FROM c),
        |md AS (SELECT l_returnflag, round(median(l_quantity), 4) AS median_qty
        |       FROM lineitem GROUP BY 1)
        |SELECT m.l_returnflag, m.mode_qty, md.median_qty
        |FROM m JOIN md USING (l_returnflag) WHERE m.rn = 1
        |ORDER BY l_returnflag ASC""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
        |  round(stddev_samp(l_quantity), 6) AS stddev_qty,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(skewness(l_quantity), 3) AS skew_qty,
        |  round(kurtosis(l_quantity), 3) AS kurt_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC""".stripMargin,
    "plan_custom_topk" ->
      """WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |SELECT o_orderpriority, o_orderkey, o_totalprice
        |FROM r WHERE rn <= 3
        |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin,
    "udaf_topk" ->
      """WITH r AS (SELECT o_orderpriority, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |SELECT o_orderpriority,
        |  string_agg(o_orderkey::VARCHAR, ',' ORDER BY rn) AS top_keys
        |FROM r WHERE rn <= 3 GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC""".stripMargin,
    // shape shadow of udaf_typed/udaf_imperative: the signature VALUES
    // are engine hashes, but the group-key set, contributing cardinality
    // (≥1-token predicate — shingle-count parity with the kernel is
    // DedupSpec-asserted), fixed width, and typed≡imperative equality
    // are all relational facts the oracle can state exactly
    "udaf_typed_shape" ->
      raw"""SELECT source, 16 AS sig_len, true AS aggs_equal,
        |  count(*) AS n_docs
        |FROM documents WHERE len(regexp_extract_all(text, '\S+')) > 0
        |GROUP BY source ORDER BY source ASC""".stripMargin,
    "agg_conditional" ->
      """SELECT o_orderpriority,
        |  count_if(o_totalprice > 200000)::BIGINT AS n_big,
        |  bool_and(o_totalprice > 0) AS all_pos,
        |  bool_or(o_orderstatus = 'P') AS any_pending,
        |  arg_max(o_orderkey,
        |    printf('%020.2f|%019d', o_totalprice, o_orderkey)) AS top_order
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC""".stripMargin,
    "agg_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |       FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |       FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS sum_o,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |       FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS sum_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC""".stripMargin,
    "agg_unpivot" ->
      """SELECT s_suppkey, 's_acctbal' AS metric, s_acctbal AS value
        |FROM supplier
        |UNION ALL
        |SELECT s_suppkey, 's_nation_d' AS metric,
        |       s_nationkey::DOUBLE AS value
        |FROM supplier
        |ORDER BY s_suppkey ASC, metric ASC""".stripMargin,
    "agg_having" ->
      """SELECT l_suppkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_suppkey HAVING count(*) > 50
        |ORDER BY l_suppkey ASC""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag ASC""".stripMargin,
    // agg_approx_percentile itself is no-oracle (GK sketch vs t-digest);
    // this shadow pins its rank-error CONTRACT: ok_* are TRUE iff the
    // sketch's answer has rank within (p ± 1/accuracy)·n — a drifting
    // sketch breaks the hash-match (the agg_approx_distinct_ok technique)
    "agg_approx_percentile_ok" ->
      """SELECT l_returnflag, TRUE AS ok_p50, TRUE AS ok_p90,
        |  TRUE AS ok_p99, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC""".stripMargin,
    // hll rollup: the daily-sketch union's estimate must sit within 5%
    // of exact (hash-gated boolean); exact count + day count anchor
    "agg_hll_rollup" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  TRUE AS within_5pct
        |FROM events GROUP BY event_type
        |ORDER BY event_type ASC""".stripMargin,
    // corr/regr_slope from exact decimal moments; the closed-form
    // double expression mirrors the Spark column op for op, so the raw
    // doubles are bit-identical (no rounding — the ts_interpolate rule)
    "agg_corr" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n_rows,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n_rows,
        |  round((n_rows::DOUBLE * sxy - sx * sy)
        |    / (sqrt(n_rows::DOUBLE * sxx - sx * sx)
        |      * sqrt(n_rows::DOUBLE * syy - sy * sy)), 9) AS corr_qp,
        |  round((n_rows::DOUBLE * sxy - sx * sy)
        |    / (n_rows::DOUBLE * sxx - sx * sx), 9) AS slope_qp
        |FROM m ORDER BY l_returnflag ASC""".stripMargin,
    "agg_filter_clause" ->
      """SELECT o_orderstatus,
        |  COUNT(1) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |    FILTER (WHERE quarter(o_orderdate) = 1) AS DOUBLE) AS rev_q1,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |    FILTER (WHERE quarter(o_orderdate) = 4) AS DOUBLE) AS rev_q4,
        |  COUNT(DISTINCT o_custkey)
        |    FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent_custs
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC""".stripMargin,
    // PPS systematic sampling in exact arithmetic: decimal prefix sums,
    // integer tick comparison in 1e-4 units — zero randomness, so the
    // selected row set is engine-identical by construction
    "sample_weighted" ->
      """WITH w AS (SELECT o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,4)) AS wt FROM orders),
        |c AS (SELECT o_orderkey, wt,
        |    SUM(wt) OVER (ORDER BY o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM w),
        |u AS (SELECT o_orderkey, wt,
        |    CAST(cum * 10000 AS BIGINT) AS cum_u,
        |    CAST(wt * 10000 AS BIGINT) AS w_u FROM c)
        |SELECT o_orderkey, CAST(wt AS DOUBLE) AS weight,
        |  cum_u // 100000000000 AS tick
        |FROM u
        |WHERE cum_u // 100000000000 > (cum_u - w_u) // 100000000000
        |ORDER BY o_orderkey ASC""".stripMargin,
    "event_path" ->
      """SELECT user_id,
        |  string_agg(event_type, '>' ORDER BY epoch_ms(ts), event_id)
        |    AS path,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id
        |ORDER BY user_id ASC""".stripMargin,
    // lazy (leftmost-first) regex counts — identical semantics in
    // java.util.regex and DuckDB's RE2, verified on boundary cases
    "event_pattern" ->
      """WITH p AS (
        |  SELECT user_id,
        |    string_agg(CASE event_type WHEN 'view' THEN 'v'
        |        WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
        |        WHEN 'signup' THEN 's' ELSE 'e' END,
        |      '' ORDER BY epoch_ms(ts), event_id) AS codes
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  CAST(length(codes) AS BIGINT) AS n_events,
        |  CAST(len(regexp_extract_all(codes, 'v.*?c.*?p')) AS BIGINT)
        |    AS n_conv,
        |  CAST(len(regexp_extract_all(codes, 'v[^e]*?c[^e]*?p'))
        |    AS BIGINT) AS n_clean_conv
        |FROM p ORDER BY user_id ASC""".stripMargin,
    // gaps-and-islands sessionization (>= gap starts a session —
    // Spark's session_window merges [ts, ts+gap) windows on OVERLAP,
    // so an exactly-gap difference is a new session on both sides)
    "event_pattern_sessioned" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE event_type WHEN 'view' THEN 'v'
        |      WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
        |      WHEN 'signup' THEN 's' ELSE 'e' END AS code,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM e),
        |g AS (SELECT user_id, sess, min(ts) AS session_start,
        |    string_agg(code, '' ORDER BY epoch_ms(ts), event_id) AS codes
        |  FROM s GROUP BY user_id, sess)
        |SELECT user_id,
        |  strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
        |  CAST(length(codes) AS BIGINT) AS n_events,
        |  CAST(len(regexp_extract_all(codes, 'v.*?c.*?p')) AS BIGINT)
        |    AS n_conv,
        |  CAST(len(regexp_extract_all(codes, 'v[^e]*?c[^e]*?p'))
        |    AS BIGINT) AS n_clean_conv
        |FROM g ORDER BY user_id ASC, session_start ASC""".stripMargin,
    // SHOW STATS surface: per-column stats rows from one aggregation
    "table_stats" ->
      """WITH a AS (SELECT count(*) AS n_rows,
        |    count(DISTINCT l_quantity) AS ndv_qty,
        |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nn_qty,
        |    min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |    count(DISTINCT l_extendedprice) AS ndv_px,
        |    CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nn_px,
        |    min(l_extendedprice) AS min_px, max(l_extendedprice) AS max_px,
        |    count(DISTINCT l_discount) AS ndv_disc,
        |    CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nn_disc,
        |    min(l_discount) AS min_disc, max(l_discount) AS max_disc
        |  FROM lineitem)
        |SELECT 'l_discount' AS column_name, n_rows, ndv_disc AS ndv,
        |  nn_disc AS n_nulls, min_disc AS min_v, max_disc AS max_v FROM a
        |UNION ALL
        |SELECT 'l_extendedprice', n_rows, ndv_px, nn_px, min_px, max_px
        |FROM a
        |UNION ALL
        |SELECT 'l_quantity', n_rows, ndv_qty, nn_qty, min_qty, max_qty
        |FROM a
        |ORDER BY column_name ASC""".stripMargin,
    // exact violation counts; pass = (violations == 0) as INT
    "dq_freshness" ->
      """WITH per AS (SELECT event_type, COUNT(*) AS n_events,
        |    max(ts) AS last_ts
        |  FROM events GROUP BY 1),
        |g AS (SELECT max(last_ts) AS gmax FROM per)
        |SELECT event_type, n_events,
        |  strftime(last_ts, '%Y-%m-%d %H:%M:%S') AS last_seen,
        |  ((epoch_ms(gmax) - epoch_ms(last_ts)) // 3600000)::BIGINT
        |    AS lag_hours,
        |  CASE WHEN (epoch_ms(gmax) - epoch_ms(last_ts)) // 3600000
        |            >= 48 THEN 1 ELSE 0 END AS stale
        |FROM per, g
        |ORDER BY event_type ASC""".stripMargin,
    // row-level quarantine: the same rule expressions evaluated per
    // row; the label is the sorted comma-join of failed names — both
    // engines sort the identical string set, so the hash is exact
    "dq_quarantine" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
        |       violated
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
        |  array_to_string(list_sort(list_filter(
        |    [CASE WHEN NOT (l_discount <= 0.05)
        |          THEN 'discount_le_05' END,
        |     CASE WHEN NOT (l_extendedprice > 0.0)
        |          THEN 'price_pos' END,
        |     CASE WHEN NOT (l_quantity >= 1.0) THEN 'qty_ge_1' END,
        |     CASE WHEN NOT (l_quantity <= 25.0) THEN 'qty_le_25' END],
        |    x -> x IS NOT NULL)), ',') AS violated
        |  FROM lineitem) t
        |WHERE violated <> ''
        |ORDER BY l_orderkey ASC, l_linenumber ASC""".stripMargin,
    "dq_checks" ->
      """SELECT check_name, target, violations,
        |  (CASE WHEN violations = 0 THEN 1 ELSE 0 END)::INT AS pass
        |FROM (
        |SELECT 'pk_unique' AS check_name, 'orders.o_orderkey' AS target,
        |  (SELECT (count(*) - count(DISTINCT o_orderkey))::BIGINT
        |     FROM orders) AS violations
        |UNION ALL
        |SELECT 'pk_unique', 'customer.c_custkey',
        |  (SELECT (count(*) - count(DISTINCT c_custkey))::BIGINT
        |     FROM customer)
        |UNION ALL
        |SELECT 'fk_exists', 'lineitem.l_orderkey->orders',
        |  (SELECT count(*)::BIGINT FROM lineitem l
        |     LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |     WHERE o.o_orderkey IS NULL)
        |UNION ALL
        |SELECT 'fk_exists', 'orders.o_custkey->customer',
        |  (SELECT count(*)::BIGINT FROM orders o
        |     LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |     WHERE c.c_custkey IS NULL)
        |UNION ALL
        |SELECT 'not_null', 'customer.c_name',
        |  (SELECT count(CASE WHEN c_name IS NULL THEN 1 END)::BIGINT
        |     FROM customer)
        |UNION ALL
        |SELECT 'range', 'lineitem.l_quantity in [1,50]',
        |  (SELECT count(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50)
        |                     THEN 1 END)::BIGINT FROM lineitem)
        |UNION ALL
        |SELECT 'range_strict', 'lineitem.l_quantity in [1,25]',
        |  (SELECT count(CASE WHEN NOT (l_quantity BETWEEN 1 AND 25)
        |                     THEN 1 END)::BIGINT FROM lineitem)
        |) t
        |ORDER BY check_name ASC, target ASC""".stripMargin,
    // exact-integer KS: cum·tot products in BIGINT; the ks double is
    // one IEEE division of two exactly-representable integers
    "dq_drift" ->
      """WITH c AS (
        |  SELECT lang, n_chars,
        |    SUM(CASE WHEN source IN ('src0','src1','src2','src3')
        |        THEN 1 ELSE 0 END)::BIGINT AS ca,
        |    SUM(CASE WHEN source IN ('src0','src1','src2','src3')
        |        THEN 0 ELSE 1 END)::BIGINT AS cb
        |  FROM documents GROUP BY lang, n_chars),
        |w AS (
        |  SELECT lang,
        |    SUM(ca) OVER (PARTITION BY lang ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |      AS cuma,
        |    SUM(cb) OVER (PARTITION BY lang ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |      AS cumb,
        |    SUM(ca) OVER (PARTITION BY lang)::BIGINT AS ta,
        |    SUM(cb) OVER (PARTITION BY lang)::BIGINT AS tb
        |  FROM c)
        |SELECT lang,
        |  MAX(ABS(cuma*tb - cumb*ta))::BIGINT AS ks_num,
        |  MAX(ta)::BIGINT AS n_a, MAX(tb)::BIGINT AS n_b,
        |  CAST(MAX(ABS(cuma*tb - cumb*ta)) AS DOUBLE)
        |    / (CAST(MAX(ta) AS DOUBLE) * CAST(MAX(tb) AS DOUBLE)) AS ks
        |FROM w GROUP BY lang
        |ORDER BY lang ASC""".stripMargin,
    // sketch-NDV form: estimates are engine-specific, so the oracle
    // pins the exact stats plus the Spark-side within-5% contract bool
    "table_stats_approx" ->
      """WITH a AS (SELECT count(*) AS n_rows,
        |    count(DISTINCT l_quantity) AS ndv_qty,
        |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nn_qty,
        |    min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |    count(DISTINCT l_extendedprice) AS ndv_px,
        |    CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nn_px,
        |    min(l_extendedprice) AS min_px, max(l_extendedprice) AS max_px,
        |    count(DISTINCT l_discount) AS ndv_disc,
        |    CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nn_disc,
        |    min(l_discount) AS min_disc, max(l_discount) AS max_disc
        |  FROM lineitem)
        |SELECT 'l_discount' AS column_name, n_rows, ndv_disc AS ndv,
        |  nn_disc AS n_nulls, min_disc AS min_v, max_disc AS max_v,
        |  true AS ndv_ok FROM a
        |UNION ALL
        |SELECT 'l_extendedprice', n_rows, ndv_px, nn_px, min_px, max_px,
        |  true FROM a
        |UNION ALL
        |SELECT 'l_quantity', n_rows, ndv_qty, nn_qty, min_qty, max_qty,
        |  true FROM a
        |ORDER BY column_name ASC""".stripMargin,
    // theta sketches are in their EXACT regime at fixture scale
    // (≤1500 users < 2^12 nominal entries), so intersection/union
    // estimates equal DuckDB's exact pair counts; pairs come from the
    // verified event-type domain so zero-overlap pairs still emit
    "agg_theta_sketch" ->
      """WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
        |t AS (SELECT DISTINCT event_type FROM events),
        |pp AS (SELECT a.event_type AS event_a, b.event_type AS event_b
        |       FROM t a JOIN t b ON a.event_type < b.event_type),
        |inter AS (SELECT a.event_type AS ea, b.event_type AS eb,
        |            count(*) AS nb
        |          FROM ut a JOIN ut b ON a.user_id = b.user_id
        |            AND a.event_type < b.event_type
        |          GROUP BY 1, 2),
        |sizes AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1)
        |SELECT pp.event_a, pp.event_b,
        |  coalesce(inter.nb, 0) AS users_both,
        |  sa.n + sb.n - coalesce(inter.nb, 0) AS users_either
        |FROM pp
        |LEFT JOIN inter ON pp.event_a = inter.ea AND pp.event_b = inter.eb
        |JOIN sizes sa ON pp.event_a = sa.event_type
        |JOIN sizes sb ON pp.event_b = sb.event_type
        |ORDER BY event_a ASC, event_b ASC""".stripMargin,
    // the bitmap rollup is EXACT, so the whole output oracles as plain
    // count(DISTINCT) — no error-contract shadow needed
    "agg_bitmap_rollup" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  count(DISTINCT CAST(ts AS DATE)) AS n_days
        |FROM events GROUP BY event_type
        |ORDER BY event_type ASC""".stripMargin,
    // map_agg surface: statuses are single chars and unique per group,
    // so sorted-entry CSV == string_agg ORDER BY key
    "agg_map_agg" ->
      """WITH c AS (SELECT o_orderpriority, o_orderstatus AS s,
        |             count(*) AS cnt
        |           FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority,
        |  string_agg(s || '=' || cnt, ',' ORDER BY s) AS status_counts
        |FROM c GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC""".stripMargin,
    // arg-max with a UNIQUE packed ordering value (exact price cents +
    // row identity) so value ties cannot make the pick engine-arbitrary
    "agg_argmax" ->
      """SELECT l_returnflag,
        |  arg_max(l_orderkey || ':' || l_linenumber,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) * 100000000
        |      + l_orderkey * 10 + l_linenumber) AS max_price_item,
        |  arg_min(l_orderkey || ':' || l_linenumber,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) * 100000000
        |      + l_orderkey * 10 + l_linenumber) AS min_price_item,
        |  round(max(l_extendedprice), 2) AS max_price,
        |  round(min(l_extendedprice), 2) AS min_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC""".stripMargin,
    "agg_collect" ->
      """SELECT n_regionkey,
        |  array_to_string(list_sort(list(n_name)), ',') AS nations,
        |  array_to_string(list_sort(list(DISTINCT n_regionkey::VARCHAR)), ',')
        |    AS keys
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey ASC""".stripMargin,
    "agg_listagg" ->
      """SELECT o_orderstatus,
        |  string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
        |    AS priorities,
        |  count(*) AS cnt
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC""".stripMargin,
    "agg_sortagg" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS order_total,
        |  max(l_shipdate) AS last_ship, count(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 6
        |ORDER BY l_orderkey ASC""".stripMargin,
    // --- §2.E ---
    "win_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn::INT AS rn,
        |       rnk::INT AS rnk, drnk::INT AS drnk, quartile::INT AS quartile
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rnk,
        |    dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey ASC)
        |) WHERE rn <= 3 ORDER BY o_custkey ASC, rn ASC""".stripMargin,
    "win_lag_lead" ->
      """SELECT user_id, event_id,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id ASC)
        |ORDER BY user_id ASC, event_id ASC""".stripMargin,
    "win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
    "win_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    / count(*) OVER w AS moving_avg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
    "win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
    "win_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    AS near_total,
        |  count(*) OVER w AS near_cnt
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC
        |             RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
    "win_nth" ->
      """SELECT o_custkey, o_orderkey,
        |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_order,
        |  ntile(4) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC)::INT AS quartile
        |FROM orders
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
    "win_ignore_nulls" ->
      """SELECT user_id, event_id, event_type,
        |  lag(pv, 1 IGNORE NULLS) OVER w AS prev_purchase_value,
        |  lead(pv, 1 IGNORE NULLS) OVER w AS next_purchase_value
        |FROM (SELECT user_id, event_id, event_type,
        |        CASE WHEN event_type = 'purchase' THEN value END AS pv
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ASC)
        |ORDER BY user_id ASC, event_id ASC""".stripMargin,
    "win_distribution" ->
      """SELECT o_custkey, o_orderkey,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
    "topk_per_group" ->
      """SELECT p_brand, p_partkey, p_retailprice, rn::INT AS rn FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        |  FROM part
        |) WHERE rn <= 3 ORDER BY p_brand ASC, rn ASC""".stripMargin,
    // --- §2.F ---
    "sort_multikey" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_nationkey DESC NULLS LAST, s_acctbal ASC NULLS FIRST,
        |         s_suppkey ASC""".stripMargin,
    "limit_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin,
    // --- §2.G ---
    "set_union_all" ->
      """SELECT o_custkey, o_orderpriority, count(*) AS cnt FROM (
        |  SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |) GROUP BY o_custkey, o_orderpriority
        |ORDER BY o_custkey ASC, o_orderpriority ASC""".stripMargin,
    "set_union_distinct" ->
      """SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        |UNION
        |SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey ASC, o_orderpriority ASC""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey ASC, o_orderpriority ASC""".stripMargin,
    "set_intersect_all" ->
      """SELECT o_custkey, o_orderpriority, count(*) AS cnt FROM (
        |  SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL
        |  SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |) GROUP BY o_custkey, o_orderpriority
        |ORDER BY o_custkey ASC, o_orderpriority ASC""".stripMargin,
    "set_except" ->
      """SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey ASC, o_orderpriority ASC""".stripMargin,
    "set_except_all" ->
      """SELECT o_custkey, o_orderpriority, count(*) AS cnt FROM (
        |  SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT ALL
        |  SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |) GROUP BY o_custkey, o_orderpriority
        |ORDER BY o_custkey ASC, o_orderpriority ASC""".stripMargin,
    // --- §2.H ---
    "fn_string" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) || ':' || c_name AS tagged,
        |  substring(c_name, 1, 8) AS prefix,
        |  length(c_name)::INT AS name_len,
        |  lower(c_mktsegment) AS seg_lower,
        |  trim('  pad  ') AS trimmed,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS cust_num,
        |  regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS devowel,
        |  lpad(c_custkey::VARCHAR, 8, '0') AS padded_key,
        |  replace(c_mktsegment, 'MACHINERY', 'MACHINES') AS replaced
        |FROM customer ORDER BY c_custkey ASC""".stripMargin,
    "fn_string2" ->
      """SELECT c_custkey,
        |  levenshtein(c_mktsegment, 'MACHINERY')::INT AS lev,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
        |  reverse(c_name) AS rev_name,
        |  ascii(c_mktsegment)::INT AS first_code,
        |  repeat(substring(c_name, 1, 2), 2) AS rep2
        |FROM customer ORDER BY c_custkey ASC""".stripMargin,
    "fn_pad_trim" ->
      """SELECT s_suppkey,
        |  lpad(s_name, 22, '*') AS lpadded,
        |  rpad(s_name, 22, '.') AS rpadded,
        |  trim(lpad('  ' || s_name || '  ', 30, ' ')) AS retrimmed,
        |  split_part(s_name, '#', 1) AS name_prefix,
        |  string_split(s_name, '#')[-1] AS name_suffix
        |FROM supplier ORDER BY s_suppkey ASC""".stripMargin,
    "fn_array_hof" ->
      """SELECT vec_id,
        |  len(list_filter(embedding, x -> x > 0))::INT AS n_pos,
        |  (len(list_filter(embedding, x -> x > 0.9)) > 0) AS any_big,
        |  (len(list_filter(embedding, x -> x <= 0.9)) = len(embedding))
        |    AS all_small,
        |  round(list_sum(list_transform(embedding,
        |    x -> x::DOUBLE * x::DOUBLE)), 4) AS sum_sq
        |FROM embeddings ORDER BY vec_id ASC""".stripMargin,
    // DuckDB timezone() overloads: (zone, TIMESTAMP) interprets the
    // naive value IN the zone → TIMESTAMPTZ; (zone, TIMESTAMPTZ)
    // renders the instant in the zone → naive TIMESTAMP. Session TZ is
    // UTC on both engines, so ::TIMESTAMPTZ reads the fixture value as
    // UTC — matching from_utc_timestamp — and the double application
    // is the to_utc round-trip
    "fn_tz" ->
      """SELECT event_id, ts,
        |  timezone('Asia/Kolkata', ts::TIMESTAMPTZ) AS ts_kolkata,
        |  timezone('America/Sao_Paulo', ts::TIMESTAMPTZ) AS ts_sao_paulo,
        |  timezone('Asia/Kolkata',
        |    timezone('Asia/Kolkata', ts::TIMESTAMPTZ))::TIMESTAMP
        |    AS ts_roundtrip,
        |  hour(timezone('Asia/Kolkata', ts::TIMESTAMPTZ))::INT
        |    AS hour_kolkata
        |FROM events WHERE event_id < 2000
        |ORDER BY event_id ASC""".stripMargin,
    // OUTER retention: empty-array docs survive as one NULL row — the
    // UNION arm is exactly the rows plain explode would silently drop
    "fn_explode_outer" ->
      """WITH lt AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> length(t) > 6) AS toks
        |  FROM documents)
        |SELECT doc_id, unnest(toks) AS long_token
        |FROM lt WHERE len(toks) > 0
        |UNION ALL
        |SELECT doc_id, NULL FROM lt WHERE len(toks) = 0
        |ORDER BY doc_id ASC, long_token ASC NULLS FIRST""".stripMargin,
    "fn_try" ->
      """SELECT s_suppkey,
        |  TRY_CAST(substring(s_name, 10, 9) AS INT) AS name_num,
        |  TRY_CAST(s_name AS INT) AS bad_cast,
        |  (CASE WHEN s_suppkey % 3 = 0 THEN NULL
        |        ELSE s_acctbal / (s_suppkey % 3) END) AS guarded_div,
        |  (CASE WHEN s_suppkey = 0 THEN 9223372036854775807
        |        ELSE NULL END)::BIGINT AS overflow_add
        |FROM supplier ORDER BY s_suppkey ASC""".stripMargin,
    "fn_presto_compat" ->
      """SELECT event_id,
        |  strpos(props, 'k')::BIGINT AS kpos,
        |  epoch_us(ts)::DOUBLE / 1000000.0 AS epoch_s,
        |  json_extract_string(props, '$.k') AS k_str
        |FROM events WHERE event_id < 50
        |ORDER BY event_id ASC""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |  year(o_orderdate)::INT AS yr,
        |  month(o_orderdate)::INT AS mo,
        |  day(o_orderdate)::INT AS dom,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  (o_orderdate::DATE + 30) AS due_date,
        |  date_diff('day', o_orderdate::DATE, DATE '2002-01-01')::INT AS age_days,
        |  isodow(o_orderdate)::INT AS iso_dow,
        |  quarter(o_orderdate)::INT AS qtr
        |FROM orders ORDER BY o_orderkey ASC""".stripMargin,
    "fn_math" ->
      """SELECT s_suppkey,
        |  round(s_acctbal, 1) AS bal_round,
        |  floor(s_acctbal)::BIGINT AS bal_floor,
        |  ceil(s_acctbal)::BIGINT AS bal_ceil,
        |  abs(s_acctbal - 5000.0) AS bal_dev,
        |  round(pow(s_suppkey::DOUBLE, 2.0), 4) AS key_sq,
        |  round(sqrt(abs(s_acctbal)), 4) AS bal_sqrt,
        |  round(ln(abs(s_acctbal) + 1.0), 4) AS bal_ln,
        |  ((s_suppkey % 7) + 7) % 7 AS key_mod,
        |  sign(s_acctbal)::DOUBLE AS bal_sign,
        |  greatest(s_acctbal, 0.0) AS bal_pos,
        |  least(s_suppkey, 500) AS key_cap
        |FROM supplier ORDER BY s_suppkey ASC""".stripMargin,
    "fn_cond" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000.0 THEN 'large'
        |       WHEN o_totalprice > 100000.0 THEN 'medium'
        |       ELSE 'small' END AS size_class,
        |  coalesce(nullif(o_orderstatus, 'P'), 'NOT_P') AS status_np,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
        |FROM orders ORDER BY o_orderkey ASC""".stripMargin,
    "fn_interval" ->
      """SELECT event_id,
        |  date_trunc('second', ts + INTERVAL 90 MINUTE) AS plus_90m,
        |  date_trunc('second', ts - INTERVAL 1 DAY) AS minus_1d,
        |  (epoch(date_trunc('second', ts))::BIGINT // 3600) AS epoch_hours
        |FROM events ORDER BY event_id ASC""".stripMargin,
    "fn_regex" ->
      raw"""SELECT doc_id,
        |  coalesce(array_to_string(regexp_extract_all(text, '[a-z]+ing'), ','),
        |           '') AS ings,
        |  len(regexp_extract_all(text, '[a-z]{7,}'))::INT AS n_long_words,
        |  CASE WHEN regexp_matches(text, '\bthe\b') THEN 1 ELSE 0 END
        |    AS has_the
        |FROM documents ORDER BY doc_id ASC""".stripMargin,
    "fn_bitwise" ->
      """SELECT s_suppkey,
        |  s_suppkey & 255 AS and_mask,
        |  s_suppkey | 4096 AS or_flag,
        |  xor(s_suppkey, s_nationkey::BIGINT) AS xor_nation,
        |  s_suppkey << 3 AS shl3,
        |  s_suppkey >> 2 AS shr2,
        |  ~s_suppkey AS inv
        |FROM supplier ORDER BY s_suppkey ASC""".stripMargin,
    // md5-prefix bucket arithmetic keyed on the NORMALIZED TEXT (both
    // engines md5 the identical string); 8 hex chars = 32 bits, so the
    // modulo-100 bias is ~2.3e-8 per bucket (VERDICT r13 #2)
    "sample_split" ->
      raw"""SELECT doc_id, lang, source,
        |  CASE (('0x' || substring(md5($normT), 1, 8))::BIGINT % 100)
        |    WHEN 0 THEN 'test' WHEN 1 THEN 'val' ELSE 'train' END
        |    AS split
        |FROM documents
        |ORDER BY doc_id ASC""".stripMargin,
    "sample_hash" ->
      """SELECT doc_id, lang, source,
        |  (('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::BIGINT
        |    % 100)::INT AS bucket
        |FROM documents
        |WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::BIGINT
        |      % 100 < 10
        |ORDER BY doc_id ASC""".stripMargin,
    "fn_array" ->
      """SELECT vec_id,
        |  len(embedding)::INT AS dim,
        |  round(embedding[1]::DOUBLE, 4) AS first_val,
        |  round(list_sum(list_transform(embedding, x -> x::DOUBLE)), 4) AS vec_sum,
        |  round(coalesce(list_sum(list_transform(
        |    list_filter(embedding, x -> x > 0), x -> x::DOUBLE)), 0.0), 4) AS pos_sum,
        |  len(list_filter(embedding, x -> x > 0))::INT AS n_pos,
        |  round(list_sum(list_transform(embedding,
        |    x -> x::DOUBLE * x::DOUBLE)), 4) AS sq_norm
        |FROM embeddings ORDER BY vec_id ASC""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k')::INT AS k_val,
        |  json_extract_string(props, '$.k')::INT AS k_parsed,
        |  to_json(struct_pack(t := event_type))::VARCHAR AS rejson
        |FROM events ORDER BY event_id ASC""".stripMargin,
    // the variant binary never surfaces — only extracted primitives;
    // a missing path is NULL on both sides
    "fn_variant" ->
      """SELECT event_id,
        |  json_extract(props, '$.k')::BIGINT AS k_val,
        |  json_extract(props, '$.k')::BIGINT * 2 AS k_doubled,
        |  json_extract(props, '$.missing')::BIGINT AS absent
        |FROM events ORDER BY event_id ASC""".stripMargin,
    "fn_map" ->
      """SELECT event_id,
        |  array_to_string(list_sort(['type', 'k']), ',') AS ks,
        |  array_to_string(list_sort(
        |    ['type=' || event_type,
        |     'k=' || coalesce(json_extract_string(props, '$.k'), '')]), ',')
        |    AS entries,
        |  event_type AS etype
        |FROM events ORDER BY event_id ASC""".stripMargin,
    "fn_hash_md5" ->
      "SELECT doc_id, md5(text) AS text_md5 FROM documents ORDER BY doc_id ASC",
    "fn_url" ->
      """WITH u AS (SELECT event_id,
        |  'https://shard' || (user_id % 4)::VARCHAR || '.example.com/' ||
        |  event_type || '/item?id=' || event_id::VARCHAR || '&ref=home' AS url
        |  FROM events WHERE event_id < 500)
        |SELECT event_id, url,
        |  regexp_extract(url, 'https://([^/]+)/', 1) AS host,
        |  regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, '[?&]id=([^&]*)', 1) AS qid
        |FROM u ORDER BY event_id ASC""".stripMargin,
    // identical haversine formula on both sides; round(…, 3) absorbs
    // last-ulp libm differences between the JVM and DuckDB
    "fn_geo" ->
      """WITH pts AS (SELECT s_suppkey,
        |    (s_suppkey * 7 % 17000)::DOUBLE / 100.0 - 85.0 AS lat,
        |    (s_suppkey * 13 % 35000)::DOUBLE / 100.0 - 175.0 AS lon
        |  FROM supplier)
        |SELECT s_suppkey, round(lat, 2) AS lat, round(lon, 2) AS lon,
        |  round(2.0 * 6371.0088 * asin(sqrt(
        |    pow(sin((radians(48.8566) - radians(lat)) / 2.0), 2.0)
        |    + cos(radians(lat)) * cos(radians(48.8566))
        |      * pow(sin((radians(2.3522) - radians(lon)) / 2.0), 2.0))), 3)
        |    AS dist_km,
        |  (lat BETWEEN 40.0 AND 60.0 AND lon BETWEEN -10.0 AND 30.0)
        |    AS in_bbox
        |FROM pts ORDER BY s_suppkey ASC""".stripMargin,
    // oracle is the brute-force cross join — the grid blocking must
    // reproduce it exactly (no false negatives by cell-size construction)
    "join_spatial_grid" ->
      """WITH s AS (SELECT s_suppkey,
        |    45.0 + (s_suppkey * 7 % 1000)::DOUBLE / 100.0 AS slat,
        |    (s_suppkey * 13 % 2000)::DOUBLE / 100.0 AS slon
        |  FROM supplier),
        |c AS (SELECT c_custkey,
        |    45.0 + (c_custkey * 11 % 1000)::DOUBLE / 100.0 AS clat,
        |    (c_custkey * 17 % 2000)::DOUBLE / 100.0 AS clon
        |  FROM customer),
        |p AS (SELECT s_suppkey, c_custkey,
        |    2.0 * 6371.0088 * asin(sqrt(
        |      pow(sin((radians(clat) - radians(slat)) / 2.0), 2.0)
        |      + cos(radians(slat)) * cos(radians(clat))
        |        * pow(sin((radians(clon) - radians(slon)) / 2.0), 2.0)))
        |      AS dist_km
        |  FROM s, c)
        |SELECT s_suppkey, c_custkey, round(dist_km, 3) AS dist_km
        |FROM p WHERE dist_km <= 50.0
        |ORDER BY s_suppkey ASC, c_custkey ASC""".stripMargin,
    // the even–odd ray-cast predicate is UNROLLED from the same literal
    // vertex list the Spark query uses (Joins.pointInPolygonSql) — one
    // source of truth, identical IEEE op order on both engines
    "join_point_in_polygon" -> {
      val polySelects = Joins.polygons.map { case (pid, pname, verts) =>
        s"""SELECT $pid AS poly_id, '$pname' AS poly_name,
           |  c_custkey, clat, clon FROM c
           |WHERE ${Joins.pointInPolygonSql("clon", "clat", verts)}""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH c AS (SELECT c_custkey,
         |    45.0 + (c_custkey * 11 % 1000)::DOUBLE / 100.0 AS clat,
         |    (c_custkey * 17 % 2000)::DOUBLE / 100.0 AS clon
         |  FROM customer)
         |SELECT * FROM (
         |$polySelects
         |) ORDER BY poly_id ASC, c_custkey ASC""".stripMargin
    },
    // data-driven polygon layer (one diamond per nation, rebuilt from
    // n_nationkey arithmetic) — the oracle is the brute-force cross
    // join; the Spark side must produce the same pairs from its
    // grid-blocked keyed join. The crossing test mirrors
    // Joins.pointInPolygonDynSql op for op (DuckDB lists are 1-based:
    // range(1,5) + an i=4 wrap vs Spark's 0-based (i+1)%size)
    "join_polygon_grid" ->
      """WITH p AS (SELECT n_nationkey AS poly_id,
        |    1.0 + (n_nationkey * 13 % 37)::DOUBLE / 2.0 AS lonc,
        |    46.0 + (n_nationkey * 7 % 17)::DOUBLE / 2.0 AS latc,
        |    0.4 + (n_nationkey % 5)::DOUBLE * 0.2 AS rx,
        |    0.3 + (n_nationkey % 4)::DOUBLE * 0.2 AS ry
        |  FROM nation),
        |pv AS (SELECT poly_id, [
        |    struct_pack(x := lonc + rx, y := latc),
        |    struct_pack(x := lonc, y := latc + ry),
        |    struct_pack(x := lonc - rx, y := latc),
        |    struct_pack(x := lonc, y := latc - ry)] AS verts FROM p),
        |c AS (SELECT c_custkey,
        |    45.0 + (c_custkey * 11 % 1000)::DOUBLE / 100.0 AS clat,
        |    (c_custkey * 17 % 2000)::DOUBLE / 100.0 AS clon
        |  FROM customer)
        |SELECT poly_id, c_custkey, clat, clon
        |FROM pv CROSS JOIN c
        |WHERE (list_sum(list_transform(range(1, 5), i ->
        |   CASE WHEN ((verts[i].y > clat)
        |              <> (verts[CASE WHEN i = 4 THEN 1 ELSE i + 1 END].y > clat))
        |         AND (clon < ((verts[CASE WHEN i = 4 THEN 1 ELSE i + 1 END].x
        |                        - verts[i].x)
        |              * (clat - verts[i].y)
        |              / (verts[CASE WHEN i = 4 THEN 1 ELSE i + 1 END].y
        |                 - verts[i].y)
        |              + verts[i].x))
        |   THEN 1 ELSE 0 END)) % 2 = 1)
        |ORDER BY poly_id ASC, c_custkey ASC""".stripMargin,
    "set_union_by_name" ->
      """SELECT o_orderkey, o_totalprice, NULL::BIGINT AS o_custkey
        |FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, NULL::DOUBLE AS o_totalprice, o_custkey
        |FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_orderkey ASC""".stripMargin,
    "expr_custom" ->
      """SELECT vec_id,
        |  round(sqrt(list_sum(list_transform(embedding,
        |    x -> x::DOUBLE * x::DOUBLE))), 4) AS l2,
        |  round(list_sum(list_transform(embedding,
        |    x -> x::DOUBLE * x::DOUBLE)), 4) AS sq_norm
        |FROM embeddings ORDER BY vec_id ASC""".stripMargin,
    // --- §2.I batch equivalents ---
    "stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS win_start, event_type,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1 ASC, 2 ASC""".stripMargin,
    "stream_anomaly" ->
      raw"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev
        |  FROM events GROUP BY 1, 2),
        |d2 AS (SELECT event_type, bucket, CAST(rev AS DOUBLE) AS x FROM h),
        |s AS (SELECT event_type, bucket, x,
        |    CAST(count(*) OVER w AS DOUBLE) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(28,4))) OVER w AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(x * x AS DECIMAL(38,4))) OVER w AS DOUBLE) AS sxx
        |  FROM d2
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_type, bucket, bucket_value, z,
        |  (CASE WHEN abs(z) > 2.0 THEN 1 ELSE 0 END)::INT AS anomaly
        |FROM (SELECT event_type, bucket, x AS bucket_value,
        |    CASE WHEN n < 2.0 OR (sxx / n - (sx / n) * (sx / n)) <= 0.0
        |         THEN 0.0
        |         ELSE round((x - sx / n)
        |           / sqrt(sxx / n - (sx / n) * (sx / n)), 6)
        |    END AS z
        |  FROM s) q
        |ORDER BY event_type ASC, bucket ASC""".stripMargin,
    "stream_sliding" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts)
        |         - (r.i * INTERVAL '15 minutes') AS win_start,
        |       event_type, count(*) AS n_events
        |FROM events, range(0, 4) r(i)
        |GROUP BY 1, 2 ORDER BY 1 ASC, 2 ASC""".stripMargin,
    "stream_session" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), y AS (
        |  SELECT *, sum(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM x
        |)
        |SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
        |  date_trunc('second', min(ts)) AS session_start,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
        |FROM y GROUP BY user_id, session_id
        |ORDER BY user_id ASC, session_id ASC""".stripMargin,
    "stream_dedup" ->
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY event_id ASC""".stripMargin,
    // watermark late-drop contract: the streaming result must equal the
    // batch tumbling agg over NON-late rows, and late_dropped must equal
    // the planted late-set size (see Streams.watermarkLateOk)
    "stream_watermark_late_ok" ->
      """WITH m AS (SELECT max(ts) AS mx FROM events),
        |late AS (SELECT CAST(count(*) AS BIGINT) AS late_dropped
        |  FROM events, m
        |  WHERE ts < mx - INTERVAL 2 HOUR AND event_id % 7 = 0)
        |SELECT date_trunc('hour', ts) AS win_start, event_type,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  (SELECT late_dropped FROM late) AS late_dropped
        |FROM events, m
        |WHERE NOT (ts < mx - INTERVAL 2 HOUR AND event_id % 7 = 0)
        |GROUP BY 1, 2 ORDER BY 1 ASC, 2 ASC""".stripMargin,
    // exactly-once sink contract: the sink directory (written twice over
    // one checkpoint) must aggregate to the original table's aggregate —
    // a re-emitting restart doubles n_events but not n_distinct_events
    "stream_sink_ok" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT event_id) AS n_distinct_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1 ASC""".stripMargin,
    "join_interval_overlap" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch(date_trunc('second', ts))::BIGINT AS s,
        |    epoch(date_trunc('second', ts))::BIGINT
        |      + floor(least(value, 500))::BIGINT AS e
        |  FROM events),
        |a AS (SELECT user_id, event_id AS a_id, s AS a_s, e AS a_e
        |      FROM e WHERE event_type = 'view'),
        |b AS (SELECT user_id, event_id AS b_id, s AS b_s, e AS b_e
        |      FROM e WHERE event_type = 'click')
        |SELECT a.user_id, a_id, b_id,
        |  (least(a_e, b_e) - greatest(a_s, b_s)) AS overlap_sec
        |FROM a JOIN b ON a.user_id = b.user_id
        | AND a_s <= b_e AND b_s <= a_e
        |ORDER BY a.user_id ASC, a_id ASC, b_id ASC""".stripMargin,
    "stream_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        |  (epoch(date_trunc('second', p.ts))::BIGINT
        |   - epoch(date_trunc('second', c.ts))::BIGINT) AS gap_sec
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts <= p.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY p.user_id ASC, purchase_id ASC, click_id ASC""".stripMargin,
    // LEFT OUTER variant: the event_type filters must move into
    // subqueries (in the ON clause of a left join they would not
    // restrict the preserved side)
    "stream_join_outer" ->
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        |  (epoch(date_trunc('second', p.ts))::BIGINT
        |   - epoch(date_trunc('second', c.ts))::BIGINT) AS gap_sec
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts <= p.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY p.user_id ASC, purchase_id ASC NULLS FIRST,
        |         click_id ASC NULLS FIRST""".stripMargin,
    "stream_join_full" ->
      """SELECT coalesce(p.user_id, c.user_id) AS user_id,
        |  p.event_id AS purchase_id, c.event_id AS click_id,
        |  (epoch(date_trunc('second', p.ts))::BIGINT
        |   - epoch(date_trunc('second', c.ts))::BIGINT) AS gap_sec
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts <= p.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY user_id ASC, purchase_id ASC NULLS FIRST,
        |         click_id ASC NULLS FIRST""".stripMargin,
    "stream_join_semi" ->
      """SELECT p.user_id, p.event_id AS purchase_id
        |FROM events p
        |WHERE p.event_type = 'purchase' AND EXISTS (
        |  SELECT 1 FROM events c
        |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |    AND c.ts <= p.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
        |ORDER BY p.user_id ASC, purchase_id ASC""".stripMargin,
    "win_range_interval" ->
      """SELECT event_id, user_id,
        |  count(*) OVER (PARTITION BY user_id
        |    ORDER BY date_trunc('second', ts)
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |    AS cnt_last_hour
        |FROM events ORDER BY event_id ASC""".stripMargin,
    // this container's DuckDB rejects native GROUPS mode ("not
    // implemented yet"), so the oracle uses the ANSI-equivalent
    // dense_rank + integer-RANGE formulation (peer groups numbered
    // 1,2,3… gap-free, so RANGE k PRECEDING over the rank IS GROUPS k
    // PRECEDING); WindowSpec pins the GROUPS semantics themselves
    // against a planted brute-force peer-group computation
    "win_groups_frame" ->
      """WITH g AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |    dense_rank() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC) AS date_grp
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    AS grp_sum,
        |  count(*) OVER w AS grp_cnt
        |FROM g
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY date_grp
        |             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
    // the composed pipeline: quality predicates == quality_filter's,
    // dedup among survivors, benchmark + contaminated docs dropped
    // (decontaminate's gram CTEs), then pack_sequences' window
    "pipeline_curate" ->
      raw"""WITH q0 AS (SELECT doc_id, source, lang, n_chars, text,
        |        $normT AS t FROM documents),
        |m AS (SELECT doc_id, source, t,
        |    len(string_split(t, ' '))::INT AS n_tokens, n_chars, lang,
        |    round(length(replace(t, ' ', ''))::DOUBLE
        |          / len(string_split(t, ' ')), 4) AS mwl
        |  FROM q0),
        |keepq AS (SELECT * FROM m
        |  WHERE lang IN ('en','de','es','fr')
        |    AND n_tokens BETWEEN 3 AND 10000
        |    AND n_chars BETWEEN 20 AND 100000
        |    AND mwl BETWEEN 2.0 AND 12.0),
        |ded AS (SELECT *, row_number() OVER (
        |    PARTITION BY md5(t) ORDER BY doc_id ASC) AS rn FROM keepq),
        |surv AS (SELECT doc_id, source, n_tokens FROM ded
        |  WHERE rn = 1 AND doc_id % 97 <> 0),
        |d AS (SELECT doc_id, string_split($normT, ' ') AS toks
        |  FROM documents WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |s AS (SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(toks) - 3, 0) + 1),
        |    i -> array_to_string(toks[i+1:i+3], ' '))) AS sh FROM d),
        |g AS (SELECT doc_id, unnest(sh) AS h FROM s),
        |bench AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0),
        |cont AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (h)
        |  WHERE g.doc_id % 97 <> 0),
        |fin AS (SELECT sv.* FROM surv sv LEFT JOIN cont c
        |  ON sv.doc_id = c.doc_id WHERE c.doc_id IS NULL),
        |p AS (SELECT source, doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS cum_before
        |  FROM fin)
        |SELECT source, doc_id, n_tokens,
        |  (cum_before // 512)::BIGINT AS pack_id,
        |  (cum_before % 512)::BIGINT AS pack_offset
        |FROM p ORDER BY source ASC, doc_id ASC""".stripMargin,
    // the v3 capstone: same gate→dedup→decontaminate chain, ending in
    // the per-LANGUAGE mix_budget prefix instead of the source pack
    "pipeline_curate_v3" ->
      raw"""WITH q0 AS (SELECT doc_id, source, lang, n_chars, text,
        |        $normT AS t FROM documents),
        |m AS (SELECT doc_id, source, lang, t,
        |    len(string_split(t, ' '))::INT AS n_tokens, n_chars,
        |    round(length(replace(t, ' ', ''))::DOUBLE
        |          / len(string_split(t, ' ')), 4) AS mwl
        |  FROM q0),
        |keepq AS (SELECT * FROM m
        |  WHERE lang IN ('en','de','es','fr')
        |    AND n_tokens BETWEEN 3 AND 10000
        |    AND n_chars BETWEEN 20 AND 100000
        |    AND mwl BETWEEN 2.0 AND 12.0),
        |ded AS (SELECT *, row_number() OVER (
        |    PARTITION BY md5(t) ORDER BY doc_id ASC) AS rn FROM keepq),
        |surv AS (SELECT doc_id, lang, n_tokens FROM ded
        |  WHERE rn = 1 AND doc_id % 97 <> 0),
        |d AS (SELECT doc_id, string_split($normT, ' ') AS toks
        |  FROM documents WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |s AS (SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(toks) - 3, 0) + 1),
        |    i -> array_to_string(toks[i+1:i+3], ' '))) AS sh FROM d),
        |g AS (SELECT doc_id, unnest(sh) AS h FROM s),
        |bench AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0),
        |cont AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (h)
        |  WHERE g.doc_id % 97 <> 0),
        |fin AS (SELECT sv.* FROM surv sv LEFT JOIN cont c
        |  ON sv.doc_id = c.doc_id WHERE c.doc_id IS NULL),
        |mx AS (SELECT doc_id, lang, n_tokens,
        |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS rk
        |  FROM fin),
        |p AS (SELECT doc_id, lang, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY rk ASC, doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0)::BIGINT AS before_toks
        |  FROM mx)
        |SELECT doc_id, lang, n_tokens,
        |  (before_toks + n_tokens)::BIGINT AS cum_tokens
        |FROM p WHERE before_toks < 3000
        |ORDER BY doc_id ASC""".stripMargin,
    // the daily-update capstone: the minhash-incremental CTE chain
    // (m-prefixed — v3's decontamination CTEs keep their d/s/g names)
    // gates which delta docs enter v3's curation chain; quality gate /
    // exact dedup / decontaminate / budget-mix fragments are v3's
    // verbatim over the restricted candidate set. Inherits
    // dedup_minhash_incremental's banding-miss caveat: the oracle's
    // m-chain is all-pairs exact Jaccard while the engine gates through
    // 8x4 banding — the match is a fixed fact of fixtures whose
    // near-dups sit at J >= 0.9 (miss ~ 2e-4), not a guarantee for
    // corpora with pairs near the 0.5 threshold
    "pipeline_curate_v4" -> pipelineCurateIncrSql(1500),
    // v6 = the SAME one-batch incremental chain by the day-composition
    // law (TextOps.pipelineCurateV6 notes): day-1 ∘ day-2 through the
    // lake CDF ≡ the two-day batch, so the oracle is v4's composition
    // at v6's budget — a capture/seen-store/version-read fault on
    // either day breaks the law and hash-mismatches
    "pipeline_curate_v6" -> pipelineCurateIncrSql(2000),
    // takedown day: the same chain minus the deleted residue class,
    // re-mixed — a missed delete or an un-rebalanced mix mismatches
    "pipeline_takedown" ->
      pipelineCurateIncrSql(2000, takedownPred = "doc_id % 41 <> 5"),
    // v5 = quality gate + exact dedup (the v4 CTEs), near-dup
    // decontamination (the decontaminate_minhash CTEs, %19 split),
    // content-keyed split, train-only epoch upsampling (mix_epochs'
    // VALUES table + coin)
    "pipeline_curate_v5" -> pipelineCurateV5Sql,
    // blob = utf-8 bytes of text, so DuckDB's md5(text) hashes the
    // identical byte string; octet_length = blob length
    "multimodal_dedup" ->
      """WITH h AS (SELECT doc_id AS asset_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |         ELSE 'video/mp4' END AS mime,
        |    md5(text) AS blob_hash,
        |    octet_length(encode(text))::INT AS n_bytes
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY blob_hash ORDER BY asset_id ASC) AS rn FROM h)
        |SELECT asset_id, mime, blob_hash, n_bytes FROM r WHERE rn = 1
        |ORDER BY asset_id ASC""".stripMargin,
    // perceptual near-dup: the oracle recomputes the dHash from the
    // SAME integer codepoint arithmetic (blob = utf-8 of text, so text
    // chars ARE the stub "pixels") and verifies with an EXACT all-pairs
    // Hamming join — safe because the Spark side's 4×16-bit banding is
    // lossless for hamming <= 3 by pigeonhole (no recall caveat)
    "multimodal_phash" -> (phashCtes + """
        |SELECT a.asset_id AS a_id, b.asset_id AS b_id,
        |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
        |FROM ph a JOIN ph b ON a.asset_id < b.asset_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 3
        |ORDER BY a_id ASC, b_id ASC""".stripMargin),
    // seen-store incremental at the perceptual tier: lossless banding
    // means the oracle is the EXACT delta-vs-(store + earlier-delta)
    // Hamming formulation; unqualified (short) delta assets have no
    // phash and always survive
    "multimodal_phash_incremental" -> phashIncrementalSql,
    // the streaming twin replays store-then-delta into the banded
    // seen-store processor; same output contract, same oracle VERBATIM
    "stream_dedup_phash_ok" -> phashIncrementalSql,
    // video near-dup: frame windows (252 chars at stride 100) ->
    // per-frame dHash (the phashCtes integer arithmetic over the
    // window) -> signature distinct -> the SAME lossless 4x16-bit
    // banding the engine uses (integer shifts, exact) -> Hamming <= 3
    // verify -> exact-integer bidirectional containment 2*m >= n
    "multimodal_video_dedup" -> (videoFrameCtes + """,
        |m AS (SELECT DISTINCT a.asset_id AS a_id, b2.asset_id AS b_id,
        |    a.fph AS a_fph, b2.fph AS b_fph
        |  FROM bb a JOIN bb b2 ON a.band = b2.band AND a.bval = b2.bval
        |    AND a.asset_id < b2.asset_id
        |  WHERE bit_count(xor(a.fph, b2.fph)) <= 3),
        |mm AS (SELECT a_id, b_id,
        |    count(DISTINCT a_fph)::BIGINT AS m_a,
        |    count(DISTINCT b_fph)::BIGINT AS m_b
        |  FROM m GROUP BY 1, 2)
        |SELECT a_id, b_id, sa.n AS n_a, sb.n AS n_b, m_a, m_b
        |FROM mm JOIN sz sa ON a_id = sa.asset_id
        |JOIN sz sb ON b_id = sb.asset_id
        |WHERE 2*m_a >= sa.n AND 2*m_b >= sb.n
        |ORDER BY a_id ASC, b_id ASC""".stripMargin),
    // seen-store incremental at the signature-set tiers: exact
    // all-pairs formulation (lossless banding), short delta clips
    // survive by construction — the phash-incremental contract
    "multimodal_video_dedup_incremental" -> (videoFrameCtes +
      signatureIncrementalTail("doc_id % 3 = 2", "video/mp4")),
    "multimodal_audio_dedup_incremental" -> (audioHkCtes + """,
        |sz AS (SELECT asset_id, count(*)::BIGINT AS n FROM f
        |  GROUP BY 1)""".stripMargin +
      signatureIncrementalTail("doc_id % 3 = 1", "audio/wav")),
    // audio near-dup: consecutive window pairs (252 chars, stride 100;
    // frame k vs k-1, so >= 352 chars qualifies) -> 63 band energies
    // per window -> Haitsma-Kalker difference-of-differences sign bits
    // (band gradient of frame k vs frame k-1) packed with integer
    // shifts -> signature distinct -> the SAME lossless 4x16 banding
    // -> Hamming <= 3 verify -> bidirectional containment 2*m >= n
    "multimodal_audio_dedup" -> (audioHkCtes + """,
        |sz AS (SELECT asset_id, count(*)::BIGINT AS n FROM f GROUP BY 1),
        |m AS (SELECT DISTINCT a.asset_id AS a_id, b2.asset_id AS b_id,
        |    a.fph AS a_fph, b2.fph AS b_fph
        |  FROM bb a JOIN bb b2 ON a.band = b2.band AND a.bval = b2.bval
        |    AND a.asset_id < b2.asset_id
        |  WHERE bit_count(xor(a.fph, b2.fph)) <= 3),
        |mm AS (SELECT a_id, b_id,
        |    count(DISTINCT a_fph)::BIGINT AS m_a,
        |    count(DISTINCT b_fph)::BIGINT AS m_b
        |  FROM m GROUP BY 1, 2)
        |SELECT a_id, b_id, sa.n AS n_a, sb.n AS n_b, m_a, m_b
        |FROM mm JOIN sz sa ON a_id = sa.asset_id
        |JOIN sz sb ON b_id = sb.asset_id
        |WHERE 2*m_a >= sa.n AND 2*m_b >= sb.n
        |ORDER BY a_id ASC, b_id ASC""".stripMargin),
    // the candidates shadow: every band-colliding pair, exact Hamming,
    // no threshold — the fingerprint/banding/verify arithmetic is
    // hash-matched non-vacuously at every SF
    "multimodal_audio_dedup_cand" -> (audioHkCtes + """
        |SELECT DISTINCT a.asset_id AS a_id, b2.asset_id AS b_id,
        |  CAST(bit_count(xor(a.fph, b2.fph)) AS INTEGER) AS hamming
        |FROM bb a JOIN bb b2 ON a.band = b2.band AND a.bval = b2.bval
        |  AND a.asset_id < b2.asset_id
        |ORDER BY a_id ASC, b_id ASC, hamming ASC""".stripMargin),
    "source_custom" ->
      """SELECT i AS doc_id,
        |  ['en','de','es','fr'][(i % 4)::INT + 1] AS lang,
        |  'synth' || (i % 3)::VARCHAR AS source,
        |  'synthetic document ' || i::VARCHAR || ' body token' ||
        |    (i % 7)::VARCHAR || ' token' || (i % 11)::VARCHAR || ' end'
        |    AS text
        |FROM range(100, 600) t(i) ORDER BY doc_id ASC""".stripMargin,
    "stream_static_join" ->
      """SELECT e.event_id, e.user_id, c.c_mktsegment, e.value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id ASC""".stripMargin,
    // OHLC bars: open/close picked by a UNIQUE packed (ms, event_id)
    // ordering (the agg_argmax rule), bucketing via day-truncate +
    // interval arithmetic — no engine-specific time_bucket
    "ts_resample" ->
      """WITH ev AS (SELECT event_type,
        |    date_trunc('hour', ts) - (hour(ts) % 6) * INTERVAL 1 HOUR
        |      AS bucket,
        |    epoch_ms(ts) * 1000000 + event_id AS ord, value
        |  FROM events)
        |SELECT event_type, bucket,
        |  arg_min(value, ord) AS open, max(value) AS high,
        |  min(value) AS low, arg_max(value, ord) AS close,
        |  count(*) AS n_events
        |FROM ev GROUP BY 1, 2
        |ORDER BY event_type ASC, bucket ASC""".stripMargin,
    // day-over-day binned KS in pure BIGINT (the dq_drift discipline);
    // day+1 routes each histogram into the next day's comparison
    "ts_drift" -> tsDriftSql,
    // the STREAMING form replays to the identical rows — shared oracle
    // verbatim (the join_asof_split precedent)
    "stream_drift_ok" -> tsDriftSql,
    // z from exact decimal moment sums, SAME IEEE tree both engines,
    // flag compares the ROUNDED z (agg_corr discipline)
    "ts_anomaly" ->
      raw"""WITH daily AS (SELECT o_orderpriority,
        |    CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        |  FROM orders GROUP BY 1, 2),
        |d2 AS (SELECT o_orderpriority, day,
        |    CAST(rev AS DOUBLE) AS x FROM daily),
        |st AS (SELECT o_orderpriority, count(*)::DOUBLE AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DOUBLE) AS sxx
        |  FROM d2 GROUP BY 1)
        |SELECT o_orderpriority, strftime(day, '%Y-%m-%d') AS day,
        |  day_rev, z,
        |  (CASE WHEN abs(z) > 2.0 THEN 1 ELSE 0 END)::INT AS anomaly
        |FROM (SELECT d2.o_orderpriority, d2.day, d2.x AS day_rev,
        |    CASE WHEN (st.sxx / st.n
        |               - (st.sx / st.n) * (st.sx / st.n)) <= 0.0
        |         THEN 0.0
        |         ELSE round((d2.x - st.sx / st.n)
        |           / sqrt(st.sxx / st.n
        |                  - (st.sx / st.n) * (st.sx / st.n)), 6)
        |    END AS z
        |  FROM d2 JOIN st USING (o_orderpriority)) q
        |ORDER BY o_orderpriority ASC, day ASC""".stripMargin,
    // the SAME integer CUSUM recursion as a recursive CTE: mu/MAD by
    // truncating integer division, greatest/add in pure BIGINT
    "ts_changepoint" ->
      tsChangepointSql("greatest(7, count(*) // 4)"),
    // the streaming monitor's oracle: the SAME recursion with the
    // online fixed window, restricted to series with >= 7 days — a
    // shorter series stays in the stream's learning window and emits
    // nothing, so the oracle must exclude it too (review finding: the
    // fixture happens to have none, but the gate must not depend on
    // that staying true)
    "stream_changepoint_ok" -> tsChangepointSql("7", minDays = 7),
    // the SAME integer Holt recursion as a recursive CTE: BIGINT
    // fixed-point at 1e4, '//' and Spark's 'div' both truncate toward
    // zero (verified on negatives — falling series ⇒ negative trend)
    "ts_forecast" ->
      """WITH RECURSIVE daily AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    (SUM(CAST(value AS DECIMAL(18,4))) * 10000)::BIGINT AS x
        |  FROM events GROUP BY 1, 2),
        |seq AS (SELECT event_type, day, x,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY day ASC) AS rn
        |  FROM daily),
        |f AS (
        |  SELECT event_type, day, x, rn, x AS l,
        |    CAST(0 AS BIGINT) AS b, x AS fc
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.event_type, s.day, s.x, s.rn,
        |    (s.x + f.l + f.b) // 2 AS l,
        |    (((s.x + f.l + f.b) // 2) - f.l + f.b) // 2 AS b,
        |    (f.l + f.b) AS fc
        |  FROM f JOIN seq s ON s.event_type = f.event_type
        |    AND s.rn = f.rn + 1)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |  round(x / 10000.0, 4) AS actual,
        |  round(fc / 10000.0, 4) AS forecast,
        |  round((x - fc) / 10000.0, 4) AS err
        |FROM f ORDER BY event_type ASC, day ASC""".stripMargin,
    // Holt-Winters additive: the ts_forecast integer recursion extended
    // with a 7-slot seasonal LIST carried through the recursive CTE
    // (observed-sequence index (rn-1)%7; seed = first 7 days, l0 =
    // sum//7, b0 = 0; emission from day 8)
    "ts_forecast_seasonal" -> tsForecastSeasonalSql,
    // the streaming Holt-Winters twin is gated on the SAME recursion
    "stream_forecast_ok" -> tsForecastSeasonalSql,
    // weekday = days-since-Monday-epoch mod 7 (engine-neutral; the
    // builtins disagree on week start); ts_anomaly decimal discipline
    "ts_seasonal" ->
      raw"""WITH daily AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS rev
        |  FROM events GROUP BY 1, 2),
        |d2 AS (SELECT event_type, day, CAST(rev AS DOUBLE) AS x, rev,
        |    ((datediff('day', DATE '1970-01-05', day) % 7) + 7) % 7
        |      AS dow
        |  FROM daily),
        |s AS (SELECT event_type, dow,
        |    CAST(SUM(CAST(rev AS DECIMAL(28,4))) AS DOUBLE) AS sxd,
        |    count(*)::DOUBLE AS n
        |  FROM d2 GROUP BY 1, 2)
        |SELECT d2.event_type, strftime(d2.day, '%Y-%m-%d') AS day,
        |  round(d2.x, 4) AS day_value,
        |  round(s.sxd / s.n, 6) AS seasonal,
        |  round(d2.x - s.sxd / s.n, 6) AS residual
        |FROM d2 JOIN s ON d2.event_type = s.event_type
        |  AND d2.dow = s.dow
        |ORDER BY d2.event_type ASC, d2.day ASC""".stripMargin,
    // mirrored integer decomposition: window sums stay (num, cnt)
    // rationals, detrended = xu*tc − tn exactly, weekday means clear
    // denominators via 420 // tc (every 7-day-window count divides
    // 420); one IEEE tree per output component
    // ACF over the exact integers y = n·x − S (scale-4 BIGINT days;
    // HUGEINT products where Spark uses DECIMAL(38,0)); the offset
    // self-join covers the same n−k pair set as Spark's null-skipping
    // lead columns
    "ts_acf" ->
      """WITH daily AS (SELECT event_type,
        |    date_trunc('day', ts)::DATE AS day,
        |    (sum(CAST(value AS DECIMAL(18,4))) * 10000)::BIGINT AS xu
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, count(*)::BIGINT AS n,
        |    sum(xu)::BIGINT AS s FROM daily GROUP BY 1),
        |y AS (SELECT d.event_type, st.n,
        |    (st.n * d.xu - st.s)::HUGEINT AS y,
        |    row_number() OVER (PARTITION BY d.event_type
        |      ORDER BY d.day ASC) AS t
        |  FROM daily d JOIN st USING (event_type)),
        |den AS (SELECT event_type, any_value(n) AS n_days,
        |    sum(y * y) AS den FROM y GROUP BY 1),
        |lags AS (SELECT unnest(range(1, 8)) AS lag),
        |num AS (SELECT a.event_type, l.lag, sum(a.y * b.y) AS num
        |  FROM y a CROSS JOIN lags l
        |  JOIN y b ON b.event_type = a.event_type AND b.t = a.t + l.lag
        |  GROUP BY 1, 2)
        |SELECT n.event_type, n.lag::INT AS lag,
        |  d.n_days::BIGINT AS n_days,
        |  round(n.num::DOUBLE / d.den::DOUBLE, 6) AS acf
        |FROM num n JOIN den d USING (event_type)
        |ORDER BY event_type ASC, lag ASC""".stripMargin,
    "ts_stl" ->
      raw"""WITH daily AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    (SUM(CAST(value AS DECIMAL(18,4))) * 10000)::BIGINT AS xu
        |  FROM events GROUP BY 1, 2),
        |tr AS (SELECT *, SUM(xu) OVER w AS tn, COUNT(*) OVER w AS tc,
        |    ((datediff('day', DATE '1970-01-05', day) % 7) + 7) % 7
        |      AS dow
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dt AS (SELECT *, xu * tc - tn AS dn FROM tr),
        |se AS (SELECT event_type, dow,
        |    SUM(dn * (420 // tc)) AS sn, COUNT(*) AS n
        |  FROM dt GROUP BY 1, 2)
        |SELECT dt.event_type, strftime(dt.day, '%Y-%m-%d') AS day,
        |  round(xu::DOUBLE / 10000.0, 4) AS day_value,
        |  round(tn::DOUBLE / tc::DOUBLE / 10000.0, 6) AS trend,
        |  round(sn::DOUBLE / (420.0 * n::DOUBLE) / 10000.0, 6)
        |    AS seasonal,
        |  round(xu::DOUBLE / 10000.0
        |    - tn::DOUBLE / tc::DOUBLE / 10000.0
        |    - sn::DOUBLE / (420.0 * n::DOUBLE) / 10000.0, 6) AS residual
        |FROM dt JOIN se ON se.event_type = dt.event_type
        |  AND se.dow = dt.dow
        |ORDER BY dt.event_type ASC, dt.day ASC""".stripMargin,
    "ts_gapfill" ->
      """WITH agg AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bucket,
        |    count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        |          FROM agg GROUP BY 1),
        |grid AS (SELECT user_id,
        |           unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |         FROM spans)
        |SELECT g.user_id AS user_id, g.bucket AS bucket,
        |  coalesce(a.n, 0) AS n_events,
        |  last_value(a.v IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.bucket ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |FROM grid g LEFT JOIN agg a
        |  ON g.user_id = a.user_id AND g.bucket = a.bucket
        |ORDER BY user_id ASC, bucket ASC""".stripMargin,
    "ts_interpolate" ->
      """WITH agg AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bucket,
        |    (CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*))
        |      AS v
        |  FROM events GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        |          FROM agg GROUP BY 1),
        |grid AS (SELECT user_id,
        |           unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |         FROM spans),
        |j AS (SELECT g.user_id, g.bucket, a.v
        |      FROM grid g LEFT JOIN agg a
        |        ON g.user_id = a.user_id AND g.bucket = a.bucket),
        |w AS (SELECT user_id, bucket, v,
        |    last_value(v IGNORE NULLS) OVER pw AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
        |      OVER pw AS pt,
        |    first_value(v IGNORE NULLS) OVER nw AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
        |      OVER nw AS nt
        |  FROM j
        |  WINDOW pw AS (PARTITION BY user_id ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  nw AS (PARTITION BY user_id ORDER BY bucket
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, bucket, (CASE
        |    WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE pv + (nv - pv) * (epoch(bucket) - epoch(pt))
        |                        / (epoch(nt) - epoch(pt)) END) AS interp
        |FROM w ORDER BY user_id ASC, bucket ASC""".stripMargin,
    "event_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
        |       WHERE e.event_type = 'click' GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
        |       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT count(t1.t1) AS n_view, count(t2.t2) AS n_view_click,
        |  count(t3.t3) AS n_view_click_purchase
        |FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
        |LEFT JOIN t3 ON t1.user_id = t3.user_id""".stripMargin,
    "retention_cohort" ->
      """WITH fd AS (SELECT user_id, date_trunc('day', min(ts)) AS cohort
        |            FROM events GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
        |        FROM events)
        |SELECT cohort,
        |  date_diff('day', cohort::DATE, d::DATE)::INT AS day_offset,
        |  count(*) AS n_users
        |FROM act JOIN fd ON act.user_id = fd.user_id
        |GROUP BY 1, 2 ORDER BY cohort ASC, day_offset ASC""".stripMargin,
    "stream_stateful" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
        |    PARTITION BY user_id ORDER BY event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_purchases
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id ASC, event_id ASC""".stripMargin,
    // event-time shape of TTL'd keyed state: only purchases within 30
    // minutes of the user's latest purchase survive (the wall-clock
    // TTL eviction itself is StreamingSpec-only — not SQL-expressible)
    "stream_state_ttl" ->
      """SELECT user_id, count(*) AS n_live,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS live_value
        |FROM (SELECT user_id, value, ts,
        |        max(ts) OVER (PARTITION BY user_id) AS max_ts
        |      FROM events WHERE event_type = 'purchase') t
        |WHERE ts > max_ts - INTERVAL 30 MINUTE
        |GROUP BY user_id
        |ORDER BY user_id ASC""".stripMargin,
    // --- §2.J ---
    "udf_scalar" ->
      raw"""SELECT doc_id, substring(t, 1, 40) AS norm_prefix,
        |  length(t)::INT AS norm_len
        |FROM (SELECT doc_id,
        |        trim(regexp_replace(lower('  ' || text || '   '), '\s+', ' ', 'g')) AS t
        |      FROM documents) ORDER BY doc_id ASC""".stripMargin,
    "udtf_generator" ->
      """SELECT doc_id, (u.pos)::INT AS pos, u.token AS token
        |FROM (SELECT doc_id,
        |        unnest(list_transform(string_split(text, ' '),
        |          (t, i) -> struct_pack(pos := i - 1, token := t))) AS u
        |      FROM documents WHERE doc_id < 50)
        |WHERE length(u.token) > 0
        |ORDER BY doc_id ASC, pos ASC""".stripMargin,
    // --- §2.K ---
    // round-3 pipeline operators. Non-empty-doc predicate and k-gram
    // construction mirror the kernel exactly (see dedup_simhash_ids /
    // ngramPairCtes notes); grams compare as strings here vs 64-bit
    // hashes in Spark — identical sets up to negligible collisions.
    "decontaminate" ->
      raw"""WITH d AS (SELECT doc_id, string_split($normT, ' ') AS toks
        |           FROM documents
        |           WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |s AS (SELECT doc_id, list_distinct(list_transform(
        |        range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' '))) AS sh FROM d),
        |g AS (SELECT doc_id, unnest(sh) AS h FROM s),
        |bench AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0)
        |SELECT g.doc_id, count(*) AS n_shared_grams
        |FROM g JOIN bench USING (h) WHERE g.doc_id % 97 <> 0
        |GROUP BY g.doc_id ORDER BY g.doc_id ASC""".stripMargin,
    // canonical form = lowercase scheme://host + path minus trailing
    // slash + sorted non-utm params; ASCII-only strings so binary vs
    // default collation agree on the ORDER BY
    "dedup_url" ->
      raw"""WITH r AS (SELECT event_id,
        |  (CASE WHEN event_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END)
        |  || '://' ||
        |  (CASE WHEN event_id % 3 = 0
        |    THEN 'Shard' || (user_id % 4)::VARCHAR || '.Example.COM'
        |    ELSE 'shard' || (user_id % 4)::VARCHAR || '.example.com' END)
        |  || '/' || event_type || '/item' ||
        |  (CASE WHEN event_id % 7 = 0 THEN '/' ELSE '' END) ||
        |  (CASE WHEN event_id % 5 = 0
        |    THEN '?ref=home&id=' || (event_id % 50)::VARCHAR
        |    ELSE '?id=' || (event_id % 50)::VARCHAR || '&ref=home' END) ||
        |  (CASE WHEN event_id % 2 = 0 THEN '&utm_source=feed'
        |        ELSE '' END) ||
        |  (CASE WHEN event_id % 11 = 0 THEN '#section' ELSE '' END)
        |    AS raw_url
        | FROM events),
        |c AS (SELECT event_id, raw_url,
        |  regexp_replace(raw_url, '#.*$$', '') AS nofrag FROM r),
        |d AS (SELECT event_id, raw_url,
        |  lower(regexp_extract(nofrag, '^([^:]+://[^/]+)', 1))
        |    AS schemehost,
        |  regexp_replace(
        |    regexp_extract(nofrag, '^[^:]+://[^/]+([^?]*)', 1),
        |    '/$$', '') AS path,
        |  regexp_extract(nofrag, '\?(.*)$$', 1) AS qs FROM c),
        |e AS (SELECT event_id, raw_url, schemehost, path,
        |  list_sort(list_filter(string_split(qs, '&'),
        |    p -> p <> '' AND NOT starts_with(p, 'utm_'))) AS params
        |  FROM d),
        |f AS (SELECT event_id, raw_url,
        |  schemehost || path ||
        |  (CASE WHEN len(params) > 0
        |    THEN '?' || array_to_string(params, '&') ELSE '' END) AS canon
        |  FROM e)
        |SELECT canon, count(*) AS n_events,
        |  count(DISTINCT raw_url) AS n_raw_variants,
        |  min(event_id) AS survivor_id
        |FROM f GROUP BY canon ORDER BY canon ASC""".stripMargin,
    // the bloom prefilter has no false negatives and survivors are
    // exact-confirmed, so the result is decontaminate's, verbatim
    "decontaminate_bloom" ->
      raw"""WITH d AS (SELECT doc_id, string_split($normT, ' ') AS toks
        |           FROM documents
        |           WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |s AS (SELECT doc_id, list_distinct(list_transform(
        |        range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' '))) AS sh FROM d),
        |g AS (SELECT doc_id, unnest(sh) AS h FROM s),
        |bench AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0)
        |SELECT g.doc_id, count(*) AS n_shared_grams
        |FROM g JOIN bench USING (h) WHERE g.doc_id % 97 <> 0
        |GROUP BY g.doc_id ORDER BY g.doc_id ASC""".stripMargin,
    "repetition_score" ->
      raw"""WITH d AS (SELECT doc_id, string_split($normT, ' ') AS toks
        |           FROM documents
        |           WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |t AS (SELECT doc_id, len(toks) AS n_tok,
        |        len(list_distinct(toks)) AS n_uniq FROM d),
        |bg AS (SELECT doc_id, unnest(list_transform(
        |         range(0, greatest(len(toks) - 2, 0) + 1),
        |         i -> array_to_string(toks[i+1:i+2], ' '))) AS h FROM d),
        |bgc AS (SELECT doc_id, h, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |tb AS (SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS n_bi
        |       FROM bgc GROUP BY doc_id)
        |SELECT t.doc_id,
        |  round(1.0 - t.n_uniq::DOUBLE / t.n_tok::DOUBLE, 4)
        |    AS dup_token_frac,
        |  round(tb.top_cnt::DOUBLE / tb.n_bi::DOUBLE, 4) AS top_bigram_frac
        |FROM t JOIN tb USING (doc_id) ORDER BY doc_id ASC""".stripMargin,
    // feature arithmetic and term order mirror the Spark expression
    // exactly — same IEEE evaluation order, rounded at 4 dp after the
    // logistic link
    "quality_classifier" ->
      raw"""WITH d AS (SELECT doc_id, $normT AS norm,
        |             string_split($normT, ' ') AS toks FROM documents
        |           WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |f AS (SELECT doc_id, len(toks)::INT AS n_tokens,
        |        len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE
        |          AS uniq_ratio,
        |        (CASE WHEN regexp_matches(norm,
        |           '(^| )(the|and|of|to|in)( |$$)') THEN 1.0 ELSE 0.0 END)
        |          AS has_glue,
        |        length(replace(norm, ' ', ''))::DOUBLE / len(toks)::DOUBLE
        |          AS mean_word_len
        |      FROM d)
        |SELECT doc_id, n_tokens,
        |  round(1.0 / (1.0 + exp(-(-3.0 + n_tokens::DOUBLE * 0.01
        |    + uniq_ratio * 2.5 + has_glue * 0.5 + mean_word_len * 0.2))), 4)
        |    AS quality_score
        |FROM f ORDER BY doc_id ASC""".stripMargin,
    "vocab_topk" ->
      raw"""SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split($normT, ' ')) AS token FROM documents)
        |WHERE len(token) > 0
        |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 100""".stripMargin,
    // the sketch's EXACT regime: fixture vocab (31 tokens) is far under
    // the 1024-item capacity, so approx_top_k evicts nothing and its
    // counts equal the true counts; k=40 > |vocab| returns the whole
    // vocabulary, re-sorted deterministically on the Spark side
    "vocab_topk_approx" ->
      raw"""SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split($normT, ' ')) AS token FROM documents)
        |WHERE len(token) > 0
        |GROUP BY token ORDER BY cnt DESC, token ASC""".stripMargin,
    // membership-by-content-hash: Spark uses sha2, the oracle md5 — both
    // are injective-in-practice keys over the same normalized text, so
    // the anti-join survivor sets agree (same contract as dedup_exact)
    // dedup_incremental_cdf shares this oracle VERBATIM: the CDF
    // between the pinned v0 (%10<8) / v1 (full) snapshots is exactly
    // the %10>=8 insert set, so both formulations must produce the
    // same survivors (the join_asof_split shared-oracle precedent)
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_incremental_cdf" -> dedupIncrementalSql,
    "ngram_lm" ->
      raw"""WITH d AS (SELECT doc_id, string_split($normT, ' ') AS toks
        |           FROM documents
        |           WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |bg AS (SELECT toks[i+1] AS w1, toks[i+2] AS w2
        |       FROM d, unnest(range(0, len(toks) - 1)) AS t(i)
        |       WHERE len(toks) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1)
        |SELECT c12.w1, c12.w2, c12.c12, c1.c1,
        |  round(c12.c12::DOUBLE / c1.c1::DOUBLE, 4) AS p_cond
        |FROM c12 JOIN c1 USING (w1)
        |ORDER BY c12.c12 DESC, c12.w1 ASC, c12.w2 ASC
        |LIMIT 50""".stripMargin,
    // PMI double computed with the SAME IEEE expression tree on both
    // sides ((c12/N2) / ((c1/N1)*(c2/N1)), one ln, 6dp round), ranked
    // on the ROUNDED value with a (w1, w2) tie-break (SURVEY §5.3)
    "ngram_pmi" ->
      raw"""WITH d AS (SELECT string_split($normT, ' ') AS toks
        |           FROM documents),
        |tok AS (SELECT unnest(toks) AS w FROM d),
        |tok2 AS (SELECT w FROM tok WHERE length(w) > 0),
        |c1 AS (SELECT w, count(*) AS c FROM tok2 GROUP BY w),
        |n1 AS (SELECT count(*)::DOUBLE AS n1 FROM tok2),
        |bg AS (SELECT toks[i+1] AS w1, toks[i+2] AS w2
        |       FROM d, unnest(range(0, len(toks) - 1)) AS t(i)
        |       WHERE len(toks) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg
        |        GROUP BY 1, 2 HAVING count(*) >= 5),
        |n2 AS (SELECT count(*)::DOUBLE AS n2 FROM bg)
        |SELECT c12.w1, c12.w2, c12.c12, a.c AS c1, b.c AS c2,
        |  round(ln((c12.c12::DOUBLE / n2.n2) /
        |    ((a.c::DOUBLE / n1.n1) * (b.c::DOUBLE / n1.n1))), 6) AS pmi
        |FROM c12 JOIN c1 a ON c12.w1 = a.w
        |         JOIN c1 b ON c12.w2 = b.w, n1, n2
        |ORDER BY pmi DESC, c12.w1 ASC, c12.w2 ASC
        |LIMIT 100""".stripMargin,
    // selection order is the key-pure md5-prefix hash (the sample_hash
    // idiom) — identical in both engines, independent of layout
    "mix_budget" -> mixBudgetSql,
    // the bucket-pruned scale form is "approx" only in plan shape —
    // its output is bit-identical, so it shares the exact oracle
    "mix_budget_approx" -> mixBudgetSql,
    // per-language budgets generated from the SAME weights literal the
    // operator consumes (TextOps.DefaultMixWeights) — one source of
    // truth for the mixture spec on both engines
    "mix_weighted" -> mixWeightedSql,
    "mix_epochs" -> mixEpochsSql,
    "mix_temperature" -> mixTemperatureSql,
    // 5 unrolled power iterations in pure 1e12-scaled integer
    // arithmetic (HUGEINT products mirror Spark's DECIMAL(38,0)) — no
    // floating point until the final display division of an exact int
    "graph_pagerank" -> pagerankSql,
    // same fixed-point arithmetic, same oracle, verbatim (the
    // join_asof_split precedent: a scale-path rewrite earns its own
    // driver gate against the identical SQL)
    "graph_pagerank_dist" -> pagerankSql,
    // the ORACLE is the naive id-ordered 3-way self-join (exact at
    // fixture edge counts); the operator is the degree-oriented wedge
    // formulation — same triangle set by the orientation theorem
    "graph_triangles" ->
      """WITH e AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT e1.u AS t1, e1.v AS t2, e2.v AS t3
        |FROM e e1 JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        |ORDER BY t1 ASC, t2 ASC, t3 ASC""".stripMargin,
    // components via recursive transitive closure: min reachable id =
    // the label-propagation fixpoint, schedule-independent
    "graph_cc" ->
      """WITH RECURSIVE e AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |r(x, y) AS (
        |  SELECT u AS x, v AS y FROM und
        |  UNION
        |  SELECT r.x, und.v AS y FROM r JOIN und ON r.y = und.u)
        |SELECT x AS part, least(x, min(y))::BIGINT AS component
        |FROM r GROUP BY x ORDER BY part ASC""".stripMargin,
    // multi-source BFS as a depth-capped recursive closure: UNION
    // dedups (x, d) pairs so the cap (d < 12) bounds cyclic expansion;
    // min(d) per vertex = the BFS level (every fixture eccentricity
    // <= 10, so the cap is never binding on fixture data)
    // the temporal join's batch formulation: latest signup at or
    // before each purchase (same-ts signup matches, higher event_id
    // wins same-ts ties), unmatched purchases keep NULLs — the
    // event_attribution window technique carrying the value
    "stream_join_asof_ok" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type, value,
        |    CASE WHEN event_type = 'signup' THEN event_id END AS sid,
        |    CASE WHEN event_type = 'signup' THEN value END AS sval,
        |    CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS kind
        |  FROM events WHERE event_type IN ('signup', 'purchase')),
        |lv AS (
        |  SELECT event_id, user_id, event_type,
        |    last_value(sid IGNORE NULLS) OVER w AS signup_id,
        |    last_value(sval IGNORE NULLS) OVER w AS signup_value
        |  FROM ev WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts ASC, kind ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id AS purchase_id, user_id, signup_id,
        |  signup_value
        |FROM lv WHERE event_type = 'purchase'
        |ORDER BY purchase_id ASC""".stripMargin,
    // the timer-closed sessionizer's batch formulation: stream_session's
    // gap-and-island CTEs, islands projected WITHOUT the session_id
    // rank (the processor emits sessions, not ranks), exact DECIMAL sum
    "stream_session_ok" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), y AS (
        |  SELECT *, sum(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM x
        |)
        |SELECT user_id, date_trunc('second', min(ts)) AS session_start,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
        |FROM y GROUP BY user_id, session_id
        |ORDER BY user_id ASC, session_start ASC""".stripMargin,
    // last-touch attribution via the SAME single-stream window
    // formulation (clicks sort before purchases at equal ts; later
    // click ids win equal-ts ties); gap is exact integer microseconds
    "event_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    CASE WHEN event_type = 'click' THEN event_id END AS cid,
        |    CASE WHEN event_type = 'click'
        |      THEN epoch_us(ts) END AS cus,
        |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |lv AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(cid IGNORE NULLS) OVER (
        |      PARTITION BY user_id
        |      ORDER BY ts ASC, kind ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS click_id,
        |    last_value(cus IGNORE NULLS) OVER (
        |      PARTITION BY user_id
        |      ORDER BY ts ASC, kind ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS click_us
        |  FROM ev)
        |SELECT event_id AS purchase_id, user_id, click_id,
        |  epoch_us(ts) - click_us AS gap_us
        |FROM lv
        |WHERE event_type = 'purchase' AND click_id IS NOT NULL
        |  AND epoch_us(ts) - click_us <= 7 * 86400 * 1000000::BIGINT
        |ORDER BY purchase_id ASC""".stripMargin,
    "graph_sssp" ->
      """WITH RECURSIVE e AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |r(x, d) AS (
        |  SELECT DISTINCT u AS x, 0 AS d FROM und WHERE u % 17 = 0
        |  UNION
        |  SELECT und.v AS x, r.d + 1 AS d
        |  FROM r JOIN und ON r.x = und.u WHERE r.d < 12)
        |SELECT x AS part, CAST(min(d) AS INTEGER) AS dist
        |FROM r GROUP BY x ORDER BY part ASC""".stripMargin,
    // seed-sampled closeness: the sssp recursion with the SEED kept in
    // the row — UNION-deduped (s, x, d) triples, depth-capped at 12;
    // min d per (seed, vertex), then exact integer counts and one 4dp
    // division (self-distance d=0 excluded, the engine's dist>0 rule)
    "graph_closeness" ->
      """WITH RECURSIVE e AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |r(s, x, d) AS (
        |  SELECT DISTINCT u AS s, u AS x, 0 AS d FROM und WHERE u % 17 = 0
        |  UNION
        |  SELECT r.s, und.v AS x, r.d + 1 AS d
        |  FROM r JOIN und ON r.x = und.u WHERE r.d < 12),
        |md AS (SELECT s, x, min(d) AS d FROM r GROUP BY 1, 2)
        |SELECT x AS part, count(*)::BIGINT AS n_seeds,
        |  sum(d)::BIGINT AS total_dist,
        |  round(count(*)::DOUBLE / sum(d)::DOUBLE, 4) AS closeness
        |FROM md WHERE d > 0
        |GROUP BY x ORDER BY part ASC""".stripMargin,
    // seed-pair betweenness: min-dist via the closeness recursion
    // (depth-capped 4), σ via level-DP CTEs (σ_d = Σ parent σ_{d−1} —
    // aggregates can't live in a recursive term, so the pinned depth
    // unrolls them, the labelprop precedent), contributions as exact
    // HUGEINT σ_sv·σ_tv·1e6 // σ_st floors, integer-summed. The
    // MATERIALIZED hints are load-bearing: sp is referenced three
    // times and DuckDB's default inlining re-evaluates the whole
    // chain per reference (measured 88 s → 0.5 s at sf0.1)
    "graph_betweenness" ->
      """WITH RECURSIVE e AS MATERIALIZED (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS MATERIALIZED (SELECT u, v FROM e
        |  UNION ALL SELECT v AS u, u AS v FROM e),
        |r(s, x, d) AS (
        |  SELECT DISTINCT u AS s, u AS x, 0 AS d FROM und WHERE u % 17 = 0
        |  UNION
        |  SELECT r.s, und.v AS x, r.d + 1 AS d
        |  FROM r JOIN und ON r.x = und.u WHERE r.d < 4),
        |md AS MATERIALIZED (SELECT s, x, min(d) AS d FROM r GROUP BY 1, 2),
        |s0 AS (SELECT s, x, 1::BIGINT AS sig FROM md WHERE d = 0),
        |s1 AS MATERIALIZED (SELECT p.s, m.x, sum(p.sig)::BIGINT AS sig
        |  FROM s0 p JOIN und ON und.u = p.x
        |  JOIN md m ON m.s = p.s AND m.x = und.v AND m.d = 1 GROUP BY 1, 2),
        |s2 AS MATERIALIZED (SELECT p.s, m.x, sum(p.sig)::BIGINT AS sig
        |  FROM s1 p JOIN und ON und.u = p.x
        |  JOIN md m ON m.s = p.s AND m.x = und.v AND m.d = 2 GROUP BY 1, 2),
        |s3 AS MATERIALIZED (SELECT p.s, m.x, sum(p.sig)::BIGINT AS sig
        |  FROM s2 p JOIN und ON und.u = p.x
        |  JOIN md m ON m.s = p.s AND m.x = und.v AND m.d = 3 GROUP BY 1, 2),
        |s4 AS MATERIALIZED (SELECT p.s, m.x, sum(p.sig)::BIGINT AS sig
        |  FROM s3 p JOIN und ON und.u = p.x
        |  JOIN md m ON m.s = p.s AND m.x = und.v AND m.d = 4 GROUP BY 1, 2),
        |sp AS MATERIALIZED (SELECT s0.s, s0.x, 0 AS d, sig FROM s0
        |  UNION ALL SELECT s, x, 1, sig FROM s1
        |  UNION ALL SELECT s, x, 2, sig FROM s2
        |  UNION ALL SELECT s, x, 3, sig FROM s3
        |  UNION ALL SELECT s, x, 4, sig FROM s4),
        |pairs AS (SELECT s, x AS t, d AS dst, sig AS sigst FROM sp
        |  WHERE x % 17 = 0 AND x > s),
        |contrib AS (
        |  SELECT a.x AS v, a.sig * b.sig AS stress_term,
        |    (a.sig::HUGEINT * b.sig * 1000000) // p.sigst AS bt_term
        |  FROM pairs p
        |  JOIN sp a ON a.s = p.s
        |  JOIN sp b ON b.s = p.t AND b.x = a.x
        |  WHERE a.d + b.d = p.dst AND a.x <> p.s AND a.x <> p.t)
        |SELECT v AS part, count(*)::BIGINT AS n_pairs,
        |  sum(stress_term)::BIGINT AS stress,
        |  CAST(sum(bt_term) AS BIGINT) AS bt_fp,
        |  round(CAST(sum(bt_term) AS BIGINT)::DOUBLE / 1000000, 6)
        |    AS betweenness
        |FROM contrib GROUP BY v ORDER BY part ASC""".stripMargin,
    // widest path: capacities only RISE toward the fixpoint and draw
    // from the finite co-value set, so the UNION recursion terminates
    // with no depth cap; max(cap) per vertex = the bottleneck optimum
    "graph_widest" ->
      """WITH RECURSIVE e AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v,
        |    count(*)::BIGINT AS co
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT u, v, co FROM e
        |  UNION ALL SELECT v AS u, u AS v, co FROM e),
        |r(x, cap) AS (
        |  SELECT DISTINCT u AS x, CAST(1000000000 AS BIGINT) AS cap
        |  FROM und WHERE u % 17 = 0
        |  UNION
        |  SELECT und.v AS x, LEAST(r.cap, und.co) AS cap
        |  FROM r JOIN und ON r.x = und.u)
        |SELECT x AS part, CAST(max(cap) AS BIGINT) AS capacity
        |FROM r GROUP BY x ORDER BY part ASC""".stripMargin,
    // synchronous LPA with a PINNED schedule (4 rounds, weighted-
    // majority tie rule w DESC / label ASC): each round is one
    // window-over-aggregate CTE chained off the previous — the
    // bpe_train unrolled-iterations precedent, no recursion needed
    "graph_labelprop" -> {
      val rounds = (1 to 4).map { r =>
        s"""l$r AS (SELECT x, nl AS lbl FROM (
           |  SELECT und.v AS x, p.lbl AS nl,
           |    row_number() OVER (PARTITION BY und.v
           |      ORDER BY sum(und.co) DESC, p.lbl ASC) AS rn
           |  FROM und JOIN l${r - 1} p ON und.u = p.x
           |  GROUP BY und.v, p.lbl) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT a.l_partkey AS u, b.l_partkey AS v,
         |    count(*)::BIGINT AS co
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |und AS (SELECT u, v, co FROM e
         |  UNION ALL SELECT v AS u, u AS v, co FROM e),
         |l0 AS (SELECT DISTINCT u AS x, u AS lbl FROM und),
         |$rounds
         |SELECT x AS part, lbl AS community FROM l4
         |ORDER BY part ASC""".stripMargin
    },
    // 4 pinned peel sweeps unrolled as chained CTEs (the labelprop
    // precedent); the engine's early-exit is sound because peeling is
    // monotone — a no-op sweep is the fixpoint, so pinned == converged
    "graph_kcore" -> {
      val sweeps = (1 to 4).map { r =>
        s"""v$r AS (SELECT und.u AS x FROM und
           |  JOIN v${r - 1} a ON und.u = a.x
           |  JOIN v${r - 1} b ON und.v = b.x
           |  GROUP BY und.u HAVING count(*) >= 3)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT a.l_partkey AS u, b.l_partkey AS v,
         |    count(*)::BIGINT AS co
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |und AS (SELECT u, v, co FROM e
         |  UNION ALL SELECT v AS u, u AS v, co FROM e),
         |v0 AS (SELECT DISTINCT u AS x FROM und),
         |$sweeps
         |SELECT und.u AS part, count(*)::BIGINT AS core_degree
         |FROM und
         |  JOIN v4 a ON und.u = a.x
         |  JOIN v4 b ON und.v = b.x
         |GROUP BY 1 ORDER BY part ASC""".stripMargin
    },
    // per-vertex closed-wedge fraction; deg < 2 excluded (cc undefined)
    "graph_clustcoef" ->
      """WITH e AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v,
        |    count(*)::BIGINT AS co
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT u AS x, v AS w FROM e
        |  UNION ALL SELECT v AS x, u AS w FROM e),
        |deg AS (SELECT x, count(*)::BIGINT AS d FROM und GROUP BY 1),
        |closed AS (SELECT a.x, count(*)::BIGINT AS n_tri
        |  FROM und a JOIN und b ON a.x = b.x AND a.w < b.w
        |  JOIN e ON e.u = a.w AND e.v = b.w
        |  GROUP BY 1)
        |SELECT deg.x AS part, deg.d AS degree,
        |  coalesce(closed.n_tri, 0) AS n_triangles,
        |  round(coalesce(closed.n_tri, 0)::DOUBLE * 2.0
        |    / (deg.d * (deg.d - 1))::DOUBLE, 4) AS clustcoef
        |FROM deg LEFT JOIN closed ON deg.x = closed.x
        |WHERE deg.d >= 2
        |ORDER BY part ASC""".stripMargin,
    // neighbor-set Jaccard: wedge self-join on the shared neighbor,
    // degrees attached keyed, 4dp round BEFORE the threshold compare
    // (mirrored exactly engine-side so the cut is on identical values)
    "graph_jaccard" ->
      """WITH e AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v,
        |    count(*)::BIGINT AS co
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT u AS x, v AS w FROM e
        |  UNION ALL SELECT v AS x, u AS w FROM e),
        |deg AS (SELECT x, count(*)::BIGINT AS d FROM und GROUP BY 1),
        |inter AS (SELECT a.x AS u, b.x AS v, count(*)::BIGINT AS n_common
        |  FROM und a JOIN und b ON a.w = b.w AND a.x < b.x
        |  GROUP BY 1, 2),
        |j AS (SELECT i.u, i.v, i.n_common,
        |    round(i.n_common::DOUBLE /
        |      (du.d + dv.d - i.n_common)::DOUBLE, 4) AS jaccard
        |  FROM inter i
        |  JOIN deg du ON i.u = du.x
        |  JOIN deg dv ON i.v = dv.x)
        |SELECT u, v, n_common, jaccard FROM j
        |WHERE jaccard >= 0.25
        |ORDER BY u ASC, v ASC""".stripMargin,
    "corpus_report" ->
      raw"""WITH d AS (SELECT lang, source, n_chars,
        |    len(string_split($normT, ' '))::BIGINT AS n_tokens
        |  FROM documents)
        |SELECT CASE WHEN grouping(lang) = 0 AND grouping(source) = 0
        |              THEN 'cell'
        |            WHEN grouping(lang) = 0 THEN 'lang'
        |            WHEN grouping(source) = 0 THEN 'source'
        |            ELSE 'corpus' END AS level,
        |  coalesce(lang, '(all)') AS lang,
        |  coalesce(source, '(all)') AS source,
        |  COUNT(1) AS n_docs,
        |  SUM(n_tokens)::BIGINT AS n_tokens,
        |  SUM(n_chars)::BIGINT AS n_chars,
        |  ((SUM(n_chars)::BIGINT * 20000 + COUNT(1))
        |    // (2 * COUNT(1)))::DOUBLE / 10000 AS avg_chars
        |FROM d
        |GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
        |ORDER BY level ASC, lang ASC, source ASC""".stripMargin,
    // phase = quality_lm_bucket's ntile verbatim; rank = sample_hash's
    // 8-hex md5 prefix verbatim — the schedule composes two green rows
    "mix_curriculum" ->
      raw"""WITH $lmScoreCtes,
        |j AS (SELECT lm.doc_id AS doc_id, documents.lang AS lang,
        |        ntile(3) OVER (PARTITION BY documents.lang
        |          ORDER BY lm.avg_logp DESC, lm.doc_id ASC) AS phase
        |      FROM lm JOIN documents ON lm.doc_id = documents.doc_id)
        |SELECT doc_id, lang, phase,
        |  ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |    AS rank
        |FROM j ORDER BY phase ASC, rank ASC, doc_id ASC""".stripMargin,
    "bpe_train" -> bpeTrainSql,
    "unigram_train" -> unigramTrainSql,
    "unigram_fertility" -> unigramFertilitySql,
    "unigram_encode" -> unigramEncodeSql,
    "wordpiece_train" -> wordpieceTrainSql,
    "wordpiece_encode" -> wordpieceEncodeSql,
    "wordpiece_fertility" -> wordpieceFertilitySql,
    "bpe_encode" -> bpeEncodeSql,
    "bpe_fertility" -> bpeFertilitySql,
    "pipeline_tokenize" -> pipelineTokenizeSql,
    // per-bigram ln rounded to 6dp and summed as DECIMAL on both sides
    // — double sums are addition-order-dependent, decimal sums are
    // exact, so the 4dp hash-match is deterministic (SURVEY §5.3)
    "lm_doc_score" ->
      raw"""WITH $lmScoreCtes
        |SELECT doc_id, n_bigrams, avg_logp
        |FROM lm ORDER BY doc_id ASC""".stripMargin,
    // per-language terciles of the lm score; ties broken by doc_id so
    // NTILE's total order (and the hash) is deterministic in both engines
    "quality_lm_bucket" ->
      raw"""WITH $lmScoreCtes,
        |j AS (SELECT lm.doc_id AS doc_id, documents.lang AS lang,
        |        lm.avg_logp AS avg_logp,
        |        ntile(3) OVER (PARTITION BY documents.lang
        |          ORDER BY lm.avg_logp DESC, lm.doc_id ASC) AS t
        |      FROM lm JOIN documents ON lm.doc_id = documents.doc_id)
        |SELECT doc_id, lang, avg_logp,
        |  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |         ELSE 'tail' END AS bucket
        |FROM j ORDER BY doc_id ASC""".stripMargin,
    // approx-cutoff scale variant: DuckDB buckets by its own exact
    // discrete percentiles; rows inside the rank-window value interval
    // around each tercile boundary are excluded on BOTH sides (the
    // Spark sketch's cut and DuckDB's quantile_disc both land inside
    // the excluded interval, so kept docs bucket identically)
    "quality_lm_bucket_approx" -> qlbApproxSql,
    // the curriculum schedule over the SAME boundary-safe doc subset:
    // phase = the approx bucket (1/2/3), rank = the md5 prefix — one
    // wrapper SELECT over the quality_lm_bucket_approx oracle verbatim
    "mix_curriculum_approx" ->
      raw"""SELECT doc_id, lang,
        |  CASE bucket WHEN 'head' THEN 1 WHEN 'middle' THEN 2
        |    ELSE 3 END AS phase,
        |  ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |    AS rank
        |FROM ($qlbApproxSql) q
        |ORDER BY phase ASC, rank ASC, doc_id ASC""".stripMargin,
    // docs that produce a simhash = docs with at least one token; the
    // kernel tokenizes on whitespace runs, so \S+ run-count is exact
    "dedup_simhash_ids" ->
      raw"""SELECT doc_id FROM documents
        |WHERE len(regexp_extract_all(text, '\S+')) > 0
        |ORDER BY doc_id ASC""".stripMargin,
    // gram count of the k=3 non-distinct shingle kernel:
    // max(nTok − 3, 0) + 1 over whitespace-run tokens
    "doc_fingerprint_ids" ->
      raw"""SELECT doc_id,
        |  (greatest(len(regexp_extract_all(text, '\S+')) - 3, 0) + 1)::INT
        |    AS n_grams
        |FROM documents
        |WHERE len(regexp_extract_all(text, '\S+')) > 0
        |ORDER BY doc_id ASC""".stripMargin,
    "dedup_exact" ->
      raw"""WITH h AS (SELECT doc_id, lang, source,
        |              md5($normT) AS th FROM documents),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY th ORDER BY doc_id ASC) AS rn FROM h)
        |SELECT doc_id, lang, source FROM r WHERE rn = 1
        |ORDER BY doc_id ASC""".stripMargin,
    "text_stats" ->
      raw"""SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  round(sum(n_tokens)::DOUBLE / count(*), 4) AS avg_tokens
        |FROM (SELECT source, lang, n_chars,
        |        len(string_split($normT, ' '))::INT AS n_tokens
        |      FROM documents)
        |GROUP BY source, lang ORDER BY source ASC, lang ASC""".stripMargin,
    "token_count" ->
      raw"""SELECT doc_id,
        |  len(string_split($normT, ' '))::INT AS ws_tokens,
        |  (len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'),
        |       t -> length(t) > 0))
        |   + length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')))::INT
        |    AS bpeish_tokens,
        |  length(text)::INT AS n_chars
        |FROM documents ORDER BY doc_id ASC""".stripMargin,
    "text_tfidf" ->
      raw"""WITH docs AS (SELECT doc_id, lang, $normT AS t FROM documents),
        |tok AS (SELECT doc_id, lang, unnest(string_split(t, ' ')) AS term FROM docs),
        |tok2 AS (SELECT * FROM tok WHERE length(term) > 0),
        |tf AS (SELECT lang, term, count(*) AS tf FROM tok2 GROUP BY lang, term),
        |df AS (SELECT term, count(*) AS df FROM
        |        (SELECT DISTINCT doc_id, term FROM tok2) GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT lang, term, tfidf, rn::INT AS rn FROM (
        |  SELECT tf.lang AS lang, tf.term AS term,
        |    round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf,
        |    row_number() OVER (PARTITION BY tf.lang
        |      ORDER BY round(tf.tf * ln(n.n_docs / df.df), 6) DESC,
        |               tf.term ASC) AS rn
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        |) WHERE rn <= 5 ORDER BY lang ASC, rn ASC""".stripMargin,
    "quality_filter" ->
      raw"""WITH s AS (
        |  SELECT doc_id, lang, n_chars, text, $normT AS t FROM documents
        |), m AS (
        |  SELECT doc_id, lang, n_chars, text,
        |    len(string_split(t, ' '))::INT AS n_tokens,
        |    round(length(replace(t, ' ', ''))::DOUBLE
        |          / len(string_split(t, ' ')), 4) AS mean_word_len,
        |    round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
        |          / length(text), 4) AS alpha_ratio,
        |    CASE WHEN regexp_matches(text, '\b(the|and|of|to|in)\b')
        |         THEN 1 ELSE 0 END AS has_glue
        |  FROM s)
        |SELECT doc_id, lang, n_tokens, mean_word_len, alpha_ratio, has_glue
        |FROM m
        |WHERE lang IN ('en','de','es','fr')
        |  AND n_tokens BETWEEN 3 AND 10000
        |  AND n_chars BETWEEN 20 AND 100000
        |  AND mean_word_len BETWEEN 2.0 AND 12.0
        |ORDER BY doc_id ASC""".stripMargin,
    "lang_id" ->
      raw"""WITH s AS (SELECT doc_id, lang,
        |        string_split($normT, ' ') AS toks FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  len(list_filter(toks, t -> regexp_matches(t, '^(the|and|of|to|in|is|that|for)$$')))::INT AS sc_en,
        |  len(list_filter(toks, t -> regexp_matches(t, '^(der|die|das|und|ist|nicht|ein|zu)$$')))::INT AS sc_de,
        |  len(list_filter(toks, t -> regexp_matches(t, '^(el|la|los|de|que|es|en|por)$$')))::INT AS sc_es,
        |  len(list_filter(toks, t -> regexp_matches(t, '^(le|la|les|de|est|et|un|que)$$')))::INT AS sc_fr
        | FROM s)
        |SELECT doc_id, lang,
        |  CASE WHEN best_score = 0 THEN 'und'
        |       WHEN sc_en = best_score THEN 'en'
        |       WHEN sc_de = best_score THEN 'de'
        |       WHEN sc_es = best_score THEN 'es'
        |       ELSE 'fr' END AS pred_lang,
        |  best_score
        |FROM (SELECT *, greatest(sc_en, sc_de, sc_es, sc_fr) AS best_score FROM sc)
        |ORDER BY doc_id ASC""".stripMargin,
    "text_normalize" ->
      raw"""SELECT doc_id, length(text)::INT AS len_raw,
        |  $normT AS norm,
        |  regexp_replace($normT, '[^a-z0-9 ]', '', 'g') AS norm_alnum,
        |  length($normT)::INT AS len_norm
        |FROM documents ORDER BY doc_id ASC""".stripMargin,
    "pii_scrub" ->
      raw"""SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))::INT
        |    AS n_emails,
        |  len(regexp_extract_all(text, '\+?[0-9][0-9() -]{6,}[0-9]'))::INT
        |    AS n_phones,
        |  regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9() -]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed
        |FROM documents ORDER BY doc_id ASC""".stripMargin,
    "pack_sequences" ->
      raw"""WITH t AS (SELECT source, doc_id,
        |    len(string_split($normT, ' '))::INT AS n_tok FROM documents),
        |c AS (SELECT source, doc_id, n_tok,
        |    coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM t)
        |SELECT source, doc_id, n_tok,
        |  (cum_before // 512)::BIGINT AS pack_id,
        |  (cum_before % 512)::BIGINT AS pack_offset
        |FROM c ORDER BY source ASC, doc_id ASC""".stripMargin,
    // chunk i covers normalized tokens [i*48, i*48+64); DuckDB list
    // slicing is 1-based inclusive, Spark's slice(start, length) is
    // 1-based with a length — same token range either way
    "doc_chunking" ->
      raw"""WITH d AS (SELECT doc_id, string_split($normT, ' ') AS toks,
        |    len(string_split($normT, ' ')) AS n_tok FROM documents),
        |c AS (SELECT doc_id, toks, n_tok,
        |    unnest(range(0,
        |      CAST(ceil(greatest(n_tok - 64, 0) / 48.0) AS BIGINT) + 1))
        |      AS chunk_id
        |  FROM d)
        |SELECT doc_id, chunk_id::INT AS chunk_id,
        |  (chunk_id * 48)::INT AS start_tok,
        |  (least(chunk_id * 48 + 64, n_tok) - chunk_id * 48)::INT
        |    AS chunk_len,
        |  array_to_string(
        |    toks[chunk_id * 48 + 1 : least(chunk_id * 48 + 64, n_tok)],
        |    ' ') AS chunk_text
        |FROM c ORDER BY doc_id ASC, chunk_id ASC""".stripMargin,
    // exact scaled-long moments (DECIMAL(18,4) element snap → exact
    // scale-8 products), then the same IEEE tree per covariance; the
    // oracle's pair frame mirrors the aggregate's upper triangle.
    // The snap casts through DOUBLE first (the embedding_quantize
    // pin-to-DOUBLE rule): DuckDB's direct FLOAT→DECIMAL rounds the
    // float's own repr and flipped one fixture element a half-step
    // against the aggregate's double-based snap
    "embedding_pca" -> embeddingPcaSql,
    "simsearch_opq_pca" -> simsearchOpqPcaSql,
    // the same CTE chain, consumed by a per-vector exact dot: snap
    // each element to its scale-4 long, multiply the scale-12
    // direction, sum in HUGEINT → the scale-16 integer score
    "embedding_pca_project" -> (embeddingPcaSql
      .replaceFirst("(?s)\nSELECT i - 1 AS dim.*$", "") + "\n" +
      raw"""SELECT vec_id,
        |  SUM(CAST(CAST(CAST(embedding[t.i] AS DOUBLE)
        |        AS DECIMAL(18,4)) * 10000 AS BIGINT) * v.v)::BIGINT
        |    AS score_fp,
        |  CAST(SUM(CAST(CAST(CAST(embedding[t.i] AS DOUBLE)
        |        AS DECIMAL(18,4)) * 10000 AS BIGINT) * v.v)::BIGINT
        |      AS DOUBLE)
        |    / 1e16 AS score
        |FROM embeddings CROSS JOIN range(1, 65) t(i)
        |JOIN v20 v ON v.i = CAST(t.i AS INT)
        |GROUP BY vec_id
        |ORDER BY vec_id ASC""".stripMargin),
    "embedding_covariance" ->
      raw"""WITH x AS (SELECT vec_id, CAST(t.i AS INT) AS i,
        |    CAST(CAST(embedding[t.i] AS DOUBLE) AS DECIMAL(18,4)) AS xd
        |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
        |s AS (SELECT a.i AS i, b.i AS j,
        |    COUNT(*)::BIGINT AS n,
        |    SUM(a.xd * b.xd) AS sxy,
        |    SUM(a.xd) AS sxi, SUM(b.xd) AS sxj
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2)
        |SELECT i - 1 AS i, j - 1 AS j,
        |  CAST(sxy AS DOUBLE) / n
        |    - (CAST(sxi AS DOUBLE) / n) * (CAST(sxj AS DOUBLE) / n) AS cov
        |FROM s ORDER BY i ASC, j ASC""".stripMargin,
    // norms snap to 6dp per row then SUM exactly as DECIMAL(28,6);
    // the per-dim variances are the covariance oracle's diagonal tree
    // verbatim; extremes rank on those doubles with lowest-dim ties
    "embedding_report" ->
      raw"""WITH nr AS (SELECT vec_id,
        |    round(sqrt(list_sum(list_transform(embedding,
        |      x -> x::DOUBLE * x::DOUBLE))), 6) AS nrm,
        |    CASE WHEN len(list_filter(embedding, x -> x != 0)) = 0
        |         THEN 1 ELSE 0 END AS z
        |  FROM embeddings),
        |b AS (SELECT COUNT(*) AS n_vecs, SUM(z)::BIGINT AS n_zero,
        |    MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
        |    round(CAST(SUM(CAST(nrm AS DECIMAL(28,6))) AS DOUBLE)
        |      / COUNT(*)::DOUBLE, 6) AS mean_norm
        |  FROM nr),
        |x AS (SELECT vec_id, CAST(t.i AS INT) AS i,
        |    CAST(CAST(embedding[t.i] AS DOUBLE) AS DECIMAL(18,4)) AS xd
        |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
        |s AS (SELECT i, COUNT(*)::BIGINT AS n,
        |    SUM(xd * xd) AS sxx, SUM(xd) AS sx
        |  FROM x GROUP BY 1),
        |v AS (SELECT i - 1 AS dim,
        |    CAST(sxx AS DOUBLE) / n
        |      - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
        |      AS var FROM s),
        |vv AS (SELECT
        |    (SELECT dim FROM v ORDER BY var DESC, dim ASC LIMIT 1)::INT
        |      AS top_var_dim,
        |    round((SELECT var FROM v ORDER BY var DESC, dim ASC
        |      LIMIT 1), 6) AS top_var,
        |    (SELECT dim FROM v ORDER BY var ASC, dim ASC LIMIT 1)::INT
        |      AS min_var_dim,
        |    round((SELECT var FROM v ORDER BY var ASC, dim ASC
        |      LIMIT 1), 6) AS min_var)
        |SELECT b.*, vv.* FROM b, vv""".stripMargin,
    // all arithmetic pinned to DOUBLE on both sides (FLOAT/FLOAT stays
    // FLOAT in DuckDB but widens to DOUBLE in Spark); round() is
    // half-away-from-zero for doubles in both engines
    "embedding_quantize" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
        |  FROM embeddings),
        |s AS (SELECT vec_id, xd,
        |    list_max(list_transform(xd, x -> abs(x))) / 127.0 AS scale
        |  FROM e)
        |SELECT vec_id, len(xd)::INT AS n_dim,
        |  round(scale, 6) AS scale6,
        |  CASE WHEN scale = 0 THEN '' ELSE array_to_string(
        |    list_transform(xd,
        |      x -> CAST(CAST(round(x / scale, 0) AS INT) AS VARCHAR)),
        |    ',') END AS codes_csv,
        |  CASE WHEN scale = 0 THEN 0.0 ELSE
        |    round(list_max(list_transform(xd,
        |      x -> abs(round(x / scale, 0) * scale - x))), 4)
        |  END AS max_abs_err
        |FROM s ORDER BY vec_id ASC""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, source,
        |  (('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::BIGINT
        |    % 100)::INT AS bucket
        |FROM documents
        |WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100
        |  < (CASE WHEN lang = 'en' THEN 20
        |          WHEN lang = 'de' THEN 10 ELSE 5 END)
        |ORDER BY doc_id ASC""".stripMargin,
    // mirrors the Spark df-cap: shingles with per-source document
    // frequency > min(0.3·|source|, 10000) are dropped from the shingle
    // universe before pairing (sizes post-filter too); the absolute term
    // is MinHashDedup.DefaultMaxDfAbs (r7 #1 — bounds posting lists by a
    // constant at any corpus size; never binds at fixture scale)
    "dedup_ngram_jaccard" ->
      raw"""WITH $ngramPairCtes
        |SELECT source, a_id, b_id, jaccard FROM p WHERE jaccard >= 0.05
        |ORDER BY source ASC, a_id ASC, b_id ASC""".stripMargin,
    // exact pair-vocabulary Jaccard anchors the row (string grams vs
    // 64-bit kernel hashes — the decontaminate convention); the
    // signature estimate is engine-specific, so its 0.1-error contract
    // rides as a hash-gated TRUE (the agg_hll_rollup technique)
    "agg_minhash_union" ->
      raw"""WITH d AS (SELECT doc_id, lang, string_split($normT, ' ') AS toks
        |           FROM documents
        |           WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |s AS (SELECT doc_id, lang, list_distinct(list_transform(
        |        range(0, greatest(len(toks) - 3, 0) + 1),
        |        i -> array_to_string(toks[i+1:i+3], ' '))) AS sh FROM d),
        |g AS (SELECT DISTINCT lang, h
        |      FROM (SELECT lang, unnest(sh) AS h FROM s)),
        |sizes AS (SELECT lang, count(*) AS n FROM g GROUP BY 1),
        |t AS (SELECT DISTINCT lang FROM documents),
        |pp AS (SELECT a.lang AS lang_a, b.lang AS lang_b
        |       FROM t a JOIN t b ON a.lang < b.lang),
        |inter AS (SELECT a.lang AS la, b.lang AS lb, count(*) AS ni
        |          FROM g a JOIN g b ON a.h = b.h AND a.lang < b.lang
        |          GROUP BY 1, 2)
        |SELECT pp.lang_a, pp.lang_b,
        |  coalesce(inter.ni, 0) AS n_inter,
        |  round(coalesce(inter.ni, 0)::DOUBLE /
        |    (sa.n::DOUBLE + sb.n::DOUBLE - coalesce(inter.ni, 0)::DOUBLE),
        |    4) AS jaccard,
        |  TRUE AS minhash_ok
        |FROM pp
        |LEFT JOIN inter ON pp.lang_a = inter.la AND pp.lang_b = inter.lb
        |JOIN sizes sa ON pp.lang_a = sa.lang
        |JOIN sizes sb ON pp.lang_b = sb.lang
        |ORDER BY lang_a ASC, lang_b ASC""".stripMargin,
    // the v2 capstone: span-duplication gate (majority-masked docs out)
    // → exact dedup → bloom decontaminate (≡ exact) → pack; CTE names
    // prefixed z_ for the span stage to avoid colliding with the
    // decontaminate stage's d/s/g
    "pipeline_curate_v2" ->
      raw"""WITH zd AS (SELECT doc_id, string_split($normT, ' ') AS toks
        |           FROM documents
        |           WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |zln AS (SELECT doc_id, len(toks) AS n_tokens FROM zd),
        |zsp0 AS (SELECT doc_id, unnest(list_transform(
        |          range(0, greatest(len(toks) - 8, 0) + 1),
        |          i -> struct_pack(pos := i,
        |                 h := array_to_string(toks[i+1:i+8], ' ')))) AS s
        |        FROM zd),
        |zsp AS (SELECT doc_id, (s.pos)::BIGINT AS pos, s.h AS h
        |        FROM zsp0),
        |zdup AS (SELECT h, min(doc_id * 100000 + pos) AS first_occ
        |        FROM zsp GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |zocc AS (SELECT zsp.doc_id, zsp.pos FROM zsp JOIN zdup USING (h)
        |        WHERE zsp.doc_id * 100000 + zsp.pos <> zdup.first_occ),
        |zcov AS (SELECT o.doc_id, unnest(range(o.pos,
        |           o.pos + least(8, zln.n_tokens))) AS tp
        |         FROM zocc o JOIN zln ON o.doc_id = zln.doc_id),
        |zmask AS (SELECT doc_id, count(*) AS n_masked
        |          FROM (SELECT DISTINCT doc_id, tp FROM zcov)
        |          GROUP BY doc_id),
        |toodup AS (SELECT m.doc_id FROM zmask m
        |           JOIN zln ON m.doc_id = zln.doc_id
        |           WHERE m.n_masked * 2 > zln.n_tokens),
        |q0 AS (SELECT doc_id, source, $normT AS t FROM documents),
        |m2 AS (SELECT doc_id, source, t,
        |    len(string_split(t, ' '))::INT AS n_tokens FROM q0),
        |keep AS (SELECT * FROM m2 WHERE n_tokens >= 3
        |  AND doc_id NOT IN (SELECT doc_id FROM toodup)),
        |ded AS (SELECT *, row_number() OVER (
        |    PARTITION BY md5(t) ORDER BY doc_id ASC) AS rn FROM keep),
        |surv AS (SELECT doc_id, source, n_tokens FROM ded
        |  WHERE rn = 1 AND doc_id % 97 <> 0),
        |d AS (SELECT doc_id, string_split($normT, ' ') AS toks
        |  FROM documents WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |s AS (SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(toks) - 3, 0) + 1),
        |    i -> array_to_string(toks[i+1:i+3], ' '))) AS sh FROM d),
        |g AS (SELECT doc_id, unnest(sh) AS h FROM s),
        |bench AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0),
        |cont AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (h)
        |  WHERE g.doc_id % 97 <> 0),
        |fin AS (SELECT sv.* FROM surv sv LEFT JOIN cont c
        |  ON sv.doc_id = c.doc_id WHERE c.doc_id IS NULL),
        |p AS (SELECT source, doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS cum_before
        |  FROM fin)
        |SELECT source, doc_id, n_tokens,
        |  (cum_before // 512)::BIGINT AS pack_id,
        |  (cum_before % 512)::BIGINT AS pack_offset
        |FROM p ORDER BY source ASC, doc_id ASC""".stripMargin,
    // the removal step of the span family: mask every duplicated-span
    // occurrence except the globally first (min packed (doc_id, pos) —
    // positions < 1e5 by fixture bound); cover positions are DISTINCT
    // so overlapping spans don't double-count masked tokens
    "dedup_span_mask" ->
      raw"""WITH d AS (SELECT doc_id, string_split($normT, ' ') AS toks
        |           FROM documents
        |           WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |ln AS (SELECT doc_id, len(toks) AS n_tokens FROM d),
        |sp0 AS (SELECT doc_id, unnest(list_transform(
        |          range(0, greatest(len(toks) - 8, 0) + 1),
        |          i -> struct_pack(pos := i,
        |                 h := array_to_string(toks[i+1:i+8], ' ')))) AS s
        |        FROM d),
        |sp AS (SELECT doc_id, (s.pos)::BIGINT AS pos, s.h AS h FROM sp0),
        |dup AS (SELECT h, min(doc_id * 100000 + pos) AS first_occ
        |        FROM sp GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |occ AS (SELECT sp.doc_id, sp.pos FROM sp JOIN dup USING (h)
        |        WHERE sp.doc_id * 100000 + sp.pos <> dup.first_occ),
        |cov0 AS (SELECT o.doc_id, unnest(range(o.pos,
        |           o.pos + least(8, ln.n_tokens))) AS tp
        |         FROM occ o JOIN ln ON o.doc_id = ln.doc_id),
        |cover AS (SELECT DISTINCT doc_id, tp FROM cov0),
        |masked AS (SELECT doc_id, count(*) AS n_masked
        |           FROM cover GROUP BY 1)
        |SELECT m.doc_id AS doc_id, ln.n_tokens, m.n_masked,
        |  ln.n_tokens - m.n_masked AS n_kept
        |FROM masked m JOIN ln ON m.doc_id = ln.doc_id
        |ORDER BY m.doc_id ASC""".stripMargin,
    // exact duplicated 8-token spans across documents: span strings here
    // vs 64-bit kernel hashes in Spark (the decontaminate convention —
    // identical sets up to negligible collisions); position counts are
    // NON-distinct, the clamped slice mirrors the kernel's one-window
    // case for docs shorter than 8 tokens
    "dedup_span" ->
      raw"""WITH d AS (SELECT doc_id, string_split($normT, ' ') AS toks
        |           FROM documents
        |           WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |sp AS (SELECT doc_id, unnest(list_transform(
        |         range(0, greatest(len(toks) - 8, 0) + 1),
        |         i -> array_to_string(toks[i+1:i+8], ' '))) AS h FROM d),
        |dup AS (SELECT h FROM sp GROUP BY h
        |        HAVING count(DISTINCT doc_id) >= 2)
        |SELECT doc_id, count(*) AS dup_positions,
        |  count(DISTINCT h) AS dup_spans
        |FROM sp JOIN dup USING (h)
        |GROUP BY doc_id ORDER BY doc_id ASC""".stripMargin,
    // containment reuses the pair CTEs up through inter/sizes (the
    // unused `p` CTE is legal); contained side = smaller shingle set,
    // a-side on ties — same rule as the Spark query
    "dedup_containment" ->
      raw"""WITH $ngramPairCtes,
        |c AS (SELECT i.source,
        |    CASE WHEN sa.n_sh <= sb.n_sh THEN i.a_id ELSE i.b_id END
        |      AS contained_id,
        |    CASE WHEN sa.n_sh <= sb.n_sh THEN i.b_id ELSE i.a_id END
        |      AS container_id,
        |    round(i.n_inter::DOUBLE / least(sa.n_sh, sb.n_sh)::DOUBLE, 4)
        |      AS containment
        |  FROM inter i
        |  JOIN sizes sa ON i.source = sa.source AND i.a_id = sa.doc_id
        |  JOIN sizes sb ON i.source = sb.source AND i.b_id = sb.doc_id)
        |SELECT * FROM c WHERE containment >= 0.2
        |ORDER BY source ASC, contained_id ASC, container_id ASC""".stripMargin,
    // connected components over the >=0.2 similarity pairs via a
    // recursive transitive closure; min reachable id = cluster label
    "dedup_cluster" ->
      raw"""WITH RECURSIVE $clusterLblCtes
        |SELECT d.doc_id,
        |  coalesce(l.cluster, d.doc_id) AS cluster_id,
        |  (CASE WHEN coalesce(l.cluster, d.doc_id) = d.doc_id
        |        THEN 1 ELSE 0 END)::INT AS is_survivor
        |FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id
        |ORDER BY d.doc_id ASC""".stripMargin,
    // histogram over the same transitive-closure labels: how many
    // clusters of each size (the report a dedup run publishes)
    "dedup_cluster_stats" ->
      raw"""WITH RECURSIVE $clusterLblCtes,
        |assigned AS (SELECT d.doc_id,
        |    coalesce(l.cluster, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id),
        |csizes AS (SELECT cluster_id, count(*) AS cluster_size
        |           FROM assigned GROUP BY cluster_id)
        |SELECT cluster_size, count(*) AS n_clusters
        |FROM csizes GROUP BY cluster_size
        |ORDER BY cluster_size ASC""".stripMargin,
    // oracle is the EXACT all-pairs form — the declared query's banded
    // LSH + exact verify equals it at the declared recall-first banding
    // (subset by construction; misses ≈ 5e-8/pair at the threshold)
    "dedup_embedding" ->
      """WITH p AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    round(
        |      list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        |      / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
        |       * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))),
        |      4) AS cos_sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT a_id, b_id, cos_sim FROM p WHERE cos_sim >= 0.95
        |ORDER BY a_id ASC, b_id ASC""".stripMargin,
    // SemDeDup: the ivfpq oracle's stride-codebook + argmax-assignment
    // CTEs feeding dedup_embedding's exact-cosine pair predicate,
    // restricted to same-cell pairs; keep-lowest-id survivors
    "dedup_semantic" ->
      """WITH cbc AS (SELECT vec_id AS cent_id, embedding AS c_v,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS cnrm
        |  FROM embeddings WHERE vec_id % 127 = 0),
        |asg AS (SELECT c_id, cent_id FROM (
        |  SELECT e.vec_id AS c_id, cbc.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> e.embedding[i]::DOUBLE
        |           * (cbc.c_v[i]::DOUBLE / cbc.cnrm))) DESC,
        |      cbc.cent_id ASC) AS rn
        |  FROM embeddings e CROSS JOIN cbc) WHERE rn = 1),
        |dropped AS (SELECT DISTINCT bb.c_id AS b_id
        |  FROM asg aa JOIN asg bb
        |    ON aa.cent_id = bb.cent_id AND aa.c_id < bb.c_id
        |  JOIN embeddings a ON a.vec_id = aa.c_id
        |  JOIN embeddings b ON b.vec_id = bb.c_id
        |  WHERE round(
        |      list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        |      / (sqrt(list_sum(list_transform(a.embedding,
        |           x -> x::DOUBLE * x::DOUBLE)))
        |       * sqrt(list_sum(list_transform(b.embedding,
        |           x -> x::DOUBLE * x::DOUBLE)))), 4) >= 0.40)
        |SELECT asg.c_id AS vec_id, asg.cent_id
        |FROM asg LEFT JOIN dropped ON asg.c_id = dropped.b_id
        |WHERE dropped.b_id IS NULL
        |ORDER BY vec_id ASC""".stripMargin,
    // incremental SemDeDup: store-side codebook (vec_id%10<8 AND the
    // stride), assignment over everyone, drop rule = same cell AND
    // (o in store OR earlier delta) AND 4dp cosine >= 0.40
    "dedup_semantic_incremental" -> semanticIncrementalSql,
    // chunk-granular SemDeDup: the doc_chunking CTEs -> the stub
    // chunk embedding (md5 4-hex slices, signed, exactly replicated)
    // -> dedup_semantic's cell/pair/survivor chain on chunk keys
    "dedup_semantic_chunk" ->
      raw"""WITH d AS (SELECT doc_id, string_split($normT, ' ') AS toks,
        |    len(string_split($normT, ' ')) AS n_tok FROM documents),
        |c AS (SELECT doc_id, toks, n_tok,
        |    unnest(range(0,
        |      CAST(ceil(greatest(n_tok - 64, 0) / 48.0) AS BIGINT) + 1))
        |      AS chunk_id
        |  FROM d),
        |ch AS (SELECT doc_id, chunk_id, array_to_string(
        |    toks[chunk_id*48+1 : least(chunk_id*48+64, n_tok)], ' ') AS t
        |  FROM c),
        |emb AS MATERIALIZED (SELECT doc_id*1000 + chunk_id AS vec_id,
        |    list_transform(range(0, 8), i ->
        |      CAST(('0x' || substr(md5(t), CAST(i*4+1 AS INT), 4))::BIGINT
        |        % 2001 - 1000 AS DOUBLE)) AS v
        |  FROM ch),
        |cbc AS (SELECT vec_id AS cent_id, v AS c_v,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS cnrm
        |  FROM emb WHERE vec_id % 127 = 0),
        |asg AS MATERIALIZED (SELECT c_id, cent_id FROM (
        |  SELECT e.vec_id AS c_id, cbc.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_sum(list_transform(range(1, 9),
        |        i -> e.v[i] * (cbc.c_v[i] / cbc.cnrm))) DESC,
        |      cbc.cent_id ASC) AS rn
        |  FROM emb e CROSS JOIN cbc) WHERE rn = 1),
        |dropped AS (SELECT DISTINCT bb.c_id AS b_id
        |  FROM asg aa JOIN asg bb
        |    ON aa.cent_id = bb.cent_id AND aa.c_id < bb.c_id
        |  JOIN emb a ON a.vec_id = aa.c_id
        |  JOIN emb b ON b.vec_id = bb.c_id
        |  WHERE round(
        |      list_sum(list_transform(range(1, 9), i -> a.v[i] * b.v[i]))
        |      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
        |       * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4)
        |      >= 0.99)
        |SELECT asg.c_id // 1000 AS doc_id,
        |  (asg.c_id % 1000)::INT AS chunk_id, asg.cent_id
        |FROM asg LEFT JOIN dropped ON asg.c_id = dropped.b_id
        |WHERE dropped.b_id IS NULL
        |ORDER BY doc_id ASC, chunk_id ASC""".stripMargin,
    // the streaming twin is gated on the SAME SQL (the
    // stream_dedup_minhash_ok shared-oracle precedent): cell-state loss
    // across micro-batches, vec_id order drift, or in-processor cosine
    // drift all hash-mismatch
    "stream_dedup_semantic_ok" -> semanticIncrementalSql,
    "simsearch_knn" -> knnOracleSql,
    // radius search: the knn product with the rank window replaced by
    // the row-local cos_sim >= 0.30 filter
    "simsearch_range" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings),
        |p AS (SELECT q_id, c_id,
        |  round(
        |    list_sum(list_transform(range(1, len(q_emb) + 1),
        |      i -> q_emb[i]::DOUBLE * c_emb[i]::DOUBLE))
        |    / (sqrt(list_sum(list_transform(q_emb, x -> x::DOUBLE * x::DOUBLE)))
        |     * sqrt(list_sum(list_transform(c_emb, x -> x::DOUBLE * x::DOUBLE)))),
        |    4) AS cos_sim
        |  FROM c CROSS JOIN q WHERE q_id <> c_id)
        |SELECT q_id, c_id, cos_sim FROM p WHERE cos_sim >= 0.30
        |ORDER BY q_id ASC, c_id ASC""".stripMargin,
    // IVF radius search: simsearch_ivf's probe CTEs, radius filter
    // instead of top-k
    "simsearch_range_ivf" -> rangeIvfOracleSql,
    // pre-filter exact: knn's CTEs with the label predicate as the join
    // condition — the top-k ranks only label-matching candidates
    "simsearch_filtered" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb,
        |           label AS q_label FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS c_id, embedding AS c_emb,
        |      label AS c_label FROM embeddings),
        |p AS (SELECT q_id, c_id,
        |  round(
        |    list_sum(list_transform(range(1, len(q_emb) + 1),
        |      i -> q_emb[i]::DOUBLE * c_emb[i]::DOUBLE))
        |    / (sqrt(list_sum(list_transform(q_emb, x -> x::DOUBLE * x::DOUBLE)))
        |     * sqrt(list_sum(list_transform(c_emb, x -> x::DOUBLE * x::DOUBLE)))),
        |    4) AS cos_sim
        |  FROM c JOIN q ON c_label = q_label AND q_id <> c_id)
        |SELECT q_id, c_id, cos_sim, rn::INT AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY cos_sim DESC, c_id ASC) AS rn FROM p
        |) WHERE rn <= 5 ORDER BY q_id ASC, rn ASC""".stripMargin,
    // filtered IVF: simsearch_ivf's asg/qc CTEs carrying label; the
    // candidate join adds the label-match predicate (IDSelector point)
    "simsearch_filtered_ivf" ->
      """WITH cb AS (SELECT vec_id AS cent_id, embedding AS c_v,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS cnrm
        |  FROM embeddings WHERE vec_id % 127 = 0),
        |asg AS (SELECT c_id, c_emb, c_nrm, c_label, cent_id FROM (
        |  SELECT e.vec_id AS c_id, e.embedding AS c_emb,
        |    sqrt(list_sum(list_transform(e.embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS c_nrm,
        |    e.label AS c_label, cb.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> e.embedding[i]::DOUBLE * (cb.c_v[i]::DOUBLE / cb.cnrm))) DESC,
        |      cb.cent_id ASC) AS rn
        |  FROM embeddings e CROSS JOIN cb) WHERE rn = 1),
        |qc AS (SELECT q_id, q_emb, q_nrm, q_label, cent_id FROM (
        |  SELECT e.vec_id AS q_id, e.embedding AS q_emb,
        |    sqrt(list_sum(list_transform(e.embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS q_nrm,
        |    e.label AS q_label, cb.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> e.embedding[i]::DOUBLE * cb.c_v[i]::DOUBLE))
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |           x -> x::DOUBLE * x::DOUBLE))) * cb.cnrm) DESC,
        |      cb.cent_id ASC) AS rn
        |  FROM embeddings e CROSS JOIN cb WHERE e.vec_id < 10) WHERE rn <= 2),
        |p3 AS (SELECT q.q_id, a.c_id,
        |  round(list_sum(list_transform(range(1, len(q.q_emb) + 1),
        |      i -> q.q_emb[i]::DOUBLE * a.c_emb[i]::DOUBLE))
        |    / (q.q_nrm * a.c_nrm), 4) AS cos_sim
        |  FROM qc q JOIN asg a
        |    ON q.cent_id = a.cent_id AND q.q_label = a.c_label
        |  WHERE q.q_id <> a.c_id)
        |SELECT q_id, c_id, cos_sim, rn::INT AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY cos_sim DESC, c_id ASC) AS rn FROM p3
        |) WHERE rn <= 5 ORDER BY q_id ASC, rn ASC""".stripMargin,
    // the LSH hyperplanes are replicated bit-exactly in SQL
    // (lshWeightCtes), so the bucketed search is a full hash-match
    // rather than spec-only: bucket → same-bucket candidates → top-5
    "simsearch_lsh" -> lshOracleSql,
    // stride codebook + argmax cell assignment + nProbe=2 probing,
    // replicated: corpus assignment ranks dot(x, ĉ) with ties to the
    // smaller cent_id (the kernel's strict-> scan order), query side
    // ranks cosine like the struct sort
    "simsearch_ivf" -> ivfOracleSql,
    // learned-codebook IVF: the full 5-iteration integer Lloyd
    // recomputed in unrolled CTEs (lloydCtes), then assignment/probing
    // by the same exact integer-L2 score and the family's 4dp cosine
    "simsearch_ivf_kmeans" ->
      raw"""WITH ${lloydCtes(kCents = 8, nIter = 5, sampleStride = 5)},
        |xl AS MATERIALIZED (SELECT e.vec_id, d.i,
        |    floor(e.embedding[d.i]::DOUBLE * 1000000 + 0.5)::BIGINT AS v
        |  FROM embeddings e CROSS JOIN dims d),
        |cnrm AS (SELECT cent, sum(v * v) AS nsq FROM c5 GROUP BY 1),
        |casg AS MATERIALIZED (SELECT vec_id AS c_id, cent AS cent_id FROM (
        |  SELECT d.vec_id, d.cent, row_number() OVER (PARTITION BY d.vec_id
        |    ORDER BY d.dot2 - n.nsq DESC, d.cent ASC) AS rn
        |  FROM (SELECT x.vec_id, c.cent, 2 * sum(x.v * c.v) AS dot2
        |        FROM xl x JOIN c5 c USING (i) GROUP BY 1, 2) d
        |  JOIN cnrm n USING (cent)) WHERE rn = 1),
        |qcell AS (SELECT vec_id AS q_id, cent AS cent_id FROM (
        |  SELECT d.vec_id, d.cent, row_number() OVER (PARTITION BY d.vec_id
        |    ORDER BY d.dot2 - n.nsq DESC, d.cent ASC) AS rn
        |  FROM (SELECT x.vec_id, c.cent, 2 * sum(x.v * c.v) AS dot2
        |        FROM xl x JOIN c5 c USING (i) WHERE x.vec_id < 10
        |        GROUP BY 1, 2) d
        |  JOIN cnrm n USING (cent)) WHERE rn <= 2),
        |p3 AS (SELECT q.q_id, a.c_id,
        |  round(
        |    list_sum(list_transform(range(1, len(eq.embedding) + 1),
        |      i -> eq.embedding[i]::DOUBLE * ec.embedding[i]::DOUBLE))
        |    / (sqrt(list_sum(list_transform(eq.embedding,
        |         x -> x::DOUBLE * x::DOUBLE)))
        |     * sqrt(list_sum(list_transform(ec.embedding,
        |         x -> x::DOUBLE * x::DOUBLE)))), 4) AS cos_sim
        |  FROM qcell q JOIN casg a USING (cent_id)
        |  JOIN embeddings eq ON eq.vec_id = q.q_id
        |  JOIN embeddings ec ON ec.vec_id = a.c_id
        |  WHERE q.q_id <> a.c_id)
        |SELECT q_id, c_id, cos_sim, rn::INT AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY cos_sim DESC, c_id ASC) AS rn FROM p3
        |) WHERE rn <= 5 ORDER BY q_id ASC, rn ASC""".stripMargin,
    // IVFPQ: the coarse-cell prune (simsearch_ivf's asg/qc CTEs) feeding
    // the PQ lookup scoring (simsearch_pq's codes/lut CTEs on a finer
    // stride-61 codebook) — candidates only, never the corpus
    "simsearch_ivfpq" -> ivfPqOracleSql,
    // the persisted-index round trip serves the SAME values (same
    // codebooks, deterministic encode, lossless BIGINT artifact) — the
    // shared-oracle precedent: a lossy round trip, a drifted code, or
    // a serve path that re-encodes differently all hash-mismatch
    "simsearch_index_persisted" -> ivfPqOracleSql,
    // the incremental index serves the same template under YESTERDAY's
    // codebooks (store-side samples): store-encode ∪ delta-encode must
    // equal the full encode the oracle recomputes — a delta encoded
    // against drifted codebooks, or a store rewrite, hash-mismatches
    "simsearch_index_incremental" ->
      ivfPqOracle("vec_id % 10 < 8 AND "),
    // the streaming ingest twin appends the SAME rows the batch
    // incremental appends (encode is deterministic and row-local) —
    // the shared-oracle precedent, verbatim
    "stream_index_append_ok" ->
      ivfPqOracle("vec_id % 10 < 8 AND "),
    // delete lifecycle: the SAME template with the tombstoned family
    // excluded from the CANDIDATE side only (queries are serve-time
    // input, not index rows) — a serve path that ignores the mask, or
    // one that masks queries too, hash-mismatches
    "simsearch_index_delete" ->
      ivfPqOracle("", " AND a.c_id % 13 <> 0"),
    // compaction must serve exactly what the masked path served: the
    // delete oracle VERBATIM (the shared-oracle precedent)
    "simsearch_index_compact" ->
      ivfPqOracle("", " AND a.c_id % 13 <> 0"),
    // rebuild trigger: one assignment pass under the STORE-pinned
    // codebook; build histogram = the store-flagged subset; exact
    // integer cross-multiplied KS (cent_id-order cumulative) and
    // total-variation statistics, 6dp ratios, tv-thresholded decision
    "simsearch_index_health" ->
      """WITH cbc AS (SELECT vec_id AS cent_id, embedding AS c_v,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS cnrm
        |  FROM embeddings WHERE vec_id % 10 < 8 AND vec_id % 127 = 0),
        |asg AS (SELECT c_id, cent_id FROM (
        |  SELECT e.vec_id AS c_id, cbc.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> e.embedding[i]::DOUBLE
        |           * (cbc.c_v[i]::DOUBLE / cbc.cnrm))) DESC,
        |      cbc.cent_id ASC) AS rn
        |  FROM embeddings e CROSS JOIN cbc) WHERE rn = 1),
        |counts AS (SELECT cent_id,
        |    sum(CASE WHEN c_id % 10 < 8 THEN 1 ELSE 0 END)::BIGINT AS ca,
        |    count(*)::BIGINT AS cb
        |  FROM asg GROUP BY 1),
        |tot AS (SELECT sum(ca)::BIGINT AS ta, sum(cb)::BIGINT AS tb
        |  FROM counts),
        |d AS (SELECT c.ca, c.cb, t.ta, t.tb,
        |    sum(c.ca) OVER (ORDER BY c.cent_id) AS cuma,
        |    sum(c.cb) OVER (ORDER BY c.cent_id) AS cumb
        |  FROM counts c CROSS JOIN tot t)
        |SELECT count(*)::BIGINT AS n_cells,
        |  max(ta) AS n_build, max(tb) AS n_now,
        |  round(max(abs(cuma * tb - cumb * ta))::DOUBLE
        |    / (max(ta)::DOUBLE * max(tb)::DOUBLE), 6) AS ks,
        |  round(sum(abs(ca * tb - cb * ta))::DOUBLE
        |    / (2.0 * max(ta)::DOUBLE * max(tb)::DOUBLE), 6) AS tv,
        |  round(sum(abs(ca * tb - cb * ta))::DOUBLE
        |    / (2.0 * max(ta)::DOUBLE * max(tb)::DOUBLE), 6) >= 0.05
        |    AS rebuild
        |FROM d""".stripMargin,
    // the acted-on verdict: the drifted corpus is embeddings ∪ their
    // component-wise |x| copies at vec_id+1e8 (abs is float-exact, so
    // every dot/cosine replays bit-for-bit; the folded half piles into
    // the old codebook's positive-leaning cells — concentrated drift);
    // health = the index_health CTEs over the old-codebook assignment;
    // both serves are the simsearch_ivf template under their codebook;
    // the judge is ann_recall's hit count per query with the mean as
    // ONE division of the integer sum(hits), plus the exact-integer
    // balance report (n_cells, hot-cell population) per index
    "simsearch_index_rebuild" ->
      """WITH now AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000000 AS vec_id,
        |    list_transform(embedding, x -> abs(x)) AS embedding
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS q_nrm
        |  FROM now WHERE vec_id < 10
        |    OR (vec_id >= 100000000 AND vec_id < 100000010)),
        |c AS (SELECT vec_id AS c_id, embedding AS c_emb,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS c_nrm
        |  FROM now),
        |ex AS (SELECT q_id, c_id FROM (
        |  SELECT q.q_id, c.c_id, row_number() OVER (PARTITION BY q.q_id
        |    ORDER BY round(list_sum(list_transform(
        |        range(1, len(q.q_emb) + 1),
        |        i -> q.q_emb[i]::DOUBLE * c.c_emb[i]::DOUBLE))
        |      / (q.q_nrm * c.c_nrm), 4) DESC, c.c_id ASC) AS rn
        |  FROM c CROSS JOIN q WHERE q.q_id <> c.c_id) WHERE rn <= 5),
        |cbo AS (SELECT vec_id AS cent_id, embedding AS c_v,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS cnrm
        |  FROM embeddings WHERE vec_id % 127 = 0),
        |cbn AS (SELECT vec_id AS cent_id, embedding AS c_v,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS cnrm
        |  FROM now WHERE vec_id % 127 = 0),
        |asgo AS (SELECT c_id, cent_id FROM (
        |  SELECT c.c_id, cbo.cent_id, row_number() OVER (
        |      PARTITION BY c.c_id ORDER BY
        |      list_sum(list_transform(range(1, len(c.c_emb) + 1),
        |        i -> c.c_emb[i]::DOUBLE
        |           * (cbo.c_v[i]::DOUBLE / cbo.cnrm))) DESC,
        |      cbo.cent_id ASC) AS rn
        |  FROM c CROSS JOIN cbo) WHERE rn = 1),
        |asgn AS (SELECT c_id, cent_id FROM (
        |  SELECT c.c_id, cbn.cent_id, row_number() OVER (
        |      PARTITION BY c.c_id ORDER BY
        |      list_sum(list_transform(range(1, len(c.c_emb) + 1),
        |        i -> c.c_emb[i]::DOUBLE
        |           * (cbn.c_v[i]::DOUBLE / cbn.cnrm))) DESC,
        |      cbn.cent_id ASC) AS rn
        |  FROM c CROSS JOIN cbn) WHERE rn = 1),
        |qco AS (SELECT q_id, cent_id FROM (
        |  SELECT q.q_id, cbo.cent_id, row_number() OVER (
        |      PARTITION BY q.q_id ORDER BY
        |      list_sum(list_transform(range(1, len(q.q_emb) + 1),
        |        i -> q.q_emb[i]::DOUBLE * cbo.c_v[i]::DOUBLE))
        |      / (q.q_nrm * cbo.cnrm) DESC,
        |      cbo.cent_id ASC) AS rn
        |  FROM q CROSS JOIN cbo) WHERE rn <= 2),
        |qcn AS (SELECT q_id, cent_id FROM (
        |  SELECT q.q_id, cbn.cent_id, row_number() OVER (
        |      PARTITION BY q.q_id ORDER BY
        |      list_sum(list_transform(range(1, len(q.q_emb) + 1),
        |        i -> q.q_emb[i]::DOUBLE * cbn.c_v[i]::DOUBLE))
        |      / (q.q_nrm * cbn.cnrm) DESC,
        |      cbn.cent_id ASC) AS rn
        |  FROM q CROSS JOIN cbn) WHERE rn <= 2),
        |srvo AS (SELECT q_id, c_id FROM (
        |  SELECT qc.q_id, a.c_id, row_number() OVER (
        |      PARTITION BY qc.q_id ORDER BY
        |      round(list_sum(list_transform(range(1, len(q.q_emb) + 1),
        |        i -> q.q_emb[i]::DOUBLE * c.c_emb[i]::DOUBLE))
        |      / (q.q_nrm * c.c_nrm), 4) DESC, a.c_id ASC) AS rn
        |  FROM qco qc JOIN asgo a USING (cent_id)
        |  JOIN q ON q.q_id = qc.q_id
        |  JOIN c ON c.c_id = a.c_id
        |  WHERE qc.q_id <> a.c_id) WHERE rn <= 5),
        |srvn AS (SELECT q_id, c_id FROM (
        |  SELECT qc.q_id, a.c_id, row_number() OVER (
        |      PARTITION BY qc.q_id ORDER BY
        |      round(list_sum(list_transform(range(1, len(q.q_emb) + 1),
        |        i -> q.q_emb[i]::DOUBLE * c.c_emb[i]::DOUBLE))
        |      / (q.q_nrm * c.c_nrm), 4) DESC, a.c_id ASC) AS rn
        |  FROM qcn qc JOIN asgn a USING (cent_id)
        |  JOIN q ON q.q_id = qc.q_id
        |  JOIN c ON c.c_id = a.c_id
        |  WHERE qc.q_id <> a.c_id) WHERE rn <= 5),
        |tags AS (SELECT 'old' AS idx UNION ALL SELECT 'rebuilt'),
        |srv AS (SELECT 'old' AS idx, q_id, c_id FROM srvo
        |        UNION ALL SELECT 'rebuilt', q_id, c_id FROM srvn),
        |base AS (SELECT t.idx, ex.q_id, ex.c_id FROM tags t CROSS JOIN ex),
        |hit AS (SELECT b.idx, b.q_id, count(s.c_id)::BIGINT AS hits,
        |    count(*)::BIGINT AS exact_n
        |  FROM base b LEFT JOIN srv s
        |    ON s.idx = b.idx AND s.q_id = b.q_id AND s.c_id = b.c_id
        |  GROUP BY 1, 2),
        |counts AS (SELECT cent_id,
        |    sum(CASE WHEN c_id < 100000000 THEN 1 ELSE 0 END)::BIGINT
        |      AS ca,
        |    count(*)::BIGINT AS cb
        |  FROM asgo GROUP BY 1),
        |tot AS (SELECT sum(ca)::BIGINT AS ta, sum(cb)::BIGINT AS tb
        |  FROM counts),
        |health AS (SELECT
        |    round(sum(abs(ca * tb - cb * ta))::DOUBLE
        |      / (2.0 * max(ta)::DOUBLE * max(tb)::DOUBLE), 6) AS tv,
        |    round(sum(abs(ca * tb - cb * ta))::DOUBLE
        |      / (2.0 * max(ta)::DOUBLE * max(tb)::DOUBLE), 6) >= 0.05
        |      AS rebuild
        |  FROM counts CROSS JOIN tot),
        |meta AS (
        |  SELECT 'old' AS idx,
        |    (SELECT count(*) FROM cbo)::BIGINT AS n_cells,
        |    (SELECT max(cnt) FROM (SELECT count(*)::BIGINT AS cnt
        |      FROM asgo GROUP BY cent_id))::BIGINT AS max_cell
        |  UNION ALL
        |  SELECT 'rebuilt',
        |    (SELECT count(*) FROM cbn)::BIGINT,
        |    (SELECT max(cnt) FROM (SELECT count(*)::BIGINT AS cnt
        |      FROM asgn GROUP BY cent_id))::BIGINT)
        |SELECT h.idx, h.q_id, h.hits,
        |  round(h.hits::DOUBLE / h.exact_n, 4) AS recall,
        |  m.n_cells, m.max_cell,
        |  round(sum(h.hits) OVER (PARTITION BY h.idx)::DOUBLE / 100.0,
        |    4) AS mean_recall,
        |  hl.tv, hl.rebuild
        |FROM hit h JOIN meta m ON m.idx = h.idx CROSS JOIN health hl
        |ORDER BY h.idx ASC, h.q_id ASC""".stripMargin,
    // the tuned sweep: rebuild's now/q/c/ex/cb/asg CTEs; candidates per
    // probe setting come from ONE cell join × a generate_series levels
    // table (p admits a candidate iff p ≥ its cell's probe rank);
    // hits/candidates are exact integers, chosen = min rebuilt p with
    // hits ≥ old's (fallback 6), mean_recall = one division of the
    // integer sum
    "simsearch_graph" -> simsearchGraphOracleSql,
    "simsearch_graph_incremental" -> simsearchGraphIncrOracleSql,
    "simsearch_graph_delete" -> simsearchGraphDelOracleSql,
    "simsearch_graph_filtered" -> simsearchGraphFiltOracleSql,
    "simsearch_graph_persisted" -> simsearchGraphStoreOracleSql,
    "simsearch_index_rebuild_tuned" -> {
      def cellsFor(cb: String, maxP: Int, tag: String) =
        s"""qc$tag AS (SELECT q_id, cent_id, cell_rn FROM (
           |  SELECT q.q_id, $cb.cent_id, row_number() OVER (
           |      PARTITION BY q.q_id ORDER BY
           |      list_sum(list_transform(range(1, len(q.q_emb) + 1),
           |        i -> q.q_emb[i]::DOUBLE * $cb.c_v[i]::DOUBLE))
           |      / (q.q_nrm * $cb.cnrm) DESC,
           |      $cb.cent_id ASC) AS cell_rn
           |  FROM q CROSS JOIN $cb) WHERE cell_rn <= $maxP),
           |cand$tag AS (SELECT lv.p, qc.q_id, a.c_id
           |  FROM qc$tag qc JOIN asg$tag a USING (cent_id)
           |  JOIN lv ON lv.p >= qc.cell_rn AND lv.p <= $maxP
           |  WHERE qc.q_id <> a.c_id),
           |scan$tag AS (SELECT p, count(*)::BIGINT AS candidates_scanned
           |  FROM cand$tag GROUP BY 1),
           |srv$tag AS (SELECT p, q_id, c_id FROM (
           |  SELECT cd.p, cd.q_id, cd.c_id, row_number() OVER (
           |      PARTITION BY cd.p, cd.q_id ORDER BY
           |      round(list_sum(list_transform(range(1, len(q.q_emb) + 1),
           |        i -> q.q_emb[i]::DOUBLE * c.c_emb[i]::DOUBLE))
           |      / (q.q_nrm * c.c_nrm), 4) DESC, cd.c_id ASC) AS rn
           |  FROM cand$tag cd JOIN q ON q.q_id = cd.q_id
           |  JOIN c ON c.c_id = cd.c_id) WHERE rn <= 5),
           |hit$tag AS (SELECT s.p, count(*)::BIGINT AS sum_hits
           |  FROM srv$tag s JOIN ex
           |    ON ex.q_id = s.q_id AND ex.c_id = s.c_id
           |  GROUP BY 1)""".stripMargin
      s"""WITH now AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000000 AS vec_id,
         |    list_transform(embedding, x -> abs(x)) AS embedding
         |  FROM embeddings),
         |lv AS (SELECT unnest(generate_series(1, 6)) AS p),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> x::DOUBLE * x::DOUBLE))) AS q_nrm
         |  FROM now WHERE vec_id < 10
         |    OR (vec_id >= 100000000 AND vec_id < 100000010)),
         |c AS (SELECT vec_id AS c_id, embedding AS c_emb,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> x::DOUBLE * x::DOUBLE))) AS c_nrm
         |  FROM now),
         |ex AS (SELECT q_id, c_id FROM (
         |  SELECT q.q_id, c.c_id, row_number() OVER (PARTITION BY q.q_id
         |    ORDER BY round(list_sum(list_transform(
         |        range(1, len(q.q_emb) + 1),
         |        i -> q.q_emb[i]::DOUBLE * c.c_emb[i]::DOUBLE))
         |      / (q.q_nrm * c.c_nrm), 4) DESC, c.c_id ASC) AS rn
         |  FROM c CROSS JOIN q WHERE q.q_id <> c.c_id) WHERE rn <= 5),
         |cbo AS (SELECT vec_id AS cent_id, embedding AS c_v,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> x::DOUBLE * x::DOUBLE))) AS cnrm
         |  FROM embeddings WHERE vec_id % 127 = 0),
         |cbn AS (SELECT vec_id AS cent_id, embedding AS c_v,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> x::DOUBLE * x::DOUBLE))) AS cnrm
         |  FROM now WHERE vec_id % 127 = 0),
         |asgo AS (SELECT c_id, cent_id FROM (
         |  SELECT c.c_id, cbo.cent_id, row_number() OVER (
         |      PARTITION BY c.c_id ORDER BY
         |      list_sum(list_transform(range(1, len(c.c_emb) + 1),
         |        i -> c.c_emb[i]::DOUBLE
         |           * (cbo.c_v[i]::DOUBLE / cbo.cnrm))) DESC,
         |      cbo.cent_id ASC) AS rn
         |  FROM c CROSS JOIN cbo) WHERE rn = 1),
         |asgn AS (SELECT c_id, cent_id FROM (
         |  SELECT c.c_id, cbn.cent_id, row_number() OVER (
         |      PARTITION BY c.c_id ORDER BY
         |      list_sum(list_transform(range(1, len(c.c_emb) + 1),
         |        i -> c.c_emb[i]::DOUBLE
         |           * (cbn.c_v[i]::DOUBLE / cbn.cnrm))) DESC,
         |      cbn.cent_id ASC) AS rn
         |  FROM c CROSS JOIN cbn) WHERE rn = 1),
         |${cellsFor("cbo", 2, "o")},
         |${cellsFor("cbn", 6, "n")},
         |rows_o AS (SELECT 'old' AS idx, s.p AS n_probe,
         |    coalesce(h.sum_hits, 0) AS sum_hits, s.candidates_scanned
         |  FROM scano s LEFT JOIN hito h USING (p) WHERE s.p = 2),
         |rows_n AS (SELECT 'rebuilt' AS idx, s.p AS n_probe,
         |    coalesce(h.sum_hits, 0) AS sum_hits, s.candidates_scanned
         |  FROM scann s LEFT JOIN hitn h USING (p)),
         |pick AS (SELECT coalesce(
         |    (SELECT min(n_probe) FROM rows_n
         |     WHERE sum_hits >= (SELECT sum_hits FROM rows_o)), 6)
         |  AS chosen_probe)
         |SELECT r.idx, CAST(r.n_probe AS INTEGER) AS n_probe,
         |  r.sum_hits,
         |  round(r.sum_hits::DOUBLE / 100.0, 4) AS mean_recall,
         |  r.candidates_scanned,
         |  r.idx = 'rebuilt' AND r.n_probe = pk.chosen_probe AS chosen
         |FROM (SELECT * FROM rows_o UNION ALL SELECT * FROM rows_n) r
         |CROSS JOIN pick pk
         |ORDER BY idx ASC, n_probe ASC""".stripMargin
    },
    // residual IVFPQ: same asg/qc as simsearch_ivfpq; the PQ codebook
    // becomes each pq sample's residual against ITS OWN coarse cell
    // (rcb), corpus codes argmax over (x − coarse(cell))·rv − ‖rv‖²/2,
    // and the score adds the per-(query, cell) coarse dot to the m
    // residual lookups — every double op mirrored from the kernel
    "simsearch_ivfpq_residual" ->
      """WITH cbc AS (SELECT vec_id AS cent_id, embedding AS c_v,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS cnrm
        |  FROM embeddings WHERE vec_id % 127 = 0),
        |asg AS (SELECT c_id, cent_id FROM (
        |  SELECT e.vec_id AS c_id, cbc.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> e.embedding[i]::DOUBLE
        |           * (cbc.c_v[i]::DOUBLE / cbc.cnrm))) DESC,
        |      cbc.cent_id ASC) AS rn
        |  FROM embeddings e CROSS JOIN cbc) WHERE rn = 1),
        |qc AS (SELECT q_id, cent_id FROM (
        |  SELECT e.vec_id AS q_id, cbc.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> e.embedding[i]::DOUBLE * cbc.c_v[i]::DOUBLE))
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |           x -> x::DOUBLE * x::DOUBLE))) * cbc.cnrm) DESC,
        |      cbc.cent_id ASC) AS rn
        |  FROM embeddings e CROSS JOIN cbc WHERE e.vec_id < 10)
        |  WHERE rn <= 2),
        |pqs AS (SELECT vec_id AS code, embedding AS pv
        |  FROM embeddings WHERE vec_id % 61 = 0
        |  ORDER BY vec_id LIMIT 256),
        |rcb AS (SELECT pqs.code,
        |    list_transform(range(1, len(pqs.pv) + 1),
        |      i -> pqs.pv[i]::DOUBLE - cbc.c_v[i]::DOUBLE) AS rv
        |  FROM pqs JOIN asg ON asg.c_id = pqs.code
        |  JOIN cbc ON cbc.cent_id = asg.cent_id),
        |ss AS (SELECT unnest(range(0, 4)) AS s),
        |codes AS (SELECT c_id, s, code FROM (
        |  SELECT e.vec_id AS c_id, r.s, rcb.code,
        |    row_number() OVER (PARTITION BY e.vec_id, r.s ORDER BY
        |      (list_sum(list_transform(range(1, 17),
        |         i -> (e.embedding[r.s * 16 + i]::DOUBLE
        |               - cc.c_v[r.s * 16 + i]::DOUBLE)
        |            * rcb.rv[r.s * 16 + i]))
        |       - list_sum(list_transform(range(1, 17),
        |         i -> rcb.rv[r.s * 16 + i]
        |            * rcb.rv[r.s * 16 + i])) / 2) DESC,
        |      rcb.code ASC) AS rn
        |  FROM embeddings e JOIN asg a ON a.c_id = e.vec_id
        |  JOIN cbc cc ON cc.cent_id = a.cent_id
        |  CROSS JOIN ss r CROSS JOIN rcb) WHERE rn = 1),
        |lut AS (SELECT q.vec_id AS q_id, r.s, rcb.code,
        |    round(list_sum(list_transform(range(1, 17),
        |      i -> q.embedding[r.s * 16 + i]::DOUBLE
        |         * rcb.rv[r.s * 16 + i])) * 1000000.0, 0)::BIGINT
        |      AS pdot_u
        |  FROM embeddings q CROSS JOIN ss r CROSS JOIN rcb
        |  WHERE q.vec_id < 10),
        |cd AS (SELECT q.vec_id AS q_id, cbc.cent_id,
        |    round(list_sum(list_transform(range(1, len(q.embedding) + 1),
        |      i -> q.embedding[i]::DOUBLE * cbc.c_v[i]::DOUBLE))
        |      * 1000000.0, 0)::BIGINT AS cdot_u
        |  FROM embeddings q CROSS JOIN cbc WHERE q.vec_id < 10),
        |cand AS (SELECT q.q_id, a.c_id, a.cent_id FROM asg a
        |  JOIN qc q USING (cent_id) WHERE a.c_id <> q.q_id),
        |sc AS (SELECT cand.q_id, cand.c_id, cand.cent_id,
        |    sum(l.pdot_u) AS res_u
        |  FROM cand JOIN codes c ON c.c_id = cand.c_id
        |  JOIN lut l ON l.q_id = cand.q_id AND l.s = c.s
        |    AND l.code = c.code
        |  GROUP BY 1, 2, 3),
        |sc2 AS (SELECT sc.q_id, sc.c_id, sc.res_u + cd.cdot_u AS score_u
        |  FROM sc JOIN cd ON cd.q_id = sc.q_id
        |    AND cd.cent_id = sc.cent_id)
        |SELECT q_id, c_id,
        |  round(score_u::DOUBLE / 1000000.0, 6) AS approx_score,
        |  rn::INT AS rn
        |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY score_u DESC, c_id ASC) AS rn FROM sc2)
        |WHERE rn <= 5 ORDER BY q_id ASC, rn ASC""".stripMargin,
    // the permutation rotation as one CTE (1-based lists: slot j reads
    // emb[((j-1)*27 % 64) + 1]), then simsearch_pq's CTEs verbatim
    // over the rotated frame (codebook samples rotate with it)
    "simsearch_pq_rotated" ->
      """WITH re AS (SELECT vec_id, list_transform(range(0, 64),
        |    i -> embedding[(i * 27) % 64 + 1]) AS embedding
        |  FROM embeddings),
        |cb AS (SELECT vec_id AS code, embedding AS cv
        |  FROM re WHERE vec_id % 127 = 0
        |  ORDER BY vec_id LIMIT 256),
        |ss AS (SELECT unnest(range(0, 4)) AS s),
        |codes AS (SELECT c_id, s, code FROM (
        |  SELECT e.vec_id AS c_id, r.s, cb.code,
        |    row_number() OVER (PARTITION BY e.vec_id, r.s ORDER BY
        |      (list_sum(list_transform(range(1, 17),
        |         i -> e.embedding[r.s * 16 + i]::DOUBLE
        |            * cb.cv[r.s * 16 + i]::DOUBLE))
        |       - list_sum(list_transform(range(1, 17),
        |         i -> cb.cv[r.s * 16 + i]::DOUBLE
        |            * cb.cv[r.s * 16 + i]::DOUBLE)) / 2) DESC,
        |      cb.code ASC) AS rn
        |  FROM re e CROSS JOIN ss r CROSS JOIN cb) WHERE rn = 1),
        |lut AS (SELECT q.vec_id AS q_id, r.s, cb.code,
        |    round(list_sum(list_transform(range(1, 17),
        |      i -> q.embedding[r.s * 16 + i]::DOUBLE
        |         * cb.cv[r.s * 16 + i]::DOUBLE)) * 1000000.0, 0)::BIGINT
        |      AS pdot_u
        |  FROM re q CROSS JOIN ss r CROSS JOIN cb
        |  WHERE q.vec_id < 10),
        |sc AS (SELECT l.q_id, c.c_id, sum(l.pdot_u) AS score_u
        |  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
        |  WHERE c.c_id <> l.q_id GROUP BY 1, 2)
        |SELECT q_id, c_id,
        |  round(score_u::DOUBLE / 1000000.0, 6) AS approx_score,
        |  rn::INT AS rn
        |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY score_u DESC, c_id ASC) AS rn FROM sc)
        |WHERE rn <= 5 ORDER BY q_id ASC, rn ASC""".stripMargin,
    // ADC + refine: simsearch_pq's CTEs select the top-20 shortlist by
    // approximate score, then exact cosine (the simsearch_knn
    // expression verbatim) re-ranks the shortlist to top-5
    "simsearch_rerank" ->
      """WITH cb AS (SELECT vec_id AS code, embedding AS cv
        |  FROM embeddings WHERE vec_id % 127 = 0
        |  ORDER BY vec_id LIMIT 256),
        |ss AS (SELECT unnest(range(0, 4)) AS s),
        |codes AS (SELECT c_id, s, code FROM (
        |  SELECT e.vec_id AS c_id, r.s, cb.code,
        |    row_number() OVER (PARTITION BY e.vec_id, r.s ORDER BY
        |      (list_sum(list_transform(range(1, 17),
        |         i -> e.embedding[r.s * 16 + i]::DOUBLE
        |            * cb.cv[r.s * 16 + i]::DOUBLE))
        |       - list_sum(list_transform(range(1, 17),
        |         i -> cb.cv[r.s * 16 + i]::DOUBLE
        |            * cb.cv[r.s * 16 + i]::DOUBLE)) / 2) DESC,
        |      cb.code ASC) AS rn
        |  FROM embeddings e CROSS JOIN ss r CROSS JOIN cb) WHERE rn = 1),
        |lut AS (SELECT q.vec_id AS q_id, r.s, cb.code,
        |    round(list_sum(list_transform(range(1, 17),
        |      i -> q.embedding[r.s * 16 + i]::DOUBLE
        |         * cb.cv[r.s * 16 + i]::DOUBLE)) * 1000000.0, 0)::BIGINT
        |      AS pdot_u
        |  FROM embeddings q CROSS JOIN ss r CROSS JOIN cb
        |  WHERE q.vec_id < 10),
        |sc AS (SELECT l.q_id, c.c_id, sum(l.pdot_u) AS score_u
        |  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
        |  WHERE c.c_id <> l.q_id GROUP BY 1, 2),
        |cand AS (SELECT q_id, c_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY score_u DESC, c_id ASC) AS arn FROM sc)
        |  WHERE arn <= 20),
        |rr AS (SELECT cand.q_id, cand.c_id,
        |  round(
        |    list_sum(list_transform(range(1, len(q.embedding) + 1),
        |      i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))
        |    / (sqrt(list_sum(list_transform(q.embedding,
        |         x -> x::DOUBLE * x::DOUBLE)))
        |     * sqrt(list_sum(list_transform(c.embedding,
        |         x -> x::DOUBLE * x::DOUBLE)))),
        |    4) AS cos_sim
        |  FROM cand JOIN embeddings q ON q.vec_id = cand.q_id
        |  JOIN embeddings c ON c.vec_id = cand.c_id)
        |SELECT q_id, c_id, cos_sim, rn::INT AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY cos_sim DESC, c_id ASC) AS rn FROM rr
        |) WHERE rn <= 5 ORDER BY q_id ASC, rn ASC""".stripMargin,
    // PQ: per-subspace code assignment (argmax raw dot, code-ASC ties)
    // + 1e-6-unit partial-dot lookup table, summed per candidate —
    // mirrors pqOver's kernel arithmetic element for element
    "simsearch_pq" ->
      """WITH cb AS (SELECT vec_id AS code, embedding AS cv
        |  FROM embeddings WHERE vec_id % 127 = 0
        |  ORDER BY vec_id LIMIT 256),
        |ss AS (SELECT unnest(range(0, 4)) AS s),
        |codes AS (SELECT c_id, s, code FROM (
        |  SELECT e.vec_id AS c_id, r.s, cb.code,
        |    row_number() OVER (PARTITION BY e.vec_id, r.s ORDER BY
        |      (list_sum(list_transform(range(1, 17),
        |         i -> e.embedding[r.s * 16 + i]::DOUBLE
        |            * cb.cv[r.s * 16 + i]::DOUBLE))
        |       - list_sum(list_transform(range(1, 17),
        |         i -> cb.cv[r.s * 16 + i]::DOUBLE
        |            * cb.cv[r.s * 16 + i]::DOUBLE)) / 2) DESC,
        |      cb.code ASC) AS rn
        |  FROM embeddings e CROSS JOIN ss r CROSS JOIN cb) WHERE rn = 1),
        |lut AS (SELECT q.vec_id AS q_id, r.s, cb.code,
        |    round(list_sum(list_transform(range(1, 17),
        |      i -> q.embedding[r.s * 16 + i]::DOUBLE
        |         * cb.cv[r.s * 16 + i]::DOUBLE)) * 1000000.0, 0)::BIGINT
        |      AS pdot_u
        |  FROM embeddings q CROSS JOIN ss r CROSS JOIN cb
        |  WHERE q.vec_id < 10),
        |sc AS (SELECT l.q_id, c.c_id, sum(l.pdot_u) AS score_u
        |  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
        |  WHERE c.c_id <> l.q_id GROUP BY 1, 2)
        |SELECT q_id, c_id,
        |  round(score_u::DOUBLE / 1000000.0, 6) AS approx_score,
        |  rn::INT AS rn
        |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY score_u DESC, c_id ASC) AS rn FROM sc)
        |WHERE rn <= 5 ORDER BY q_id ASC, rn ASC""".stripMargin,
    // recall@k report composed from the three searcher oracles above
    // (nested-WITH derived tables — DuckDB-supported); count() keeps
    // zero-hit queries at hits=0 via the LEFT JOIN
    // codebook column + floor contract (r7 #7): lsh/stride rows are
    // fully recomputed here (floor_ok genuinely FALSE for the 8-bit
    // fixture LSH, TRUE for stride IVF); the kmeans summary row's
    // centroids are not DuckDB-replicable, so its floor_ok TRUE is the
    // shadow assertion — Spark measures the pinned-seed k-means||
    // mean recall against the same 0.25 floor (margins 0.70/0.74/0.42
    // at the three fixture SFs)
    "ann_recall" ->
      raw"""WITH ex AS (SELECT q_id, c_id FROM ($knnOracleSql) t),
        |ap AS (
        |  SELECT 'lsh' AS method, q_id, c_id FROM ($lshOracleSql) t
        |  UNION ALL
        |  SELECT 'ivf' AS method, q_id, c_id FROM ($ivfOracleSql) t),
        |m AS (SELECT 'lsh' AS method, 'none' AS codebook
        |      UNION ALL SELECT 'ivf', 'stride'),
        |base AS (SELECT m.method, m.codebook, ex.q_id, ex.c_id
        |         FROM m CROSS JOIN ex),
        |hit AS (SELECT b.method, b.codebook, b.q_id,
        |    count(a.c_id) AS hits, count(*) AS exact_n
        |  FROM base b LEFT JOIN ap a
        |    ON a.method = b.method AND a.q_id = b.q_id AND a.c_id = b.c_id
        |  GROUP BY b.method, b.codebook, b.q_id)
        |SELECT * FROM (
        |  SELECT method, codebook, q_id, hits,
        |    round(hits::DOUBLE / exact_n, 4) AS recall,
        |    avg(round(hits::DOUBLE / exact_n, 4))
        |      OVER (PARTITION BY method, codebook) >= 0.25 AS floor_ok
        |  FROM hit
        |  UNION ALL
        |  SELECT 'ivf', 'kmeans', -1::BIGINT, NULL::BIGINT,
        |    NULL::DOUBLE, TRUE)
        |ORDER BY method ASC, codebook ASC, q_id ASC""".stripMargin,
    // BM25 + dense rank list fused by fixed-point RRF: per-term BM25
    // contributions snapped to 1e-6 integer units BEFORE the per-doc
    // sum (integer sums are associative — Spark's partial-agg order
    // can't flip a rank), RRF terms are integer floor divisions, all
    // float expressions mirror the Spark op order token for token.
    // Composed from hybridLexCtes + a dense `vec` CTE + hybridFusionSql
    // so the knn and lsh variants share the lexical/fusion SQL verbatim
    "simsearch_hybrid" ->
      raw"""WITH $hybridLexCtes,
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM ce
        |      WHERE vec_id < 10),
        |c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM ce),
        |p AS (SELECT q_id, c_id,
        |  round(
        |    list_sum(list_transform(range(1, len(q_emb) + 1),
        |      i -> q_emb[i]::DOUBLE * c_emb[i]::DOUBLE))
        |    / (sqrt(list_sum(list_transform(q_emb, x -> x::DOUBLE * x::DOUBLE)))
        |     * sqrt(list_sum(list_transform(c_emb, x -> x::DOUBLE * x::DOUBLE)))),
        |    4) AS cos_sim
        |  FROM c CROSS JOIN q WHERE q_id <> c_id),
        |vec AS (SELECT q_id, c_id, vec_rn FROM (
        |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos_sim DESC, c_id ASC) AS vec_rn FROM p)
        |  WHERE vec_rn <= 20),
        |$hybridFusionSql""".stripMargin,
    // the scale-path hybrid: same lexical CTEs and fusion, dense side =
    // 6-bit LSH bucket candidates (hyperplane mix replicated bit-exactly
    // in HUGEINT SQL, same as simsearch_lsh's oracle)
    // the third retriever in the swap matrix: same lexical CTEs and
    // fusion, dense side = the IVF stride-codebook cell probe over the
    // corpus embeddings (simsearch_ivf's oracle CTEs restricted to ce)
    "simsearch_hybrid_ivf" ->
      raw"""WITH $hybridLexCtes,
        |cb AS (SELECT vec_id AS cent_id, embedding AS c_v,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS cnrm
        |  FROM ce WHERE vec_id % 127 = 0),
        |asg AS (SELECT c_id, c_emb, c_nrm, cent_id FROM (
        |  SELECT e.vec_id AS c_id, e.embedding AS c_emb,
        |    sqrt(list_sum(list_transform(e.embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS c_nrm,
        |    cb.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> e.embedding[i]::DOUBLE * (cb.c_v[i]::DOUBLE / cb.cnrm))) DESC,
        |      cb.cent_id ASC) AS rn
        |  FROM ce e CROSS JOIN cb) WHERE rn = 1),
        |qc AS (SELECT q_id, q_emb, q_nrm, cent_id FROM (
        |  SELECT e.vec_id AS q_id, e.embedding AS q_emb,
        |    sqrt(list_sum(list_transform(e.embedding,
        |      x -> x::DOUBLE * x::DOUBLE))) AS q_nrm,
        |    cb.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> e.embedding[i]::DOUBLE * cb.c_v[i]::DOUBLE))
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |           x -> x::DOUBLE * x::DOUBLE))) * cb.cnrm) DESC,
        |      cb.cent_id ASC) AS rn
        |  FROM ce e CROSS JOIN cb WHERE e.vec_id < 10) WHERE rn <= 2),
        |p3 AS (SELECT q.q_id, a.c_id,
        |  round(list_sum(list_transform(range(1, len(q.q_emb) + 1),
        |      i -> q.q_emb[i]::DOUBLE * a.c_emb[i]::DOUBLE))
        |    / (q.q_nrm * a.c_nrm), 4) AS cos_sim
        |  FROM qc q JOIN asg a USING (cent_id)
        |  WHERE q.q_id <> a.c_id),
        |vec AS (SELECT q_id, c_id, vec_rn FROM (
        |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos_sim DESC, c_id ASC) AS vec_rn FROM p3)
        |  WHERE vec_rn <= 20),
        |$hybridFusionSql""".stripMargin,
    "simsearch_hybrid_lsh" ->
      raw"""WITH $hybridLexCtes,
        |${lshWeightCtes(6, 64)},
        |bits AS (SELECT e.vec_id, wv.p,
        |  CASE WHEN list_sum(list_transform(range(1, len(e.embedding) + 1),
        |      i -> e.embedding[i]::DOUBLE * wv.wts[i])) >= 0
        |    THEN (1::BIGINT << p) ELSE 0::BIGINT END AS bit
        |  FROM ce e CROSS JOIN wv),
        |bkt AS (SELECT vec_id, sum(bit)::BIGINT AS bucket
        |        FROM bits GROUP BY vec_id),
        |eb AS (SELECT e.vec_id, e.embedding, b.bucket
        |       FROM ce e JOIN bkt b USING (vec_id)),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket
        |      FROM eb WHERE vec_id < 10),
        |c AS (SELECT vec_id AS c_id, embedding AS c_emb, bucket FROM eb),
        |p AS (SELECT q_id, c_id,
        |  round(
        |    list_sum(list_transform(range(1, len(q_emb) + 1),
        |      i -> q_emb[i]::DOUBLE * c_emb[i]::DOUBLE))
        |    / (sqrt(list_sum(list_transform(q_emb, x -> x::DOUBLE * x::DOUBLE)))
        |     * sqrt(list_sum(list_transform(c_emb, x -> x::DOUBLE * x::DOUBLE)))),
        |    4) AS cos_sim
        |  FROM c JOIN q USING (bucket) WHERE q_id <> c_id),
        |vec AS (SELECT q_id, c_id, vec_rn FROM (
        |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos_sim DESC, c_id ASC) AS vec_rn FROM p)
        |  WHERE vec_rn <= 20),
        |$hybridFusionSql""".stripMargin,
    // full replication of the production 48-bit/4-band pipeline (NOT the
    // exact-subset trick dedup_embedding uses): same banding, same
    // verify — equality holds at any threshold/SF, not just recall-1
    "dedup_embedding_lsh" ->
      raw"""WITH $lshBandVerifyCtes
        |SELECT a_id, b_id, cos_sim FROM ver WHERE cos_sim >= 0.95
        |ORDER BY a_id ASC, b_id ASC""".stripMargin,
    "dedup_embedding_lsh_cand" ->
      raw"""WITH $lshBandVerifyCtes
        |SELECT a_id, b_id, cos_sim FROM ver WHERE cos_sim >= -1.0
        |ORDER BY a_id ASC, b_id ASC""".stripMargin,
    // exact corpus-wide 3-shingle Jaccard ≥ 0.5 — equals the banded
    // pipeline's output because the 16×2 banding's candidate recall is
    // ~0.99 AT the threshold and the fixture's pairs sit at J ≥ 0.9
    // where the per-pair miss probability is 0.19^16 ≈ 3e-12 (and the
    // hashing is deterministic, so the match is a fixed fact of the
    // fixture, not a coin flip; the planted-dup recall property is
    // additionally DedupSpec-asserted)
    "dedup_minhash" ->
      raw"""WITH d AS (SELECT doc_id,
        |    string_split($normT, ' ') AS toks
        |  FROM documents WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |s AS (SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(toks) - 3, 0) + 1),
        |    i -> array_to_string(toks[i+1:i+3], ' '))) AS sh FROM d),
        |tok AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS ni
        |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |j AS (SELECT a_id, b_id,
        |    round(ni::DOUBLE / (sa.n::DOUBLE + sb.n::DOUBLE - ni::DOUBLE),
        |      4) AS jaccard
        |  FROM inter JOIN sizes sa ON a_id = sa.doc_id
        |             JOIN sizes sb ON b_id = sb.doc_id)
        |SELECT a_id, b_id, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY a_id ASC, b_id ASC""".stripMargin,
    // seen-store incremental near-dup: a delta doc (doc_id%10>=8) drops
    // iff exact 3-shingle Jaccard >= 0.5 against ANY store doc
    // (doc_id%10<8) or any SMALLER-id delta doc; empty-token docs never
    // pair (same gate as dedup_minhash) and therefore always survive.
    // Same banding-miss caveat as dedup_minhash (fixture dups at J>=0.9)
    "dedup_minhash_incremental" -> minhashIncrementalSql,
    // near-dup decontamination: exact cross-set all-pairs Jaccard
    // (corpus %19<>0 vs benchmark %19=0) — same banding-miss caveat as
    // dedup_minhash (fixture dups at J>=0.9, miss prob ~2e-4)
    "decontaminate_minhash" ->
      raw"""WITH d AS (SELECT doc_id,
        |    string_split($normT, ' ') AS toks
        |  FROM documents WHERE len(regexp_extract_all(text, '\S+')) > 0),
        |s AS (SELECT doc_id, list_distinct(list_transform(
        |    range(0, greatest(len(toks) - 3, 0) + 1),
        |    i -> array_to_string(toks[i+1:i+3], ' '))) AS sh FROM d),
        |tok AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |inter AS (SELECT c.doc_id AS c_id, b.doc_id AS b_id,
        |    count(*) AS ni
        |  FROM tok c JOIN tok b ON c.g = b.g
        |  WHERE c.doc_id % 19 <> 0 AND b.doc_id % 19 = 0
        |  GROUP BY 1, 2),
        |j AS (SELECT c_id, b_id,
        |    round(ni::DOUBLE / (sc.n::DOUBLE + sb.n::DOUBLE
        |      - ni::DOUBLE), 4) AS j
        |  FROM inter JOIN sizes sc ON c_id = sc.doc_id
        |  JOIN sizes sb ON b_id = sb.doc_id)
        |SELECT c_id AS doc_id, max(j) AS max_jaccard,
        |  count(*)::BIGINT AS n_bench_hits
        |FROM j WHERE j >= 0.5
        |GROUP BY c_id ORDER BY doc_id ASC""".stripMargin,
    // the streaming twin is gated on the SAME SQL (the stream_drift_ok
    // shared-oracle precedent): bucket-state loss across micro-batches,
    // order drift, or in-processor Jaccard drift all hash-mismatch
    "stream_dedup_minhash_ok" -> minhashIncrementalSql,
    "multimodal_stats" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |            ELSE 'video/mp4' END AS mime,
        |  count(*) AS n_assets,
        |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        |  CAST(max(n_chars % 1920) AS INT) AS max_width
        |FROM documents GROUP BY 1 ORDER BY 1 ASC""".stripMargin,
    "sql_recursive_cte" ->
      """WITH RECURSIVE up(c_custkey, node, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT c_custkey, node // 10, depth + 1 FROM up
        |  WHERE node >= 10
        |)
        |SELECT c_custkey, CAST(max(depth) AS BIGINT) AS hops,
        |       CAST(max_by(node, depth) AS BIGINT) AS root_digit
        |FROM up GROUP BY c_custkey
        |ORDER BY c_custkey ASC""".stripMargin,
    "sql_passthrough" ->
      """SELECT n_name, count(DISTINCT c.c_custkey) AS n_custs,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |       AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderstatus = 'F'
        |GROUP BY n_name
        |ORDER BY n_name ASC""".stripMargin,
    // the pipe query is plain relational algebra — its oracle is the
    // classic-syntax equivalent
    "sql_pipe" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(1) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC""".stripMargin,
    "agg_group_by_all" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_qty,
        |  COUNT(1) AS cnt
        |FROM lineitem
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin,
    "fn_collation" ->
      """SELECT c_mktsegment,
        |  COUNT(1) AS n,
        |  COUNT(1) FILTER (WHERE lower(c_mktsegment) = 'building')
        |    AS n_building_ci,
        |  COUNT(1) FILTER (WHERE c_mktsegment = 'building')
        |    AS n_building_cs
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment ASC""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id AS asset_id,
        |  unnest(range(0, (n_chars * 10)::BIGINT, 1000)) AS frame_ts_ms
        |FROM documents
        |WHERE doc_id % 3 = 2 AND n_chars * 10 > 0
        |ORDER BY asset_id ASC, frame_ts_ms ASC""".stripMargin,
    // round-trip check: the Spark side wrote struct+map to parquet and
    // read it back; DuckDB recomputes every projected value from the
    // source documents table the synthetic blob encodes — any value
    // mangled by the nested-type write/read path breaks the hash
    "multimodal_schema" ->
      """SELECT doc_id AS asset_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |       ELSE 'video/mp4' END AS mime,
        |  (n_chars % 1920)::INT AS width,
        |  (n_chars % 1080)::INT AS height,
        |  (n_chars * 10)::BIGINT AS duration_ms,
        |  md5(text) AS blob_md5,
        |  octet_length(encode(text))::INT AS blob_bytes,
        |  lang, source
        |FROM documents ORDER BY asset_id ASC""".stripMargin,
    "multimodal_resize" ->
      """WITH a AS (SELECT doc_id AS asset_id,
        |    (n_chars % 1920)::INT AS width, (n_chars % 1080)::INT AS height
        |  FROM documents),
        |s AS (SELECT *, least(256.0 / greatest(width, 1),
        |                      256.0 / greatest(height, 1)) AS sc
        |      FROM a WHERE width > 0 AND height > 0)
        |SELECT asset_id, width, height,
        |  ceil(width * sc)::INT AS out_width,
        |  ceil(height * sc)::INT AS out_height
        |FROM s ORDER BY asset_id ASC""".stripMargin
  )
}
