package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticQueries, RefQueries}
import graft.ext.{DedupQueries, SimilarityQueries, SketchQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (and the north-star extensions) is a
  * named entry in [[queries]]; [[oracleSql]] carries the DuckDB-equivalent
  * ANSI SQL the driver hash-compares against at sf0.01. Column names and
  * ordering are kept identical on both sides; aggregate doubles are rounded
  * so hashes are stable across engines.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's published Athena query: top-5 products by order count
    * (docs/athena_query_output.png). */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.topProducts(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1/2.2 — scans, projections, filters, derived columns
    "q_scan_project"    -> (RefQueries.scanProject _),
    "q_filter_pushdown" -> (RefQueries.filterPushdown _),
    "q_validation_split" -> (RefQueries.validationSplit _),
    "q_derived_date"    -> (RefQueries.derivedDate _),
    "q_conform_cast"    -> (RefQueries.conformCast _),
    // §2.4 — aggregations / dedup
    "q_dedup_first_wins" -> (RefQueries.dedupFirstWins _),
    "q_distinct_keys"   -> (RefQueries.distinctKeys _),
    "q_count_validation" -> (RefQueries.countValidation _),
    "q_group_agg"       -> (RefQueries.groupAgg _),
    "q_group_having"    -> (RefQueries.groupHaving _),
    "q_rollup_agg"      -> (RefQueries.rollupAgg _),
    // §2.3 — joins
    "q_semi_join_fk"    -> (RefQueries.semiJoinFk _),
    "q_anti_join"       -> (RefQueries.antiJoin _),
    "q_broadcast_dim_join" -> (RefQueries.broadcastDimJoin _),
    "q_top_products"    -> (RefQueries.topProducts _),
    "q_star_join"       -> (RefQueries.starJoin _),
    // §2.5 — set ops
    "q_except_distinct" -> (RefQueries.exceptDistinct _),
    "q_union_slices"    -> (RefQueries.unionSlices _),
    // §2.1 S6 — merge-upsert semantics (join rewrite)
    "q_merge_upsert"    -> (RefQueries.mergeUpsert _),
    // §2.6 — scalar functions
    "q_string_funcs"    -> (RefQueries.stringFuncs _),
    "q_date_funcs"      -> (RefQueries.dateFuncs _),
    "q_case_when"       -> (RefQueries.caseWhen _),
    // sort/limit + analytic windows
    "q_sort_limit"      -> (RefQueries.sortLimit _),
    "q_window_rank"     -> (RefQueries.windowRank _),
    "q_window_running"  -> (RefQueries.windowRunning _),
    // analytic extensions: as-of / range joins, pivot, cube, percentiles
    "q_asof_join"       -> (AnalyticQueries.asofJoin _),
    "q_range_join"      -> (AnalyticQueries.rangeJoin _),
    "q_pivot"           -> (AnalyticQueries.pivotAgg _),
    "q_cube_agg"        -> (AnalyticQueries.cubeAgg _),
    "q_grouping_sets"   -> (AnalyticQueries.groupingSets _),
    "q_percentiles"     -> (AnalyticQueries.percentiles _),
    "q_percentiles_bd"  -> (AnalyticQueries.percentilesBounded _),
    "q_distinct_salted" -> (AnalyticQueries.distinctSalted _),
    "q_json_extract"    -> (AnalyticQueries.jsonExtract _),
    "q_window_range"    -> (AnalyticQueries.windowRange _),
    "q_intersect"       -> (AnalyticQueries.intersectKeys _),
    "q_scalar_subquery" -> (AnalyticQueries.scalarSubquery _),
    // §2.9-shaped — event-time processing in batch
    "q_events_tumbling" -> (RefQueries.eventsTumbling _),
    "q_events_sliding"  -> (RefQueries.eventsSliding _),
    "q_events_sessionize" -> (RefQueries.eventsSessionize _),
    "q_events_sessionw" -> (RefQueries.eventsSessionWindow _),
    // §7.5(c) — LLM-pipeline text analysis over documents
    "q_text_tokens"     -> (TextQueries.textTokens _),
    "q_text_linprobe"   -> (TextQueries.textLinprobe _),
    "q_text_quality"    -> (TextQueries.textQuality _),
    "q_text_langid"     -> (TextQueries.textLangid _),
    "q_doc_fingerprint" -> (TextQueries.docFingerprint _),
    // §7.5(a) — LLM-pipeline deduplication tiers
    "q_dedup_exact"     -> (DedupQueries.dedupExact _),
    "q_dedup_norm"      -> (DedupQueries.dedupNorm _),
    "q_doc_neardup"     -> (DedupQueries.docNeardup _),
    // r13 — incremental cross-run dedup: new batch probed against the
    // PERSISTED historical band index (file-skipped; corpus unread)
    "q_dedup_incr"      -> (DedupQueries.dedupIncremental _),
    "q_doc_simhash"     -> (DedupQueries.docSimhash _),
    "q_ngram_jaccard"   -> (DedupQueries.ngramJaccard _),
    "q_chunk_dedup"     -> (DedupQueries.chunkDedup _),
    // r14 — exact-substring dedup: maximal verbatim ≥20-token shared
    // spans via rolling window fingerprints (the ExactSubstr shape)
    "q_substr_dedup"    -> (DedupQueries.substrDedup _),
    "q_substr_clean"    -> (DedupQueries.substrClean _),
    "q_doc_simjoin"     -> (DedupQueries.docSimjoin _),
    "q_text_repetition" -> (TextQueries.textRepetition _),
    "q_doc_sample"      -> (TextQueries.docSample _),
    // §7.5(b) — LLM-pipeline similarity search over embeddings
    "q_embed_topk"      -> (SimilarityQueries.embedTopk _),
    "q_embed_ivf"       -> (SimilarityQueries.embedIvf _),
    "q_embed_lsh"       -> (SimilarityQueries.embedLsh _),
    "q_embed_mplsh"     -> (SimilarityQueries.embedMplsh _),
    "q_embed_neardup"   -> (SimilarityQueries.embedNeardup _),
    "q_embed_cc"        -> (SimilarityQueries.embedClusters _),
    "q_embed_semdedup"  -> (SimilarityQueries.embedSemdedup _),
    "q_embed_kmeans"    -> (SimilarityQueries.embedKmeans _),
    "q_text_bpe"        -> (TextQueries.textBpe _),
    "q_text_pii"        -> (TextQueries.textPii _),
    "q_text_colloc"     -> (TextQueries.textColloc _),
    "q_doc_mix"         -> (TextQueries.docMix _),
    "q_doc_decontaminate" -> (DedupQueries.decontaminate _),
    "q_dedup_cc"        -> (DedupQueries.dedupClusters _),
    "q_sketch_distinct" -> (SketchQueries.sketchDistinct _),
    "q_sketch_kmv"      -> (SketchQueries.sketchKmv _),
    "q_sketch_hll"      -> (SketchQueries.sketchHll _),
    "q_sketch_cms"      -> (SketchQueries.sketchCms _),
    "q_sketch_bloom"    -> (SketchQueries.sketchBloom _),
    "q_sketch_quantile" -> (SketchQueries.sketchQuantile _),
    "q_sketch_quantile_mv" -> (SketchQueries.sketchQuantileMv _),
    "q_text_tfidf"      -> (TextQueries.textTfidf _),
    "q_text_bm25"       -> (TextQueries.textBm25 _),
    "q_doc_stratified"  -> (TextQueries.docStratified _),
    "q_window_lag"      -> (AnalyticQueries.windowLag _),
    "q_global_index"    -> (AnalyticQueries.globalIndex _),
    "q_events_gapfill"  -> (AnalyticQueries.eventsGapfill _),
    "q_events_retention" -> (AnalyticQueries.eventsRetention _),
    "q_events_rolling"  -> (AnalyticQueries.eventsRolling _),
    "q_histogram_eqd"   -> (AnalyticQueries.histogramEqd _),
    "q_winsorize"       -> (AnalyticQueries.winsorize _),
    "q_table_profile"   -> (AnalyticQueries.tableProfile _),
    "q_graph_pagerank"  -> (AnalyticQueries.graphPagerank _),
    "q_graph_triangles" -> (AnalyticQueries.graphTriangles _),
    "q_events_anomaly"  -> (AnalyticQueries.eventsAnomaly _),
    "q_events_markov"   -> (AnalyticQueries.eventsMarkov _),
    "q_skew_profile"    -> (AnalyticQueries.skewProfile _),
    "q_expectations"    -> (AnalyticQueries.expectations _),
    "q_doc_pack"        -> (TextQueries.docPack _),
    "q_text_rarity"     -> (TextQueries.textRarity _),
    "q_doc_chunks"      -> (TextQueries.docChunks _),
    "q_embed_quant"     -> (SimilarityQueries.embedQuant _),
    "q_embed_pq"        -> (SimilarityQueries.embedPq _),
    "q_embed_pq_search" -> (SimilarityQueries.embedPqSearch _),
    "q_embed_ivfpq"     -> (SimilarityQueries.embedIvfPq _),
    // X113 — the same searches served from the PERSISTED VectorIndex
    // (build-once artifacts; these entries measure the search-only
    // lifecycle the inline-training forms deliberately can't)
    "q_embed_ivf_idx"   -> (SimilarityQueries.embedIvfIdx _),
    "q_embed_ivf_nprobe" -> (SimilarityQueries.embedIvfNprobe _),
    "q_embed_ivf_nprobe_idx" -> (SimilarityQueries.embedIvfNprobeIdx _),
    "q_embed_ivfpq_nprobe" -> (SimilarityQueries.embedIvfPqNprobe _),
    "q_embed_ivfpq_rerank" -> (SimilarityQueries.embedIvfPqRerank _),
    "q_embed_ivfpq_idx" -> (SimilarityQueries.embedIvfPqIdx _),
    "q_embed_ivf_refresh" -> (SimilarityQueries.embedIvfRefresh _),
    "q_events_funnel"   -> (AnalyticQueries.eventsFunnel _),
    "q_histogram"       -> (AnalyticQueries.histogram _),
    // X94/X88 — the lakehouse WRITE surface under the oracle hash gate:
    // a deterministic scratch table is built at query time, the lake op
    // applied, the final state returned (lake/LakeQueries.scala)
    "q_cdc_apply"       -> (graft.lake.LakeQueries.cdcApply _),
    "q_scd2_pit"        -> (graft.lake.LakeQueries.scd2Pit _),
    "q_time_travel"     -> (graft.lake.LakeQueries.timeTravel _),
    "q_incremental_mv"  -> (graft.lake.LakeQueries.incrementalMv _),
    "q_join_mv"         -> (graft.lake.LakeQueries.joinMv _),
    "q_dv_state"        -> (graft.lake.LakeQueries.dvState _),
    // r11 — generated partition column: population + derived pruning
    "q_gen_prune"       -> (graft.lake.LakeQueries.genPrune _),
    // r11 — identity columns: contiguous distributed assignment across
    // two append waves, pinned by the 1..n closed-form invariants
    "q_identity"        -> (graft.lake.LakeQueries.identityAssign _),
    // r11 — CONVERT in place: a plain parquet dir adopted as commit 1,
    // then merged on top and read back in full
    "q_convert"         -> (graft.lake.LakeQueries.convertAdopt _),
    // r12 — multi-column (returnflag x linestatus) partitioning:
    // layout, tuple-scoped OPTIMIZE WHERE, tuple-probed MERGE, pruned read
    "q_multipart"       -> (graft.lake.LakeQueries.multiPart _),
    // X148/X149 — the SQL front-end under the gate: the same lifecycle
    // driven purely by SQL strings through the injected parser + TVF
    "q_lake_sql"        -> (graft.sql.SqlQueries.lakeSql _),
    // r11 — composite-key + conditional-clause MERGE via SQL, read back
    // through a bare-name FROM (sql/SqlQueries.scala, GraftRelationResolution)
    "q_merge_cond"      -> (graft.sql.SqlQueries.mergeCond _),
    // r11 — the SQL-only table lifecycle: CREATE CTAS (declared
    // schema), metadata-only ADD COLUMN, UPDATE, INSERT, scoped
    // OPTIMIZE WHERE, bare-name aggregate read-back
    "q_sql_ddl"         -> (graft.sql.SqlQueries.sqlDdl _),
    // X13/X94 end-to-end — the STREAMING surface under the oracle hash
    // gate: CSV waves drained by AvailableNow runs sharing a checkpoint,
    // per-batch lake writes, final state returned
    // (streaming/StreamQueries.scala)
    "q_stream_mv"       -> (graft.streaming.StreamQueries.streamMv _),
    "q_stream_cdc"      -> (graft.streaming.StreamQueries.streamCdc _),
    "q_stream_scd2"     -> (graft.streaming.StreamQueries.streamScd2 _),
    "q_stream_window"   -> (graft.streaming.StreamQueries.streamWindow _),
    "q_stream_sessions" -> (graft.streaming.StreamQueries.streamSessions _),
    "q_stream_ijoin"    -> (graft.streaming.StreamQueries.streamIntervalJoin _),
    // r13 — LEFT OUTER interval join: null-impression rows emitted at
    // watermark-driven state eviction (single AvailableNow run over
    // mtime-ordered sentinel waves)
    "q_stream_ojoin"    -> (graft.streaming.StreamQueries.streamIntervalJoinOuter _),
    "q_stream_sessions_cs" -> (graft.streaming.StreamQueries.streamSessionsCustom _),
    // r11 — continuous replication through the graft-cdf subscription
    "q_stream_replica"  -> (graft.streaming.StreamQueries.streamReplica _),
    // r11 — the streaming sink's exactly-once appends under the gate
    "q_stream_sink"     -> (graft.streaming.StreamQueries.streamSink _),
    // r14 — watermarked streaming dedup (dropDuplicatesWithinWatermark):
    // in-watermark re-deliveries suppressed, state evicted at the
    // watermark horizon (beyond-horizon retry re-emits, by contract)
    "q_stream_dedup"    -> (graft.streaming.StreamQueries.streamDedup _),
    // r14 — FSCK: log-vs-storage repair after storage ate a partition
    "q_fsck"            -> (graft.lake.LakeQueries.fsckRepair _),
    // §7.5 — multimodal binary columns (stub decode, real plumbing)
    "q_media_features"  -> ((s: SparkSession, d: String) =>
      ext.Multimodal.decoded(s, ext.Multimodal.mediaTable(Tables.documents(s, d)))),
    "q_media_transform" -> ((s: SparkSession, d: String) =>
      ext.Multimodal.transformed(s, ext.Multimodal.mediaTable(Tables.documents(s, d)))),
    // Composed cleaning pipeline end-to-end (quality+repetition gate →
    // exact dedup → near-dup removal), hash-checked against a single
    // composed DuckDB statement (DocPipeline.pipelineOracle) and
    // unit-tested (DocPipelineSpec).
    "q_doc_pipeline"    -> ((s: SparkSession, d: String) =>
      ext.DocPipeline.cleanedCorpus(s, d).select("doc_id", "source", "n_chars")),
    // End-to-end assembly: clean -> sequence-pack, one composed plan and
    // one composed CTE oracle (DocPipeline.assembledPacksOracle).
    "q_corpus_pack"     -> ((s: SparkSession, d: String) =>
      ext.DocPipeline.assembledPacks(s, d)),
    // Full curation: clean -> eval-holdout + decontamination -> pack.
    "q_corpus_curate"   -> ((s: SparkSession, d: String) =>
      ext.DocPipeline.curatedPacks(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
         FROM lineitem
         WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_discount > 0.05
         ORDER BY l_orderkey, l_linenumber""",
    "q_validation_split" ->
      """SELECT CASE WHEN o_totalprice > 0
                 AND o_orderdate >= TIMESTAMP '1990-01-01'
                 AND o_orderdate < TIMESTAMP '2030-01-01'
                 AND o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
               THEN 'valid' ELSE 'rejected' END AS bucket,
               count(*) AS n
         FROM orders GROUP BY 1 ORDER BY bucket""",
    "q_derived_date" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date
         FROM orders ORDER BY o_orderkey""",
    "q_conform_cast" ->
      """SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS INTEGER) AS qty_int,
               CAST(l_shipdate AS DATE) AS ship_date
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_dedup_first_wins" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus FROM (
           SELECT o_custkey, o_orderkey, o_orderstatus,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderkey) AS rn
           FROM orders) t
         WHERE rn = 1 ORDER BY o_custkey""",
    "q_distinct_keys" ->
      "SELECT DISTINCT l_suppkey FROM lineitem ORDER BY l_suppkey",
    "q_count_validation" ->
      "SELECT count(*) AS cnt FROM orders",
    "q_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_group_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS spend
         FROM orders GROUP BY o_custkey
         HAVING count(*) >= 5 ORDER BY o_custkey""",
    "q_rollup_agg" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus ASC NULLS FIRST,
                  o_orderpriority ASC NULLS FIRST""",
    "q_semi_join_fk" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_orderkey = l_orderkey AND o_orderstatus = 'O')
         ORDER BY l_orderkey, l_linenumber""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_broadcast_dim_join" ->
      """SELECT p_brand, count(*) AS n_items,
               ROUND(SUM(l_quantity), 2) AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "q_top_products" ->
      """SELECT p_name, count(*) AS total_orders
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_name ORDER BY total_orders DESC, p_name LIMIT 5""",
    "q_star_join" ->
      """SELECT n_name, count(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q_except_distinct" ->
      """SELECT o_custkey AS custkey FROM orders
         EXCEPT
         SELECT c_custkey AS custkey FROM customer
         WHERE c_mktsegment = 'BUILDING'
         ORDER BY custkey""",
    "q_union_slices" ->
      """SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS total
         FROM (
           SELECT * FROM orders WHERE o_totalprice >= 200000.0
           UNION ALL
           SELECT * FROM orders WHERE o_totalprice < 50000.0) t
         ORDER BY o_orderkey""",
    "q_merge_upsert" ->
      """WITH target AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice AS price
           FROM orders WHERE o_orderkey % 3 <> 0),
         source AS (
           SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000.0 AS price
           FROM orders WHERE o_orderkey % 2 = 0)
         SELECT o_orderkey, o_orderstatus, ROUND(price, 2) AS price FROM (
           SELECT * FROM target
           WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source)
           UNION ALL SELECT * FROM source) m
         ORDER BY o_orderkey""",
    "q_string_funcs" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_u,
               LENGTH(p_name) AS name_len,
               split_part(p_type, ' ', 1) AS type_head
         FROM part ORDER BY p_partkey""",
    "q_date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
               dayofmonth(o_orderdate) AS dom
         FROM orders ORDER BY o_orderkey""",
    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice >= 200000.0 THEN 'high'
                    WHEN o_totalprice >= 100000.0 THEN 'mid'
                    ELSE 'low' END AS band, count(*) AS n
         FROM orders GROUP BY 1 ORDER BY band""",
    "q_sort_limit" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS total FROM orders
         ORDER BY total DESC, o_orderkey LIMIT 20""",
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, total, rk FROM (
           SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total,
                  row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) t
         WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS running_spend
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q_asof_join" ->
      """WITH o AS (SELECT o_custkey, o_orderdate,
                      max(o_orderkey) AS last_orderkey
                    FROM orders GROUP BY 1, 2)
         SELECT e.user_id, e.event_id,
                CAST(epoch_us(e.ts) AS BIGINT) AS ts_us,
                o.last_orderkey
         FROM events e ASOF LEFT JOIN o
           ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
         ORDER BY user_id, event_id""",
    "q_range_join" ->
      """SELECT CAST(k AS INTEGER) AS band_id, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
         FROM range(0, 20) t(k) JOIN orders
           ON o_totalprice >= k * 25000.0
          AND o_totalprice < k * 25000.0 + 50000.0
         GROUP BY 1 ORDER BY band_id""",
    "q_pivot" ->
      """SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
         FROM orders GROUP BY 1 ORDER BY o_orderpriority""",
    "q_cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus ASC NULLS FIRST,
                  o_orderpriority ASC NULLS FIRST""",
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         ORDER BY o_orderstatus ASC NULLS FIRST,
                  o_orderpriority ASC NULLS FIRST""",
    "q_percentiles" ->
      """SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.25), 4) AS q25,
               round(quantile_cont(l_quantity, 0.5), 4) AS q50,
               round(quantile_cont(l_quantity, 0.75), 4) AS q75,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS med_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_percentiles_bd" ->
      """SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.25), 4) AS q25,
               round(quantile_cont(l_quantity, 0.5), 4) AS q50,
               round(quantile_cont(l_quantity, 0.75), 4) AS q75
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_distinct_salted" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                 AS BIGINT) AS sum_k,
               round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
                 AS avg_k
         FROM events GROUP BY 1 ORDER BY event_type""",
    "q_window_range" ->
      """SELECT o_orderkey, o_custkey,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INTEGER)
                 AS d,
               count(*) OVER w AS n_30d,
               round(SUM(o_totalprice) OVER w, 2) AS spend_30d
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
         ORDER BY o_orderkey""",
    "q_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
         INTERSECT
         SELECT c_custkey AS custkey FROM customer
         WHERE c_mktsegment = 'BUILDING'
         ORDER BY custkey""",
    "q_scalar_subquery" ->
      """SELECT o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
         FROM orders
         WHERE o_totalprice >
           (SELECT round(avg(o_totalprice), 2) FROM orders)
         GROUP BY 1 ORDER BY o_orderpriority""",
    "q_events_tumbling" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
               event_type, count(*) AS n, ROUND(SUM(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""",
    "q_events_sliding" ->
      """WITH w AS (
           SELECT event_type, value,
                  (epoch_us(ts) // 1800000000) * 1800 - k * 1800 AS win_start
           FROM events CROSS JOIN range(0, 2) t(k))
         SELECT win_start, event_type, count(*) AS n,
                ROUND(SUM(value), 2) AS sum_value
         FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""",
    "q_events_sessionize" ->
      """WITH g AS (
           SELECT user_id, event_id, value, ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                       THEN 1 ELSE 0 END AS new_sess
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, value,
                  CAST(SUM(new_sess) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
           FROM g)
         SELECT user_id, session_id, count(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
         FROM s GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    "q_events_sessionw" ->
      """WITH g AS (
           SELECT user_id, event_id, value, ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            >= 1800000000
                       THEN 1 ELSE 0 END AS new_sess
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, value, ts,
                  CAST(SUM(new_sess) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
           FROM g)
         SELECT user_id, session_id,
                CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
                count(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
         FROM s GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    "q_text_linprobe" -> TextQueries.textLinprobeOracle,
    "q_text_tokens" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents)
         SELECT doc_id,
                len(toks) AS n_tokens,
                len(list_distinct(toks)) AS n_unique,
                round(CAST(list_sum(list_transform(toks, t -> length(t)))
                      AS DOUBLE) / len(toks), 4) AS avg_token_len,
                round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)
                  AS ttr
         FROM t ORDER BY doc_id""",
    "q_text_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                    FROM documents),
         u AS (SELECT doc_id, text, len(toks) AS n_tokens,
                 CAST(len(list_filter(toks,
                   t -> t IN ('the', 'a', 'and', 'is', 'of'))) AS DOUBLE)
                   / len(toks) AS stop_ratio_raw,
                 CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                   AS ttr_raw
               FROM t)
         SELECT doc_id, length(text) AS n_chars, n_tokens,
                round(stop_ratio_raw, 4) AS stop_ratio,
                round(ttr_raw, 4) AS ttr,
                round((CAST(n_tokens AS DOUBLE) / (n_tokens + 20))
                      * (1.0 - stop_ratio_raw) * ttr_raw, 4) AS quality_score,
                (n_tokens >= 20 AND stop_ratio_raw <= 0.5
                 AND ttr_raw >= 0.05) AS quality_pass
         FROM u ORDER BY doc_id""",
    "q_text_langid" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
                    FROM documents),
         h AS (SELECT doc_id, lang,
                 len(list_filter(toks, t -> t IN ('der','die','das','und','ist'))) AS de_hits,
                 len(list_filter(toks, t -> t IN ('the','a','and','is','of'))) AS en_hits,
                 len(list_filter(toks, t -> t IN ('el','los','una','y','es'))) AS es_hits,
                 len(list_filter(toks, t -> t IN ('le','la','les','et','est'))) AS fr_hits,
                 len(list_filter(toks, t -> t IN ('shi','zai','he','wo','ni'))) AS zh_hits
               FROM t),
         m AS (SELECT *, greatest(de_hits, en_hits, es_hits, fr_hits, zh_hits)
                        AS mx FROM h)
         SELECT doc_id, lang,
                CASE WHEN de_hits = mx THEN 'de' WHEN en_hits = mx THEN 'en'
                     WHEN es_hits = mx THEN 'es' WHEN fr_hits = mx THEN 'fr'
                     ELSE 'zh' END AS pred_lang,
                de_hits, en_hits, es_hits, fr_hits, zh_hits
         FROM m ORDER BY doc_id""",
    "q_doc_fingerprint" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                    FROM documents),
         sh AS (SELECT doc_id, text,
                  CASE WHEN len(toks) >= 3
                    THEN list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                    ELSE [text] END AS shingles
                FROM t)
         SELECT doc_id, md5(text) AS md5_fp,
                list_min(list_transform(shingles,
                  s -> ('0x' || substr(md5(s), 1, 8))::BIGINT)) AS sh_min,
                len(list_distinct(shingles)) AS sh_count
         FROM sh ORDER BY doc_id""",
    "q_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS canonical_id,
               count(*) AS n_copies
         FROM documents GROUP BY md5(text) ORDER BY fp""",
    "q_dedup_norm" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
               min(doc_id) AS canonical_id, count(*) AS n_copies
         FROM documents
         GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
         ORDER BY fp""",
    "q_doc_neardup"   -> DedupQueries.neardupOracle,
    "q_dedup_incr"    -> DedupQueries.dedupIncrementalOracle,
    "q_doc_simhash"   -> DedupQueries.simhashOracle,
    "q_ngram_jaccard" -> DedupQueries.ngramJaccardOracle,
    "q_doc_simjoin" -> DedupQueries.docSimjoinOracle,
    "q_chunk_dedup"   -> DedupQueries.chunkDedupOracle,
    "q_substr_dedup"  -> DedupQueries.substrDedupOracle,
    "q_substr_clean"  -> DedupQueries.substrCleanOracle,
    "q_doc_sample" ->
      """SELECT doc_id, lang,
               ('0x' || substr(md5(doc_id || ':sample'), 1, 8))::BIGINT % 100
                 AS bucket
         FROM documents
         WHERE ('0x' || substr(md5(doc_id || ':sample'), 1, 8))::BIGINT % 100
               < 20
         ORDER BY doc_id""",
    "q_text_repetition" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                    FROM documents),
         b AS (SELECT doc_id,
                 unnest(CASE WHEN len(toks) >= 2
                   THEN list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i+1])
                   ELSE [text] END) AS bigram
               FROM t),
         c AS (SELECT doc_id, bigram, count(*) AS cnt
               FROM b GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
                max(cnt) AS top_cnt,
                round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 4) AS rep_ratio
         FROM c GROUP BY doc_id ORDER BY doc_id""",
    "q_embed_topk"    -> SimilarityQueries.topkOracle,
    "q_embed_ivf"     -> SimilarityQueries.ivfOracle,
    // the persisted-index forms return bit-identical rows, so they
    // share the train-inline oracles
    "q_embed_ivf_idx" -> SimilarityQueries.ivfOracle,
    "q_embed_ivf_nprobe" -> SimilarityQueries.ivfNprobeOracle,
    "q_embed_ivf_nprobe_idx" -> SimilarityQueries.ivfNprobeOracle,
    "q_embed_ivfpq_nprobe" -> SimilarityQueries.ivfPqNprobeOracle,
    "q_embed_ivfpq_rerank" -> SimilarityQueries.ivfPqRerankOracle,
    "q_embed_lsh"     -> SimilarityQueries.lshOracle,
    "q_embed_mplsh"   -> SimilarityQueries.mplshOracle,
    "q_embed_neardup" -> SimilarityQueries.neardupOracle,
    "q_embed_cc"      -> SimilarityQueries.embedClustersOracle,
    "q_embed_semdedup" -> SimilarityQueries.semdedupOracle,
    "q_embed_kmeans" -> SimilarityQueries.kmeansOracle,
    "q_sketch_distinct" -> SketchQueries.sketchDistinctOracle,
    "q_sketch_kmv"    -> SketchQueries.sketchKmvOracle,
    "q_sketch_hll"    -> SketchQueries.sketchHllOracle,
    "q_sketch_cms"    -> SketchQueries.sketchCmsOracle,
    "q_sketch_bloom"  -> SketchQueries.sketchBloomOracle,
    "q_sketch_quantile" -> SketchQueries.sketchQuantileOracle,
    "q_sketch_quantile_mv" -> SketchQueries.sketchQuantileMvOracle,
    "q_text_tfidf"    -> TextQueries.textTfidfOracle,
    "q_text_bm25"     -> TextQueries.textBm25Oracle,
    "q_doc_stratified" -> TextQueries.docStratifiedOracle,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price,
               first_value(o_totalprice) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS first_price,
               date_diff('day', lag(o_orderdate) OVER w, o_orderdate)
                 AS days_since_prev
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "q_events_gapfill" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day
                    FROM events WHERE user_id < 100),
         c AS (SELECT user_id, day, count(*) AS n FROM e GROUP BY 1, 2),
         r AS (SELECT user_id, min(day) AS d0, max(day) AS d1
               FROM e GROUP BY 1),
         g AS (SELECT user_id,
                 unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
                   INTERVAL 1 DAY))::DATE AS day
               FROM r)
         SELECT g.user_id, g.day, coalesce(n, CAST(0 AS BIGINT)) AS n_events,
                (n IS NULL) AS filled
         FROM g LEFT JOIN c ON g.user_id = c.user_id AND g.day = c.day
         ORDER BY 1, 2""",
    "q_events_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
                      CAST(epoch_us(ts) AS BIGINT) AS t
                    FROM events),
         s1 AS (SELECT user_id, min(t) AS t1 FROM e
                WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING (user_id)
                WHERE event_type = 'click' AND t >= t1 GROUP BY 1),
         s3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING (user_id)
                WHERE event_type = 'purchase' AND t >= t2 GROUP BY 1),
         u AS (SELECT user_id, 1 AS stage FROM s1
               UNION ALL SELECT user_id, 2 FROM s2
               UNION ALL SELECT user_id, 3 FROM s3)
         SELECT stage,
                CASE stage WHEN 1 THEN 'view' WHEN 2 THEN 'click'
                  ELSE 'purchase' END AS stage_name,
                count(*) AS n_users
         FROM u GROUP BY stage ORDER BY stage""",
    "q_histogram" ->
      """WITH mm AS (SELECT min(l_extendedprice) AS mn,
                       max(l_extendedprice) AS mx
                     FROM lineitem),
         b AS (SELECT CAST(CASE WHEN mx = mn THEN 0 ELSE least(19,
                 floor((l_extendedprice - mn) / ((mx - mn) / 20.0))) END
                 AS BIGINT) AS bin
               FROM lineitem CROSS JOIN mm),
         c AS (SELECT bin, count(*) AS n FROM b GROUP BY bin)
         SELECT bin,
                round(mn + bin * ((mx - mn) / 20.0), 2) AS bin_lo,
                round(mn + (bin + 1) * ((mx - mn) / 20.0), 2) AS bin_hi,
                n,
                round(n / sum(n) OVER (), 4) AS frac
         FROM c CROSS JOIN mm ORDER BY bin""",
    "q_events_retention" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                       FROM events),
         coh AS (SELECT user_id, MIN(day) AS cohort_day
                 FROM days GROUP BY user_id)
         SELECT cohort_day,
                CAST(date_diff('day', cohort_day, day) AS BIGINT)
                  AS day_offset,
                count(*) AS n_active
         FROM days JOIN coh USING (user_id)
         GROUP BY cohort_day, day_offset
         ORDER BY cohort_day, day_offset""",
    "q_table_profile" -> Seq("l_quantity", "l_discount", "l_shipdate",
        "l_returnflag")
      .map(c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
              CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
              count(DISTINCT $c) AS n_distinct,
              CAST(MIN($c) AS VARCHAR) AS min_s,
              CAST(MAX($c) AS VARCHAR) AS max_s FROM lineitem""")
      .mkString("", " UNION ALL ", " ORDER BY col_name"),
    "q_graph_pagerank" -> AnalyticQueries.graphPagerankOracle,
    "q_graph_triangles" -> AnalyticQueries.graphTrianglesOracle,
    "q_global_index" -> AnalyticQueries.globalIndexOracle,
    "q_histogram_eqd" ->
      """WITH c AS (SELECT l_quantity AS v, count(*) AS cnt
                    FROM lineitem GROUP BY 1),
         cc AS (SELECT v, cnt,
                  CAST(sum(cnt) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
                  CAST(sum(cnt) OVER () AS BIGINT) AS n
                FROM c)
         SELECT ((cum - cnt) * 5) // n AS bucket,
                min(v) AS lo, max(v) AS hi,
                CAST(sum(cnt) AS BIGINT) AS n_rows
         FROM cc GROUP BY 1 ORDER BY 1""",
    "q_winsorize" ->
      """WITH q AS (SELECT l_returnflag,
                      quantile_cont(l_quantity, 0.25) AS q25,
                      quantile_cont(l_quantity, 0.75) AS q75
                    FROM lineitem GROUP BY 1),
         b AS (SELECT l_returnflag,
                 q25 - (q75 - q25) * 1.5 AS lo,
                 q75 + (q75 - q25) * 1.5 AS hi
               FROM q)
         SELECT l.l_returnflag,
                CAST(sum(CASE WHEN l_quantity < lo THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_lo_clipped,
                CAST(sum(CASE WHEN l_quantity > hi THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hi_clipped,
                round(sum(greatest(lo, least(hi, l_quantity))), 2)
                  AS sum_winsorized,
                count(*) AS n_rows
         FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
         GROUP BY 1 ORDER BY 1""",
    "q_events_rolling" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day
                    FROM events WHERE user_id < 100),
         c AS (SELECT user_id, day, count(*) AS n FROM e GROUP BY 1, 2),
         r AS (SELECT user_id, min(day) AS d0, max(day) AS d1
               FROM e GROUP BY 1),
         g AS (SELECT user_id,
                 unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
                   INTERVAL 1 DAY))::DATE AS day
               FROM r),
         f AS (SELECT g.user_id, g.day,
                 coalesce(n, CAST(0 AS BIGINT)) AS n_events
               FROM g LEFT JOIN c ON g.user_id = c.user_id
                 AND g.day = c.day)
         SELECT user_id, day, n_events,
                CAST(sum(n_events) OVER w7 AS BIGINT) AS sum7,
                round(CAST(sum(n_events) OVER w7 AS BIGINT)
                  / CAST(count(*) OVER w7 AS DOUBLE), 6) AS avg7,
                n_events - lag(n_events) OVER
                  (PARTITION BY user_id ORDER BY day) AS delta
         FROM f
         WINDOW w7 AS (PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, day""",
    "q_expectations" ->
      """WITH a AS (SELECT count(*) AS n_rows,
             CAST(sum(CASE WHEN coalesce(l_quantity > 0, FALSE)
                  THEN 0 ELSE 1 END) AS BIGINT) AS f0,
             CAST(sum(CASE WHEN coalesce(l_quantity <= 41, FALSE)
                  THEN 0 ELSE 1 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN coalesce(l_discount BETWEEN 0 AND 0.05,
                  FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS f2,
             CAST(sum(CASE WHEN l_shipdate IS NOT NULL
                  THEN 0 ELSE 1 END) AS BIGINT) AS f3
           FROM lineitem)
         SELECT r.rule, a.n_rows,
                CASE r.rule
                  WHEN 'quantity_positive' THEN f0
                  WHEN 'quantity_under_41' THEN f1
                  WHEN 'discount_in_range' THEN f2
                  ELSE f3 END AS n_fail,
                round(CASE r.rule
                  WHEN 'quantity_positive' THEN f0
                  WHEN 'quantity_under_41' THEN f1
                  WHEN 'discount_in_range' THEN f2
                  ELSE f3 END
                  / CAST(CASE WHEN a.n_rows = 0 THEN 1
                         ELSE a.n_rows END AS DOUBLE), 6) AS fail_frac
         FROM a, (VALUES ('quantity_positive'), ('quantity_under_41'),
                  ('discount_in_range'), ('shipdate_present')) r(rule)
         ORDER BY r.rule""",
    "q_events_markov" ->
      """WITH o AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
           FROM events),
         c AS (SELECT prev AS prev_state, event_type AS next_state,
                 count(*) AS n
               FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT prev_state, CAST(sum(n) AS BIGINT) AS tot
               FROM c GROUP BY 1)
         SELECT c.prev_state, c.next_state, n,
                round(n / CAST(tot AS DOUBLE), 6) AS p
         FROM c JOIN t USING (prev_state)
         ORDER BY prev_state, next_state""",
    "q_skew_profile" ->
      """WITH c AS (SELECT CAST(l_suppkey AS VARCHAR) AS key,
                      count(*) AS n
                    FROM lineitem GROUP BY 1),
         tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
         top AS (SELECT key, n FROM c ORDER BY n DESC, key LIMIT 20)
         SELECT key, n,
                round(n / CAST(tot AS DOUBLE), 6) AS share,
                round(CAST(sum(n) OVER (ORDER BY n DESC, key
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) / CAST(tot AS DOUBLE), 6) AS cum_share
         FROM top, tt ORDER BY n DESC, key""",
    "q_events_anomaly" ->
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
         c AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
         m AS (SELECT event_type, quantile_cont(n, 0.5) AS med
               FROM c GROUP BY 1),
         dv AS (SELECT c.event_type, day, n, med, abs(n - med) AS adev
                FROM c JOIN m USING (event_type)),
         md AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
                FROM dv GROUP BY 1)
         SELECT dv.event_type, day, n, med, mad
         FROM dv JOIN md USING (event_type)
         WHERE adev > 2.0 * mad
         ORDER BY event_type, day""",
    "q_doc_pack"      -> TextQueries.docPackOracle,
    "q_doc_chunks"    -> TextQueries.docChunksOracle,
    "q_text_rarity" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
         tf AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM t)
         SELECT doc_id, count(*) AS n_tokens,
                round(avg(nn / n), 4) AS avg_rarity,
                round(max(nn / n), 4) AS max_rarity,
                CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_hapax
         FROM t JOIN tf USING (tok) CROSS JOIN tot
         GROUP BY doc_id ORDER BY doc_id""",
    "q_embed_quant"   -> SimilarityQueries.embedQuantOracle,
    "q_embed_pq"      -> SimilarityQueries.embedPqOracle,
    "q_embed_pq_search" -> SimilarityQueries.embedPqSearchOracle,
    "q_embed_ivfpq"   -> SimilarityQueries.embedIvfPqOracle,
    "q_embed_ivfpq_idx" -> SimilarityQueries.embedIvfPqOracle,
    "q_embed_ivf_refresh" -> SimilarityQueries.ivfRefreshOracle,
    "q_cdc_apply"     -> graft.lake.LakeQueries.cdcApplyOracle,
    "q_lake_sql"      -> graft.sql.SqlQueries.lakeSqlOracle,
    "q_merge_cond"    -> graft.sql.SqlQueries.mergeCondOracle,
    "q_scd2_pit"      -> graft.lake.LakeQueries.scd2PitOracle,
    "q_time_travel"   -> graft.lake.LakeQueries.timeTravelOracle,
    "q_incremental_mv" -> graft.lake.LakeQueries.incrementalMvOracle,
    "q_join_mv" -> graft.lake.LakeQueries.joinMvOracle,
    "q_dv_state"      -> graft.lake.LakeQueries.dvStateOracle,
    "q_gen_prune"     -> graft.lake.LakeQueries.genPruneOracle,
    "q_identity"      -> graft.lake.LakeQueries.identityAssignOracle,
    "q_sql_ddl"       -> graft.sql.SqlQueries.sqlDdlOracle,
    "q_convert"       -> graft.lake.LakeQueries.convertAdoptOracle,
    "q_multipart"     -> graft.lake.LakeQueries.multiPartOracle,
    "q_stream_mv"     -> graft.streaming.StreamQueries.streamMvOracle,
    "q_stream_replica" -> graft.streaming.StreamQueries.streamReplicaOracle,
    "q_stream_sink"   -> graft.streaming.StreamQueries.streamSinkOracle,
    "q_stream_cdc"    -> graft.streaming.StreamQueries.streamCdcOracle,
    "q_stream_scd2"   -> graft.streaming.StreamQueries.streamScd2Oracle,
    "q_stream_window" -> graft.streaming.StreamQueries.streamWindowOracle,
    "q_stream_sessions" -> graft.streaming.StreamQueries.streamSessionsOracle,
    "q_stream_ijoin"  -> graft.streaming.StreamQueries.streamIntervalJoinOracle,
    "q_stream_ojoin"  -> graft.streaming.StreamQueries.streamIntervalJoinOuterOracle,
    "q_stream_sessions_cs" -> graft.streaming.StreamQueries.streamSessionsCustomOracle,
    "q_stream_dedup"  -> graft.streaming.StreamQueries.streamDedupOracle,
    "q_fsck"          -> graft.lake.LakeQueries.fsckRepairOracle,
    "q_doc_pipeline"  -> ext.DocPipeline.pipelineOracle(),
    "q_corpus_pack"   -> ext.DocPipeline.assembledPacksOracle(),
    "q_corpus_curate" -> ext.DocPipeline.curatedPacksOracle(),
    "q_text_pii"      -> TextQueries.textPiiOracle,
    "q_text_colloc"   -> TextQueries.textCollocOracle,
    "q_doc_mix"       -> TextQueries.docMixOracle,
    "q_doc_decontaminate" -> DedupQueries.decontaminateOracle,
    "q_dedup_cc"      -> DedupQueries.dedupClustersOracle,
    "q_text_bpe" ->
      """SELECT doc_id,
                len(string_split(text, ' ')) AS n_words,
                len(regexp_extract_all(text, '[aeiou]+|[^aeiou ]+'))
                  AS n_subwords,
                round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                      / len(regexp_extract_all(text, '[aeiou]+|[^aeiou ]+')), 4)
                  AS avg_subword_len
         FROM documents ORDER BY doc_id""",
    "q_media_features" ->
      """WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                      md5(text) AS payload_md5
                    FROM documents),
         k AS (SELECT *, CASE n_bytes % 3 WHEN 0 THEN 'image'
                           WHEN 1 THEN 'audio' ELSE 'video' END AS kind
               FROM m)
         SELECT doc_id, kind, payload_md5, n_bytes,
                32 + n_bytes % 608 AS width,
                32 + (n_bytes * 7) % 448 AS height,
                CASE WHEN kind = 'video' THEN 1 + n_bytes % 30 ELSE 1 END
                  AS n_frames
         FROM k ORDER BY doc_id""",
    "q_media_transform" ->
      """WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes
                    FROM documents),
         k AS (SELECT doc_id, n_bytes,
                 CASE n_bytes % 3 WHEN 0 THEN 'image'
                   WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                 32 + n_bytes % 608 AS width,
                 32 + (n_bytes * 7) % 448 AS height,
                 CASE WHEN n_bytes % 3 = 2 THEN 1 + n_bytes % 30 ELSE 1 END
                   AS n_frames
               FROM m),
         g AS (SELECT *, greatest(width, height) AS mx FROM k)
         SELECT doc_id, kind, width, height,
                CAST(CASE WHEN mx <= 224 THEN width
                     ELSE width * 224 // mx END AS INTEGER) AS out_w,
                CAST(CASE WHEN mx <= 224 THEN height
                     ELSE height * 224 // mx END AS INTEGER) AS out_h,
                CAST((n_frames - 1) // 5 + 1 AS INTEGER) AS frames_sampled
         FROM g ORDER BY doc_id""",
  )
}
