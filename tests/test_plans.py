"""Plan-regression gate: the scale properties PLANS.md documents,
asserted per query so they cannot silently rot.

Each golden entry is a CEILING / requirement, not an exact snapshot —
AQE and stats changes may legitimately shave an Exchange, but a query
that GAINS shuffles, loses a broadcast, loses filter pushdown, or
(worst) picks up an unbounded nested-loop join fails here before it
fails at 100 TB.

q_dedup_clusters is the headline: its iterative label propagation once
doubled its plan per round (475 Exchanges by iteration 10, r1/r2
audits); the per-round checkpoint keeps it constant-size, and this test
pins that.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tools.explain_all import plan_props

_QUERIES = entry_mod.queries()

#: joins: strategies that MUST appear; ban_bnlj: BroadcastNestedLoopJoin
#: must NOT appear (it is only acceptable for designed small-N shapes);
#: pushed: a non-empty PushedFilters must reach some scan.
GOLDEN = {
    # scans / filters: no shuffle, pushdown reaches the scan
    "q_scan_project": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=3),
    "q_filter_daterange": dict(max_exchanges=0, pushed=True, ban_bnlj=True),
    # flagship agg: one shuffle (partial -> final)
    "q_agg_hash": dict(max_exchanges=2, pushed=True, ban_bnlj=True),
    # join battery: small side broadcast, fact shuffles at most once
    # into the final agg
    "q_join_inner": dict(max_exchanges=1, joins=["BroadcastHashJoin"], pushed=True, ban_bnlj=True),
    "q_join_broadcast": dict(max_exchanges=1, joins=["BroadcastHashJoin"], ban_bnlj=True),
    "q_join_semi": dict(max_exchanges=1, joins=["BroadcastHashJoin"], ban_bnlj=True),
    "q_join_anti": dict(max_exchanges=1, joins=["BroadcastHashJoin"], ban_bnlj=True),
    "q_join_multi": dict(max_exchanges=2, joins=["BroadcastHashJoin"], pushed=True, ban_bnlj=True),
    "q_join_star": dict(max_exchanges=2, joins=["BroadcastHashJoin"], pushed=True, ban_bnlj=True),
    "q_join_two_dims": dict(max_exchanges=2, joins=["BroadcastHashJoin"], pushed=True, ban_bnlj=True),
    "q_topk_customers": dict(max_exchanges=2, joins=["BroadcastHashJoin"], pushed=True, ban_bnlj=True),
    "q_subquery_scalar": dict(max_exchanges=3, ban_bnlj=True),
    "q_anti_blacklist": dict(max_exchanges=3, joins=["BroadcastHashJoin"], ban_bnlj=True),
    # windows / global ordering
    "q_window_rank": dict(max_exchanges=1, ban_bnlj=True),
    "q_row_number_global": dict(max_exchanges=6, ban_bnlj=True),
    # dedup / similarity: bucket-join shaped, bounded plans
    "q_dedup_exact": dict(max_exchanges=1, ban_bnlj=True),
    "q_dedup_near": dict(max_exchanges=4, ban_bnlj=True),
    # incremental probe: two band tables + cross/internal candidates +
    # two shingle re-attach joins (the corpus side is a materialized,
    # partition-pruned index at scale)
    "q_dedup_incremental": dict(max_exchanges=8, ban_bnlj=True, pushed=True),
    "q_dedup_embed": dict(max_exchanges=2, joins=["BroadcastHashJoin"], ban_bnlj=True),
    # iterative clustering: plan must stay CONSTANT-size (was 475
    # exchanges by iteration 10 without per-round checkpointing)
    "q_dedup_clusters": dict(max_exchanges=6),
    # iterative PageRank: the returned frame reads the CHECKPOINTED
    # final ranks (per-round lineage truncation), so the visible plan
    # is scan -> TakeOrderedAndProject; gaining an Exchange here means
    # the truncation regressed
    "q_graph_pagerank": dict(max_exchanges=1, ban_bnlj=True),
    # z-key is pure map-side bit arithmetic + top-k: no shuffle, and
    # the scan must stay pruned to the 3 input columns
    "q_zorder_layout": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=3),
    # per-entity burst detection: count shuffle + stats shuffle +
    # broadcast join back (the stats side is tiny by construction)
    "q_events_anomaly": dict(max_exchanges=3, joins=["BroadcastHashJoin"], ban_bnlj=True),
    # sketch algebra: the BNLJ in kll/theta is the designed 1-row
    # estimate broadcast; topk is two agg shuffles (accumulate grain +
    # combine)
    "q_kll_rollup": dict(max_exchanges=4),
    "q_theta_setops": dict(max_exchanges=4),
    "q_topk_sketch": dict(max_exchanges=2, ban_bnlj=True),
    # point-in-time lookup: union + ONE key shuffle + window pass —
    # gaining a join here means the quadratic inequality-join shape
    # crept back
    "q_scd2_lookup": dict(max_exchanges=2, ban_bnlj=True),
    # HITS: like pagerank, the visible plan reads checkpointed scores
    # (per-half-step lineage truncation) -> two TakeOrdered legs
    "q_graph_hits": dict(max_exchanges=1),
    "q_graph_pagerank_weighted": dict(max_exchanges=1, ban_bnlj=True),
    # dangling-mass variant: same checkpointed-ranks read as pagerank
    "q_graph_pagerank_dangling": dict(max_exchanges=1, ban_bnlj=True),
    # PQ encode + ADC (r18): the one-row codebook/LUT now folds in as
    # LITERAL columns, so there is NO join in the plan at all — the
    # single Exchange is the ordered full output, scan stays 2 columns
    "q_embed_pq": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=2),
    # IVF-PQ probe: code-only partitioned scans + broadcast model rows;
    # zero shuffle end-to-end (top-k is TakeOrderedAndProject)
    "q_sim_ivfpq": dict(
        max_exchanges=0, joins=["BroadcastNestedLoopJoin"], max_scan_cols=2
    ),
    # r11: exact re-rank of the ADC candidate pool — the RETURNED plan
    # is the rerank leg alone: the bounded candidate-id IN list pushed
    # into the 2-col vector scan + TakeOrderedAndProject; zero shuffle
    "q_sim_ivfpq_rerank": dict(
        max_exchanges=0, ban_bnlj=True, pushed=True, max_scan_cols=2
    ),
    # r11: stats-pruned scan — only intersecting files are even listed
    # in the read; residual filter still pushed into their row groups
    "q_scan_skipping": dict(
        max_exchanges=0, ban_bnlj=True, pushed=True, max_scan_cols=3
    ),
    # r11: bloom-pruned point lookup — equality filter pushed into the
    # surviving files' row groups, no shuffle
    "q_scan_bloom": dict(
        max_exchanges=0, ban_bnlj=True, pushed=True, max_scan_cols=3
    ),
    # r11: pointer-resolved scan of the current published version
    "q_publish_versions": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    # r13: two-tier pruned read of a published version — version
    # rollup checked driver-side, then the per-file-pruned scan with
    # the residual range filter pushed into surviving row groups
    "q_publish_pruned": dict(
        max_exchanges=0, ban_bnlj=True, pushed=True, max_scan_cols=2
    ),
    # r13: two-tier point lookup — version bloom rollup driver-side,
    # then the per-file-bloom-pruned scan with the equality pushed
    "q_publish_bloom": dict(
        max_exchanges=0, ban_bnlj=True, pushed=True, max_scan_cols=2
    ),
    # r13: IVF-SQ exact re-rank — visible plan is the rerank leg
    # (bounded candidate IN list into a 2-col vector scan +
    # TakeOrderedAndProject), same shape as q_sim_ivfpq_rerank
    "q_sim_ivfsq_rerank": dict(
        max_exchanges=0, ban_bnlj=True, pushed=True, max_scan_cols=2
    ),
    # r13: batched SQ knn — the two BNLJs are the designed one-row
    # model broadcast + bounded query-batch broadcast; shuffles are
    # the per-query top-k window + the ordered output
    "q_knn_join_sq": dict(max_exchanges=3, max_scan_cols=2),
    # r13: batched index knn joins — partition-pruned code scan, the
    # BNLJs are the designed centroid/model/query-batch broadcasts and
    # the array_contains cell join; shuffles = per-query window + sort
    "q_knn_join_ivfpq": dict(max_exchanges=3, max_scan_cols=3),
    "q_knn_join_ivfsq": dict(max_exchanges=3, max_scan_cols=3),
    # r11: SQ8 — model fit is one posexplode agg; encode+score are
    # row-local folds against the one-row broadcast model (the BNLJ);
    # top-k is TakeOrderedAndProject
    "q_embed_sq": dict(max_exchanges=2, max_scan_cols=2),
    # r11: LPA — the returned plan reads checkpointed final labels
    # (per-round lineage truncation): rollup agg + ordered output
    "q_graph_lpa": dict(max_exchanges=3, ban_bnlj=True),
    # temporal split: the OR of timestamp-literal predicates MUST reach
    # the scan (that is the partition-pruning story at scale)
    "q_split_temporal": dict(max_exchanges=1, pushed=True, ban_bnlj=True),
    # grouped split: map-side assignment + two small aggs; the BNLJ is
    # the designed 1-row leakage-counter broadcast
    "q_split_grouped": dict(max_exchanges=5),
    # negative sampling: distributed corpus numbering (range partition
    # + offset broadcast) + draw join + anti join + per-query window;
    # its BNLJ is the designed 1-row corpus-count broadcast.  The lazy
    # pre-AQE plan prints 11 Exchanges (executed audit: 10 — the
    # numbering's offset branch is double-printed before reuse).
    "q_negative_sample": dict(max_exchanges=8, joins=["BroadcastHashJoin"]),
    # count-min: two shard-sketch groupBys + merge agg + probe distinct
    # + exact-count agg + broadcast probe join — all bounded by
    # |distinct items|, never corpus rows, after the first groupBy
    "q_sketch_cm": dict(max_exchanges=6, joins=["BroadcastHashJoin"], pushed=True, ban_bnlj=True),
    # real-codec decode is pure mapInPandas over a pruned 2-col scan
    "q_multimodal_real": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    # r11: same decode through the zero-copy mapInArrow exchange
    "q_multimodal_arrow": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    "q_multimodal_audio": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    "q_multimodal_video": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    # drained memory-sink read (real streaming plan gated in
    # tests/test_streaming_plans.py)
    "q_stream_media": dict(max_exchanges=0, ban_bnlj=True),
    # triangles: co-occurrence self-join + wedge + closing equi-joins;
    # the BNLJ is the designed 1-row (n_edges x n_triangles) broadcast
    # 12 on the pre-exec plan: the persisted canonical-edge and
    # degree-oriented subtrees print once per consumer before
    # materialization; executed audits read ~6 (PLANS.md).  Degree
    # orientation costs one extra agg + two joins at build time and
    # buys the O(m^1.5) wedge bound (11.6x on a celebrity-hub graph,
    # PERF_NOTES r9)
    "q_graph_triangles": dict(max_exchanges=12, joins=["BroadcastHashJoin"], pushed=True),
    "q_sim_topk": dict(max_exchanges=1, ban_bnlj=True),
    # connected components (r10): the returned plan reads checkpointed
    # star edges — per-round plans stay constant-size by construction;
    # this gates the label rollup + node-spine join + ordered output
    "q_graph_components": dict(max_exchanges=4, ban_bnlj=True),
    # duplicated-span coverage (r10): window explode -> ONE corpus
    # groupBy on the window string -> window-keyed join back -> bounded
    # x5 offsets explode; ceilings cover the pre-AQE print of the
    # persisted matched-window set under both its consumers.  No
    # pushed= requirement: the operator persists its matched set, so
    # when an earlier run in the same session cached it the scans
    # (and their PushedFilters) print as InMemoryRelation reuse
    "q_dedup_spans": dict(max_exchanges=9, ban_bnlj=True, max_scan_cols=2),
    # stream-static enrichment: drained memory-sink read (real
    # streaming plan gated in tests/test_streaming_plans.py)
    "q_stream_enrich": dict(max_exchanges=0, ban_bnlj=True),
    # event time: as-of keys pin the union+window single-shuffle shape
    # the operator docstring promises; interval join must stay the
    # bucketized equi-join (sessions side broadcast), never a range BNLJ
    "q_events_window": dict(max_exchanges=1, pushed=True, ban_bnlj=True),
    "q_events_sessionize": dict(max_exchanges=2, ban_bnlj=True),
    "q_asof_tolerance": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=3),
    "q_asof_forward": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=3),
    "q_interval_join": dict(
        max_exchanges=1, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=3,
    ),
    # IVF ANN: probe is a 1-row broadcast (its nested-loop join is the
    # designed scalar-N shape, so no ban), centroid assignment broadcast,
    # scans stay 2-col; exchanges bounded by the recall-check agg
    "q_sim_ivf": dict(max_exchanges=2, joins=["BroadcastHashJoin"], max_scan_cols=2),
    # text pipeline (r4): expression-only cleaning, doc-keyed repetition
    # aggs, hash-bucket sampling with pushdown, term-keyed tf-idf (its
    # nested-loop join is the 1-row scalar-N broadcast — allowed)
    "q_text_clean": dict(max_exchanges=0, ban_bnlj=True),
    "q_text_gopher": dict(max_exchanges=2, ban_bnlj=True),
    "q_sample_stratified": dict(max_exchanges=1, pushed=True, ban_bnlj=True),
    "q_text_tfidf": dict(max_exchanges=3),
    # r4 additions: window battery stays one shuffle; array ops are
    # scan-only; sketch rollup = fine-grain agg + merge agg + exact leg;
    # SCD2 is one window shuffle; salted join must keep its broadcast
    # (the salt explodes the DIM, never the fact) and stay scan-pruned
    "q_window_navigation": dict(max_exchanges=1, ban_bnlj=True),
    "q_array_ops": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    "q_agg_sketch_hll": dict(max_exchanges=5, ban_bnlj=True),
    "q_quantile_sketch": dict(max_exchanges=1, ban_bnlj=True),
    "q_scd2": dict(max_exchanges=1, ban_bnlj=True),
    "q_join_salted": dict(
        max_exchanges=1, joins=["BroadcastHashJoin"], ban_bnlj=True,
        max_scan_cols=3,
    ),
    # late-r4 curation ops: gram join must stay broadcast (bench side is
    # MBs at any corpus scale); packing's cumsum is range-partition +
    # offsets-broadcast (5 exchanges, none full-data beyond the range
    # partition); mixture sampling is a map-side filter + report agg
    "q_decontaminate": dict(
        max_exchanges=2, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=2,
    ),
    "q_pack_sequences": dict(
        max_exchanges=5, joins=["BroadcastHashJoin"], ban_bnlj=True,
        max_scan_cols=2,
    ),
    "q_sample_weighted": dict(
        max_exchanges=1, ban_bnlj=True, pushed=True, max_scan_cols=2,
    ),
    # r5: chunking is map-side only (zero shuffles, 2-col scan); MERGE
    # apply must keep the changeset-keys broadcast so the snapshot side
    # never shuffles
    "q_chunk_documents": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    "q_merge_upsert": dict(
        max_exchanges=1, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=3,
    ),
    # corpus-stat quality ops: their nested-loop joins are the designed
    # 1-row scalar broadcasts (corpus total / percentile bounds), so no
    # ban; token join must stay hash/broadcast and scans stay narrow
    "q_text_ulm": dict(
        max_exchanges=4, joins=["BroadcastHashJoin"], max_scan_cols=2,
    ),
    "q_winsorize": dict(max_exchanges=2, max_scan_cols=2),
    # exact-count stratified sample: one rank-window shuffle, 3-col scan
    "q_sample_fixed_n": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=3),
    # ------------------------------------------------------------------
    # r6: full-surface gating — ceilings taken from the executed-plan
    # audit (tools/explain_all.py, sf0.001) so every registry key with a
    # batch plan is pinned.  Streaming drain twins (q_stream_window,
    # q_stream_sessionize, q_stream_dedup, q_stream_join, q_stream_cdc,
    # q_stream_stateful, q_stream_convert)
    # are excluded: the registry callable returns a
    # batch read of the drained memory sink, so its "plan" is a local
    # table scan with nothing to gate; their plan properties are pinned
    # by the batch twins they share transformations with.
    #
    # expression-only projections: zero shuffles, pruned scans
    "q_cast_types": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=4),
    "q_scalar_dates": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    "q_scalar_funcs": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=6),
    "q_nullify_empty": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=3),
    "q_null_handling": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=3),
    "q_json_extract": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    "q_array_slice": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    "q_unpivot": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=3),
    "q_text_quality": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    "q_text_tokens": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    "q_text_fingerprint": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    "q_multimodal_cols": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    # top-k must stay TakeOrderedAndProject (zero Exchange), never a
    # global sort
    "q_topk": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=3),
    # single-shuffle aggregations / windows
    "q_partition_key": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=2),
    "q_agg_stats": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=4),
    "q_partition_rollup": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=3),
    "q_conditional_agg": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=4),
    "q_agg_having": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=2),
    "q_window_ntile": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=3),
    "q_window_analytic": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=4),
    "q_window_range": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=3),
    "q_grouping_sets": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=3),
    "q_agg_median": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=2),
    "q_histogram": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=1),
    "q_rollup": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=3),
    "q_cube": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=3),
    "q_text_langid": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=2),
    "q_text_wordcount": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=1),
    "q_text_ngram": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=1),
    "q_dedup_fingerprint": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=3),
    "q_dedup_latest": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=4),
    "q_split_train_test": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=1),
    "q_text_stats": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=3),
    "q_events_sliding": dict(max_exchanges=1, ban_bnlj=True, pushed=True, max_scan_cols=2),
    "q_embed_centroid": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=1),
    "q_asof_join": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=3),
    # two-shuffle shapes (partial+final distinct, pivot, profile)
    "q_string_agg": dict(max_exchanges=2, ban_bnlj=True, max_scan_cols=2),
    "q_agg_distinct": dict(max_exchanges=2, ban_bnlj=True, max_scan_cols=2),
    "q_agg_approx": dict(max_exchanges=2, ban_bnlj=True, max_scan_cols=3),
    "q_pivot": dict(max_exchanges=2, ban_bnlj=True, max_scan_cols=3),
    "q_profile_table": dict(max_exchanges=2, ban_bnlj=True, max_scan_cols=4),
    # join shapes: dims broadcast, fact shuffles at most into final agg
    "q_filter_compound": dict(
        max_exchanges=1, joins=["BroadcastHashJoin"], pushed=True,
        ban_bnlj=True, max_scan_cols=3,
    ),
    "q_exists_nonequi": dict(
        max_exchanges=1, joins=["BroadcastHashJoin"], pushed=True,
        ban_bnlj=True, max_scan_cols=3,
    ),
    "q_distribution": dict(
        max_exchanges=2, joins=["BroadcastHashJoin"], pushed=True,
        ban_bnlj=True, max_scan_cols=2,
    ),
    "q_resample_ffill": dict(
        max_exchanges=2, joins=["BroadcastHashJoin"], pushed=True,
        ban_bnlj=True, max_scan_cols=4,
    ),
    "q_set_ops": dict(
        max_exchanges=4, joins=["BroadcastHashJoin"], ban_bnlj=True,
        max_scan_cols=1,
    ),
    # designed scalar/bounded-N nested-loop shapes — BNLJ is the
    # intended plan (1-row global broadcast, bounded candidate set, or
    # C-row model broadcast), so no ban; exchange ceilings still pin
    # against growth
    "q_scalar_subquery_global": dict(max_exchanges=2, pushed=True, max_scan_cols=2),
    "q_text_levenshtein": dict(max_exchanges=0, pushed=True, max_scan_cols=2),
    "q_sim_knn": dict(max_exchanges=1, pushed=True, max_scan_cols=2),
    "q_sim_threshold": dict(max_exchanges=0, pushed=True, max_scan_cols=2),
    "q_dedup_jaccard": dict(max_exchanges=0, pushed=True, max_scan_cols=2),
    "q_cluster_kmeans": dict(max_exchanges=3, max_scan_cols=1),
    # simhash self-validating row: band buckets + the seq-dup exact leg
    # + pigeonhole-recall legs union into one wide plan — 14 exchanges
    # over ~2-col scans; the ceiling pins it against iteration growth
    "q_dedup_simhash": dict(max_exchanges=14, max_scan_cols=2),
    # r6: BM25 retrieval — postings-only shuffles (tf agg, |Q|-row df
    # agg, per-doc score agg) + TakeOrdered; its nested-loop join is the
    # designed 1-row corpus-stats broadcast, so no ban; df join stays
    # broadcast-hash
    "q_text_bm25": dict(
        max_exchanges=5, joins=["BroadcastHashJoin"], max_scan_cols=2,
    ),
    # r6: table diff is ONE full-outer sort-merge join on the key (both
    # sides shuffle once, co-partitioned) — a BNLJ here would be the
    # 100 TB disaster, so it is banned
    "q_table_diff": dict(
        max_exchanges=2, joins=["SortMergeJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=3,
    ),
    # corpus drift: two token-count aggs + token-keyed full-outer +
    # global sum; its nested-loop join is the designed 1-row totals
    # broadcast, so no ban
    "q_corpus_drift": dict(
        max_exchanges=6, joins=["SortMergeJoin"], pushed=True,
        max_scan_cols=2,
    ),
    # robust z-score: two 1-row percentile broadcasts (the BNLJs) +
    # TakeOrderedAndProject top-k — the fact never shuffles
    "q_zscore_robust": dict(max_exchanges=2, max_scan_cols=2),
    # PII redaction is pure chained regexp_replace: zero shuffles
    "q_text_pii": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    # char entropy is an expression; the one Exchange is the report agg
    "q_text_entropy": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=2),
    # global line dedup: line-keyed window + doc-keyed reassembly, then
    # the spine join — a nested-loop here would be the 100 TB disaster
    "q_dedup_lines": dict(max_exchanges=2, ban_bnlj=True, max_scan_cols=2),
    # TPC-H shapes (r6): supplier-keyed agg + 1-row max + dim broadcast
    "q_top_revenue_supplier": dict(
        max_exchanges=3, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=4,
    ),
    # Q18: orderkey agg HAVING-pruned before the join; customer broadcast
    "q_large_orders": dict(
        max_exchanges=2, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=4,
    ),
    # Q14: part broadcast, single 1-row agg Exchange
    "q_promo_ratio": dict(
        max_exchanges=1, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=4,
    ),
    # Q21 analog: one orderkey agg + tiny supplier count + broadcast
    "q_single_fault_supplier": dict(
        max_exchanges=3, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=3,
    ),
    # quantile binning: the BNLJ is the designed 1-row edge-array
    # broadcast; exchanges = edge agg + report agg, fact never shuffles
    "q_quantile_bins": dict(max_exchanges=2, max_scan_cols=2),
    # skew report: key agg + 1-row mean broadcast (the BNLJ) + top-k
    "q_skew_report": dict(max_exchanges=3, max_scan_cols=1),
    # validation suite: one agg pass (partial+final) for all row-level
    # checks + the broadcast anti-join FK leg + the report union
    "q_quality_checks": dict(
        max_exchanges=4, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=4,
    ),
    # funnel: every stage joins/aggs on the SAME id key — Exchange
    # reuse collapses it to one shuffle per side; a per-user sort or
    # history array would be the unscalable alternative
    "q_funnel": dict(
        max_exchanges=2, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=3,
    ),
    # retention: cohort agg + co-partitioned join back + matrix
    # count-distinct + sizes join
    "q_retention": dict(
        max_exchanges=5, joins=["BroadcastHashJoin"], ban_bnlj=True,
        max_scan_cols=2,
    ),
    # grouped winsorize: per-group bounds agg broadcast back (never a
    # full-partition window buffer) + report agg
    "q_winsorize_grouped": dict(
        max_exchanges=2, joins=["BroadcastHashJoin"], ban_bnlj=True,
        max_scan_cols=2,
    ),
    # embedding standardization: the BNLJ is the designed 1-row
    # stat-array broadcast; stats agg + repack agg, map-side zip_with
    "q_embed_standardize": dict(max_exchanges=2, max_scan_cols=2),
    # nearest as-of: ONE union shuffle, two window sorts over the same
    # Exchange — a range join here would be the 100 TB disaster
    "q_asof_nearest": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=3),
    # multimodal decode: zero-shuffle mapInPandas over a pruned scan
    "q_multimodal_decode": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    # TPC-H Q6: one pushed-filter scan into a 1-row agg
    "q_forecast_revenue": dict(
        max_exchanges=1, ban_bnlj=True, pushed=True, max_scan_cols=4,
    ),
    # TPC-H Q12: orders broadcast, one small agg
    "q_shipmode_priority": dict(
        max_exchanges=1, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=3,
    ),
    # TPC-H Q9: all dims broadcast, fact scan pruned to the 6 measure/
    # key columns (an unselected fact leaked a 17-col scan — pinned)
    "q_profit_by_nation": dict(
        max_exchanges=1, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=6,
    ),
    # TPC-H Q2: per-part min agg + argmin join-back (co-partitioned),
    # supplier broadcast, TakeOrdered top-100
    "q_min_price_supplier": dict(
        max_exchanges=2, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=3,
    ),
    # r6 late batch.  Q8: six dims broadcast, date pushdown, the only
    # shuffle is the year agg (at scale the lineitem-orders fact join
    # adds its pair — ceiling leaves room without allowing plan rot).
    "q_market_share": dict(
        max_exchanges=3, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=5,
    ),
    # Q11: per-part agg + re-agg; the nested-loop join is the designed
    # 1-row global-total broadcast (q_text_tfidf precedent)
    "q_important_parts": dict(max_exchanges=3, max_scan_cols=3),
    # Q20: PROMO dim broadcast into the scan join, pair agg + per-part
    # window + distinct; the dominant-supplier list broadcasts into the
    # semi join
    "q_excess_suppliers": dict(
        max_exchanges=5, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True, max_scan_cols=4,
    ),
    # hybrid RRF: BM25 leg's 1-row stats cross join is the designed
    # scalar broadcast; fusion itself is candidate-list sized
    "q_hybrid_rrf": dict(max_exchanges=6, joins=["BroadcastHashJoin"], max_scan_cols=2),
    # mixture rebalance: counts agg + 1-row capacity broadcast (the
    # nested-loop join) + broadcast rate join, map-side md5 filter
    "q_mixture_rebalance": dict(
        max_exchanges=5, joins=["BroadcastHashJoin"], pushed=True, max_scan_cols=2,
    ),
    # bounded-window EWMA: one user-key shuffle, no join, no UDF
    "q_ewma": dict(max_exchanges=1, ban_bnlj=True, max_scan_cols=4),
    # OLS trend: daily agg + per-type regression agg
    "q_trend_fit": dict(max_exchanges=2, ban_bnlj=True, max_scan_cols=3),
    # Markov transitions: user window + pair count agg
    "q_transition_matrix": dict(max_exchanges=2, ban_bnlj=True, max_scan_cols=4),
    # readability: expression-only, zero shuffle
    "q_text_readability": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    # ------------------------------------------------------------------
    # r14 keys
    # batched knn shuffle arm: the query<->codes join must stay an
    # EQUI-join (hash family; AQE broadcasts the exploded side at this
    # scale, SMJ/shuffled-hash at real scale) — the BNLJ in the plan is
    # the one-row parameter-table cross join, so no blanket ban (the
    # arm-specific no-array_contains-BNLJ gate lives in
    # tests/test_quantization.py); 2 exchanges: the exploded-query
    # repartition + the per-query top-k window
    "q_knn_join_shuffle": dict(
        max_exchanges=2, joins=["BroadcastHashJoin"], max_scan_cols=2,
    ),
    # incremental IVF append probe at nprobe=C: partition-pruned index
    # scan + global top-k (TakeOrderedAndProject) — zero shuffles
    "q_sim_ivf_append": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=2),
    # published-index probe: same ADC top-k shape as q_sim_ivfpq (the
    # BNLJ is the one-row LUT parameter-table cross join); the publish
    # layer adds no plan nodes — readers just resolve a path first
    "q_publish_index": dict(max_exchanges=0, max_scan_cols=2),
    # spark-side prune arm: the RETURNED scan is identical in shape to
    # q_scan_skipping's (the prune jobs run before the plan exists)
    "q_scan_prune_spark": dict(max_exchanges=0, ban_bnlj=True, max_scan_cols=3),
    # ------------------------------------------------------------------
    # r15 keys
    # post-append recall gate: brute kNN (query broadcast, window) +
    # IVF probe (partition-pruned index scan) + three tiny aggregates
    # cross-joined; the BNLJ is the one-row centroid parameter-table
    # cross join (same exception as q_publish_index), the real joins
    # are hash-family.  Pre-AQE ceiling 8 (the hits join and the
    # single-row agg joins plan as SMJ pairs before AQE broadcasts
    # them); the executed audit reads 4 (PLANS.md)
    "q_sim_append_recall": dict(
        max_exchanges=8, joins=["BroadcastHashJoin"], max_scan_cols=2,
    ),
    # snapshot reader: two pinned component scans, per-lang agg + a
    # broadcastable join of two tiny aggregates — no wide scan, no BNLJ
    "q_snapshot_publish": dict(
        max_exchanges=2,
        joins=["BroadcastHashJoin"],
        ban_bnlj=True,
        max_scan_cols=2,
    ),
    # ------------------------------------------------------------------
    # r16 keys
    # pin-aware vacuum reader: two count aggregates over pinned/current
    # published scans (1 exchange each), cross-joined as one-row frames
    # — the BNLJ is that one-row parameter-table cross join (the
    # q_publish_index exception); count(1) prunes the scans to ZERO
    # columns (scan_cols=[] — no max_scan_cols golden: the gate's
    # assert requires a non-empty ReadSchema list)
    "q_snapshot_vacuum": dict(max_exchanges=2),
    # incremental-rollup reader: a plain scan of the pointer-resolved
    # published rollup (|groups| rows) + the ordering sort — the merge
    # shuffles happened at refresh time, the read pays none of them
    # (scan_cols=[] on the executed audit: no max_scan_cols golden)
    "q_incr_rollup": dict(max_exchanges=1, ban_bnlj=True),
    # streaming snapshot reader: per-lang agg over the pinned corpus
    # component (1 exchange) joined to the pinned counts component
    # (broadcast at this scale; the join-key exchange is the 2nd
    # pre-AQE) — no BNLJ, narrow scans
    "q_stream_snapshot": dict(
        max_exchanges=2,
        joins=["BroadcastHashJoin"],
        ban_bnlj=True,
        max_scan_cols=2,
    ),
    # ------------------------------------------------------------------
    # r17 keys
    # sketch-measure rollup reader: published-rollup scan (row-local
    # finalize) + the one-shot parity recompute (1 agg exchange) + the
    # rank measurement (broadcast join + 1 agg exchange) + final sort —
    # the refresh-time merge shuffles are not on the read path
    "q_incr_distinct": dict(
        max_exchanges=3, joins=["BroadcastHashJoin"], ban_bnlj=True,
        pushed=True,
    ),
    # retraction-recomputed rollup reader: plain pointer-resolved scan
    # + ordering sort — recompute cost was paid at refresh time
    "q_incr_recompute": dict(max_exchanges=1, ban_bnlj=True),
    # streaming rollup reader: same shape — the micro-batch merges
    # happened in foreachBatch, the read is scan + sort
    "q_stream_rollup": dict(max_exchanges=1, ban_bnlj=True),
    # copy-on-write rollup reader: manifest-resolved union of the
    # referenced partition dirs + ordering sort — refresh wrote only
    # the touched partition, the read pays one Exchange
    "q_incr_cow": dict(max_exchanges=1, ban_bnlj=True),
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_plan_budget(spark, sf_dir, name):
    golden = GOLDEN[name]
    props = plan_props(_QUERIES[name](spark, sf_dir))
    assert props["exchanges"] <= golden["max_exchanges"], (
        f"{name}: plan gained shuffles — {props['exchanges']} Exchanges "
        f"(ceiling {golden['max_exchanges']}); rerun tools/explain_all.py "
        f"and either fix the plan or consciously raise the golden"
    )
    for j in golden.get("joins", []):
        assert j in props["joins"], (
            f"{name}: expected {j} in plan, found {props['joins'] or 'none'}"
        )
    if golden.get("ban_bnlj"):
        assert "BroadcastNestedLoopJoin" not in props["joins"], (
            f"{name}: plan picked up a nested-loop join"
        )
    if golden.get("pushed"):
        assert props["pushed_filters"], f"{name}: filter no longer pushed to scan"
    if "max_scan_cols" in golden:
        assert props["scan_cols"] and max(props["scan_cols"]) <= golden["max_scan_cols"], (
            f"{name}: scan projection widened — {props['scan_cols']}"
        )


def test_ulm_token_table_cached_single_scan(spark, sf_dir):
    """unigram_logprob must persist the exploded token table so the
    text column is scanned+tokenized once (vocab leg + scoring leg both
    read the cache).  The executed plan proves it: InMemoryTableScan
    nodes feed both legs.  (Counting 'Scan parquet' in the plan TEXT is
    misleading — each InMemoryTableScan occurrence re-prints the cached
    relation's definition, parquet scan included.)"""
    df = _QUERIES["q_text_ulm"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "InMemoryTableScan" in plan, (
        "token table no longer cached — the corpus is scanned twice"
    )


def test_ulm_persist_false_skips_cache(spark):
    from spectrify_spark.operators.quality import unigram_logprob

    df = spark.createDataFrame([(1, "a b"), (2, "b c")], "doc_id bigint, text string")
    out = unigram_logprob(df, persist=False)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan.split("== Initial Plan ==")[0]


def test_dedup_spans_pushdown_cache_free(spark, sf_dir):
    """Pushdown gate for q_dedup_spans, asserted in a CACHE-FREE state:
    the operator persists its matched-window set, so when an earlier
    test in the same session has already run it, its scans re-print as
    InMemoryRelation reuse and PushedFilters vanishes from the plan
    text — a false negative, not a lost pushdown (commit cc23480).
    Clearing the cache first restores a parquet-scan plan where the
    property is visible and asserted (the max_exchanges ceiling for
    this key still rides the GOLDEN table)."""
    spark.catalog.clearCache()
    props = plan_props(_QUERIES["q_dedup_spans"](spark, sf_dir))
    assert props["pushed_filters"], (
        "q_dedup_spans: filter no longer pushed to the documents scan"
    )
    assert props["scan_cols"] and max(props["scan_cols"]) <= 2
