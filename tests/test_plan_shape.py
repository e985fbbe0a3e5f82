"""Plan-shape assertions: the 100 TB-scale properties the queries must
keep — predicate pushdown reaching the parquet scan, column pruning,
broadcast joins for bounded dims, no Python stages on JVM-only paths,
distributed top-k. Regressions here don't change results, they change
whether the plan survives a 1000x scale-up."""

from __future__ import annotations

import pytest

from mapreduce_rs_spark.operators import relational
from mapreduce_rs_spark.operators.text_analysis import word_count
from mapreduce_rs_spark.sources.catalog import load_table, load_tables


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return load_tables(spark, sf_dir)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(tables):
    plan = _plan(relational.filter_project(tables))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "GreaterThan(l_quantity" in plan


def test_column_pruning(tables):
    # 11-column lineitem, 4-column query: ReadSchema must not list the
    # untouched columns (e.g. l_shipdate, l_returnflag).
    plan = _plan(relational.filter_project(tables))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "l_shipdate" not in read_schema[0]
    assert "l_returnflag" not in read_schema[0]


def test_dim_joins_are_broadcast(tables):
    plan = _plan(relational.join_revenue_by_nation(tables))
    assert "BroadcastHashJoin" in plan


def test_topk_is_take_ordered(tables):
    plan = _plan(relational.topk_expensive_orders(tables))
    assert "TakeOrderedAndProject" in plan


def test_wordcount_stays_jvm_side(spark, sf_dir):
    plan = _plan(word_count(load_table(spark, sf_dir, "documents")))
    # No Python evaluation anywhere in the flagship, and the aggregation
    # is the codegen-capable hash aggregate with a map-side partial pass
    # before the shuffle (AQE hides WholeStageCodegen markers until
    # execution, so assert the structural facts instead).
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
    assert "partial_count" in plan
    assert plan.index("partial_count") > plan.index("Exchange hashpartitioning")


def test_q1_partial_aggregation(tables):
    # partial_ aggregate functions before the exchange = map-side combine
    # (the optimization the reference famously lacks, worker.rs:149-161).
    plan = _plan(relational.q1_pricing_summary(tables))
    assert "partial_sum" in plan or "partial_count" in plan


def test_ngrams_has_no_join(spark, sf_dir):
    # Round 1 built n-grams with an (n-1)-way positional self-join —
    # a shuffle join per extra gram over the whole token stream. The
    # narrow sequence+slice slide must keep the plan join-free: the
    # only shuffle is the count groupBy.
    from mapreduce_rs_spark.operators.text_analysis import ngrams

    for n in (2, 3):
        plan = _plan(ngrams(load_table(spark, sf_dir, "documents"), n))
        assert "Join" not in plan, f"n={n} plan regressed to a join"
        # the groupBy shuffle + (locally only) the one-small-file
        # rescue's round-robin spread before the gram expansion — the
        # rescue is a plan-time no-op once the scan has >= cores splits
        assert plan.count("Exchange hashpartitioning") == 1, (
            f"n={n}: expected only the groupBy shuffle"
        )
        assert plan.count("Exchange") <= 2, f"n={n}: unexpected extra shuffle"


def test_jaccard_tokenizes_corpus_once(spark, sf_dir):
    # The distinct-token stream feeds 4+ plan positions (df aggregate,
    # semi-join, both pair sides, sizes); it must be materialized once —
    # the final plan may contain NO parquet scan (round-2 pre-fix: 12).
    from mapreduce_rs_spark.operators.dedup import jaccard_pairs

    plan = _plan(jaccard_pairs(load_table(spark, sf_dir, "documents"), 0.5))
    assert "Scan parquet" not in plan and "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan


def test_tfidf_single_corpus_scan(spark, sf_dir):
    from mapreduce_rs_spark.operators.text_analysis import tfidf_top_terms

    plan = _plan(tfidf_top_terms(load_table(spark, sf_dir, "documents"), 3))
    # counts materialized once; the only parquet scan left is the 1-row
    # corpus-size aggregate.
    assert plan.count("FileScan parquet") <= 1


def test_minhash_lsh_pairs_single_signature_subtree(spark, sf_dir):
    # The banded self-join must join against the MATERIALIZED signature
    # table (localCheckpoint), not re-derive shingles+hashes per side:
    # the plan must contain no parquet scan at all (both sides read the
    # checkpointed RDD) — round 1's plan had two full scan→min-agg trees.
    from mapreduce_rs_spark.operators.dedup import minhash_lsh_pairs

    plan = _plan(minhash_lsh_pairs(load_table(spark, sf_dir, "documents")))
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan


# ---------------------------------------------------------------------------
# Registry-wide scale guards (round-2 VERDICT ask): the 10+ most
# expensive queries must never regress to the round-1 plan diseases —
# cartesian products, re-derived subtrees, shuffle creep. Caps are the
# MEASURED exchange counts at sf0.001 (plans are size-independent at
# these SFs); a refactor that adds a shuffle fails loudly here.
# ---------------------------------------------------------------------------

# name -> (max hash exchanges, max range exchanges)
_SCALE_GUARDS = {
    "wordcount": (1, 1),                  # groupBy + the op-12 total sort
    "q1_pricing_summary": (1, 0),
    "join_revenue_by_nation": (1, 0),     # ALL dims broadcast; agg is the only shuffle
    "window_top_orders_per_customer": (1, 0),
    "dedup_exact": (1, 0),
    "minhash_signatures": (1, 0),
    "knn_bruteforce": (2, 0),             # parallelism spread + top-k window
    # NN-Descent: every heavy stage (seed scoring, per-round candidate
    # join + re-score + top-k) lives inside the per-round materialize()
    # builds; the FINAL plan reads the last checkpoint — zero exchanges
    "nn_descent_knn_graph": (0, 0),
    # recall eval: brute-force ground truth (spread + window) + the
    # hit-intersection join/agg chain — every frame past the corpus
    # scan is bounded by the KMV cap (cap*k rows), so the exchanges
    # move O(cap*k) rows regardless of corpus size
    "nn_descent_recall": (6, 0),
    # serving path: final plan = last beam checkpoint -> self-filter ->
    # one top-k window exchange over cap*beam rows
    "knn_graph_search": (1, 0),
    # ingest maintenance: heavy stages (standing build, per-hop beam
    # scoring) live in materialize() builds; the final plan's exchanges
    # move batch-bounded frames (found = batch*k rows: per-vector and
    # per-batch rollups, reverse-pressure join), the capped-eval leg
    # (cap*N window, the knn_bruteforce shape), and two SinglePartition
    # rollups over the n_batches-row frame; cap leaves AQE room for the
    # worst-edge join (a corpus-row frame) to demote its broadcast
    "knn_graph_ingest": (12, 0),
    # scan -> three chained Arrow stages (encode, decode+resample,
    # stats), all narrow: zero exchanges
    "image_resize_stats": (0, 0),
    # eval-probe explode meets train in a bucket equi-join over the
    # checkpointed corpus frame; at test scale the eval side broadcasts
    # (1 exchange: the per-train agg), but the eval probe frame is
    # O(corpus) under the %10 split, so the cap leaves room for the
    # join to demote to a shuffle at scale (the q5/q13 convention);
    # the top-K report is TakeOrderedAndProject (asserted), not a sort
    "semantic_decontaminate": (3, 0),
    # fixed-eval variant: the eval side is a HARD-capped KMV sample
    # (broadcast-hinted — the capped-query asymmetry), so the per-train
    # agg is the only exchange at ANY scale; measured (1, 0)
    "semantic_decontaminate_fixed": (1, 0),
    "sessionize": (1, 0),                 # ONE exchange serves lag + cumsum + agg
    # native session_window: partial agg -> ONE exchange on user_id ->
    # local sort -> MergingSessions -> final agg; no window functions
    "session_window_stats": (1, 0),
    "tumbling_window": (1, 0),
    "minhash_lsh_pairs": (1, 0),          # banded self-join over the checkpointed sigs
    "jaccard_pairs": (3, 0),              # df agg + pair agg + sizes joins
    "tfidf_top_terms": (2, 0),            # dfs agg + rank window (counts checkpointed)
    "knn_ivf": (3, 0),
    # the swap served: Lloyd rounds live in materialize() builds; the
    # final plan is one narrow corpus pass (broadcast rolled state
    # argmax + enrich), the capped-query broadcast probe join, and the
    # per-query top-k window — measured (2, 0); cap leaves headroom
    # for AQE moving the window's partial
    "knn_ivf_refit": (3, 0),
    # single-pass maintenance: (centroid,pos) partial-agg, per-centroid
    # rollup, final join of the two k-row frames — one corpus scan
    # (the 16x64-dot assignment subtree is never cloned)
    "ivf_index_maintenance": (3, 0),
    # distributed refit: every round's heavy stage (broadcast argmax +
    # the (cid,pos) partial agg) lives inside the per-round materialize
    # builds; the FINAL plan is a narrow projection over the last k-row
    # centroid checkpoint — zero exchanges (the NN-Descent discipline)
    "kmeans_refit_distributed": (0, 0),
    # its quality eval: one pass over the corpus checkpoint with both
    # models riding along (literal init + broadcast rolled refit), one
    # per-refit-cid aggregate — a single exchange moving k rows
    "kmeans_refit_eval": (1, 0),
    # derived-k semdedup: seed + Lloyd rounds live in materialize()
    # builds; the final plan is the bucket-blocked assignment (winner
    # groupBy(vec_id) + fallback anti-join, 2) + the cid-blocked pair
    # join over the assignment checkpoint (broadcasts at test scale —
    # cap leaves AQE room to demote to a cid shuffle at scale: both
    # sides E[cluster]-bounded) + the dropped-ids distinct/left-join
    # (vec_id SMJ, 2) + the per-cid audit agg (1); measured (5, 0) at
    # sf0.001
    "semdedup_derived_k": (7, 0),
    # ingest-audit: two blocked assignments outside materialize()
    # (standing + ingest: winner agg + fallback anti-join each) + the
    # dropped-ids distinct + the decisions left join + the per-cid
    # audit agg; measured (8, 0) at sf0.001
    "semdedup_ingest_audit": (10, 0),
    # its recall harness: the shipped query's exchanges + the exact
    # side's per-q_id window + hit agg + grid-restore join (the exact
    # pair scan itself is the bounded 32-row broadcast nested loop —
    # the knn_bruteforce shape); measured (7, 0) at sf0.001
    "embedding_near_dup_eval": (9, 0),
    # legacy fixed-plane near-dup, demoted contract (r11 verdict #1):
    # bucket self-join over ONE checkpointed frame (broadcasts at gate
    # SF; cap leaves AQE room for both SMJ sides at scale) + the
    # top-cap TakeOrderedAndProject (asserted below — never a global
    # sort, never an unbounded output); measured (0, 0) at sf0.001
    "embedding_near_dup": (2, 0),
    # derived-plane near-dup: per-bucket rep window (1) + the vector x
    # rep bucket join (broadcasts at gate SF — up to 2 SMJ sides at
    # scale) + the per-vec_a top-cap window (1, with the partial
    # WindowGroupLimit below the exchange); measured (2, 0) at sf0.001
    "embedding_near_dup_derived": (4, 0),
    "curation_yield_neardup": (4, 0),
    # round-3 TPC-H battery (measured at sf0.01; the 3-exchange entries
    # are the two SMJ sides of the lineitem⋈orders edge + the final agg —
    # at sf0.01 some of those joins broadcast instead, so the caps leave
    # AQE room to demote broadcasts at scale without tripping):
    "q5_local_supplier_volume": (3, 0),
    "q6_forecast_revenue": (0, 0),        # scan-only: partial→final agg, no shuffle
    "q7_volume_shipping": (3, 0),
    "q8_market_share": (3, 0),
    "q9_profit_by_nation": (2, 0),
    "q10_returned_items": (2, 0),
    "q13_customer_distribution": (3, 0),  # left join may shuffle both sides at scale
    "q15_top_supplier": (2, 0),
    "q17_small_quantity_revenue": (2, 0),
    "q18_large_orders": (2, 0),
    "q21_sole_late_supplier": (3, 0),
    "q22_dormant_customers": (2, 0),
    # round-4: quarter join + distinct late-keys + semi-join + agg (at
    # sf0.01 the quarter side broadcasts; cap leaves AQE demote room)
    "q4_order_priority_checking": (3, 0),
    "q12_priority_by_returnflag": (1, 0),  # orders side broadcasts; one agg
    # join-size sketch: every stage lives in the four materialize()
    # builds (freq aggs, k-row sketches); the assembled plan joins
    # checkpointed frames only — caps leave AQE room for the exact-eval
    # key join to demote its broadcast at scale
    "join_size_estimate": (2, 0),
    # battery completers: q11 is per-part agg + the 1-row total's
    # SinglePartition (uncounted, bounded by construction); q16 is the
    # two-phase count-distinct pair (grid+suppkey, then grid); q20 is
    # the (supp,part) agg + the qualifying-supplier distinct
    "q11_important_stock": (2, 0),
    "q16_supplier_part_types": (2, 0),
    "q20_surplus_suppliers": (2, 0),
    # closed-form OLS: five distributive sums, ONE user_id exchange
    "user_value_trend": (1, 0),
    # fourth-session additions: benford is ONE 9-key agg exchange (the
    # grand total rides a SinglePartition window over the 9-row counts
    # frame — uncounted, bounded by construction — NOT a second agg
    # that would re-scan orders); transitions are the lag exchange on
    # user_id + the |types|^2 pair agg + the row-total window on
    # prev_type (both post-agg exchanges move tiny keyspaces)
    "benford_digit_audit": (1, 0),
    "event_transition_matrix": (3, 0),
    # graph multi-join over the materialized edge/degree frames: pair
    # agg + degree agg + wedge-join sides + anti-join + two deg joins —
    # every one an equi-join on a bounded frame; cap leaves AQE room
    "link_prediction_scores": (10, 0),
    # ONE fact join exchange pair + the 25-key agg; nation broadcasts,
    # global sums ride the SinglePartition window (uncounted)
    "target_encoding_nations": (3, 0),
    # ONE user_id exchange serves both the recency-rank window and the
    # per-user agg (the sessionize shape)
    "ewma_value": (1, 0),
    # dim-key agg; the two count-distincts make it two-phase
    "feature_hashing_stats": (3, 0),  # +1: local-only one-small-file rescue (r07)
    # (layout, file) agg + 3-key layout rollup; bounds broadcast
    "zone_map_pruning": (2, 0),
    # pure narrow mapInPandas window fan-out — NO shuffle at all
    "wav_frame_features": (0, 0),
    # df-capped shingle equi-join: pair agg + sizes agg + df agg over
    # the checkpointed shingle stream
    "ngram_containment_pairs": (3, 0),
    # per-key freq aggs live in materialize() builds; assembled plan
    # joins 1-row frames (cap leaves room for one visible agg)
    "key_skew_profile": (1, 0),
    # every LPA round lives in a materialize() build; the assembled
    # plan projects the final checkpointed label frame
    "label_propagation_communities": (1, 0),
    # two rank-window passes on event_type + the median agg; the
    # med/mad frames broadcast back (|types| rows)
    "robust_value_anomalies": (4, 0),
    # two tier probes (each bounded by the KMV sample) + fusion agg +
    # fused-rank window over (n_queries·k)-row frames
    "ann_rank_fusion": (4, 0),
    # (type, hour) agg + the 24-row-per-type totals window
    "seasonality_profile": (2, 0),
    # hourly pre-agg + the RANGE trailing window over bucket series
    "burst_hours": (2, 0),
    # prefix equi-join + verify join + sizes agg over the checkpointed
    # rarity-ranked shingle stream
    "prefix_filter_jaccard_pairs": (3, 0),
    # ONE scan per table, all rules as conditional sums in a single
    # agg, stack unpivot — no shuffle at all (4 SinglePartition aggs)
    "dq_rule_violations": (0, 0),
    # ONE user_id range-frame window (per-leg subtree re-use costs the
    # union duplicates at test scale; each leg is window + tiny agg)
    "multitouch_attribution": (4, 0),
    # user_id lag exchange + |types|-key agg
    "inter_event_gaps": (2, 0),
    # distinct projection + chained order-key triple join + triple agg
    "frequent_triples": (4, 0),
    # (label, dim) agg + label/global collect aggs + counts; every
    # post-explode frame is |labels|·dim integers
    "label_centroid_drift": (8, 0),
    # ONE b-key replicate agg (the ×b expansion is narrow; partial
    # aggs collapse it map-side); rank window runs on b rows
    "bootstrap_ci_mean": (1, 0),
    # user_id lookahead window + day agg
    "abandoned_clicks": (2, 0),
    # week agg; the lag rides a SinglePartition window over weeks
    "weekly_growth": (1, 0),
    # ONE returnflag exchange serves the sort window, the cumsum, and
    # the first-crossing rank
    "weighted_median_price": (1, 0),
    # (type, bucket) agg + the per-type share window
    "log2_value_histogram": (2, 0),
    # narrow marker scoring + (actual, pred) agg + row-share window
    "language_id_confusion": (2, 0),
    # vocab head agg (TakeOrdered) + per-doc agg; vocab broadcasts
    "oov_rate_scores": (2, 0),
    # ONE domain-keyed agg (count-distincts ride the same shuffle)
    "domain_stats": (2, 0),
    # DSIR: (doc_id,bucket) tf agg + 512-row bucket agg + per-doc sum;
    # the bucket model broadcasts back, raw grams never re-shuffle
    "dsir_importance_weights": (3, 0),
    # gaps-and-islands: ONE user_id exchange serves BOTH row_number
    # windows AND the (user,type,island) aggregate (partitioning on a
    # subset of the group keys satisfies the clustered distribution)
    "state_intervals": (1, 0),
    # blocked ER: gram distincts + df agg + rarest-K window + the
    # pinned-N (dirty_id, n_block) repartition (r07 — keeps the 53M-row
    # expand→vote→verify chain off AQE's coalesce-to-one-task path) +
    # the ids-only 2-of-K agreement vote (replaces the wide pair
    # distinct) + winner window — every exchange keyed on gram/dirty_id
    # over dim-sized data; per-record df-capped blocking bounds the
    # vote at |dirty|·k·cap rows (narrow), and Levenshtein runs only on
    # agreeing candidates, never |dirty|x|clean|
    "entity_match_customers": (7, 0),
    # MERGE upsert: both sides of ONE full-outer hash-partition on the
    # merge key + the 3-row audit agg (source derives from the target
    # scan, so its exchange is the second of the pair)
    "orders_merge_upsert": (3, 0),
    # ann_recall composes the exact + 4 approximate knn pipelines into
    # one evaluation plan; all over the HARD-BOUNDED KMV query sample
    # (N_QUERIES_CAP TakeOrdered rows) and k·n_queries candidate sets —
    # never the corpus.
    "ann_recall": (21, 0),  # +1 for the round-4 pca leg's top-k window
    # MRR/NDCG harness: three index legs (lsh/ivf/pca) + exact, each a
    # scoring join + top-k window over the bounded query sample, then
    # the metric aggregation — every exchange is methods x queries x k
    "ann_ranking_metrics": (18, 0),
    "corpus_profile": (1, 0),             # one partial→final (multi-distinct) agg
    "latest_event_state": (2, 0),         # user_id window + tiny by-state agg
    # broadcast-semi probe against the eval shingle set + distinct +
    # two per-lang count aggs; training text never shuffles.
    "decontaminate": (4, 0),
    # round-4 pipeline signals: token agg chain + bigram agg chain (two
    # partial→final pairs) joined back on doc_id
    "repetition_signals": (4, 0),
    # gram-dfreq agg + one flagged gram-stream agg + the spine join
    "boilerplate_ngrams": (3, 0),
    # one partial→final agg to the (lang, source) grain; the window
    # sums run on a SinglePartition exchange of that tiny aggregate
    "mixture_weights": (1, 0),
    # centroid-blocked pair join + distinct + per-cluster agg, all over
    # the checkpointed assignment table (no parquet rescan)
    "semdedup": (3, 0),
    # capstone v3: curated-gate window + repetition chain (2) + gram
    # dfreq/flagged aggs (2) + doc_id gate joins + two yield aggs —
    # every exchange on doc_id/lang/gram keys, never a wide row
    "curation_yield_signals": (8, 0),
    # pure narrow sequence+slice chunker: zero shuffles, zero joins
    "chunk_documents": (1, 0),  # the local-only one-small-file rescue (r07); narrow otherwise
    # Arrow-batched synthesize->decode stages: strictly narrow, the
    # whole point of mapInPandas for megabyte payloads
    "png_decode_stats": (0, 0),
    "bmp_decode_stats": (0, 0),
    "jpeg_decode_stats": (0, 0),
    "wav_decode_stats": (0, 0),
    "gif_frame_stats": (0, 0),
    "video_frame_sample": (0, 0),
    # both codec branches union into ONE Arrow stage; the only exchange
    # is the 2-row per-modality aggregate
    "multimodal_features": (1, 0),
    # cluster-hashed splits: post-CC plan is the docs⋈labels join +
    # count-distinct double agg; the iterative CC rounds checkpoint out
    "leakage_safe_splits": (4, 0),
    # cutpoint-broadcast RFM: the customer-grain aggregate materializes
    # once (no rescan), cuts broadcast back, the only live exchange is
    # the 125-cell segment agg — no global ntile sort anywhere
    "rfm_segments": (1, 0),
    # PII scrub: narrow plant+detect+redact expressions over the scan;
    # the per-language aggregate is the only exchange
    "pii_scrub_stats": (1, 0),
    # ingest dedup: fingerprint projections + corpus distinct + batch
    # winners agg + the two admission joins + final lang agg — all
    # keyed on the 16-byte fingerprint, never document text
    "incremental_ingest_dedup": (7, 0),
    # near-dup admission cascade: the signature builds AND the stage-1..3
    # ledger are checkpointed once each (without the ledger checkpoint
    # Catalyst cloned the fingerprint chain into 14 scans / 42 md5
    # sites), so the FINAL plan is just the within-batch band probe +
    # the accounting joins over checkpointed inputs
    "incremental_ingest_neardup": (3, 0),
    # S-curve calibration: sample + originals∪variants both checkpointed
    # at build (0 scans in the final plan); the two exchanges are the
    # shingle-size/intersection aggregates over O(cap·grades) rows
    "lsh_scurve_calibration": (2, 0),
    # bloom runtime-filter harness: the PROBE is a pure narrow
    # expression on the orders scan (no join/shuffle below it — the
    # property a runtime filter needs); exchanges are the dim distinct
    # + final agg, truth join broadcasts.
    "bloom_prefilter_stats": (2, 0),
    # degree-ordered triangles: deg agg + deg-annotation joins + wedge
    # join + closure join + role agg, every one an equi-exchange on a
    # node/edge key over the two checkpointed tables (never a wide row,
    # never a cartesian); measured 13 at sf0.001 with SMJ on all joins —
    # at real scale AQE may broadcast the deg side, only lowering it.
    "triangle_counts": (13, 0),
    # round-3 batch 2:
    # pagerank's visible plan is the post-loop fragment (each iteration
    # localCheckpoints, truncating lineage by design — the per-round
    # plan is 1 broadcast join + 1 integer groupBy); what remains must
    # be only the broadcast nation-name join.
    "pagerank_trade_flows": (0, 0),
    # gram agg + unigram agg + marginal joins (broadcast at test scale;
    # cap leaves room for AQE to demote them to shuffles at 100 TB)
    "bigram_pmi": (6, 0),
    # 3x the distinct (order,part) projection (materialize-once at real
    # scale, see docstring) + pair agg + 2 freq aggs + total distinct
    "copurchase_pairs": (9, 0),
    # distinct points + bucket repartition; the global phase is a
    # SinglePartition exchange over bucket survivors (not counted here,
    # bounded by construction)
    "skyline_parts": (2, 0),
    # one user_id exchange serves window + per-user path agg; one more
    # for the path->count agg over one short string per user
    "event_paths": (2, 0),
    # single user_id exchange serves the moment windows AND the per-row
    # score — no join-back
    "value_anomalies": (1, 0),
    # one user_id exchange: lead window + per-user agg share it
    "time_weighted_value": (1, 0),
    # narrow encode + posexplode, then the 64-key agg; plus the
    # ensure_parallelism spread of the single-file scan
    "pq_code_histogram": (2, 0),
    # broadcast query LUTs over the code table + top-k window
    "knn_pq": (2, 0),
    # IVF-PQ composed tier: same two exchanges (parallelism spread +
    # top-k window); candidates come from the query's inverted list
    # via the broadcast equi-join, the corpus ships only codes
    "knn_ivfpq": (2, 0),
    # PCA tier: same knn_bruteforce shape — parallelism spread + top-k
    # window; the projection is a narrow literal-dot bank, no shuffle
    "knn_pca": (2, 0),
    # pair agg + unigram agg + marginal joins (broadcast at test scale)
    "skipgram_pmi": (6, 0),
    # the count-BIN table (d bins, d <= sqrt(2·total_tokens) — the r05
    # verdict's vocab-window fix) materializes once (word agg + bin agg
    # live in the checkpoint build); the visible plan is the bounded
    # SinglePartition cumsum window + broadcast total + 4-row target agg
    "vocab_coverage": (0, 0),
    # per-lang token agg + the (lang, source) result agg; lang_tok and
    # the 1-row totals broadcast back onto the doc stream
    "mixture_sample": (3, 0),
    # 1-row bounds broadcast onto the scan; the layout union aggregates
    # (two partial->final pairs) + the per-layout summary
    "zorder_locality": (3, 0),
    # one (lang, word) conditional agg + the lang windows (totals,
    # vocab, rank) all on one lang repartition
    "term_drift": (2, 0),
    # evaluation harness composing truth (shingle join over the bounded
    # 10% sample) + the LSH pipeline + 3 count aggregates — the
    # ann_recall pattern for the dedup family
    "lsh_dedup_eval": (12, 0),  # +1: local-only one-small-file rescue (r07)
    # one (hour, type) exchange; exact percentile sorts within groups
    "hourly_percentile_bands": (1, 0),
    # word-count agg + pair agg; the top-k window runs SinglePartition
    # over the pair alphabet (provably small), like vocab_coverage
    "bpe_merge_candidates": (2, 0),
    # tf agg + vocab regroup + per-doc sum; the checkpointed tf table
    # feeds both consumers (zero parquet re-scans, asserted informally
    # by the count: 6 exchanges before materialization)
    "unigram_surprisal_scores": (3, 0),
    # bigram LM: pair-tf and unigram tables both materialized (their
    # builds carry the corpus stages); the visible exchanges are the
    # pair-keyed model join side + the per-doc integer sum
    "bigram_surprisal_scores": (2, 0),
    # CDC chunking: narrow per-row boundary/slice expressions; shuffles
    # are fp distinct-doc agg + the join-back + per-doc rollup
    "cdc_chunk_dedup": (3, 0),
    # one (bucket, event_type) exchange: both row_number windows and
    # the OHLC aggregation share the partitioning
    "ohlc_bars": (1, 0),
    # HLL: (type,bucket) register agg + type-level sums + the exact
    # countDistinct pair (kept for evaluation; production ships
    # registers only) — at most types×64 rows ever cross an exchange
    # past the first partial agg
    "hll_distinct_users": (4, 0),
    # HLL rollup-merge: the PRODUCTION path is 1 scan + day-register
    # agg + week merge + estimate (registers only past the first
    # partial agg); the direct-from-raw week registers and the exact
    # countDistinct are the EVALUATION twins the oracle hash needs
    # (2 extra scans + 4 exchanges, dropped at 100 TB — docstring)
    "hll_rollup_merge": (7, 0),
    # BPE encode: the merge rounds checkpoint out (vocabulary-sized);
    # the visible plan is ONE parquet scan -> token stream -> broadcast
    # join with the encoded vocabulary -> per-doc agg (the 1 exchange).
    # Document text is never re-tokenized per merge round.
    "bpe_encode_stats": (1, 0),
    # BFS: every round materializes (pagerank discipline) — the visible
    # post-loop plan is the checkpointed label table alone; per-round
    # plans are one frontier equi-join + one label-sized min agg
    "bfs_hops": (0, 0),
    # ES weighted sampling: narrow score projection + TakeOrdered top-k
    # (cap-row heap per partition, O(k) driver merge) — no exchange at
    # all; the rank window runs over the k-row result
    "weighted_sample": (0, 0),
    # CMS: the heavy word-count agg checkpoints out (zero parquet
    # re-scans); the visible plan is the vocabulary-sized sketch agg
    # (1 exchange), TakeOrdered truth, broadcast probe join, 80-row min
    "cms_word_counts": (1, 0),
    # alpha-sampling: one partial->final agg to the language grain; the
    # window sums run on a SinglePartition exchange of that tiny
    # aggregate (mixture_weights precedent)
    "temperature_mixture": (1, 0),
    # span dedup: gram-hash dfreq agg + the doc_id exchange shared by
    # the islands window and span/doc rollups + the base join-back;
    # flagged positions come back via a left-semi equi-join on the
    # 8-byte hash — never a text self-join
    "duplicate_spans": (4, 0),  # +1: local-only one-small-file rescue (r07)
    # theta sketch: the ONLY event-scale stages (distinct day-user agg,
    # per-day top-k window) are inside the two materialize() builds and
    # never appear in the assembled plan; every counted exchange below
    # operates on sketch-sized data (<= days x k rows) — day-keyed aggs
    # and the consecutive-day pair joins over the checkpointed sketches
    "theta_daily_overlap": (14, 0),
    # fifth-session additions: apportionment = lang agg + dict-sized
    # single-partition windows; compaction = (day,hour) metadata agg +
    # group rollup (the per-day window reuses the first partitioning);
    # snapshot diff = two user_id window branches whose join lines up
    # on the same key (cutoff is a one-row broadcast)
    "token_budget_allocation": (1, 0),
    "compaction_plan": (2, 0),
    "state_snapshot_diff": (2, 0),
    # narrow encode+error expressions; exchanges are the parallelism
    # spread and the (subspace, code) aggregate (PQ_M·PQ_K rows out)
    "pq_reconstruction_error": (2, 0),
    # flag window + membership equi-join + day rollup (real deletion
    # lists broadcast; the derived list here exercises the shuffle path)
    "erasure_plan": (3, 0),
    # user agg → 2-row arm agg → SinglePartition pivot
    "ab_test_conversion": (2, 0),
    # ONE event_type exchange serves sample-window + rank-window +
    # crossing aggs on each branch (explode-crossing form measured at
    # 2 vs 6 for the naive per-quantile union)
    "kmv_quantile_sketch": (2, 0),
    # day-sample window + week re-take window + the direct twin's raw
    # window; quantile legs ride those exchanges (WindowGroupLimit caps
    # per-partition state at k before each one)
    "kmv_quantile_rollup_merge": (3, 0),
    # union-trick as-of: lineitem⋈orders custkey fetch + ONE custkey
    # carry window + maturity agg — replaces the time-range join that
    # would explode on active customers
    "asof_customer_maturity": (3, 0),
    # one (type, bucket) conditional-count agg; type windows + final
    # agg run on the dictionary-sized bucket table
    "value_drift_chi2": (2, 0),
    # privacy pair: one type-count agg + literal CASE noise lookup;
    # one QI-class agg + lang rollup
    "dp_noisy_counts": (1, 0),
    "k_anonymity_audit": (2, 0),
    # query-sized tf/df aggs (term filter lands before any agg) + the
    # final doc-key sum; df/idf legs broadcast
    "bm25_scores": (4, 0),
    # iterative rounds live inside per-round materialize() builds; the
    # assembled plan reads checkpointed frames only (measured 0)
    "weighted_shortest_paths": (0, 0),
    # base/delta/full rollups + the co-keyed compare join
    "rollup_incremental_refresh": (4, 0),
    # SQL text gets the SAME plan discipline as the DataFrame queries:
    # dims broadcast, one agg exchange — that equivalence IS the test
    "sql_text_passthrough": (1, 0),
    # spread + (label,dim) sums + vec-key agg; top-k stays
    # TakeOrderedAndProject (0 range exchanges — the KMV-sample rule)
    "embedding_outliers": (3, 0),
}


def _shape(plan: str) -> tuple[int, int]:
    return (
        plan.count("Exchange hashpartitioning"),
        plan.count("Exchange rangepartitioning"),
    )


@pytest.mark.parametrize("name", sorted(_SCALE_GUARDS))
def test_scale_guard(spark, sf_dir, name):
    from mapreduce_rs_spark.plans.registry import QUERIES

    plan = _plan(QUERIES[name].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    hash_ex, range_ex = _shape(plan)
    max_hash, max_range = _SCALE_GUARDS[name]
    assert hash_ex <= max_hash, f"{name}: {hash_ex} hash exchanges (cap {max_hash})"
    assert range_ex <= max_range, f"{name}: {range_ex} range exchanges (cap {max_range})"


def test_dimension_scans_feed_broadcast_not_shuffle(tables):
    """join_revenue_by_nation's bounded dims must reach the join through
    BroadcastExchange — a shuffle above a dimension scan means the fact
    table is being co-shuffled with a 25-row table at 100 TB."""
    plan = _plan(relational.join_revenue_by_nation(tables))
    assert plan.count("BroadcastExchange") >= 2  # nation + region hints, minimum
    assert "BroadcastHashJoin" in plan
    # the single hash exchange is the 25-row aggregate, nothing else
    assert plan.count("Exchange hashpartitioning") <= 1


def test_scale_guard_negative_control(spark, tables):
    """Prove the guards actually bite: deliberately diseased plans must
    trip the same assertions the real queries pass."""
    nation = tables["nation"]
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bad = nation.crossJoin(nation.select(nation.n_name.alias("b_name")))
        plan = _plan(bad)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    assert "CartesianProduct" in plan  # the guard's first assert would fail

    # shuffle creep: a gratuitous repartition must exceed the q1 cap
    from mapreduce_rs_spark.operators.relational import q1_pricing_summary

    bloated = q1_pricing_summary(
        dict(tables, lineitem=tables["lineitem"].repartition(7, "l_orderkey"))
    )
    hash_ex, _ = _shape(_plan(bloated))
    assert hash_ex > _SCALE_GUARDS["q1_pricing_summary"][0]


def test_runtime_bloom_filter_prunes_selective_fact_join(spark, tables):
    """At 100 TB the shuffle-volume killer on a selective fact-fact join
    is shipping fact rows that the other side will discard. Spark's
    runtime bloom filter (enabled by default in this engine's sessions)
    injects a might_contain(bloom_filter_agg(...)) predicate on the big
    side, built from the selective side at runtime — but only above a
    10 GB application-side scan, so test scale never triggers it. This
    test recreates the 100 TB regime by lowering the thresholds and pins
    that (a) the rewrite fires on a q18-shaped join and (b) values are
    unchanged by the injected filter."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    )
    from pyspark.sql import functions as F

    li, orders = tables["lineitem"], tables["orders"]
    selective = orders.where(F.col("o_orderpriority") == "1-URGENT")
    query = lambda: (  # noqa: E731
        li.join(selective, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    baseline = {tuple(r) for r in query().collect()}

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = query()
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized, "bloom filter not injected"
        assert "bloom_filter_agg" in optimized
        assert {tuple(r) for r in df.collect()} == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


KMV_CONSUMERS = (
    "knn_bruteforce",
    "knn_pca",
    "ann_ranking_metrics",
    "knn_lsh",
    "knn_ivf",
    "knn_ivf_multiprobe",
    "knn_pq",
    "ann_recall",
)


@pytest.mark.parametrize("name", KMV_CONSUMERS)
def test_kmv_query_sample_is_take_ordered(spark, sf_dir, name):
    """The bounded query sample must plan as TakeOrderedAndProject
    (per-partition cap-row heaps, driver merge — O(cap) at any corpus
    size) and NEVER as a global range sort. Round-4 regression this
    pins: stacking projections above orderBy().limit() breaks the
    Limit(Project(Sort)) pattern and silently reintroduces a
    full-corpus shuffle (see similarity._enrich_queries)."""
    from mapreduce_rs_spark.plans.registry import QUERIES

    plan = _plan(QUERIES[name].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_legacy_near_dup_demoted_contract_is_take_ordered(spark, sf_dir):
    """r11 verdict #1: the legacy fixed-plane near-dup's registry
    contract is the top-cap pair list — the plan must bound the output
    with TakeOrderedAndProject (per-partition cap-row heaps, driver
    merge of <= cap rows at ANY corpus size), never a global range
    sort over the ~N^2/64 pair stream (the shape that emitted 51 M
    rows at sf3.0 and killed the verification collect)."""
    from mapreduce_rs_spark.plans.registry import QUERIES

    plan = _plan(QUERIES["embedding_near_dup"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject(limit=1000" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_vocab_coverage_global_window_is_bin_bounded(spark, sf_dir):
    """The r05 verdict's one `weak` grade, pinned fixed: the global
    cumulative-sum window must consume the count-BIN aggregate (d bins,
    d(d+1)/2 <= total_tokens so d <= sqrt(2N)) — never the word-grain
    vocabulary (10^8-10^9 rows at web scale through one partition).
    Structural facts: no row_number ranks the vocabulary; the window's
    input is the MATERIALIZED bin table (Scan ExistingRDD — both
    consumers share one corpus pass), not a word-grain subtree."""
    from mapreduce_rs_spark.operators.text_analysis import vocab_coverage

    plan = _plan(vocab_coverage(load_table(spark, sf_dir, "documents")))
    assert "row_number" not in plan, "vocabulary rank window is back"
    assert "Window" in plan and "Scan ExistingRDD" in plan
    # the corpus subtree lives in the one checkpoint build — the
    # visible plan must not re-scan parquet or re-aggregate words
    assert "FileScan parquet" not in plan
    assert "keys=[word" not in plan


def test_vocab_coverage_min_count_semantics(spark, sf_dir):
    """The enforced web-scale knob: min_count prunes bins from the
    ranked pass while the denominator stays the FULL token stream —
    targets the pruned vocabulary cannot reach drop out rather than
    being computed over a truncated total."""
    import pytest as _pytest

    from mapreduce_rs_spark.operators.text_analysis import vocab_coverage

    docs = load_table(spark, sf_dir, "documents")
    full = {r["target_pct"]: r for r in vocab_coverage(docs).collect()}
    total = next(iter(full.values()))["total_tokens"]
    cut = {r["target_pct"]: r for r in vocab_coverage(docs, min_count=50).collect()}
    assert set(cut) <= set(full)
    for t, r in cut.items():
        assert r["total_tokens"] == total  # full-stream denominator
        # a reachable target's answer is identical to the uncut run:
        # pruning only removes tail bins below every crossing point
        assert r["vocab_size"] == full[t]["vocab_size"]
        assert r["covered_tokens"] == full[t]["covered_tokens"]
    with _pytest.raises(ValueError):
        vocab_coverage(docs, min_count=0)


def test_ivf_maintenance_single_assignment_subtree(spark, sf_dir):
    """ivf_index_maintenance computes membership tallies and coordinate
    sums from ONE posexploded assignment stream — two separate
    aggregates over the assignment would let Catalyst clone the
    16x64-dot scoring subtree (the most expensive narrow stage),
    doubling the corpus scan. Pin: exactly one parquet scan."""
    from mapreduce_rs_spark.plans.registry import QUERIES

    plan = _plan(QUERIES["ivf_index_maintenance"].fn(spark, sf_dir))
    assert plan.count("Scan parquet") == 1, plan
