"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query executes fully via the `noop` sink (no driver-side collect — the
measurement is plan execution, the same thing a cluster run would pay).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from openmrs_patient_migration_script_spark.plans import QUERIES
from openmrs_patient_migration_script_spark.session import get_spark

HEADLINE = [
    # round-1 core (BENCH_r01 floor: 7.122 s total at sf0.1)
    "etl_registration",
    "agg_group",
    "join_multiway",
    "join_broadcast",
    "win_running",
    "topk_limit",
    "agg_distinct",
    "etl_surrogate_keys",
    "etl_mapping",
    "win_lag_lead",
    # round-2 extension operators
    "sim_cosine_topk",
    "dedup_fuzzy",
    "dedup_minhash",
    "text_tfidf",
    "stream_tumbling",
    "stream_session",
    "join_asof",
    "multimodal_image_features",
    "sample_hash",
    "funnel_events",
    # composed end-to-end training-corpus pipeline (quality → langid →
    # exact dedup → LSH near-dup clusters → split), declared md5-oracle form
    "corpus_prep",
    # round-2 second wave: time series, privacy, global sort, SQL surface
    "ts_resample",
    "etl_pseudonymize",
    "sort_global",
    "sql_scalar_subquery",
    # round-2 third wave: data-quality audit (the big-big FK edge join)
    "dq_referential",
    # round-2 fourth wave: SQL-surface depth + variant decode
    "sql_lateral_topk",
    "json_variant",
    # round-2 fifth wave: binned pure-band join (BNL eliminated) +
    # event-transition matrix (lag window + bounded agg)
    "join_range_binned",
    "events_transitions",
    # round-3: the shuffle-heaviest extension shapes, previously invisible
    # to the headline (a regression there would not have moved any number):
    # 5-shuffle inverted-index jaccard, Expand-plan profiling, GPT-style
    # sequence packing, multi-table LSH ANN, and the now-distributed
    # block-grid embedding dedup
    "dedup_ngram_jaccard",
    "dq_profile",
    "text_pack",
    "sim_ann_lsh",
    "dedup_embedding",
    # round-3 second wave: iterative star-contraction components (the
    # multi-round shuffle loop) and the binned interval-overlap join
    "graph_components_star",
    "join_interval_overlap",
    # round-3 closing wave: the 5-scan/7-exchange PMI collocation miner
    # and the full-event-table window labeling pass
    "text_pmi",
    "events_sessionize",
    # round-4: the at-scale profile twin — dq_profile's exact multi-distinct
    # Expand is the worst measured scaling shape (SCALING.md exp 0.94);
    # benchmarking the HLL form next to it makes the 100 TB swap's payoff a
    # recorded number instead of a docstring claim
    "dq_profile_hll",
    # round-4 second wave: the new iterative (fixed-point pagerank),
    # exact-median (MAD), broadcast-vocab (surprisal), tolerance-asof
    # (conversion attribution) and mapInPandas-fingerprint (image phash)
    # shapes — each a distinct plan family the headline would otherwise
    # not regression-guard
    "graph_pagerank",
    "dq_anomaly_mad",
    "text_surprisal",
    "funnel_conversion_rate",
    "multimodal_phash_pairs",
    # round-4 third wave: the session's new plan families — array-HOF
    # interpolation grid, inverted-index containment (asymmetric dedup),
    # all-int64 sequential folds (CUSUM), single-sort dual-frame nearest
    # asof, integer-ADC product quantization, and the percentile-broadcast
    # winsorize scan
    "ts_interpolate",
    "dedup_containment",
    "ts_cusum",
    "join_asof_nearest",
    "sim_ann_pq",
    "etl_winsorize",
    # round-4 fourth wave: the wedge-midpoint join (link prediction) and
    # the in-task 1-to-N VAD segment fan-out
    "graph_link_prediction",
    "multimodal_vad_segments",
    # round-4 fifth wave (this session): repeat-factor mixing (checkpointed
    # counts), the checkpointed-once RANGE-window decomposition, the
    # two-state sequential fold, per-doc WindowGroupLimit keyword ranking,
    # iterative sync label propagation, and the applyInPandas MMR greedy
    "corpus_mixture",
    "ts_seasonal",
    "ts_holt_linear",
    "text_keywords",
    "graph_label_propagation",
    "sim_mmr_rerank",
    # round-4 sixth wave: the SCD2 lifecycle pair, the residual-predicate
    # attribution join, the decomposition+MAD anomaly chain, the banded
    # audio-fingerprint search, and the slice-digest checksum
    "etl_scd2_build",
    "join_scd2_lookup",
    "events_attribution_linear",
    "ts_anomaly_seasonal",
    "multimodal_audio_pairs",
    "dq_checksum",
    # round-5: the remaining shuffle-heavy shapes with no headline twin —
    # wedge-closure triangle counting and per-node clustering coefficient
    # (the Σdeg² shapes), banded 60-bit simhash pair search, the
    # groups×domain t-closeness audit, and the 3-step windowed
    # sequence-pattern match
    "graph_triangles",
    "graph_clustering_coeff",
    "dedup_simhash_pairs",
    "privacy_t_closeness",
    "events_pattern_match",
    # round-5 second wave: the session's two new dedup plan families —
    # the doc-keyed interval-merge window over the shingle inverted index
    # and the batch×index cross-corpus band join
    "dedup_repeated_spans",
    "dedup_minhash_incremental",
    # round-5 third wave: this session's new plan families — paragraph
    # first-occurrence dedup (reassembly groupBy), blocked Fellegi-Sunter
    # linkage scoring, the bloom-prefiltered semi join, per-cluster
    # SemDeDup (applyInPandas matmul), six-round k-core peeling, and the
    # ticket-explode weighted sample
    "dedup_paragraph",
    "link_fellegi_sunter",
    "join_bloom_semi",
    "dedup_semantic",
    "graph_kcore",
    "sample_weighted",
    # round-5 fourth wave: the bitemporal two-axis lookup, the in-plan
    # generalization-ladder decision, the block-grid k-NN graph, and the
    # sequence-gap lag audit
    "etl_bitemporal_lookup",
    "privacy_generalize_ladder",
    "sim_knn_graph",
    "dq_sequence_gaps",
    "agg_weighted_percentile",
    "dq_migration_certificate",
    "dedup_clusters_incremental",
    # round-6 wave: CMS frequency sketch, sparse tfidf cosine pairs
    # (inverted-index self-join), bounded BFS traversal
    "sketch_count_min",
    "text_cosine_pairs",
    "graph_bfs",
    "agg_spearman",
    "ab_mann_whitney",
    "text_tfidf_incremental",
    "dq_blocking_quality",
    "sim_ann_recall",
    "text_dedup_clusters",
    "sim_pq_recall",
    "graph_degree_dist",
    # round-6 second wave: community/shortest-path graph ops, the exact
    # KS/MI/corr-matrix/CUPED statistics family, Zipf head fit, exact
    # stratified allocation, IVF recall certification
    "graph_modularity",
    "graph_sssp",
    "dq_drift_ks",
    "agg_mutual_info",
    "ab_cuped",
    "text_zipf_fit",
    "agg_corr_matrix",
    "sample_stratified",
    "sim_ivf_recall",
    "ts_holt_winters",
    "multimodal_dedup_clusters",
    "agg_histogram2d",
    "events_markov_stationary",
    # round-7 wave: the two sketch certification audits (exact-vs-HLL
    # profile, production theta/KLL error bounds) — both pay a deliberate
    # exact pass next to the sketch pass, so the bench records the
    # audit's honest cost beside the cheap paths it certifies
    "dq_profile_hll_audit",
    "sketch_error_audit",
    # round-7 second wave: the new plan families — distinct-project semi
    # joins (IND discovery), the bounded-day changepoint window, and the
    # four-stage funnel replaying the full corpus pipeline
    "dq_fk_inference",
    "ts_changepoint",
    "corpus_dedup_funnel",
    # round-7 third wave: the candidate-bounded minhash fidelity audit,
    # the unit-table x200 bootstrap explode, and the k-bounded MMR ledger
    "dedup_minhash_quality",
    "ab_bootstrap_ci",
    "sim_mmr_diversity",
    # round-8 wave: the two heaviest new shapes — the 4-config banding
    # sweep over one shared signature build, and the labels×dims
    # centroid-separation matrix — plus the bounded-day-table pair join
    # (O(days²) on metadata), the cross-grain reconcile join, the
    # vocabulary-growth ladder, and the two-pass boxplot fences
    "dedup_minhash_band_sweep",
    "embed_centroid_separation",
    "ts_theil_sen",
    "dq_header_detail_reconcile",
    "text_heaps_fit",
    "agg_boxplot",
    # round-8 second wave: the decomposition's power-sum certification
    # (pays the full RANGE-window pass + a keyed agg)
    "ts_seasonal_strength",
    # round-8 third wave: the masked matmul scan (hard negatives), the
    # double-matmul truncation certification, the posexplode + two
    # 64-key aggs quantization ledger, the arm-keyed SPRT prefix scan,
    # the multi-distinct Expand, and the day-keyed cross-correlation
    "sim_hard_negatives",
    "embed_matryoshka_eval",
    "embed_quantize_int8",
    "ab_sequential_sprt",
    "dq_candidate_keys",
    "ts_cross_corr",
    # (corpus_curriculum and privacy_k_map share their scan/agg shapes
    # with corpus_prep and privacy_kanon already in the set)
    # round-9: the 3-round unrolled BPE trainer (vocab-sized rounds
    # after one corpus collapse — the heaviest new r9 shape), and the
    # zero-shuffle doc-wide BPE tokenization pass it feeds
    "text_bpe_merge_apply",
    "text_bpe_encode",
    # the per-edge wedge-count shape (k-truss support precursor)
    "graph_edge_support",
    # (graph_components_size_dist shares dedup_clusters' pair-graph +
    # components shape already in the set)
    # round-10: the chained truss ladder (3 linked fixed-round support
    # peels — the heaviest new graph shape; graph_ktruss is its k=4
    # prefix, so only the decomposition benches), the 8-round BPE merge
    # trainer, the LSH-bucketed embedding near-dup scan with planted
    # twins, and the bucket-candidate kNN graph
    "graph_truss_decomposition",
    "text_bpe_train",
    "dedup_embedding_lsh",
    "sim_knn_graph_ann",
    # (sim_knn_graph_recall composes two already-benched graph builds)
    # the (planes, tables) frontier ledger for the kNN ANN path
    "sim_knn_candidate_sweep",
    # round-11: the guarded Louvain passes (local-move gain argmax +
    # contraction + per-pass modularity audit — the heaviest new graph
    # shape; graph_louvain_ledger is its 3-row readout, so only the
    # label table benches), the unigram-LM EM trainer (seed explode +
    # per-round MaxMatch replaces over the vocabulary), the span-removal
    # rewrite (inverted index + (doc,pos) anti-join + reassembly), and
    # the full-grid DP histogram release
    "graph_louvain",
    "text_unigram_train",
    "dedup_span_rewrite",
    "privacy_dp_histogram",
    # (text_unigram_encode shares text_bpe_encode's zero-shuffle doc-wide
    # replace shape; privacy_dp_quantile's windows run on the 22-row
    # grid — no data-sized work beyond privacy_dp_histogram's agg)
]


def run_one(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    names = [n for n in HEADLINE if n in QUERIES]
    # JVM/codegen warmup on the first headline query (not measured)
    run_one(spark, names[0], sf_dir)
    # min of two executions per query: the first pays one-time plan
    # compilation + Python-worker spin-up; the min reflects the plan's
    # steady-state cost, which is what a cluster job repeats thousands of
    # times (single-run local numbers swing +-35% on this box)
    timings = {
        n: round(min(run_one(spark, n, sf_dir) for _ in range(2)), 3) for n in names
    }
    total = round(sum(timings.values()), 3)
    # The driver captures a fixed-size tail of stdout: r5's 85-query map
    # made the single JSON line overflow it -> BENCH_r05 "parsed": null
    # (no machine-readable bench grade that round). The printed line now
    # carries only the total + the top-20 heaviest queries (~1 KB; r12,
    # additions-only: the r11 top-10 line lost two comparable queries to
    # the cutoff purely because they got FASTER, which PERF then read as
    # "dropped" — a wider common set keeps round-over-round comparison
    # honest as queries speed up); the full per-query map goes to
    # bench_detail.json, which the repo tracks so cross-round per-query
    # history stays diffable.
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "queries": timings,
        "sf": sf,
    }
    Path(__file__).resolve().parent.joinpath("bench_detail.json").write_text(
        json.dumps(detail, indent=1) + "\n"
    )
    top20 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "queries": top20,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
