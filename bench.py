"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (collect) and timed wall-clock.
A warmup pass on the smallest table absorbs JVM/codegen startup so the
numbers measure the plans, not session bootstrap.

The measured pass runs TWICE and each query reports its per-query MIN.
Rationale: on the virtualized bench hosts, first-touch page faults are
slow and serialize per-process (~0.5 GB/s), so whenever the JVM faults
in fresh heap a 5-20 s "storm" lands on whichever query is running —
single-pass timings showed the same query swinging 0.8 s <-> 10.9 s
between runs with an idle machine. The min of two passes is the
standard low-noise estimator of the plan's actual cost; on a quiet
host min-of-2 ~= single-pass, so the number stays comparable with
earlier rounds' single-pass results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from nnanalytics_spark.session import get_spark

HEADLINE = [
    "filter_sum",
    "histogram_sum",
    "histogram2",
    "histogram3_multiagg",
    "time_histogram_monthly",
    "space_histogram",
    "topk_per_group",
    "sessionization",
    "windowed_counts",
    "join_revenue",
    "distinct_count",
    "rollup",
    "cube_agg",
    "median_by_group",
    "json_extract",
    "range_join_bands",
    "salted_join_agg",
    "sql_tpch_q3",
    "sql_tpch_q5",
    "file_type_histogram",
    "subtree_agg",
    "quota_flags",
    "suggestions_per_user",
    "window_running",
    "asof_last_click",
    "dedup_exact",
    "lsh_verified_pairs",  # the dedup headline: bucketed, not all-pairs
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "dedup_clusters",
    "simhash_blocks",
    "embedding_dup_pairs",
    "all_pairs_blocked",  # block-decomposed exact kernel (the 100 TB path)
    "dup_ngram_stats",  # duplicated-span stats under the hot-shingle bound
    "contamination",
    "ann_topk",
    "text_quality",
    "text_fingerprint",
    "term_stats",
    "pii_scrub",
    "ann_batch_topk",
    "pack_sequences",
    "text_repetition",
    "multimodal_decode",
    "token_commonness",
    "lexical_cosine",
    "profile_table",
    # r4: previously-unbenched r3 operators (VERDICT r3 #8) ...
    "video_decode",
    "image_resize_decode",
    "mixture_epochs",
    "key_skew",
    "bucketed_join",
    "sessionization_parity",
    # ... and the operators added/promoted in r4 (fixture-generating
    # roundtrips excluded — they time the fixture writer, not the plan)
    "simhash_pairs",
    "ann_ivf_full",  # includes the one-time index build at this sf
    "minhash_recall",
    "multimodal_feature_hist",
    "ann_lsh_pairs",
    "dedup_span_removal",
    "gopher_quality",
    "dsir_weights",
    "dedup_keep_best",
    "decontaminate",
    "temperature_mixture",
    "fuzzy_dedup_pipeline",
    "incremental_dedup",
    # r4 late additions
    "watermark_window_parity",
    "quality_classifier",
    "stream_static_join_parity",
    "quality_quantile",
    "chunk_documents",
    "approx_quantile_bound",
    "random_projection",
    "semdedup",
    "bigram_lm",
    "cluster_split",
    "hashed_features",
    "count_min_bound",
    "kmeans_refine",
    "source_divergence",
    # r4 final batch: behavior analytics, lexical retrieval, paragraph
    # dedup rewrite, subquery TPC-H shapes (shard/compaction roundtrips
    # excluded — they time fixture writes, not the plan)
    "funnel_steps",
    "retention_cohorts",
    "bm25_topk",
    "paragraph_dedup",
    "sql_tpch_q17",
    "sql_tpch_q18",
    "sql_tpch_q22",
    "sample_k_per_group",
    "inter_event_gaps",
    "two_stage_distinct",
    "referential_integrity",
    "pk_uniqueness",
    "hourly_anomalies",
    "event_transitions",
    "trend_by_group",
    "chi_square",
    "winsorized_stats",
    "ngram_diversity",
    "sql_tpch_q1",
    "sql_tpch_q8",
    "sql_tpch_q10",
    # round-5: the TPC-H tail + new pipeline operators
    "sql_tpch_q2",
    "sql_tpch_q4",
    "sql_tpch_q6",
    "sql_tpch_q7",
    "sql_tpch_q9",
    "sql_tpch_q11",
    "sql_tpch_q12",
    "sql_tpch_q13",
    "sql_tpch_q14",
    "sql_tpch_q15",
    "sql_tpch_q16",
    "sql_tpch_q19",
    "sql_tpch_q20",
    "sql_tpch_q21",
    "budget_fill",
    "matryoshka_eval",
    "tfidf_top_terms",
    "padding_efficiency",
    "dup_matrix",
    "stream_dedup_parity",
    # round-5b: iterative graph + agreement stats + collocations + PQ
    "pagerank_topk",
    "cohens_kappa",
    "token_cooccurrence",
    "pq_report",
    # round-5c: tokenizer/corpus-health + pruned-probe ANN (state/fixture
    # round-trips — quantile_rollup, partition_prune, stream_rollup_parity
    # — excluded: they time parquet state writes, not plans; min-of-2
    # makes ann_ivf_topk measure the pruned search, not the index build)
    "bpe_merge_step",
    "char_entropy",
    "zipf_slope",
    "ann_ivf_topk",
    "edit_distance_pairs",
    "ks_test",
    "stream_stream_join_parity",
    "audio_rms_features",
    "pivot_matrix",
    "resample_hourly",
    "weighted_sample",
    "quantile_normalize",
    "scd2_intervals",
    "triangle_counts",
    "path_ngrams",
    "cooccurrence_lift",
    "growth_accounting",
    "tokenizer_fertility",
    "doc_length_histogram",
    # round-6: corpus-analysis operators + multi-block simhash + KS grid
    # (fsimage_gzip_roundtrip excluded: it times the fixture writer)
    "simhash_pairs_multiblock",
    "ks_test_grid",
    "ngram_novelty",
    "token_burstiness",
    "rouge_overlap",
    "vocabulary_growth",
    "session_entropy",
    "mutual_information",
    "multimodal_features",
    # r6 second batch (snapshot_diff excluded: times the fixture writer)
    "knn_graph",
    "markov_stationary",
    "funnel_conversion_time",
    "dedup_method_agreement",
    "forward_fill",
    "hard_negatives",
    "embedding_dim_stats",
    "embedding_anisotropy",
    "training_order",
    "video_scene_change",
    "stream_locf_parity",
    # r6 third batch
    "containment_pairs",
    "rrf_fusion",
    "mmr_rerank",
    "k_anonymity",
    "l_diversity",
    "seasonal_index",
    "time_decay",
    "zorder_layout",
    "cdc_merge",
    "psi_drift",
    "span_corruption",
    "ann_recall",
    "knn_label_eval",
    "lateness_report",
    "multi_touch",
    "rfm_scores",
    "split_leakage",
    "pit_features",
    "phrase_search",
    "eval_coverage",
    "link_negatives",
    "bloom_prune_join",
    "record_linkage",
    "linkage_decisions",
    "corpus_version_diff",
    "curation_pipeline",
    "classifier_auc",
    "t_closeness",
    "interval_overlap",
    "bootstrap_ci",
    "cuped",
    "conformal_threshold",
    "jackknife_ratio",
    "rake_keywords",
    "capture_recapture",
    "source_ablation",
    "mde_power",
    "msprt_always_valid",
    "bh_fdr",
    "isotonic_calibration",
    "good_turing",
    "tail_index",
    "simpsons_check",
    "negbinom_fit",
    "entropy_rate",
    "quantile_treatment",
    "covariate_balance",
    "gains_curve",
    "autocorrelation",
    "code_detection",
    "holt_forecast",
    "shingle_df_sweep",
    "fingerprint_collisions",
    "aa_test",
    "stream_holt_parity",
    "cluster_cohesion",
    "dedup_review_sample",
    "pii_density",
    "weighted_quantiles",
    "sample_size_grid",
    "mann_kendall",
    "runs_test",
    "dedup_rate_by_length",
    "lsh_plan",
    "token_dedup_savings",
    "lang_confusion",
    "dp_release",
    "minhash_bbit",
    "freshness_half_life",
    "skyline_frontier",
    "ndcg_eval",
    "entity_resolution",
    "prefix_filter_pairs",
    "data_contract",
    "mad_outliers",
    "emd_drift",
    "stream_ewma_parity",
    "gini_concentration",
    "benford_audit",
    "theil_sen_trend",
    "backfill_plan",
    "winnow_pairs",
    "column_entropy",
    "diff_in_diff",
    "km_survival",
    "cusum_drift",
    "srm_check",
    "overdispersion",
    "format_roundtrip",
    "lorenz_deciles",
    "calibration_bins",
    "jaccard_threshold_sweep",
    # r7: production-hash twins (VERDICT r6 #3). The r6 oracle
    # conversions re-pointed minhash_lsh_pairs / lsh_verified_pairs /
    # simhash_blocks at engine-portable hashes (2.2-2.5x slower by
    # design), which silently dropped the xxhash64 production path out
    # of the bench. These rows time the SAME plans in native-hash mode
    # so a regression on the fast path is visible again; the portable
    # rows stay for oracle parity.
    "minhash_lsh_pairs_native",
    "lsh_verified_pairs_native",
    "simhash_blocks_native",
]


def _native_twins() -> dict:
    """Bench-only callables (not queries() entries — their portable
    twins carry the correctness gate; these exist purely to time the
    xxhash64 production path)."""
    from nnanalytics_spark.pipeline import dedup

    t = entry_mod._t

    def minhash_native(spark, sf):
        return dedup.minhash_lsh_pairs(
            t(spark, sf, "documents"), k=32, bands=8, portable=False
        ).orderBy("id_a", "id_b")

    def lsh_verified_native(spark, sf):
        return dedup.lsh_verified_pairs(
            t(spark, sf, "documents"), threshold=0.3, k=32, bands=16, portable=False
        ).orderBy("id_a", "id_b")

    def simhash_native(spark, sf):
        sigs = dedup.simhash_signatures(t(spark, sf, "documents"))
        return dedup.simhash_pairs_from_sigs(
            sigs, max_hamming=2, blocks=3, materialize_sigs=True
        )

    return {
        "minhash_lsh_pairs_native": minhash_native,
        "lsh_verified_pairs_native": lsh_verified_native,
        "simhash_blocks_native": simhash_native,
    }


def _host_probe() -> dict:
    """Measure the two host pathologies that have corrupted bench rounds,
    so every artifact is self-adjudicating (VERDICT r9 #1).

    - ``alloc``: seconds to materialize a fresh ~100 MB buffer
      (first-touch page faults). Healthy ~0.1-0.3 s; during the documented
      fault storms on this host class, 4-35 s — and the cost serializes
      across processes, so Arrow/numpy bench rows inflate 3-28x while
      JVM-heap rows (AlwaysPreTouch) stay ~1x.
    - ``cpu``: a fixed single-core pure-Python loop. Healthy ~0.5-1.0 s;
      CPU steal inflates it roughly uniformly (storms barely move it,
      which is exactly why both numbers are needed to tell the modes
      apart).

    A reader comparing two BENCH artifacts should treat absolute numbers
    from a run whose ``alloc`` probe exceeds ~1 s as storm-priced.

    The buffer is an anonymous ``mmap`` touched one byte per page: unlike
    a heap allocation (whose pages glibc keeps and reuses within the
    process, so a second probe would read healthy mid-storm), every call
    faults fresh kernel pages and returns them on close.
    """
    import mmap

    size = 100 * 1024 * 1024
    t0 = time.perf_counter()
    buf = mmap.mmap(-1, size)
    for off in range(0, size, 4096):
        buf[off] = 1
    alloc = time.perf_counter() - t0
    buf.close()
    t0 = time.perf_counter()
    acc = 0
    for i in range(5_000_000):
        acc += i
    cpu = time.perf_counter() - t0
    return {"alloc": round(alloc, 2), "cpu": round(cpu, 2)}


def _release_cached(spark) -> None:
    """Drop cached/localCheckpoint RDD blocks left by iterative queries so
    one query's retained storage can't inflate the next one's GC time.

    py4j exposes the Java map's values() as a Python ValuesView (it
    implements the collections ABCs), so iterate it directly — the old
    `.values().iterator()` raised AttributeError into the swallow-all
    except and every checkpointed block silently survived the release,
    accumulating across all ~520 timed runs of a full bench session."""
    spark.catalog.clearCache()
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
    except Exception:
        pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    probe_pre = _host_probe()
    spark = get_spark("bench")

    queries = {**entry_mod.queries(), **_native_twins()}
    # Warmup: run EVERY headline query once at the smallest scale factor
    # so each measured number reflects the plan, not first-hit JVM/codegen
    # JIT (complex shapes — 64-aggregate simhash, iterative clustering —
    # pay multi-second one-shot JIT otherwise). Falls back to the measured
    # dir when sf0.001 isn't present; parquet page-cache warming at a
    # different sf dir is nil.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        try:
            queries[name](spark, warm_dir).collect()
        except Exception:
            pass  # the measured pass surfaces real failures
    _release_cached(spark)

    # Measured-pass count (default 2, min-of-N recorded per query) —
    # overridable via SPARK_GRAFT_BENCH_RUNS; the artifact records it
    # so a reader can tell a min-of-2 row from a single-pass one
    # (VERDICT r7 #7: single-run noise faked a 1.6x regression).
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    for _pass in range(runs):
        for name in HEADLINE:
            start = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            elapsed = round(time.perf_counter() - start, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            _release_cached(spark)
    total = sum(timings.values())
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    probe_post = _host_probe()
    probe = {
        "alloc": probe_pre["alloc"],
        "cpu": probe_pre["cpu"],
        "alloc_end": probe_post["alloc"],
        "cpu_end": probe_post["cpu"],
    }

    # Round-over-round integrity (VERDICT r8 #6): compare THIS run's
    # common-subset total against the PREVIOUS ROUND's committed
    # snapshot (BENCH_FULL_r{N}.json — written once per round at close,
    # never overwritten by intra-round passes), so a pass-vs-pass
    # "0.93x" can never paper over a round-over-round 1.2x. Only
    # meaningful at the same sf; cross-host drift still applies and is
    # the reader's job to adjudicate — but the DENOMINATOR is now
    # always the prior round, by construction.
    here = os.path.dirname(os.path.abspath(__file__))
    vs_prev = None
    snaps = sorted(
        (
            int(f.rsplit("_r", 1)[1].split(".")[0]),
            os.path.join(here, f),
        )
        for f in os.listdir(here)
        if f.startswith("BENCH_FULL_r") and f.endswith(".json")
    )
    if snaps:
        prev_round, prev_path = snaps[-1]
        try:
            with open(prev_path) as fh:
                prev = json.load(fh)
            if prev.get("sf") == sf_val:
                common = sorted(set(timings) & set(prev.get("queries", {})))
                cur_c = sum(timings[q] for q in common)
                prev_c = sum(prev["queries"][q] for q in common)
                if prev_c > 0 and common:
                    vs_prev = {
                        "prev_round": prev_round,
                        "n_common": len(common),
                        "cur_common_sec": round(cur_c, 3),
                        "prev_common_sec": round(prev_c, 3),
                        "ratio": round(cur_c / prev_c, 3),
                    }
        except Exception:
            pass  # a malformed snapshot must not sink the bench run

    # Full per-query detail goes to a file: the driver that records the
    # printed line keeps only a ~2000-char tail of stdout, and BENCH_r04
    # was lost (parsed: null) because the single JSON line with ~125
    # queries overran that buffer mid-line. The printed line is budgeted
    # to always fit; BENCH_FULL.json carries every query at 3 decimals.
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as fh:
        json.dump(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "runs": runs,
                "host_probe": probe,
                "common_subset_vs_prev_round": vs_prev,
                "queries": timings,
                "sf": sf_val,
            },
            fh,
            indent=1,
        )

    def render(qdict: dict[str, float]) -> str:
        payload = {
            "metric": "headline_queries_total_runtime",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in qdict.items()},
            "nq": len(timings),
            "runs": runs,
            "probe": probe,
            "full": "BENCH_FULL.json",
            "sf": sf_val,
        }
        if vs_prev is not None:
            payload["vs_prev_round"] = {
                "r": vs_prev["prev_round"],
                "ratio": vs_prev["ratio"],
                "n": vs_prev["n_common"],
            }
        return json.dumps(payload, separators=(",", ":"))

    # Greedy fill, most expensive first: the costly queries carry the
    # perf signal; sub-0.3 s entries are interchangeable noise-floor.
    # The recorder keeps only a 2000-char stdout tail, so a ~155-query
    # map (~3.5 KB) physically cannot ride the printed line — the full
    # map always lands in BENCH_FULL.json (committed per round); the
    # line carries as many of the most expensive rows as fit.
    budget = 1840
    ordered = sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
    shown: dict[str, float] = {}
    for name, secs in ordered:
        shown[name] = secs
        if len(render(shown)) > budget:
            del shown[name]
    line = render(shown)
    assert len(line) <= 1900, f"bench line {len(line)} chars overruns tail buffer"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
