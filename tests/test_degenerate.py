"""Degenerate-input regression tests: the registry queries that used to
CRASH on an empty or single-row corpus (r9 sweep, tools/degenerate_probe.py)
must return a DataFrame and collect cleanly — empty or NULL-metric
results, never a driver-side None subscript, a 0-d numpy shape error,
an ANSI divide-by-zero, or a schema-inference failure on an empty sink.

At 100 TB the degenerate case is routine: a daily delta can be empty, a
filter chain can annihilate a partition, a tenant can hold one document.
The full 331-query sweep lives in tools/degenerate_probe.py (run it
after adding operators); this file pins the 38 previously-crashing rows
so the classes of bug stay fixed:

- empty-corpus crashes (22): numpy matrices built from empty collects
  (all_pairs_above broadcast path, anchored_topk, batch_topk), None
  subscripts on collected query vectors / aggregates (ann/ivf/rrf/mmr/
  rfm/link_negatives/zone_map), streaming harnesses adding to a None
  max-timestamp, empty-write parquet sinks with no schema to infer
  (partition_prune, save_namespace), k-means sampling zero rows.
- single-row ANSI divide-by-zero (14): one-row/one-class/one-day inputs
  zeroing a variance, a pair count, or an off-diagonal cell
  (classifier_auc, bootstrap_ci, runs_test, cohens_kappa, ...) — all now
  follow the module's NULL-means-insufficient-units contract.
- single-row IVF (2): nothing left to index after the query vector is
  held out.
- NULL-injected crashes (24): NULL embeddings fed every vector kernel
  an inhomogeneous numpy array (fixed by the NULL-vector contract —
  unembeddable rows are dropped at each similarity-operator entry),
  NULL text crashed the multimodal payload encoder, and a NULL
  event_type TypeError'd a driver-side tuple sort.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

SRC = "/root/testdata/sf0.001"

EMPTY_CRASHERS = [
    "stream_holt_parity",
    "embedding_dup_clusters",
    "link_negatives",
    "stream_locf_parity",
    "rrf_fusion",
    "mmr_rerank",
    "ann_recall",
    "knn_label_eval",
    "rfm_scores",
    "stream_ewma_parity",
    "zone_map_prune",
    "pq_report",
    "partition_prune",
    "ann_ivf_topk",
    "save_namespace_roundtrip",
    "ann_ivf_full",
    "watermark_window_parity",
    "kmeans_refine",
    "all_pairs_blocked",
    "embedding_dup_pairs",
    "ann_topk",
    "ann_batch_topk",
]

NULL_CRASHERS = [
    "capture_recapture",
    "embedding_dup_clusters",
    "multimodal_decode",
    "link_negatives",
    "dedup_method_agreement",
    "hard_negatives",
    "video_scene_change",
    "ann_recall",
    "knn_label_eval",
    "multimodal_features",
    "knn_graph",
    "pq_report",
    "ann_ivf_topk",
    "audio_rms_features",
    "video_decode",
    "ann_ivf_full",
    "watermark_window_parity",
    "semdedup",
    "kmeans_refine",
    "all_pairs_blocked",
    "image_resize_decode",
    "embedding_dup_pairs",
    "ann_batch_topk",
    "multimodal_feature_hist",
]

ONE_ROW_CRASHERS = [
    "classifier_auc",
    "bootstrap_ci",
    "source_ablation",
    "simpsons_check",
    "negbinom_fit",
    "gains_curve",
    "shingle_df_sweep",
    "runs_test",
    "freshness_half_life",
    "mad_outliers",
    "emd_drift",
    "diff_in_diff",
    "overdispersion",
    "cohens_kappa",
    "ann_ivf_topk",
    "ann_ivf_full",
]


def _write_variant(dst: str, suffix: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for p in sorted(glob.glob(f"{SRC}/*.parquet")):
        t = os.path.basename(p)
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{p}') {suffix}) "
            f"TO '{dst}/{t}' (FORMAT parquet)"
        )


def _write_nulls(dst: str) -> None:
    from tools.make_degenerate import NULL_RULES

    os.makedirs(dst, exist_ok=True)
    for p in sorted(glob.glob(f"{SRC}/*.parquet")):
        t = os.path.basename(p)
        rules = NULL_RULES.get(t, {})
        cols = [
            r[0]
            for r in duckdb.sql(f"DESCRIBE SELECT * FROM read_parquet('{p}')").fetchall()
        ]
        sel = ", ".join(
            f"CASE WHEN {rules[c]} THEN NULL ELSE {c} END AS {c}" if c in rules else c
            for c in cols
        )
        duckdb.sql(
            f"COPY (SELECT {sel} FROM read_parquet('{p}')) TO '{dst}/{t}' (FORMAT parquet)"
        )


@pytest.fixture(scope="module")
def degen_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("degen")
    empty, one, nulls = (str(base / d) for d in ("sf_empty", "sf_one", "sf_nulls"))
    _write_variant(empty, "WHERE 1=0")
    _write_variant(one, "LIMIT 1")
    _write_nulls(nulls)
    return {"empty": empty, "one": one, "nulls": nulls}


@pytest.fixture(scope="module")
def registry():
    import __spark_entry__ as entry

    return entry.queries()


@pytest.mark.parametrize("name", EMPTY_CRASHERS)
def test_empty_corpus_does_not_crash(spark, degen_dirs, registry, name):
    rows = registry[name](spark, degen_dirs["empty"]).collect()
    # an empty corpus yields an empty report for all of these except the
    # one-row global aggregate (zone_map_prune's honest zero row)
    assert len(rows) <= 1


@pytest.mark.parametrize("name", ONE_ROW_CRASHERS)
def test_single_row_corpus_does_not_crash(spark, degen_dirs, registry, name):
    # must collect cleanly; NULL metrics are the documented contract
    registry[name](spark, degen_dirs["one"]).collect()


@pytest.mark.parametrize("name", NULL_CRASHERS)
def test_null_injected_corpus_does_not_crash(spark, degen_dirs, registry, name):
    # must collect cleanly; non-participating rows (NULL text/embedding)
    # are dropped per each operator's documented NULL contract
    registry[name](spark, degen_dirs["nulls"]).collect()
