"""Unit tests for the r9 fixes (VERDICT r8 tasks #2/#3/#7 + ADVICE):
lsh_plan's df-capped profile source preserves the (b, r) ranking;
the stride-centroid family's centroid count is bounded; cell_knn
multi-probe recall is measured against exact kNN; and the ADVICE
edge-case guards (hill tail, shingle_df_sweep grid, mde_power
moments, weighted_quantile weights) behave as documented."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nnanalytics_spark.pipeline import dedup, similarity

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# ------------------------------------------------------- lsh_plan

def test_lsh_plan_ranking_unchanged_under_df_capped_profile(spark):
    """VERDICT r8 task #2: the gate query's profile source moved from
    prefix_filter_pairs(0.5) (lossless, hot tokens in candidate
    generation) to ngram_jaccard_pairs(n=1, 0.5, max_df=100) (hot
    tokens excluded from candidate generation; survivor jaccard still
    exact). The planner's OUTPUT is a (b, r) preference order — pin
    that ordering by (expected_recall desc, expected_noise asc, s50)
    is identical under both profile sources at sf0.01."""
    import __spark_entry__ as entry

    d = entry._t(spark, SF01, "documents").filter(F.col("doc_id") % 5 == 0)

    old_pairs = dedup.prefix_filter_pairs(d, threshold=0.5)
    new_pairs = dedup.ngram_jaccard_pairs(
        d, n=1, threshold=0.5, max_shingle_df=100
    )

    def ranking(pairs):
        rows = dedup.lsh_plan(pairs).collect()
        rows.sort(
            key=lambda r: (-r["expected_recall"], r["expected_noise"], r["s50"])
        )
        return [(r["b"], r["r"]) for r in rows]

    old_rank, new_rank = ranking(old_pairs), ranking(new_pairs)
    assert len(old_rank) == 4
    assert old_rank == new_rank


def test_lsh_plan_df_cap_drops_only_all_hot_pairs(spark):
    """The df-capped unigram pair set is a subset of the lossless
    prefix-filter set, and every surviving pair carries the SAME exact
    jaccard — the cap changes candidate generation, never scores."""
    import __spark_entry__ as entry

    d = entry._t(spark, SF, "documents").filter(F.col("doc_id") % 5 == 0)
    old = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.prefix_filter_pairs(d, threshold=0.5).collect()
    }
    new = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            d, n=1, threshold=0.5, max_shingle_df=100
        ).collect()
    }
    assert set(new) <= set(old)
    for k, v in new.items():
        assert v == pytest.approx(old[k], abs=1e-6)
