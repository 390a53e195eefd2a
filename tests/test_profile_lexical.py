"""Unit tests for the r3 operators: column profiler, lexical TF-cosine,
token-commonness quality signals — closed-form fixtures with hand-computed
expectations (the driver oracle covers the sf-scale parity)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nnanalytics_spark.core.profile import profile
from nnanalytics_spark.pipeline import text
from nnanalytics_spark.pipeline.lexical import lexical_cosine_pairs


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "apple banana cherry"),
        (3, "zebra quark"),
        (4, "   "),  # whitespace-only: no tokens, excluded from token ops
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_profile_counts_nulls_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "k long, v string",
    )
    got = {r["column"]: r for r in profile(df).collect()}
    assert got["k"]["n"] == 3 and got["k"]["n_nulls"] == 1
    assert got["k"]["n_distinct"] == 3
    assert (got["k"]["min_value"], got["k"]["max_value"]) == ("1", "3")
    assert got["v"]["n"] == 3 and got["v"]["n_nulls"] == 1
    assert got["v"]["n_distinct"] == 2
    assert (got["v"]["min_value"], got["v"]["max_value"]) == ("a", "b")


def test_profile_plan_strategies(spark):
    """No per-column jobs in any regime. Exact over safe types plans
    the two-scan unpivot strategy (NO Expand — the r6 profile_table
    cost was the Expand); HLL mode is one scan, no Expand; float
    columns (grouping-normalization hazard) fall back to the one-scan
    Expand plan."""
    df = spark.range(10).select(F.col("id"), (F.col("id") % 3).alias("m"))
    plan = profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range") == 2 and "Expand" not in plan
    hll = profile(df, exact_distinct=False)
    plan_hll = hll._jdf.queryExecution().executedPlan().toString()
    assert plan_hll.count("Range") == 1 and "Expand" not in plan_hll
    dbl = spark.range(10).select(
        (F.col("id") * 0.5).alias("x"), (F.col("id") * 0.25).alias("y")
    )
    plan_dbl = profile(dbl, exact_distinct=True)._jdf.queryExecution().executedPlan().toString()
    assert plan_dbl.count("Range") == 1 and "Expand" in plan_dbl


def test_profile_unpivot_matches_expand_and_handles_all_null(spark):
    """Both exact strategies agree value-for-value, including an
    all-NULL column (no (column, value) rows → n_distinct 0)."""
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, None), (1, "b", None)],
        "k long, v string, z string",
    )
    cols = ["k", "v", "z"]
    via_unpivot = sorted(tuple(r) for r in profile(df, cols, exact_distinct=True).collect())
    dbl = df.select(*[F.col(c) for c in cols], (F.col("k") * 1.0).alias("_f"))
    via_expand = sorted(
        tuple(r)
        for r in profile(dbl, cols + ["_f"], exact_distinct=True)
        .filter("column != '_f'")
        .collect()
    )
    assert via_unpivot == via_expand
    z = [r for r in via_unpivot if r[0] == "z"][0]
    assert z[1] == 0 and z[3] == 0  # n, n_distinct for the all-NULL column


def test_profile_auto_flips_wide_profiles_to_hll(spark):
    """Auto mode (exact_distinct=None): <=8 columns plan the exact
    count_distinct Expand; wider profiles must drop the Expand entirely
    (HLL partial aggregates) — the 100 TB default-safety regime."""
    wide = spark.range(100).select(
        *[(F.col("id") * (i + 1) * 0.5).alias(f"c{i}") for i in range(12)]
    )
    plan_wide = profile(wide)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan_wide, plan_wide
    assert plan_wide.count("Range") == 1  # HLL: one scan, no second pass
    narrow = spark.range(100).select(
        *[(F.col("id") * (i + 1) * 0.5).alias(f"c{i}") for i in range(4)]
    )
    # double columns pin the exact path to the Expand strategy, so the
    # auto trip-wire is observable in the plan
    plan_narrow = profile(narrow)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan_narrow, plan_narrow
    # explicit True still forces exact no matter the width
    forced = profile(wide, exact_distinct=True)
    assert "Expand" in forced._jdf.queryExecution().executedPlan().toString()
    got = {r["column"]: r["n_distinct"] for r in profile(narrow).collect()}
    assert got["c0"] == 100


def test_lexical_cosine_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z"), (3, "totally different words")],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in
           lexical_cosine_pairs(df, threshold=0.9).collect()}
    assert got == {(1, 2): 1.0}


def test_lexical_cosine_tf_weighting(spark):
    # doc1 = (a:2, b:1), doc2 = (a:1, b:1): cos = (2+1)/(sqrt(5)*sqrt(2))
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b")], "doc_id long, text string"
    )
    [(pair, cos)] = [
        ((r["id_a"], r["id_b"]), r["cos_sim"])
        for r in lexical_cosine_pairs(df, threshold=0.0).collect()
    ]
    assert pair == (1, 2)
    assert cos == round(3 / (math.sqrt(5) * math.sqrt(2)), 6)


def test_lexical_cosine_stopword_bound(spark):
    # 'the' appears in all 3 docs; with max_token_df=2 it leaves the
    # vocabulary, so docs sharing ONLY 'the' produce no pair.
    df = spark.createDataFrame(
        [(1, "the apple"), (2, "the banana"), (3, "the apple")],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]) for r in
           lexical_cosine_pairs(df, threshold=0.1, max_token_df=2).collect()}
    assert got == {(1, 3)}


def test_token_commonness(docs):
    got = {r["id"]: r for r in text.token_commonness(docs).collect()}
    assert set(got) == {1, 2, 3}  # whitespace-only doc 4 excluded
    # corpus counts: apple=3, banana=2, cherry=1, zebra=1, quark=1
    r1 = got[1]  # tokens apple, banana, apple -> counts 3,2,3
    assert r1["n_tokens"] == 3
    assert r1["avg_token_count"] == round(8 / 3, 6)
    assert r1["rare_frac"] == round(1 / 3, 6)  # banana(2) is <= 2
    r3 = got[3]  # zebra, quark both count 1 -> all rare
    assert r3["avg_token_count"] == 1.0 and r3["rare_frac"] == 1.0


def test_key_skew(spark):
    from nnanalytics_spark.core.profile import key_skew

    # keys: a×4, b×1, c×1 -> n_keys 3, max 4, avg 2, skew 2
    df = spark.createDataFrame(
        [("a",)] * 4 + [("b",), ("c",)], "k string"
    )
    r = key_skew(df, "k").collect()[0]
    assert (r["n_keys"], r["n_rows"], r["max_per_key"]) == (3, 6, 4)
    assert r["avg_per_key"] == 2.0 and r["skew_ratio"] == 2.0
    assert r["p50_per_key"] == 1.0  # counts sorted: 1,1,4


def test_mixture_upsample(spark):
    from nnanalytics_spark.pipeline.sampling import mixture_upsample

    df = spark.createDataFrame(
        [(i, "wiki") for i in range(100)] + [(i + 100, "web") for i in range(100)],
        "doc_id long, source string",
    )
    out = mixture_upsample(df, {"wiki": 2500, "web": 1000}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append((r["doc_id"], r["copy"]))
    # web: exactly 1.0 epoch — every row once, copy 0
    assert len(by_src["web"]) == 100
    assert all(c == 0 for _, c in by_src["web"])
    # wiki: 2 full copies each + ~half get a third (deterministic subset)
    wiki = by_src["wiki"]
    assert 200 < len(wiki) <= 300
    n3 = len(wiki) - 200
    triple = {d for d, c in wiki if c == 2}
    assert len(triple) == n3
    # rerun is identical (no rand())
    again = mixture_upsample(df, {"wiki": 2500, "web": 1000}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
