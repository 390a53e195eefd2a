"""Round-5 operator unit tests: budget fill, matryoshka eval, TF-IDF
top terms, padding efficiency (semantics beyond the oracle hash)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nnanalytics_spark.pipeline import sampling, selection, similarity, text
from nnanalytics_spark.pipeline import stats as stats_mod


def test_budget_fill_greedy_order_and_exhaustion(spark):
    df = spark.createDataFrame(
        [(1, "s1", 50), (2, "s1", 40), (3, "s1", 30), (4, "s2", 200), (5, "s3", 10)],
        "doc_id long, source string, n_chars long",
    )
    out = {r["source"]: r for r in selection.budget_fill(df, char_budget=100).collect()}
    # s1: 50 + 40 fit (cum 90), 30 would overflow (cum 120) -> 2 kept
    assert (out["s1"]["n_kept"], out["s1"]["chars_kept"]) == (2, 90)
    assert out["s1"]["budget_frac"] == 0.9
    # s2: the single doc exceeds the budget on arrival -> nothing kept
    assert (out["s2"]["n_kept"], out["s2"]["chars_kept"]) == (0, 0)
    assert out["s2"]["n_docs"] == 1
    # s3: fits entirely
    assert (out["s3"]["n_kept"], out["s3"]["chars_kept"]) == (1, 10)


def test_budget_fill_quality_order_is_size_desc_id_asc(spark):
    # equal sizes: lower doc_id wins the last slot
    df = spark.createDataFrame(
        [(9, "s", 60), (2, "s", 60), (5, "s", 60)],
        "doc_id long, source string, n_chars long",
    )
    out = selection.budget_fill(df, char_budget=120).collect()[0]
    assert (out["n_kept"], out["chars_kept"]) == (2, 120)


def test_matryoshka_identical_prefix_zero_delta(spark):
    # vectors that agree on the first 2 dims but diverge later
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in similarity.matryoshka_eval(df, trunc_dim=2, max_probe_id=10).collect()
    }
    assert len(out) == 3
    # identical vectors: both cosines 1, delta 0
    assert out[(0, 1)]["cos_full"] == 1.0 and out[(0, 1)]["abs_delta"] == 0.0
    # (0,2): truncated prefix identical -> cos_trunc 1, full cosine lower
    assert out[(0, 2)]["cos_trunc"] == 1.0
    assert out[(0, 2)]["cos_full"] < 1.0
    assert out[(0, 2)]["abs_delta"] == round(1.0 - out[(0, 2)]["cos_full"], 6)


def test_tfidf_distinguishing_term_ranks_first(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha alpha alpha shared", "s1"),
            (2, "beta shared shared", "s2"),
            (3, "shared gamma", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    out = {(r["source"], r["rank"]): r for r in text.tfidf_top_terms(df, k=2).collect()}
    # 'shared' occurs in all 3 sources -> idf = ln(1) = 0 -> never rank 1
    assert out[("s1", 1)]["term"] == "alpha"
    assert out[("s2", 1)]["term"] == "beta"
    assert out[("s3", 1)]["term"] == "gamma"
    for key, r in out.items():
        if r["term"] == "shared":
            assert r["tfidf"] == 0.0


def test_padding_efficiency_hand_computed(spark):
    # L=4: doc of 6 tokens -> 2 windows (8 slots); doc of 4 -> 1 window
    df = spark.createDataFrame(
        [(1, "a b c d e f", "s"), (2, "a b c d", "s"), (3, "", "s")],
        "doc_id long, text string, source string",
    )
    out = sampling.padding_efficiency(df, max_len=4).collect()[0]
    assert out["n_docs"] == 3
    assert out["total_tokens"] == 10
    assert out["padded_windows"] == 3  # 2 + 1 + 0
    assert out["packed_windows"] == 3  # ceil(10/4)
    assert out["padded_efficiency"] == round(10 / 12, 6)
    assert out["packed_efficiency"] == round(10 / 12, 6)


def test_budget_fill_report_covers_all_sources(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = selection.budget_fill(docs, char_budget=20_000)
    n_sources = docs.select("source").distinct().count()
    rows = out.collect()
    assert len(rows) == n_sources
    assert all(r["n_kept"] <= r["n_docs"] for r in rows)
    assert all(0.0 <= r["budget_frac"] <= 1.0 for r in rows)


def test_bpe_merge_candidates_counts_and_rank(spark):
    # "abab" x2 + "ba": pairs weighted by word frequency.
    df = spark.createDataFrame(
        [(1, "abab abab ba"), (2, "abab")],
        "doc_id long, text string",
    )
    out = {(r["a"], r["b"]): r for r in text.bpe_merge_candidates(df, k=10).collect()}
    # abab appears 3x across the corpus: pairs ab, ba, ab -> ab: 6, ba: 3
    # plus the standalone word "ba" -> ba: 4
    assert out[("a", "b")]["pair_count"] == 6
    assert out[("b", "a")]["pair_count"] == 4
    assert out[("a", "b")]["rank"] == 1
    assert out[("b", "a")]["rank"] == 2


def test_bpe_merge_candidates_ignores_single_char_words(spark):
    df = spark.createDataFrame([(1, "a b c dd")], "doc_id long, text string")
    rows = text.bpe_merge_candidates(df, k=10).collect()
    assert [(r["a"], r["b"], r["pair_count"]) for r in rows] == [("d", "d", 1)]


def test_char_entropy_uniform_and_degenerate(spark):
    import math

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in text.char_entropy_scores(df).collect()}
    # single repeated char -> entropy 0
    assert out[1]["entropy_nats"] == 0.0
    # 4 distinct chars, uniform -> ln(4), each term rounded to 6dp
    expect = 4 * round(0.25 * math.log(4), 6)
    assert abs(out[2]["entropy_nats"] - expect) < 1e-9
    assert out[2]["n_chars"] == 4


def test_zipf_slope_exact_power_law(spark):
    # counts c = 12 // r give ln c ~ -1 * ln r + ln 12: slope near -1
    rows = [(f"t{r}", " ".join([f"t{r}"] * (12 // r))) for r in range(1, 5)]
    df = spark.createDataFrame(
        [(i, t[1]) for i, t in enumerate(rows)], "doc_id long, text string"
    )
    out = stats_mod.zipf_slope(df, top_n=10).collect()[0]
    assert out["n"] == 4
    assert -1.2 < out["slope"] < -0.8
    assert out["r2"] > 0.95


def test_quantile_partial_merge_equals_full(spark):
    from nnanalytics_spark.core.aggregates import (
        bucket_quantiles,
        merge_quantile_partials,
        quantile_partial,
    )

    rows = [(i, "a", float(i % 37)) for i in range(200)] + [
        (i, "b", float(i % 11)) for i in range(200, 300)
    ]
    df = spark.createDataFrame(rows, "event_id long, k string, value double")
    full = quantile_partial(df, "k", "value", width=5.0)
    merged = merge_quantile_partials(
        quantile_partial(df.filter(F.col("event_id") % 2 == 0), "k", "value", 5.0),
        quantile_partial(df.filter(F.col("event_id") % 2 == 1), "k", "value", 5.0),
        "k",
    )
    q_full = {r["k"]: (r["p50_upper"], r["p99_upper"])
              for r in bucket_quantiles(full, "k", (0.5, 0.99), 5.0).collect()}
    q_merged = {r["k"]: (r["p50_upper"], r["p99_upper"])
                for r in bucket_quantiles(merged, "k", (0.5, 0.99), 5.0).collect()}
    assert q_full == q_merged
    # bucket upper edge bounds the true quantile from above, within width
    import numpy as np

    vals = np.array([v for _, k, v in rows if k == "a"])
    true_p50 = np.quantile(vals, 0.5)
    assert true_p50 <= q_full["a"][0] <= true_p50 + 5.0 + 1e-9


def test_partitioned_write_prunes_scan(spark, tmp_path):
    from nnanalytics_spark.sources import layout

    df = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "x", 3.0)],
        "id long, part string, v double",
    )
    path = str(tmp_path / "part")
    layout.write_partitioned(df, path, "part")
    pruned = layout.read_partition_pruned(spark, path, part="x")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "x" in plan
    assert sorted(r["id"] for r in pruned.collect()) == [1, 3]


def test_edit_distance_pairs_exact_distances(spark):
    from nnanalytics_spark.pipeline import dedup

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumped over the lazy dog"),   # dist 2
        (3, "the quick brown fox jumps over the lazy cat"),    # dist 3 vs 1
        (4, "completely unrelated text with no overlap here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r["edit_dist"]
           for r in dedup.edit_distance_pairs(df, max_dist=10, max_shingle_df=10).collect()}
    assert out[(1, 2)] == 2
    assert out[(1, 3)] == 3
    assert (1, 4) not in out and (2, 4) not in out


def test_edit_distance_pairs_threshold_excludes(spark):
    from nnanalytics_spark.pipeline import dedup

    docs = [
        (1, "aaa bbb ccc ddd"),
        (2, "aaa bbb xxx yyy zzz www qqq rrr"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # shares the shingle 'aaa bbb' -> candidate, but distance > 4
    out = dedup.edit_distance_pairs(df, max_dist=4, max_shingle_df=10).collect()
    assert out == []


def test_ks_two_sample_known_value(spark):
    rows = (
        [(i, "click", 1.0) for i in range(4)]
        + [(i + 10, "purchase", 1.0) for i in range(2)]
        + [(i + 20, "purchase", 2.0) for i in range(2)]
    )
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = stats_mod.ks_two_sample(df).collect()[0]
    # F_a(100c) = 1, F_b(100c) = 0.5 -> D = 0.5 exactly
    assert (out["n_a"], out["n_b"]) == (4, 4)
    assert out["d_num"] == 8 and out["d_den"] == 16
    assert out["d_stat"] == 0.5


def test_ks_two_sample_identical_distributions(spark):
    df = spark.createDataFrame(
        [(k, t, float(k % 5)) for k in range(50) for t in ("click", "purchase")],
        "event_id long, event_type string, value double",
    )
    out = stats_mod.ks_two_sample(df).collect()[0]
    assert out["d_num"] == 0 and out["d_stat"] == 0.0


def test_ks_grid_mode_sup_equality(spark):
    """grid_cents coarsens values BEFORE the window. When the data
    already sits on the grid (values are multiples of grid/100), the
    quantization changes nothing and grid-mode D must EQUAL exact-mode D
    — the sup-equality argument, testable bit-for-bit. And on off-grid
    data grid-mode D can only shrink (it evaluates the same ECDF pair at
    fewer points)."""
    on_grid = spark.createDataFrame(
        [(i, "click", float(5 * (i % 4))) for i in range(40)]
        + [(i + 100, "purchase", float(5 * (i % 2))) for i in range(30)],
        "event_id long, event_type string, value double",
    )
    exact = stats_mod.ks_two_sample(on_grid).collect()[0]
    grid = stats_mod.ks_two_sample(on_grid, grid_cents=500).collect()[0]
    assert (grid["n_a"], grid["n_b"]) == (exact["n_a"], exact["n_b"])
    assert grid["d_stat"] == exact["d_stat"]

    import random

    rng = random.Random(7)
    off_grid = spark.createDataFrame(
        [(i, rng.choice(["click", "purchase"]), rng.uniform(0, 40))
         for i in range(400)],
        "event_id long, event_type string, value double",
    )
    exact2 = stats_mod.ks_two_sample(off_grid).collect()[0]
    grid2 = stats_mod.ks_two_sample(off_grid, grid_cents=500).collect()[0]
    assert grid2["d_stat"] <= exact2["d_stat"]
    # and the window input is provably bounded by the domain/grid ratio:
    # 40 units of domain / 5-unit buckets -> at most 9 distinct keys
    import pytest as _pytest

    with _pytest.raises(ValueError):
        stats_mod.ks_two_sample(off_grid, grid_cents=0)


def test_pivot_counts_zero_fill_and_single_pass(spark):
    from nnanalytics_spark.pipeline import behavior

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k long, t string"
    )
    out = {r["k"]: r for r in behavior.pivot_counts(df, "k", "t", ["a", "b", "c"]).collect()}
    assert (out[1]["a"], out[1]["b"], out[1]["c"]) == (2, 0, 0)
    assert (out[2]["a"], out[2]["b"], out[2]["c"]) == (0, 1, 0)
    # single hash-aggregate plan: no second scan for pivot values
    plan = behavior.pivot_counts(df, "k", "t", ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") == 1, plan


def test_resample_hourly_fills_gaps_with_zeros(spark):
    from nnanalytics_spark.pipeline import behavior

    h = 3_600_000_000
    df = spark.createDataFrame(
        [(0, "x", 0 * h), (1, "x", 3 * h), (2, "y", 1 * h)],
        "event_id long, event_type string, ts_us long",
    )
    out = {(r["event_type"], r["hour"]): r["cnt"]
           for r in behavior.resample_hourly(df).collect()}
    # spine covers global hours 0..3 for BOTH groups, zeros in gaps
    assert len(out) == 8
    assert out[("x", 0)] == 1 and out[("x", 1)] == 0 and out[("x", 3)] == 1
    assert out[("y", 1)] == 1 and out[("y", 0)] == 0 and out[("y", 3)] == 0


def test_quantile_merge_associativity_property(spark):
    """Merging partials in ANY grouping must equal the one-shot
    histogram — the property that makes the state safe under stream
    redelivery/reordering."""
    from nnanalytics_spark.core.aggregates import (
        merge_quantile_partials,
        quantile_partial,
    )

    rows = [(i, "k", float((i * 37) % 101) - 13.0) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, k string, value double")
    full = {(r["k"], r["bucket"]): r["cnt"]
            for r in quantile_partial(df, "k", "value", 7.0).collect()}
    p0 = quantile_partial(df.filter("id % 3 = 0"), "k", "value", 7.0)
    p1 = quantile_partial(df.filter("id % 3 = 1"), "k", "value", 7.0)
    p2 = quantile_partial(df.filter("id % 3 = 2"), "k", "value", 7.0)
    m = merge_quantile_partials(merge_quantile_partials(p0, p1, "k"), p2, "k")
    m2 = merge_quantile_partials(p2, merge_quantile_partials(p1, p0, "k"), "k")
    got = {(r["k"], r["bucket"]): r["cnt"] for r in m.collect()}
    got2 = {(r["k"], r["bucket"]): r["cnt"] for r in m2.collect()}
    assert got == full == got2


def test_ks_bounds_property(spark):
    """0 <= D <= 1 and d_num <= d_den for arbitrary group contents."""
    import random

    rng = random.Random(11)
    rows = [(i, rng.choice(["click", "purchase"]), rng.uniform(-5, 50))
            for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = stats_mod.ks_two_sample(df).collect()[0]
    assert 0 <= out["d_num"] <= out["d_den"]
    assert 0.0 <= out["d_stat"] <= 1.0


def test_weighted_sample_bias_and_determinism(spark):
    from nnanalytics_spark.pipeline import sampling

    # 200 light docs (w=1) + 200 heavy docs (w=50): the heavy half must
    # dominate a k=40 sample, and two runs must agree exactly
    rows = [(i, "s", 1.0 if i < 200 else 50.0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")
    got1 = sorted(r["doc_id"] for r in
                  sampling.weighted_sample_k(df, 40, "w", group_col="source").collect())
    got2 = sorted(r["doc_id"] for r in
                  sampling.weighted_sample_k(df, 40, "w", group_col="source").collect())
    assert got1 == got2 and len(got1) == 40
    heavy = sum(1 for i in got1 if i >= 200)
    assert heavy >= 30  # ~50x weight -> overwhelmingly heavy picks


def test_weighted_sample_global_k(spark):
    from nnanalytics_spark.pipeline import sampling

    df = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(50)], "doc_id long, w double"
    )
    out = sampling.weighted_sample_k(df, 10, "w")
    assert out.count() == 10
    assert "TakeOrderedAndProject" in out._jdf.queryExecution().executedPlan().toString()


def test_quantile_normalize_uniform_and_ties(spark):
    from nnanalytics_spark.pipeline import sampling

    df = spark.createDataFrame(
        [(1, "s", 10), (2, "s", 20), (3, "s", 20), (4, "s", 40), (5, "t", 7)],
        "doc_id long, source string, v long",
    )
    out = {r["doc_id"]: r["q_norm"] for r in sampling.quantile_normalize(df, "v").collect()}
    assert out[1] == 0.0 and out[4] == 1.0
    # ties resolve by id: doc 2 before doc 3
    assert out[2] == 1/3 and out[3] == 2/3
    # singleton group -> 0.0, never a 0/0
    assert out[5] == 0.0


def test_scd2_intervals_runs_and_open_interval(spark):
    from nnanalytics_spark.pipeline import behavior

    df = spark.createDataFrame(
        [
            (1, 7, "a", 100), (2, 7, "a", 200), (3, 7, "b", 300),
            (4, 7, "a", 400), (5, 8, "x", 50),
        ],
        "event_id long, user_id long, event_type string, ts_us long",
    )
    rows = sorted(
        behavior.scd2_intervals(df).collect(),
        key=lambda r: (r["user_id"], r["valid_from_us"]),
    )
    u7 = [(r["event_type"], r["valid_from_us"], r["valid_to_us"])
          for r in rows if r["user_id"] == 7]
    # a-run [100,300), b-run [300,400), a AGAIN [400, open) — the rank
    # difference must split the two a-runs, not merge them
    assert u7 == [("a", 100, 300), ("b", 300, 400), ("a", 400, None)]
    u8 = [(r["event_type"], r["valid_from_us"], r["valid_to_us"])
          for r in rows if r["user_id"] == 8]
    assert u8 == [("x", 50, None)]


def test_scd2_single_exchange_for_both_windows(spark):
    from nnanalytics_spark.pipeline import behavior

    df = spark.createDataFrame(
        [(1, 7, "a", 100)], "event_id long, user_id long, event_type string, ts_us long"
    )
    plan = behavior.scd2_intervals(df)._jdf.queryExecution().executedPlan().toString()
    # one hashpartitioning(user_id) exchange serves BOTH run-splitting
    # windows (subset partitioning satisfies the (key, state)
    # requirement) and the downstream interval windows
    assert plan.count("Exchange") == 1, plan


def test_path_ngrams_counts_and_tail_handling(spark):
    from nnanalytics_spark.pipeline import behavior

    # user 7: a->b->c->b  (trigrams a>b>c, b>c>b); user 8: x->y (none)
    df = spark.createDataFrame(
        [(1, 7, "a", 100), (2, 7, "b", 200), (3, 7, "c", 300), (4, 7, "b", 400),
         (5, 8, "x", 10), (6, 8, "y", 20)],
        "event_id long, user_id long, event_type string, ts_us long",
    )
    out = {r["path"]: r["cnt"] for r in behavior.path_ngrams(df, n=3, k=10).collect()}
    assert out == {"a>b>c": 1, "b>c>b": 1}


def test_cooccurrence_lift_exact(spark):
    from nnanalytics_spark.pipeline import behavior

    h = 3_600_000_000
    # basket1 (u7,w0): {a,b}; basket2 (u7,w1): {a}; basket3 (u8,w0): {a,b}
    df = spark.createDataFrame(
        [(1, 7, "a", 10), (2, 7, "b", 20), (3, 7, "a", h + 5),
         (4, 8, "a", 30), (5, 8, "b", 40)],
        "event_id long, user_id long, event_type string, ts_us long",
    )
    out = behavior.cooccurrence_lift(df).collect()
    assert len(out) == 1
    r = out[0]
    # P(ab)=2/3, P(a)=3/3, P(b)=2/3 -> lift = (2*3)/(3*2) = 1.0
    assert (r["a"], r["b"], r["both"], r["ma"], r["mb"]) == ("a", "b", 2, 3, 2)
    assert r["lift"] == 1.0


def test_cooccurrence_singleton_baskets_no_self_pairs(spark):
    from nnanalytics_spark.pipeline import behavior

    df = spark.createDataFrame(
        [(1, 7, "a", 10), (2, 8, "b", 20)],
        "event_id long, user_id long, event_type string, ts_us long",
    )
    assert behavior.cooccurrence_lift(df).collect() == []


def test_growth_accounting_decomposition(spark):
    from nnanalytics_spark.pipeline import behavior
    import datetime as dt

    def d(day):
        return dt.datetime(1970, 1, 1) + dt.timedelta(days=day)

    # u1 active wk0, wk1 (returning), wk3 (resurrected); u2 new in wk1
    rows = [(1, 1, d(0)), (2, 1, d(8)), (3, 1, d(22)), (4, 2, d(9))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["wk"]: r for r in behavior.growth_accounting(df).collect()}
    assert (out[0]["new_users"], out[0]["active"]) == (1, 1)
    assert (out[1]["new_users"], out[1]["returning"], out[1]["resurrected"]) == (1, 1, 0)
    assert (out[3]["new_users"], out[3]["returning"], out[3]["resurrected"]) == (0, 0, 1)
    assert out[3]["cumulative_users"] == 2


def test_tokenizer_fertility_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "hello world-42", "s")], "doc_id long, text string, source string"
    )
    out = text.tokenizer_fertility(df).collect()[0]
    # words: [hello, world-42]; subwords: hello|world|-|42 = 4
    assert (out["words"], out["subwords"], out["chars"]) == (2, 4, 14)
    assert out["fertility"] == 2.0


def test_doc_length_histogram_buckets(spark):
    df = spark.createDataFrame(
        [(1, "a", "s"), (2, "a b", "s"), (3, "a b c d", "s"), (4, "", "s")],
        "doc_id long, text string, source string",
    )
    out = {r["log2_bucket"]: r["n_docs"] for r in text.doc_length_histogram(df).collect()}
    # 1 token -> bucket 0; 2 -> 1; 4 -> 2; empty -> -1
    assert out == {-1: 1, 0: 1, 1: 1, 2: 1}
