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


# ------------------------------------- stride-centroid cost model

def test_capped_stride_bounds_centroid_count_at_synthetic_1e6():
    """VERDICT r8 task #3: at fixed stride the pinned-centroid count is
    n/stride — O(n²/stride) assignment FLOPs in the limit. The cap
    keeps the count <= max_centroids for ANY n (dense 0..n-1 ids pin
    floor((n-1)/eff)+1 centroids), while below the crossover the
    stride rule is untouched."""
    stride, m = 200, 4096
    for n in (1, 1_000, 200 * 4096, 200 * 4096 + 1, 10**6, 10**8, 5 * 10**7):
        eff = similarity._capped_stride(n, stride, m)
        pinned = (n - 1) // eff + 1
        assert pinned <= m, (n, eff, pinned)
        if n <= stride * m:
            assert eff == stride
        else:
            assert eff > stride
    # n = 5x10^7 (the audit's 100 TB doc-count example): 250k centroids
    # uncapped, <= 4096 capped
    assert (5 * 10**7 - 1) // similarity._capped_stride(5 * 10**7, 200, 4096) + 1 <= 4096
    # max_centroids <= 0 disables the cap (explicit opt-out)
    assert similarity._capped_stride(10**8, 200, 0) == 200


def test_cell_knn_centroid_cap_binds_and_results_stay_valid(spark):
    """Forcing the cap below n/stride (max_centroids=2 on 500 ids)
    widens the stride so only 2 centroids pin; deeper cells are
    absorbed by the blocked kernel, output ranks stay 1..k dense, and
    every score is a true round-6 cosine (spot-checked against the
    uncapped run: shared edges carry identical scores)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert len(similarity._pinned_centroids(emb, "vec_id", "embedding", 200, 2)[0]) <= 2
    capped = similarity.cell_knn(emb, k=3, stride=200, max_centroids=2).collect()
    by_id: dict[int, list] = {}
    for r in capped:
        by_id.setdefault(r["vec_id"], []).append(r)
    for rows in by_id.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    uncapped = {
        (r["vec_id"], r["nbr"]): r["cos_sim"]
        for r in similarity.cell_knn(emb, k=3, stride=200).collect()
    }
    shared = [
        r for r in capped if (r["vec_id"], r["nbr"]) in uncapped
    ]
    assert shared  # the two cell layouts overlap on many true edges
    for r in shared:
        assert r["cos_sim"] == pytest.approx(
            uncapped[(r["vec_id"], r["nbr"])], abs=1e-6
        )


def test_bounded_pairs_above_capped_scores_stay_exact(spark):
    """bounded_pairs_above's exactness contract (emitted => truly above
    threshold, scores exact) holds when the centroid cap binds: with
    max_centroids=2 and nprobe=2 every vector probes both cells, so
    the pair set equals the exact brute-force set."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = sorted(
        tuple(r)
        for r in similarity.bounded_pairs_above(
            emb, 0.4, max_centroids=2
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in similarity.all_pairs_above_blocked(emb, 0.4).collect()
    )
    assert got == want


# --------------------------------------------- cell_knn multi-probe

def test_cell_knn_nprobe2_recall_vs_exact_knn(spark):
    """VERDICT r8 task #7: measured edge recall of cell_knn against
    exact knn_graph at sf0.01 (500 vectors, 3 pinned cells). nprobe=1
    missed cross-cell neighbors badly (44.7% measured) — below the 95%
    bar, so nprobe=2 is the default; pin both sides of that decision."""
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    exact = {
        (r["vec_id"], r["nbr"]) for r in similarity.knn_graph(emb, k=5).collect()
    }
    single = {
        (r["vec_id"], r["nbr"])
        for r in similarity.cell_knn(emb, k=5, nprobe=1).collect()
    }
    double = {
        (r["vec_id"], r["nbr"])
        for r in similarity.cell_knn(emb, k=5).collect()  # default nprobe=2
    }
    assert len(single & exact) / len(exact) < 0.95  # why 1 is NOT the default
    assert len(double & exact) / len(exact) >= 0.95


# ------------------------------------------------- anchored_topk

def test_anchored_topk_equals_exact_knn_on_anchors(spark):
    """The fixed-eval-budget kernel is EXACT: for the anchor set it
    returns precisely knn_graph's edges (same ids, ranks, round-6
    scores, same tie-break), and it never emits a non-anchor id."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    budget = 40
    got = sorted(
        tuple(r) for r in similarity.anchored_topk(emb, budget, k=3).collect()
    )
    anchor_ids = {
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(budget).collect()
    }
    want = sorted(
        tuple(r)
        for r in similarity.knn_graph(emb, k=3).collect()
        if r["vec_id"] in anchor_ids
    )
    assert got == want and len(got) == budget * 3


def test_knn_label_eval_budget_not_binding_equals_unbounded(spark):
    """When the corpus is smaller than the anchor budget the bounded
    report IS the unbounded one — the property that keeps the sf0.01
    gate row unchanged under the r9 reshape."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    bounded = sorted(
        tuple(r)
        for r in similarity.knn_label_eval(emb, k=5, max_anchors=10**6).collect()
    )
    unbounded = sorted(
        tuple(r) for r in similarity.knn_label_eval(emb, k=5).collect()
    )
    assert bounded == unbounded


# -------------------------------------------- LSH width auto-rule

def test_auto_lsh_bits_rule_and_prefix_property():
    """bits = max(8, ceil(log2(n/2))) keeps expected bucket depth ~2;
    the gate scales resolve to the historical 8, and _hyperplanes'
    LCG stream makes shorter widths a strict prefix of longer ones."""
    assert similarity._auto_lsh_bits(500) == 8
    assert similarity._auto_lsh_bits(1) == 8  # degenerate floor
    assert similarity._auto_lsh_bits(5_000) == 12
    assert similarity._auto_lsh_bits(50_000) == 15
    assert similarity._auto_lsh_bits(5 * 10**7) == 25  # depth stays ~2
    p12 = similarity._hyperplanes(8, 12)
    assert similarity._hyperplanes(8, 8) == p12[:8]


def test_lsh_bucketed_pairs_auto_equals_explicit_at_gate_scale(spark):
    """bits=None on the 500-vector gate corpus is bit-identical to the
    historical bits=8 run (the property that keeps the ann_lsh_pairs
    oracle unchanged), and a second table only ADDS candidate pairs
    (recall dial), never changes a score."""
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    auto = sorted(
        tuple(r) for r in similarity.lsh_bucketed_pairs(emb, 0.3, bits=None).collect()
    )
    explicit = sorted(
        tuple(r) for r in similarity.lsh_bucketed_pairs(emb, 0.3, bits=8).collect()
    )
    assert auto == explicit and len(auto) > 0
    two = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.lsh_bucketed_pairs(emb, 0.3, bits=8, tables=2).collect()
    }
    one = {(a, b): s for a, b, s in explicit}
    assert set(one) <= set(two)
    for k, v in one.items():
        assert two[k] == pytest.approx(v, abs=1e-6)


# --------------------------------------------- ADVICE edge guards

def test_hill_tail_index_with_too_few_keys_emits_null_row(spark):
    """ADVICE r8: with <= k keys the rank-(k+1) threshold is absent;
    the estimator must report a diagnosable NULL row, not vanish."""
    from nnanalytics_spark.pipeline import stats

    df = spark.createDataFrame(
        [(f"k{i}", 10 - i) for i in range(5)], ["key", "freq"]
    )
    rows = stats.hill_tail_index(df, "freq", "key", k=100).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_keys"] == 5 and r["k"] == 5
    assert r["hill_alpha"] is None and r["alpha_se"] is None
    assert r["tail_threshold"] is None
    # sanity: with enough keys the estimator still computes
    ok = stats.hill_tail_index(df, "freq", "key", k=3).collect()[0]
    assert ok["hill_alpha"] is not None and ok["k"] == 3


def test_shingle_df_sweep_reports_zero_keeping_caps(spark):
    """ADVICE r8: a cap below the minimum shingle df keeps zero
    shingles and must still appear (n_kept=0, candidate_pairs=0,
    pair_reduction=1), not silently drop out of the sweep."""
    # every shingle appears in all 5 docs -> df=5 for all; cap=1 keeps 0
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(5)],
        ["doc_id", "text"],
    )
    out = {r["cap"]: r for r in dedup.shingle_df_sweep(docs, caps=(1, 5)).collect()}
    assert set(out) == {1, 5}
    assert out[1]["n_kept"] == 0
    assert out[1]["candidate_pairs"] == 0
    assert out[1]["pair_reduction"] == pytest.approx(1.0)
    assert out[5]["n_kept"] > 0


def test_mde_power_degenerate_arms_yield_nulls_not_infinity(spark):
    """ADVICE r8: an arm with <2 randomization units has no sample
    variance — sd/mde columns are NULL (diagnosable), never
    NaN/Infinity; a zero control mean nulls only mde_rel."""
    from nnanalytics_spark.pipeline import stats

    one_unit = spark.createDataFrame(
        [(1, "control", 5.0), (2, "treatment", 4.0), (3, "treatment", 6.0)],
        ["uid", "arm", "v"],
    )
    r = stats.mde_power(one_unit, "v", "uid", "arm").collect()[0]
    assert r["n_control"] == 1
    assert r["sd_control"] is None and r["mde_abs"] is None
    assert r["mde_rel"] is None

    zero_mean = spark.createDataFrame(
        [(1, "control", 1.0), (2, "control", -1.0),
         (3, "treatment", 4.0), (4, "treatment", 6.0)],
        ["uid", "arm", "v"],
    )
    r = stats.mde_power(zero_mean, "v", "uid", "arm").collect()[0]
    assert r["mean_control"] == 0.0
    assert r["mde_abs"] is not None  # absolute MDE still reports
    assert r["mde_rel"] is None  # relative-to-zero is undefined

    grid = stats.sample_size_grid(zero_mean, "v", "uid", "arm").collect()
    assert all(g["n_per_arm"] is None for g in grid)  # delta = 0


def test_aa_test_single_unit_side_yields_null_verdict(spark):
    """ADVICE r8 (same moment pattern): one unit on a split side ->
    NULL z_stat / aa_pass instead of a NaN verdict."""
    from nnanalytics_spark.pipeline import stats

    df = spark.createDataFrame(
        [(1, 5.0), (2, 4.0), (4, 6.0)], ["uid", "v"]
    )
    r = stats.aa_test(df, "v", "uid", F.col("uid") % 2 == 0).collect()[0]
    assert min(r["n_a1"], r["n_a2"]) == 1
    assert r["z_stat"] is None and r["aa_pass"] is None


def test_jackknife_and_cuped_degenerate_inputs_yield_nulls(spark):
    """Proactive sweep of the same moment pattern beyond the four
    review-named functions: a 1-unit jackknife has no spread (NULL
    se/ci, ratio still reports); a constant CUPED covariate leaves θ
    undefined (NULL θ/adjusted, var_y still reports)."""
    from nnanalytics_spark.pipeline import stats

    one = spark.createDataFrame([(1, 10.0, 5.0)], ["uid", "y", "x"])
    r = stats.jackknife_ratio_ci(one, "y", "x", "uid").collect()[0]
    assert r["n_units"] == 1 and r["ratio"] == 2.0
    assert r["jk_se"] is None and r["ci_lo"] is None and r["ci_hi"] is None

    const_x = spark.createDataFrame(
        [(1, 4.0, 7.0), (2, 5.0, 7.0), (3, 6.0, 7.0)], ["uid", "y", "x"]
    )
    r = stats.cuped_adjustment(const_x, "y", "x", "uid").collect()[0]
    assert r["theta"] is None and r["var_adjusted"] is None
    assert r["variance_reduction"] is None
    assert r["var_y"] is not None and r["var_y"] > 0


def test_weighted_quantile_fractional_weights_not_truncated(spark):
    """ADVICE r8: double weights quantize via round(w*1e6) fixed-point
    instead of a silent floor-to-long (which zeroed sub-1 weights and
    returned wrong quantiles); integer weights stay exact and w_total
    reports in caller units."""
    from nnanalytics_spark.pipeline import stats

    frac = spark.createDataFrame(
        [("g", 1.0, 0.4), ("g", 2.0, 0.4), ("g", 3.0, 9.2)],
        ["grp", "v", "w"],
    )
    r = stats.weighted_quantile(frac, "v", "w", "grp", qs=(0.5,)).collect()[0]
    # 92% of the mass sits on v=3: the weighted median is 3 (the old
    # cast('long') floored 0.4->0 and 9.2->9, which happened to agree
    # on the median but reported w_total=9 instead of 10)
    assert r["wq50"] == 3.0
    assert r["w_total"] == 10  # round(10.0) in caller units

    ints = spark.createDataFrame(
        [("g", float(v), w) for v, w in [(1, 1), (2, 1), (3, 2)]],
        ["grp", "v", "w"],
    )
    r = stats.weighted_quantile(ints, "v", "w", "grp", qs=(0.5, 0.9)).collect()[0]
    assert r["w_total"] == 4 and r["wq50"] == 2.0 and r["wq90"] == 3.0



# ----------------------- sparse / offset id robustness (r9 follow-up)

def test_pinned_centroids_dense_ids_match_textbook_rule(spark):
    """On dense 0-based ids the min-residue pinning rule degenerates to
    the textbook id % eff == 0 rule — gate and oracle results are
    unchanged by the sparse-id fix."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    eff = similarity._capped_stride(n, 50, 4096)
    want = [
        r["v"]
        for r in emb.filter(F.col("vec_id") % eff == 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .collect()
    ]
    # r10: _pinned_centroids returns (vectors, n) — the corpus count rides
    # along so callers skip a second sizing job
    got, got_n = similarity._pinned_centroids(emb, "vec_id", "embedding", 50, 4096)
    assert got_n == n
    assert len(got) >= 2 and got == want


def test_cell_knn_sparse_offset_ids_no_crash(spark):
    """Sparse, offset ids (no id divisible by the stride): the plain
    modulo rule pinned ZERO centroids and crashed assignment on an
    empty matrix; the min-residue rule pins the min id's residue class
    and the graph comes back valid."""
    rows = [
        (10_000_001 + 2 * i, [float((i * 7 + j) % 5) + 0.1 for j in range(8)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.cell_knn(df, k=3, stride=200).collect()
    ids = {r[0] for r in rows}
    assert out
    for r in out:
        assert r["vec_id"] in ids and r["nbr"] in ids and r["vec_id"] != r["nbr"]
        assert 1 <= r["rank"] <= 3


def test_bounded_pairs_above_sparse_ids_scores_exact(spark):
    """bounded_pairs_above on a sparse-id corpus: runs (no empty
    centroid matrix), every emitted pair is ordered and scored with
    the exact round-6 cosine (candidates are a subset of the exact
    pair set by contract; scores never differ)."""
    rows = [
        (7_000_003 + 5 * i, [1.0 + 0.01 * ((i * 13 + j) % 7) for j in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.all_pairs_above(df, 0.999).collect()
    }
    got = similarity.bounded_pairs_above(df, 0.999, stride=37).collect()
    assert got and exact
    for r in got:
        assert r["id_a"] < r["id_b"]
        assert (r["id_a"], r["id_b"]) in exact
        assert r["cos_sim"] == exact[(r["id_a"], r["id_b"])]


def test_cell_knn_empty_corpus_returns_empty(spark):
    """Empty corpus: zero pinned centroids must yield an empty graph
    with the contract schema, not a numpy shape error in the
    assignment kernel."""
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = similarity.cell_knn(df, k=3)
    assert out.columns == ["vec_id", "rank", "nbr", "cos_sim"]
    assert out.collect() == []
