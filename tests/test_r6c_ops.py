"""Unit tests for the r6 third-batch operators: bloom-pruned join,
Fellegi–Sunter record linkage, skyline/Pareto frontier — closed-form
fixtures with hand-computed expectations (the oracle battery covers
sf-scale parity for the corresponding queries() entries)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nnanalytics_spark.core import joins
from nnanalytics_spark.pipeline import linkage, stats


# ---------------------------------------------------------------- bloom

def test_bloom_has_no_false_negatives(spark):
    keys = spark.createDataFrame([(i,) for i in range(200)], "k long")
    bitmap = joins.build_bloom(keys, "k", num_bits=1 << 12, num_hashes=3)
    hits = keys.filter(joins.bloom_might_contain(F.col("k"), bitmap, 3)).count()
    assert hits == 200  # every inserted key MUST pass


def test_bloom_rejects_most_non_members(spark):
    keys = spark.createDataFrame([(i,) for i in range(100)], "k long")
    bitmap = joins.build_bloom(keys, "k", num_bits=1 << 14, num_hashes=3)
    probe = spark.createDataFrame([(i,) for i in range(10_000, 12_000)], "k long")
    fp = probe.filter(joins.bloom_might_contain(F.col("k"), bitmap, 3)).count()
    # 100 keys in 16384 bits: theoretical FP ~ (1-e^(-300/16384))^3 ≈ 6e-6;
    # allow a generous margin — the point is "sparse", not the exact rate
    assert fp < 20


def test_bloom_prune_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(i, i % 7, i * 10) for i in range(500)], "row_id long, k long, v long"
    )
    dim = spark.createDataFrame([(2, "a"), (5, "b")], "k2 long, tag string")
    got = (
        joins.bloom_prune_join(fact, dim, "k", "k2", num_bits=1 << 10)
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    want = (
        fact.join(dim, fact.k == dim.k2)
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_word_count_is_bounded_and_validated(spark):
    keys = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    bitmap = joins.build_bloom(keys, "k", num_bits=1 << 10)
    assert len(bitmap) == (1 << 10) // 64  # constant, data-size-independent
    with pytest.raises(ValueError):
        joins.build_bloom(keys, "k", num_bits=100)  # not a multiple of 64


def test_bloom_filter_runs_map_side_before_the_join_exchange(spark):
    # the membership predicate must sit in the fact scan stage (a Filter
    # of pure expressions), not after the exchange — that is the whole
    # scale argument
    fact = spark.createDataFrame([(i, i % 7) for i in range(100)], "row_id long, k long")
    dim = spark.createDataFrame([(2,)], "k2 long")
    plan = (
        joins.bloom_prune_join(fact, dim, "k", "k2", num_bits=1 << 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the xxhash64 membership filter exists, and no UDF/python eval stage
    assert "xxhash64" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -------------------------------------------------------------- linkage

def test_field_model_validates_m_u(spark):
    with pytest.raises(ValueError):
        linkage.FieldModel("x", F.lit(True), m=0.2, u=0.9)  # u > m
    f = linkage.FieldModel("x", F.lit(True), m=0.9, u=0.2)
    assert f.agree_weight == math.log2(0.9 / 0.2)
    assert f.disagree_weight == math.log2((1 - 0.9) / (1 - 0.2))


def test_linkage_scores_hand_computed_pair(spark):
    a = spark.createDataFrame([(1, "B1", "AUTO", 100.0)], "id long, blk string, seg string, bal double")
    b = spark.createDataFrame(
        [(2, "B1", "AUTO", 150.0), (3, "B1", "SHIP", -500.0), (4, "B2", "AUTO", 100.0)],
        "id long, blk string, seg string, bal double",
    )
    fields = [
        linkage.FieldModel("seg", F.col("a_seg") == F.col("b_seg"), 0.9, 0.2),
        linkage.FieldModel(
            "band",
            F.abs(F.floor(F.col("a_bal")) - F.floor(F.col("b_bal"))) <= 100,
            0.7,
            0.05,
        ),
    ]
    rows = {
        r["id_b"]: r
        for r in linkage.linkage_pairs(
            a, b, ["blk"], fields, id_col="id", upper=2.0, lower=0.0
        ).collect()
    }
    # id 4 is in block B2 — blocked out entirely
    assert set(rows) == {2, 3}
    w_seg = math.log2(0.9 / 0.2)
    w_band = math.log2(0.7 / 0.05)
    assert rows[2]["agree_seg"] and rows[2]["agree_band"]
    assert rows[2]["score"] == round(w_seg + w_band, 6)
    assert rows[2]["decision"] == "match"
    # id 3 disagrees on both fields: negative weights → nonmatch
    assert not rows[3]["agree_seg"] and not rows[3]["agree_band"]
    assert rows[3]["score"] == round(
        math.log2((1 - 0.9) / (1 - 0.2)) + math.log2((1 - 0.7) / (1 - 0.05)), 6
    )
    assert rows[3]["decision"] == "nonmatch"


def test_linkage_decision_band_boundaries(spark):
    # a single weak field keeps the score strictly between the
    # thresholds → 'possible'
    a = spark.createDataFrame([(1, "B", 1)], "id long, blk string, x int")
    b = spark.createDataFrame([(2, "B", 1)], "id long, blk string, x int")
    fields = [linkage.FieldModel("x", F.col("a_x") == F.col("b_x"), 0.6, 0.4)]
    (row,) = linkage.linkage_pairs(
        a, b, ["blk"], fields, id_col="id", upper=2.0, lower=0.0
    ).collect()
    assert row["decision"] == "possible"


def test_blocking_diagnostic_prices_pairs_with_total_row(spark):
    """blocking_diagnostic reports per-block a x b candidate counts
    (heaviest first) and a NULL-key TOTAL row — without ever building
    the pair space (r7: the diagnostic that would have priced the
    nation-only entity_resolution blowup before launch)."""
    a = spark.createDataFrame(
        [(i, "hot" if i < 6 else "cold") for i in range(8)], "id long, blk string"
    )
    b = spark.createDataFrame(
        [(i + 100, "hot" if i < 4 else "cold") for i in range(6)],
        "id long, blk string",
    )
    rows = linkage.blocking_diagnostic(a, b, ["blk"]).collect()
    per = {r["blk"]: (r["n_a"], r["n_b"], r["pairs"]) for r in rows if r["blk"]}
    assert per == {"hot": (6, 4, 24), "cold": (2, 2, 4)}
    assert rows[0]["blk"] == "hot"  # heaviest first
    total = [r for r in rows if r["blk"] is None][0]
    assert (total["n_a"], total["n_b"], total["pairs"]) == (8, 6, 28)


def test_blocking_diagnostic_total_counts_one_sided_blocks(spark):
    """ADVICE r7: the TOTAL row's n_a/n_b are the FULL table sizes even
    when blocks exist on only one side — only `pairs` is restricted to
    co-occurring blocks."""
    a = spark.createDataFrame(
        [(1, "both"), (2, "both"), (3, "a_only"), (4, "a_only")],
        "id long, blk string",
    )
    b = spark.createDataFrame(
        [(10, "both"), (11, "b_only")], "id long, blk string"
    )
    rows = linkage.blocking_diagnostic(a, b, ["blk"]).collect()
    per = {r["blk"]: r["pairs"] for r in rows if r["blk"]}
    assert per == {"both": 2}  # one-sided blocks contribute no pairs
    total = [r for r in rows if r["blk"] is None][0]
    assert (total["n_a"], total["n_b"], total["pairs"]) == (4, 2, 2)
    # empty co-occurrence still yields a zero-pairs total, not NULL
    c = spark.createDataFrame([(20, "zzz")], "id long, blk string")
    t = [r for r in linkage.blocking_diagnostic(a, c, ["blk"]).collect() if r["blk"] is None][0]
    assert (t["n_a"], t["n_b"], t["pairs"]) == (4, 1, 0)


def test_skyline_bucket_width_must_be_positive(spark):
    """ADVICE r7: width 0 (NULL buckets -> silently empty frontier) and
    negative widths (inverted carry -> silently wrong frontier) raise."""
    df = spark.createDataFrame(
        [(1, 1.0, 5), (2, 2.0, 7)], "id long, cost double, gain int"
    )
    for bad in (0, -1.5):
        with pytest.raises(ValueError, match="bucket_width"):
            stats.skyline(df, minimize="cost", maximize="gain", bucket_width=bad)


def test_entity_resolution_composite_blocking_is_lossless(spark):
    """r7 scale fix: the (nation, segment, band +/-1) blocking emits
    exactly the match set nation-only blocking emitted."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in entry.q_entity_resolution(spark, sf).collect()
    )
    # reference result: nation-only candidates, same scorer
    from nnanalytics_spark.pipeline import dedup

    c = entry._t(spark, sf, "customer")
    a = c.filter(F.col("c_custkey") % 2 == 0)
    b = c.filter(F.col("c_custkey") % 2 == 1)
    fields = [
        linkage.FieldModel(
            "segment",
            F.col("a_c_mktsegment") == F.col("b_c_mktsegment"),
            *entry._FS_FIELDS[0][1:],
        ),
        linkage.FieldModel(
            "bal_band",
            F.abs(F.floor(F.col("a_c_acctbal")) - F.floor(F.col("b_c_acctbal"))) <= 100,
            *entry._FS_FIELDS[1][1:],
        ),
        linkage.FieldModel(
            "bal_sign",
            (F.col("a_c_acctbal") >= 0) == (F.col("b_c_acctbal") >= 0),
            *entry._FS_FIELDS[2][1:],
        ),
    ]
    matches = (
        linkage.linkage_pairs(
            a, b, ["c_nationkey"], fields, id_col="c_custkey", upper=2.0, lower=0.0
        )
        .filter(F.col("decision") == "match")
        .select("id_a", "id_b")
    )
    comp = dedup.dup_clusters(c.select("c_custkey"), matches, id_col="c_custkey")
    want = sorted(
        tuple(r)
        for r in comp.groupBy(F.col("cluster").alias("entity_id"))
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.min("node").alias("min_key"),
            F.max("node").alias("max_key"),
            F.sum((F.col("node") % 2 == 0).cast("int")).alias("n_list_a"),
        )
        .filter(F.col("n_records") > 1)
        .collect()
    )
    assert got == want


# -------------------------------------------------------------- skyline

def test_skyline_hand_fixture_with_ties_and_groups(spark):
    rows = [
        # group g1: (price, size)
        (1, "g1", 1.0, 5),   # frontier (cheapest)
        (2, "g1", 2.0, 9),   # frontier (bigger than everything cheaper)
        (3, "g1", 2.0, 9),   # duplicate of 2 — TIE: both stay
        (4, "g1", 2.0, 7),   # dominated by 2 at the same price
        (5, "g1", 3.0, 9),   # dominated by 2 (same size, higher price)
        (6, "g1", 4.0, 10),  # frontier
        # group g2 is independent
        (7, "g2", 9.0, 1),   # frontier (alone)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, price double, size int")
    got = sorted(
        r["id"]
        for r in stats.skyline(
            df, minimize="price", maximize="size", group_cols=["grp"], id_col="id"
        ).collect()
    )
    assert got == [1, 2, 3, 6, 7]


def test_skyline_matches_bruteforce_not_exists(spark):
    # pseudo-random-ish but deterministic grid; brute-force dominance in
    # Python is the oracle
    rows = [
        (i, "g", float((i * 37) % 11), (i * 53) % 7) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, price double, size int")
    got = sorted(
        r["id"]
        for r in stats.skyline(
            df, minimize="price", maximize="size", group_cols=["grp"], id_col="id"
        ).collect()
    )
    want = sorted(
        i
        for (i, _, p, s) in rows
        if not any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s))
            for (_, _, p2, s2) in rows
        )
    )
    assert got == want


def test_skyline_ungrouped_bucket_scan_exact_and_warns_without(spark):
    """VERDICT r6 #5: ungrouped skyline. With bucket_width, the global
    prefix scan decomposes by bucket (exact — identical frontier to the
    single-window plan, including cross-bucket dominance and ties on
    bucket boundaries); without it, a RuntimeWarning flags the
    single-task window."""
    import warnings

    rows = [(i, float((i * 37) % 11), (i * 53) % 7) for i in range(60)]
    # boundary tie: a duplicate frontier point at a bucket edge
    rows += [(100, 0.0, 6), (101, 0.0, 6)]
    df = spark.createDataFrame(rows, "id long, price double, size int")
    want = sorted(
        i
        for (i, p, s) in rows
        if not any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s)) for (_, p2, s2) in rows
        )
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        single = sorted(
            r["id"]
            for r in stats.skyline(
                df, minimize="price", maximize="size", id_col="id"
            ).collect()
        )
    assert any(w.category is RuntimeWarning for w in caught)
    for width in (1.0, 2.5, 100.0):  # incl. one bucket holding everything
        bucketed = sorted(
            r["id"]
            for r in stats.skyline(
                df, minimize="price", maximize="size", id_col="id",
                bucket_width=width,
            ).collect()
        )
        assert bucketed == want
    assert single == want


def test_skyline_ungrouped_bucket_plan_is_bucket_partitioned(spark):
    """Plan shape: the levels-sized window partitions by the bucket key
    (parallel); the only unpartitioned window runs over the
    |buckets|-bounded carry table — the documented lint-waiver class
    (bounded grid), same as ks_test_grid."""
    df = spark.createDataFrame(
        [(i, float(i % 13), i % 5) for i in range(50)],
        "id long, price double, size int",
    )
    plan = stats.skyline(
        df, minimize="price", maximize="size", id_col="id", bucket_width=2.0
    )._jdf.queryExecution().executedPlan().toString()
    import re

    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    inprev = [ln for ln in windows if "_in_prev" in ln]
    carry = [ln for ln in windows if "_carry" in ln]
    # a partitioned Window prints TWO trailing lists: ...], [partition
    # cols], [order cols]; an unpartitioned one only the order list
    part_spec = re.compile(r"\], \[_b#\d+L\], \[")
    # the levels-sized window is PARTITIONED by the bucket key ...
    assert len(inprev) == 1 and part_spec.search(inprev[0])
    # ... and the only global window is the carry over |buckets| rows
    assert len(carry) == 1 and not part_spec.search(carry[0])
    assert plan.count("Exchange SinglePartition") == 1

def test_ndcg_at_k_hand_computed(spark):
    import math as m

    from nnanalytics_spark.pipeline import retrieval

    # ranking by score puts the gain-1 doc first; ideal swaps them
    judged = spark.createDataFrame(
        [("q", 1, 1, 10.0), ("q", 2, 3, 5.0)],
        "query string, doc_id long, gain int, score double",
    )
    (row,) = retrieval.ndcg_at_k(judged, k=2).collect()
    d1, d2 = 1.0 / m.log2(2), 1.0 / m.log2(3)
    dcg = round(1 * d1, 9) + round(3 * d2, 9)
    idcg = round(3 * d1, 9) + round(1 * d2, 9)
    assert row["dcg"] == dcg
    assert row["ndcg"] == round(dcg / idcg, 6)
    assert row["ndcg"] < 1.0  # mis-ranked → strictly sub-ideal


def test_ndcg_perfect_ranking_is_one(spark):
    from nnanalytics_spark.pipeline import retrieval

    judged = spark.createDataFrame(
        [("q", i, 10 - i, float(100 - i)) for i in range(1, 6)],
        "query string, doc_id long, gain int, score double",
    )
    (row,) = retrieval.ndcg_at_k(judged, k=3).collect()
    assert row["ndcg"] == 1.0


# -------------------------------------------------- prefix filter join

def test_prefix_filter_matches_bruteforce_jaccard(spark):
    from nnanalytics_spark.pipeline import dedup

    docs = [
        (1, "aa bb cc dd ee"),
        (2, "aa bb cc dd ff"),   # J(1,2) = 4/6 = 0.667
        (3, "aa bb cc dd ee"),   # J(1,3) = 1.0
        (4, "zz yy xx ww vv"),
        (5, "zz yy xx ww vv uu tt ss"),  # J(4,5) = 5/8 = 0.625
        (6, "qq"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.prefix_filter_pairs(df, threshold=0.6).collect()
    }
    sets = {i: set(t.split()) for i, t in docs}
    want = {}
    for i in sets:
        for j in sets:
            if i < j:
                jac = round(
                    len(sets[i] & sets[j]) / len(sets[i] | sets[j]), 6
                )
                if jac >= 0.6:
                    want[(i, j)] = jac
    assert got == want


def test_prefix_filter_excludes_hot_tokens_from_candidates(spark):
    from pyspark.sql import functions as F

    from nnanalytics_spark.pipeline import dedup

    # 'the' appears in EVERY doc (hottest token); with threshold 0.8 and
    # 5-token sets the prefix is 5 - floor(4.0) + 1 = 2 rarest tokens,
    # so 'the' never enters candidate generation — yet the one true
    # near-dup pair (1,2) is still found through its rare tokens
    docs = [(i, f"the w{i}a w{i}b w{i}c w{i}d") for i in range(3, 30)]
    docs += [(1, "the aa bb cc dd"), (2, "the aa bb cc dd")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = dedup.prefix_filter_pairs(df, threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in rows] == [(1, 2, 1.0)]


# ------------------------------------------------------- data contract

def test_contract_check_counts_and_fails_closed(spark):
    from nnanalytics_spark.core import profile

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 20.0)],
        "id long, amount double",
    )
    rows = {
        r["rule"]: r
        for r in profile.contract_check(
            df,
            [
                ("amount_positive", F.col("amount") <= 0),
                ("id_in_range", F.col("id") > 100),
            ],
        ).collect()
    }
    # NULL amount: (amount <= 0) is NULL → fails closed → 2 violations
    assert rows["amount_positive"]["n_violations"] == 2
    assert rows["amount_positive"]["n_checked"] == 4
    assert not rows["amount_positive"]["passed"]
    assert rows["id_in_range"]["n_violations"] == 0
    assert rows["id_in_range"]["passed"]


def test_contract_check_quoted_rule_names_and_empty_input(spark):
    """ADVICE r6: rule names are data, not SQL (apostrophes must not
    break or inject), and an empty input reports 0 violations / passed
    explicitly rather than NULLs."""
    from nnanalytics_spark.core import profile

    df = spark.createDataFrame([(1,)], "id long")
    rows = {
        r["rule"]: r
        for r in profile.contract_check(
            df, [("o'brien's rule; DROP--", F.col("id") < 0)]
        ).collect()
    }
    assert rows["o'brien's rule; DROP--"]["passed"]
    empty = df.filter("id < 0")
    (row,) = profile.contract_check(empty, [("any", F.col("id") < 0)]).collect()
    assert row["n_violations"] == 0
    assert row["n_checked"] == 0
    assert row["passed"] is True


# -------------------------------------------------------------- session

def test_get_spark_warns_when_overrides_ignored(spark):
    """ADVICE r6: get_spark returns the live session untouched; passing
    overrides in that case must emit a RuntimeWarning naming them."""
    import warnings

    from nnanalytics_spark.session import get_spark

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = get_spark(**{"spark.sql.shuffle.partitions": "7777"})
    assert got is not None
    msgs = [str(w.message) for w in caught if w.category is RuntimeWarning]
    assert any("spark.sql.shuffle.partitions" in m for m in msgs)
    # overrides matching the live conf are not worth warning about
    current = got.conf.get("spark.sql.shuffle.partitions")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        get_spark(**{"spark.sql.shuffle.partitions": current})
    assert not [w for w in caught if w.category is RuntimeWarning]


# ----------------------------------------------------------- mad / emd

def test_mad_outliers_hand_computed(spark):
    from nnanalytics_spark.pipeline import stats

    # group g: values 1..5 plus a wild 100 → med 3.5, MAD 1.5
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 100.0]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, x double")
    (row,) = stats.mad_outliers(df, "x", ["grp"]).collect()
    assert row["med"] == 3.5
    assert row["mad"] == 1.5
    # modified z of 100: 0.6745*96.5/1.5 = 43.39... → 1 outlier
    assert row["n_outliers"] == 1
    assert row["max_rz"] == round(0.6745 * 96.5 / 1.5, 6)


def test_emd_identical_distributions_is_zero_and_shift_is_exact(spark):
    from nnanalytics_spark.pipeline import stats

    same = spark.createDataFrame(
        [("a", float(v)) for v in range(10)] + [("b", float(v)) for v in range(10)],
        "side string, x double",
    )
    (row,) = stats.emd_1d(same, "x", F.col("side") == "a", bucket_width=1.0).collect()
    assert row["emd"] == 0.0
    # b = a shifted by exactly one bucket → EMD = 1 × width
    shifted = spark.createDataFrame(
        [("a", float(v)) for v in range(10)]
        + [("b", float(v + 1)) for v in range(10)],
        "side string, x double",
    )
    (row,) = stats.emd_1d(shifted, "x", F.col("side") == "a", bucket_width=1.0).collect()
    assert row["emd"] == 1.0


def test_emd_gap_buckets_weighted_by_distance(spark):
    """ADVICE r6 (high): empty interior buckets carry the CDF gap.
    A entirely at bucket 0, B entirely at bucket 10 → the |ΔCDF| = 1
    plateau persists across 10 bucket-widths, so EMD = 10·width — the
    occupied-bucket-only sum used to return width."""
    from nnanalytics_spark.pipeline import stats

    df = spark.createDataFrame(
        [("a", 0.0)] * 4 + [("b", 10.0)] * 4, "side string, x double"
    )
    (row,) = stats.emd_1d(df, "x", F.col("side") == "a", bucket_width=1.0).collect()
    assert row["emd"] == 10.0
    # width scales linearly and buckets rescale: same points, width 5 →
    # buckets 0 and 2, gap 2 → EMD = 2·5 = 10 (the true |0−10| distance)
    (row,) = stats.emd_1d(df, "x", F.col("side") == "a", bucket_width=5.0).collect()
    assert row["emd"] == 10.0


# ------------------------------------------------------ gini / benford

def test_gini_extremes(spark):
    from nnanalytics_spark.pipeline import stats

    # perfectly equal values → G = 0; total concentration → G → (n-1)/n
    eq = spark.createDataFrame(
        [("g", i, 10.0) for i in range(1, 5)], "grp string, id long, x double"
    )
    (row,) = stats.gini_by_group(eq, "x", ["grp"], id_col="id").collect()
    assert row["gini"] == 0.0
    conc = spark.createDataFrame(
        [("g", 1, 0.0), ("g", 2, 0.0), ("g", 3, 0.0), ("g", 4, 100.0)],
        "grp string, id long, x double",
    )
    (row,) = stats.gini_by_group(conc, "x", ["grp"], id_col="id").collect()
    # one holder of everything among n=4: G = (n-1)/n = 0.75
    assert row["gini"] == 0.75


def test_benford_digit_extraction_and_shares(spark):
    import math as m

    from nnanalytics_spark.pipeline import stats

    # values spanning magnitudes; first digits: 1,1,2,9 (0.5 < 1 drops)
    df = spark.createDataFrame(
        [(1.7,), (123.0,), (29.9,), (9000.1,), (0.5,)], "x double"
    )
    rows = {r["digit"]: r for r in stats.benford_audit(df, "x").collect()}
    assert {d: rows[d]["n_obs"] for d in rows} == {1: 2, 2: 1, 9: 1}
    assert rows[1]["exp_share"] == round(m.log10(2), 6)
    assert rows[1]["obs_share"] == 0.5


# -------------------------------------------------------- theil-sen

def test_theil_sen_robust_to_outlier_where_ols_is_not(spark):
    from nnanalytics_spark.pipeline import stats

    # perfect slope-2 line with one wild outlier at the end
    pts = [(0, 0), (1, 2), (2, 4), (3, 6), (4, 1000)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "grp string, x long, y long"
    )
    (row,) = stats.theil_sen_slope(df, "x", "y", ["grp"]).collect()
    assert row["n_pairs"] == 10
    # median of the 10 pairwise slopes stays 2.0 despite the outlier
    assert row["slope"] == 2.0


def test_theil_sen_skips_vertical_pairs_and_singletons(spark):
    from nnanalytics_spark.pipeline import stats

    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 1, 9), ("a", 2, 7), ("b", 3, 1)],
        "grp string, x long, y long",
    )
    rows = {r["grp"]: r for r in stats.theil_sen_slope(df, "x", "y", ["grp"]).collect()}
    # duplicate-x pair contributes nothing; singleton group b vanishes
    assert set(rows) == {"a"}
    assert rows["a"]["n_pairs"] == 2  # (1,5)->(2,7) and (1,9)->(2,7)
    assert rows["a"]["slope"] == 0.0  # median of {2.0, -2.0}


# ----------------------------------------------------- backfill planner

def test_missing_partitions_lists_only_unmaterialized(spark, tmp_path):
    from nnanalytics_spark.sources import layout

    df = spark.createDataFrame(
        [(i, f"d{i % 4}") for i in range(20)], "id long, day string"
    )
    sink = str(tmp_path / "sink")
    layout.write_partitioned(df.filter("day IN ('d0','d2')"), sink, "day")
    expected = df.select("day").distinct()
    missing = sorted(
        r["day"] for r in layout.missing_partitions(spark, expected, sink, "day").collect()
    )
    assert missing == ["d1", "d3"]


def test_missing_partitions_empty_sink_returns_everything(spark, tmp_path):
    from nnanalytics_spark.sources import layout

    expected = spark.createDataFrame([("a",), ("b",)], "day string")
    missing = sorted(
        r["day"]
        for r in layout.missing_partitions(
            spark, expected, str(tmp_path / "nonexistent"), "day"
        ).collect()
    )
    assert missing == ["a", "b"]


def test_missing_partitions_unescapes_hive_paths(spark, tmp_path):
    """ADVICE r6: Spark writes escaped partition directories (':' →
    '%3A' etc.) and __HIVE_DEFAULT_PARTITION__ for NULL; the planner
    must decode them or those partitions backfill forever."""
    from nnanalytics_spark.sources import layout

    df = spark.createDataFrame(
        [(1, "08:00"), (2, "09:00"), (3, None)], "id long, hr string"
    )
    sink = str(tmp_path / "sink")
    # materialize the escaped-value and the null partitions only
    df.filter("hr = '08:00' OR hr IS NULL").write.partitionBy("hr").parquet(sink)
    expected = df.select("hr").distinct()
    missing = [
        r["hr"]
        for r in layout.missing_partitions(spark, expected, sink, "hr").collect()
    ]
    assert missing == ["09:00"]


def test_unescape_partition_value():
    from nnanalytics_spark.sources.layout import _unescape_partition_value as u

    assert u("08%3A00") == "08:00"
    assert u("a%3Db") == "a=b"
    assert u("100%") == "100%"  # malformed escape passes through
    assert u("%2541") == "%41"  # decodes once, not recursively
    assert u("__HIVE_DEFAULT_PARTITION__") is None


# ------------------------------------------------------------ winnowing

def test_winnowing_guarantee_shared_run_yields_shared_fingerprint(spark):
    from nnanalytics_spark.pipeline import dedup

    # docs 1 and 2 share an 8-token run (>= window+n-1 = 7 with n=4,w=4)
    # embedded in different contexts; doc 3 shares nothing
    shared = "p q r s t u v w"
    docs = [
        (1, f"a b c {shared} d e f"),
        (2, f"x y z {shared} m n o"),
        (3, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = dedup.winnow_fingerprints(df, n=4, window=4)
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_fps"]
        for r in dedup.winnow_shared_pairs(fps).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnowing_density_is_sparse(spark):
    from nnanalytics_spark.pipeline import dedup

    text = " ".join(f"tok{i}" for i in range(200))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_fps = dedup.winnow_fingerprints(df, n=4, window=4).count()
    n_grams = 200 - 4 + 1
    # expected density ~ 2/(w+1) = 0.4; assert well under all-grams
    assert n_fps < 0.6 * n_grams


def test_winnowing_position_bound_raises_not_corrupts(spark):
    """ADVICE r6: a document with more gram positions than the packed
    position field used to flip the pos term negative and corrupt the
    window-min; now it raises at execution time. hash_bits=46 shrinks
    the field to 2^16 positions so the case is testable."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from nnanalytics_spark.pipeline import dedup

    long_text = " ".join(f"t{i}" for i in range(70_000))  # > 2^16 grams
    df = spark.createDataFrame([(1, long_text)], "doc_id long, text string")
    with pytest.raises(SparkRuntimeException, match="gram positions"):
        dedup.winnow_fingerprints(df, n=4, window=4, hash_bits=46).count()
    # and the arg-validation guard: no room left for positions
    with pytest.raises(ValueError, match="position bits"):
        dedup.winnow_fingerprints(df, hash_bits=47)
    # a doc under the bound still fingerprints fine at the same width
    ok = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100)))], "doc_id long, text string"
    )
    assert dedup.winnow_fingerprints(ok, n=4, window=4, hash_bits=46).count() > 0


# ------------------------------------------------------- column entropy

def test_column_entropy_extremes(spark):
    import math as m

    from nnanalytics_spark.core import profile

    df = spark.createDataFrame(
        [(1, "x", None), (2, "x", None), (3, "x", "a"), (4, "x", "b")],
        "id long, const string, mixed string",
    )
    rows = {r["col"]: r for r in profile.column_entropy(df, ["id", "const", "mixed"]).collect()}
    assert rows["const"]["entropy_nats"] == 0.0          # constant column
    assert rows["id"]["entropy_nats"] == round(m.log(4), 6)  # unique column
    # mixed: NULL counts as a value → p = (2/4, 1/4, 1/4)
    want = -(round(0.5 * m.log(0.5), 12) + 2 * round(0.25 * m.log(0.25), 12))
    assert rows["mixed"]["entropy_nats"] == round(want, 6)
    assert rows["mixed"]["n_distinct"] == 3


# --------------------------------------------------------------- did

def test_diff_in_diff_hand_computed(spark):
    from nnanalytics_spark.pipeline import behavior

    # treated: 10 -> 20 (+10); control: 5 -> 7 (+2) => DiD = 8
    rows = [
        (2, 0, 10.0), (2, 100, 20.0),   # treated (even id)
        (1, 0, 5.0), (1, 100, 7.0),     # control (odd id)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long, value double")
    (r,) = behavior.diff_in_diff(
        df, df.user_id % 2 == 0, cutover_ms=50
    ).collect()
    assert (r["n_t_pre"], r["n_t_post"], r["n_c_pre"], r["n_c_post"]) == (1, 1, 1, 1)
    assert r["mean_t_pre"] == 10.0 and r["mean_c_post"] == 7.0
    assert r["did"] == 8.0


# ---------------------------------------------------------- km survival

def test_km_survival_hand_computed(spark):
    from nnanalytics_spark.pipeline import behavior

    DAY = 86_400_000
    # last-activity days: u1->0, u2->0, u3->1, u4->2
    rows = [
        (1, 0 * DAY), (2, 0 * DAY),
        (3, 0 * DAY), (3, 1 * DAY),
        (4, 0 * DAY), (4, 2 * DAY),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")
    got = {r["day"]: r for r in behavior.km_survival(df).collect()}
    # day 0: d=2 of n=4 -> S = 0.5; day 1: d=1 of n=2 -> S = 0.25;
    # day 2: d=1 of n=1 -> S = 0 (closed window: everyone churns)
    assert (got[0]["churned"], got[0]["n_at_risk"], got[0]["survival"]) == (2, 4, 0.5)
    assert (got[1]["churned"], got[1]["n_at_risk"], got[1]["survival"]) == (1, 2, 0.25)
    assert (got[2]["churned"], got[2]["n_at_risk"], got[2]["survival"]) == (1, 1, 0.0)


# --------------------------------------------------------------- cusum

def test_cusum_accumulates_persistent_drift_and_resets(spark):
    from nnanalytics_spark.pipeline import behavior

    HOUR = 3_600_000
    # hours 0-2 at target (no drift), hours 3-5 shifted +10 (drift +5/h
    # after slack), hour 6 collapses far below target (reset to 0)
    rows = []
    for h, mean in [(0, 50.0), (1, 50.0), (2, 50.0), (3, 60.0), (4, 60.0), (5, 60.0), (6, 0.0)]:
        rows += [(h * HOUR + i, mean) for i in range(4)]
    df = spark.createDataFrame(rows, "ts_ms long, value double")
    got = {
        r["hour"]: r
        for r in behavior.cusum_changepoint(
            df, target_mean=50.0, slack=5.0, threshold=12.0
        ).collect()
    }
    # drift per at-target hour = -5 but S floors at 0
    assert got[2]["cusum"] == 0.0 and not got[2]["flagged"]
    assert got[3]["cusum"] == 5.0
    assert got[5]["cusum"] == 15.0 and got[5]["flagged"]
    assert got[6]["cusum"] == 0.0 and not got[6]["flagged"]  # reset


# ------------------------------------------------ srm / overdispersion

def test_srm_detects_broken_assignment(spark):
    from nnanalytics_spark.pipeline import stats

    # 90/10 split against an expected 50/50: huge chi2 terms
    rows = [(i, "x") for i in range(90)] + [(1000 + i, "x") for i in range(10)]
    df = spark.createDataFrame(rows, "user_id long, pad string")
    arm = F.when(F.col("user_id") < 1000, "a").otherwise("b")
    got = {r["arm"]: r for r in stats.srm_check(df, arm, [("a", 0.5), ("b", 0.5)]).collect()}
    assert got["a"]["n_units"] == 90 and got["b"]["n_units"] == 10
    assert got["a"]["obs_share"] == 0.9
    # (90-50)^2/50 = 32
    assert got["a"]["chi2_term"] == 32.0 and got["b"]["chi2_term"] == 32.0


def test_overdispersion_poisson_vs_bursty(spark):
    from nnanalytics_spark.pipeline import stats

    DAY = 86_400_000
    rows = []
    # 'steady': 4 events every day for 4 days -> var 0, dispersion 0
    for d in range(4):
        rows += [("steady", d * DAY + i) for i in range(4)]
    # 'bursty': daily counts 1, 1, 1, 13 -> mean 4, var 36, dispersion 9
    for d, c in enumerate([1, 1, 1, 13]):
        rows += [("bursty", d * DAY + i) for i in range(c)]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long")
    got = {r["event_type"]: r for r in stats.overdispersion(df).collect()}
    assert got["steady"]["var_daily"] == 0.0 and got["steady"]["dispersion"] == 0.0
    assert got["bursty"]["mean_daily"] == 4.0
    assert got["bursty"]["var_daily"] == 36.0
    assert got["bursty"]["dispersion"] == 9.0


# -------------------------------------------------------------- lorenz

def test_lorenz_uniform_and_concentrated(spark):
    from nnanalytics_spark.pipeline import stats

    # all-equal values tie every cutpoint: one decile-1 bucket holding
    # everything (the documented by-value tie semantics)
    eq = spark.createDataFrame(
        [(i, 10.0) for i in range(10)], "user_id long, value double"
    )
    rows = {r["decile"]: r for r in stats.lorenz_deciles(eq, "value", "user_id").collect()}
    assert set(rows) == {1} and rows[1]["n_keys"] == 10 and rows[1]["cum_share"] == 1.0
    # distinct values 1..10: one key per decile, cumulative share = k(k+1)/110
    lin = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "user_id long, value double"
    )
    rows = {r["decile"]: r for r in stats.lorenz_deciles(lin, "value", "user_id").collect()}
    assert all(rows[d]["n_keys"] == 1 for d in range(1, 11))
    assert rows[10]["cum_share"] == 1.0
    assert rows[1]["cum_share"] == round(1 / 55, 6)
    # one whale: the top decile holds nearly everything
    conc = spark.createDataFrame(
        [(i, 1.0) for i in range(9)] + [(9, 991.0)], "user_id long, value double"
    )
    rows = {r["decile"]: r for r in stats.lorenz_deciles(conc, "value", "user_id").collect()}
    assert rows[10]["cents"] == 99100
    assert rows[max(d for d in rows if d < 10)]["cum_share"] <= 0.01


# --------------------------------------------------------- calibration

def test_calibration_bins_perfect_and_miscalibrated(spark):
    from nnanalytics_spark.pipeline import stats

    # perfectly calibrated bin: 4 predictions of 0.75, 3 positives...
    # actually use p=0.75 with acc exactly 0.75 → ece_term 0
    rows = [(0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0)]
    # badly calibrated bin: p=0.05 but always positive
    rows += [(0.05, 1), (0.05, 1)]
    df = spark.createDataFrame(rows, "p double, y int")
    got = {r["bin"]: r for r in stats.calibration_bins(df, "p", "y", bins=10).collect()}
    assert got[7]["confidence"] == 0.75 and got[7]["accuracy"] == 0.75
    assert got[7]["ece_term"] == 0.0
    assert got[0]["accuracy"] == 1.0 and got[0]["confidence"] == 0.05
    # weight 2/6, gap 0.95 → term = round(0.316667, 6)
    assert got[0]["ece_term"] == round(2 / 6 * 0.95, 6)


def test_calibration_top_bin_clamps_p_equal_one(spark):
    from nnanalytics_spark.pipeline import stats

    df = spark.createDataFrame([(1.0, 1), (0.99, 0)], "p double, y int")
    got = {r["bin"]: r for r in stats.calibration_bins(df, "p", "y", bins=10).collect()}
    assert set(got) == {9} and got[9]["n"] == 2  # p=1.0 clamps into bin 9


# ------------------------------------------------------ threshold sweep

def test_jaccard_sweep_counts_are_monotone(spark):
    import __spark_entry__ as entry

    (r,) = entry.q_jaccard_threshold_sweep(spark, "/root/testdata/sf0.001").collect()
    counts = [r[f"ge_{t}"] for t in (50, 60, 70, 80, 90)]
    assert counts == sorted(counts, reverse=True)  # tightening never adds pairs
    assert counts[0] > 0  # the dup-heavy corpus has near-dups at 0.5
