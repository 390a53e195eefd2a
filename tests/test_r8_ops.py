"""Unit tests for the r8 scale reshapes (VERDICT r7 tasks #2/#4):
lossless-composite-blocked record_linkage, cell-bounded kNN positives
for link_negatives, multi-probe bounded_pairs_above for the
dedup-method-agreement report, and the bounded linkage_decisions
exhibit — each pinned against the exact / unblocked reference
computation at test scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nnanalytics_spark.pipeline import dedup, linkage, similarity

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- record_linkage

def test_record_linkage_composite_blocking_is_lossless(spark):
    """The (nation, segment, band +/-1) blocked driver query emits
    exactly the match set the UNBLOCKED nation join emits — the
    losslessness contract behind VERDICT r7 task #2 (match at
    upper=2.0 requires segment AND bal_band agreement, so composing
    them into the block key cannot drop a match)."""
    import __spark_entry__ as entry

    got = sorted(tuple(r) for r in entry.q_record_linkage(spark, SF).collect())
    c = entry._t(spark, SF, "customer")
    a = c.filter(F.col("c_custkey") % 2 == 0)
    b = c.filter(F.col("c_custkey") % 2 == 1)
    want = sorted(
        tuple(r)
        for r in linkage.linkage_pairs(
            a, b, ["c_nationkey"], entry._fs_fields(linkage),
            id_col="c_custkey", upper=2.0, lower=0.0,
        )
        .filter(F.col("decision") == "match")
        .collect()
    )
    assert len(got) > 0
    assert got == want


def test_linkage_decisions_input_is_bounded(spark):
    """The decision-distribution exhibit caps each side at 500 rows, so
    n_pairs sums to the capped nation join's size — never the corpus
    pair space."""
    import __spark_entry__ as entry

    rows = entry.q_linkage_decisions(spark, SF).collect()
    c = entry._t(spark, SF, "customer")
    a = c.filter(F.col("c_custkey") % 2 == 0).orderBy("c_custkey").limit(500)
    b = c.filter(F.col("c_custkey") % 2 == 1).orderBy("c_custkey").limit(500)
    want = a.join(b, "c_nationkey").count()
    assert sum(r["n_pairs"] for r in rows) == want
    assert {r["decision"] for r in rows} <= {"match", "possible", "nonmatch"}


# ------------------------------------------------------ cell_knn

def test_cell_knn_single_cell_equals_exact_knn(spark):
    """With stride > max(id) only vec_id 0 pins a centroid, every
    vector lands in the one cell, and cell_knn IS knn_graph."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    hi = int(emb.agg(F.max("vec_id")).head()[0]) + 1
    got = sorted(tuple(r) for r in similarity.cell_knn(emb, k=3, stride=hi).collect())
    want = sorted(tuple(r) for r in similarity.knn_graph(emb, k=3).collect())
    assert got == want


def test_cell_knn_neighbors_are_cell_local(spark):
    """Every (id, nbr) edge joins two vectors sharing at least one of
    their nprobe=2 probed cells, and ranks are 1..k dense per id in
    (cos desc, nbr asc) order."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = similarity.cell_knn(emb, k=3, stride=200).collect()
    cents = (
        emb.filter(F.col("vec_id") % 200 == 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .collect()
    )
    cells: dict[int, set] = {}
    for r in similarity.assign_cells_rounded(
        emb, [r["v"] for r in cents], nprobe=2
    ).collect():
        cells.setdefault(r["id"], set()).add(r["cell"])
    assert len(cents) == 3  # 500 ids, stride 200 -> centroids 0/200/400
    by_id: dict[int, list] = {}
    for r in out:
        assert cells[r["vec_id"]] & cells[r["nbr"]]
        by_id.setdefault(r["vec_id"], []).append(r)
    for rows in by_id.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        key = [(-r["cos_sim"], r["nbr"]) for r in rows]
        assert key == sorted(key)


def test_link_negatives_cell_method(spark):
    """method="cell": positives == cell_knn edges, negatives never
    collide with a positive (the accidental-hit anti-join), and an
    unknown method raises."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = similarity.link_negatives(emb, k_pos=3, k_neg=3, method="cell", stride=200)
    rows = out.collect()
    pos = {(r["anchor"], r["other"]) for r in rows if r["label"] == 1}
    neg = {(r["anchor"], r["other"]) for r in rows if r["label"] == 0}
    want_pos = {
        (r["vec_id"], r["nbr"])
        for r in similarity.cell_knn(emb, k=3, stride=200).collect()
    }
    assert pos == want_pos
    assert pos.isdisjoint(neg)
    assert all(a != o for a, o in neg)
    with pytest.raises(ValueError, match="method"):
        similarity.link_negatives(emb, method="lsh")


# -------------------------------------------- bounded_pairs_above

def test_bounded_pairs_above_equals_exact_at_test_scale(spark):
    """nprobe=2 multi-probe recovers EVERY threshold-0.4 pair of the
    exact O(n²) kernel on the test corpus (the documented bound the
    driver query's agreement numbers rest on), with identical round-6
    scores."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in similarity.all_pairs_above(emb, threshold=0.4).collect()
    }
    bounded = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in similarity.bounded_pairs_above(emb, 0.4, stride=200).collect()
    }
    assert len(exact) > 0
    assert bounded == exact


def test_bounded_pairs_candidate_rescore_is_exact(spark):
    """Caller-supplied candidate pairs are re-scored with the exact
    round-6 cosine and thresholded — a below-threshold candidate never
    leaks into the output, an above-threshold one always appears even
    from a cell the probe misses (guaranteed n_both exactness for
    pair_set_agreement)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.all_pairs_above(emb, threshold=0.0).collect()
    }
    # candidates: two real pairs straddling the threshold + one junk id pair
    above = min(p for p, s in exact.items() if s >= 0.4)
    below = min(p for p, s in exact.items() if s < 0.1)
    cand = spark.createDataFrame(
        [above, below], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.bounded_pairs_above(
            emb, 0.4, candidate_pairs=cand, stride=200
        ).collect()
    }
    assert above in out and out[above] == exact[above]
    assert below not in out


def test_pair_set_agreement_bounded_matches_exact_report(spark):
    """The driver query's full agreement row (bounded semantic side)
    equals the exact-kernel report at test scale — the regression pin
    for VERDICT r7 task #4's "within the documented bound" criterion."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    lex = dedup.ngram_jaccard_pairs(docs, threshold=0.6, max_shingle_df=100).select(
        "id_a", "id_b"
    )
    bounded = dedup.pair_set_agreement(
        lex,
        similarity.bounded_pairs_above(
            emb, 0.4, candidate_pairs=lex, stride=200
        ).select("id_a", "id_b"),
    ).collect()[0]
    exact = dedup.pair_set_agreement(
        lex, similarity.all_pairs_above(emb, threshold=0.4).select("id_a", "id_b")
    ).collect()[0]
    assert tuple(bounded) == tuple(exact)


# ------------------------------------------------- survivor_diff

def test_survivor_diff_all_four_reasons(spark):
    """Closed-form corpus versioning: two snapshots hand-built so each
    change reason fires exactly once — added (new unique content),
    promoted (shadowed doc whose winner was removed), removed (survivor
    gone), displaced (better copy arrived)."""
    old = spark.createDataFrame(
        [
            (1, "alpha beta"),   # winner of family "alpha beta" (longer? same) — id tie-break
            (2, "alpha beta"),   # shadowed duplicate
            (3, "gamma delta"),  # unique survivor, will be removed
            (4, "epsilon zeta"), # survivor, will be displaced
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (2, "alpha beta"),        # old winner 1 removed -> 2 promoted
            (4, "epsilon zeta"),
            (0, "epsilon zeta plus"), # same family? no — different text
            (5, "eta theta"),         # brand-new unique -> added
            (6, "epsilon zeta more words"),  # longer twin? different text
        ],
        "doc_id long, text string",
    )
    # use a 1-token prefix key so families collapse on the first word
    key = F.element_at(F.split(dedup.normalized(F.col("text")), " "), 1)
    out = {
        (r["doc_id"], r["change"], r["reason"])
        for r in dedup.survivor_diff(old, new, key=key).collect()
    }
    # families by first token: alpha{1,2}, gamma{3}, epsilon{4,0,6}
    # old survivors: alpha->1 (len tie, min id), gamma->3, epsilon->4
    # new survivors: alpha->2, epsilon->6 (longest), eta->5
    assert out == {
        (2, "entered", "promoted"),
        (5, "entered", "added"),
        (6, "entered", "added"),
        (3, "left", "removed"),
        (1, "left", "removed"),
        (4, "left", "displaced"),
    }


def test_keep_best_custom_key_groups_families(spark):
    """keep_best(key=...) groups by the caller's canonical key and the
    winner maximizes (quality, -id) within the family."""
    df = spark.createDataFrame(
        [(1, "aa x", 5.0), (2, "aa y", 9.0), (3, "bb z", 1.0)],
        "doc_id long, text string, q double",
    )
    key = F.element_at(F.split(F.col("text"), " "), 1)
    rows = {
        r["norm_text"]: (r["keep_id"], r["keep_quality"], r["dup_count"])
        for r in dedup.keep_best(df, quality_col="q", key=key).collect()
    }
    assert rows == {"aa": (2, 9.0, 2), "bb": (3, 1.0, 1)}


def test_multi_probe_assignment_shape(spark):
    """nprobe=2 emits exactly two DISTINCT cells per vector, ranked by
    (round-6 cos desc, cell asc); nprobe=1 stays the argmax path."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = (
        emb.filter(F.col("vec_id") % 200 == 0)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .collect()
    )
    cvecs = [r["v"] for r in cents]
    one = similarity.assign_cells_rounded(emb, cvecs).groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in one)
    two = similarity.assign_cells_rounded(emb, cvecs, nprobe=2).collect()
    per = {}
    for r in two:
        per.setdefault(r["id"], set()).add(r["cell"])
    assert all(len(cells) == 2 for cells in per.values())
    # the nprobe=1 cell is always among the nprobe=2 cells
    top1 = {
        r["id"]: r["cell"]
        for r in similarity.assign_cells_rounded(emb, cvecs).collect()
    }
    assert all(top1[i] in cells for i, cells in per.items())


# -------------------------------------------- r8 net-new operators

def test_t_closeness_closed_form(spark):
    """Hand-computed TVD: global dist of sens over 8 rows = {0: 1/2,
    1: 1/2}; class A (4 rows, all sens=0) has TVD = ½(|1−.5| + .5) =
    0.5; class B (4 rows, 2/2 split) has TVD 0. Only A violates at
    t=0.2, and the closed-form absent-value fold prices sens=1 (absent
    from A) correctly."""
    from nnanalytics_spark.pipeline import privacy

    rows = [("A", 0)] * 4 + [("B", 0)] * 2 + [("B", 1)] * 4
    # global = {0: 6/10, 1: 4/10}; A all-0: TVD = ½(|1−.6| + .4) = .4
    # (the .4 term is sens=1, ABSENT from A — the closed-form fold);
    # B (2/6, 4/6): TVD = ½(|1/3−.6| + |2/3−.4|) = .266667
    df = spark.createDataFrame(rows, "qi string, sens int")
    out = privacy.t_closeness_violations(df, ["qi"], "sens", t=0.3).collect()
    assert len(out) == 1
    (r,) = out
    assert r["qi"] == "A" and r["class_size"] == 4
    assert r["t_distance"] == 0.4
    both = {
        r["qi"]: r["t_distance"]
        for r in privacy.t_closeness_violations(df, ["qi"], "sens", t=0.1).collect()
    }
    assert both == {"A": 0.4, "B": 0.266667}
    assert (
        privacy.t_closeness_violations(df, ["qi"], "sens", t=0.41).count() == 0
    )


def test_classifier_auc_known_values(spark):
    """Perfect ranking → AUC 1; reversed → 0; all-tied scores → 0.5;
    a hand case with one tie → (wins + ½·ties)/(P·N)."""
    from nnanalytics_spark.pipeline import stats

    perfect = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "p double, y int"
    )
    assert stats.classifier_auc(perfect, "p", "y").head()["auc"] == 1.0
    reverse = spark.createDataFrame(
        [(0.1, 1), (0.2, 0)], "p double, y int"
    )
    assert stats.classifier_auc(reverse, "p", "y").head()["auc"] == 0.0
    tied = spark.createDataFrame(
        [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)], "p double, y int"
    )
    assert stats.classifier_auc(tied, "p", "y").head()["auc"] == 0.5
    # pos scores {0.7, 0.5}, neg {0.5, 0.3}: pairs = 4; wins: .7>.5, .7>.3,
    # .5>.3 = 3; tie: .5=.5 → ½ → AUC = 3.5/4
    mixed = spark.createDataFrame(
        [(0.7, 1), (0.5, 1), (0.5, 0), (0.3, 0)], "p double, y int"
    )
    row = stats.classifier_auc(mixed, "p", "y").head()
    assert (row["n_pos"], row["n_neg"], row["auc"]) == (2, 2, 0.875)


def test_interval_overlap_join_matches_bruteforce(spark):
    """The banded plan emits each overlapping pair EXACTLY once —
    including pairs whose overlap spans several shared bands — and
    equals the naive non-equi join."""
    from nnanalytics_spark.core import joins

    a = spark.createDataFrame(
        [(1, 10, 0, 25), (1, 11, 40, 45), (2, 12, 0, 5), (1, 13, 90, 99)],
        "user long, id long, s long, e long",
    )
    b = spark.createDataFrame(
        [(1, 20, 5, 50), (1, 21, 24, 26), (2, 22, 6, 8), (3, 23, 0, 100)],
        "user long, id long, s long, e long",
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in joins.interval_overlap_join(
            a, b, ["user"], "s", "e", "s", "e", band_width=10
        ).collect()
    )
    want = sorted(
        (ra[1], rb[1])
        for ra in a.collect()
        for rb in b.collect()
        if ra[0] == rb[0] and ra[2] <= rb[3] and rb[2] <= ra[3]
    )
    assert got == want
    # sanity: the fixture includes a pair overlapping across >1 band
    # (a 10: [0,25] vs b 20: [5,50] share bands 0,1,2) — counted once
    assert (10, 20) in got and got.count((10, 20)) == 1


def test_bootstrap_ci_deterministic_and_sane(spark):
    """Poisson bootstrap: rand()-free, so two runs are identical; a
    constant metric has a zero-width interval at the constant; for a
    real column the interval brackets the mean."""
    from nnanalytics_spark.pipeline import stats

    const = spark.createDataFrame(
        [(i, 7.5) for i in range(100)], "id long, v double"
    )
    row = stats.bootstrap_ci(const, "v", "id", replicates=50).head()
    assert (row["ci_lo"], row["ci_hi"], row["mean"]) == (7.5, 7.5, 7.5)
    assert (row["n"], row["replicates"]) == (100, 50)

    df = spark.createDataFrame(
        [(i, float(i % 13)) for i in range(500)], "id long, v double"
    )
    r1 = stats.bootstrap_ci(df, "v", "id", replicates=100).head()
    r2 = stats.bootstrap_ci(df, "v", "id", replicates=100).head()
    assert tuple(r1) == tuple(r2)
    assert r1["ci_lo"] <= r1["mean"] <= r1["ci_hi"]
    assert r1["ci_lo"] < r1["ci_hi"]  # non-degenerate width


def test_cuped_perfect_and_hand_case(spark):
    """y perfectly linear in x → variance_reduction 1 and theta = the
    slope; a hand-computed 3-unit case replays the closed form."""
    from nnanalytics_spark.pipeline import stats

    lin = spark.createDataFrame(
        [(u, 2.0 * u + 1.0, float(u)) for u in range(1, 21)],
        "unit long, y double, x double",
    )
    row = stats.cuped_adjustment(lin, "y", "x", "unit").head()
    assert row["theta"] == 2.0
    assert row["var_adjusted"] == 0.0
    assert row["variance_reduction"] == 1.0

    # units: (x, y) = (0,1), (1,3), (2,4) — var_x = 2/3, cov = 1,
    # theta = 1.5, var_y = 14/9, var_adj = 14/9 - 1.5 = 1/18
    hand = spark.createDataFrame(
        [(1, 1.0, 0.0), (2, 3.0, 1.0), (3, 4.0, 2.0)],
        "unit long, y double, x double",
    )
    r = stats.cuped_adjustment(hand, "y", "x", "unit").head()
    assert r["n_units"] == 3
    assert r["theta"] == 1.5
    assert r["var_y"] == round(14 / 9, 6)
    assert r["var_adjusted"] == round(14 / 9 - 1.5, 6)


def test_conformal_threshold_guarantee_and_rank(spark):
    """Closed-form: 9 calibration scores 1..9, alpha=0.2 → k =
    ceil(10·0.8) = 8 → q_hat = 8; test rows 5 and 9 → coverage 0.5
    (5 ≤ 8 covered, 9 > 8 not)."""
    from nnanalytics_spark.pipeline import stats

    rows = [(float(i), True) for i in range(1, 10)] + [
        (5.0, False),
        (9.0, False),
    ]
    df = spark.createDataFrame(rows, "score double, cal boolean")
    r = stats.conformal_threshold(df, "score", "cal", alpha=0.2).head()
    assert (r["n_cal"], r["n_test"]) == (9, 2)
    assert r["q_hat"] == 8.0
    assert r["test_coverage"] == 0.5
    # alpha so strict that k caps at n_cal -> q_hat = max score
    r2 = stats.conformal_threshold(df, "score", "cal", alpha=0.01).head()
    assert r2["q_hat"] == 9.0


def test_jackknife_ratio_hand_case(spark):
    """3 units with (y, x) = (2,1), (4,2), (6,3): every leave-one-out
    ratio is exactly 2 → se 0 and a zero-width interval at 2."""
    from nnanalytics_spark.pipeline import stats

    exact = spark.createDataFrame(
        [(1, 2.0, 1.0), (2, 4.0, 2.0), (3, 6.0, 3.0)],
        "u long, num double, den double",
    )
    r = stats.jackknife_ratio_ci(exact, "num", "den", "u").head()
    assert (r["ratio"], r["jk_se"], r["ci_lo"], r["ci_hi"]) == (2.0, 0.0, 2.0, 2.0)
    # heterogeneous units -> positive se, interval brackets the ratio
    mixed = spark.createDataFrame(
        [(1, 10.0, 1.0), (2, 1.0, 1.0), (3, 5.0, 2.0), (4, 0.0, 1.0)],
        "u long, num double, den double",
    )
    r2 = stats.jackknife_ratio_ci(mixed, "num", "den", "u").head()
    assert r2["jk_se"] > 0
    assert r2["ci_lo"] < r2["ratio"] < r2["ci_hi"]


def test_rake_keywords_hand_corpus(spark):
    """Classic RAKE behavior on a tiny corpus: multiword phrases whose
    words co-occur in long runs outrank frequent isolated words."""
    from nnanalytics_spark.pipeline import lexical

    docs = spark.createDataFrame(
        [
            (1, "deep learning models and deep learning data"),
            (2, "the deep learning models"),
            (3, "data of models"),
        ],
        "doc_id long, text string",
    )
    rows = lexical.rake_keywords(docs, top_k=10).collect()
    by_phrase = {r["phrase"]: r for r in rows}
    # phrases: doc1 -> "deep learning models" (grp pre-'and'),
    # "deep learning data"; doc2 -> "deep learning models"; doc3 ->
    # "data", "models"
    assert by_phrase["deep learning models"]["n_occurrences"] == 2
    assert by_phrase["deep learning models"]["n_words"] == 3
    # word stats: deep: freq 3, degree 9 -> 3; learning: 3/9 -> 3;
    # models: freq 3, degree 3+3+1 = 7 -> 7/3; data: freq 2, degree 3+1=4 -> 2
    assert by_phrase["deep learning models"]["score"] == round(3 + 3 + 7 / 3, 6)
    assert by_phrase["deep learning data"]["score"] == round(3 + 3 + 2.0, 6)
    assert by_phrase["data"]["score"] == 2.0
    assert by_phrase["models"]["score"] == round(7 / 3, 6)
    # ranking: the 3-word phrases outrank the singletons
    assert rows[0]["phrase"] == "deep learning models"


def test_capture_recapture_hand_case(spark):
    """Chapman estimator on a closed case: A finds 5 pairs, B finds 4,
    overlap 2 → N̂ = 6·5/3 − 1 = 9, union 7, blind spot 2."""
    a = spark.createDataFrame(
        [(i, i + 100) for i in range(5)], "id_a long, id_b long"
    )
    b = spark.createDataFrame(
        [(i, i + 100) for i in (0, 1, 50, 51)], "id_a long, id_b long"
    )
    r = dedup.capture_recapture(a, b).head()
    assert (r["n_a"], r["n_b"], r["n_both"], r["n_union"]) == (5, 4, 2, 7)
    assert r["n_hat"] == 9.0
    assert r["miss_hat"] == 2.0
    assert r["ci_lo"] <= r["n_hat"] <= r["ci_hi"]
    # identical detectors -> N̂ = union and zero blind spot / zero se
    r2 = dedup.capture_recapture(a, a).head()
    assert r2["n_hat"] == 5.0 and r2["miss_hat"] == 0.0 and r2["se"] == 0.0


def test_source_ablation_closed_form(spark):
    """Three sources with known means: removing the low-quality source
    raises the corpus mean (negative delta = the source pulls DOWN)."""
    from nnanalytics_spark.pipeline import sampling

    rows = (
        [("good", 0.9)] * 4 + [("mid", 0.5)] * 4 + [("bad", 0.1)] * 2
    )
    df = spark.createDataFrame(rows, "source string, q double")
    out = {r["source"]: r for r in sampling.source_ablation(df, "q").collect()}
    # full mean = (3.6 + 2.0 + 0.2)/10 = 0.58
    assert out["bad"]["n_docs"] == 2 and out["bad"]["share"] == 0.2
    assert out["bad"]["mean_in_source"] == 0.1
    assert out["bad"]["loo_mean"] == 0.7  # (5.8 - 0.2)/8
    assert out["bad"]["delta"] == round(0.58 - 0.7, 6)  # pulls mean down
    assert out["good"]["loo_mean"] == round((5.8 - 3.6) / 6, 6)
    assert out["good"]["delta"] > 0  # pulls mean up


# ------------------------------------------------ experiment monitoring

def test_mde_power_closed_form(spark):
    """Hand case: control per-unit sums {1,2,3} (s²=1), treatment {2,4}
    (s²=2) — MDE = (1.959964+0.841621)·sqrt(1/3 + 2/2)."""
    from nnanalytics_spark.pipeline import stats

    rows = [(1, "control", 1.0), (2, "control", 2.0), (3, "control", 3.0),
            (4, "treatment", 2.0), (5, "treatment", 4.0)]
    df = spark.createDataFrame(rows, ["user_id", "arm", "value"])
    r = stats.mde_power(df, "value", "user_id", "arm").collect()[0]
    import math

    se = math.sqrt(1.0 / 3 + 2.0 / 2)
    assert r["n_control"] == 3 and r["n_treatment"] == 2
    assert r["mean_control"] == 2.0
    assert r["sd_control"] == 1.0
    assert abs(r["mde_abs"] - round((1.959964 + 0.841621) * se, 6)) < 1e-9
    assert abs(r["mde_rel"] - round((1.959964 + 0.841621) * se / 2.0, 6)) < 1e-9


def test_mde_power_splits_rows_within_units(spark):
    """Two rows for the same unit must collapse to ONE per-unit sum
    before the variance — the randomization-unit discipline."""
    from nnanalytics_spark.pipeline import stats

    rows = [(1, "control", 0.5), (1, "control", 0.5), (2, "control", 2.0),
            (3, "control", 3.0), (4, "treatment", 2.0), (5, "treatment", 4.0)]
    df = spark.createDataFrame(rows, ["user_id", "arm", "value"])
    r = stats.mde_power(df, "value", "user_id", "arm").collect()[0]
    assert r["n_control"] == 3  # not 4: unit 1 collapses
    assert r["sd_control"] == 1.0


def test_msprt_monotone_and_day1_lambda(spark):
    """p_always_valid is nonincreasing by construction, and day-1
    Lambda matches the closed form recomputed in Python from the
    pinned sigma^2."""
    import math

    from nnanalytics_spark.pipeline import stats

    rows = []
    for day, arm, vals in [
        (0, "control", [1.0, 2.0]), (0, "treatment", [3.0, 4.0]),
        (1, "control", [1.5]), (1, "treatment", [5.0]),
        (2, "control", [2.0, 1.0]), (2, "treatment", [4.5, 5.5]),
    ]:
        rows += [(day, arm, v) for v in vals]
    df = spark.createDataFrame(rows, ["day", "arm", "value"])
    out = stats.msprt_always_valid(df, "value", "arm", "day").orderBy("day").collect()
    ps = [r["p_always_valid"] for r in out]
    assert ps == sorted(ps, reverse=True)
    vals = [v for _, _, v in rows]
    n = len(vals)
    sig2 = round(sum(v * v for v in vals) / n - (sum(vals) / n) ** 2, 9)
    nc = nt = 2
    delta = (3.0 + 4.0) / 2 - (1.0 + 2.0) / 2
    v_n = sig2 * (1.0 / nc + 1.0 / nt)
    lam = round(
        math.sqrt(v_n / (v_n + sig2))
        * math.exp(delta * delta * sig2 / (2.0 * v_n * (v_n + sig2))),
        9,
    )
    assert out[0]["lambda_n"] == round(lam, 6)
    assert out[0]["p_always_valid"] == round(min(1.0, 1.0 / lam), 6)


def test_bh_fdr_textbook(spark):
    """BH on p = {0.005, 0.01, 0.03, 0.04}: raw m·p/i = {0.02, 0.02,
    0.04, 0.04}, step-up adjusted identical; q=0.03 rejects exactly the
    first two."""
    from nnanalytics_spark.pipeline import stats

    rows = [("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.005)]
    df = spark.createDataFrame(rows, ["metric", "p_value"])
    out = {
        r["metric"]: r
        for r in stats.bh_fdr(df, "p_value", ["metric"], q=0.03).collect()
    }
    assert out["d"]["p_adj"] == 0.02 and out["a"]["p_adj"] == 0.02
    assert out["c"]["p_adj"] == 0.04 and out["b"]["p_adj"] == 0.04
    assert out["d"]["reject"] and out["a"]["reject"]
    assert not out["c"]["reject"] and not out["b"]["reject"]
    assert [out[k]["p_rank"] for k in ("d", "a", "c", "b")] == [1, 2, 3, 4]


# ------------------------------------------------ isotonic / good-turing

def test_isotonic_fit_pools_violations(spark):
    """Bin rates [0.1, 0.4, 0.3, 0.8] — PAVA pools the middle pair to
    0.35 and leaves the monotone ends alone."""
    from nnanalytics_spark.pipeline import stats

    rows = []
    for b, (n, pos) in enumerate([(10, 1), (10, 4), (10, 3), (10, 8)]):
        p = b / 10 + 0.05
        rows += [(p, 1)] * pos + [(p, 0)] * (n - pos)
    df = spark.createDataFrame(rows, ["p", "y"])
    out = {r["bin"]: r for r in stats.isotonic_fit(df, "p", "y", bins=10).collect()}
    assert out[0]["iso_rate"] == 0.1
    assert out[1]["iso_rate"] == 0.35 and out[2]["iso_rate"] == 0.35
    assert out[3]["iso_rate"] == 0.8
    assert out[1]["raw_rate"] == 0.4 and out[2]["raw_rate"] == 0.3


def test_isotonic_fit_weighted_pooling(spark):
    """Unequal bin weights: rates 0.5 (n=2) then 0.3 (n=10) pool to the
    WEIGHTED mean 4/12, not the midpoint."""
    from nnanalytics_spark.pipeline import stats

    rows = [(0.15, 1), (0.15, 0)] + [(0.25, 1)] * 3 + [(0.25, 0)] * 7
    df = spark.createDataFrame(rows, ["p", "y"])
    out = {r["bin"]: r for r in stats.isotonic_fit(df, "p", "y", bins=10).collect()}
    assert out[1]["iso_rate"] == out[2]["iso_rate"] == round(4 / 12, 6)


def test_isotonic_fit_monotone_and_mass_preserving(spark):
    """On the real corpus probe: iso_rate is nondecreasing in bin and
    Σ n·iso equals Σ y (PAVA preserves each pooled block's mass)."""
    import __spark_entry__ as entry

    rows = entry.q_isotonic_calibration(spark, SF).collect()
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)
    got = sum(r["n"] * r["iso_rate"] for r in rows)
    want = sum(r["n"] * r["raw_rate"] for r in rows)
    assert abs(got - want) < 1e-3


def test_good_turing_hand_corpus(spark):
    """Corpus 'a a a b b c': N=6, N1=N2=N3=1 — pins every closed-form
    column including the r=0 unseen mass N1/N."""
    from nnanalytics_spark.pipeline import text as t

    df = spark.createDataFrame([(1, "a a a b b c")], ["doc_id", "text"])
    out = {r["r"]: r for r in t.good_turing(df).collect()}
    assert out[0]["gt_mass"] == round(1 / 6, 6) and out[0]["r_star"] == 0.0
    assert out[1]["r_star"] == 2.0 and out[1]["ml_mass"] == round(1 / 6, 6)
    assert out[2]["r_star"] == 3.0 and out[2]["gt_mass"] == 0.5
    assert out[3]["r_star"] == 0.0 and out[3]["ml_mass"] == 0.5
    assert out[4]["n_types"] == 0 and out[5]["gt_mass"] == 0.0


# ------------------------------------------------ tail index / CMH

def test_hill_tail_index_closed_form(spark):
    """Frequencies {32,16,8,4,...}: k=3 gives terms ln8+ln4+ln2 = 6·ln2,
    so alpha = 3/(6·ln2) with the same 9-dp term quantization."""
    import math

    from nnanalytics_spark.pipeline import stats

    rows = [("a", 32), ("b", 16), ("c", 8), ("d", 4), ("e", 2), ("f", 1)]
    df = spark.createDataFrame(rows, ["tok", "cnt"])
    r = stats.hill_tail_index(df, "cnt", "tok", k=3).collect()[0]
    s = sum(round(math.log(x / 4.0), 9) for x in (32, 16, 8))
    assert r["n_keys"] == 6 and r["k"] == 3 and r["tail_threshold"] == 4
    assert r["hill_alpha"] == round(3 / s, 6)
    assert r["alpha_se"] == round(3 / s / math.sqrt(3.0), 6)


def test_hill_tail_index_needs_k_plus_one_keys(spark):
    """Fewer than k+1 distinct keys → one row with NULL hill_alpha
    (the r9 ADVICE fix: diagnosable, never a wrong number and never a
    silently-vanishing result)."""
    from nnanalytics_spark.pipeline import stats

    rows = stats.hill_tail_index(
        spark.createDataFrame([("a", 5), ("b", 3)], ["tok", "cnt"]),
        "cnt",
        "tok",
        k=100,
    ).collect()
    assert len(rows) == 1
    assert rows[0]["hill_alpha"] is None and rows[0]["n_keys"] == 2


def test_stratified_association_simpsons_reversal(spark):
    """Textbook reversal: both strata have OR < 1 (S1 54/84, S2 42/72)
    but the pooled crude OR is 1.5 — reversed must be True and CMH
    96/156 stays on the stratified side."""
    from pyspark.sql import functions as F

    from nnanalytics_spark.pipeline import stats

    rows = []
    for s, a, b, c, d in [("S1", 18, 12, 7, 3), ("S2", 2, 8, 9, 21)]:
        rows += [(s, 1, 1)] * a + [(s, 1, 0)] * b + [(s, 0, 1)] * c + [(s, 0, 0)] * d
    df = spark.createDataFrame(rows, ["stratum", "e", "o"])
    out = {
        r["stratum"]: r
        for r in stats.stratified_association(
            df, F.col("e") == 1, F.col("o") == 1, "stratum"
        ).collect()
    }
    assert out["S1"]["odds_ratio"] == round(54 / 84, 6)
    assert out["S2"]["odds_ratio"] == round(42 / 72, 6)
    t = out["TOTAL"]
    assert t["odds_ratio"] == 1.5
    assert t["cmh_or"] == round(96 / 156, 6)
    assert t["reversed"] is True
    assert (t["a"], t["b"], t["c"], t["d"]) == (20, 20, 16, 24)


# ------------------------------------------ NB fit / entropy rate / QTE

def test_negbinom_fit_closed_form(spark):
    """Daily counts {1,3,8}: mean 4, var 13 → r=16/9, p=4/13,
    P(0)=(4/13)^(16/9); an exactly-Poisson-or-under group reports
    NULL fit columns."""
    from nnanalytics_spark.pipeline import stats

    rows = []
    for day, c in [(0, 1), (1, 3), (2, 8)]:
        rows += [("bursty", day * 86400000 + i) for i in range(c)]
    for day in range(3):
        rows += [("flat", day * 86400000 + i) for i in range(5)]
    df = spark.createDataFrame(rows, ["event_type", "ts_ms"])
    out = {r["event_type"]: r for r in stats.negbinom_fit(df).collect()}
    b = out["bursty"]
    assert b["mean_daily"] == 4.0 and b["var_daily"] == 13.0
    assert b["nb_r"] == round(16 / 9, 6) and b["nb_p"] == round(4 / 13, 6)
    assert b["p_zero"] == round((4 / 13) ** (16 / 9), 6)
    f = out["flat"]
    assert f["var_daily"] == 0.0
    assert f["nb_r"] is None and f["nb_p"] is None and f["p_zero"] is None


def test_entropy_rate_hand_chain(spark):
    """Sequence A A A B: from-A distribution {A:2, B:1} →
    H_A = (2/3)ln(3/2) + (1/3)ln 3, and the TOTAL rate equals H_A
    (state A owns all transitions); a deterministic A B A B chain
    rates 0."""
    import math

    from nnanalytics_spark.pipeline import behavior

    rows = [(1, i, i * 1000, t) for i, t in enumerate(["A", "A", "A", "B"])]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts_us", "event_type"])
    out = {r["from_type"]: r for r in behavior.entropy_rate(df).collect()}
    h_a = round(
        round((2 / 3) * math.log(3 / 2), 9) + round((1 / 3) * math.log(3), 9), 6
    )
    assert out["A"]["h_nats"] == h_a and out["A"]["n_out"] == 3
    assert out["TOTAL"]["h_nats"] == h_a and out["TOTAL"]["share"] == 1.0

    det = [(1, i, i * 1000, t) for i, t in enumerate(["A", "B", "A", "B", "A"])]
    ddf = spark.createDataFrame(det, ["user_id", "event_id", "ts_us", "event_type"])
    tot = [r for r in behavior.entropy_rate(ddf).collect() if r["from_type"] == "TOTAL"]
    assert tot[0]["h_nats"] == 0.0


def test_quantile_treatment_interpolation(spark):
    """Per-unit sums control {1,2,3,4} vs treatment {2,4,6,8}: the
    interpolated medians are 2.5 and 5.0, so QTE(0.5)=2.5; QTE(0.25)
    = 3.5-1.75."""
    from nnanalytics_spark.pipeline import stats

    rows = [(i, "control", float(i)) for i in (1, 2, 3, 4)]
    rows += [(10 + i, "treatment", 2.0 * i) for i in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, ["user_id", "arm", "value"])
    out = {r["q"]: r for r in stats.quantile_treatment(df, "value", "user_id", "arm").collect()}
    assert out[0.5]["control_q"] == 2.5 and out[0.5]["treatment_q"] == 5.0
    assert out[0.5]["qte"] == 2.5
    assert out[0.25]["control_q"] == 1.75 and out[0.25]["treatment_q"] == 3.5
    assert out[0.9]["qte"] == round(7.4 - 3.7, 6)


# ------------------------------------- balance / gains / autocorrelation

def test_covariate_balance_closed_form(spark):
    """Covariate with identical arm distributions → SMD 0, balanced;
    one shifted by exactly 1 pooled-SD → SMD 1, unbalanced."""
    from nnanalytics_spark.pipeline import stats

    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows.append((i, "control", v, v))
        rows.append((100 + i, "treatment", v, v + 1.0))  # sd=1 in both arms
    df = spark.createDataFrame(rows, ["user_id", "arm", "same", "shifted"])
    out = {
        r["covariate"]: r
        for r in stats.covariate_balance(df, ["same", "shifted"], "arm").collect()
    }
    assert out["same"]["smd"] == 0.0 and out["same"]["balanced"]
    assert out["shifted"]["smd"] == 1.0 and not out["shifted"]["balanced"]


def test_gains_curve_closed_form(spark):
    """Two bins: top bin holds 8 of 10 positives in half the examples →
    cum_recall 0.8 at share 0.5, lift 1.6; full curve ends at (1, 1, 1)."""
    from nnanalytics_spark.pipeline import stats

    rows = [(0.95, 1)] * 8 + [(0.95, 0)] * 2 + [(0.05, 1)] * 2 + [(0.05, 0)] * 8
    df = spark.createDataFrame(rows, ["p", "y"])
    out = {r["bin"]: r for r in stats.gains_curve(df, "p", "y", bins=10).collect()}
    top = out[9]
    assert top["cum_frac_examples"] == 0.5 and top["cum_recall"] == 0.8
    assert top["lift"] == 1.6
    bot = out[0]
    assert bot["cum_frac_examples"] == 1.0 and bot["cum_recall"] == 1.0
    assert bot["lift"] == 1.0


def test_autocorrelation_alternating_series(spark):
    """Daily counts alternating 1,3,1,3,...: lag-1 ACF is −1·(n_pairs/n)
    -ish; exact closed form from the centered products — recomputed in
    Python with the same 9-dp quantization."""
    from nnanalytics_spark.pipeline import stats

    counts = [1, 3] * 5  # 10 days
    rows = []
    for day, c in enumerate(counts):
        rows += [("t", day * 86400000 + i) for i in range(c)]
    df = spark.createDataFrame(rows, ["event_type", "ts_ms"])
    out = {
        r["lag"]: r for r in stats.autocorrelation(df, max_lag=2).collect()
    }
    mu = round(sum(counts) / len(counts), 9)
    dx = [c - mu for c in counts]
    den = sum(round(d * d, 9) for d in dx)
    num1 = sum(round(dx[i] * dx[i + 1], 9) for i in range(9))
    num2 = sum(round(dx[i] * dx[i + 2], 9) for i in range(8))
    assert out[1]["acf"] == round(num1 / den, 6) and out[1]["n_pairs"] == 9
    assert out[2]["acf"] == round(num2 / den, 6) and out[2]["n_pairs"] == 8
    assert out[1]["acf"] < 0 < out[2]["acf"]


# ----------------------------------------- code detection / holt

def test_code_score_separates_code_from_prose(spark):
    """A python snippet scores high (symbols + keywords + snake_case),
    plain prose scores near zero, and the report's share reflects the
    0.5 threshold."""
    from nnanalytics_spark.pipeline import text as t

    code = "def snake_case_fn(arg_one): return arg_one + other_val;"
    prose = "the quiet afternoon settled over the harbor town gently"
    df = spark.createDataFrame(
        [(1, code, "src"), (2, prose, "src")], ["doc_id", "text", "source"]
    )
    rep = t.code_detection_report(df).collect()[0]
    assert rep["n_docs"] == 2 and rep["n_code"] == 1
    assert rep["code_share"] == 0.5
    base = df.select(
        t.tokens(F.col("text")).alias("_toks"), F.col("text").alias("_txt")
    )
    scores = sorted(
        r[0] for r in base.select(t.code_score(F.col("_txt"), F.col("_toks"))).collect()
    )
    assert scores[0] < 0.1 and scores[1] >= 0.5


def test_holt_forecast_hand_series(spark):
    """Counts {2,4,6}: l1=2, b1=2 → step x=4: l=4,b=2 → step x=6: l=6,
    b=2 — a perfect linear series converges to its own slope, and the
    7-day forecast extrapolates it."""
    from nnanalytics_spark.pipeline import stats

    rows = []
    for day, c in [(0, 2), (1, 4), (2, 6)]:
        rows += [("t", day * 86400000 + i) for i in range(c)]
    df = spark.createDataFrame(rows, ["event_type", "ts_ms"])
    r = stats.holt_forecast(df).collect()[0]
    assert r["n_days"] == 3
    assert r["level"] == 6.0 and r["trend"] == 2.0
    assert r["forecast_1d"] == 8.0 and r["forecast_7d"] == 20.0


def test_holt_forecast_rejects_unpinned_smoothing(spark):
    """alpha/beta outside the literal-complement table raise — the
    1-x ulp-drift guard."""
    import pytest as _pytest

    from nnanalytics_spark.pipeline import stats

    df = spark.createDataFrame([("t", 0)], ["event_type", "ts_ms"])
    with _pytest.raises(ValueError):
        stats.holt_forecast(df, alpha=0.42)


# ----------------------------------- df sweep / fp collisions / AA

def test_shingle_df_sweep_closed_form(spark):
    """Three docs sharing one 3-gram ('x y z' df=3); caps below 3 drop
    it — candidate_pairs falls by C(3,2)=3 and the count matches the
    direct Σ df(df−1)/2."""
    from nnanalytics_spark.pipeline import dedup

    docs = [
        (1, "x y z a b c"),
        (2, "x y z d e f"),
        (3, "x y z g h i"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["cap"]: r for r in dedup.shingle_df_sweep(df, caps=(2, 3)).collect()}
    # every other shingle is unique (df=1, 0 pairs); 'x y z' df=3 -> 3 pairs
    assert out[3]["candidate_pairs"] == 3 and out[3]["n_hot_dropped"] == 0
    assert out[2]["candidate_pairs"] == 0 and out[2]["n_hot_dropped"] == 1
    assert out[2]["pair_reduction"] == 1.0 and out[3]["pair_reduction"] == 0.0


def test_fingerprint_collisions_counts_false_merges(spark):
    """Identical texts share a fingerprint legitimately (0 colliding
    pairs); a synthetic corpus of distinct texts reports collisions
    only if fingerprints actually clash."""
    from nnanalytics_spark.pipeline import dedup

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "different text")],
        ["doc_id", "text"],
    )
    r = dedup.fingerprint_collisions(df).collect()[0]
    assert r["n_docs"] == 3
    assert r["colliding_pairs"] == 0  # duplicates are NOT collisions
    assert r["n_fingerprints"] == 2


def test_aa_test_null_on_identical_halves(spark):
    """Two A/A halves drawn identically → z = 0, pass; a deliberately
    shifted half fails the bound."""
    from pyspark.sql import functions as F

    from nnanalytics_spark.pipeline import stats

    rows = [(i, float(v)) for i, v in zip(range(8), [1, 2, 3, 4, 1, 2, 3, 4])]
    df = spark.createDataFrame(rows, ["user_id", "value"])
    r = stats.aa_test(df, "value", "user_id", split_a=(F.col("user_id") < 4)).collect()[0]
    assert r["z_stat"] == 0.0 and r["aa_pass"]

    shifted = [(i, float(v)) for i, v in zip(range(8), [1, 2, 3, 4, 101, 102, 103, 104])]
    df2 = spark.createDataFrame(shifted, ["user_id", "value"])
    r2 = stats.aa_test(df2, "value", "user_id", split_a=(F.col("user_id") < 4)).collect()[0]
    assert not r2["aa_pass"] and abs(r2["z_stat"]) > 50


# ------------------------------------------------ streaming holt

def test_stream_holt_parity_matches_python_recursion(spark):
    """The streamed sink for one user equals the Python replay of the
    (l, b) recursion in (ts, event_id) order — the within-horizon
    arrival-order-independence contract."""
    import __spark_entry__ as entry

    rows = entry.q_stream_holt_parity(spark, SF).collect()
    assert len(rows) > 0
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    uid, urows = sorted(by_user.items())[0]
    ev = (
        entry._events(spark, SF)
        .filter(F.col("user_id") == uid)
        .select("event_id", "ts_ms", "value")
        .collect()
    )
    ev.sort(key=lambda r: (r["ts_ms"], r["event_id"]))
    a, oma, b_, omb = 0.5, 1.0 - 0.5, 0.3, 1.0 - 0.3
    l = b = 0.0
    want = {}
    for i, e in enumerate(ev):
        x = e["value"]
        if i == 0:
            l, b = x, 0.0
        else:
            ln = a * x + oma * (l + b)
            b = b_ * (ln - l) + omb * b
            l = ln
        want[e["event_id"]] = (round(l, 6), round(b, 6))
    for r in urows:
        assert (r["level"], r["trend"]) == want[r["event_id"]]


# ------------------------------------------------ dedup QA ops

def test_cluster_cohesion_chain_vs_clique(spark):
    """A 3-clique (cohesion 1.0) and a 3-chain (2 edges / 3 possible =
    0.666667) land in the same band with the right mean and min."""
    from nnanalytics_spark.pipeline import dedup as dd

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 7)], ["doc_id"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3),   # clique {1,2,3}
         (4, 5), (5, 6)],          # chain {4,5,6}
        ["id_a", "id_b"],
    )
    out = {r["size_band"]: r for r in dd.cluster_cohesion(docs, pairs).collect()}
    b = out["3-4"]
    assert b["n_clusters"] == 2 and b["n_members"] == 6
    assert b["min_cohesion"] == round(2 / 3, 6)
    # (1.0 + 0.666667)/2 = 0.8333335 → Spark/DuckDB round HALF-UP to
    # 0.833334 (Python's round() banker's-rounds the other way)
    assert b["avg_cohesion"] == 0.833334


def test_review_sample_deterministic_and_stratified(spark):
    """The sample is identical across runs, at most k per band, and
    ranked by the portable Knuth hash."""
    from nnanalytics_spark.pipeline import dedup as dd

    rows = [(a, a + 100, 0.65 + (a % 30) * 0.01) for a in range(1, 60)]
    pairs = spark.createDataFrame(rows, ["id_a", "id_b", "jaccard"])
    s1 = sorted(tuple(r) for r in dd.review_sample(pairs, k=3).collect())
    s2 = sorted(tuple(r) for r in dd.review_sample(pairs, k=3).collect())
    assert s1 == s2 and len(s1) > 0
    from collections import Counter

    per_band = Counter(r[0] for r in s1)
    assert all(v <= 3 for v in per_band.values())
    assert set(per_band) <= {"<0.7", "0.7-0.8", "0.8-0.9", "0.9+"}
    # rank-1 row per band is the hash argmin
    for band in per_band:
        band_rows = [(a, b) for bb, rk, a, b, j in s1 if bb == band]
        expect = min(((a * 1000003 + b) % 1000000007, a, b) for a, b in
                     ((r[0], r[1]) for r in rows
                      if (band == "0.9+" and r[2] >= 0.9)
                      or (band == "0.8-0.9" and 0.8 <= r[2] < 0.9)
                      or (band == "0.7-0.8" and 0.7 <= r[2] < 0.8)
                      or (band == "<0.7" and r[2] < 0.7)))
        got1 = [(a, b) for bb, rk, a, b, j in s1 if bb == band and rk == 1][0]
        assert got1 == (expect[1], expect[2])


# -------------------------------- PII density / weighted q / sample size

def test_weighted_quantile_byte_vs_doc_median(spark):
    """Many small high-quality docs and one huge low-quality doc: the
    (unweighted) doc median is high but the char-weighted median is the
    big doc's value — the exact failure mode this operator exposes."""
    from nnanalytics_spark.pipeline import stats

    rows = [("s", 0.9, 10)] * 9 + [("s", 0.2, 1000)]
    df = spark.createDataFrame(rows, ["source", "q", "n_chars"])
    r = stats.weighted_quantile(df, "q", "n_chars", "source").collect()[0]
    assert r["w_total"] == 1090
    assert r["wq50"] == 0.2  # median byte lives in the big dirty doc
    assert r["wq90"] == 0.2


def test_weighted_quantile_uniform_weights_match_rank(spark):
    """With unit weights the weighted quantile is the order statistic
    at ceil(q*n)."""
    from nnanalytics_spark.pipeline import stats

    rows = [("s", float(v), 1) for v in range(1, 11)]
    df = spark.createDataFrame(rows, ["source", "q", "w"])
    r = stats.weighted_quantile(df, "q", "w", "source").collect()[0]
    assert r["wq50"] == 5.0 and r["wq90"] == 9.0


def test_sample_size_grid_inverts_mde(spark):
    """At the MDE the required n equals the observed n (up to ceil):
    feeding mde_rel back through the grid returns n within one unit of
    the actual arm size."""
    from nnanalytics_spark.pipeline import stats

    rows = [(i, "control" if i % 2 else "treatment", float(1 + (i * 7) % 13))
            for i in range(200)]
    df = spark.createDataFrame(rows, ["user_id", "arm", "value"])
    mde = stats.mde_power(df, "value", "user_id", "arm").collect()[0]
    grid = stats.sample_size_grid(
        df, "value", "user_id", "arm", rel_effects=(mde["mde_rel"],)
    ).collect()[0]
    # n_c = n_t = 100; formula uses (s2c + s2t) vs MDE's s2c/nc + s2t/nt
    assert abs(grid["n_per_arm"] - 100) <= 1


def test_pii_density_report_counts(spark):
    """One email + one IP in 1000 chars → 1.0 per 1k each."""
    from nnanalytics_spark.pipeline import text as t

    body = ("x" * 978) + " a@b.com 1.2.3.4"  # 978 + 17 chars... pad below
    body = body.ljust(1000, "y")
    df = spark.createDataFrame([(1, body, "s")], ["doc_id", "text", "source"])
    r = t.pii_density_report(df).collect()[0]
    assert r["n_chars"] == 1000
    assert r["n_email"] == 1 and r["n_ipv4"] == 1
    assert r["email_per_1k"] == 1.0 and r["ipv4_per_1k"] == 1.0


# -------------------------------- MK trend / runs test / length QA

def test_mann_kendall_monotone_and_flat(spark):
    """Strictly increasing daily counts give S = C(n,2), z > 1.96,
    'increasing'; a constant series gives S = 0, z = 0, 'none' (all
    ties → corr kills the variance... n=8 constant has var 0; use the
    z=0 branch via S=0 with mixed ties instead)."""
    from nnanalytics_spark.pipeline import stats

    rows = []
    for day in range(10):
        rows += [("up", day * 86400000 + i) for i in range(day + 1)]
    # palindromic 2,3,3,2: the up-pairs and down-pairs cancel exactly
    for day, c in enumerate([2, 3, 3, 2]):
        rows += [("flat", day * 86400000 + i) for i in range(c)]
    df = spark.createDataFrame(rows, ["event_type", "ts_ms"])
    out = {r["event_type"]: r for r in stats.mann_kendall(df).collect()}
    up = out["up"]
    assert up["s_stat"] == 45 and up["trend"] == "increasing"  # C(10,2)
    flat = out["flat"]
    assert flat["s_stat"] == 0 and flat["z"] == 0.0 and flat["trend"] == "none"


def test_runs_test_alternating_vs_blocked(spark):
    """Perfectly alternating series has the MAX number of runs (z > 0,
    non-random at this n is borderline — assert sign), while a fully
    blocked series [low...low, high...high] has 2 runs and z < 0."""
    from nnanalytics_spark.pipeline import stats

    rows = []
    for day, c in enumerate([1, 5] * 6):
        rows += [("alt", day * 86400000 + i) for i in range(c)]
    for day, c in enumerate([1] * 6 + [5] * 6):
        rows += [("blk", day * 86400000 + i) for i in range(c)]
    df = spark.createDataFrame(rows, ["event_type", "ts_ms"])
    out = {r["event_type"]: r for r in stats.runs_test(df).collect()}
    assert out["alt"]["runs"] == 12 and out["alt"]["z"] > 0
    assert out["blk"]["runs"] == 2 and out["blk"]["z"] < 0
    assert not out["blk"]["random"]


def test_dedup_rate_by_length_flags_short_dupes(spark):
    """Duplicates planted only among the shortest docs surface in the
    low deciles; long docs report dup_rate 0."""
    from nnanalytics_spark.pipeline import dedup as dd

    rows = [(i, "short text", 10) for i in range(20)]          # all dupes of id 0
    rows += [(100 + i, f"long unique text {i} " * 20, 400 + i) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "n_chars"])
    out = dd.dedup_rate_by_length(df).collect()
    lo = [r for r in out if r["avg_len"] < 100]
    hi = [r for r in out if r["avg_len"] >= 100]
    assert sum(r["n_dupes"] for r in lo) == 19  # keeper is id 0
    assert all(r["n_dupes"] == 0 for r in hi)


# --------------------------------------- LSH planner / token savings

def test_lsh_plan_scurve_closed_form(spark):
    """A single pair at jaccard exactly 0.8 with (b=16, r=8): expected
    recall is the literal S-curve value 1 − (1 − 0.8⁸)¹⁶, and s50
    matches the closed form; more bands ⇒ lower s50 (looser)."""
    from nnanalytics_spark.pipeline import dedup as dd

    pairs = spark.createDataFrame([(1, 2, 0.8)], ["id_a", "id_b", "jaccard"])
    out = {(r["b"], r["r"]): r for r in dd.lsh_plan(pairs).collect()}
    want = round(round(1.0 - (1.0 - 0.8**8.0) ** 16.0, 9), 6)
    assert out[(16, 8)]["expected_recall"] == want
    assert out[(16, 8)]["s50"] == round((1 - 0.5 ** (1 / 16)) ** (1 / 8), 6)
    s50s = [out[(b, r)]["s50"] for b, r in ((64, 2), (32, 4), (16, 8), (8, 16))]
    assert s50s == sorted(s50s)  # fewer rows per band -> lower crossover


def test_token_dedup_savings_cross_source_charge(spark):
    """A duplicate of srcA's doc living in srcB charges the savings to
    srcB (the dropped copy's source); unique docs save nothing."""
    from nnanalytics_spark.pipeline import dedup as dd

    rows = [
        (1, "the same text", "A"),
        (2, "the same text", "B"),   # dropped: min id is 1
        (3, "unique words here", "B"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r for r in dd.token_dedup_savings(df).collect()}
    assert out["A"]["token_savings"] == 0.0 and out["A"]["n_kept"] == 1
    assert out["B"]["n_kept"] == 1 and out["B"]["tokens_kept"] == 3
    assert out["B"]["token_savings"] == 0.5  # 3 of 6 tokens dropped


# ------------------------------------------- confusion / DP release

def test_confusion_matrix_shares(spark):
    """Two true classes, one systematic confusion: shares normalize per
    TRUE row (0.75/0.25 and 1.0)."""
    from nnanalytics_spark.pipeline import stats

    rows = [("a", "a")] * 3 + [("a", "b")] + [("b", "b")] * 2
    df = spark.createDataFrame(rows, ["t", "p"])
    out = {(r["true_label"], r["pred_label"]): r
           for r in stats.confusion_matrix(df, "t", "p").collect()}
    assert out[("a", "a")]["share_of_true"] == 0.75
    assert out[("a", "b")]["share_of_true"] == 0.25
    assert out[("b", "b")]["share_of_true"] == 1.0


def test_dp_release_noise_shape_and_privacy(spark):
    """The noise is deterministic run-over-run (hence invertible — the
    r9 flag makes callers acknowledge that), mean |noise| is in the
    Laplace(1) ballpark, the budget columns carry the closed forms,
    and calling without the acknowledgement raises."""
    import math

    from nnanalytics_spark.pipeline import privacy

    df = spark.createDataFrame(
        [(i, f"src{i % 10}") for i in range(1000)], ["doc_id", "source"]
    )
    with pytest.raises(ValueError, match="deterministic"):
        privacy.dp_release(df)
    r1 = {
        r["source"]: r
        for r in privacy.dp_release(df, unsafe_deterministic_noise=True).collect()
    }
    r2 = {
        r["source"]: r
        for r in privacy.dp_release(df, unsafe_deterministic_noise=True).collect()
    }
    assert r1.keys() == r2.keys()
    noises = []
    for s, r in r1.items():
        assert r["released_count"] == r2[s]["released_count"]  # deterministic
        noises.append(abs(r["released_count"] - 100))
        assert r["eps_basic"] == 10.0 and r["k_queries"] == 10
        assert r["eps_advanced"] == round(
            math.sqrt(20 * math.log(1e6)) + 10 * (math.e - 1), 6
        )
    assert 0.05 < sum(noises) / len(noises) < 5.0  # Laplace(1) ballpark
    assert any(n > 0 for n in noises)


# ------------------------------------- b-bit minhash / half-life

def test_minhash_bbit_identical_docs_zero_error(spark):
    """Identical texts: full and 2-bit estimates are both exactly 1 at
    jaccard 1.0 — MAE 0 in the 0.9+ band."""
    from nnanalytics_spark.pipeline import dedup as dd

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta")],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(1, 2, 1.0)], ["id_a", "id_b", "jaccard"])
    r = dd.minhash_bbit_audit(docs, pairs).collect()[0]
    assert r["band"] == "0.9+" and r["n_pairs"] == 1
    assert r["mae_full"] == 0.0 and r["mae_2bit"] == 0.0


def test_minhash_bbit_correction_recenters(spark):
    """Disjoint texts (true jaccard 0): the raw 2-bit collision rate
    sits near 1/4 by chance, and the (p−r)/(1−r) correction pulls the
    estimate back toward 0 — corrected error strictly below the
    uncorrected collision fraction."""
    from pyspark.sql import functions as F

    from nnanalytics_spark.pipeline import dedup as dd

    # words long enough that the polynomial hash lands near the 2^53
    # prime — tiny h0 values keep (2i+1)h0+c below the modulus, which
    # degenerates every linear permutation to the same argmin (a
    # portable-path-only artifact; the xxhash64 production path mixes
    # regardless)
    wa = " ".join(f"alphaword{i:04d}x" for i in range(12))
    wb = " ".join(f"betawordy{i:04d}z" for i in range(12))
    docs = spark.createDataFrame([(1, wa), (2, wb)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 2, 0.0)], ["id_a", "id_b", "jaccard"])
    sigs = dd.minhash_signatures(docs, k=64, portable=True)
    a, b = [r["signature"] for r in sigs.orderBy("id").collect()]
    raw_2bit = sum(1 for x, y in zip(a, b) if x % 4 == y % 4) / 64
    r = dd.minhash_bbit_audit(docs, pairs).collect()[0]
    assert r["band"] == "0.5-0.7"  # bands floor at the audit's 0.5 cut
    assert r["mae_2bit"] == round(round(abs((raw_2bit - 0.25) / 0.75), 9), 6)
    assert r["mae_2bit"] < raw_2bit


def test_freshness_half_life_synthetic_decay(spark):
    """Counts halving every 2 days: slope = −ln2/2 (exact in the 9-dp
    pinned regression) and half-life = 2 days; a flat series reports
    NULL."""
    import math

    from nnanalytics_spark.pipeline import behavior

    rows = []
    # day 0 oldest..day 3 newest with counts 8,8? build: age = max-day
    for day, c in enumerate([2, 4, 8, 16]):  # newest day has 16: decays with age
        rows += [(day * 86400000 + i) for i in range(c)]
    df = spark.createDataFrame([(t,) for t in rows], ["ts_ms"])
    r = behavior.freshness_half_life(df).collect()[0]
    assert r["n_days"] == 4
    # ln(count) vs age: ages 3,2,1,0 -> ln2,2ln2,3ln2,4ln2: slope -ln2
    assert abs(r["slope"] - round(-math.log(2), 6)) < 2e-6
    assert abs(r["half_life_days"] - 1.0) < 1e-4

    flat = spark.createDataFrame(
        [(d * 86400000 + i,) for d in range(4) for i in range(5)], ["ts_ms"]
    )
    rf_ = behavior.freshness_half_life(flat).collect()[0]
    assert rf_["slope"] == 0.0 and rf_["half_life_days"] is None
