"""Unit tests for the r6b operators: containment pairs, RRF fusion, MMR
rerank, privacy audits (k-anonymity / l-diversity), seasonal index,
dyadic time-decay scores, z-order layout, CDC changelog compaction —
closed-form fixtures with hand-computed expectations (the driver oracle
battery covers sf-scale parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nnanalytics_spark.pipeline import behavior, dedup, privacy, retrieval
from nnanalytics_spark.sources import layout
from nnanalytics_spark.streaming.refresh import (
    apply_compacted_changelog,
    compact_changelog,
)


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    # doc 2 (4 shingles) is wholly embedded in doc 1 (12 shingles):
    # containment C(2→1) = 1.0 while jaccard = 4/12 = 0.33
    host = "a b c d e f " + "p q r s t u v w"
    docs = spark.createDataFrame(
        [(1, host), (2, "a b c d e f"), (3, "zz yy xx ww")],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in dedup.containment_pairs(docs, n=3, threshold=0.9).collect()
    }
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    # id_a < id_b, so c_ab is containment of doc 1 IN doc 2's direction:
    # |∩|/|sh(1)| = 4/12, c_ba = 4/4 = 1.0
    assert r["c_ba"] == 1.0
    assert abs(r["c_ab"] - round(4 / 12, 6)) < 1e-9
    # jaccard on the same pair would be 4/12 — below any dedup threshold
    jac = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.9).collect()
    assert not [x for x in jac if (x["id_a"], x["id_b"]) == (1, 2)]


def test_rrf_fuse_integer_picos_and_consensus(spark):
    # doc 10 is rank 2 in both lists; doc 1 rank 1 in list A only,
    # doc 2 rank 1 in list B only. RRF favors the consensus doc:
    # 2*floor(1e12/62) > floor(1e12/61) + floor(1e12/63)
    a = spark.createDataFrame(
        [(1, 0.9), (10, 0.8), (3, 0.1)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 0.9), (10, 0.8), (4, 0.1)], "doc_id long, score double"
    )
    got = retrieval.rrf_fuse([a, b], topk=10).collect()
    assert got[0]["doc_id"] == 10
    assert got[0]["rrf_picos"] == 2 * (10**12 // 62)
    assert got[0]["n_lists"] == 2
    by_id = {r["doc_id"]: r["rrf_picos"] for r in got}
    assert by_id[1] == by_id[2] == 10**12 // 61


def test_mmr_rerank_prefers_diverse_second_pick(spark):
    # candidate 1 is the best match; candidate 2 is a near-clone of 1
    # (cos ≈ 1), candidate 3 is orthogonal with slightly lower rel.
    # Plain ranking picks (1, 2, 3); MMR at λ=0.7 must pick 3 second.
    rows = [
        (1, [1.0, 0.0], 0.99),
        (2, [0.999, 0.045], 0.98),
        (3, [0.0, 1.0], 0.60),
    ]
    pool = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, rel double"
    )
    got = retrieval.mmr_rerank(pool, k=3, lam=0.7).orderBy("pick").collect()
    assert [r["vec_id"] for r in got] == [1, 3, 2]
    assert [r["pick"] for r in got] == [1, 2, 3]
    # step-1 score is just λ·rel
    assert abs(got[0]["mmr_score"] - round(0.7 * 0.99, 6)) < 1e-9


def test_k_anonymity_summary_and_violations(spark):
    df = spark.createDataFrame(
        [(30, "m")] * 5 + [(30, "f")] * 2 + [(40, "m")],
        "age long, sex string",
    )
    v = privacy.k_anonymity_violations(df, ["age", "sex"], k=5).collect()
    assert {(r["age"], r["sex"], r["class_size"]) for r in v} == {
        (30, "f", 2),
        (40, "m", 1),
    }
    s = privacy.k_anonymity_summary(df, ["age", "sex"], k=5).head()
    assert (s["n_classes"], s["violating_classes"]) == (3, 2)
    assert (s["rows_at_risk"], s["achieved_k"]) == (3, 1)


def test_l_diversity_flags_uniform_sensitive_class(spark):
    df = spark.createDataFrame(
        [(30, "a", "flu"), (30, "a", "flu"), (30, "b", "flu"), (30, "b", "cold")],
        "age long, zip string, dx string",
    )
    v = privacy.l_diversity_violations(df, ["age", "zip"], "dx", 2).collect()
    assert len(v) == 1 and v[0]["zip"] == "a" and v[0]["l_distinct"] == 1


def test_seasonal_index_uniform_series_is_flat_1e6(spark):
    # constant value ⇒ every cell mean equals the group mean exactly
    rows = [(i, 3_600_000 * i, 2.5, "x") for i in range(48)]
    ev = spark.createDataFrame(rows, "event_id long, ts_ms long, value double, event_type string")
    got = behavior.seasonal_index(ev).collect()
    assert len(got) == 48
    assert all(r["index_ppm"] == 1_000_000 for r in got)
    # hour-of-week fields derive from epoch millis: hour 0 of day 0 is
    # (epoch_day 0 + 4) % 7 = Thursday=4
    first = [r for r in got if r["hod"] == 0][0]
    assert first["dow"] == 4


def test_time_decay_scores_dyadic_exactness(spark):
    day = 86_400_000
    ev = spark.createDataFrame(
        [(7, 2 * day, 3.00), (7, 1 * day, 1.00), (8, 2 * day, 0.50)],
        "user_id long, ts_ms long, value double",
    )
    got = {
        r["user_id"]: int(r["decayed_cents_x2h"])
        for r in behavior.time_decay_scores(ev, horizon_days=40).collect()
    }
    # user 7: 300·2^40 (age 0) + 100·2^39 (age 1); user 8: 50·2^40
    assert got[7] == 300 * 2**40 + 100 * 2**39
    assert got[8] == 50 * 2**40


def test_zorder_key_interleaves_bits(spark):
    df = spark.range(1).select(
        layout.zorder_key(F.lit(3), F.lit(1), bits=4).alias("z"),
        layout.zorder_key(F.lit(0), F.lit(15), bits=4).alias("z2"),
    )
    row = df.head()
    # x=0b11 → bits 0,2; y=0b01 → bit 1 ⇒ z = 0b111 = 7
    assert row["z"] == 7
    # y=0b1111 → odd positions 1,3,5,7 ⇒ 0b10101010 = 170
    assert row["z2"] == 170


def test_zorder_shards_bound_both_dimensions(spark):
    # 32×32 grid of points: z-order shards must each cover a bounded
    # rectangle (extent well below the full 0..255 range on BOTH axes),
    # which is the property that makes two-column pruning work
    pts = spark.range(1024).select(
        (F.col("id") % 32 * 8).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    stats = layout.zorder_layout_stats(
        pts, x="x", y="y", x_max=256.0, y_max=32.0, bits=8, shards=16
    ).collect()
    assert sum(r["n_rows"] for r in stats) == 1024
    for r in stats:
        assert r["x_max"] - r["x_min"] <= 128
        assert r["y_max"] - r["y_min"] <= 128


def test_cdc_compact_latest_wins_and_merge(spark):
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    log = spark.createDataFrame(
        [
            (1, "a2", "upsert", 1),
            (1, None, "delete", 2),   # latest for key 1 → delete
            (2, "b2", "upsert", 5),
            (4, "d", "upsert", 1),    # brand-new key
            (5, "e", "delete", 3),    # equal-seq tie below
            (5, "e", "upsert", 3),    # upsert wins the tie
        ],
        "id long, v string, op string, seq long",
    )
    net = {r["id"]: r for r in compact_changelog(log).collect()}
    assert net[1]["op"] == "delete"
    assert net[5]["op"] == "upsert"
    merged = {
        r["id"]: r["v"]
        for r in apply_compacted_changelog(snap, log).collect()
    }
    assert merged == {2: "b2", 3: "c", 4: "d", 5: "e"}


def test_psi_drift_identical_halves_zero_terms(spark):
    day = 86_400_000
    # same bucket mix on both sides of the midpoint ⇒ every term 0
    rows = []
    for d in (0, 1, 2, 3):
        rows += [(d * day, 10.0), (d * day, 60.0)]
    ev = spark.createDataFrame(rows, "ts_ms long, value double")
    from nnanalytics_spark.pipeline import stats as stats_mod

    got = stats_mod.psi_drift(ev).collect()
    assert all(r["psi_term"] == 0.0 for r in got)
    # drifted: bucket 0 only in half a, bucket 1 only in half b
    rows = [(0, 10.0), (1 * day, 10.0), (2 * day, 60.0), (3 * day, 60.0)]
    ev2 = spark.createDataFrame(rows, "ts_ms long, value double")
    got2 = {r["bucket"]: r for r in stats_mod.psi_drift(ev2).collect()}
    assert got2[0]["n_a"] == 2 and got2[0]["n_b"] == 0
    assert got2[0]["psi_term"] > 0 and got2[1]["psi_term"] > 0


def test_span_corruption_closed_form(spark):
    from nnanalytics_spark.pipeline import text as text_mod

    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 20)), (2, " ".join(["w"] * 5)), (3, "w")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text_mod.span_corruption_stats(docs).collect()}
    # 20 tokens: 1 full block → 1 span, 3 masked, inputs 18, targets 5
    assert (got[1]["n_spans"], got[1]["n_masked"]) == (1, 3)
    assert (got[1]["inputs_len"], got[1]["targets_len"]) == (18, 5)
    # 5 tokens: partial block → 1 span, 3 masked, inputs 3, targets 5
    assert (got[2]["inputs_len"], got[2]["targets_len"]) == (3, 5)
    # 1 token: span of 1
    assert (got[3]["n_spans"], got[3]["n_masked"]) == (1, 1)
    assert (got[3]["inputs_len"], got[3]["targets_len"]) == (1, 3)


def test_lsh_recall_eval_bucket_extremes(spark):
    from nnanalytics_spark.pipeline import similarity as sim

    v = [1.0, 0.5, -0.25, 2.0]
    neg = [-x for x in v]
    rows = [(0, v), (1, neg)] + [(i, v) for i in range(10, 30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["query_id"]: r
        for r in sim.lsh_recall_eval(emb, n_queries=2, k=10, bits=8, dim=4).collect()
    }
    # query 0: every corpus vector is identical → same signature bucket,
    # LSH top-10 == exact top-10 (cos ties broken by id)
    assert got[0]["n_candidates"] == 20
    assert got[0]["n_hits"] == 10 and got[0]["recall_at_k"] == 1.0
    # query 1 (negated): all hyperplane signs flip → empty bucket
    assert got[1]["n_candidates"] == 0
    assert got[1]["n_hits"] == 0 and got[1]["recall_at_k"] == 0.0


def test_knn_label_eval_separable_clusters_perfect(spark):
    from nnanalytics_spark.pipeline import similarity as sim

    # two well-separated clusters: LOO 3-NN must classify perfectly
    rows = [(i, [10.0 + (i % 3) * 0.01, 0.0], 0) for i in range(6)] + [
        (i, [0.0, 10.0 + (i % 3) * 0.01], 1) for i in range(6, 12)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {r["label"]: r for r in sim.knn_label_eval(emb, k=3).collect()}
    assert got[0]["n"] == 6 and got[0]["accuracy"] == 1.0
    assert got[1]["n"] == 6 and got[1]["accuracy"] == 1.0
    # flip one vector's label: its 3 neighbors still vote the cluster
    # label, so exactly that one row is "wrong"
    rows2 = rows[:11] + [(11, [0.0, 10.02], 0)]
    emb2 = spark.createDataFrame(rows2, "vec_id long, embedding array<double>, label int")
    got2 = {r["label"]: r for r in sim.knn_label_eval(emb2, k=3).collect()}
    assert got2[0]["n_correct"] == 6 and got2[0]["n"] == 7
    assert got2[1]["accuracy"] == 1.0


def test_lateness_report_buckets_and_running_max(spark):
    from nnanalytics_spark.pipeline import behavior

    m = 60_000
    # arrival order 1..5: ts 100m, 99m (1m late), 100m, 40m (60m late,
    # vs running max 100m), 200m (in order)
    ev = spark.createDataFrame(
        [(7, 1, 100 * m), (7, 2, 99 * m), (7, 3, 100 * m), (7, 4, 40 * m), (7, 5, 200 * m)],
        "user_id long, event_id long, ts_ms long",
    )
    got = {r["lateness_bucket"]: r for r in behavior.lateness_report(ev).collect()}
    assert got["0_in_order"]["n_events"] == 3  # first, equal-ts, and 200m
    assert got["1_le_1min"]["n_events"] == 1
    assert got["2_le_1hour"]["n_events"] == 1
    assert got["2_le_1hour"]["max_late_ms"] == 60 * m


def test_multi_touch_attribution_splits_evenly(spark):
    m = 60_000
    # user 1: two touches before one purchase of 3.00; user 2: one touch
    ev = spark.createDataFrame(
        [
            (1, 1, 0 * m, "click", 0.0),
            (1, 2, 1 * m, "view", 0.0),
            (1, 3, 2 * m, "purchase", 3.00),
            (2, 4, 0 * m, "click", 0.0),
            (2, 5, 1 * m, "purchase", 1.00),
            (3, 6, 0 * m, "purchase", 9.00),  # no touches: unattributed
        ],
        "user_id long, event_id long, ts_ms long, event_type string, value double",
    )
    got = {r["touch_type"]: r for r in behavior.multi_touch_attribution(ev).collect()}
    assert got["click"]["n_credits"] == 2
    # user 1's purchase splits 1/2 + user 2's full credit
    assert got["click"]["conversions_ppm"] == 500_000 + 1_000_000
    assert got["click"]["revenue_cents"] == 150 + 100
    assert got["view"]["conversions_ppm"] == 500_000
    assert got["view"]["revenue_cents"] == 150


def test_rfm_scores_quintiles_and_segment(spark):
    day = 86_400_000
    rows = []
    for u in range(10):
        # user u: last event u days before the max, u+1 events of 1.00
        for i in range(u + 1):
            rows.append((u, (30 - u) * day + i, 1.00))
    ev = spark.createDataFrame(rows, "user_id long, ts_ms long, value double")
    got = {r["user_id"]: r for r in behavior.rfm_scores(ev).collect()}
    # user 9: most events (10) and most revenue but oldest activity
    assert got[9]["f_score"] == 5 and got[9]["m_score"] == 5
    assert got[9]["r_score"] == 1
    # user 0: most recent but fewest events
    assert got[0]["r_score"] == 5 and got[0]["f_score"] == 1
    assert got[0]["segment"] == "511"
    assert all(1 <= got[u]["r_score"] <= 5 for u in range(10))


def test_split_leakage_counts_cross_split_pairs(spark):
    # two near-dup pairs with ids engineered so one pair crosses the
    # split: bucket(id) = (id*2654435761) % 1000 < 500 -> 'test'
    from nnanalytics_spark.pipeline.sampling import _bucket

    txt_a = "alpha beta gamma delta epsilon zeta"
    txt_b = "one two three four five six"
    docs = spark.createDataFrame(
        [(1, txt_a), (2, txt_a), (3, txt_b), (4, txt_b), (5, "unrelated words only here")],
        "doc_id long, text string",
    )
    buckets = {
        r["doc_id"]: r["b"]
        for r in docs.select("doc_id", _bucket(F.col("doc_id")).alias("b")).collect()
    }
    got = {
        (r["cell_lo"], r["cell_hi"]): r["n_pairs"]
        for r in dedup.split_leakage(
            docs, n=2, threshold=0.9, test_permille=500, max_shingle_df=None
        ).collect()
    }
    def side(i):
        return "test" if buckets[i] < 500 else "train"
    import collections
    expect = collections.Counter()
    for a, b in ((1, 2), (3, 4)):
        expect[tuple(sorted((side(a), side(b))))] += 1
    assert got == dict(expect)


def test_pit_features_strictly_before_no_leakage(spark):
    m = 60_000
    ev = spark.createDataFrame(
        [
            (1, 1, 0 * m, "view", 2.00),
            (1, 2, 5 * m, "click", 3.00),
            (1, 3, 5 * m, "purchase", 9.99),  # same-ts click must NOT count? ts 5m < 5m is false -> excluded
            (1, 4, 9 * m, "purchase", 1.00),  # sees view+click+purchase(3)
            (2, 5, 0 * m, "purchase", 4.00),  # zero history
        ],
        "user_id long, event_id long, ts_ms long, event_type string, value double",
    )
    got = {
        r["example_id"]: r
        for r in behavior.point_in_time_features(ev).collect()
    }
    # example 3 at t=5m: only the strictly-earlier view counts — the
    # simultaneous click is NOT leaked in
    assert got[3]["n_events_7d"] == 1 and got[3]["cents_7d"] == 200
    assert got[3]["recency_ms"] == 5 * m
    # example 4 at t=9m: view + click + the earlier purchase
    assert got[4]["n_events_7d"] == 3 and got[4]["n_types_7d"] == 3
    assert got[4]["cents_7d"] == 200 + 300 + 999
    # zero-history example keeps its row with zeroed features
    assert got[5]["n_events_7d"] == 0 and got[5]["recency_ms"] is None


def test_phrase_occurrences_counts_and_offset(spark):
    from nnanalytics_spark.pipeline import text as text_mod

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "beta   gamma beta gamma x"),   # normalization collapses runs
            (3, "BETA GAMMA at the start"),
            (4, "no hits here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in text_mod.phrase_occurrences(docs, "beta gamma").collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1]["n_occurrences"] == 1 and got[1]["first_token_offset"] == 1
    assert got[2]["n_occurrences"] == 2 and got[2]["first_token_offset"] == 0
    assert got[3]["first_token_offset"] == 0  # case-folded hit at offset 0


def test_eval_ngram_coverage_fraction(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z w v")], "doc_id long, text string"
    )
    evals = spark.createDataFrame(
        [(100, "a b c d"), (101, "q r s t")], "doc_id long, text string"
    )
    got = {
        r["eval_id"]: r
        for r in dedup.eval_ngram_coverage(corpus, evals, n=3).collect()
    }
    # eval 100: grams {abc, bcd} both in doc 1 -> coverage 1.0
    assert (got[100]["n_grams"], got[100]["coverage"]) == (2, 1.0)
    # eval 101: nothing covered
    assert (got[101]["n_covered"], got[101]["coverage"]) == (0, 0.0)


def test_link_negatives_labels_and_no_accidental_hits(spark):
    from nnanalytics_spark.pipeline import similarity as sim

    rows = [(i, [float(i % 4 == j) + 0.01 * i for j in range(4)]) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sim.link_negatives(emb, k_pos=2, k_neg=3).collect()
    pos = {(r["anchor"], r["other"]) for r in got if r["label"] == 1}
    neg = {(r["anchor"], r["other"]) for r in got if r["label"] == 0}
    # every anchor has exactly k_pos positives; negatives never overlap
    # the positive set nor self-pair
    anchors = {a for a, _ in pos}
    assert anchors == set(range(12))
    for a in anchors:
        assert sum(1 for x, _ in pos if x == a) == 2
    assert not (pos & neg)
    assert all(a != o for a, o in neg)
