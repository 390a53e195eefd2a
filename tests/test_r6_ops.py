"""Unit tests for the r6 corpus-analysis operators: n-gram novelty,
token burstiness, ROUGE-1 pair overlap, Heaps vocabulary growth, session
entropy, categorical mutual information — closed-form fixtures with
hand-computed expectations (the driver oracle covers sf-scale parity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nnanalytics_spark.pipeline import behavior, text
from nnanalytics_spark.pipeline import stats as stats_mod


def test_ngram_novelty_first_occurrence_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # grams: abc, bcd — both first here
            (2, "a b c e"),        # abc repeats (doc 1), bce new
            (3, "x"),              # too short: zero grams
            (4, "a b c d"),        # exact dup of doc 1: nothing novel
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text.ngram_novelty(docs, n=3).collect()}
    assert (got[1]["n_grams"], got[1]["novel_grams"]) == (2, 2)
    assert (got[2]["n_grams"], got[2]["novel_grams"]) == (2, 1)
    assert got[2]["novelty"] == 0.5
    assert (got[3]["n_grams"], got[3]["novelty"]) == (0, 0.0)
    assert (got[4]["n_grams"], got[4]["novel_grams"]) == (2, 0)


def test_token_burstiness_mean_per_containing_doc(spark):
    docs = spark.createDataFrame(
        [(1, "x x x y"), (2, "x y"), (3, "y")],
        "doc_id long, text string",
    )
    got = {r["tok"]: r for r in text.token_burstiness(docs, k=10).collect()}
    # x: 4 occurrences over 2 containing docs -> 2.0; y: 3 over 3 -> 1.0
    assert (got["x"]["total_count"], got["x"]["doc_freq"]) == (4, 2)
    assert got["x"]["burstiness"] == 2.0
    assert got["y"]["burstiness"] == 1.0


def test_rouge1_adjacent_pairs_prf(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d"),  # A = {a,b,c,d}
            (1, "c d e"),    # B = {c,d,e}: overlap 2, p=0.5, r=2/3
            (2, "q r"),
            (3, "x y z"),    # disjoint: overlap 0, f1 defined as 0
        ],
        "doc_id long, text string",
    )
    got = {r["id_a"]: r for r in text.rouge1_adjacent_pairs(docs).collect()}
    r0 = got[0]
    assert (r0["n_a"], r0["n_b"], r0["overlap"]) == (4, 3, 2)
    assert r0["p"] == 0.5 and r0["r"] == round(2 / 3, 6)
    assert r0["f1"] == round(2 * 0.5 * (2 / 3) / (0.5 + 2 / 3), 6)
    assert (got[2]["overlap"], got[2]["f1"]) == (0, 0.0)


def test_vocabulary_growth_cumulative(spark):
    # 4 docs, 2 buckets of width 2: vocab {a,b} enters bucket 0, {c} in 1
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a"), (2, "b c"), (3, "c")],
        "doc_id long, text string",
    )
    got = {r["bucket"]: r for r in text.vocabulary_growth(docs, buckets=2).collect()}
    assert (got[0]["docs_so_far"], got[0]["tokens_so_far"], got[0]["vocab_size"]) == (2, 4, 2)
    assert (got[1]["docs_so_far"], got[1]["tokens_so_far"], got[1]["vocab_size"]) == (4, 7, 3)


def test_session_entropy_known_values(spark):
    ev = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "a"), (2, "a")],
        "user_id long, event_type string",
    )
    got = {r["user_id"]: r for r in behavior.session_entropy(ev).collect()}
    # user 1: two equiprobable types -> ln 2; user 2: deterministic -> 0
    assert got[1]["n_events"] == 2 and got[1]["n_types"] == 2
    assert abs(got[1]["entropy_nats"] - math.log(2)) < 1e-5
    assert got[2]["entropy_nats"] == 0.0


def test_mutual_information_extremes(spark):
    # perfectly dependent: y == x -> MI = H(x) = ln 2
    dep = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", "a" if i % 2 else "b") for i in range(40)],
        "i long, x string, y string",
    )
    r = stats_mod.mutual_information(dep, "x", "y").collect()[0]
    assert abs(r["mi_nats"] - math.log(2)) < 1e-5
    assert abs(r["h_x_nats"] - math.log(2)) < 1e-5
    assert (r["n_rows"], r["n_x"], r["n_y"]) == (40, 2, 2)
    # independent (balanced product design) -> MI = 0
    ind = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", "c" if (i // 2) % 2 else "d") for i in range(40)],
        "i long, x string, y string",
    )
    r2 = stats_mod.mutual_information(ind, "x", "y").collect()[0]
    assert abs(r2["mi_nats"]) < 1e-5
    # MI never exceeds either marginal entropy
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    r3 = stats_mod.mutual_information(docs, "source", "lang").collect()[0]
    assert 0.0 <= r3["mi_nats"] <= min(r3["h_x_nats"], r3["h_y_nats"]) + 1e-9


def test_knn_graph_exact_and_block_invariant(spark):
    from nnanalytics_spark.pipeline import similarity

    # 1-d directions: cosine is ±1 — neighbors are same-sign vectors,
    # ties broken by neighbor id ascending
    rows = [
        (1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, [3.0, 0.0]),
        (4, [0.0, 1.0]), (5, [0.0, 5.0]),
        (6, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["vec_id"], r["rank"]): (r["nbr"], r["cos_sim"])
        for r in similarity.knn_graph(df, k=2).collect()
    }
    assert got[(1, 1)] == (2, 1.0) and got[(1, 2)] == (3, 1.0)  # id tie-break
    assert got[(4, 1)] == (5, 1.0)
    assert got[(6, 1)][1] < 1.0  # nothing colinear with -x except via cos<1
    # self never appears
    assert all(nbr != vid for (vid, _r), (nbr, _s) in got.items())
    # block decomposition must not change the result
    one = sorted(map(tuple, similarity.knn_graph(df, k=2, rows_per_block=2).collect()))
    big = sorted(map(tuple, similarity.knn_graph(df, k=2).collect()))
    assert one == big


def test_markov_stationary_uniform_cycle(spark):
    """A deterministic 3-cycle a->b->c->a has uniform stationary
    distribution; micros sum to ~1e6 and the run is deterministic."""
    from nnanalytics_spark.pipeline import behavior

    evs = []
    t = 0
    for rep in range(10):
        for s in ("a", "b", "c"):
            evs.append((1, len(evs), s, t))
            t += 1_000_000
    df = spark.createDataFrame(evs, "user_id long, event_id long, event_type string, ts_us long")
    out = {r["state"]: r for r in behavior.markov_stationary(df, iters=20).collect()}
    assert set(out) == {"a", "b", "c"}
    total = sum(r["stationary_micros"] for r in out.values())
    assert abs(total - 1_000_000) <= 3  # rounding slack only
    for r in out.values():
        assert abs(r["stationary_p"] - 1 / 3) < 2e-3


def test_snapshot_diff_classification(spark):
    from nnanalytics_spark.sources import layout

    old = spark.createDataFrame(
        [("/a", 1, 10, "u"), ("/b", 2, 20, "u"), ("/gone", 3, 30, "u"),
         ("/dir", None, None, None)],
        "path string, fileSize long, modTime long, user string",
    )
    new = spark.createDataFrame(
        [("/a", 1, 10, "u"), ("/b", 2, 99, "u"), ("/new", 4, 40, "u"),
         ("/dir", None, None, None)],
        "path string, fileSize long, modTime long, user string",
    )
    got = {r["path"]: r["change"] for r in layout.snapshot_diff(
        old, new, compare=("fileSize", "modTime", "user")).collect()}
    assert got == {
        "/a": "unchanged", "/b": "modified", "/gone": "deleted",
        "/new": "added",
        # present on both sides with ALL compared columns NULL: the
        # presence sentinels must classify it unchanged, not added
        "/dir": "unchanged",
    }


def test_funnel_conversion_time_greedy_parity(spark):
    """Greedy earliest-match timing: user 1 converts view(0)->click(5s)
    ->purchase(9s); user 2 stalls after click; a click BEFORE the first
    view never counts."""
    rows = [
        (1, 1, "view", 0), (1, 2, "click", 5_000_000), (1, 3, "purchase", 9_000_000),
        (2, 4, "view", 0), (2, 5, "click", 2_000_000),
        (3, 6, "click", 0), (3, 7, "view", 1_000_000),  # click precedes view
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_us long"
    )
    got = {r["step"]: r for r in behavior.funnel_conversion_time(
        df, ["view", "click", "purchase"]).collect()}
    assert got[2]["users"] == 2 and got[2]["mean_s"] == round((5 + 2) / 2, 6)
    assert got[3]["users"] == 1 and got[3]["mean_s"] == 9.0 and got[3]["p50_s"] == 9.0


def test_pair_set_agreement_counts(spark):
    from nnanalytics_spark.pipeline import dedup

    a = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "id_a long, id_b long")
    b = spark.createDataFrame([(1, 2), (4, 5)], "id_a long, id_b long")
    r = dedup.pair_set_agreement(a, b).collect()[0]
    assert (r["n_a"], r["n_b"], r["n_both"]) == (3, 2, 1)
    assert r["agreement_jaccard"] == 0.25  # 1 of 4 distinct pairs


def test_forward_fill_locf(spark):
    rows = [
        (1, 1, None, 0), (1, 2, 5.0, 1), (1, 3, None, 2), (1, 4, 7.0, 3),
        (1, 5, None, 4),
        (2, 6, None, 0),  # user 2 never observes: stays NULL
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, value double, ts_us long"
    )
    got = {r["event_id"]: r["value_filled"]
           for r in behavior.forward_fill(df).collect()}
    assert got == {1: None, 2: 5.0, 3: 5.0, 4: 7.0, 5: 7.0, 6: None}


def test_hard_negatives_excludes_same_label(spark):
    from nnanalytics_spark.pipeline import similarity

    rows = [
        (1, 0, [1.0, 0.0]), (2, 0, [0.9, 0.1]),   # same label as 1
        (3, 1, [0.8, 0.2]), (4, 1, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    got = {(r["vec_id"], r["rank"]): r["nbr"]
           for r in similarity.hard_negatives(df, k=2).collect()}
    # vec 1's hardest negative is 3 (closest OTHER-label), never 2
    assert got[(1, 1)] == 3
    assert 2 not in {got.get((1, 1)), got.get((1, 2))}
    # block decomposition invariance holds with the label mask
    a = sorted(map(tuple, similarity.hard_negatives(df, k=2, rows_per_block=2).collect()))
    b = sorted(map(tuple, similarity.hard_negatives(df, k=2).collect()))
    assert a == b


def test_dim_stats_and_anisotropy_closed_form(spark):
    from nnanalytics_spark.pipeline import similarity

    # two antipodal unit vectors: every dim mean 0; pairwise cos = -1
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [-1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    ds = {r["dim"]: r for r in similarity.dim_stats(df).collect()}
    assert ds[0]["mean"] == 0.0 and ds[0]["variance"] == 1.0
    assert ds[1]["mean"] == 0.0 and ds[1]["variance"] == 0.0
    an = similarity.anisotropy(df).collect()[0]
    assert an["n_vectors"] == 2 and an["mean_pairwise_cosine"] == -1.0
    # identical vectors: mean pairwise cosine exactly 1
    same = spark.createDataFrame(
        [(i, [0.6, 0.8]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    assert similarity.anisotropy(same).collect()[0]["mean_pairwise_cosine"] == 1.0


def test_training_order_is_a_permutation(spark):
    from nnanalytics_spark.pipeline import sampling

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = sampling.training_order(df, shards=4, epoch=0).collect()
    assert len(out) == 200
    # positions are dense 0..k-1 within each shard
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["position"])
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), s
    # deterministic across runs; different epoch -> different order
    again = sampling.training_order(df, shards=4, epoch=0).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    e1 = {r["doc_id"]: (r["shard"], r["position"])
          for r in sampling.training_order(df, shards=4, epoch=1).collect()}
    e0 = {r["doc_id"]: (r["shard"], r["position"]) for r in out}
    assert e0 != e1


def test_video_scene_change_closed_form(spark):
    """A clip whose second frame differs from the first by +1 on every
    pixel has mean_abs_diff exactly 1; a static clip scores 0; a
    single-frame clip emits (1, 0, 0.0)."""
    from nnanalytics_spark.pipeline import codecs, multimodal

    f = bytes(range(128))
    f_plus = bytes((b + 1) % 256 for b in f)
    rows = [
        (1, "video", codecs.encode_avi(f + f_plus)),
        (2, "video", codecs.encode_avi(f + f)),
        (3, "video", codecs.encode_avi(f)),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r for r in multimodal.scene_change(df).collect()}
    assert (got[1]["n_frames"], got[1]["n_transitions"]) == (2, 1)
    assert got[1]["mean_abs_diff"] == 1.0
    assert got[2]["mean_abs_diff"] == 0.0
    assert (got[3]["n_frames"], got[3]["n_transitions"], got[3]["mean_abs_diff"]) == (1, 0, 0.0)
