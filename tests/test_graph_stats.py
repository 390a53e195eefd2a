"""Unit tests for the r5b operators: integer-exact PageRank, Cohen's
kappa, token co-occurrence, product quantization (semantics beyond the
oracle hash)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nnanalytics_spark.pipeline import graph, lexical, similarity, stats


def _pagerank_reference(edge_list, iterations=5, r0=10**12, damping=85):
    """Driver-side replay of the exact integer recurrence."""
    nodes = sorted({n for e in edge_list for n in e})
    out = {}
    for s, _ in edge_list:
        out[s] = out.get(s, 0) + 1
    ranks = {n: r0 for n in nodes}
    base = (100 - damping) * r0 // 100
    for _ in range(iterations):
        inflow = {n: 0 for n in nodes}
        for s, d in edge_list:
            inflow[d] += ranks[s] // out[s]
        ranks = {n: base + damping * inflow[n] // 100 for n in nodes}
    return ranks


def test_pagerank_matches_integer_reference(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 1), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_units"] for r in graph.pagerank(df, iterations=5).collect()}
    assert got == _pagerank_reference(edges)


def test_pagerank_sink_node_keeps_base_only(spark):
    # node 2 has no in-edges -> settles at base; node 1 absorbs node 0
    df = spark.createDataFrame([(0, 1), (2, 1)], "src long, dst long")
    got = {r["node"]: r["rank_units"] for r in graph.pagerank(df, iterations=3).collect()}
    base = 150_000_000_000
    assert got[0] == base and got[2] == base
    assert got[1] == base + 85 * (2 * base) // 100


def test_degree_stats(spark):
    df = spark.createDataFrame([(0, 1), (0, 2), (2, 0)], "src long, dst long")
    got = {r["node"]: (r["out_degree"], r["in_degree"]) for r in graph.degree_stats(df).collect()}
    assert got == {0: (2, 1), 1: (0, 1), 2: (1, 1)}


def test_cohens_kappa_perfect_agreement(spark):
    df = spark.createDataFrame([(1, 1), (1, 1), (0, 0), (0, 0)], "a int, b int")
    row = stats.cohens_kappa(df, F.col("a") == 1, F.col("b") == 1).collect()[0]
    assert row["kappa_micros"] == 1_000_000
    assert (row["n"], row["n11"], row["n00"]) == (4, 2, 2)


def test_cohens_kappa_known_value(spark):
    # classic 2x2: n=100, n11=40, n10=15, n01=20, n00=25 -> a1=55, b1=60
    rows = [(1, 1)] * 40 + [(1, 0)] * 15 + [(0, 1)] * 20 + [(0, 0)] * 25
    df = spark.createDataFrame(rows, "a int, b int")
    row = stats.cohens_kappa(df, F.col("a") == 1, F.col("b") == 1).collect()[0]
    # po = 0.65, pe = 0.51 -> kappa = 0.14/0.49 = 2/7 = 0.285714...
    num = 100 * 65 - 55 * 60 - 45 * 40
    den = 100 * 100 - 55 * 60 - 45 * 40
    assert row["kappa_micros"] == (1_000_000 * (num + 4 * den)) // den - 4_000_000
    assert abs(row["kappa_micros"] / 1e6 - 2 / 7) < 1e-6


def test_cohens_kappa_negative_is_floor_consistent(spark):
    # systematic disagreement -> negative kappa; the +4 shift must keep
    # the integral division floor-consistent
    rows = [(1, 0)] * 6 + [(0, 1)] * 6 + [(1, 1)] * 1 + [(0, 0)] * 1
    df = spark.createDataFrame(rows, "a int, b int")
    row = stats.cohens_kappa(df, F.col("a") == 1, F.col("b") == 1).collect()[0]
    assert row["kappa_micros"] < 0
    n, a1, b1, agree = 14, 7, 7, 2
    num = n * agree - a1 * b1 - (n - a1) * (n - b1)
    den = n * n - a1 * b1 - (n - a1) * (n - b1)
    import math

    assert row["kappa_micros"] == math.floor(1e6 * num / den)


def test_token_cooccurrence_counts(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b"), (2, "a c"), (3, "b b a")],
        "doc_id long, text string",
    )
    out = {
        (r["tok_a"], r["tok_b"]): (r["n_ab"], r["n_a"], r["n_b"])
        for r in lexical.token_cooccurrence(df, top_vocab=3, top_pairs=10).collect()
    }
    # df(a)=4, df(b)=3, df(c)=2; repeated 'b' in doc 3 counts once
    assert out[("a", "b")] == (3, 4, 3)
    assert out[("a", "c")] == (2, 4, 2)
    assert out[("b", "c")] == (1, 3, 2)


def test_token_cooccurrence_vocab_cap_bounds_pairs(spark):
    df = spark.createDataFrame(
        [(i, "x y " + f"rare{i}") for i in range(6)], "doc_id long, text string"
    )
    out = lexical.token_cooccurrence(df, top_vocab=2, top_pairs=10).collect()
    # only (x, y) survives the vocab cap
    assert len(out) == 1 and (out[0]["tok_a"], out[0]["tok_b"]) == ("x", "y")


def test_pq_roundtrip_beats_mean_baseline(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    # two well-separated clusters per subspace -> k-means must beat the mean
    rows = [
        (i, (rng.normal(0, 0.05, 8) + (5.0 if i % 2 else -5.0)).tolist())
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = similarity.pq_train(df, m=2, k=4, sample=64)
    assert len(books) == 2 and books[0].shape == (4, 4)
    out = similarity.pq_report(df, books).collect()
    assert [r["sub"] for r in out] == [0, 1]
    assert all(r["improved"] for r in out)
    assert all(r["n"] == 64 for r in out)


def test_pq_train_rejects_indivisible_dim(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>")
    import pytest

    with pytest.raises(ValueError):
        similarity.pq_train(df, m=2, k=2, sample=4)


def test_triangle_counts_exact(spark):
    from nnanalytics_spark.pipeline import graph

    # K4 on {1,2,3,4} (4 triangles, every node in 3) + pendant edge 4-5
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r["node"]: r["triangles"] for r in graph.triangle_counts(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    assert 5 not in out  # pendant vertex closes nothing


def test_triangle_counts_no_triangles_in_path(spark):
    from nnanalytics_spark.pipeline import graph

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "id_a long, id_b long")
    assert graph.triangle_counts(df).collect() == []


def test_triangle_counts_normalizes_dirty_edges(spark):
    """Duplicate and reversed edge rows must not multiply-count
    triangles (ADVICE r5): triangle {1,2,3} listed with a duplicate and
    a reversed edge still counts once per corner; self-loops are
    dropped. normalize=False preserves the raw fast path."""
    from nnanalytics_spark.pipeline import graph

    dirty = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (1, 3), (3, 3)],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["triangles"] for r in graph.triangle_counts(dirty).collect()}
    assert got == {1: 1, 2: 1, 3: 1}
    clean = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "id_a long, id_b long")
    raw = {r["node"]: r["triangles"]
           for r in graph.triangle_counts(clean, normalize=False).collect()}
    assert raw == got
