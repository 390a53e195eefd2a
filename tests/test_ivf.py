"""IVF ANN: recall vs brute force on clustered vectors."""

from __future__ import annotations

import random

import pytest

from nnanalytics_spark.pipeline import similarity


@pytest.fixture(scope="module")
def clustered(spark):
    random.seed(3)
    rows = []
    vid = 0
    for c in range(8):
        center = [random.gauss(0, 1) for _ in range(16)]
        for _ in range(40):
            rows.append((vid, [x + random.gauss(0, 0.05) for x in center]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_ivf_assign_covers_all(clustered):
    cents = similarity.kmeans_centroids(clustered, nlist=8)
    assigned = similarity.ivf_assign(clustered, cents)
    assert assigned.count() == 320
    n_cells = assigned.select("cell").distinct().count()
    assert n_cells >= 4  # clusters spread across cells


def test_ivf_topk_recall_vs_brute_force(clustered):
    query = clustered.filter("vec_id = 0").head()["embedding"]
    exact = [r["vec_id"] for r in similarity.brute_force_topk(clustered, query, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in similarity.ivf_topk(clustered, list(query), k=10, nlist=8, nprobe=3).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.9  # tight clusters → the probed cells hold the answers


def test_ivf_prunes_candidates(clustered):
    cents = similarity.kmeans_centroids(clustered, nlist=8)
    assigned = similarity.ivf_assign(clustered, cents).cache()
    total = assigned.count()
    one_cell = assigned.filter("cell = 0").count()
    assert one_cell < total  # probing one cell scans a strict subset


def test_ivf_build_search_roundtrip(clustered, tmp_path):
    """The persisted index (ivf_build) answers searches identically to the
    inline one-shot path, and probing every cell reproduces brute force."""
    path = similarity.ivf_build(clustered, str(tmp_path / "idx"), nlist=8)
    query = clustered.filter("vec_id = 0").head()["embedding"]
    spark = clustered.sparkSession
    exact = [
        (r["vec_id"], r["cos_sim"])
        for r in similarity.brute_force_topk(clustered, query, k=10).collect()
    ]
    full = [
        (r["vec_id"], r["cos_sim"])
        for r in similarity.ivf_search(spark, path, list(query), k=10, nprobe=8).collect()
    ]
    assert full == exact
    partial = {
        r["vec_id"]
        for r in similarity.ivf_search(spark, path, list(query), k=10, nprobe=3).collect()
    }
    assert len({v for v, _ in exact} & partial) >= 9  # tight clusters


def test_ivf_search_prunes_partitions(clustered, tmp_path):
    """The nprobe<nlist search plan must carry a cell IN (...) partition
    filter on the assignments scan — pruning decided from directory names
    at planning time, which is the whole point of the build/search split."""
    path = similarity.ivf_build(clustered, str(tmp_path / "idx"), nlist=8)
    query = clustered.filter("vec_id = 0").head()["embedding"]
    df = similarity.ivf_search(clustered.sparkSession, path, list(query), k=10, nprobe=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert len(scans) == 1, plan
    assert "PartitionFilters: [cell" in scans[0] and " IN (" in scans[0], scans[0]
    assert "DataFilters: []" in scans[0], scans[0]  # pruning, not row filtering


def test_ivf_recall_against_brute_force(spark):
    """Recall invariants on the real embedding table: probing EVERY cell
    must reproduce brute force exactly (IVF is partition pruning, not
    re-scoring), and a 4-of-16 probe must still find a meaningful share of
    the true top-10 (these embeddings are near-random, so partial-probe
    recall is structurally modest — the bound guards against total
    breakage, e.g. scoring the wrong vectors)."""
    from pyspark.sql import functions as F

    from nnanalytics_spark.pipeline import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    rest = emb.filter(F.col("vec_id") != 0)
    truth = {r["vec_id"] for r in similarity.brute_force_topk(rest, qvec, k=10).collect()}
    full = {
        r["vec_id"]
        for r in similarity.ivf_topk(rest, qvec, k=10, nlist=16, nprobe=16).collect()
    }
    assert full == truth, (truth, full)
    partial = {
        r["vec_id"]
        for r in similarity.ivf_topk(rest, qvec, k=10, nlist=16, nprobe=4).collect()
    }
    assert len(truth & partial) >= 3, (truth, partial)
