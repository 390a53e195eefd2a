"""Property-based tests (hypothesis): the bin/filter expressions must
agree with straight-line Python models of the reference semantics
(TimeHistogram/SpaceSizeHistogram/MemorySizeHistogram/FileTypeHistogram)
on arbitrary inputs — catching edge cases the example tests miss
(negative elapsed, exact bucket edges, empty names, unicode).

Each example batch becomes ONE DataFrame → one Spark job per example;
max_examples is kept small because executor round-trips dominate.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nnanalytics_spark.inode import bins

NOW = 1_755_000_000_000


def py_time_bucket(ts: int, unit_ms: int, n: int, suffix: str) -> str:
    elapsed = NOW - ts
    if elapsed < 0:
        return "NO_MAPPING"
    k = max(1, math.ceil(elapsed / unit_ms))
    return f"{n} {suffix}+" if k > n else f"{k} {suffix}"


def py_space_bucket(size: int) -> str:
    if size < 0:
        return "NO_MAPPING"
    if size == 0:
        return "0 B"
    for label, edge in bins.SPACE_EDGES[1:]:
        if size <= edge:
            return label
    return "1 GB+"


def py_memory_bucket(size: int) -> str:
    if size < 1:
        return "NO_MAPPING"
    for label, edge in bins.MEMORY_EDGES:
        if size <= edge:
            return label
    return "64 KB+"


def py_file_type(name: str) -> str:
    """Reference determineType (FileTypeHistogram.java:203-222) in plain
    Python: equals → guarded prefixes → last-'.' suffix → last-'_' suffix."""
    if name in bins.FILETYPE_EQUALS:
        return bins.FILETYPE_EQUALS[name]
    for prefix, label in bins.FILETYPE_STARTSWITH.items():
        guard = 6 if len(prefix) <= 6 else 10
        if len(name) > guard and name.startswith(prefix):
            return label
    if "." in name:
        suffix = "." + name.rsplit(".", 1)[-1]
        if suffix in bins.FILETYPE_SUFFIX:
            return bins.FILETYPE_SUFFIX[suffix]
    if "_" in name:
        suffix = "_" + name.rsplit("_", 1)[-1]
        if suffix in bins.FILETYPE_SUFFIX:
            return bins.FILETYPE_SUFFIX[suffix]
    return "UNKNOWN"


def run_batch(spark, values, schema, expr):
    df = spark.createDataFrame([(v,) for v in values], schema)
    return [r["out"] for r in df.select(expr(F.col("v")).alias("out")).collect()]


timestamps = st.integers(min_value=NOW - 5 * 365 * 86_400_000, max_value=NOW + 86_400_000)


@settings(max_examples=8, deadline=None)
@given(st.lists(timestamps, min_size=1, max_size=60))
def test_time_bucket_matches_model(spark, ts_list):
    for rng, (unit_ms, n, suffix) in bins.TIME_RANGES.items():
        got = run_batch(spark, ts_list, "v long", lambda c, r=rng: bins.time_bucket(c, r, NOW))
        want = [py_time_bucket(t, unit_ms, n, suffix) for t in ts_list]
        assert got == want, rng


sizes = st.one_of(
    st.integers(min_value=-5, max_value=5),
    st.integers(min_value=0, max_value=2 * bins.GB),
    # exact edges and off-by-one neighbours
    st.sampled_from(
        [e for _, e in bins.SPACE_EDGES] + [e + 1 for _, e in bins.SPACE_EDGES]
        + [e for _, e in bins.MEMORY_EDGES] + [e - 1 for _, e in bins.MEMORY_EDGES]
    ),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(sizes, min_size=1, max_size=80))
def test_size_buckets_match_model(spark, size_list):
    got_space = run_batch(spark, size_list, "v long", bins.space_bucket)
    assert got_space == [py_space_bucket(s) for s in size_list]
    got_mem = run_batch(spark, size_list, "v long", bins.memory_bucket)
    assert got_mem == [py_memory_bucket(s) for s in size_list]


names = st.one_of(
    st.sampled_from(
        list(bins.FILETYPE_EQUALS)
        + [p + "x" * 9 for p in bins.FILETYPE_STARTSWITH]
        + [p for p in bins.FILETYPE_STARTSWITH]  # too short for the guard
        + ["data" + s for s in bins.FILETYPE_SUFFIX]
        + ["a.tar.gz", "x_45454", "noext", "", ".", "_", "a..csv", "a._index"]
    ),
    st.text(
        alphabet=st.sampled_from(list("abz019._-")), min_size=0, max_size=16
    ),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(names, min_size=1, max_size=80))
def test_file_type_matches_reference_model(spark, name_list):
    got = run_batch(spark, name_list, "v string", bins.file_type)
    assert got == [py_file_type(n) for n in name_list]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 63), st.integers(-(2**63), 2**63 - 1)),
        min_size=2, max_size=24, unique_by=lambda t: t[0],
    ),
    st.integers(0, 3),
)
def test_simhash_blocks_is_a_pure_fanout_dial(spark, rows, h):
    """For ANY signature set and ANY max_hamming h, every block count
    >= h+1 yields the identical pair set (pigeonhole) — the property
    version of the example-based parity test."""
    from nnanalytics_spark.pipeline import dedup

    df = spark.createDataFrame(rows, "id long, sig long")

    def pairs(blocks):
        return {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in dedup.simhash_pairs_from_sigs(df, max_hamming=h, blocks=blocks).collect()
        }

    base = pairs(h + 1)
    assert base == pairs(min(h + 3, 8)) == pairs(8)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 10**6),
                  st.one_of(st.none(), st.floats(-100, 100, allow_nan=False))),
        min_size=1, max_size=40, unique_by=lambda t: t[1],
    )
)
def test_forward_fill_idempotent_and_null_prefix(spark, rows):
    """LOCF is idempotent (filling the filled column changes nothing)
    and never invents values before a user's first observation."""
    from nnanalytics_spark.pipeline import behavior

    df = spark.createDataFrame(
        [(u, e, float(e), v) for u, e, v in rows],
        "user_id long, event_id long, ts_us double, value double",
    )
    once = behavior.forward_fill(df)
    got = {r["event_id"]: r for r in once.collect()}
    twice = behavior.forward_fill(
        once.select("user_id", "event_id", "ts_us", F.col("value_filled").alias("value"))
    )
    for r in twice.collect():
        assert r["value_filled"] == got[r["event_id"]]["value_filled"]
    # per user, rows before the first non-null value stay null
    by_user: dict = {}
    for u, e, v in rows:
        by_user.setdefault(u, []).append((e, v))
    for u, evs in by_user.items():
        seen = False
        for e, v in sorted(evs):
            if v is not None:
                seen = True
            assert (got[e]["value_filled"] is not None) == seen or v is not None


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.text("ab ", min_size=6, max_size=40)),
        min_size=2, max_size=12, unique_by=lambda t: t[0],
    )
)
def test_containment_dominates_jaccard(spark, rows):
    """For ANY corpus: both containment directions sit in (0, 1], each is
    >= the pair's Jaccard (|∩|/|A| >= |∩|/|A∪B|), and c_ab·|A| ==
    c_ba·|B| (both equal |∩|) — the algebra that makes containment the
    sub-document detector."""
    from nnanalytics_spark.pipeline import dedup

    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {
        (r["id_a"], r["id_b"]): r
        for r in dedup.containment_pairs(df, n=2, threshold=0.0).collect()
    }
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, n=2, threshold=0.0).collect()
    }
    assert set(cont) == set(jac)
    for key, r in cont.items():
        assert 0 < r["c_ab"] <= 1 and 0 < r["c_ba"] <= 1
        assert r["c_ab"] >= jac[key] - 1e-9 and r["c_ba"] >= jac[key] - 1e-9


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 100), st.floats(0.01, 10, allow_nan=False)),
             min_size=1, max_size=20, unique_by=lambda t: t[0]),
    st.floats(1.5, 100, allow_nan=False),
)
def test_rrf_invariant_to_score_scaling(spark, rows, scale):
    """RRF consumes RANKS, not scores: scaling every score by any
    positive constant leaves the fused ranking bit-identical."""
    from nnanalytics_spark.pipeline import retrieval

    a = spark.createDataFrame(rows, "doc_id long, score double")
    b = spark.createDataFrame(
        [(i, s * 0.5 + (i % 3)) for i, s in rows], "doc_id long, score double"
    )
    base = retrieval.rrf_fuse([a, b], topk=50).collect()
    scaled = retrieval.rrf_fuse(
        [a.withColumn("score", F.col("score") * scale), b], topk=50
    ).collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in scaled]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.sampled_from(["upsert", "delete"]),
                  st.integers(1, 9)),
        min_size=1, max_size=30,
    )
)
def test_cdc_compact_replay_and_union_stability(spark, entries):
    """Compaction is replay-stable: compact(log ∪ log) == compact(log)
    (at-least-once delivery cannot change the net effect), and applying
    the net equals applying the raw log — for ANY op/seq interleaving."""
    from nnanalytics_spark.streaming.refresh import (
        apply_compacted_changelog,
        compact_changelog,
    )

    rows = [(k, f"v{k}-{s}", op, s) for k, op, s in entries]
    snap = spark.createDataFrame(
        [(k, "base") for k in range(0, 51, 5)], "id long, v string"
    )
    log = spark.createDataFrame(rows, "id long, v string, op string, seq long")
    net_once = {
        tuple(r) for r in compact_changelog(log).collect()
    }
    net_twice = {
        tuple(r) for r in compact_changelog(log.unionByName(log)).collect()
    }
    assert net_once == net_twice
    merged = {
        r["id"]: r["v"] for r in apply_compacted_changelog(snap, log).collect()
    }
    # model: latest (seq, op) wins, upsert > delete on ties
    by_key: dict = {}
    for k, op, s in entries:
        cur = by_key.get(k)
        if cur is None or (s, op) > cur:
            by_key[k] = (s, op)
    expect = {k: "base" for k in range(0, 51, 5)}
    for k, (s, op) in by_key.items():
        if op == "delete":
            expect.pop(k, None)
        else:
            expect[k] = f"v{k}-{s}"
    assert merged == expect


# ---------------------------------------------------------------- r6c ops


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=100, allow_nan=False),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=12, deadline=None)
def test_skyline_is_exactly_the_undominated_set(spark, points):
    """Full characterization on arbitrary inputs: the skyline returns a
    row iff NO other row dominates it — including duplicate points,
    shared prices, and shared sizes."""
    from nnanalytics_spark.pipeline import stats

    rows = [(i, "g", float(p), int(s)) for i, (p, s) in enumerate(points)]
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
            p2 <= p and s2 >= s and (p2 < p or s2 > s) for (_, _, p2, s2) in rows
        )
    )
    assert got == want


@given(
    st.lists(
        st.floats(min_value=0.01, max_value=1000, allow_nan=False),
        min_size=2,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_gini_bounds_and_python_model(spark, values):
    """0 <= G <= (n-1)/n on arbitrary positive values, and the Spark
    result equals the straight-line integer-cents Python model."""
    from nnanalytics_spark.pipeline import stats

    rows = [("g", i, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "grp string, id long, x double")
    (row,) = stats.gini_by_group(df, "x", ["grp"], id_col="id").collect()
    cents = sorted(
        (math.floor(v * 100), i) for (_, i, v) in rows
    )
    n = len(cents)
    sx = sum(c for c, _ in cents)
    srx = sum((k + 1) * c for k, (c, _) in enumerate(cents))
    want = round((2 * srx - (n + 1) * sx) / (n * sx), 6) if sx else None
    if sx:
        assert row["gini"] == want
        assert 0 <= row["gini"] <= (n - 1) / n + 1e-9
