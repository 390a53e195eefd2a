"""Property-based tests (hypothesis) for the r8 closed-form operators:
algebraic invariants (isotonic monotonicity + mass preservation, BH
adjusted-p bounds/monotonicity) and straight-line Python models
(weighted quantile, Holt fold) on arbitrary inputs — the edge cases
(ties at bin edges, all-equal p-values, zero-variance series) example
tests miss.

One DataFrame per example (executor round-trips dominate), so
max_examples stays small — the same budget discipline as
tests/test_properties.py."""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import given, settings, strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nnanalytics_spark.pipeline import stats

# probabilities quantized to 1/1000 — avoids float-literal edge noise
# while still hitting exact bin boundaries
_probs = st.integers(min_value=0, max_value=999).map(lambda i: i / 1000.0)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(_probs, st.booleans()), min_size=5, max_size=60))
def test_isotonic_fit_invariants(spark, data):
    """For ANY (p, y) sample: iso_rate is monotone nondecreasing in
    bin, stays in [0, 1], and Σ n·iso == Σ y (PAVA preserves total
    mass)."""
    df = spark.createDataFrame(
        [(p, int(y)) for p, y in data], ["p", "y"]
    )
    rows = sorted(
        stats.isotonic_fit(df, "p", "y", bins=10).collect(),
        key=lambda r: r["bin"],
    )
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)
    assert all(0.0 <= v <= 1.0 for v in iso)
    got = sum(r["n"] * r["iso_rate"] for r in rows)
    want = sum(int(y) for _, y in data)
    assert abs(got - want) < 1e-3 * max(1, len(data))


@settings(max_examples=8, deadline=None)
@given(st.lists(_probs, min_size=1, max_size=40, unique=True))
def test_bh_fdr_invariants(spark, ps):
    """For ANY p-value family: p ≤ p_adj ≤ 1 and p_adj is monotone
    nondecreasing in p_rank (the step-up suffix-min shape)."""
    df = spark.createDataFrame(
        [(f"m{i}", p) for i, p in enumerate(ps)], ["metric", "p_value"]
    )
    rows = sorted(
        stats.bh_fdr(df, "p_value", ["metric"]).collect(),
        key=lambda r: r["p_rank"],
    )
    adj = [r["p_adj"] for r in rows]
    assert adj == sorted(adj)
    for r in rows:
        assert r["p_value"] - 1e-9 <= r["p_adj"] <= 1.0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_quantile_matches_python_model(spark, data):
    """The returned v per q is exactly the smallest value with
    cumulative weight ≥ q·W — checked against a straight-line Python
    model on arbitrary integer values/weights (ties included)."""
    df = spark.createDataFrame(
        [("g", float(v), w) for v, w in data], ["grp", "v", "w"]
    )
    r = stats.weighted_quantile(df, "v", "w", "grp", qs=(0.5, 0.9)).collect()[0]
    ordered = sorted(data)
    total = sum(w for _, w in data)

    def model(q):
        cw = 0
        for v, w in ordered:
            cw += w
            if cw >= q * total:
                return float(v)
        return float(ordered[-1][0])

    assert r["w_total"] == total
    assert r["wq50"] == model(0.5)
    assert r["wq90"] == model(0.9)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=200), min_size=2, max_size=25)
)
def test_holt_forecast_matches_python_fold(spark, counts):
    """The (level, trend) state equals the literal Python replay of the
    recursion for ANY daily count series — including constant series
    (trend exactly x2−x1 folded to 0)."""
    rows = []
    for day, c in enumerate(counts):
        rows += [("t", day * 86400000 + i) for i in range(c)]
    df = spark.createDataFrame(rows, ["event_type", "ts_ms"])
    r = stats.holt_forecast(df).collect()[0]
    xs = [float(c) for c in counts]
    l, b = xs[0], xs[1] - xs[0]
    for x in xs[1:]:
        ln = 0.5 * x + 0.5 * (l + b)
        b = 0.3 * (ln - l) + 0.7 * b
        l = ln

    def r6(x):  # Spark/DuckDB round() is HALF-UP; Python's is banker's
        import decimal

        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    assert r["level"] == r6(l)
    assert r["trend"] == r6(b)
    assert r["forecast_7d"] == r6(l + 7.0 * b)
