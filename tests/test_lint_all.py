"""Whole-surface plan-lint regression gate: every queries() entry must
lint clean (no error/warn findings) against the reviewed waiver table in
tools/lint_queries.py. A new operator that plans a cartesian product, an
unpartitioned window over unbounded input, a row-at-a-time Python UDF,
or a pushdown-blocking cast fails HERE, not at 100 TB."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod
from nnanalytics_spark.core.planlint import lint
from tools.lint_queries import WAIVERS

SF_DIR = "/root/testdata/sf0.001"


def test_every_query_plan_lints_clean(spark):
    flagged: dict[str, list[str]] = {}
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR)
        waived = WAIVERS.get(name, set())
        bad = sorted(
            {
                f.rule
                for f in lint(df)
                if f.severity in ("error", "warn") and f.rule not in waived
            }
        )
        if bad:
            flagged[name] = bad
    assert not flagged, f"plan lint regressions: {flagged}"
