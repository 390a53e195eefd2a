"""Full oracle battery under pytest (VERDICT r3 #2).

The driver's correctness gate only re-checks the first 50 queries()
entries each round; rows rotated past that window kept only *recorded*
credit. This battery runs EVERY SQL-oracle entry against DuckDB at
sf0.01 — the exact comparison the driver does (row count, column names,
order-insensitive value hash) — so any drift in a rotated-out query
fails CI immediately.

One shared SparkSession + DuckDB connection; ~4-5 min wall for ~115
queries. Deselect with `-m "not slow"` when iterating on something
else.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry
from tools.check_oracle import attach_views, compare_one

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    attach_views(con)
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_oracle_battery(name, spark, duck):
    status, detail = compare_one(spark, duck, name, QUERIES[name], ORACLES.get(name))
    assert status != "fail", f"{name}: {detail}"
    if ORACLES.get(name) is None:
        # rows-only by design — still guard against silent emptiness
        assert not detail.startswith("0 rows"), f"{name}: went empty"


@pytest.mark.slow
@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_dtype_parity(name, spark, duck):
    """Pandas-coercion dtype parity (CORRECTNESS_r04 root cause): the
    driver materializes both sides through pandas before hashing, where
    DuckDB HUGEINT (SUM over ints) and DECIMAL become float64 while
    Spark keeps int64 / Decimal — rendering "123" vs "123.0" into a
    hash mismatch on numerically identical results. Every oracle pair
    must land in the same render class per column (tools/check_dtypes),
    so a future query can't reintroduce the bug."""
    from tools.check_dtypes import column_problems

    sql = ORACLES.get(name)
    if sql is None:
        pytest.skip("rows-only entry")
    spd = QUERIES[name](spark, "/root/testdata/sf0.01").toPandas()
    dpd = duck.execute(sql).df()
    probs = column_problems(spd, dpd)
    assert not probs, f"{name}: {probs}"
