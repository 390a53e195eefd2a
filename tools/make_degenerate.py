"""Write degenerate variants of every test table for
tools/degenerate_probe.py, schema-identical to /root/testdata/sf0.001:

- /tmp/sf_empty  — 0 rows (the empty-delta / annihilated-filter case)
- /tmp/sf_one    — 1 row   (zero-variance / single-class / one-day)
- /tmp/sf_nulls  — full tables with ~10% NULLs injected into the
  nullable DATA columns (text, source, embedding, value, event_type,
  comments) — the real-corpus case the synthetic tables never exercise.
  Ids and timestamps stay NOT NULL (they are key columns by contract).

DuckDB round-trips the parquet schema exactly, so Spark reads the same
dtypes it reads at real SFs."""

from __future__ import annotations

import glob
import os

import duckdb

SRC = "/root/testdata/sf0.001"

NULL_RULES = {
    "documents.parquet": {"text": "doc_id % 10 = 3", "source": "doc_id % 17 = 5"},
    "embeddings.parquet": {"embedding": "vec_id % 10 = 3"},
    "events.parquet": {"value": "event_id % 10 = 3", "event_type": "event_id % 13 = 7"},
    "orders.parquet": {"o_comment": "o_orderkey % 10 = 3"},
    "lineitem.parquet": {"l_comment": "l_orderkey % 10 = 3"},
}


def main() -> None:
    for dst, suffix in [("/tmp/sf_empty", "WHERE 1=0"), ("/tmp/sf_one", "LIMIT 1")]:
        os.makedirs(dst, exist_ok=True)
        for p in sorted(glob.glob(f"{SRC}/*.parquet")):
            t = os.path.basename(p)
            duckdb.sql(
                f"COPY (SELECT * FROM read_parquet('{p}') {suffix}) "
                f"TO '{dst}/{t}' (FORMAT parquet)"
            )
        print(dst, "written")

    dst = "/tmp/sf_nulls"
    os.makedirs(dst, exist_ok=True)
    for p in sorted(glob.glob(f"{SRC}/*.parquet")):
        t = os.path.basename(p)
        rules = NULL_RULES.get(t, {})
        cols = [
            r[0]
            for r in duckdb.sql(f"DESCRIBE SELECT * FROM read_parquet('{p}')").fetchall()
        ]
        sel = ", ".join(
            f"CASE WHEN {rules[c]} THEN NULL ELSE {c} END AS {c}" if c in rules else c
            for c in cols
        )
        duckdb.sql(
            f"COPY (SELECT {sel} FROM read_parquet('{p}')) TO '{dst}/{t}' (FORMAT parquet)"
        )
    print(dst, "written")


if __name__ == "__main__":
    main()
