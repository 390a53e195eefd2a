"""Write EMPTY (0-row) and SINGLE-ROW variants of every test table,
schema-identical to /root/testdata/sf0.001, for the degenerate-input
sweep (tools/degenerate_probe.py). DuckDB round-trips the parquet
schema exactly, so Spark reads the same dtypes it reads at real SFs."""

from __future__ import annotations

import glob
import os

import duckdb

SRC = "/root/testdata/sf0.001"


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


if __name__ == "__main__":
    main()
