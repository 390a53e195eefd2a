"""Cross-engine parity: INodeEngine results vs DuckDB SQL over the SAME
fixture table. Independent of the pandas assertions — this catches
expression-compilation bugs (bin edges, octal rendering, time arithmetic)
by re-deriving every semantic in a second engine."""

from __future__ import annotations

import duckdb
import pytest

from nnanalytics_spark.core.ir import Query
from nnanalytics_spark.inode import bins, fixture

NOW = fixture.NOW_MS
MONTH_MS = 30 * 86_400_000


@pytest.fixture(scope="module")
def duck(inodes_pdf):
    con = duckdb.connect()
    con.register("inodes", inodes_pdf)
    return con


def spark_map(df):
    return {tuple(r[:-1]) if len(r) > 2 else r[0]: r[-1] for r in df.collect()}


def duck_map(con, sql):
    return {tuple(r[:-1]) if len(r) > 2 else r[0]: r[-1] for r in con.execute(sql).fetchall()}


def test_filter_sum_relative_time(engine, duck):
    got = engine.filter_sum(
        Query(set="files", filters=[("accessTime", "olderThanYears", "1")],
              sums=["count", "diskspaceConsumed"], now_ms=NOW)
    ).collect()[0]
    want = duck.execute(
        f"""SELECT count(*), sum(fileSize * fileReplica) FROM inodes
            WHERE type = 'file' AND accessTime <= {NOW} - 365 * 86400000::BIGINT"""
    ).fetchone()
    assert (got[0], got[1]) == want


def test_permission_octal_rendering(engine, duck):
    got = spark_map(
        engine.histogram(Query(set="files", type="user", sums=["count"],
                               filters=[("permission", "eq", "755")], now_ms=NOW))
    )
    want = duck_map(
        duck,
        """SELECT "user", count(*) FROM inodes
           WHERE type = 'file' AND permission = 493 GROUP BY 1""",  # 0o755
    )
    assert got == want


def test_space_bucket_parity(engine, duck):
    got = spark_map(engine.histogram(Query(set="files", type="fileSize", sums=["count"], now_ms=NOW)))
    want = duck_map(
        duck,
        """SELECT CASE
             WHEN fileSize < 0 THEN 'NO_MAPPING'
             WHEN fileSize = 0 THEN '0 B'
             WHEN fileSize <= 1024 THEN '1 KB'
             WHEN fileSize <= 1048576 THEN '1 MB'
             WHEN fileSize <= 16777216 THEN '16 MB'
             WHEN fileSize <= 67108864 THEN '64 MB'
             WHEN fileSize <= 134217728 THEN '128 MB'
             WHEN fileSize <= 268435456 THEN '256 MB'
             WHEN fileSize <= 536870912 THEN '512 MB'
             WHEN fileSize <= 1073741824 THEN '1 GB'
             ELSE '1 GB+' END, count(*)
           FROM inodes WHERE type = 'file' GROUP BY 1""",
    )
    assert got == want


def test_time_bucket_monthly_parity(engine, duck):
    got = spark_map(
        engine.histogram(
            Query(set="files", type="modTime", sums=["count"], time_range="monthly", now_ms=NOW)
        )
    )
    want = duck_map(
        duck,
        f"""WITH b AS (
              SELECT CASE
                WHEN {NOW} - modTime < 0 THEN 'NO_MAPPING'
                WHEN GREATEST(1, CAST(CEIL(({NOW} - modTime) / {MONTH_MS}.0) AS BIGINT)) > 23
                  THEN '23 Months+'
                ELSE CAST(GREATEST(1, CAST(CEIL(({NOW} - modTime) / {MONTH_MS}.0) AS BIGINT))
                          AS VARCHAR) || ' Months' END AS bin
              FROM inodes WHERE type = 'file')
            SELECT bin, count(*) FROM b GROUP BY 1""",
    )
    # spark zero-fills the canonical order; compare non-zero bins + zero checks
    assert {k: v for k, v in got.items() if v > 0} == want
    assert set(got) == set(bins.time_keys("monthly"))


def test_filetype_parity(engine, duck):
    """The 3-stage classifier re-derived as DuckDB SQL from the same maps."""
    eq_cases = " ".join(
        f"WHEN name = '{k}' THEN '{v}'" for k, v in bins.FILETYPE_EQUALS.items()
    )
    pre_cases = " ".join(
        f"WHEN length(name) > {6 if len(k) <= 6 else 10} AND starts_with(name, '{k}') THEN '{v}'"
        for k, v in bins.FILETYPE_STARTSWITH.items()
    )
    dot_cases = " ".join(
        f"WHEN contains(name, '.') AND split_part(name, '.', -1) = '{k[1:]}' THEN '{v}'"
        for k, v in bins.FILETYPE_SUFFIX.items() if k.startswith(".")
    )
    under_cases = " ".join(
        f"WHEN contains(name, '_') AND split_part(name, '_', -1) = '{k[1:]}' THEN '{v}'"
        for k, v in bins.FILETYPE_SUFFIX.items() if k.startswith("_")
    )
    got = spark_map(engine.histogram(Query(set="files", type="fileType", sums=["count"], now_ms=NOW)))
    want = duck_map(
        duck,
        f"""SELECT ft, count(*) FROM (
              SELECT CASE {eq_cases} {pre_cases} {dot_cases} {under_cases}
                     ELSE 'UNKNOWN' END AS ft
              FROM inodes WHERE type = 'file') GROUP BY 1""",
    )
    want = {k: v for k, v in want.items() if v > 0}  # engine drops zero fileType bins
    assert got == want


def test_parent_dir_parity(engine, duck):
    got = spark_map(
        engine.histogram(
            Query(set="files", type="parentDir", sums=["count"], parent_dir_depth=2, now_ms=NOW)
        )
    )
    want = duck_map(
        duck,
        """WITH p AS (
             SELECT regexp_split_to_array(path, '/') AS parts
             FROM inodes WHERE type = 'file')
           SELECT array_to_string(parts[1:3], '/'), count(*) FROM p
           WHERE len(parts) - 2 >= 2 GROUP BY 1""",
    )
    assert got == want


def test_subtree_aggregates_parity(spark, inodes, duck):
    from nnanalytics_spark.inode import subtree

    got = {
        r["path"]: (r["dirSubTreeSize"] or 0, r["dirSubTreeNumFiles"] or 0)
        for r in subtree.with_subtree_aggregates(inodes).filter("type = 'dir'").collect()
    }
    want = dict(
        (p, (s or 0, n or 0))
        for p, s, n in duck.execute(
            """SELECT d.path,
                      sum(CASE WHEN i.type = 'file' THEN i.fileSize ELSE 0 END),
                      sum(CASE WHEN i.type = 'file' THEN 1 ELSE 0 END)
               FROM (SELECT path FROM inodes WHERE type = 'dir') d
               LEFT JOIN inodes i
                 ON i.path LIKE d.path || '/%' OR (d.path = '/' AND i.path != '/')
               GROUP BY d.path"""
        ).fetchall()
    )
    assert got == want


def test_suggestions_scalars_parity(inodes, duck):
    from nnanalytics_spark.inode import suggestions

    row = suggestions.file_scalars(inodes, NOW).collect()[0]
    want = duck.execute(
        """SELECT count(*),
                  sum(CASE WHEN fileSize = 0 THEN 1 ELSE 0 END),
                  sum(CASE WHEN fileSize > 0 AND fileSize <= 1024 THEN 1 ELSE 0 END),
                  sum(CASE WHEN fileSize > 1024 AND fileSize <= 1048576 THEN 1 ELSE 0 END)
           FROM inodes WHERE type = 'file'"""
    ).fetchone()
    assert (row["numFiles"], row["emptyFiles"], row["tinyFiles"], row["smallFiles"]) == want
