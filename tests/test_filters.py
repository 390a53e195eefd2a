"""Filter-op semantics vs pandas-computed expectations on the fixture."""

from __future__ import annotations

import pytest

from nnanalytics_spark.core.ir import Query
from nnanalytics_spark.inode import fixture
from nnanalytics_spark.inode.columns import InvalidQueryError

NOW = fixture.NOW_MS
DAY = 86_400_000


def count(engine, **kw):
    q = Query(sums=["count"], now_ms=NOW, **kw)
    return engine.filter_sum(q).collect()[0][0]


def files(pdf):
    return pdf[pdf.type == "file"]


def test_long_eq(engine, inodes_pdf):
    expect = int((files(inodes_pdf).fileSize == 0).sum())
    assert count(engine, set="files", filters=[("fileSize", "eq", "0")]) == expect


def test_long_range_ops(engine, inodes_pdf):
    f = files(inodes_pdf)
    expect = int(((f.fileSize > 1024) & (f.fileSize <= 1_048_576)).sum())
    got = count(
        engine,
        set="files",
        filters=[("fileSize", "gt", "1024"), ("fileSize", "lte", "1048576")],
    )
    assert got == expect


def test_relative_time_ops(engine, inodes_pdf):
    f = files(inodes_pdf)
    expect = int((f.modTime >= NOW - 24 * 3_600_000).sum())
    assert count(engine, set="files", filters=[("modTime", "hoursAgo", "24")]) == expect
    # olderThanYears uses the fixed 365-day year
    expect_old = int((f.accessTime <= NOW - 365 * DAY).sum())
    assert (
        count(engine, set="files", filters=[("accessTime", "olderThanYears", "1")])
        == expect_old
    )


def test_string_ops(engine, inodes_pdf):
    f = files(inodes_pdf)
    assert count(engine, set="files", filters=[("name", "startsWith", "part-")]) == int(
        f.name.str.startswith("part-").sum()
    )
    assert count(engine, set="files", filters=[("name", "endsWith", ".parquet")]) == int(
        f.name.str.endswith(".parquet").sum()
    )
    assert count(engine, set="files", filters=[("name", "notContains", "file")]) == int(
        (~f.name.str.contains("file")).sum()
    )


def test_bool_ops(engine, inodes_pdf):
    f = files(inodes_pdf)
    assert count(
        engine, set="files", filters=[("isUnderConstruction", "eq", "true")]
    ) == int(f.isUnderConstruction.sum())


def test_permission_octal_rendering(engine, inodes_pdf):
    """permission filters compare the DECIMAL RENDERING of octal bits
    (e.g. 0o755 → 755), AbstractQueryEngine.java:192-193."""
    f = files(inodes_pdf)
    expect = int((f.permission == 0o755).sum())
    assert count(engine, set="files", filters=[("permission", "eq", "755")]) == expect


def test_date_ops(engine, inodes_pdf):
    import pandas as pd

    f = files(inodes_pdf)
    cutoff = pd.Timestamp("2024-06-01")
    days = pd.to_datetime(f.modTime, unit="ms").dt.normalize()
    expect = int((days < cutoff).sum())
    assert count(engine, set="files", filters=[("modDate", "dateLt", "06/01/2024")]) == expect


def test_validity_matrix_rejects(engine):
    with pytest.raises(InvalidQueryError):
        count(engine, set="dirs", filters=[("fileSize", "eq", "0")])
    with pytest.raises(InvalidQueryError):
        count(engine, set="all", filters=[("fileReplica", "eq", "3")])


def test_and_chain_only(engine, inodes_pdf):
    f = files(inodes_pdf)
    expect = int(((f.fileSize > 0) & (f.user == "hdfs") & (f.fileReplica == 3)).sum())
    got = count(
        engine,
        set="files",
        filters=[("fileSize", "gt", "0"), ("user", "eq", "hdfs"), ("fileReplica", "eq", "3")],
    )
    assert got == expect
