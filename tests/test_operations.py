"""Bulk-operation plan + what-if application tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nnanalytics_spark.core.ir import Query
from nnanalytics_spark.inode import fixture, operations

NOW = fixture.NOW_MS


def test_plan_is_sorted_target_list(engine, inodes_pdf):
    q = Query(set="files", filters=[("fileSize", "eq", "0")], now_ms=NOW)
    plan = operations.plan_operation(engine, q, operations.Operation("delete")).collect()
    f = inodes_pdf[(inodes_pdf.type == "file") & (inodes_pdf.fileSize == 0)]
    assert [r["path"] for r in plan] == sorted(f.path)
    assert all(r["operation"] == "delete" for r in plan)


def test_whatif_delete_shrinks_namespace(engine, inodes, inodes_pdf):
    q = Query(set="files", filters=[("fileSize", "eq", "0")], now_ms=NOW)
    plan = operations.plan_operation(engine, q, operations.Operation("delete"))
    after = operations.apply_operation_whatif(inodes, plan)
    f = inodes_pdf[inodes_pdf.type == "file"]
    expect = len(inodes_pdf) - int((f.fileSize == 0).sum())
    assert after.count() == expect


def test_whatif_set_replication(engine, inodes, inodes_pdf):
    q = Query(set="files", filters=[("fileReplica", "gte", "5")], now_ms=NOW)
    plan = operations.plan_operation(engine, q, operations.Operation("setReplication", 3))
    after = operations.apply_operation_whatif(inodes, plan)
    assert after.filter((F.col("type") == "file") & (F.col("fileReplica") >= 5)).count() == 0
    assert after.count() == len(inodes_pdf)  # nothing deleted


def test_invalid_operation_rejected():
    with pytest.raises(ValueError):
        operations.Operation("chmod")
    with pytest.raises(ValueError):
        operations.Operation("setReplication")  # missing argument
