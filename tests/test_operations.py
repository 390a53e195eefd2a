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


def test_registry_submit_list_batches_abort(engine):
    reg = operations.OperationRegistry()
    q = Query(set="files", filters=[("fileSize", "gte", "0")], now_ms=NOW)
    op_id = reg.submit(engine, q, operations.Operation("setReplication", 2), batch_size=40)
    [status] = reg.list_operations()
    assert status["status"] == "running" and status["processed"] == 0
    total = status["total"]
    assert total > 40

    b1 = reg.next_batch(op_id)
    paths1 = [r["path"] for r in b1.collect()]
    assert len(paths1) == 40
    assert paths1 == sorted(paths1)  # deterministic path order

    # drain a second batch: disjoint from and after the first
    b2 = reg.next_batch(op_id)
    paths2 = [r["path"] for r in b2.collect()]
    assert not set(paths1) & set(paths2)
    assert max(paths1) < min(paths2)

    reg.abort(op_id)
    assert reg.next_batch(op_id) is None
    assert reg.list_operations()[0]["status"] == "aborted"
    assert reg.list_operations()[0]["processed"] == 80


def test_registry_runs_to_done(engine):
    reg = operations.OperationRegistry()
    q = Query(set="files", filters=[("fileSize", "eq", "0")], now_ms=NOW)
    op_id = reg.submit(engine, q, operations.Operation("delete"), batch_size=10_000)
    n = 0
    while (batch := reg.next_batch(op_id)) is not None:
        n += batch.count()
    st = reg.list_operations()[0]
    assert st["status"] == "done" and n == st["total"]
