"""QueryGuard: job tagging, bookkeeping, cancellation of a running query."""

from __future__ import annotations

import threading
import time

import pytest

from nnanalytics_spark.core.admission import QueryGuard, use_fair_pool


def test_guard_tracks_active_queries(spark, inodes):
    guard = QueryGuard(spark)
    with guard.run("count files") as gid:
        assert guard.active_queries() == {gid: "count files"}
        inodes.count()
    assert guard.active_queries() == {}


def test_cancel_interrupts_running_query(spark):
    guard = QueryGuard(spark)
    err: list[Exception] = []
    started = threading.Event()

    def slow_query():
        big = spark.range(2_000_000_000)  # far more work than the wait below
        try:
            with guard.run("slow scan"):
                started.set()
                big.selectExpr("sum(id * id)").collect()
        except Exception as exc:  # cancellation surfaces as a Spark job error
            err.append(exc)

    t = threading.Thread(target=slow_query)
    t.start()
    started.wait(10)
    time.sleep(0.5)  # let stages actually launch
    guard.cancel_all()
    t.join(30)
    assert not t.is_alive()
    assert err, "query should have been cancelled, not completed"


def test_fair_pool_local_property(spark):
    use_fair_pool(spark, "analytics")
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") == "analytics"
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
