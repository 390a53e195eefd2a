"""Query admission & cancellation — the queryLock / cancelRequest analog.

The reference serializes analytical queries behind a global write lock and
offers a cooperative cancel flag (NamenodeAnalyticsMethods.java:1535-1539,
/queryGuard 415-441). Spark replaces both with scheduler facilities:

- FAIR scheduler pools give concurrent queries weighted shares instead of
  a one-at-a-time lock (strictly better; the lock exists in the reference
  because queries mutate shared iterator state, which DataFrames don't);
- job groups give per-query cancellation (`cancel()` interrupts all of a
  query's running stages), the cancelRequest analog.
"""

from __future__ import annotations

import threading
import uuid
from collections.abc import Callable

from pyspark.sql import SparkSession


class QueryGuard:
    """Tag a query's jobs so it can be watched and cancelled.

    Usage:
        guard = QueryGuard(spark)
        with guard.run("histogram-user") as handle:
            result = df.collect()        # cancellable from another thread
        # elsewhere: guard.cancel(handle)
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._active: dict[str, str] = {}
        self._lock = threading.Lock()

    def run(self, description: str) -> "_GuardContext":
        group_id = f"nna-query-{uuid.uuid4().hex[:12]}"
        return _GuardContext(self, group_id, description)

    def active_queries(self) -> dict[str, str]:
        with self._lock:
            return dict(self._active)

    def cancel(self, group_id: str) -> None:
        """Cooperative cancel: interrupts every running stage of the query
        (the reference's cancelRequest aborts between stream elements)."""
        self.spark.sparkContext.cancelJobGroup(group_id)

    def cancel_all(self) -> None:
        for group_id in self.active_queries():
            self.cancel(group_id)


class _GuardContext:
    def __init__(self, guard: QueryGuard, group_id: str, description: str):
        self.guard = guard
        self.group_id = group_id
        self.description = description

    def __enter__(self) -> str:
        sc = self.guard.spark.sparkContext
        sc.setJobGroup(self.group_id, self.description, interruptOnCancel=True)
        with self.guard._lock:
            self.guard._active[self.group_id] = self.description
        return self.group_id

    def __exit__(self, *exc) -> None:
        sc = self.guard.spark.sparkContext
        sc.setJobGroup("", "")
        with self.guard._lock:
            self.guard._active.pop(self.group_id, None)


def use_fair_pool(spark: SparkSession, pool: str = "analytics") -> None:
    """Assign this thread's queries to a FAIR scheduler pool (set
    spark.scheduler.mode=FAIR cluster-side for weighted sharing)."""
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
