"""Bulk-operations surface — /submitOperation analog (SURVEY §2.8).

The reference turns a /filter query into a per-inode operation stream
(delete | setReplication:N | setStoragePolicy:P) executed with per-inode
throttling (NamenodeAnalyticsMethods.java:2065-2434). Its OSS delete body
is itself a stub (operations/Delete.java:45-53), so the contract here is
the *plan*: a deterministic list of target paths plus the would-be action,
which a real deployment hands to an HDFS client executor.

Spark-native shape: the operation plan IS a DataFrame (streamable,
checkpointable, resumable); applying it to the metadata table is a join,
so a what-if "post-operation namespace" is also queryable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nnanalytics_spark.core.ir import Query

SUPPORTED = ("delete", "setReplication", "setStoragePolicy")


@dataclass(frozen=True)
class Operation:
    kind: str  # delete | setReplication | setStoragePolicy
    argument: int | None = None

    def __post_init__(self) -> None:
        if self.kind not in SUPPORTED:
            raise ValueError(f"unsupported operation {self.kind!r}")
        if self.kind != "delete" and self.argument is None:
            raise ValueError(f"{self.kind} requires an argument")


def plan_operation(engine, query: Query, op: Operation) -> DataFrame:
    """Filtered target list with the action attached — the operation plan
    the reference queues per inode."""
    targets = engine._filtered(query).select("id", "path")
    return targets.select(
        "id",
        "path",
        F.lit(op.kind).alias("operation"),
        F.lit(op.argument).cast("int").alias("argument"),
    ).orderBy("path")


class OperationRegistry:
    """/submitOperation + /listOperations + /abortOperation analog
    (NamenodeAnalyticsMethods.java:2065-2434).

    The reference queues per-inode actions and throttles with a sleep
    between inodes; here the plan is a path-ordered DataFrame and the
    executor paces itself by drawing fixed-size batches (`next_batch`) —
    the same backpressure contract without a thread sleeping per row.
    Abort simply stops further batches; everything already drawn stands,
    matching the reference's cooperative abort."""

    def __init__(self) -> None:
        import threading

        self._ops: dict[int, dict] = {}
        self._next_id = 1
        # the web layer serves requests from a thread pool: id allocation
        # and the cursor's read-modify-write must not interleave (Spark
        # actions inside submit release the GIL for long stretches)
        self._lock = threading.Lock()

    def submit(self, engine, query: Query, op: Operation, batch_size: int = 1000) -> int:
        from pyspark.sql.types import LongType, StructField, StructType

        plan = plan_operation(engine, query, op)
        # Materialize the ordered plan ONCE with a stable row index:
        # zipWithIndex keeps the sort's range-partitioned global order and
        # never funnels through one partition the way a row_number() over
        # an unpartitioned window would; localCheckpoint pins the result so
        # each batch is a cheap index-range scan, not a full recompute.
        schema = StructType(
            list(plan.schema.fields) + [StructField("__idx", LongType(), False)]
        )
        indexed = (
            plan.rdd.zipWithIndex()
            .map(lambda t: tuple(t[0]) + (t[1],))
            .toDF(schema)
            .localCheckpoint()
        )
        with self._lock:
            op_id = self._next_id
            self._next_id += 1
        self._ops[op_id] = {
            "plan": indexed,
            "operation": op.kind,
            "argument": op.argument,
            "batch_size": batch_size,
            "cursor": 0,
            "total": indexed.count(),
            "status": "running",
        }
        return op_id

    def list_operations(self) -> list[dict]:
        return [
            {
                "id": op_id,
                "operation": st["operation"],
                "argument": st["argument"],
                "total": st["total"],
                "processed": st["cursor"],
                "status": st["status"],
            }
            for op_id, st in sorted(self._ops.items())
        ]

    def next_batch(self, op_id: int) -> DataFrame | None:
        """The next batch of targets, or None when done/aborted. Batches
        filter on the index precomputed at submit time, so a retry of the
        same batch sees the same rows and each draw costs one scan of the
        checkpointed plan — not a re-sort of the whole target list."""
        st = self._ops[op_id]
        with self._lock:
            if st["status"] != "running":
                return None
            if st["cursor"] >= st["total"]:
                st["status"] = "done"
                return None
            lo, hi = st["cursor"], st["cursor"] + st["batch_size"]
            st["cursor"] = min(hi, st["total"])
            if st["cursor"] >= st["total"]:
                st["status"] = "done"
        return (
            st["plan"]
            .filter((F.col("__idx") >= lo) & (F.col("__idx") < hi))
            .drop("__idx")
        )

    def abort(self, op_id: int) -> None:
        if self._ops[op_id]["status"] == "running":
            self._ops[op_id]["status"] = "aborted"


def apply_operation_whatif(inodes: DataFrame, plan: DataFrame) -> DataFrame:
    """The namespace as it WOULD look after the operation — delete removes
    rows, setReplication rewrites fileReplica. One hash join on id."""
    keyed = plan.select("id", "operation", "argument")
    joined = inodes.join(keyed, "id", "left")
    survived = joined.filter(
        F.col("operation").isNull() | (F.col("operation") != "delete")
    )
    return (
        survived.withColumn(
            "fileReplica",
            F.when(
                F.col("operation") == "setReplication", F.col("argument")
            ).otherwise(F.col("fileReplica")),
        )
        .withColumn(
            "storagePolicyId",
            F.when(
                F.col("operation") == "setStoragePolicy", F.col("argument")
            ).otherwise(F.col("storagePolicyId")),
        )
        .drop("operation", "argument")
    )
