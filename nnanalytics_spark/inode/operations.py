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
