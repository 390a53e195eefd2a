"""Storage layout for the inode table at 100 TB scale.

The reference holds every INode on the JVM heap and partitions once into
files/dirs maps (AbstractQueryEngine.java:64-119). The Spark-native layout
is a Parquet (or any columnar) table laid out so the hot query patterns
never touch data they don't need:

- ``partitionBy("type")``: the files/dirs set selection (every query's
  first step) becomes partition PRUNING — a dirs query never opens a
  files file. Two partitions is coarse, but it is the exact analog of the
  reference's one-time GSet split, and it is free.
- sorted within partitions by ``path``: parquet min/max stats turn
  path-prefix predicates (contentSummary, parentDir scoping) into row-group
  skipping, the scan-level analog of the reference's LCA prefix tree
  (VirtualINodeTree.java).
- narrow stored schema + derived columns as expressions: column pruning
  reads only what a query touches (the reference always materializes whole
  INodes).

``repartitionByRange`` on path also co-locates subtrees, which makes the
ancestor-explode joins (subtree.py) produce mostly-local shuffle keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_inode_table(inodes: DataFrame, path: str, path_partitions: int = 32) -> None:
    """Write the inode table in the scale layout: type-partitioned,
    range-distributed and sorted by path."""
    (
        inodes.repartitionByRange(path_partitions, "path")
        .sortWithinPartitions("path")
        .write.mode("overwrite")
        .partitionBy("type")
        .parquet(path)
    )


def read_inode_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Bucketing is the co-located-join lever at 100 TB: two tables bucketed
    on the same key with the same bucket count join with NO shuffle on
    either side (and no sort when both are sorted) — the exchange that
    dominates a fact-fact join simply disappears from the plan.
    ``tests/test_sources.py`` asserts the shuffle-free plan."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)  # external table — no warehouse needed
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — required (vs. path read) for bucket metadata."""
    return spark.table(table)
