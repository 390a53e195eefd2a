"""Deterministic synthetic inode namespace for correctness tests.

Mirrors the reference's test fixture (GSetGeneratorBase.java:33-103 +
src/test/3.3.0/.../GSetGenerator.java:55-131): a tree of depth `levels`
with `dirs_per_level` dirs per level and `files_per_dir` files per leaf
dir; timestamps uniform in the last 365 days (plus deliberate old/new
tails), replication 3 with p=0.5 else uniform 1-10, 0-3 blocks with a
partial last block, quotas on ~half the dirs, storage policy uniform over
the default suite ids. Seeded (numpy PCG64) → identical table every run.

Column layout per FIXTURES.md §1 (stored columns only; derived columns are
computed by the engine so tests exercise the derivation expressions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BLOCK_SIZE = 134_217_728  # 128 MiB, GSetGeneratorBase.java:47
DAY_MS = 86_400_000
POLICY_IDS = np.array([15, 12, 10, 7, 5, 2, 0])
FILE_NAMES = [
    "file{i}",  # bulk UNKNOWN
    "part-0{i:04d}",  # PART (prefix stage)
    "part-r-{i:05d}.gz",  # PART_R beats .gz (stage order)
    "data{i}.parquet",
    "app{i}.log",
    "notes{i}.txt",
    "blob{i}.json",
    "archive{i}.snappy",
    "container_{i}_45454",  # APP_LOG ('_' suffix stage)
    "_SUCCESS",  # equals stage
    ".pig_header",
    "misc{i}.avro",
]

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("parent", T.StringType(), False),
        T.StructField("user", T.StringType(), False),
        T.StructField("group", T.StringType(), False),
        T.StructField("permission", T.IntegerType(), False),
        T.StructField("accessTime", T.LongType(), False),
        T.StructField("modTime", T.LongType(), False),
        T.StructField("fileSize", T.LongType(), True),
        T.StructField("blockSize", T.LongType(), True),
        T.StructField("numBlocks", T.IntegerType(), True),
        T.StructField("fileReplica", T.IntegerType(), True),
        T.StructField("storagePolicyId", T.IntegerType(), False),
        T.StructField("nsQuota", T.LongType(), True),
        T.StructField("dsQuota", T.LongType(), True),
        T.StructField("nsQuotaUsed", T.LongType(), True),
        T.StructField("dsQuotaUsed", T.LongType(), True),
        T.StructField("isUnderConstruction", T.BooleanType(), True),
        T.StructField("isWithSnapshot", T.BooleanType(), False),
        T.StructField("hasAcl", T.BooleanType(), False),
        T.StructField("hasEcPolicy", T.BooleanType(), False),
        T.StructField("dirNumChildren", T.IntegerType(), True),
    ]
)

USERS = np.array(["hdfs", "hdfs", "test_user", "etl", "analytics", "web"])
GROUPS = np.array(["hdfs", "hdfs", "analytics", "ops"])
PERMS = np.array([0o755, 0o644, 0o700, 0o777])
NOW_MS = 1_755_000_000_000  # fixed anchor → reproducible time buckets


def generate_pandas(
    levels: int = 3,
    dirs_per_level: int = 10,
    files_per_dir: int = 100,
    seed: int = 42,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)

    dir_paths: list[str] = ["/"]
    frontier = [""]
    for _ in range(levels):
        frontier = [f"{p}/dir{i}" for p in frontier for i in range(dirs_per_level)]
        dir_paths.extend(frontier)
    leaf_dirs = frontier

    rows_path: list[str] = []
    rows_type: list[str] = []
    rows_parent: list[str] = []
    rows_name: list[str] = []
    for d in dir_paths:
        rows_path.append(d)
        rows_type.append("dir")
        parent = d.rsplit("/", 1)[0] or "/"
        rows_parent.append(parent if d != "/" else "/")
        rows_name.append(d.rsplit("/", 1)[-1] or "/")
    name_cycle = len(FILE_NAMES)
    for d in leaf_dirs:
        for i in range(files_per_dir):
            template = FILE_NAMES[i % name_cycle]
            rows_path.append(f"{d}/{template.format(i=i)}")
            rows_type.append("file")
            rows_parent.append(d)
            rows_name.append(template.format(i=i))

    n = len(rows_path)
    is_file = np.array([t == "file" for t in rows_type])
    n_files = int(is_file.sum())
    n_dirs = n - n_files

    # timestamps: uniform last 365 d, with old (1-3 y) and fresh (<24 h) tails
    mod = NOW_MS - rng.integers(0, 365 * DAY_MS, size=n)
    old = rng.random(n) < 0.10
    mod[old] = NOW_MS - rng.integers(365 * DAY_MS, 3 * 365 * DAY_MS, size=int(old.sum()))
    fresh = rng.random(n) < 0.02
    mod[fresh] = NOW_MS - rng.integers(0, DAY_MS, size=int(fresh.sum()))
    access = mod + rng.integers(0, 30 * DAY_MS, size=n)
    access = np.minimum(access, NOW_MS)

    num_blocks = np.where(is_file, rng.integers(0, 4, size=n), 0)
    partial = rng.integers(1, BLOCK_SIZE, size=n)
    file_size = np.where(
        num_blocks > 0, (num_blocks - 1).clip(0) * BLOCK_SIZE + partial, 0
    ).astype(np.int64)
    # deliberate boundary + small sizes so suggestion metrics are non-trivial
    small_pick = rng.random(n) < 0.45
    small_sizes = rng.choice(
        np.array([0, 1, 512, 1024, 1025, 4096, 1_048_576, 1_048_577, 134_217_728]), size=n
    )
    file_size = np.where(is_file & small_pick, small_sizes, np.where(is_file, file_size, 0))
    num_blocks = np.where(is_file, np.ceil(file_size / BLOCK_SIZE).clip(0).astype(np.int64), 0)
    num_blocks = np.where(is_file & (file_size > 0), np.maximum(num_blocks, 1), num_blocks)

    replica = np.where(rng.random(n) < 0.5, 3, rng.integers(1, 11, size=n))
    replica = np.where(is_file, replica, 0)

    quota_set = (~is_file) & (rng.random(n) < 0.5) & (np.array(rows_path) != "/")
    ns_quota = np.where(quota_set, 9000, -1)
    ds_quota = np.where(quota_set, 9_999_999_999, -1)
    ns_used = np.where(quota_set, rng.integers(0, 9000, size=n), 0)
    ds_used = np.where(quota_set, rng.integers(0, 9_999_999_991, size=n), 0)

    children: dict[str, int] = {}
    for p, parent in zip(rows_path, rows_parent):
        if p != "/":
            children[parent] = children.get(parent, 0) + 1

    pdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "type": rows_type,
            "path": rows_path,
            "name": rows_name,
            "parent": rows_parent,
            "user": rng.choice(USERS, size=n),
            "group": rng.choice(GROUPS, size=n),
            "permission": rng.choice(PERMS, size=n).astype(np.int32),
            "accessTime": access.astype(np.int64),
            "modTime": mod.astype(np.int64),
            "fileSize": np.where(is_file, file_size, 0).astype(np.int64),
            "blockSize": np.where(is_file, BLOCK_SIZE, 0).astype(np.int64),
            "numBlocks": num_blocks.astype(np.int32),
            "fileReplica": replica.astype(np.int32),
            "storagePolicyId": rng.choice(POLICY_IDS, size=n).astype(np.int32),
            "nsQuota": ns_quota.astype(np.int64),
            "dsQuota": ds_quota.astype(np.int64),
            "nsQuotaUsed": ns_used.astype(np.int64),
            "dsQuotaUsed": ds_used.astype(np.int64),
            "isUnderConstruction": is_file & (rng.random(n) < 0.01),
            "isWithSnapshot": rng.random(n) < 0.02,
            "hasAcl": rng.random(n) < 0.02,
            "hasEcPolicy": is_file & (rng.random(n) < 0.02),
            "dirNumChildren": np.where(
                is_file, 0, [children.get(p, 0) for p in rows_path]
            ).astype(np.int32),
        }
    )
    return pdf


def generate(spark: SparkSession, **kwargs) -> DataFrame:
    return spark.createDataFrame(generate_pandas(**kwargs), schema=SCHEMA)
