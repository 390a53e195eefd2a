"""Table loaders for the driver testdata + fsimage-shaped sources.

The reference ingests an HDFS FSImage checkpoint (NameNodeLoader.java:319-396)
and keeps it fresh by tailing the edit log. The Spark-native equivalents:

- ``load_tables``: batch parquet reads of the driver-generated star schema
  (TESTDATA.md) — predicate pushdown and column pruning reach the scan.
- ``read_fsimage_csv``: an `hdfs oiv -p Delimited` export → inode
  DataFrame in the stored-schema layout (fixture.py). This is how a real
  deployment feeds this engine from a production NameNode, no reflection
  into live NameNode memory required.
- snapshot refresh for freshness lives in streaming/refresh.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, register_views: bool = True) -> dict[str, DataFrame]:
    out = {}
    for name in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


# `hdfs oiv -p Delimited` column order (public Hadoop OIV tool output).
_OIV_COLUMNS = [
    "Path", "Replication", "ModificationTime", "AccessTime", "PreferredBlockSize",
    "BlocksCount", "FileSize", "NSQUOTA", "DSQUOTA", "Permission", "UserName", "GroupName",
]


def read_fsimage_csv(spark: SparkSession, path: str, sep: str = "\t") -> DataFrame:
    """Parse a delimited OIV export into the engine's stored inode schema."""
    raw = spark.read.option("header", True).option("sep", sep).csv(path)
    is_dir = F.col("Permission").startswith("d")
    # OIV renders permissions symbolically ("-rw-r--r--"): position 1 is the
    # type flag, then three rwx triplets → POSIX bits
    perm_bits = None
    for i, weight in enumerate([256, 128, 64, 32, 16, 8, 4, 2, 1]):
        bit = F.when(F.substring("Permission", i + 2, 1) != "-", weight).otherwise(0)
        perm_bits = bit if perm_bits is None else (perm_bits + bit)
    return raw.select(
        F.monotonically_increasing_id().alias("id"),
        F.when(is_dir, "dir").otherwise("file").alias("type"),
        F.col("Path").alias("path"),
        F.element_at(F.split(F.col("Path"), "/"), -1).alias("name"),
        F.coalesce(
            F.nullif(F.regexp_extract(F.col("Path"), r"^(.*)/[^/]+$", 1), F.lit("")), F.lit("/")
        ).alias("parent"),
        F.col("UserName").alias("user"),
        F.col("GroupName").alias("group"),
        perm_bits.cast("int").alias("permission"),
        F.unix_millis(F.to_timestamp("AccessTime")).alias("accessTime"),
        F.unix_millis(F.to_timestamp("ModificationTime")).alias("modTime"),
        F.col("FileSize").cast("long").alias("fileSize"),
        F.col("PreferredBlockSize").cast("long").alias("blockSize"),
        F.col("BlocksCount").cast("int").alias("numBlocks"),
        F.col("Replication").cast("int").alias("fileReplica"),
        F.lit(0).alias("storagePolicyId"),
        F.col("NSQUOTA").cast("long").alias("nsQuota"),
        F.col("DSQUOTA").cast("long").alias("dsQuota"),
        F.lit(0).cast("long").alias("nsQuotaUsed"),
        F.lit(0).cast("long").alias("dsQuotaUsed"),
        F.lit(False).alias("isUnderConstruction"),
        F.lit(False).alias("isWithSnapshot"),
        F.lit(False).alias("hasAcl"),
        F.lit(False).alias("hasEcPolicy"),
        F.lit(0).cast("int").alias("dirNumChildren"),
    )
