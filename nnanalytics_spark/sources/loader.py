"""Table loaders for the driver testdata + fsimage-shaped sources.

The reference ingests an HDFS FSImage checkpoint (NameNodeLoader.java:319-396)
and keeps it fresh by tailing the edit log. The Spark-native equivalents:

- ``load_tables``: batch parquet reads of the driver-generated star schema
  (TESTDATA.md) — predicate pushdown and column pruning reach the scan.
- ``read_fsimage_csv``: an `hdfs oiv -p Delimited` export → inode
  DataFrame in the stored-schema layout (fixture.py). This is how a real
  deployment feeds this engine from a production NameNode, no reflection
  into live NameNode memory required.
- ``read_fsimage_xml``: an `hdfs oiv -p XML` export (the more common
  format in practice) → the same stored schema, including absolute-path
  reconstruction from the INodeDirectorySection parent/child edges.
- the RAW binary checkpoint needs no export at all: fsimage.py parses
  the protobuf container directly (the reference's own ingestion path).
- snapshot refresh for freshness lives in streaming/refresh.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


# `hdfs oiv -p XML` element layout (public Hadoop OfflineImageViewer
# PBImageXmlWriter output). Explicit schemas: inference would collapse a
# single repeated element (<child>, <block>) to a scalar.
_XML_INODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("replication", T.IntegerType()),
        T.StructField("mtime", T.LongType()),
        T.StructField("atime", T.LongType()),
        # PBImageXmlWriter historically misspells this element
        # ("perferredBlockSize", HDFS-10410); accept both spellings.
        T.StructField("preferredBlockSize", T.LongType()),
        T.StructField("perferredBlockSize", T.LongType()),
        T.StructField("permission", T.StringType()),
        T.StructField("nsquota", T.LongType()),
        T.StructField("dsquota", T.LongType()),
        T.StructField("storagePolicyId", T.IntegerType()),
        T.StructField(
            "blocks",
            T.StructType(
                [
                    T.StructField(
                        "block",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("id", T.LongType()),
                                    T.StructField("genstamp", T.LongType()),
                                    T.StructField("numBytes", T.LongType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)

_XML_DIR_SCHEMA = T.StructType(
    [
        T.StructField("parent", T.LongType()),
        T.StructField("child", T.ArrayType(T.LongType())),
    ]
)


def _symbolic_perm_bits(sym: F.Column) -> F.Column:
    """9-char symbolic permission string → POSIX bits (same contract as
    the delimited reader, minus the type-flag prefix)."""
    bits = None
    for i, weight in enumerate([256, 128, 64, 32, 16, 8, 4, 2, 1]):
        bit = F.when(F.substring(sym, i + 1, 1) != "-", weight).otherwise(0)
        bits = bit if bits is None else (bits + bit)
    return bits.cast("int")


def resolve_paths(names: DataFrame, edges: DataFrame, max_depth: int = 64) -> DataFrame:
    """Rebuild absolute paths from (id, name) + (parent_id, id) edges by a
    root-down level walk: one equi-join per tree level. Level d resolves
    in round d, so the loop runs tree-depth rounds (HDFS trees: tens, not
    thousands), and every join is keyed on the 8-byte parent id.
    localCheckpoint per round keeps the plan from nesting. Shared by the
    OIV-XML and binary-protobuf fsimage readers — both formats carry
    names + edges, never absolute paths."""
    nodes = names.join(edges, "id", "left")
    resolved = (
        nodes.filter(F.col("parent_id").isNull())
        .select("id", F.lit("/").alias("path"))
        .localCheckpoint()
    )
    frontier = resolved
    remaining = nodes.filter(F.col("parent_id").isNotNull()).localCheckpoint()
    for _ in range(max_depth):
        if remaining.isEmpty():
            break
        step = remaining.join(
            frontier.select(F.col("id").alias("parent_id"), F.col("path").alias("pp")),
            "parent_id",
        ).select(
            "id",
            F.concat(
                F.when(F.col("pp") == "/", F.lit("")).otherwise(F.col("pp")),
                F.lit("/"),
                F.col("name"),
            ).alias("path"),
        )
        frontier = step.localCheckpoint()
        if frontier.isEmpty():
            break
        resolved = resolved.unionByName(frontier).localCheckpoint()
        remaining = remaining.join(frontier.select("id"), "id", "left_anti").localCheckpoint()
    return resolved


def read_fsimage_xml(spark: SparkSession, path: str, max_depth: int = 64) -> DataFrame:
    """Parse an `hdfs oiv -p XML` export into the stored inode schema.

    The XML carries names + parent/child edges, not absolute paths
    (PBImageXmlWriter: INodeSection then INodeDirectorySection), so paths
    are rebuilt level by level (resolve_paths). The inode scan itself
    stays columnar/pruned; only (id, parent, name) rides the path walk.
    """
    inodes = (
        spark.read.format("xml")
        .option("rowTag", "inode")
        .schema(_XML_INODE_SCHEMA)
        .load(path)
    )
    dirsec = (
        spark.read.format("xml")
        .option("rowTag", "directory")
        .schema(_XML_DIR_SCHEMA)
        .load(path)
    )
    edges = dirsec.select(
        F.col("parent").alias("parent_id"), F.explode("child").alias("id")
    )
    names = inodes.select("id", F.coalesce("name", F.lit("")).alias("name"))
    paths = resolve_paths(names, edges, max_depth)

    is_dir = F.col("type") == "DIRECTORY"
    perm_parts = F.split(F.col("permission"), ":")
    block_bytes = F.coalesce(
        F.aggregate(
            F.coalesce(F.col("blocks.block"), F.array()),
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.coalesce(b["numBytes"], F.lit(0)),
        ),
        F.lit(0).cast("long"),
    )
    out = inodes.join(paths, "id")
    return out.select(
        F.col("id"),
        F.when(is_dir, "dir").otherwise("file").alias("type"),
        F.col("path"),
        F.coalesce(
            F.nullif(F.col("name"), F.lit("")), F.lit("/")
        ).alias("name"),
        F.coalesce(
            F.nullif(F.regexp_extract(F.col("path"), r"^(.*)/[^/]+$", 1), F.lit("")),
            F.lit("/"),
        ).alias("parent"),
        F.element_at(perm_parts, 1).alias("user"),
        F.element_at(perm_parts, 2).alias("group"),
        _symbolic_perm_bits(F.element_at(perm_parts, 3)).alias("permission"),
        F.coalesce("atime", F.lit(0)).alias("accessTime"),
        F.coalesce("mtime", F.lit(0)).alias("modTime"),
        F.when(is_dir, F.lit(None)).otherwise(block_bytes).alias("fileSize"),
        F.coalesce("preferredBlockSize", "perferredBlockSize").alias("blockSize"),
        F.when(is_dir, F.lit(None)).otherwise(
            F.size(F.coalesce(F.col("blocks.block"), F.array()))
        ).cast("int").alias("numBlocks"),
        F.col("replication").alias("fileReplica"),
        F.coalesce("storagePolicyId", F.lit(0)).alias("storagePolicyId"),
        F.col("nsquota").alias("nsQuota"),
        F.col("dsquota").alias("dsQuota"),
        F.lit(0).cast("long").alias("nsQuotaUsed"),
        F.lit(0).cast("long").alias("dsQuotaUsed"),
        F.lit(False).alias("isUnderConstruction"),
        F.lit(False).alias("isWithSnapshot"),
        F.lit(False).alias("hasAcl"),
        F.lit(False).alias("hasEcPolicy"),
        F.lit(0).cast("int").alias("dirNumChildren"),
    )
