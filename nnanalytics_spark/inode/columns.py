"""INode column registry: every virtual attribute of the reference as a
declarative Column expression, plus the per-set validity matrices.

The reference materializes "columns" on demand via extractor lambdas over
live JVM objects (AbstractQueryEngine.java:149-375, VersionContext.java).
Here each column is a pyspark Column expression over the stored schema
(see fixture.py), so Catalyst prunes the Parquet scan down to exactly the
stored columns a query touches — a structural win over the reference, which
always holds whole INode objects in memory.

Validity matrices port Constants.java:364-484 and are enforced by
``validate_query`` (the QueryChecker.isValidQuery analog,
analytics/QueryChecker.java:79-142).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nnanalytics_spark.inode import bins

SETS = ("all", "files", "dirs")


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    dtype: str  # 'long' | 'string' | 'boolean'
    expr: Callable[[DataFrame], Column]


def _stored(name: str) -> Callable[[DataFrame], Column]:
    return lambda df: F.col(name)


def _date_str(ts_ms: str) -> Callable[[DataFrame], Column]:
    # MM/dd/yyyy rendering (AbstractQueryEngine.java:300-319)
    return lambda df: F.date_format(F.timestamp_millis(F.col(ts_ms)), "MM/dd/yyyy")


# ---------------------------------------------------------------- registry
COLUMNS: dict[str, ColumnSpec] = {
    spec.name: spec
    for spec in [
        # stored longs
        ColumnSpec("id", "long", _stored("id")),
        ColumnSpec("accessTime", "long", _stored("accessTime")),
        ColumnSpec("modTime", "long", _stored("modTime")),
        ColumnSpec("fileSize", "long", _stored("fileSize")),
        ColumnSpec("blockSize", "long", _stored("blockSize")),
        ColumnSpec("numBlocks", "long", _stored("numBlocks")),
        ColumnSpec("fileReplica", "long", _stored("fileReplica")),
        ColumnSpec("dirNumChildren", "long", _stored("dirNumChildren")),
        ColumnSpec("storageType", "long", _stored("storagePolicyId")),
        ColumnSpec("nsQuota", "long", _stored("nsQuota")),
        ColumnSpec("dsQuota", "long", _stored("dsQuota")),
        ColumnSpec("nsQuotaUsed", "long", _stored("nsQuotaUsed")),
        ColumnSpec("dsQuotaUsed", "long", _stored("dsQuotaUsed")),
        # derived longs
        ColumnSpec(
            "numReplicas",
            "long",
            lambda df: F.col("numBlocks") * F.col("fileReplica"),
        ),  # AbstractQueryEngine.java:167-168
        ColumnSpec(
            "diskspaceConsumed",
            "long",
            lambda df: F.col("fileSize") * F.col("fileReplica"),
        ),  # VersionContext.java:115-122 (storagespaceConsumed ≈ size × replication)
        ColumnSpec(
            "memoryConsumed",
            "long",
            lambda df: F.lit(150)
            + F.when(F.col("type") == "file", 150 * F.col("numBlocks")).otherwise(0),
        ),  # model constant, AbstractQueryEngine.java:173-180
        ColumnSpec(
            "depth",
            "long",
            lambda df: F.length(F.col("path"))
            - F.length(F.replace(F.col("path"), F.lit("/"), F.lit(""))),
        ),  # count of '/' in full path, AbstractQueryEngine.java:181-191
        ColumnSpec(
            "permission",
            "long",
            lambda df: F.conv(F.col("permission").cast("string"), 10, 8).cast("long"),
        ),  # octal bits rendered into decimal, AbstractQueryEngine.java:192-193
        ColumnSpec(
            "nsQuotaRatioUsed",
            "long",
            lambda df: F.when(
                F.col("nsQuota") > 0, (100 * F.col("nsQuotaUsed") / F.col("nsQuota")).cast("long")
            ).otherwise(0),
        ),  # AbstractQueryEngine.java:438-447; quota <= 0 (unset) → ratio 0,
        #    guarded so ANSI mode can't divide by zero
        ColumnSpec(
            "dsQuotaRatioUsed",
            "long",
            lambda df: F.when(
                F.col("dsQuota") > 0, (100 * F.col("dsQuotaUsed") / F.col("dsQuota")).cast("long")
            ).otherwise(0),
        ),
        # subtree aggregates are join-produced (see subtree.py); the registry
        # exposes them when the caller has materialized them onto the frame.
        ColumnSpec("dirSubTreeSize", "long", _stored("dirSubTreeSize")),
        ColumnSpec("dirSubTreeNumFiles", "long", _stored("dirSubTreeNumFiles")),
        ColumnSpec("dirSubTreeNumDirs", "long", _stored("dirSubTreeNumDirs")),
        # strings
        ColumnSpec("name", "string", _stored("name")),
        ColumnSpec("path", "string", _stored("path")),
        ColumnSpec("user", "string", _stored("user")),
        ColumnSpec("group", "string", _stored("group")),
        ColumnSpec("modDate", "string", _date_str("modTime")),
        ColumnSpec("accessDate", "string", _date_str("accessTime")),
        ColumnSpec("fileType", "string", lambda df: bins.file_type(F.col("name"))),
        # booleans
        ColumnSpec("isUnderConstruction", "boolean", _stored("isUnderConstruction")),
        ColumnSpec("isWithSnapshot", "boolean", _stored("isWithSnapshot")),
        ColumnSpec("hasAcl", "boolean", _stored("hasAcl")),
        ColumnSpec("hasEcPolicy", "boolean", _stored("hasEcPolicy")),
        ColumnSpec(
            "hasQuota",
            "boolean",
            lambda df: (F.col("nsQuota") >= 0) | (F.col("dsQuota") >= 0),
        ),  # VersionContext.java:186-187 (quota feature present)
        # ancestor-walk booleans are join-produced (subtree.py)
        ColumnSpec("isUnderNsQuota", "boolean", _stored("isUnderNsQuota")),
        ColumnSpec("isUnderDsQuota", "boolean", _stored("isUnderDsQuota")),
    ]
}

JOIN_PRODUCED = frozenset(
    {"dirSubTreeSize", "dirSubTreeNumFiles", "dirSubTreeNumDirs", "isUnderNsQuota", "isUnderDsQuota"}
)

# ------------------------------------------------- validity (Constants.java)
FILTER_FILE = frozenset(
    """id blockSize fileSize fileReplica diskspaceConsumed numBlocks numReplicas
    isUnderConstruction storageType accessTime modTime memoryConsumed depth
    permission name path user group modDate accessDate isWithSnapshot hasAcl
    hasQuota isUnderNsQuota isUnderDsQuota hasEcPolicy""".split()
)
FILTER_DIR = frozenset(
    """id dirNumChildren dirSubTreeSize dirSubTreeNumFiles dirSubTreeNumDirs
    accessDate accessTime modDate modTime memoryConsumed depth permission name
    path user group isWithSnapshot hasAcl hasQuota storageType isUnderNsQuota
    isUnderDsQuota hasEcPolicy""".split()
)
FILTER_ALL = FILTER_FILE & FILTER_DIR

TYPE_FILE = frozenset(
    """fileSize fileReplica diskspaceConsumed storageType user accessTime
    modTime memoryConsumed parentDir group fileType""".split()
)
TYPE_DIR = frozenset(
    "user accessTime modTime memoryConsumed parentDir group storageType dirQuota".split()
)
TYPE_ALL = TYPE_FILE & TYPE_DIR

SUM_FILE = frozenset(
    "fileSize diskspaceConsumed blockSize numBlocks numReplicas memoryConsumed count".split()
)
SUM_DIR = frozenset(
    """count dirNumChildren memoryConsumed nsQuota dsQuota nsQuotaUsed
    dsQuotaUsed nsQuotaRatioUsed dsQuotaRatioUsed""".split()
)
SUM_ALL = SUM_FILE & SUM_DIR

FIND_FILE = frozenset(
    "accessTime modTime blockSize diskspaceConsumed fileSize memoryConsumed".split()
)
FIND_DIR = frozenset("accessTime modTime memoryConsumed".split())
FIND_ALL = FIND_FILE & FIND_DIR

_BY_SET = {
    "files": (FILTER_FILE, TYPE_FILE, SUM_FILE, FIND_FILE),
    "dirs": (FILTER_DIR, TYPE_DIR, SUM_DIR, FIND_DIR),
    "all": (FILTER_ALL, TYPE_ALL, SUM_ALL, FIND_ALL),
}


class InvalidQueryError(ValueError):
    """Raised pre-execution for invalid (set, filter, type, sum, find)
    combos — the QueryChecker.isValidQuery analog."""


def validate_query(
    inode_set: str,
    filters: list[tuple[str, str, str]] = (),
    histogram_type: str | None = None,
    sums: list[str] = (),
    find_fields: list[str] = (),
) -> None:
    if inode_set not in _BY_SET:
        raise InvalidQueryError(f"unknown INode set: {inode_set!r}")
    filter_ok, type_ok, sum_ok, find_ok = _BY_SET[inode_set]
    for field, _op, _val in filters:
        if field not in filter_ok:
            raise InvalidQueryError(f"filter {field!r} invalid for set {inode_set!r}")
    if histogram_type is not None and histogram_type not in type_ok:
        raise InvalidQueryError(f"type {histogram_type!r} invalid for set {inode_set!r}")
    for s in sums:
        if s not in sum_ok:
            raise InvalidQueryError(f"sum {s!r} invalid for set {inode_set!r}")
    for f in find_fields:
        if f not in find_ok:
            raise InvalidQueryError(f"find field {f!r} invalid for set {inode_set!r}")
