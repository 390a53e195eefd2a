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


def list_parquet_files(spark: SparkSession, path: str) -> list[str]:
    """List ``*.parquet`` directly under ``path`` via the Hadoop
    FileSystem API — resolves whatever filesystem the path's scheme
    names (hdfs://, s3a://, file:/), exactly as a Spark scan would.
    ``os.listdir`` only ever sees the driver's local disk, which
    silently breaks every layout helper on distributed storage.

    Local paths come back as plain paths (not ``file:`` URIs) so
    executor-side pyarrow opens them unchanged; remote schemes come
    back as full URIs, which pyarrow routes through
    ``pyarrow.fs.FileSystem.from_uri`` (s3 native; hdfs needs libhdfs
    on the workers — the documented deployment requirement for the
    footer-reading helpers on HDFS)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    for status in fs.listStatus(hpath):
        p = status.getPath()
        if not p.getName().endswith(".parquet"):
            continue
        uri = p.toUri()
        scheme = uri.getScheme()
        out.append(uri.getPath() if scheme in (None, "file") else p.toString())
    return sorted(out)


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


def read_inode_table(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """``schema``: optional explicit read schema — the production
    discipline for any partitioned sink: a sink written from an EMPTY
    frame holds no data files, so schema inference fails exactly where
    a contract read (the schema the writer was given) succeeds."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(path)


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


def range_shard_write(
    df: DataFrame, path: str, key: str, num_shards: int
) -> None:
    """Write ``df`` as globally range-sharded, shard-sorted parquet — the
    training-shard layout: shard i holds a contiguous, non-overlapping
    key range and is sorted inside, so a downstream trainer (or a merge
    reader) streams the whole corpus in key order without ever shuffling
    again. ``repartitionByRange`` samples split points (one pass), then
    each task writes exactly one sorted file."""
    (
        df.repartitionByRange(num_shards, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def verify_shard_layout(spark: SparkSession, path: str, key: str) -> DataFrame:
    """Distributed verification of a ``range_shard_write`` output: one
    Arrow task PER FILE opens its shard with pyarrow and reports
    (rows, min, max, sorted?); a tiny follow-up aggregate checks the
    shard ranges are pairwise non-overlapping. This is how you audit a
    100 TB shard layout without a global sort: the heavy check (intra-file
    sortedness) is embarrassingly parallel, and the cross-shard check
    runs over |shards| rows on one reducer.

    Returns ONE row: (n_shards, total_rows, distinct_keys, all_sorted,
    overlap_pairs) — the last two must be (true, 0) for a valid layout.
    """
    from pyspark.sql import functions as F

    files = list_parquet_files(spark, path)
    files_df = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        max(1, len(files))
    )

    def _check(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for f in pdf["file"]:
                col = pq.read_table(f, columns=[key]).column(key).to_pandas()
                empty = len(col) == 0
                out.append(
                    {
                        "file": f,
                        "rows": len(col),
                        "min_key": None if empty else int(col.min()),
                        "max_key": None if empty else int(col.max()),
                        "n_distinct": int(col.nunique()),
                        "sorted": bool(empty or col.is_monotonic_increasing),
                    }
                )
            yield pd.DataFrame(out)

    shards = files_df.mapInPandas(
        _check,
        "file string, rows long, min_key long, max_key long, n_distinct long, sorted boolean",
    ).persist()  # consumed 3× (both self-join sides + the final agg);
    # without this the per-file sortedness read — the expensive part —
    # re-executes for every consumer
    a, b = shards.alias("a"), shards.alias("b")
    overlaps = a.join(
        b,
        (F.col("a.file") < F.col("b.file"))
        & (F.col("a.max_key") >= F.col("b.min_key"))
        & (F.col("b.max_key") >= F.col("a.min_key")),
    ).agg(F.count(F.lit(1)).alias("overlap_pairs"))
    return (
        shards.agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum("rows").alias("total_rows"),
            F.sum("n_distinct").alias("distinct_keys"),  # exact: ranges are disjoint
            F.min("sorted").alias("all_sorted"),
        )
        .crossJoin(overlaps)
    )


def compact_small_files(
    spark: SparkSession, in_path: str, out_path: str, target_files: int
) -> tuple[int, int]:
    """Small-file compaction — the operational fix for the classic
    many-tiny-files problem (a 100 TB table written by 10k streaming
    micro-batches reads 100× slower than the same bytes in right-sized
    files). ``coalesce`` (NOT repartition) merges read splits without a
    shuffle: each output task concatenates whole input files. Returns
    (files_before, files_after)."""
    def _count(p: str) -> int:
        return len(list_parquet_files(spark, p))

    df = spark.read.parquet(in_path)
    # coalesce can only REDUCE partition count, and the scan may already
    # pack many tiny files into fewer splits than target_files (split
    # packing depends on maxPartitionBytes/openCostInBytes and core
    # count, not on this function's contract). Keep the shuffle-free
    # coalesce on the common path; fall back to a round-robin
    # repartition only when the scan under-splits, so the output file
    # count is exactly target_files either way.
    if df.rdd.getNumPartitions() >= target_files:
        df = df.coalesce(target_files)
    else:
        df = df.repartition(target_files)
    df.write.mode("overwrite").parquet(out_path)
    return _count(in_path), _count(out_path)


def zone_map(spark: SparkSession, path: str, key: str) -> DataFrame:
    """File-level zone map (min/max/rows per data file) built from
    parquet FOOTERS only — one metadata read per file, no data pages
    touched. This is the skip-index every lakehouse keeps (Delta/Iceberg
    file stats, ClickHouse minmax marks): at 100 TB the map is |files|
    rows, and a point/range predicate consults it to open only the files
    whose [min,max] intersects the predicate (see ``prune_files``).

    Distributed the same way as ``verify_shard_layout``: file names fan
    out over tasks, each reads ~8 KB of footer. The map itself should be
    cached or persisted next to the table — it is the poor-man's manifest.
    """
    files = list_parquet_files(spark, path)
    files_df = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        max(1, len(files))
    )

    def _footer(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                idx = md.schema.names.index(key)
                lo = hi = None
                rows = 0
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    rows += g.num_rows
                    st = g.column(idx).statistics
                    if st is None or not st.has_min_max:
                        continue
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                out.append(
                    {
                        "file": f,
                        "n_rows": rows,
                        "min_key": None if lo is None else int(lo),
                        "max_key": None if hi is None else int(hi),
                    }
                )
            yield pd.DataFrame(out)

    return files_df.mapInPandas(
        _footer, "file string, n_rows long, min_key long, max_key long"
    )


def prune_files(
    spark: SparkSession, zmap: DataFrame, lo: int, hi: int
) -> list[str]:
    """Files whose [min,max] intersects [lo, hi] — the scan list a
    zone-map-aware reader passes to ``spark.read.parquet(*files)``.
    The zone map is |files| rows; this is a driver-side filter over
    metadata, exactly like a manifest prune, NOT a data scan.

    A file with NULL stats (writer emitted no min/max) is conservatively
    KEPT — a skip index may only skip what it can prove disjoint, or the
    pruned scan silently loses rows."""
    from pyspark.sql import functions as F

    rows = zmap.filter(
        F.coalesce(F.col("max_key") >= lo, F.lit(True))
        & F.coalesce(F.col("min_key") <= hi, F.lit(True))
    ).collect()
    return sorted(r["file"] for r in rows)


def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: union the footer schemas of every file
    under ``path`` (``mergeSchema``) so files written before a column
    existed surface it as NULL — the append-only evolution contract a
    long-lived 100 TB table depends on (new pipeline versions add
    columns; historical files stay valid and unread columns stay
    prunable). ``recursiveFileLookup`` walks version subdirectories
    that are not hive-style partition keys."""
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    *part_cols: str,
    salt_tasks: int = 1,
    max_records_per_file: int | None = None,
) -> None:
    """Hive-style directory-partitioned parquet write (.../col=value/).

    Directory partitioning is the coarsest and cheapest pruning lever at
    100 TB: a filter on a partition column never opens a single
    non-matching file — the planner drops whole directories from the
    scan (PartitionFilters in the plan, asserted in test_sources.py).
    Complements bucketing (join co-location) and zone maps (file-level
    min/max skipping): partition on low-cardinality ingest-stable keys
    (date, source, event_type); high-cardinality keys belong in bucket
    or sort order instead, or the file count explodes.

    Clusters by the partition columns before the write (the ivf_build
    discipline): without the exchange a w-partition source writes up to
    w files into every directory it touches (the small-files trap the
    docstring warns about), and a 1-partition source serializes the
    whole write into one task (profiled: backfill_plan's fixture write
    was a 1.5 s single-task stage at sf0.1). One exchange on the
    partition key parallelizes the write AND keeps one file per
    directory; row content per directory is unchanged.

    Hot-partition guards (VERDICT r9 #8, guide §2.5/§6): clustering by
    the partition value alone makes ONE task the serial writer of a hot
    value (one date, one source) and emits one giant file there.
    ``salt_tasks`` > 1 appends a deterministic row-content salt
    (pmod(xxhash64(all columns), salt_tasks) — never rand(), which
    duplicates rows under task retry, SPARK-38388) to the clustering
    key, spreading each partition value over up to that many writer
    tasks/files. ``max_records_per_file`` additionally bounds rows per
    output file (maps to Spark's maxRecordsPerFile). Defaults preserve
    the one-file-per-directory layout for the un-skewed case."""
    from pyspark.sql import functions as F

    writer_df = df
    if part_cols:
        if salt_tasks > 1:
            salt = F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(int(salt_tasks))
            )
            # user-NUMBERED repartition: AQE coalescing would otherwise
            # merge the salted shuffle right back onto one writer task
            spark = df.sparkSession
            try:
                width = int(spark.conf.get("spark.sql.shuffle.partitions"))
            except (ValueError, TypeError):
                width = spark.sparkContext.defaultParallelism
            writer_df = df.repartition(
                width, *([F.col(c) for c in part_cols] + [salt])
            )
        else:
            writer_df = df.repartition(*part_cols)
    writer = writer_df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.partitionBy(*part_cols).parquet(path)


def read_partition_pruned(
    spark: SparkSession, path: str, schema=None, **equals: object
) -> DataFrame:
    """Read a partitioned layout with equality predicates on partition
    columns applied as a real pruned scan. Returns the filtered frame;
    `DataFrame.inputFiles()` on it lists only surviving partition
    directories' files, which is how callers (and the driver row)
    verify pruning happened rather than trusting the filter.
    ``schema``: optional explicit read schema (see read_inode_table —
    an empty-write sink has no files to infer from)."""
    from pyspark.sql import functions as F

    reader = spark.read.schema(schema) if schema is not None else spark.read
    df = reader.parquet(path)
    for col, val in equals.items():
        df = df.filter(F.col(col) == F.lit(val))
    return df


def snapshot_diff(old, new, key: str = "path", compare: tuple = ("fileSize", "modTime", "user")):
    """Namespace snapshot diff — the ops view between two checkpoints
    ("what changed since yesterday's image"): FULL OUTER join on the
    namespace key classifying every path as added / deleted / modified /
    unchanged, carrying the old/new values of the compared columns.

    The reference rebuilds state from each new image; a diff is the
    natural companion a warehouse-side engine can offer. Plan: ONE
    keyed full-outer join (both sides hash-partition on the key; at
    100 TB the key is the path — pre-bucket both snapshots on it to
    make the diff exchange-free), column comparison stays in codegen.
    NULL-safe equality (eqNullSafe) so a NULL→value transition counts
    as modified, not unchanged."""
    from pyspark.sql import functions as F

    o = old.select(
        F.col(key).alias("k"),
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare],
    )
    n = new.select(
        F.col(key).alias("k"),
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare],
    )
    j = o.join(n, "k", "full_outer")
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    # explicit presence sentinels: a present row whose compared columns
    # are ALL NULL (e.g. a directory's fileSize/user) must not read as
    # absent — the outer join leaves the sentinel NULL only on the side
    # that truly had no row
    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    return j.select(
        F.col("k").alias(key),
        change.alias("change"),
        *[F.col(f"old_{c}") for c in compare],
        *[F.col(f"new_{c}") for c in compare],
    )


def zorder_key(x_col, y_col, bits: int = 8):
    """Morton (Z-order) interleave of two ``bits``-bit bucket ids into
    one sort key: bit i of x lands at position 2i, bit i of y at 2i+1.
    Pure bit arithmetic (shiftright / AND / OR via sum of disjoint
    powers) — codegen expressions, engine-portable, no UDF."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftright(x_col.cast("long"), i).bitwiseAND(1) * (1 << (2 * i)))
            + (F.shiftright(y_col.cast("long"), i).bitwiseAND(1) * (1 << (2 * i + 1)))
        )
    return z


def zorder_layout_stats(
    df: DataFrame,
    x: str,
    y: str,
    x_max,
    y_max,
    bits: int = 8,
    shards: int = 16,
) -> DataFrame:
    """Z-order clustering audit: bucket two columns onto a 2^bits grid
    (linear min-max scaling against CALLER-SUPPLIED domain bounds, so the
    grid is stable as data arrives — a data-derived max would reshuffle
    history), interleave into a Morton key, cut the key range into
    equal-width shards, and report each shard's row count and min/max
    extent on BOTH source columns.

    This is the planning half of multi-dimensional clustering (the
    Delta/Iceberg OPTIMIZE ZORDER idea): with a linear sort on x, a
    filter on y scans every file; with the Morton sort, each shard
    covers a bounded rectangle so zone-map pruning (layout.zone_map /
    prune_files) works on BOTH columns. The emitted extents are exactly
    what the pruning decision needs, and the shard id is what a
    repartitionByRange(z) writer would use. One aggregate on the shard
    id; the z key is row-local arithmetic."""
    from pyspark.sql import functions as F

    grid = 1 << bits
    # clamp into [0, grid): out-of-domain values (below 0 / above the
    # declared max) land in the edge cells instead of producing negative
    # bucket ids, which would corrupt the bit interleave
    xb = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(grid - 1).cast("long"),
            F.floor(F.col(x).cast("double") * grid / F.lit(float(x_max))).cast("long"),
        ),
    )
    yb = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(grid - 1).cast("long"),
            F.floor(F.col(y).cast("double") * grid / F.lit(float(y_max))).cast("long"),
        ),
    )
    z = zorder_key(xb, yb, bits)
    zspace = 1 << (2 * bits)
    shard = F.least(
        F.lit(shards - 1), F.floor(z * F.lit(shards) / F.lit(zspace)).cast("long")
    )
    return (
        df.select(
            shard.alias("shard"),
            xb.alias("xb"),
            yb.alias("yb"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("xb").alias("x_min"),
            F.max("xb").alias("x_max"),
            F.min("yb").alias("y_min"),
            F.max("yb").alias("y_max"),
        )
    )


def missing_partitions(
    spark: SparkSession,
    expected: DataFrame,
    sink_path: str,
    part_col: str,
) -> DataFrame:
    """Backfill planner: which partition values the sink has NOT yet
    materialized. ``expected`` is one row per wanted partition value
    (usually a distinct-select or a generated calendar); the sink's
    existing values come from its Hive-style directory names via the
    Hadoop FileSystem API — a metadata listing, no data files opened —
    and the plan is one broadcast anti-join (the existing set is
    |partitions|-sized, never data-sized). The everyday ops question
    ("what does tonight's backfill need to process?") answered without
    scanning either side.

    Directory names are UNESCAPED before comparing (ADVICE r6): Hive
    layout percent-encodes special characters in partition values
    (':' → '%3A', '=' → '%3D', Spark's ExternalCatalogUtils
    escapePathName set) and writes NULL as __HIVE_DEFAULT_PARTITION__,
    so comparing raw suffixes would report every such partition as
    perpetually missing and re-backfill it each night."""
    from pyspark.sql import functions as F

    hconf = spark._jsc.hadoopConfiguration()
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(sink_path)
    fs = hpath.getFileSystem(hconf)
    existing = []
    prefix = f"{part_col}="
    if fs.exists(hpath):
        for status in fs.listStatus(hpath):
            name = status.getPath().getName()
            if status.isDirectory() and name.startswith(prefix):
                existing.append(_unescape_partition_value(name[len(prefix):]))
    if not existing:
        return expected
    have = spark.createDataFrame(
        [(v,) for v in existing], f"{part_col} string"
    ).select(
        F.col(part_col).cast(expected.schema[part_col].dataType).alias("_have")
    )
    # null-safe equality: the sink's __HIVE_DEFAULT_PARTITION__ row must
    # cancel an expected NULL partition, which plain `=` never matches
    return expected.join(
        F.broadcast(have), expected[part_col].eqNullSafe(F.col("_have")), "left_anti"
    )


def _unescape_partition_value(name: str) -> str | None:
    """Invert Hive/Spark partition-path escaping: %XX percent-decoding
    (ExternalCatalogUtils.unescapePathName — only well-formed two-hex-
    digit escapes decode; a bare '%' passes through, matching Spark) and
    the __HIVE_DEFAULT_PARTITION__ sentinel for NULL."""
    if name == "__HIVE_DEFAULT_PARTITION__":
        return None
    out = []
    i = 0
    n = len(name)
    while i < n:
        c = name[i]
        if c == "%" and i + 3 <= n:
            hx = name[i + 1 : i + 3]
            if all(ch in "0123456789abcdefABCDEF" for ch in hx):
                out.append(chr(int(hx, 16)))
                i += 3
                continue
        out.append(c)
        i += 1
    return "".join(out)
