"""Bin-edge/label parity tests (exact reference semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nnanalytics_spark.inode import bins

KB = 1024
MB = KB * KB
GB = KB * MB
DAY = 86_400_000


def eval_expr(spark, values, expr_fn):
    df = spark.createDataFrame([(v,) for v in values], "v long")
    return [r[0] for r in df.select(expr_fn(F.col("v"))).collect()]


def test_space_bucket_edges(spark):
    cases = {
        0: "0 B",
        1: "1 KB",
        KB: "1 KB",
        KB + 1: "1 MB",
        MB: "1 MB",
        MB + 1: "16 MB",
        16 * MB: "16 MB",
        128 * MB: "128 MB",
        GB: "1 GB",
        GB + 1: "1 GB+",
        -5: "NO_MAPPING",
    }
    got = eval_expr(spark, list(cases), bins.space_bucket)
    assert got == list(cases.values())


def test_memory_bucket_edges(spark):
    cases = {1: "256 B", 256: "256 B", 257: "512 B", 1024: "1 KB",
             64 * KB: "64 KB", 64 * KB + 1: "64 KB+", 0: "NO_MAPPING"}
    got = eval_expr(spark, list(cases), bins.memory_bucket)
    assert got == list(cases.values())


def test_time_bucket_weekly(spark):
    now = 1_755_000_000_000
    week = 7 * DAY
    cases = {
        now: "1 Weeks",                      # elapsed 0 → first bin
        now - week: "1 Weeks",               # exactly one week → still bin 1
        now - week - 1: "2 Weeks",
        now - 49 * week: "49 Weeks",
        now - 49 * week - 1: "49 Weeks+",
        now + 5: "NO_MAPPING",               # future timestamp
    }
    got = eval_expr(spark, list(cases), lambda c: bins.time_bucket(c, "weekly", now))
    assert got == list(cases.values())


def test_time_keys_canonical(spark):
    assert bins.time_keys("yearly") == ["1 Years", "2 Years", "3 Years", "4 Years", "4 Years+"]
    assert len(bins.time_keys("daily")) == 365
    assert bins.time_keys("monthly")[-1] == "23 Months+"
    assert len(bins.time_keys("weekly")) == 50


def test_storage_type_bucket(spark):
    df = spark.createDataFrame([(15,), (7,), (0,), (99,)], "v int")
    got = [r[0] for r in df.select(bins.storage_type_bucket(F.col("v"))).collect()]
    assert got == ["LAZY_PERSIST", "HOT", "NO_MAPPING", "NO_MAPPING"]


def test_file_type_three_stage_match(spark):
    cases = {
        "_SUCCESS": "_SUCCESS",          # equals stage
        ".pig_header": "PIG_HEADER",     # equals beats '.'-suffix probe
        "part-00001": "PART",            # 6-char prefix stage
        "part-0": "UNKNOWN",             # len>6 guard: exact 6 chars misses
        "part-r-00001.gz": "PART_R",     # prefix beats suffix
        "entitylog-foo": "ENTITY_LOG",   # 10-char prefix stage
        "data.parquet": "PARQUET",
        "a.b.txt": "TXT",                # last '.' wins
        "container_01_45454": "APP_LOG",  # '_'-suffix fallback
        "x.y_45454": "APP_LOG",          # '.'-probe misses → '_'-probe hits
        "noext": "UNKNOWN",
    }
    df = spark.createDataFrame([(n,) for n in cases], "n string")
    got = dict(zip(cases, (r[0] for r in df.select(bins.file_type(F.col("n"))).collect())))
    assert got == cases
