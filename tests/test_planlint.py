"""Plan-linter tests: each anti-pattern check fires on a plan constructed
to exhibit it and stays silent on the idiomatic alternative."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nnanalytics_spark.core.planlint import assert_clean, lint


def _rules(findings, severity=None):
    return {
        f.rule
        for f in findings
        if severity is None or f.severity == severity
    }


def test_unpartitioned_window_flagged_partitioned_not(spark):
    df = spark.range(100).select("id", (F.col("id") % 7).alias("k"))
    bad = df.withColumn("rn", F.row_number().over(W.orderBy("id")))
    good = df.withColumn("rn", F.row_number().over(W.partitionBy("k").orderBy("id")))
    assert "unpartitioned_window" in _rules(lint(bad), "warn")
    assert "unpartitioned_window" not in _rules(lint(good))


def test_python_udf_flagged_builtin_not(spark):
    from pyspark.sql.functions import udf

    df = spark.range(100)
    bad = df.select(udf(lambda x: x + 1, "long")("id").alias("y"))
    good = df.select((F.col("id") + 1).alias("y"))
    assert "python_udf" in _rules(lint(bad), "warn")
    assert "python_udf" not in _rules(lint(good))


def test_cartesian_product_flagged(spark):
    a = spark.range(10)
    b = spark.range(10).select(F.col("id").alias("id2"))
    # defeat the broadcast fallback so the planner picks CartesianProduct
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bad = a.crossJoin(b)
        assert "cartesian_product" in _rules(lint(bad), "error")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    equi = a.join(b, a["id"] == b["id2"])
    assert "cartesian_product" not in _rules(lint(equi))


def test_unpushed_filter_flags_blocked_pushdown_only(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(1000).select(
        "id", (F.col("id") % 10).alias("k")
    ).write.parquet(p)
    t = spark.read.parquet(p)
    # THE classic silent blocker: a type-changing cast on the column
    # keeps parquet from translating the comparison — scan decodes all
    # rows, PushedFilters stays (vacuously) empty
    bad = t.filter(F.col("k").cast("string") > "5")
    assert "unpushed_filter" in _rules(lint(bad), "warn")
    # pushed comparison: clean
    good = t.filter(F.col("k") > 5)
    assert "unpushed_filter" not in _rules(lint(good))
    # semantically-derived predicate (can't push) must NOT flag
    derived = t.filter(F.pow(F.col("k"), 2) > 50)
    assert "unpushed_filter" not in _rules(lint(derived))
    # column-to-column comparison (parquet can't push) must NOT flag
    colcol = t.filter(F.col("k") > F.col("id"))
    assert "unpushed_filter" not in _rules(lint(colcol))


def test_exchange_count_reported_and_bounded(spark):
    df = spark.range(1000).select((F.col("id") % 7).alias("k"))
    agg = df.groupBy("k").count()
    findings = lint(agg)
    ex = [f for f in findings if f.rule == "exchange_count"]
    assert len(ex) == 1 and ex[0].severity == "info"
    # max_exchanges=0 turns the same plan into a warn
    strict = lint(agg, max_exchanges=0)
    assert [f for f in strict if f.rule == "exchange_count"][0].severity == "warn"


def test_assert_clean_raises_and_honors_waiver(spark):
    df = spark.range(50)
    bad = df.withColumn("rn", F.row_number().over(W.orderBy("id")))
    with pytest.raises(AssertionError, match="unpartitioned_window"):
        assert_clean(bad)
    # the documented waiver path
    assert_clean(bad, allow={"unpartitioned_window"})
    # clean plan passes outright
    assert_clean(df.groupBy((F.col("id") % 3).alias("k")).count())
