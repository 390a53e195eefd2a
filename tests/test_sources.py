"""OIV fsimage-export reader + registered-directory stats + filter parsing."""

from __future__ import annotations

from pyspark.sql import functions as F

from nnanalytics_spark.core import ir
from nnanalytics_spark.core.ir import Query
from nnanalytics_spark.inode import fixture, subtree
from nnanalytics_spark.inode.engine import INodeEngine
from nnanalytics_spark.sources import loader

OIV_HEADER = "Path\tReplication\tModificationTime\tAccessTime\tPreferredBlockSize\tBlocksCount\tFileSize\tNSQUOTA\tDSQUOTA\tPermission\tUserName\tGroupName"
OIV_ROWS = [
    "/\t0\t2024-01-01 10:00\t1970-01-01 00:00\t0\t0\t0\t9223372036854775807\t-1\tdrwxr-xr-x\thdfs\tsupergroup",
    "/data\t0\t2024-02-01 10:00\t1970-01-01 00:00\t0\t0\t0\t-1\t-1\tdrwxr-xr-x\thdfs\tsupergroup",
    "/data/part-00000.gz\t3\t2024-03-05 11:22\t2024-04-01 09:00\t134217728\t2\t200000000\t0\t0\t-rw-r--r--\tetl\thadoop",
    "/data/_SUCCESS\t1\t2024-03-05 11:25\t2024-03-05 11:25\t134217728\t0\t0\t0\t0\t-rw-r--r--\tetl\thadoop",
]


def test_read_fsimage_csv(spark, tmp_path):
    src = tmp_path / "fsimage.tsv"
    src.write_text(OIV_HEADER + "\n" + "\n".join(OIV_ROWS) + "\n")
    df = loader.read_fsimage_csv(spark, str(src))
    rows = {r["path"]: r for r in df.collect()}
    assert rows["/data"]["type"] == "dir"
    f = rows["/data/part-00000.gz"]
    assert (f["type"], f["name"], f["parent"]) == ("file", "part-00000.gz", "/data")
    assert (f["fileSize"], f["numBlocks"], f["fileReplica"]) == (200000000, 2, 3)
    assert f["permission"] == 0o644
    assert rows["/data/_SUCCESS"]["fileSize"] == 0

    # the loaded table drives the engine end-to-end
    eng = INodeEngine(df)
    got = eng.histogram(
        Query(set="files", type="fileType", sums=["count"], now_ms=fixture.NOW_MS)
    ).collect()
    assert {r[0]: r[1] for r in got} == {"PART": 1, "_SUCCESS": 1}


def test_registered_directory_stats(inodes, inodes_pdf):
    watch = ["/dir0", "/dir1", "/dir0/dir1", "/"]
    out = {r["directory"]: (r["count"], r["diskspaceConsumed"])
           for r in subtree.registered_directory_stats(inodes, watch).collect()}
    f = inodes_pdf[inodes_pdf.type == "file"].copy()
    f["dsc"] = f.fileSize * f.fileReplica
    for d in watch:
        prefix = (d.rstrip("/") + "/") if d != "/" else "/"
        sub = f[f.path.str.startswith(prefix)]
        assert out[d] == (len(sub), sub.dsc.sum()), d


def test_parse_filters_rest_style():
    got = ir.parse_filters("fileSize,user", "eq:0,notEq:hdfs")
    assert got == [("fileSize", "eq", "0"), ("user", "notEq", "hdfs")]
    assert ir.parse_filters("", "") == []


def test_parse_filter_triplets():
    got = ir.parse_filter_triplets("fileSize:lte:1024,fileSize:gt:0")
    assert got == [("fileSize", "lte", "1024"), ("fileSize", "gt", "0")]
    # values containing ':' survive (path filters)
    assert ir.parse_filter_triplets("path:startsWith:/a:b")[0][2] == "/a:b"


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the same key must join without an Exchange
    on either input — the co-located fact-fact join path at scale."""
    from nnanalytics_spark.sources import layout

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    layout.write_bucketed(
        orders, "b_orders", "o_orderkey", 8, sort_col="o_orderkey", path=str(tmp_path / "o")
    )
    layout.write_bucketed(
        lineitem, "b_lineitem", "l_orderkey", 8, sort_col="l_orderkey", path=str(tmp_path / "li")
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test scale Spark would rather broadcast the tiny table; force
        # the shuffle-join path the bucketing exists to serve at real scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = layout.read_table(spark, "b_orders")
        li = layout.read_table(spark, "b_lineitem")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select("o_orderkey", "l_quantity")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
