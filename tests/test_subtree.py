"""Subtree aggregates / ancestor-walk booleans (the §7.4 hard parts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nnanalytics_spark.inode import subtree


def test_ancestors_expr(spark):
    df = spark.createDataFrame(
        [("/",), ("/a",), ("/a/b",), ("/a/b/c/d",)], "path string"
    )
    got = {r[0]: r[1] for r in df.select(
        "path", subtree.ancestors_expr(F.col("path")).alias("anc")
    ).collect()}
    assert got["/"] == []
    assert got["/a"] == ["/"]
    assert got["/a/b"] == ["/", "/a"]
    assert got["/a/b/c/d"] == ["/", "/a", "/a/b", "/a/b/c"]


def test_subtree_aggregates_exact(spark, inodes, inodes_pdf):
    out = subtree.with_subtree_aggregates(inodes).filter(F.col("type") == "dir")
    got = {
        r["path"]: (r["dirSubTreeSize"], r["dirSubTreeNumFiles"], r["dirSubTreeNumDirs"])
        for r in out.collect()
    }
    pdf = inodes_pdf
    for d in ["/", "/dir0", "/dir0/dir1"]:
        prefix = d.rstrip("/") + "/"
        sub = pdf[pdf.path.str.startswith(prefix) & (pdf.path != d)]
        files = sub[sub.type == "file"]
        dirs = sub[sub.type == "dir"]
        size, nfiles, ndirs = got[d]
        assert size == files.fileSize.sum(), d
        assert nfiles == len(files), d
        assert ndirs == len(dirs), d
    # childless dirs report EXACT zeros (reference tree semantics), not
    # NULL — eq:0 filters must match them
    for vals in got.values():
        assert None not in vals


def test_quota_flags_ancestor_walk(spark, inodes, inodes_pdf):
    out = subtree.with_quota_flags(inodes)
    got = {r["path"]: (r["isUnderNsQuota"], r["isUnderDsQuota"]) for r in out.collect()}
    pdf = inodes_pdf
    quota_dirs = set(
        pdf[(pdf.type == "dir") & (pdf.path != "/") & (pdf.nsQuota >= 0)].path
    )
    for _, row in pdf.sample(n=min(200, len(pdf)), random_state=7).iterrows():
        parts = row.path.split("/")
        ancestors = {"/".join(parts[:i]) for i in range(2, len(parts))}
        expect = bool(ancestors & quota_dirs)
        assert got[row.path][0] == expect, row.path


def test_content_summary_root(spark, inodes, inodes_pdf):
    row = subtree.content_summary(inodes, "/").collect()[0]
    assert row["fileCount"] == int((inodes_pdf.type == "file").sum())
    # root itself is included in dirCount (path == '/')
    assert row["dirCount"] == int((inodes_pdf.type == "dir").sum())
