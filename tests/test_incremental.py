"""Tests for the manifest-level incremental-run family
(pipeline/incremental.py — VERDICT r8 #8): order-free manifests, the
partition diff, the artifact backfill planner, and the resumable-LSH
exactness invariant against a cold full run at test scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nnanalytics_spark.pipeline import dedup, incremental

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    d.cache().count()
    return d


def test_partition_manifest_is_order_free(spark, docs):
    """The content fingerprint is a commutative sum: any partitioning /
    scan order yields the identical manifest."""
    a = {
        r["partition"]: (r["n_docs"], r["content_fp"])
        for r in incremental.partition_manifest(docs.repartition(7), "source").collect()
    }
    b = {
        r["partition"]: (r["n_docs"], r["content_fp"])
        for r in incremental.partition_manifest(
            docs.orderBy(F.col("doc_id").desc()).repartition(3), "source"
        ).collect()
    }
    assert a == b and len(a) > 1


def test_partition_manifest_portable_mode(spark, docs):
    """portable=True (the future oracle mode): order-free too, and the
    diff classifies identically to native mode on the same delta."""
    pm = lambda d: incremental.partition_manifest(d, "source", portable=True)
    a = {r["partition"]: r["content_fp"] for r in pm(docs.repartition(5)).collect()}
    b = {r["partition"]: r["content_fp"] for r in pm(docs.repartition(2)).collect()}
    assert a == b
    old = docs.filter(F.col("source") != "src0")
    new = docs.withColumn(
        "text",
        F.when(F.col("source") == "src2", F.concat(F.col("text"), F.lit(" EDIT")))
        .otherwise(F.col("text")),
    )
    st = {
        r["partition"]: r["status"]
        for r in incremental.stale_partitions(pm(old), pm(new)).collect()
    }
    assert st["src0"] == "added" and st["src2"] == "changed"
    assert st["src1"] == "unchanged"


def test_stale_partitions_classifies_all_four_states(spark, docs):
    """added / removed / changed / unchanged, with doc-count deltas."""
    old = docs.filter(F.col("source") != "src0")  # src0 missing -> added
    # drop one source entirely (-> removed) and edit another (-> changed)
    new = docs.filter(F.col("source") != "src1").withColumn(
        "text",
        F.when(F.col("source") == "src2", F.concat(F.col("text"), F.lit(" EDIT")))
        .otherwise(F.col("text")),
    )
    om = incremental.partition_manifest(old, "source")
    nm = incremental.partition_manifest(new, "source")
    st = {r["partition"]: r for r in incremental.stale_partitions(om, nm).collect()}
    assert st["src0"]["status"] == "added"
    assert st["src0"]["n_docs_old"] == 0 and st["src0"]["doc_delta"] > 0
    assert st["src1"]["status"] == "removed"
    assert st["src1"]["n_docs_new"] == 0 and st["src1"]["doc_delta"] < 0
    assert st["src2"]["status"] == "changed"
    assert st["src2"]["doc_delta"] == 0  # same docs, edited content
    others = {
        p for p, r in st.items() if p not in ("src0", "src1", "src2")
    }
    assert others and all(st[p]["status"] == "unchanged" for p in others)


def test_signature_backfill_plan_actions(spark, docs):
    """compute for changed/added/missing-artifact, delete for removed
    and orphaned artifacts, keep for up-to-date — each reasoned."""
    old = docs.filter(F.col("source") != "src0")
    new = docs.filter(F.col("source") != "src1").withColumn(
        "text",
        F.when(F.col("source") == "src2", F.concat(F.col("text"), F.lit(" EDIT")))
        .otherwise(F.col("text")),
    )
    st = incremental.stale_partitions(
        incremental.partition_manifest(old, "source"),
        incremental.partition_manifest(new, "source"),
    )
    unchanged = sorted(
        r["partition"] for r in st.filter(F.col("status") == "unchanged").collect()
    )
    assert len(unchanged) >= 2
    # artifacts exist for: all old partitions EXCEPT one unchanged one
    # (-> artifact_missing), plus an orphan never in either corpus
    missing_art = unchanged[0]
    arts = (
        st.filter(F.col("status") != "added")
        .filter(F.col("partition") != missing_art)
        .select("partition")
        .union(spark.createDataFrame([("ghost",)], ["partition"]))
    )
    plan = {
        r["partition"]: (r["action"], r["reason"])
        for r in incremental.signature_backfill_plan(st, arts).collect()
    }
    assert plan["src0"] == ("compute", "partition_added")
    assert plan["src2"] == ("compute", "content_changed")
    assert plan[missing_art] == ("compute", "artifact_missing")
    assert plan["src1"] == ("delete", "partition_removed")
    assert plan["ghost"] == ("delete", "artifact_orphaned")
    for p in unchanged[1:]:
        assert plan[p] == ("keep", "up_to_date")


def test_resumable_lsh_pairs_equal_cold_full_run(spark, docs):
    """THE exactness invariant: (old pairs − removed-touching) ∪
    incremental pairs == a cold minhash_lsh_pairs run on the new
    corpus — while the retained corpus' text is never re-read (the
    incremental side only consumes delta docs + the persisted banded
    index)."""
    old = docs.filter(F.col("doc_id") % 10 != 7)
    delta = docs.filter(F.col("doc_id") % 10 == 7)
    removed = old.filter(F.col("doc_id") % 20 == 6).select(F.col("doc_id").alias("id"))
    new = docs.filter((F.col("doc_id") % 10 == 7) | (F.col("doc_id") % 20 != 6))

    kw = dict(k=32, bands=8)
    old_pairs = dedup.minhash_lsh_pairs(old, **kw)
    index = dedup.banded_signatures(old, **kw)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in incremental.resumable_lsh_pairs(
            old_pairs, delta, index, removed_ids=removed, **kw
        ).collect()
    )
    want = sorted(
        (r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(new, **kw).collect()
    )
    assert got == want
    assert len(want) > 0


def test_incremental_pairs_all_touch_delta(spark, docs):
    """incremental_lsh_pairs emits ONLY delta-touching pairs (old-old
    work never re-forms), ordered id_a < id_b, and prunes removed ids
    out of the persisted index before pairing."""
    old = docs.filter(F.col("doc_id") % 10 != 7)
    delta = docs.filter(F.col("doc_id") % 10 == 7)
    removed = old.filter(F.col("doc_id") % 20 == 6).select(F.col("doc_id").alias("id"))
    kw = dict(k=32, bands=8)
    index = dedup.banded_signatures(old, **kw)
    rows = incremental.incremental_lsh_pairs(
        delta, index, removed_ids=removed, **kw
    ).collect()
    delta_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    removed_ids = {r["id"] for r in removed.collect()}
    assert rows
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["id_a"] in delta_ids or r["id_b"] in delta_ids
        assert r["id_a"] not in removed_ids and r["id_b"] not in removed_ids


def test_resumable_with_changed_docs(spark, docs):
    """A CHANGED doc (same id, new text) rides the documented
    remove + re-add contract: its id in removed_ids AND its new
    version in delta_docs — the result equals a cold run on the edited
    corpus (its stale index rows never pair on the old text's
    buckets)."""
    edit = F.col("doc_id") % 15 == 4
    new = docs.withColumn(
        "text",
        F.when(edit, F.concat(F.col("text"), F.lit(" v2 edit"))).otherwise(
            F.col("text")
        ),
    )
    delta = new.filter(edit)
    removed = docs.filter(edit).select(F.col("doc_id").alias("id"))
    kw = dict(k=32, bands=8)
    old_pairs = dedup.minhash_lsh_pairs(docs, **kw)
    index = dedup.banded_signatures(docs, **kw)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in incremental.resumable_lsh_pairs(
            old_pairs, delta, index, removed_ids=removed, **kw
        ).collect()
    )
    want = sorted(
        (r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(new, **kw).collect()
    )
    assert got == want
    assert len(want) > 0


def test_resumable_removal_only_empty_delta(spark, docs):
    """A pure-removal delta (EMPTY delta_docs): the resumable set is
    exactly the old pairs minus removed-touching ones; the incremental
    join over an empty delta contributes nothing and nothing crashes
    on the empty broadcast side."""
    removed = docs.filter(F.col("doc_id") % 5 == 2).select(
        F.col("doc_id").alias("id")
    )
    new = docs.filter(F.col("doc_id") % 5 != 2)
    delta = docs.filter(F.lit(False))
    kw = dict(k=32, bands=8)
    old_pairs = dedup.minhash_lsh_pairs(docs, **kw)
    index = dedup.banded_signatures(docs, **kw)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in incremental.resumable_lsh_pairs(
            old_pairs, delta, index, removed_ids=removed, **kw
        ).collect()
    )
    want = sorted(
        (r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(new, **kw).collect()
    )
    assert got == want
