"""Generate an sf1-scale dataset (10x sf0.1) for the scale probe
(VERDICT r6 #6) — the driver ships sf{0.001,0.01,0.1} only, and
/root/testdata is read-only, so the probe data lands under /tmp.

    python tools/make_sf1.py [out_dir]     # default /tmp/sfdata/sf1

Scaling contract: LINEAR — each table becomes 10 shifted copies with
per-table care so DENSITY characteristics (dup rate, key fan-out,
session shapes) are preserved rather than artificially squared:

- documents: copy 0 verbatim; copies 1-9 suffix every token with _cN.
  Naive text copies would give every doc 9 exact twins, multiplying
  near-dup PAIR counts by ~100 (quadratic in copy count) — that would
  probe an artifact of the generator, not the plan. Disjoint per-copy
  vocabularies keep each copy an independent shard: pair counts,
  shingle-df hot spots, and LSH bucket depths all scale ~10x.
- embeddings: per-copy id offset; each component nudged by a tiny
  copy-dependent epsilon so copies are near but not identical (exact
  duplicate vectors would blow up SemDedup/ANN candidate sets the
  same quadratic way).
- events: id/user offsets per copy (10x users, same per-user session
  shape); timestamps unchanged.
- TPC-H tables: key offsets kept CONSISTENT across tables (orders and
  lineitem shift o_orderkey together; customer and orders shift
  custkey together) so joins stay referentially intact. nation/region
  are dimensions and stay as-is.

SKEW MODE (``--skew``, VERDICT r7 #3): the plain generator keeps
per-key DEPTH flat (disjoint vocabularies), so hot-shingle /
hot-bucket / hot-vertex behavior goes unmeasured. --skew grows
per-key depth deliberately:

- documents: ~SHARE_PCT% of token occurrences (hash-chosen, so the
  same tokens everywhere) keep their GLOBAL identity across all 10
  copies — shingles/grams made entirely of shared tokens get ~10x
  df (hot keys), the rest stay copy-local. Zipf-flavored: one
  shared-or-not draw per distinct token, applied at every occurrence.
- embeddings: every 10th base vector's copies get epsilon 0 — 10-deep
  exact-duplicate vector clusters (hot ANN/SemDedup buckets).
- events: every 10th base user keeps its user_id across copies — hot
  vertices with 10x event depth (event_ids stay globally unique).

Output default /tmp/sfdata/sf1skew; probe with scale_probe --skew.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nnanalytics_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
COPIES = 10
#: skew mode: % of token occurrences that keep global identity
SHARE_PCT = 30


def _copies(spark):
    return spark.range(COPIES).select(F.col("id").alias("_copy"))


def scale(spark, out_dir: str, skew: bool = False) -> None:
    os.makedirs(out_dir, exist_ok=True)
    cp = _copies(spark)

    def read(name):
        return spark.read.parquet(f"{SRC}/{name}.parquet")

    def write(df, name):
        # single parquet FILE per table, matching the driver testdata
        # layout — streaming queries glob `events.parquet` as a file
        import shutil

        import pyarrow.parquet as pq

        stage = f"{out_dir}/_stage_{name}"
        df.coalesce(8).write.mode("overwrite").parquet(stage)
        pq.write_table(pq.read_table(stage), f"{out_dir}/{name}.parquet")
        shutil.rmtree(stage)
        print(f"  {name}: {spark.read.parquet(f'{out_dir}/{name}.parquet').count()} rows", flush=True)

    docs = read("documents")
    max_doc = docs.agg(F.max("doc_id")).head()[0] + 1
    if skew:
        # hash-chosen global tokens stay shared across copies (hot keys)
        def _suffix(t):
            return F.when(
                F.pmod(F.xxhash64(t), F.lit(100)) < F.lit(SHARE_PCT), t
            ).otherwise(F.concat(t, F.lit("_c"), F.col("_copy").cast("string")))
    else:
        def _suffix(t):
            return F.concat(t, F.lit("_c"), F.col("_copy").cast("string"))

    suffixed_tokens = F.when(F.col("_copy") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(F.split(F.col("text"), r"\s+"), _suffix),
            " ",
        )
    )
    write(
        docs.crossJoin(cp).select(
            (F.col("doc_id") + F.col("_copy") * max_doc).alias("doc_id"),
            suffixed_tokens.alias("text"),
            "lang",
            "source",
            F.length(suffixed_tokens).alias("n_chars"),
        ),
        "documents",
    )

    emb = read("embeddings")
    max_vec = emb.agg(F.max("vec_id")).head()[0] + 1
    eps = F.col("_copy").cast("float") * 1e-3
    if skew:
        # every 10th base vector: identical copies (hot ANN buckets)
        eps = F.when(F.pmod(F.col("vec_id"), 10) == 0, F.lit(0.0)).otherwise(eps)
    write(
        emb.crossJoin(cp).select(
            (F.col("vec_id") + F.col("_copy") * max_vec).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x + eps * ((i % 7).cast("float") - 3.0)
                ).cast("float"),
            ).alias("embedding"),
            "label",
        ),
        "embeddings",
    )

    ev = read("events")
    max_ev = ev.agg(F.max("event_id")).head()[0] + 1
    max_user = ev.agg(F.max("user_id")).head()[0] + 1
    shifted_user = F.col("user_id") + F.col("_copy") * max_user
    if skew:
        # every 10th base user keeps identity across copies (hot vertex)
        shifted_user = F.when(
            F.pmod(F.col("user_id"), 10) == 0, F.col("user_id")
        ).otherwise(shifted_user)
    write(
        ev.crossJoin(cp).select(
            (F.col("event_id") + F.col("_copy") * max_ev).alias("event_id"),
            "ts",
            shifted_user.alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
        "events",
    )

    orders = read("orders")
    li = read("lineitem")
    cust = read("customer")
    supp = read("supplier")
    part = read("part")
    max_ok = orders.agg(F.max("o_orderkey")).head()[0] + 1
    max_ck = cust.agg(F.max("c_custkey")).head()[0] + 1
    max_sk = supp.agg(F.max("s_suppkey")).head()[0] + 1
    max_pk = part.agg(F.max("p_partkey")).head()[0] + 1
    write(
        orders.crossJoin(cp).select(
            (F.col("o_orderkey") + F.col("_copy") * max_ok).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("_copy") * max_ck).alias("o_custkey"),
            *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
        ),
        "orders",
    )
    write(
        li.crossJoin(cp).select(
            (F.col("l_orderkey") + F.col("_copy") * max_ok).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("_copy") * max_pk).alias("l_partkey"),
            (F.col("l_suppkey") + F.col("_copy") * max_sk).alias("l_suppkey"),
            *[c for c in li.columns if c not in ("l_orderkey", "l_partkey", "l_suppkey")],
        ),
        "lineitem",
    )
    write(
        cust.crossJoin(cp).select(
            (F.col("c_custkey") + F.col("_copy") * max_ck).alias("c_custkey"),
            *[c for c in cust.columns if c != "c_custkey"],
        ),
        "customer",
    )
    write(
        supp.crossJoin(cp).select(
            (F.col("s_suppkey") + F.col("_copy") * max_sk).alias("s_suppkey"),
            *[c for c in supp.columns if c != "s_suppkey"],
        ),
        "supplier",
    )
    write(
        part.crossJoin(cp).select(
            (F.col("p_partkey") + F.col("_copy") * max_pk).alias("p_partkey"),
            *[c for c in part.columns if c != "p_partkey"],
        ),
        "part",
    )
    for dim in ("nation", "region"):
        write(read(dim), dim)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    out = args[0] if args else ("/tmp/sfdata/sf1skew" if skew else "/tmp/sfdata/sf1")
    spark = get_spark("make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    scale(spark, out, skew=skew)
    print(f"sf1{' skew' if skew else ''} dataset at {out}", flush=True)


if __name__ == "__main__":
    main()
