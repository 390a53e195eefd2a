"""Iterative graph analytics over edge-list DataFrames.

The reference engine has no graph operators; these exist for the
training-data-pipeline side of the house (crawl-graph quality weighting,
link-based dedup priors) and as the repo's canonical ITERATIVE pattern:
a driver loop that grows a DataFrame plan one shuffle per round, cutting
lineage with lazy localCheckpoints exactly like
pipeline/dedup.py:dup_clusters.

Integer-exact PageRank
----------------------
All rank mass is carried as int64 "rank units" (r0 units per node at
round 0) and every division is integral, so a SQL oracle replays the
iteration bit-for-bit — no float summation order, no cross-engine libm.
The price is floor-rounding mass loss per round (bounded by
|edges| + |nodes| units per round, i.e. ~1e-9 of the mass at the default
scale), which is irrelevant for ranking and a fair trade for exactness.

Every quantity is non-negative, so Spark's truncating ``DIV`` and
DuckDB's flooring ``//`` agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    r0: int = 1_000_000_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank over an (src, dst) edge list, integer-exact.

    Per round, per node v:

        rank'(v) = base + (damping_pct * sum_{u->v} (rank(u) DIV deg(u))) DIV 100
        base     = ((100 - damping_pct) * r0) DIV 100

    Physical shape: `deg` is one keyed count; each round is ONE shuffle —
    the contribution join keys on src (an 8-byte id) and the inflow
    aggregate on dst combines map-side, so per-round traffic is one row
    per (distinct dst, partition). `localCheckpoint(eager=False)` caps
    plan growth at one round (same rationale, and same measured 2x
    job-count saving, as dup_clusters' lazy checkpoints); on a real
    cluster swap in `checkpoint()` against durable storage.

    Overflow headroom: total mass stays ~|nodes|*r0 and per-node inflow
    is multiplied by damping_pct before the DIV, so int64 holds while
    |nodes| * r0 * damping_pct < 2^63 — at the default r0 that is ~10^5
    nodes; shrink r0 as the graph grows (r0=10^6 covers 10^11 nodes with
    micro-unit rank resolution).

    Nodes with no out-edges (dangling) contribute nothing; nodes with no
    in-edges settle at `base`. Returns (node, rank_units) for every node
    incident to an edge.
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (1, 99)")
    base = ((100 - damping_pct) * r0) // 100
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn("rank_units", F.lit(r0).cast("long"))
    for _ in range(iterations):
        inflow = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_units DIV deg").alias("share"),
            )
            .groupBy("node")
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(inflow, 0L)) DIV 100")
                ).alias("rank_units"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def degree_stats(edges: DataFrame) -> DataFrame:
    """In/out degree per node in one pass: explode each edge into two
    (node, is_out) rows, one keyed aggregate. The diagnostic companion —
    heavy hitters here predict PageRank shuffle skew (a hot dst key is a
    hot reducer), the same way core/profile.py:key_skew predicts join
    skew."""
    ends = edges.select(
        F.col("src").alias("node"), F.lit(1).alias("outc"), F.lit(0).alias("inc")
    ).unionByName(
        edges.select(F.col("dst").alias("node"), F.lit(0).alias("outc"), F.lit(1).alias("inc"))
    )
    return ends.groupBy("node").agg(
        F.sum("outc").cast("long").alias("out_degree"),
        F.sum("inc").cast("long").alias("in_degree"),
    )


def triangle_counts(edges: DataFrame, normalize: bool = True) -> DataFrame:
    """Per-node triangle participation counts — the local-density
    diagnostic for a near-dup pair graph (a clique-y duplicate cluster
    closes many triangles; a chain of borderline matches closes none,
    which tells a curation team whether transitive dedup is safe).

    Input: undirected edges as (id_a, id_b). The wedge construction
    below is only correct over DISTINCT, ORIENTED (id_a < id_b) edges —
    duplicates or reversed rows silently multiply-count triangles — so
    by default the input is normalized first (least/greatest + distinct,
    self-loops dropped; ADVICE r5). That costs one aggregate on the edge
    table, which the wedge join was about to shuffle on the same keys
    anyway; pass normalize=False only when the producer already
    guarantees the invariant (e.g. simhash/minhash pair outputs, which
    emit id_a < id_b distinct by construction).

    The count uses the oriented wedge construction: every triangle
    a<b<c is found EXACTLY once by joining (a,b)+(b,c) on the middle
    vertex and probing the closing edge (a,c). Two equi-joins on edge
    keys — at 100 TB-scale graphs the join keys are vertex ids, so
    both joins hash-partition on vertices and the wedge table is
    bounded by Σ deg(v)² (the standard bound; bound the hot-vertex
    degree upstream the same way ngram_jaccard bounds hot shingles).
    Per-node counts then explode each triangle's three corners and
    aggregate."""
    e = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    if normalize:
        e = (
            e.select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .filter(F.col("a") < F.col("b"))
            .distinct()
        )
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a")).select(
        F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c")
    )
    closing = e.select(F.col("a").alias("ca"), F.col("b").alias("cb"))
    tri = wedges.join(
        closing, (F.col("a") == F.col("ca")) & (F.col("c") == F.col("cb"))
    ).select("a", "b", "c")
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
