"""Similarity search over embedding columns (array<float/double>).

Two tiers, as a 100 TB design:
- brute-force cosine top-k — the exact baseline. Dot products are
  expression-level (zip_with + aggregate), fully codegen'd; the top-k is a
  TakeOrdered (no global sort). Right answer for one-off queries and the
  verification oracle.
- LSH-bucketed ANN (random hyperplane signatures) — the scale path: each
  vector maps to a b-bit signature; queries probe only matching buckets.
  Bucketing is an equi-join on the signature, so the candidate set per
  query is |bucket| not |corpus|. An IVF variant would swap the signature
  for a k-means cell id; the plumbing is identical.

All cosine math uses double precision and deterministic hyperplanes
(seeded per-dimension constants), so runs are reproducible.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector. One scan, TakeOrdered."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def all_pairs_above(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, for bounded corpora;
    at 100 TB use lsh_bucketed_pairs). Skew-safe: the cross space is cut
    by the id ordering predicate before the cosine evaluates."""
    # pre-compute each row's norm ONCE (the pair space would otherwise
    # re-evaluate it O(n) times per row) — forced past projection collapse
    # by the exchange boundary of the join below
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        norm(F.col(vec_col).cast("array<double>")).alias("nrm"),
    )
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        pairs.withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG-fed Box-Muller-ish;
    constants only, no numpy at executor side)."""
    state = seed & 0x7FFFFFFF
    planes: list[list[float]] = []
    for _ in range(bits):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            u = state / float(1 << 31)
            row.append(math.cos(2 * math.pi * u))  # bounded, sign-balanced
        planes.append(row)
    return planes


def signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """b-bit random-hyperplane signature packed into a long."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        sig = sig + F.when(dot(vec_col, p) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def lsh_bucketed_pairs(
    df: DataFrame,
    threshold: float,
    bits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """ANN near-dup pairs: bucket by hyperplane signature, compare within
    buckets only. Recall grows with multiple probe tables in production;
    one table keeps the demo simple. Shuffle key = signature."""
    planes = _hyperplanes(dim, bits)
    sigs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        norm(F.col(vec_col).cast("array<double>")).alias("nrm"),
        signature(F.col(vec_col).cast("array<double>"), planes).alias("sig"),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    sim = F.round(
        dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), 6
    )
    return (
        a.join(b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cos_sim")
    )
