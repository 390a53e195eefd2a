"""Join pre-filtering — Bloom-filter key pruning for large fact scans.

The 100 TB problem this solves: an inner join between a huge fact table
and a selective dimension shuffles EVERY fact row, even though only the
rows whose key survives the dimension filter contribute to the output.
Spark's AQE can inject a runtime bloom filter for some shapes
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but it is
heuristic-gated; this module makes the technique an explicit, testable
operator.

Design (all sizes bounded by construction, independent of data scale):

1. Hash every dimension key with ``k`` seeded xxhash64 functions into an
   ``m``-bit space, fold the bit positions into 64-bit words, and reduce
   with one ``bit_or`` aggregate — a single short shuffle whose output
   is at most ``m / 64`` rows.
2. Collect those words to the driver (``m = 2**16`` bits → ≤ 1024 longs,
   8 KiB — constant, like a centroid table) and embed them as a literal
   array in a fact-side predicate: a row survives iff ALL ``k`` of its
   key's bit positions are set.  The predicate is pure column
   arithmetic, so it evaluates map-side inside whole-stage codegen —
   BEFORE the join exchange — and the shuffle only carries surviving
   rows.
3. Run the ordinary equi-join on the survivors.  Bloom filters admit
   false positives but never false negatives, so the exact join removes
   the strays and the result EQUALS the un-pruned join — which is what
   makes the operator oracle-checkable end to end.

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; the default
m = 65 536 / k = 3 holds ~5% FP at n = 10⁴ dimension keys.  At larger
n, raise ``num_bits`` — the driver cost grows linearly but stays tiny
(2²⁴ bits = 2 MiB) while the avoided fact shuffle is measured in
terabytes.  The reference has no analog (its joins are single-node
hash maps); this is pure Spark-scale machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k seeded bit positions for one key. xxhash64's seed is fixed
    in the SQL surface, so seeding is done by hashing (key, i) — the
    extra literal column changes the input stream, giving k independent
    functions."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def build_bloom(
    df: DataFrame,
    key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> list[int]:
    """Aggregate the key set into a bloom bitmap, returned as
    ``num_bits / 64`` Python ints (index = word, value = 64 set bits).

    One exchange of at most ``num_bits/64`` rows; the collect is bounded
    by the SAME constant regardless of ``df``'s size, so this is not a
    driver-side loop over data — it is sketch extraction, the bounded
    kind of collect the centroid/quantile paths already use.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key), num_bits, num_hashes)))
    # F.shiftleft's Python signature takes a literal int shift; the SQL
    # function accepts a column — call_function reaches it directly.
    words = (
        df.select(pos.alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bitmap = [0] * (num_bits // 64)
    for r in words:
        bitmap[r["word"]] = r["bits"]
    return bitmap


def bloom_might_contain(
    key: Column, bitmap: list[int], num_hashes: int = 3
) -> Column:
    """Membership predicate over a literal bitmap — pure expression, no
    UDF, so Catalyst keeps it inside the scan stage's codegen."""
    num_bits = len(bitmap) * 64
    lit_words = F.array(*[F.lit(w).cast("long") for w in bitmap])
    cond = F.lit(True)
    for pos in _positions(key, num_bits, num_hashes):
        word = F.element_at(lit_words, (pos / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> DataFrame:
    """Inner equi-join with a bloom pre-filter on the fact side.

    Result rows EQUAL ``fact.join(dim, fact[fact_key] == dim[dim_key])``
    — the bloom only prunes rows the join would drop anyway — but the
    join exchange carries only the (true + false-positive) survivors,
    which at 100 TB is the difference between shuffling the table and
    shuffling the selectivity.
    """
    dim_key = dim_key or fact_key
    bitmap = build_bloom(dim, dim_key, num_bits, num_hashes)
    pruned = fact.filter(bloom_might_contain(F.col(fact_key), bitmap, num_hashes))
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    band_width: int,
) -> DataFrame:
    """Keyed interval-overlap join — all (a, b) pairs sharing the equi
    ``keys`` whose [start, end] intervals overlap (closed intervals:
    a_start <= b_end AND b_start <= a_end). The interval-pattern sibling
    of the as-of and banded range joins: concurrency analysis, session
    overlap, effective-dated dimension intersection.

    A naive plan is a non-equi join — at scale a per-key cross product.
    This plan BANDs time: each interval replicates to every
    ``band_width``-wide band it touches (``sequence(floor(s/w),
    floor(e/w))`` + explode), the join runs on (keys…, band) as a plain
    equi-join inside codegen, and the overlap predicate filters within
    the band. Dedup is algebraic, not a distinct: a qualifying pair is
    kept ONLY in the band containing the overlap start
    (floor(greatest(a_start, b_start)/w)), which exactly one replica
    pair occupies — so no exchange for dedup, and the output is emitted
    once no matter how many bands both intervals span.

    Cost: replication factor = interval_len/band_width + 1 per side —
    pick ``band_width`` around the typical interval length (≥ max
    length gives ≤2 bands/interval). Candidate pairs per (key, band)
    are bounded by per-key interval density within one band, the same
    depth dial every banded generator in this engine exposes.

    Columns come back prefixed ``a_`` / ``b_`` (the linkage_pairs
    convention) with the shared keys unprefixed."""
    def banded(df: DataFrame, start: str, end: str, prefix: str) -> DataFrame:
        s, e = F.col(start), F.col(end)
        out = df.select(
            *[F.col(k) for k in keys],
            *[
                F.col(c).alias(f"{prefix}{c}")
                for c in df.columns
                if c not in keys
            ],
        )
        return out.withColumn(
            "_band",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{prefix}{start}") / band_width),
                    F.floor(F.col(f"{prefix}{end}") / band_width),
                )
            ),
        )

    pa = banded(a, a_start, a_end, "a_")
    pb = banded(b, b_start, b_end, "b_")
    sa, ea = F.col(f"a_{a_start}"), F.col(f"a_{a_end}")
    sb, eb = F.col(f"b_{b_start}"), F.col(f"b_{b_end}")
    return (
        pa.join(pb, [*keys, "_band"])
        .filter((sa <= eb) & (sb <= ea))
        .filter(F.col("_band") == F.floor(F.greatest(sa, sb) / band_width))
        .drop("_band")
    )
