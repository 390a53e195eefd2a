"""Privacy audits over tabular/event data — k-anonymity and
l-diversity (Sweeney 2002; Machanavajjhala et al. 2007), the standard
pre-release checks a training-data pipeline runs before shipping a
dataset that carries quasi-identifiers.

Spark-first plan: both audits are ONE hash aggregate over the
quasi-identifier tuple (count / count-distinct-sensitive per group),
then a filter on the group statistic — no windows, no joins, partial
aggregation map-side. At 100 TB the only cost is the shuffle on the
QI key, which is exactly the aggregation key, so AQE coalesces the
post-shuffle partitions and skewed QI tuples (the usual "all-null
QI" hot group) split under adaptive skew handling.

The PII-content complement (regex scrubbing of emails/phones inside
free text) lives in pipeline/text.py:pii_scrub; these audits cover the
STRUCTURED side of the privacy story.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_violations(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Equivalence classes (QI-tuple groups) whose size is below k —
    the rows a k-anonymity release would need to suppress or
    generalize. Returns one row per violating class with its size;
    empty result == the table IS k-anonymous for these columns."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .filter(F.col("class_size") < k)
    )


def k_anonymity_summary(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """One-row audit summary: total classes, violating classes, rows at
    risk (rows in sub-k classes), and the achieved k (the minimum class
    size — the largest k for which the table is k-anonymous). Two chained
    aggregates: rows → classes → scalar."""
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("class_size"))
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("class_size") < k, 1).otherwise(0)).alias(
            "violating_classes"
        ),
        F.sum(
            F.when(F.col("class_size") < k, F.col("class_size")).otherwise(0)
        ).alias("rows_at_risk"),
        F.min("class_size").alias("achieved_k"),
    )


def t_closeness_violations(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    the escalation past l-diversity: a class can hold l distinct
    sensitive values yet still leak if its DISTRIBUTION differs sharply
    from the table's (the classic "rare disease concentrated in one
    block" case). For a categorical sensitive attribute the paper's
    distance is total variation; a class violates when
    TVD(class dist, global dist) > t.

    Returns one row per violating class: the QI columns, class_size,
    and t_distance (round-6). Empty result == the release satisfies
    t-closeness at this t.

    Plan: one aggregate for the global distribution (|values| rows —
    broadcast), one for per-(class, value) counts, a partitioned
    window for class sizes, then a per-class sum. TVD over the values
    ABSENT from a class is folded in closed form —
    TVD = ½(Σ_present |q−p| + (1 − Σ_present p)) — so the join stays
    |class×present-values|, never dense class×vocabulary. Fractions
    quantize to 9-dp DECIMAL before the per-class sums, making every
    sum order-free and the distance engine-exact."""
    from pyspark.sql.window import Window as W

    dec = "decimal(19,9)"
    total = df.count()
    glob = (
        df.groupBy(sensitive_col)
        .agg(F.count(F.lit(1)).alias("_gc"))
        .select(
            sensitive_col,
            F.round(F.col("_gc") / F.lit(total), 9).cast(dec).alias("_p"),
        )
    )
    cls = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_cc")
    )
    cls = cls.withColumn(
        "class_size", F.sum("_cc").over(W.partitionBy(*quasi_cols))
    ).withColumn("_q", F.round(F.col("_cc") / F.col("class_size"), 9).cast(dec))
    joined = cls.join(F.broadcast(glob), sensitive_col)
    per_class = joined.groupBy(*quasi_cols).agg(
        F.max("class_size").alias("class_size"),
        F.sum(F.abs(F.col("_q") - F.col("_p"))).alias("_s1"),
        F.sum("_p").alias("_s2"),
    )
    dist = F.round(
        (
            F.col("_s1") + F.lit(1).cast(dec) - F.col("_s2")
        ).cast("double")
        / 2,
        6,
    )
    return (
        per_class.withColumn("t_distance", dist)
        .filter(F.col("t_distance") > t)
        .select(*quasi_cols, "class_size", "t_distance")
    )


def l_diversity_violations(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l_threshold: int = 2,
) -> DataFrame:
    """Equivalence classes with fewer than l distinct sensitive values —
    the groups where k-anonymity still leaks the attribute (everyone in
    the class shares it). Distinct-l-diversity: count_distinct(sensitive)
    per QI class, filter < l. One aggregate; the count_distinct is
    per-group (no global Expand)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct(sensitive_col).alias("l_distinct"),
        )
        .filter(F.col("l_distinct") < l_threshold)
    )


def dp_release(
    df: DataFrame,
    group_col: str = "source",
    epsilon: float = 1.0,
    k_queries: int = 10,
    seed: int = 42,
    unsafe_deterministic_noise: bool = False,
) -> DataFrame:
    """SHAPE of an ε-DP count release (Laplace mechanism, Dwork et al.
    2006) with the composition budget table — the data-sharing exit
    ramp after the k-anonymity / l-diversity audits: per group,
    count + Laplace(1/ε) noise, and the round's total privacy spend
    under basic (kε) and advanced (ε·√(2k·ln(1/δ)) + kε(e^ε−1),
    δ=1e−6) composition for k such releases.

    **This is NOT a private release.** The noise is a deterministic
    function of (group name, seed) — the Knuth multiplicative hash of
    the group's polynomial fingerprint through the Laplace inverse CDF
    −b·sign(u−½)·ln(1−2|u−½|) — so anyone who knows the seed (it
    defaults) recomputes the noise and subtracts it; the true counts
    are recoverable from the output and the ε/eps_basic/eps_advanced
    columns describe the BUDGET the mechanism WOULD spend, not a
    guarantee this output carries. Determinism is deliberate: it makes
    the release hash-checkable by the engine-parity oracle, which is
    this operator's job — pinning the noise shape, the sensitivity-1
    scale, and the composition accounting. A production deployment
    swaps the hash for a CSPRNG draw per release and keeps every other
    line. Callers must acknowledge the trade by passing
    ``unsafe_deterministic_noise=True``; the default raises."""
    import math

    if not unsafe_deterministic_noise:
        raise ValueError(
            "dp_release's noise is deterministic (invertible) and provides "
            "no actual privacy; it pins the mechanism SHAPE for engine "
            "parity. Pass unsafe_deterministic_noise=True to acknowledge, "
            "or wire a CSPRNG for a real release."
        )

    from nnanalytics_spark.pipeline.text import fingerprint

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    u = (
        F.pmod(
            (fingerprint(F.col(group_col)) + F.lit(seed)) * F.lit(2654435761),
            F.lit(1_000_000_007),
        )
        / F.lit(1_000_000_007)
    )
    b = 1.0 / epsilon  # sensitivity 1 for a count query
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    delta = 1e-6
    eps_adv = epsilon * math.sqrt(2 * k_queries * math.log(1 / delta)) + (
        k_queries * epsilon * (math.exp(epsilon) - 1)
    )
    return counts.select(
        group_col,
        F.round(F.col("_n") + noise, 6).alias("released_count"),
        F.lit(float(epsilon)).alias("epsilon"),
        F.lit(k_queries).alias("k_queries"),
        F.lit(float(k_queries * epsilon)).alias("eps_basic"),
        F.lit(round(eps_adv, 6)).alias("eps_advanced"),
    )
