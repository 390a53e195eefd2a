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
