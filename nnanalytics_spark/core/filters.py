"""Filter-predicate compiler: (column, op, value) → pyspark Column.

Reproduces every filter operator of the reference engine
(/root/reference .../AbstractQueryEngine.java:586-740, Constants.java:126-157)
as declarative Column expressions, so Catalyst can push them into the
Parquet scan. Predicates are AND-only, matching the reference
(INodeSqlStatementVisitor.java:110-113 throws on OR).

Semantics preserved exactly:
- relative-time ops use fixed units: minute=60s, hour=3600s, day=86400s,
  month=30 days, year=365 days (AbstractQueryEngine.java:721-740), measured
  against an injected ``now`` (epoch ms) pinned once per query;
- date ops compare at day granularity on ``MM/dd/yyyy``-rendered strings
  (AbstractQueryEngine.java:603-670).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MS = {"minutes": 60_000, "hours": 3_600_000, "days": 86_400_000}
MS["months"] = 30 * MS["days"]
MS["years"] = 365 * MS["days"]

LONG_OPS = frozenset({"eq", "notEq", "lt", "lte", "gt", "gte"})
AGO_OPS = frozenset({"minutesAgo", "hoursAgo", "daysAgo", "monthsAgo", "yearsAgo"})
OLDER_OPS = frozenset(
    {"olderThanMinutes", "olderThanHours", "olderThanDays", "olderThanMonths", "olderThanYears"}
)
STRING_OPS = frozenset(
    {
        "eq",
        "notEq",
        "startsWith",
        "notStartsWith",
        "endsWith",
        "notEndsWith",
        "contains",
        "notContains",
    }
)
DATE_OPS = frozenset(
    {"dateEq", "dateNotEq", "dateLt", "dateLte", "dateStart", "dateGt", "dateGte", "dateEnd"}
)
BOOL_OPS = frozenset({"eq", "notEq"})


def long_predicate(col: Column, op: str, value: int, now_ms: int | None = None) -> Column:
    """Numeric + relative-time predicates (AbstractQueryEngine.java:707-740)."""
    if op in AGO_OPS:
        return col >= F.lit(now_ms - value * MS[op.removesuffix("Ago")])
    if op in OLDER_OPS:
        unit = op.removeprefix("olderThan").lower()
        return col <= F.lit(now_ms - value * MS[unit])
    simple = {
        "eq": col == value,
        "notEq": col != value,
        "lt": col < value,
        "lte": col <= value,
        "gt": col > value,
        "gte": col >= value,
    }
    if op not in simple:
        raise ValueError(f"unsupported long op: {op}")
    return simple[op]


def string_predicate(col: Column, op: str, value: str) -> Column:
    """Substring predicates (AbstractQueryEngine.java:586-602)."""
    ops = {
        "eq": lambda: col == value,
        "notEq": lambda: col != value,
        "startsWith": lambda: col.startswith(value),
        "notStartsWith": lambda: ~col.startswith(value),
        "endsWith": lambda: col.endswith(value),
        "notEndsWith": lambda: ~col.endswith(value),
        "contains": lambda: col.contains(value),
        "notContains": lambda: ~col.contains(value),
    }
    if op not in ops:
        raise ValueError(f"unsupported string op: {op}")
    return ops[op]()


def date_predicate(col: Column, op: str, value: str) -> Column:
    """Day-granularity comparisons on MM/dd/yyyy strings
    (AbstractQueryEngine.java:603-670)."""
    lhs = F.to_date(col, "MM/dd/yyyy")
    rhs = F.to_date(F.lit(value), "MM/dd/yyyy")
    ops = {
        "dateEq": lhs == rhs,
        "dateNotEq": lhs != rhs,
        "dateLt": lhs < rhs,
        "dateLte": lhs <= rhs,
        "dateStart": lhs >= rhs,  # reference aliases: dateStart == dateGte
        "dateGt": lhs > rhs,
        "dateGte": lhs >= rhs,
        "dateEnd": lhs <= rhs,  # dateEnd == dateLte
    }
    if op not in ops:
        raise ValueError(f"unsupported date op: {op}")
    return ops[op]


def bool_predicate(col: Column, op: str, value: bool) -> Column:
    """Boolean compare (AbstractQueryEngine.java:686-697)."""
    if op == "eq":
        return col == bool(value)
    if op == "notEq":
        return col != bool(value)
    raise ValueError(f"unsupported bool op: {op}")


def parse_bool(value: str) -> bool:
    return str(value).lower() in ("true", "1")


def compile_predicate(
    col: Column, dtype: str, op: str, value: str, now_ms: int | None = None
) -> Column:
    """Dispatch on the registry dtype — mirrors the typed dispatch at
    JavaStreamQueryEngine.java:108-155."""
    if dtype == "long":
        return long_predicate(col, op, int(value), now_ms)
    if dtype == "string":
        if op in DATE_OPS:
            return date_predicate(col, op, value)
        return string_predicate(col, op, value)
    if dtype == "boolean":
        return bool_predicate(col, op, parse_bool(value))
    raise ValueError(f"unknown dtype {dtype!r}")


def and_chain(predicates: list[Column]) -> Column | None:
    """AND-chain of N predicates (JavaStreamQueryEngine.java:89-106).
    Spark fuses the chain into one whole-stage-codegen'd filter."""
    result = None
    for predicate in predicates:
        result = predicate if result is None else (result & predicate)
    return result
