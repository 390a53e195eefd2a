"""Physical-plan linter — mechanical checks for the anti-patterns that
sink Spark jobs at 100 TB but pass every small-scale correctness test.

The repo's discipline is that every operator's plan gets audited (see
PLANS.md and tests/test_entry_plans.py's pinned assertions); this module
turns the recurring audit questions into code so new operators and
ad-hoc user queries get the same scrutiny for free:

- ``cartesian_product``  (error): a physical CartesianProduct — O(n·m)
  row pairs; at scale this is a job-killer, full stop.
- ``unpartitioned_window`` (warn): a Window with an empty PARTITION BY —
  every row funnels through ONE task. Legitimate exactly when the input
  is already k-bounded (the repo's rank-after-limit shapes); the lint
  makes that choice explicit instead of silent.
- ``python_udf`` (warn): BatchEvalPython = row-at-a-time Python in the
  plan, ~10-100× slower than Arrow-batched (ArrowEvalPython / the
  pandas-kernel operators) and 1000× slower than staying JVM-side.
- ``broadcast_nested_loop`` (info): non-equi join fallback — fine for a
  bounded side (our range-band joins), quadratic if both sides grow.
- ``unpushed_filter`` (warn): a Filter sitting DIRECTLY on a file scan
  that pushed nothing down — the scan reads and materializes every row
  the filter then discards (typical cause: filtering on a derived
  expression instead of the stored column).
- ``exchange_count`` (info always; warn above ``max_exchanges``): every
  Exchange is a full shuffle of its input.

Usage::

    from nnanalytics_spark.core.planlint import lint, assert_clean
    findings = lint(df)            # list of Finding(rule, severity, detail)
    assert_clean(df)               # raises unless only `info` findings
    assert_clean(df, allow={"unpartitioned_window"})   # documented waiver

The checks read Catalyst's optimized logical plan (for window partition
specs — exact, not text-matched) and the executed physical plan via py4j
tree walks; no query is executed.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    rule: str
    severity: str  # "error" | "warn" | "info"
    detail: str


def _walk(jnode):
    """Yield every node of a Catalyst tree (logical or physical).
    Descends INTO AdaptiveSparkPlanExec (via its initial plan — the
    statically-planned tree, available before execution) so AQE doesn't
    hide the whole query from the lint."""
    yield jnode
    if jnode.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        yield from _walk(jnode.initialPlan())
        return
    children = jnode.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def _through_wrappers(jnode):
    """Skip codegen/columnar wrapper nodes to the first real operator."""
    while True:
        cls = jnode.getClass().getSimpleName()
        if cls in ("WholeStageCodegenExec", "InputAdapter", "ColumnarToRowExec"):
            if jnode.children().size() != 1:
                return jnode
            jnode = jnode.children().apply(0)
            continue
        return jnode


def lint(df: DataFrame, max_exchanges: int = 8) -> list[Finding]:
    qe = df._jdf.queryExecution()
    findings: list[Finding] = []

    # --- logical checks (exact node inspection) ---
    for node in _walk(qe.optimizedPlan()):
        cls = node.getClass().getSimpleName()
        if cls == "Window" and node.partitionSpec().size() == 0:
            findings.append(
                Finding(
                    "unpartitioned_window",
                    "warn",
                    "Window with empty PARTITION BY — all rows in one task; "
                    "acceptable only on k-bounded input (e.g. after a "
                    "distributed orderBy().limit(k))",
                )
            )

    # --- physical checks ---
    phys = list(_walk(qe.executedPlan()))
    names = [n.getClass().getSimpleName() for n in phys]

    for n, cls in zip(phys, names):
        if cls == "CartesianProductExec":
            findings.append(
                Finding(
                    "cartesian_product",
                    "error",
                    "CartesianProduct: O(|left|·|right|) pairs materialize",
                )
            )
        elif cls == "BroadcastNestedLoopJoinExec":
            findings.append(
                Finding(
                    "broadcast_nested_loop",
                    "info",
                    "non-equi join fallback — bounded broadcast side required",
                )
            )
        elif cls in ("BatchEvalPythonExec",):
            findings.append(
                Finding(
                    "python_udf",
                    "warn",
                    "row-at-a-time Python UDF in plan — prefer built-in "
                    "expressions or a pandas_udf (ArrowEvalPython)",
                )
            )
        elif cls == "FilterExec":
            # a filter whose child is a parquet scan that pushed nothing:
            # the scan decodes every row only for the filter to drop them.
            # Only PUSHABLE-LOOKING predicates count — a comparison whose
            # column operand is bare (or merely cast — the classic silent
            # pushdown blocker). Derived expressions (floor(col) > x,
            # unix_millis(...)) are semantically unpushable and stay
    # silent; IsNotNull-only filters are join-key null rejection.
            child = (
                _through_wrappers(n.children().apply(0))
                if n.children().size()
                else None
            )
            if child is not None and child.getClass().getSimpleName() in (
                "FileSourceScanExec",
                "BatchScanExec",
            ):
                scan_str = child.toString()
                # only formats that CAN push predicates — a CSV/JSON/text
                # scan with an empty pushed list is the format's limit,
                # not a plan bug
                fmt = re.search(r"Format: (\w+)", scan_str)
                if fmt is None or fmt.group(1).lower() not in ("parquet", "orc"):
                    continue
                m = re.search(r"PushedFilters: \[([^\]]*)\]", scan_str)
                pushed = [s.strip() for s in m.group(1).split(",")] if m else []
                real_pushed = [
                    p for p in pushed if p and not p.startswith("IsNotNull")
                ]
                cond = n.condition().toString()
                # bare `attr#12` or `cast(attr#12 as type)` on either side
                # of a comparison with a LITERAL; the cast type must be a
                # simple word (+ optional decimal precision) so a
                # function-wrapped attr can't greedily match as a cast
                attr = r"(?:\w+#\d+L?|cast\(\w+#\d+L? as \w+(?:\(\d+,\d+\))?\))"
                lit = r"[^()#]+"  # literal operand: no parens, no attr refs
                pushable = re.search(
                    rf"\({attr} (?:=|>|<|>=|<=|IN|LIKE) {lit}\)", cond
                ) or re.search(rf"\({lit} (?:=|>|<|>=|<=) {attr}\)", cond)
                if m is not None and not real_pushed and pushable:
                    findings.append(
                        Finding(
                            "unpushed_filter",
                            "warn",
                            "pushable-looking comparison above a scan with "
                            "no pushed filters (cast blocking pushdown?): "
                            + cond[:120],
                        )
                    )

    n_exchange = sum(1 for c in names if c.startswith("ShuffleExchange"))
    findings.append(
        Finding(
            "exchange_count",
            "warn" if n_exchange > max_exchanges else "info",
            f"{n_exchange} shuffle exchange(s) in plan",
        )
    )
    return findings


def assert_clean(
    df: DataFrame,
    allow: set[str] | frozenset[str] = frozenset(),
    max_exchanges: int = 8,
) -> list[Finding]:
    """Raise AssertionError if the plan has any error/warn finding not in
    ``allow``; returns the (full) findings list when clean. ``allow`` is
    the explicit, reviewable waiver a deliberate anti-pattern needs."""
    findings = lint(df, max_exchanges=max_exchanges)
    bad = [
        f
        for f in findings
        if f.severity in ("error", "warn") and f.rule not in allow
    ]
    if bad:
        raise AssertionError(
            "plan lint failed:\n"
            + "\n".join(f"  [{f.severity}] {f.rule}: {f.detail}" for f in bad)
        )
    return findings
