"""Golden URL battery: the reference's own test query strings, verbatim.

Every literal endpoint query string that TestNNAnalyticsBase.java issues
against its live server (grep of the string constants, deduplicated) is
run through the URL contract (`core.url.run_url`) against the fixture
engine, mirroring `checkOutput` (TestNNAnalyticsBase.java:1553-1567):
a valid query must execute; an invalid set/type/find combination must
raise InvalidQueryError (the reference's 500 + "not supported" path).

The combinatorial sweeps mirror testFilterAndFindQuery /
testHistogramTypeAndFindQuery (TestNNAnalyticsBase.java:1398-1444) built
from the same Constants matrices the engine ports (FIND_*/TYPE_* in
inode/columns.py <- Constants.java:441-489).
"""

from __future__ import annotations

import pytest

from nnanalytics_spark.core import url as u
from nnanalytics_spark.inode import columns, fixture

NOW = fixture.NOW_MS
HOST = "http://localhost:4567"

# Literal query strings from TestNNAnalyticsBase.java (deduplicated; the
# bare "filter?"/"histogram?" builder prefixes and /dump, /suggestions,
# /users strings are exercised in test_url.py / test_web.py instead).
GOLDEN = [
    "divide?set1=files&sum1=blockSize&set2=files&sum2=numBlocks",
    "divide?set1=files&sum1=diskspaceConsumed&set2=files&sum2=count",
    "divide?set1=files&sum1=diskspaceConsumed&set2=files&sum2=numBlocks",
    "divide?set1=files&sum1=diskspaceConsumed&set2=files&sum2=numReplicas",
    "divide?set1=files&sum1=fileSize&set2=dirs&sum2=count",
    "divide?set1=files&sum1=fileSize&set2=files&sum2=count",
    "divide?set1=files&sum1=fileSize&set2=files&sum2=numBlocks",
    "filter?set=all&filters=depth:gte:2&sum=count",
    "filter?set=dirs&filters=hasEcPolicy:eq:false",
    "filter?set=dirs&filters=hasEcPolicy:eq:false&sum=count",
    "filter?set=dirs&filters=hasQuota:eq:true",
    "filter?set=dirs&filters=hasQuota:eq:true&sum=count",
    "filter?set=dirs&filters=isWithSnapshot:notEq:false&sum=count",
    "filter?set=dirs&filters=path:contains:dir1",
    "filter?set=files&filters=accessDate:dateGt:01/01/1990,accessDate:dateLt:01/01/2050&sum=count",
    "filter?set=files&filters=fileSize:lte:1048576,fileSize:gt:1024&sum=count",
    "filter?set=files&filters=hasAcl:eq:true",
    "filter?set=files&filters=hasEcPolicy:eq:false",
    "filter?set=files&filters=hasEcPolicy:eq:false&sum=count",
    "filter?set=files&filters=id:gt:0,id:lt:10000000&sum=count",
    "filter?set=files&filters=isUnderConstruction:notEq:false&sum=count",
    "filter?set=files&filters=isUnderDsQuota:eq:false",
    "filter?set=files&filters=isUnderNsQuota:eq:true&sum=count",
    "filter?set=files&filters=modDate:dateGt:01/01/1990&sum=count",
    "filter?set=files&filters=modDate:dateGt:01/01/1990,modDate:dateLt:01/01/2050&sum=count",
    "filter?set=files&find=max:fileSize",
    "filter?set=files&find=min:fileSize",
    "histogram2?set=files&type=user,accessTime&sum=count",
    "histogram3?set=files&type=accessTime&sum=count,diskspaceConsumed",
    "histogram3?set=files&type=modTime&sum=count,diskspaceConsumed&histogramOutput=csv",
    "histogram3?set=files&type=user&sum=count,diskspaceConsumed&histogramOutput=json",
    "histogram?set=all&type=accessTime",
    "histogram?set=all&type=accessTime&top=10",
    "histogram?set=all&type=memoryConsumed",
    "histogram?set=all&type=modTime",
    "histogram?set=all&type=modTime&bottom=10",
    "histogram?set=dirs&filters=hasQuota:eq:true&type=dirQuota&sum=dsQuota",
    "histogram?set=dirs&filters=hasQuota:eq:true&type=dirQuota&sum=dsQuotaRatioUsed",
    "histogram?set=dirs&filters=hasQuota:eq:true&type=dirQuota&sum=dsQuotaUsed",
    "histogram?set=dirs&filters=hasQuota:eq:true&type=dirQuota&sum=nsQuota",
    "histogram?set=dirs&filters=hasQuota:eq:true&type=dirQuota&sum=nsQuotaRatioUsed",
    "histogram?set=dirs&filters=hasQuota:eq:true&type=dirQuota&sum=nsQuotaUsed",
    "histogram?set=files&filters=accessTime:daysAgo:16,modTime:daysAgo:16&type=accessTime&sum=diskspaceConsumed",
    "histogram?set=files&filters=accessTime:hoursAgo:5,modTime:hoursAgo:5&type=accessTime&sum=diskspaceConsumed",
    "histogram?set=files&filters=accessTime:minutesAgo:5,modTime:minutesAgo:5&&type=accessTime&sum=diskspaceConsumed",
    "histogram?set=files&filters=accessTime:monthsAgo:3,modTime:monthsAgo:3&type=accessTime&sum=diskspaceConsumed",
    "histogram?set=files&filters=accessTime:yearsAgo:1,modTime:yearsAgo:1&type=accessTime&sum=count&histogramConditions=gt:15000",
    "histogram?set=files&filters=accessTime:yearsAgo:1,modTime:yearsAgo:1&type=accessTime&sum=count&histogramOutput=csv",
    "histogram?set=files&filters=accessTime:yearsAgo:1,modTime:yearsAgo:1&type=accessTime&sum=diskspaceConsumed",
    "histogram?set=files&filters=blockSize:gt:0&type=user",
    "histogram?set=files&type=accessTime&find=max:fileSize",
    "histogram?set=files&type=accessTime&sum=diskspaceConsumed",
    "histogram?set=files&type=accessTime&sum=memoryConsumed",
    "histogram?set=files&type=fileReplica",
    "histogram?set=files&type=fileReplica&sortAscending=true",
    "histogram?set=files&type=fileReplica&sortDescending=true",
    "histogram?set=files&type=fileSize",
    "histogram?set=files&type=group&sum=diskspaceConsumed",
    "histogram?set=files&type=parentDir&parentDirDepth=1&histogramOutput=csv",
    "histogram?set=files&type=parentDir&parentDirDepth=2&histogramOutput=csv",
    "histogram?set=files&type=parentDir&parentDirDepth=3&histogramOutput=csv",
    "histogram?set=files&type=storageType",
    "histogram?set=files&type=user&find=max:blockSize",
    "histogram?set=files&type=user&find=max:fileSize&histogramOutput=csv",
    "histogram?set=files&type=user&find=min:accessTime&histogramOutput=csv",
    "histogram?set=files&type=user&find=min:accessTime&histogramOutput=csv&rawTimestamps=true",
    "histogram?set=files&type=user&find=min:blockSize",
    "histogram?set=files&type=user&find=min:fileSize&histogramOutput=csv",
]


def _run(engine, qs):
    return u.run_url(engine, f"{HOST}/{qs}", now_ms=NOW)


@pytest.mark.parametrize("qs", GOLDEN, ids=lambda s: s[:70])
def test_reference_query_string_executes(engine, qs):
    rows = _run(engine, qs).collect()
    assert rows is not None  # executed; emptiness is data-dependent


def test_find_extremum_invariants(engine):
    hi = _run(engine, "filter?set=files&find=max:fileSize").collect()[0][0]
    lo = _run(engine, "filter?set=files&find=min:fileSize").collect()[0][0]
    assert hi >= lo


def test_top_bottom_and_sort_invariants(engine):
    top = _run(engine, "histogram?set=all&type=accessTime&top=10").collect()
    assert len(top) <= 10
    asc = _run(engine, "histogram?set=files&type=fileReplica&sortAscending=true").collect()
    vals = [r[1] for r in asc]
    assert vals == sorted(vals)
    desc = _run(engine, "histogram?set=files&type=fileReplica&sortDescending=true").collect()
    assert [r[1] for r in desc] == sorted(vals, reverse=True)


def test_divide_equals_sum_ratio(engine):
    num = _run(engine, "filter?set=files&filters=&sum=fileSize").collect()[0]["fileSize"]
    den = _run(engine, "filter?set=files&filters=&sum=count").collect()[0]["count"]
    ratio = _run(engine, "divide?set1=files&sum1=fileSize&set2=files&sum2=count").collect()[0][0]
    assert ratio == pytest.approx(num / den)


# ---------------------------------------------------------- find sweeps
# testFilterAndFindQuery: set x {max,min} x FIND_<set> — every valid combo
# returns exactly one row (TestNNAnalyticsBase.java:1398-1415).


def test_filter_find_sweep(engine):
    for s, finds in (
        ("files", columns.FIND_FILE),
        ("dirs", columns.FIND_DIR),
        ("all", columns.FIND_ALL),
    ):
        for op in ("max", "min"):
            for field in sorted(finds):
                rows = _run(engine, f"filter?set={s}&find={op}:{field}").collect()
                assert len(rows) == 1, (s, op, field)


# testHistogramTypeAndFindQuery: set x TYPE_<set> x {max,min,avg} x
# FIND_<set>. Analysis (plan build + validation) runs for every combo,
# mirroring the reference's 200-check; a deterministic sample executes.


def test_histogram_find_sweep(engine):
    combos = []
    for s, types, finds in (
        ("files", columns.TYPE_FILE, columns.FIND_FILE),
        ("dirs", columns.TYPE_DIR, columns.FIND_DIR),
        ("all", columns.TYPE_ALL, columns.FIND_ALL),
    ):
        for t in sorted(types):
            for op in ("max", "min", "avg"):
                for field in sorted(finds):
                    combos.append((s, t, op, field))
    for i, (s, t, op, field) in enumerate(combos):
        df = _run(engine, f"histogram?set={s}&type={t}&find={op}:{field}")
        assert len(df.columns) == 2, (s, t, op, field)
        if i % 9 == 0:  # execute a deterministic sample end-to-end
            df.collect()


def test_invalid_combos_rejected_like_reference_500(engine):
    # the reference answers 500 + "not supported" for these
    # (QueryChecker paths); the engine's analog is InvalidQueryError
    for qs in (
        "filter?set=dirs&find=max:fileSize",
        "filter?set=all&find=min:blockSize",
        "histogram?set=dirs&type=fileSize",
        "histogram?set=files&type=dirQuota",
        "filter?set=dirs&filters=fileSize:gt:0&sum=count",
        "histogram?set=files&type=user&sum=dirNumChildren",
    ):
        with pytest.raises(columns.InvalidQueryError):
            _run(engine, qs).collect()
