"""Behavioral / event-sequence analytics over the events stream.

Beyond-reference operators a training-data (or product-analytics)
pipeline runs on event logs: ordered funnels and cohort retention.
Both are expressed as plain DataFrame aggregations — no UDFs — so
Catalyst keeps them in whole-stage codegen and the only shuffles are
the keyed aggregations a 1000-executor run would need anyway.

Determinism: event time is the exact integer microsecond epoch
(``ts_us``), never a double; funnel progression uses STRICT time
increase so the result is identical to the nested ``min(ts) > prev``
SQL formulation DuckDB runs as the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user: str = "user_id",
    ts: str = "ts_us",
    event_type: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Ordered-funnel completion counts: how many users performed
    ``steps[0]`` then (strictly later) ``steps[1]``, then … in order.

    Single-shuffle shape: filter to funnel event types (pushed to the
    scan), ONE groupBy(user) that sorts each user's event structs and
    walks them with ``F.aggregate`` (a codegen'd lambda fold, not a
    Python UDF), then a tiny groupBy over |steps| rows. Per-user state
    is (furthest step, its timestamp) — O(1), so one hot user cannot
    skew memory the way a collect_list-of-everything would (the list is
    bounded by that user's FUNNEL events only, already type-filtered).

    Greedy earliest-match is optimal for subsequence existence, so this
    equals the oracle's nested ``min(ts) where ts > prev`` chain; ties
    at identical timestamps do NOT advance (strict >), matching the SQL.
    """
    idx = F.lit(None).cast("int")
    for i, s in enumerate(steps):
        idx = F.when(F.col(event_type) == s, F.lit(i + 1)).otherwise(idx)
    ev = (
        events.filter(F.col(event_type).isin(list(steps)))
        .select(
            F.col(user).alias("u"),
            F.struct(
                F.col(ts).alias("t"),
                F.col(order_tiebreak).alias("tb"),
                idx.alias("step"),
            ).alias("e"),
        )
    )
    # Fold state: (reached step, timestamp of that step). Advance only on
    # the NEXT step index with a strictly later timestamp.
    walk = F.aggregate(
        F.array_sort(F.collect_list("e")),
        F.struct(F.lit(0).alias("step"), F.lit(-1).cast("long").alias("t")),
        lambda acc, e: F.when(
            (e["step"] == acc["step"] + 1) & (e["t"] > acc["t"]),
            F.struct(e["step"].alias("step"), e["t"].alias("t")),
        ).otherwise(acc),
    )
    reached = ev.groupBy("u").agg(walk["step"].alias("reached"))
    per_step = reached.groupBy("reached").agg(F.count(F.lit(1)).alias("n"))
    from nnanalytics_spark.core.smalldf import local_df

    dim = local_df(
        reached.sparkSession,
        [(i + 1, s) for i, s in enumerate(steps)],
        "step int, event_type string",
    )
    return (
        dim.join(per_step, per_step["reached"] >= dim["step"], "left")
        .groupBy("step", "event_type")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("users"))
    )


def retention_cohorts(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention: users grouped by their first-activity day, then
    counted (distinct) per (cohort day, activity-week offset).

    Two keyed aggregations and one join: the cohort table is |users|
    rows (aggregate FIRST, then join — cheaper than a per-user window
    over the raw log, which would shuffle every event by user just to
    tag it). The join strategy is deliberately left to AQE: the cohort
    dim is tiny relative to the log but still one row PER USER, so a
    forced broadcast would blow the broadcast limit on a
    hundreds-of-millions-of-users log; AQE broadcasts exactly when the
    dim actually fits and falls back to a keyed join when it does not.
    """
    d = F.to_date(F.col(ts).cast("timestamp"))
    act = events.select(F.col(user).alias("u"), d.alias("d"))
    cohort = act.groupBy("u").agg(F.min("d").alias("cohort_day"))
    return (
        act.join(cohort, "u")
        .groupBy(
            "cohort_day",
            (F.datediff(F.col("d"), F.col("cohort_day")) / bucket_days)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct(F.col("u")).alias("active_users"))
    )


def inter_event_gaps(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts_us",
    event_type: str = "event_type",
) -> DataFrame:
    """Dwell-time profile: for each event type, the distribution of gaps
    between a user's consecutive events OF THAT TYPE (lag window per
    (user, type) in event-time order), summarized as count / mean /
    exact interpolated p50 / p90 in seconds.

    One window exchange keyed on (user, type) — the same key the gap is
    defined over, so no second shuffle until the per-type rollup (|types|
    rows). Mean rides an integer microsecond sum (order-independent);
    percentiles use Spark's exact interpolated percentile, which matches
    DuckDB's quantile_cont definition.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(user, event_type).orderBy(F.col(ts).asc())
    gaps = (
        events.select(F.col(user), F.col(event_type), F.col(ts))
        .withColumn("prev", F.lag(ts).over(w))
        .filter(F.col("prev").isNotNull())
        .withColumn("gap_us", F.col(ts) - F.col("prev"))
    )
    sec = 1_000_000.0
    return gaps.groupBy(event_type).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.sum("gap_us").cast("double") / F.count(F.lit(1)) / sec, 6).alias(
            "mean_gap_s"
        ),
        F.round(F.percentile("gap_us", F.lit(0.5)) / sec, 6).alias("p50_gap_s"),
        F.round(F.percentile("gap_us", F.lit(0.9)) / sec, 6).alias("p90_gap_s"),
    )


def hourly_anomalies(
    events: DataFrame,
    z_threshold: float = 2.0,
    ts: str = "ts",
    event_type: str = "event_type",
) -> DataFrame:
    """Volume-anomaly detection: bucket the log into (type, hour) counts,
    then flag hours whose count deviates from that type's mean by more
    than ``z_threshold`` population standard deviations.

    Two aggregations, both tiny after the first: the (type, hour) rollup
    is the only pass over the log (map-side combine; |types|·|hours|
    output rows), and the per-type moments ride a window over that
    rollup — monitoring-grade anomaly detection without a second scan.

    The z-score is derived from EXACT integer moments (n, Σcnt, Σcnt²)
    rather than a stddev aggregate: builtin stddev implementations
    accumulate floating-point state in partition order, so two engines
    (or two runs with different partitioning) can disagree in the last
    ulp right at the |z| > threshold boundary. Integer moments make
    mean/var/z the SAME double expression over the SAME integers
    everywhere — bit-stable, hence oracle-hashable.
    """
    from pyspark.sql import Window as W

    hour = F.date_trunc("hour", F.col(ts).cast("timestamp"))
    counts = events.groupBy(
        F.col(event_type), hour.alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy(event_type)
    n = F.count(F.lit(1)).over(w)
    s = F.sum("cnt").over(w)
    ss = F.sum(F.col("cnt") * F.col("cnt")).over(w)
    mean = s.cast("double") / n
    var = ss.cast("double") / n - mean * mean
    z = (F.col("cnt") - mean) / F.sqrt(var)
    # var == 0 (a type with constant hourly counts, e.g. all events in one
    # bucket) has no anomalies by definition — and under ANSI mode the
    # bare division would abort the whole query with DIVIDE_BY_ZERO, so
    # the guard must come BEFORE z is ever evaluated.
    return (
        counts.withColumn("var", var)
        .filter(F.col("var") > 0)
        .withColumn("z", F.round(z, 6))
        .filter(F.abs(F.col("z")) > z_threshold)
        .select(event_type, "hour", "cnt", "z")
    )


def event_transitions(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts_us",
    event_type: str = "event_type",
) -> DataFrame:
    """First-order behavior transition matrix: for each user's event
    stream in time order, count (previous type → type) transitions and
    attach each source state's outgoing total — the empirical Markov
    transition counts session-flow analysis starts from.

    One (user)-keyed window exchange (lag), one (from, to) rollup, and a
    window over the |types|² matrix for the totals. Ties in event time
    are broken by event_id so the sequence — and therefore the matrix —
    is deterministic.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(user).orderBy(F.col(ts).asc(), F.col("event_id").asc())
    pairs = (
        events.select(F.col(user), F.col("event_id"), F.col(ts), F.col(event_type))
        .withColumn("prev_type", F.lag(event_type).over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    matrix = pairs.groupBy(
        F.col("prev_type").alias("from_type"), F.col(event_type).alias("to_type")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    out_total = F.sum("cnt").over(W.partitionBy("from_type"))
    return matrix.select(
        "from_type",
        "to_type",
        "cnt",
        F.round(F.col("cnt") / out_total, 6).alias("p"),
    )


def pivot_counts(
    df: DataFrame,
    row: str,
    col: str,
    values: Sequence[str],
) -> DataFrame:
    """Crosstab report via Spark's native pivot: one wide row per
    ``row`` value, one count column per pinned ``col`` value, zeros
    filled. ``values`` must be pinned explicitly — that is what keeps
    the plan ONE pass (omitting it makes Spark run a distinct-scan
    first) and the output schema deterministic for an external oracle.
    Physically a pivot is a single hash aggregate whose buffer holds
    |values| counters per row key — map-side combined, one shuffle on
    the row key, no explode."""
    out = df.groupBy(row).pivot(col, list(values)).count()
    return out.select(
        row, *[F.coalesce(F.col(v), F.lit(0)).alias(v) for v in values]
    )


def resample_hourly(
    events: DataFrame,
    group: str = "event_type",
    ts_us: str = "ts_us",
) -> DataFrame:
    """Dense hourly time series per group with gaps ZERO-FILLED — the
    resample step every monitoring/trend consumer needs before window
    arithmetic (a lag over a sparse series silently skips empty hours).

    The hour spine is sequence(global_min_hour .. global_max_hour)
    cross-joined with the distinct group set — |hours| x |groups| rows
    generated ON the executors from two broadcast scalars, never
    collected; observed counts LEFT-join onto the spine by (group,
    hour). The count aggregate and the spine join key on the same
    (group, hour), so AQE reuses one exchange. At 100 TB the spine is
    calendar-sized (thousands of rows per group), trivially smaller
    than the log it indexes."""
    hour = F.floor(F.col(ts_us) / 3_600_000_000).cast("long")
    counts = events.select(F.col(group).alias("g"), hour.alias("h")).groupBy(
        "g", "h"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # bounds and the group set derive from the ALREADY-AGGREGATED counts
    # table (|groups|·|hours| rows). The lazy localCheckpoint is what
    # actually enforces ONE log scan: without it Catalyst collapses
    # aggregate-over-aggregate back into three direct scans of the raw
    # log (verified in the plan — the same reason dup_clusters
    # checkpoints between propagation rounds).
    counts = counts.localCheckpoint(eager=False)
    bounds = counts.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    groups = counts.select("g").distinct()
    spine = groups.crossJoin(F.broadcast(bounds)).select(
        "g", F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    return (
        spine.join(counts, ["g", "h"], "left")
        .select(
            F.col("g").alias(group),
            F.col("h").alias("hour"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )


def scd2_intervals(
    events: DataFrame,
    key: str = "user_id",
    state: str = "event_type",
    ts_us: str = "ts_us",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Slowly-Changing-Dimension type-2 reconstruction from a changelog:
    each (key, state) run becomes one validity interval
    [valid_from_us, valid_to_us), with NULL valid_to on the open
    current interval — how a warehouse materializes "what was this
    entity's attribute at time T" from an event stream, queryable with
    a plain BETWEEN instead of an as-of join per lookup.

    Run-collapsing uses the classic gaps-and-islands rank difference
    (row_number over key MINUS row_number over (key, state) is constant
    within a run). Hash-partitioning on the key alone satisfies the
    (key, state) window's distribution requirement too (co-location by
    key implies co-location by any superset), so Catalyst plans ONE
    exchange feeding two in-partition sorts — verified in
    test_r5_ops.py — and the lead() for valid_to plus the final
    interval window ride that same partitioning over |intervals| rows,
    not |events|. Deterministic (ts, event_id) ordering makes
    simultaneous events engine-stable.

    Simultaneous-conflict semantics (ADVICE r5): two events of
    DIFFERENT states at the same timestamp produce a zero-width
    [from, to) interval for the one that loses the (ts, event_id)
    tiebreak — it was "valid" for an instant of zero length, so a
    BETWEEN/point-in-time lookup never selects it. That is deliberate:
    the record of the transition is preserved (audit trails can see the
    state existed) without inventing duration that the source data
    doesn't contain. Collapse simultaneous conflicts upstream if a
    consumer needs at-most-one state per timestamp."""
    from pyspark.sql.window import Window

    w_key = Window.partitionBy(key).orderBy(ts_us, order_tiebreak)
    w_run = Window.partitionBy(key, state).orderBy(ts_us, order_tiebreak)
    runs = events.select(
        key,
        state,
        F.col(ts_us).alias("t"),
        (F.row_number().over(w_key) - F.row_number().over(w_run)).alias("island"),
    )
    iv = runs.groupBy(key, state, "island").agg(F.min("t").alias("valid_from_us"))
    # state as tiebreak: two simultaneous events of DIFFERENT types give
    # two runs with the same valid_from_us — without it lead() (and any
    # downstream cut) is engine-nondeterministic
    w_iv = Window.partitionBy(key).orderBy("valid_from_us", state)
    return iv.select(
        key,
        state,
        "valid_from_us",
        F.lead("valid_from_us").over(w_iv).alias("valid_to_us"),
    )


def path_ngrams(
    events: DataFrame,
    n: int = 3,
    k: int = 20,
    key: str = "user_id",
    state: str = "event_type",
    ts_us: str = "ts_us",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Top-k most common length-n event paths across user journeys —
    the "what do users actually do" product-analytics staple, and for
    training-data work the behavioral analog of text n-grams (mining
    interaction logs for common action sequences).

    One key-partitioned sort (shared by the n-1 lead() windows — same
    single-exchange economics as scd2_intervals), a map-side filter of
    incomplete windows at each journey's tail, a path-keyed count
    (path space is |event types|^n, tiny), and the deterministic
    (count desc, path) TakeOrdered cut."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(ts_us, order_tiebreak)
    steps = [F.col(state)] + [F.lead(state, i).over(w) for i in range(1, n)]
    paths = (
        events.select(F.concat_ws(">", *steps).alias("path"),
                      steps[-1].isNotNull().alias("_complete"))
        .filter(F.col("_complete"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = paths.orderBy(F.col("cnt").desc(), "path").limit(k)
    w_rank = Window.orderBy(F.col("cnt").desc(), "path")
    return (
        top.withColumn("rank", F.row_number().over(w_rank))
        .select("rank", "path", "cnt")
        .orderBy("rank")
    )


def cooccurrence_lift(
    events: DataFrame,
    user: str = "user_id",
    ts_us: str = "ts_us",
    event_type: str = "event_type",
    window_hours: int = 1,
) -> DataFrame:
    """Market-basket association over event streams: for every pair of
    event types co-occurring inside the same (user, time-window)
    basket, support counts and LIFT = P(a∧b) / (P(a)·P(b)) — the
    "users who error also repurchase?" diagnostic, and for training-
    data work the session-level analog of token collocations.

    Baskets are (user, floor(ts/window)) with DISTINCT types — one
    keyed aggregate collapsing the log to |baskets| rows whose type
    sets are bounded by |types| (array, not rows). Pairs explode from
    each basket's sorted type array (C(|types|,2) per basket, tiny),
    then one pair-keyed count; marginals ride a second pass over the
    basket table. Lift emerges as a double from exact integer counts."""
    bucket = F.floor(F.col(ts_us) / F.lit(window_hours * 3_600_000_000)).alias("w")
    baskets = (
        events.groupBy(F.col(user).alias("u"), bucket)
        .agg(F.array_sort(F.collect_set(event_type)).alias("types"))
        # three consumers (pairs, marginals, n_baskets) — the lazy
        # localCheckpoint keeps it ONE log scan (Catalyst would
        # otherwise replay the aggregate per branch; the resample fix)
        .localCheckpoint(eager=False)
    )
    n_baskets = baskets.select(F.count(F.lit(1)).alias("nb"))
    marg = baskets.select(F.explode("types").alias("t")).groupBy("t").agg(
        F.count(F.lit(1)).alias("m")
    )
    # i runs 1..size-1 and j i+1..size, both guarded: Spark's sequence()
    # silently DESCENDS when start > stop, which would fabricate
    # self-pairs on the boundary — singleton baskets take the empty
    # branch instead
    empty = F.array().cast("array<struct<a:string,b:string>>")
    pair_arr = F.when(
        F.size("types") >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.size("types") - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, F.size("types")),
                    lambda j: F.struct(
                        F.element_at("types", i).alias("a"),
                        F.element_at("types", j).alias("b"),
                    ),
                ),
            )
        ),
    ).otherwise(empty)
    pairs = baskets.select(F.explode(pair_arr).alias("p"))
    counts = pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.count(F.lit(1)).alias("both")
    )
    ma = marg.select(F.col("t").alias("a"), F.col("m").alias("ma"))
    mb = marg.select(F.col("t").alias("b"), F.col("m").alias("mb"))
    return (
        counts.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "a",
            "b",
            "both",
            "ma",
            "mb",
            F.round(
                (F.col("both").cast("double") * F.col("nb"))
                / (F.col("ma").cast("double") * F.col("mb")),
                6,
            ).alias("lift"),
        )
        .orderBy("a", "b")
    )


def growth_accounting(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    bucket_days: int = 7,
) -> DataFrame:
    """Weekly growth accounting: per activity week, NEW users (first
    ever activity that week), RETURNING (also active the previous
    week), RESURRECTED (active before, but not the previous week), and
    the cumulative user base — the standard MAU-decomposition every
    growth dashboard runs, all from exact integer date arithmetic.

    Three aggregates over (user, week): the distinct activity table,
    each user's first week (rides the same exchange), and a lag window
    per user over |user, week| rows. The weekly rollup plus a running
    cumulative-new window finish over |weeks| rows."""
    from pyspark.sql.window import Window

    day0 = F.lit("1970-01-01").cast("date")
    week = F.floor(F.datediff(F.to_date(F.col(ts).cast("timestamp")), day0) / bucket_days)
    act = events.select(F.col(user).alias("u"), week.alias("wk")).distinct()
    w_u = Window.partitionBy("u").orderBy("wk")
    tagged = act.select(
        "u",
        "wk",
        (F.row_number().over(w_u) == 1).alias("is_new"),
        (F.lag("wk").over(w_u) == F.col("wk") - 1).alias("is_returning"),
    )
    weekly = tagged.groupBy("wk").agg(
        F.count(F.lit(1)).alias("active"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("new_users"),
        F.sum(
            F.when(~F.col("is_new") & F.col("is_returning"), 1).otherwise(0)
        ).alias("returning"),
        F.sum(
            F.when(
                ~F.col("is_new") & ~F.coalesce(F.col("is_returning"), F.lit(False)),
                1,
            ).otherwise(0)
        ).alias("resurrected"),
    )
    w_cum = Window.orderBy("wk").rowsBetween(Window.unboundedPreceding, 0)
    return weekly.select(
        "wk",
        "active",
        "new_users",
        "returning",
        "resurrected",
        F.sum("new_users").over(w_cum).alias("cumulative_users"),
    ).orderBy("wk")


def session_entropy(
    events: DataFrame, key: str = "user_id", state: str = "event_type"
) -> DataFrame:
    """Per-user Shannon entropy (nats) over the event-type distribution
    — the behavioral diversity score that separates single-action bots
    (entropy 0) from organic multi-surface users, and for training-data
    curation scores interaction-log quality the way char_entropy scores
    text. Plan: one (key, state) keyed count with map-side combine, one
    per-key aggregate. Each -p·ln(p) term rounds to 6 dp and sums as
    DECIMAL(18,6) (the bigram_lm hardening), so the total is add-order-
    independent and engine-exact."""
    counts = events.groupBy(key, state).agg(F.count(F.lit(1)).alias("c"))
    # entropy needs the per-key total inside each per-state term: the
    # totals table is |keys| rows, rejoined on the same key partitioning
    n = counts.groupBy(key).agg(F.sum("c").alias("n"))
    j = counts.join(n, key)
    p = F.col("c").cast("double") / F.col("n").cast("double")
    term = F.round(-p * F.log(p), 6).cast("decimal(18,6)")
    return (
        j.groupBy(key)
        .agg(
            F.max("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(term).alias("ent"),
        )
        .select(
            key,
            "n_events",
            "n_types",
            F.col("ent").cast("double").alias("entropy_nats"),
        )
    )


def markov_stationary(
    events: DataFrame,
    iters: int = 20,
    user: str = "user_id",
    ts: str = "ts_us",
    event_type: str = "event_type",
) -> DataFrame:
    """Stationary distribution of the empirical behavior Markov chain —
    "where do user journeys spend their time in the long run", the
    one-number-per-state summary session-flow analysis ends with.

    Split exactly like k-means: the DISTRIBUTED work is the transition
    matrix aggregation over the full log (event_transitions: one keyed
    window + one rollup); the |types|² matrix is then driver-bounded by
    definition (the event-type alphabet), so the 20 power-iteration
    steps run on collected integers — same pattern as collecting
    centroids, never corpus rows.

    Engine-exactness: probabilities quantize to integer MICROS (the
    6-dp matrix is exact in micros), the iteration is
    π'(s) = (Σ_prev π(prev)·P(prev,s) + 500000) // 10⁶ — pure int64
    arithmetic (10⁶·10⁶ products), order-free, so a SQL oracle unrolls
    the identical 20 steps and matches bit-for-bit. Mass leaks only at
    states with no outgoing transitions (open chains); document/close
    the state space upstream if that matters."""
    rows = event_transitions(events, user, ts, event_type).collect()
    states = sorted({r["from_type"] for r in rows})
    if not states:
        # no transitions at all (empty log / single-event users): an
        # empty result, not a ZeroDivisionError from the uniform init
        return events.sparkSession.createDataFrame(
            [], "state string, stationary_micros long, stationary_p double"
        )
    idx = {s: i for i, s in enumerate(states)}
    p_micros = {}
    for r in rows:
        if r["to_type"] in idx:
            p_micros[(idx[r["from_type"]], idx[r["to_type"]])] = int(
                round(r["p"] * 1_000_000)
            )
    pi = [1_000_000 // len(states)] * len(states)
    for _ in range(iters):
        nxt = []
        for s in range(len(states)):
            acc = sum(
                pi[prev] * p_micros.get((prev, s), 0) for prev in range(len(states))
            )
            nxt.append((acc + 500_000) // 1_000_000)
        pi = nxt
    out = [
        (states[s], pi[s], round(pi[s] / 1_000_000.0, 6)) for s in range(len(states))
    ]
    from nnanalytics_spark.core.smalldf import local_df

    return local_df(
        events.sparkSession, out, "state string, stationary_micros long, stationary_p double"
    )


def funnel_conversion_time(
    events: DataFrame,
    steps: Sequence[str],
    user: str = "user_id",
    ts: str = "ts_us",
    event_type: str = "event_type",
) -> DataFrame:
    """Time-to-convert per funnel step: for users who reached step i
    under the same greedy earliest-match the funnel uses, the
    distribution of (t_i − t_1) — the product question behind every
    "how long from first view to purchase" dashboard.

    Plan: one keyed min-aggregate per step (|steps| is tiny and fixed),
    each joined on the user key against the previous step's table —
    exactly the nested min(ts)-chain the oracle runs, so greedy
    semantics are identical by construction. Mean rides an exact
    integer-microsecond sum; p50 is the exact interpolated percentile
    (both engines define it identically)."""
    if len(steps) < 2:
        raise ValueError("funnel_conversion_time needs at least two steps")
    e = events.select(
        F.col(user).alias("u"), F.col(ts).alias("t"), F.col(event_type).alias("et")
    )
    reached = e.filter(F.col("et") == steps[0]).groupBy("u").agg(
        F.min("t").alias("t1")
    )
    prev = reached.select("u", F.col("t1").alias("tp"), "t1")
    out = []
    sec = 1_000_000.0
    for i, s in enumerate(steps[1:], start=2):
        cur = (
            e.filter(F.col("et") == s)
            .join(prev, "u")
            .filter(F.col("t") > F.col("tp"))
            .groupBy("u", "t1")
            .agg(F.min("t").alias("ti"))
        )
        delta = F.col("ti") - F.col("t1")
        out.append(
            cur.agg(
                F.lit(i).alias("step"),
                F.lit(s).alias("event_type"),
                F.count(F.lit(1)).alias("users"),
                F.round(F.sum(delta).cast("double") / F.count(F.lit(1)) / sec, 6).alias(
                    "mean_s"
                ),
                F.round(F.percentile(delta, F.lit(0.5)) / sec, 6).alias("p50_s"),
            )
        )
        prev = cur.select("u", F.col("ti").alias("tp"), "t1")
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def forward_fill(
    events: DataFrame,
    value: str = "value",
    user: str = "user_id",
    ts: str = "ts_us",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Last-observation-carried-forward per user: NULL values take the
    most recent non-NULL earlier value in the user's event-time order —
    the gap-repair step for sensor/telemetry-style logs before
    aggregation. One window exchange keyed on the user (the same key
    every downstream per-user op reuses); rows before any observation
    stay NULL by design."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(user)
        .orderBy(F.col(ts).asc(), F.col(order_tiebreak).asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return events.withColumn(
        f"{value}_filled", F.last(value, ignorenulls=True).over(w)
    )


def seasonal_index(
    events: DataFrame,
    ts_ms: str = "ts_ms",
    value: str = "value",
    group: str = "event_type",
) -> DataFrame:
    """Hour-of-week seasonality profile per group: for each
    (group, day-of-week, hour) cell, the ratio of the cell's mean value
    to the group's overall mean, in parts-per-million — the classic
    seasonal-naive baseline/index used to deseasonalize event streams
    before anomaly scoring (hourly_anomalies is the z-score complement;
    this is the multiplicative profile).

    Calendar fields derive from INTEGER epoch-millis arithmetic
    (dow = (epoch_day + 4) % 7 with 0=Sunday — 1970-01-01 was a
    Thursday; hour = (ms div 3_600_000) % 24), not from the engine's
    dayofweek()/hour(), whose numbering and timezone conventions differ
    across engines — the same UTC-integer recipe the time-bucket
    histograms use.

    Exact-integer parity: means never materialize as floats. With
    value quantized to cents, index = (cell_sum · group_cnt · 1e6) /
    (cell_cnt · group_sum) — all integers, the division done once in
    DECIMAL(38,0) so the floor is engine-exact and the sum order can't
    matter. Plan: ONE aggregate over (group, dow, hour), then a
    broadcast-sized per-group totals join (|groups| rows)."""
    dec = "decimal(38,0)"
    cells = (
        events.select(
            F.col(group).alias("grp"),
            F.expr(f"(({ts_ms} div 86400000) + 4) % 7").alias("dow"),
            F.expr(f"({ts_ms} div 3600000) % 24").alias("hod"),
            F.floor(F.col(value) * 100).alias("cents"),
        )
        .groupBy("grp", "dow", "hod")
        .agg(F.sum("cents").alias("cell_sum"), F.count(F.lit(1)).alias("cell_cnt"))
    )
    totals = cells.groupBy("grp").agg(
        F.sum("cell_sum").alias("grp_sum"), F.sum("cell_cnt").alias("grp_cnt")
    )
    return (
        cells.join(F.broadcast(totals), "grp")
        .withColumn(
            "num",
            F.col("cell_sum").cast(dec)
            * F.col("grp_cnt").cast(dec)
            * F.lit(1_000_000).cast(dec),
        )
        .withColumn("den", F.col("cell_cnt").cast(dec) * F.col("grp_sum").cast(dec))
        # `div` (integral division) instead of decimal `/`: Spark's
        # decimal divide rounds HALF_UP at a derived scale while other
        # engines truncate — div is floor-exact on positive integers in
        # every engine
        .withColumn("index_ppm", F.expr("CAST(num div den AS LONG)"))
        .select(
            F.col("grp").alias(group), "dow", "hod", "cell_cnt", "index_ppm"
        )
    )


def time_decay_scores(
    events: DataFrame,
    user: str = "user_id",
    ts_ms: str = "ts_ms",
    value: str = "value",
    horizon_days: int = 40,
) -> DataFrame:
    """Recency-weighted engagement score per user: each event contributes
    value · 2^(−age_days), age in whole UTC days (epoch-millis div
    86_400_000 — integer calendar math, no timezone/dayofweek traps)
    behind the stream's max timestamp, truncated to zero past
    ``horizon_days`` (2^-40 ≈ 1e-12 — already below any ranking-relevant
    resolution). The dyadic (power-of-two per day) kernel is chosen
    deliberately: cents · 2^(horizon − age) is an exact INTEGER, so the
    per-user sum is order-free and engine-exact where a float e^(−λ·age)
    sum would be addition-order-dependent. Emits scaled integer scores
    (score · 2^horizon, in cents).

    Plan: the max-ts scalar broadcasts into the row expression (subquery,
    no collect); then ONE hash aggregate on the user. Per-term magnitude
    cents·2^40 ≈ 1e17 → DECIMAL(38,0) terms hold > 1e20 rows per user."""
    dec = "decimal(38,0)"
    max_ts = events.agg(F.max(F.expr(f"{ts_ms} div 86400000")).alias("mx_day"))
    aged = events.crossJoin(F.broadcast(max_ts)).select(
        F.col(user).alias("user"),
        (F.col("mx_day") - F.expr(f"{ts_ms} div 86400000")).alias("age_days"),
        F.floor(F.col(value) * 100).alias("cents"),
    )
    weighted = aged.withColumn(
        "term",
        F.when(
            (F.col("age_days") >= 0) & (F.col("age_days") <= horizon_days),
            F.col("cents").cast(dec)
            * F.pow(F.lit(2.0), F.lit(horizon_days) - F.col("age_days")).cast(dec),
        ).otherwise(F.lit(0).cast(dec)),
    )
    # emitted as the DECIMAL's exact decimal STRING: the magnitude
    # (cents·2^40) exceeds 2^53, so a float64 hand-off would silently
    # round, and pandas/Arrow have no common integer type both engines
    # map a 38-digit decimal onto — the string is the lossless wire form
    return (
        weighted.groupBy("user")
        .agg(F.sum("term").cast(dec).cast("string").alias("decayed_cents_x2h"))
        .select(F.col("user").alias(user), "decayed_cents_x2h")
    )


def lateness_report(
    events: DataFrame,
    user: str = "user_id",
    arrival: str = "event_id",
    ts_ms: str = "ts_ms",
) -> DataFrame:
    """Event-time lateness profile — the number a streaming deployment
    needs BEFORE picking a watermark horizon: per event, how far its
    event time lags the maximum event time already seen in its key's
    ARRIVAL order (``arrival`` = the ingest sequence; here the event id,
    which the generator assigns in ingest order). lateness = 0 means
    in-order; the bucket histogram (in-order / ≤1 min / ≤1 h / ≤1 d /
    >1 d) reads directly as "a 1-hour watermark would close the book on
    X% of events".

    ``arrival`` must be UNIQUE per key (the default event id is): the
    running max reads a ROWS frame, and duplicate arrival keys would
    make the frame order — and the report — nondeterministic.

    One window exchange keyed on the user (running max over the
    preceding frame), then a 5-row aggregate. The same per-user key
    every downstream stateful op shuffles on — at scale this profiles
    the exact reordering the state stores will absorb."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(user)
        .orderBy(F.col(arrival).asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # coalesce BEFORE greatest: each key's first arrival has an empty
    # preceding frame (NULL max), and NULL-vs-scalar semantics of
    # greatest() differ across engines — the coalesce pins it
    late = F.greatest(
        F.lit(0).cast("long"),
        F.coalesce(
            (F.max(F.col(ts_ms)).over(w) - F.col(ts_ms)).cast("long"),
            F.lit(0).cast("long"),
        ),
    )
    bucket = (
        F.when(late == 0, "0_in_order")
        .when(late <= 60_000, "1_le_1min")
        .when(late <= 3_600_000, "2_le_1hour")
        .when(late <= 86_400_000, "3_le_1day")
        .otherwise("4_gt_1day")
    )
    return (
        events.select(bucket.alias("lateness_bucket"), late.alias("late_ms"))
        .groupBy("lateness_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("late_ms").alias("max_late_ms"),
        )
    )


def multi_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("click", "view"),
    window_ms: int = 7 * 86_400_000,
    user: str = "user_id",
    ts_ms: str = "ts_ms",
    value: str = "value",
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's credit splits
    EQUALLY across the user's touch events in the preceding window —
    the marketing-analytics counterpart of asof_last_click's last-touch
    model, and the fairer one when journeys have several touches.

    Credit is integer ppm (1_000_000 div n_touches per touch; the
    remainder ppm stay unassigned, the standard truncation) and revenue
    cents scale the same way — all-integer so the per-type sums are
    order-free and engine-exact.

    Plan: conversions and touches are two pushed-down scans of the same
    log; the pairing is a USER-KEYED equi-join with the time window as a
    residual predicate — at 100 TB this shuffles on the user exactly
    once and never materializes cross-user pairs (a pure ts-range join
    would). One aggregate per conversion for n_touches, one per touch
    type for the report."""
    conv = events.filter(F.col("event_type") == conversion_type).select(
        F.col(user).alias("u"),
        F.col("event_id").alias("conv_id"),
        F.col(ts_ms).alias("conv_ts"),
        F.floor(F.col(value) * 100).alias("conv_cents"),
    )
    touch = events.filter(F.col("event_type").isin(list(touch_types))).select(
        F.col(user).alias("u"),
        F.col("event_type").alias("touch_type"),
        F.col("event_id").alias("touch_id"),
        F.col(ts_ms).alias("touch_ts"),
    )
    pairs = conv.join(touch, "u").filter(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (F.col("touch_ts") >= F.col("conv_ts") - window_ms)
    )
    per_conv = pairs.groupBy("conv_id", "conv_cents").agg(
        F.count(F.lit(1)).alias("n_touches")
    )
    credited = pairs.join(
        per_conv.select("conv_id", "n_touches"), "conv_id"
    ).select(
        "touch_type",
        F.expr("1000000 div n_touches").alias("credit_ppm"),
        F.expr("conv_cents div n_touches").alias("cents_share"),
    )
    return credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.sum("credit_ppm").alias("conversions_ppm"),
        F.sum("cents_share").alias("revenue_cents"),
    )


def rfm_scores(
    events: DataFrame,
    user: str = "user_id",
    ts_ms: str = "ts_ms",
    value: str = "value",
) -> DataFrame:
    """RFM segmentation — per user Recency (days since last event),
    Frequency (event count), Monetary (total cents), each scored 1-5
    against the population's exact quintile boundaries, plus the
    concatenated segment label ("555" = best).

    Scale note: scores come from FIVE SCALAR quantile boundaries per
    dimension (one aggregate over the per-user table, broadcast back as
    a literal CASE), NOT from an ntile window — an unpartitioned ntile
    over all users is the one-task trap at corpus scale, and the
    boundary-CASE gives identical quintiles up to boundary ties (<=
    binds ties downward, deterministically). Recency scores INVERT
    (smaller = better) per the classic RFM convention."""
    per_user = events.groupBy(F.col(user).alias("u")).agg(
        F.max(F.expr(f"{ts_ms} div 86400000")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.floor(F.col(value) * 100)).alias("monetary_cents"),
    )
    mx = per_user.agg(F.max("last_day").alias("now_day"))
    base = per_user.crossJoin(F.broadcast(mx)).withColumn(
        "recency_days", F.col("now_day") - F.col("last_day")
    )
    qs = base.agg(
        *[
            F.expr(f"percentile({c}, array(0.2, 0.4, 0.6, 0.8))").alias(f"q_{c}")
            for c in ("recency_days", "frequency", "monetary_cents")
        ]
    )

    def score(col, bounds, invert=False):
        s = (
            F.when(F.col(col) <= bounds[0], 1)
            .when(F.col(col) <= bounds[1], 2)
            .when(F.col(col) <= bounds[2], 3)
            .when(F.col(col) <= bounds[3], 4)
            .otherwise(5)
        )
        return (6 - s) if invert else s

    b = qs.head()

    def bounds(name):
        # empty input: percentile over zero users is NULL — any bounds
        # keep the schema (base has no rows to score), zeros are cheap
        v = b[name] if b is not None else None
        return v if v is not None else [0, 0, 0, 0]

    out = (
        base.withColumn("r_score", score("recency_days", bounds("q_recency_days"), invert=True))
        .withColumn("f_score", score("frequency", bounds("q_frequency")))
        .withColumn("m_score", score("monetary_cents", bounds("q_monetary_cents")))
        .withColumn(
            "segment",
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ),
        )
    )
    return out.select(
        F.col("u").alias(user),
        "recency_days",
        "frequency",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
        "segment",
    )


def point_in_time_features(
    events: DataFrame,
    label_type: str = "purchase",
    window_ms: int = 7 * 86_400_000,
    user: str = "user_id",
    ts_ms: str = "ts_ms",
    value: str = "value",
) -> DataFrame:
    """Point-in-time-correct feature join — the feature-store staple:
    for every label event (one training example per ``label_type``
    occurrence), aggregate the user's behavior STRICTLY BEFORE the label
    timestamp within a trailing window. "Strictly before" is the whole
    point: a feature computed at-or-after the label leaks the future
    into training, the bug PIT joins exist to prevent.

    Emits per example: trailing event count, distinct event types,
    value cents sum, and the recency of the latest prior event — all
    integers, order-free.

    Plan: ONE user-keyed self-join with the time bounds as residual
    predicates (events co-partition by user; cross-user pairs never
    materialize), then one aggregate per example. At 100 TB this is the
    standard two-scan + single-shuffle PIT shape; the window bound keeps
    each example's fan-in to that user's recent activity, so one
    hyperactive user widens its own examples only."""
    labels = events.filter(F.col("event_type") == label_type).select(
        F.col(user).alias("u"),
        F.col("event_id").alias("example_id"),
        F.col(ts_ms).alias("label_ts"),
    )
    hist = events.select(
        F.col(user).alias("u"),
        F.col("event_type").alias("etype"),
        F.col(ts_ms).alias("ev_ts"),
        F.floor(F.col(value) * 100).alias("cents"),
    )
    joined = labels.join(hist, "u").filter(
        (F.col("ev_ts") < F.col("label_ts"))
        & (F.col("ev_ts") >= F.col("label_ts") - window_ms)
    )
    feats = joined.groupBy("u", "example_id", "label_ts").agg(
        F.count(F.lit(1)).alias("n_events_7d"),
        F.countDistinct("etype").alias("n_types_7d"),
        F.sum("cents").alias("cents_7d"),
        (F.col("label_ts") - F.max("ev_ts")).alias("recency_ms"),
    )
    # left join back so zero-history examples keep a row (features 0 /
    # NULL recency) — dropping them would bias the training set toward
    # active users
    return (
        labels.join(feats, ["u", "example_id", "label_ts"], "left")
        .select(
            F.col("u").alias(user),
            "example_id",
            "label_ts",
            F.coalesce("n_events_7d", F.lit(0)).alias("n_events_7d"),
            F.coalesce("n_types_7d", F.lit(0)).alias("n_types_7d"),
            F.coalesce("cents_7d", F.lit(0)).alias("cents_7d"),
            "recency_ms",
        )
    )


def diff_in_diff(
    events: DataFrame,
    treated: "F.Column",
    cutover_ms: int,
    ts_col: str = "ts_ms",
    value_col: str = "value",
) -> DataFrame:
    """Difference-in-differences estimate of an intervention's effect:
    (treated post − treated pre) − (control post − control pre) over
    group means — the first-line causal read on any A/B or staged
    rollout where assignment isn't random but trends are parallel.

    One conditional-aggregate scan collects all four cell sums/counts
    (cents in DECIMAL, order-free); means and the DiD divide the exact
    moments as doubles, rounded to 6. The output carries every cell so
    the parallel-trends sanity check (compare pre-period means) reads
    from the same row. Returns one row:
    (n_*, mean_* for the four cells, did)."""
    dec = "decimal(38,0)"
    cents = F.round(F.col(value_col) * 100).cast("long").cast(dec)
    post = F.col(ts_col) >= cutover_ms
    cells = []
    for label, cond in (
        ("t_pre", treated & ~post),
        ("t_post", treated & post),
        ("c_pre", ~treated & ~post),
        ("c_post", ~treated & post),
    ):
        cells += [
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"n_{label}"),
            F.sum(F.when(cond, cents).otherwise(F.lit(0).cast(dec))).alias(
                f"s_{label}"
            ),
        ]
    agg = events.agg(*cells)

    def mean(label: str):
        # an empty cell (e.g. nothing pre-cutover) has no mean — NULL
        # cell mean and NULL did, never an ANSI divide error
        return F.when(
            F.col(f"n_{label}") > 0,
            F.col(f"s_{label}").cast("double") / F.col(f"n_{label}") / 100.0,
        )

    did = (mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre"))
    return agg.select(
        *[F.col(f"n_{lb}") for lb in ("t_pre", "t_post", "c_pre", "c_post")],
        *[F.round(mean(lb), 6).alias(f"mean_{lb}") for lb in ("t_pre", "t_post", "c_pre", "c_post")],
        F.round(did, 6).alias("did"),
    )


def km_survival(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
) -> DataFrame:
    """Kaplan-Meier churn survival curve at day granularity: a user's
    last-activity day is their churn event (no censoring in a closed
    observation window — the final day's survivors all "die", which the
    curve shows honestly as S -> 0). Per day t: d_t users churn,
    n_t = users still active at t (suffix sum of the churn counts), and
    S(t) = Π_{s<=t} (1 - d_s/n_s) — retention's statistical twin, on
    one aggregate per user plus windows over the DAY GRID (bounded by
    the observation span, the ks_test/emd contract, never by users).

    The cumulative product is evaluated as an explicit left-to-right
    fold over the day-ordered factor array (collect_list window +
    F.aggregate), each factor pre-rounded to 12 dp — a deterministic
    multiply chain any SQL engine replays exactly (list_reduce), where
    exp(Σ ln) would tie the hash to libm."""
    from pyspark.sql.window import Window

    last_day = events.groupBy(F.col(user_col).alias("u")).agg(
        F.max(F.expr(f"{ts_col} div 86400000")).alias("day")
    )
    deaths = last_day.groupBy("day").agg(F.count(F.lit(1)).alias("churned"))
    w_risk = Window.orderBy(F.col("day").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = deaths.withColumn("n_at_risk", F.sum("churned").over(w_risk))
    factor = F.round(
        F.lit(1.0) - F.col("churned") / F.col("n_at_risk"), 12
    )
    w_surv = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        at_risk.withColumn("_factors", F.collect_list(factor).over(w_surv))
        .select(
            "day",
            "churned",
            "n_at_risk",
            F.round(
                F.aggregate(
                    "_factors",
                    F.lit(1.0),
                    lambda acc, x: acc * x,
                ),
                6,
            ).alias("survival"),
        )
    )


def cusum_changepoint(
    events: DataFrame,
    target_mean: float,
    slack: float,
    threshold: float,
    ts_col: str = "ts_ms",
    value_col: str = "value",
) -> DataFrame:
    """One-sided CUSUM drift detector over the hourly mean series:
    S_t = max(0, S_{t-1} + (x̄_t − target_mean − slack)) — the classic
    sequential changepoint statistic that accumulates small persistent
    upward shifts a per-point z-score never trips. Rows where
    S_t > threshold are flagged; the first flagged hour is the detected
    changepoint.

    The recursion runs over the HOURLY grid (bounded by the observation
    span — the km_survival/ks_test window contract), evaluated as an
    explicit hour-ordered fold of 6-dp-rounded hourly means (the
    deterministic-chain discipline: any SQL engine replays the same
    max/add sequence with list_reduce; hourly means pin to 6 dp first
    so the chain's inputs are bit-identical)."""
    from pyspark.sql.window import Window

    hours = (
        events.select(
            F.expr(f"{ts_col} div 3600000").alias("hour"),
            F.col(value_col).cast("double").alias("v"),
        )
        .groupBy("hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("v").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("hour_mean"),
        )
    )
    drift = F.round(F.col("hour_mean") - target_mean - slack, 6)
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return (
        hours.withColumn("_drifts", F.collect_list(drift).over(w))
        .select(
            "hour",
            "n",
            "hour_mean",
            F.round(
                F.aggregate(
                    "_drifts",
                    F.lit(0.0),
                    lambda acc, x: F.greatest(F.lit(0.0), acc + x),
                ),
                6,
            ).alias("cusum"),
        )
        .withColumn("flagged", F.col("cusum") > threshold)
    )


def entropy_rate(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts_us",
    event_type: str = "event_type",
) -> DataFrame:
    """Entropy rate of the first-order behavior Markov chain — how
    predictable the NEXT event is given the current one, in nats:
    per state s the conditional entropy H_s = Σ_t (n_st/n_s)·ln(n_s/n_st),
    and the TOTAL row's rate H = Σ_s (n_s/N)·H_s. The compressibility /
    bot-detection readout that completes the transition family:
    event_transitions gives the matrix, markov_stationary its long-run
    mix, session_entropy the per-user marginal — this is the chain's
    intrinsic unpredictability (0 = deterministic flows).

    Everything past the one (user)-windowed transition build runs on
    the |types|² matrix; entropy terms quantize to 9-dp DECIMAL so the
    sums are order-free."""
    tm = event_transitions(events, user, ts, event_type).select(
        "from_type", "to_type", "cnt"
    )
    # |types|^2 matrix feeds n_s, the term table, and the totals
    tm = tm.localCheckpoint(eager=False)
    ns = tm.groupBy("from_type").agg(F.sum("cnt").alias("n_out"))
    terms = tm.join(F.broadcast(ns), "from_type").select(
        "from_type",
        "n_out",
        F.round(
            (F.col("cnt").cast("double") / F.col("n_out"))
            * F.log(F.col("n_out").cast("double") / F.col("cnt")),
            9,
        )
        .cast("decimal(28,9)")
        .alias("_t"),
    )
    per_state = terms.groupBy("from_type", "n_out").agg(F.sum("_t").alias("_h"))
    per_state = per_state.localCheckpoint(eager=False)
    tot_n = per_state.agg(F.sum("n_out").alias("_N"))
    states = per_state.crossJoin(F.broadcast(tot_n)).select(
        "from_type",
        F.col("n_out"),
        F.round(F.col("n_out").cast("double") / F.col("_N"), 6).alias("share"),
        F.round(F.col("_h").cast("double"), 6).alias("h_nats"),
    )
    rate_terms = per_state.crossJoin(F.broadcast(tot_n)).select(
        F.col("_N"),
        F.round(
            (F.col("n_out").cast("double") / F.col("_N"))
            * F.col("_h").cast("double"),
            9,
        )
        .cast("decimal(28,9)")
        .alias("_rt"),
    )
    total = rate_terms.groupBy("_N").agg(F.sum("_rt").alias("_rate")).select(
        F.lit("TOTAL").alias("from_type"),
        F.col("_N").alias("n_out"),
        F.lit(1.0).alias("share"),
        F.round(F.col("_rate").cast("double"), 6).alias("h_nats"),
    )
    return states.unionByName(total)


def freshness_half_life(
    events: DataFrame,
    ts_col: str = "ts_ms",
) -> DataFrame:
    """Engagement half-life from an exponential decay fit — the number
    that prices DATA FRESHNESS for a training mixture (time_decay
    applies a chosen λ; this measures the corpus's OWN λ): regress
    ln(daily event count) on age-in-days, slope < 0 ⇒ half-life =
    ln 2 / (−slope) days; a 10-day half-life and a 300-day one demand
    very different recency weighting.

    One daily-count aggregate (the corpus pass), a broadcast max-ts
    scalar, then exact DECIMAL moments of 9-dp-quantized ln(counts)
    over the bounded age grid — the trend_by_group discipline. Returns
    one row: n_days, slope, intercept, half_life_days (NULL when the
    series doesn't decay)."""
    import math

    mx = events.agg(F.max(F.expr(f"{ts_col} div 86400000")).alias("_mx"))
    daily = (
        events.select(F.expr(f"{ts_col} div 86400000").alias("_d"))
        .groupBy("_d")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    aged = daily.crossJoin(F.broadcast(mx)).select(
        (F.col("_mx") - F.col("_d")).alias("age"),
        F.round(F.log(F.col("c").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("y"),
    )
    m = aged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("age").cast("decimal(38,0)")).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(
            (F.col("age") * F.col("y")).cast("decimal(38,9)")
        ).alias("sxy"),
        F.sum(
            (F.col("age").cast("decimal(38,0)") * F.col("age")).cast(
                "decimal(38,0)"
            )
        ).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    # a single observed day has zero age spread (n·sxx − sx² = 0): the
    # regression is undefined — NULL slope/intercept/half-life
    slope = F.when(n * sxx - sx * sx != 0, (n * sxy - sx * sy) / (n * sxx - sx * sx))
    intercept = F.when(F.col("n") >= 1, sy / n - slope * (sx / n))
    return m.select(
        F.col("n").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.when(
            F.round(slope, 6) < 0,
            F.round(F.lit(math.log(2)) / -slope, 6),
        ).alias("half_life_days"),
    )
