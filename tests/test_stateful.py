"""Stateful streaming sessionization: state carries across micro-batches."""

from __future__ import annotations

import pandas as pd

from nnanalytics_spark.streaming import stateful

GAP = stateful.SESSION_GAP_MS


def test_merge_bridging_event_collapses_sessions():
    # two sessions separated by > gap ...
    iv = stateful._merge([], 0, GAP)
    iv = stateful._merge(iv, 60_000, GAP)
    iv = stateful._merge(iv, GAP + 120_000, GAP)
    assert len(iv) // 2 == 2
    # ... collapse into one when a late event lands within gap of BOTH
    iv = stateful._merge(iv, GAP, GAP)
    assert iv == [0, GAP + 120_000]


def test_merge_is_order_insensitive():
    import itertools

    times = [0, 60_000, GAP + 120_000, 3 * GAP, 3 * GAP + 5]
    expected = None
    for perm in itertools.permutations(times):
        iv: list[int] = []
        for ts in perm:
            iv = stateful._merge(iv, ts, GAP)
        if expected is None:
            expected = iv
        assert iv == expected
    assert expected is not None and len(expected) // 2 == 3


def test_stateful_sessionization_across_batches(spark, tmp_path):
    src = str(tmp_path / "stream")
    base = 1_700_000_000_000

    def write_batch(rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts_ms"])
        spark.createDataFrame(pdf.astype("int64")).write.mode("append").parquet(src)

    # batch 1: user 1 → two events 1 min apart (1 session); user 2 → one
    write_batch([(1, base), (1, base + 60_000), (2, base)])

    stream = spark.readStream.schema("user_id long, ts_ms long").parquet(src)
    out = stateful.streaming_sessionization(stream)

    latest: dict[int, int] = {}

    def sink(df, _epoch):
        for r in df.collect():
            latest[r["user_id"]] = r["n_sessions"]

    q = out.writeStream.outputMode("update").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        assert latest == {1: 1, 2: 1}

        # batch 2: user 1 comes back after > gap → second session;
        # user 2 within gap → still one session
        write_batch([(1, base + GAP + 120_000), (2, base + 60_000)])
        q.processAllAvailable()
        assert latest == {1: 2, 2: 1}  # state survived the batch boundary

        # batch 3: a LATE event for user 1 lands within gap of both open
        # sessions → they merge back into one (interval-state exactness)
        write_batch([(1, base + GAP)])
        q.processAllAvailable()
        assert latest == {1: 1, 2: 1}
    finally:
        q.stop()
