"""Stateful streaming sessionization: state carries across micro-batches."""

from __future__ import annotations

import pandas as pd

from nnanalytics_spark.streaming import stateful

GAP = stateful.GAP_MS


def test_stateful_sessionization_across_batches(spark, tmp_path):
    src = str(tmp_path / "stream")
    base = 1_700_000_000_000

    def write_batch(rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts_ms"])
        spark.createDataFrame(pdf.astype("int64")).write.mode("append").parquet(src)

    # batch 1: user 1 → two events 1 min apart (1 session); user 2 → one
    write_batch([(1, base), (1, base + 60_000), (2, base)])

    stream = spark.readStream.schema("user_id long, ts_ms long").parquet(src)
    out = stateful.sessionize_stream(stream)
    q = out.writeStream.outputMode("update").format("memory").queryName("sess").start()
    try:
        q.processAllAvailable()
        got = {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in spark.sql(
                "SELECT * FROM (SELECT *, row_number() OVER "
                "(PARTITION BY user_id ORDER BY n_events DESC) rn FROM sess) WHERE rn=1"
            ).collect()
        }
        assert got[1] == (1, 2)
        assert got[2] == (1, 1)

        # batch 2: user 1 comes back after > gap → second session;
        # user 2 within gap → still one session
        write_batch([(1, base + GAP + 120_000), (2, base + 60_000)])
        q.processAllAvailable()
        got = {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in spark.sql(
                "SELECT * FROM (SELECT *, row_number() OVER "
                "(PARTITION BY user_id ORDER BY n_events DESC) rn FROM sess) WHERE rn=1"
            ).collect()
        }
        assert got[1] == (2, 3)  # state survived the batch boundary
        assert got[2] == (1, 2)
    finally:
        q.stop()
