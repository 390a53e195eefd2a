"""CLI entry point (__main__.py — ApplicationMain/WebServerMain analog):
properties parsing, one-shot query, sweep, and an HTTP round-trip
against a served engine."""

from __future__ import annotations

import http.client
import io
import sys

from nnanalytics_spark import __main__ as cli
from nnanalytics_spark.inode import fixture


def _inode_parquet(spark, tmp_path):
    p = str(tmp_path / "inodes.parquet")
    pdf = fixture.generate_pandas(levels=1, dirs_per_level=2, files_per_dir=6)
    spark.createDataFrame(pdf, schema=fixture.SCHEMA).write.parquet(p)
    return p


def test_read_properties(tmp_path):
    f = tmp_path / "app.properties"
    f.write_text("# comment\nnna.port = 9911\nauthorization.enable=true\n\n")
    props = cli._read_properties(str(f))
    assert props == {"nna.port": "9911", "authorization.enable": "true"}


def test_cli_query_prints_csv(spark, tmp_path, capsys):
    src = _inode_parquet(spark, tmp_path)
    rc = cli.main(
        ["query", "--source", src, "/histogram?set=files&type=user&sum=count"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    lines = [ln for ln in out.strip().splitlines() if ln]
    assert lines[0].split(",")[0] == "user" and len(lines) > 1


def test_cli_sweep_writes_reports(spark, tmp_path, capsys):
    src = _inode_parquet(spark, tmp_path)
    out_dir = str(tmp_path / "sweeps")
    rc = cli.main(["sweep", "--source", src, "--out", out_dir])
    assert rc == 0
    assert "sweep wrote" in capsys.readouterr().out
    import os

    assert os.path.isdir(out_dir)


def test_cli_serve_http_roundtrip(spark, tmp_path, monkeypatch):
    src = _inode_parquet(spark, tmp_path)
    # run serve but capture the server instead of blocking forever
    import nnanalytics_spark.web.server as websrv

    started = {}
    real_start = websrv.AnalyticsWebServer.start

    def capture_start(self):
        port = real_start(self)
        started["server"], started["port"] = self, port
        return port

    def probe_then_stop(_seconds):
        # runs inside serve's sleep loop — the server is live here
        srv, port = started["server"], started["port"]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/filter?set=files&filters=fileSize:gte:0&sum=count")
        resp = conn.getresponse()
        started["status"], started["body"] = resp.status, resp.read().decode()
        conn.close()
        raise KeyboardInterrupt  # serve's documented shutdown path

    monkeypatch.setattr(websrv.AnalyticsWebServer, "start", capture_start)
    monkeypatch.setattr(cli.time, "sleep", probe_then_stop)
    f = tmp_path / "app.properties"
    f.write_text("nna.port=0\n")
    rc = cli.main(["serve", "--source", src, "--conf", str(f)])
    assert rc == 0
    assert started["status"] == 200 and started["body"].strip().isdigit()


def test_nested_get_spark_preserves_host_session_conf(spark):
    # the CLI (and any library code) calling get_spark() inside a process
    # that already has a session must NOT clobber that session's runtime
    # conf — getOrCreate applies builder configs to existing sessions, so
    # get_spark returns the active session untouched instead
    from nnanalytics_spark.session import get_spark

    before = spark.conf.get("spark.sql.shuffle.partitions")
    s2 = get_spark("nested-should-reuse")
    assert s2 is spark
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
