"""Email report sink (inode/mail.py — MailOutput.java analog): condition
grammar, highlight accumulation, HTML rendering, MIME assembly, and the
web-layer integration with an injected transport."""

from __future__ import annotations

import http.client

import pytest

from nnanalytics_spark.inode import mail


def test_check_scalar_or_folds_and_raises():
    mail.check_scalar("gt:100", 101)
    mail.check_scalar("lt:5;gt:100", 101)  # OR across conditions
    with pytest.raises(mail.EmailConditionError):
        mail.check_scalar("gt:100", 100)


def test_check_histogram_highlights_passing_keys():
    hist = {"a": 5, "b": 500, "c": 1000}
    assert mail.check_histogram("gte:500", hist) == {"b", "c"}
    with pytest.raises(mail.EmailConditionError):
        mail.check_histogram("gt:10000", hist)


def test_histogram_html_matches_reference_format():
    hist = {"userA": 7, "userB": 9}
    html = mail.histogram_to_html(hist, {"userB"})
    assert html == "userA=7<br /><b>userB=9</b><br />"


def test_build_message_headers_and_html_part():
    msg = mail.build_message(
        "NNA alert", "<b>x=1</b>", "from@x", ["to1@x", "to2@x"], ["cc@x"]
    )
    assert msg["Subject"] == "NNA alert"
    assert msg["To"] == "to1@x, to2@x" and msg["Cc"] == "cc@x"
    body = msg.get_payload()[0]
    assert body.get_content_type() == "text/html"
    assert body.get_payload() == "<b>x=1</b>"


def test_write_uses_injected_transport():
    sent = []
    mail.write(
        subject="s",
        histogram={"k": 1},
        highlight_keys=set(),
        email_to=["a@x"],
        email_from="f@x",
        email_cc=["c@x"],
        transport=lambda msg, frm, rcpt: sent.append((frm, tuple(rcpt))),
    )
    assert sent == [("f@x", ("a@x", "c@x"))]


def test_web_histogram_email_leg(engine):
    from nnanalytics_spark.web.server import AnalyticsWebServer
    from nnanalytics_spark.inode import fixture

    sent = []
    srv = AnalyticsWebServer(
        engine,
        now_ms=fixture.NOW_MS,
        mail_transport=lambda msg, frm, rcpt: sent.append((msg, frm, rcpt)),
    )
    port = srv.start()
    try:
        def get(path):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            conn.request("GET", path)
            resp = conn.getresponse()
            out = (resp.status, resp.read().decode())
            conn.close()
            return out

        # count-per-user histogram; gt:0 passes for every key -> email sent
        status, body = get(
            "/histogram?set=files&type=user&sum=count"
            "&emailTo=ops@x&emailConditions=gt:0&emailFrom=nna@x"
        )
        assert status == 200 and sent
        msg, frm, rcpt = sent[-1]
        assert frm == "nna@x" and rcpt == ["ops@x"]
        assert msg["Subject"] == "NNAnalytics - histogram"
        assert "<b>" in msg.get_payload()[0].get_payload()
        # impossible condition -> response still 200, no email
        n = len(sent)
        status, _ = get(
            "/histogram?set=files&type=user&sum=count"
            "&emailTo=ops@x&emailConditions=gt:999999999"
        )
        assert status == 200 and len(sent) == n
    finally:
        srv.stop()
