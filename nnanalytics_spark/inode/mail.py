"""Email report sink — the analog of the reference's MailOutput
(analytics/MailOutput.java:39-214): conditional alert emails carrying a
histogram result as HTML, with keys that tripped the condition bolded.

Spark-first shape: the histogram arriving here is the ALREADY-aggregated
result of a /histogram query (a handful of rows on the driver — the
reference holds the same Map<String, Long>), so everything in this module
is driver-side formatting. The one external effect — SMTP — is an
injectable transport so the sink is testable without a network and
deployable with whatever relay the site runs; the default transport uses
the standard library's smtplib at send time only.

Semantics mirrored from the reference:

- ``create_comparisons`` — ``op:value`` conditions split on ';', the
  long-op vocabulary (eq/notEq/lt/lte/gt/gte — AbstractQueryEngine
  .java:1086-1104 over getFilterFunctionForLong).
- ``check_scalar`` — ANY condition passing means "send"; failure raises
  (MailOutput.check, :52-60 — the reference throws IOException).
- ``check_histogram`` — per-key check; keys that pass accumulate into
  the highlight set; no key passing raises (:71-90).
- ``histogram_to_html`` — ``key=value<br />`` lines, highlighted keys
  bolded, insertion order preserved (:195-214).
- ``build_message`` — multipart MIME with one text/html body part,
  From/To/Cc/Subject headers (:133-193).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText

_OPS: dict[str, Callable[[int, int], bool]] = {
    "eq": lambda a, b: a == b,
    "notEq": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
}


class EmailConditionError(ValueError):
    """Raised when a result does not meet the email conditions (the
    reference signals this with IOException — callers treat it as
    'no email sent')."""


def create_comparisons(conditions_str: str) -> list[Callable[[int], bool]]:
    out: list[Callable[[int], bool]] = []
    for cond in conditions_str.split(";"):
        op, raw = cond.split(":", 1)
        if op not in _OPS:
            raise ValueError(f"unsupported email condition op: {op}")
        threshold = int(raw)
        out.append(lambda v, f=_OPS[op], t=threshold: f(v, t))
    return out


def check_scalar(conditions_str: str, value: int) -> None:
    """Raise EmailConditionError unless ANY condition passes for the
    scalar (the reference's QueryEngine.check OR-folds)."""
    if not any(c(value) for c in create_comparisons(conditions_str)):
        raise EmailConditionError("Failed to meet requirements for email.")


def check_histogram(
    conditions_str: str, histogram: Mapping[str, int]
) -> set[str]:
    """Return the set of histogram keys whose value passes any condition;
    raise EmailConditionError when none do."""
    comparisons = create_comparisons(conditions_str)
    highlight = {
        k for k, v in histogram.items() if any(c(v) for c in comparisons)
    }
    if not highlight:
        raise EmailConditionError("Failed to meet requirements for email.")
    return highlight


def histogram_to_html(
    histogram: Mapping[str, int], highlight_keys: Iterable[str] = ()
) -> str:
    hl = set(highlight_keys)
    parts: list[str] = []
    for k, v in histogram.items():
        line = f"{k}={v}"
        parts.append(f"<b>{line}</b><br />" if k in hl else f"{line}<br />")
    return "".join(parts)


def build_message(
    subject: str,
    html: str,
    email_from: str,
    email_to: list[str],
    email_cc: list[str] | None = None,
) -> MIMEMultipart:
    msg = MIMEMultipart()
    msg["From"] = email_from
    msg["To"] = ", ".join(email_to)
    if email_cc:
        msg["Cc"] = ", ".join(email_cc)
    msg["Subject"] = subject
    msg.attach(MIMEText(html, "html"))
    return msg


def smtp_transport(host: str):
    """Default transport factory: returns a sender backed by smtplib.
    Deferred import + per-call connection — nothing network-facing runs
    until a send is actually requested."""

    def send(msg: MIMEMultipart, email_from: str, rcpt: list[str]) -> None:
        import smtplib

        with smtplib.SMTP(host) as smtp:
            smtp.sendmail(email_from, rcpt, msg.as_string())

    return send


def write(
    subject: str,
    histogram: Mapping[str, int],
    highlight_keys: Iterable[str],
    email_to: list[str],
    email_from: str,
    email_cc: list[str] | None = None,
    transport: Callable[[MIMEMultipart, str, list[str]], None] | None = None,
    mail_host: str = "localhost",
) -> MIMEMultipart:
    """Render the histogram and hand the message to the transport
    (MailOutput.write, :104-120). Returns the built message so callers
    (and tests) can inspect exactly what was sent."""
    html = histogram_to_html(histogram, highlight_keys)
    msg = build_message(subject, html, email_from, email_to, email_cc)
    sender = transport if transport is not None else smtp_transport(mail_host)
    sender(msg, email_from, list(email_to) + list(email_cc or []))
    return msg
