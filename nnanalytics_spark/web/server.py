"""HTTP serving layer — the reference's REST surface over the engine.

The reference's public face is an embedded web server
(WebServerMain.java:301-2102, NamenodeAnalyticsMethods.java:126-2526);
this module is its Spark-native analog: a stdlib ThreadingHTTPServer
binding the URL contract (core/url.py) to INodeEngine / suggestions /
SQL dialect / QueryGuard, with the reference's response conventions:

- analytic endpoints (/filter /histogram /histogram2 /histogram3
  /divide) parse the reference query-string grammar; scalar results
  render text/plain (the reference writes the long straight into the
  body), histograms render JSON / CSV / Chart.js per histogramOutput
  (NamenodeAnalyticsMethods.java:1617-1639);
- discovery endpoints (/endpoints /sets /filters /filterOps /sums
  /finds /histograms /transforms) return JSON lists from the validity
  matrices (Constants.java enums via inode/columns.py);
- admin endpoints /info /metrics /loadingStatus /queryGuard /refresh;
  suggestion readers /users /fileAge /fileTypes /quotas /directories
  /top /bottom; point lookups /dump /contentSummary; POST /sql runs
  the dialect;
- authorization fronts every request through core.authz.Authorizer
  (403 on denial, like the reference's SecurityContext). Pass a
  core.authn.SecurityManager to enable the reference's authentication
  stack (SecurityContext.java): /login issues HS256 JWTs against the
  local password set and/or LDAP DN-template binds, requests present
  Basic / Bearer / the nna-jwt-token cookie, /logout revokes. Without
  one, identity is taken from the X-NNA-User header (documented
  stand-in — wire an authenticating proxy in front) and /credentials
  reports the resolved access levels;
- malformed queries → 400 with the error message, unknown paths → 404,
  handler crashes → 500. Response bodies for errors are text/plain,
  matching the reference's MalformedURLException handler
  (NamenodeAnalyticsMethods.java:2479-2526).

Spark sessions are thread-safe for concurrent job submission, so the
threaded server maps straight onto Spark's scheduler; pair with
QueryGuard fair pools for admission control at scale.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

from pyspark.sql import functions as F

from nnanalytics_spark.core import url as urlmod
from nnanalytics_spark.core.authn import AuthenticationError, SecurityManager
from nnanalytics_spark.core.authz import AuthorizationError, Authorizer
from nnanalytics_spark.core.filters import (
    AGO_OPS,
    BOOL_OPS,
    DATE_OPS,
    LONG_OPS,
    OLDER_OPS,
    STRING_OPS,
)
from nnanalytics_spark.inode import columns as reg
from nnanalytics_spark.inode import render, suggestions
from nnanalytics_spark.sql import dialect

_HISTOGRAM_OUTPUTS = ("json", "csv", "chart")

_DISCOVERY = {
    "endpoints": lambda: sorted(
        set(urlmod.ENDPOINTS)
        | {
            "contentSummary", "info", "metrics", "loadingStatus", "users",
            "fileAge", "fileTypes", "quotas", "directories", "top", "bottom",
            "suggestions", "queryGuard", "refresh", "sql", "credentials",
            "submitOperation", "listOperations", "abortOperation",
            "setCachedQuery", "removeCachedQuery", "getCachedQuery",
            "cachedMaps", "history", "saveNamespace", "token", "operations",
        }
    ),
    "operations": lambda: list(_SUPPORTED_OPS()),
    "sets": lambda: list(reg.SETS),
    "filters": lambda: sorted(reg.FILTER_FILE | reg.FILTER_DIR),
    "filterOps": lambda: sorted(LONG_OPS | AGO_OPS | OLDER_OPS | STRING_OPS | DATE_OPS | BOOL_OPS),
    "sums": lambda: sorted(reg.SUM_FILE | reg.SUM_DIR),
    "finds": lambda: sorted(reg.FIND_FILE | reg.FIND_DIR),
    "histograms": lambda: sorted(reg.TYPE_FILE | reg.TYPE_DIR),
    "transforms": lambda: ["fileReplica"],
    "histogramOutputs": lambda: list(_HISTOGRAM_OUTPUTS),
}


class AnalyticsWebServer:
    """Bind an INodeEngine (plus optional collaborators) to HTTP.

    ``start()`` returns the bound port (pass port=0 for an ephemeral
    one); ``stop()`` shuts the listener down. ``now_ms`` pins the clock
    for every parsed query, keeping relative-time filters deterministic
    under test (Query.now_ms contract, core/ir.py)."""

    def __init__(
        self,
        engine,
        *,
        authorizer: Authorizer | None = None,
        security: SecurityManager | None = None,
        snapshot=None,  # streaming.refresh.SnapshotTable, for /refresh
        guard=None,  # core.admission.QueryGuard, for /queryGuard
        now_ms: int | None = None,
        save_dir: str | None = None,  # /saveNamespace target
        suggestions_dir: str | None = None,  # /history sweep archive
        log_file: str | None = None,  # /log tail target
        mail_transport=None,  # inode.mail transport: (msg, from, rcpt) -> None
        host: str = "127.0.0.1",
        port: int = 0,
        max_dump_rows: int | None = 10_000_000,  # path-dump safety cap
    ) -> None:
        from nnanalytics_spark.inode.operations import OperationRegistry
        from nnanalytics_spark.inode.suggestions import CachedQueryRegistry

        self.engine = engine
        self.authorizer = authorizer or Authorizer(enabled=False)
        self.security = security
        self.snapshot = snapshot
        self.guard = guard
        self.now_ms = now_ms
        self.save_dir = save_dir
        self.suggestions_dir = suggestions_dir
        self.log_file = log_file
        from nnanalytics_spark.core.usage import UsageTracker

        self.operations = OperationRegistry()
        self.cached_queries = CachedQueryRegistry()
        self.mail_transport = mail_transport
        self.max_dump_rows = max_dump_rows
        self.usage = UsageTracker()
        self._address = (host, port)
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------ lifecycle
    def start(self) -> int:
        handler = _make_handler(self)
        self._httpd = ThreadingHTTPServer(self._address, handler)
        self._httpd.daemon_threads = True
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True, name="nna-web"
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    # ------------------------------------------------------------ dispatch
    def handle(self, method: str, path: str, query: str, body: str, user: str,
               headers: dict | None = None):
        """Route one request → (status, content_type, body_str[, extra
        response headers]). With a SecurityManager configured and
        enabled, identity comes from authentication (Basic / Bearer /
        nna-jwt-token cookie — SecurityContext.java:296-380) instead of
        the X-NNA-User stand-in, /login issues tokens and /logout
        revokes them; with auth disabled, the reference's ``proxy``
        parameter may override identity (SecurityContext.java:152-157)."""
        endpoint = path.strip("/").split("/")[-1] or "info"
        params = parse_qs(query, keep_blank_values=True)
        headers = headers or {}
        client_ip = headers.get("client_ip") or "unknown"
        if self.security is not None and self.security.authentication_enabled:
            outcome = self._authenticate(endpoint, params, body, headers)
            if not isinstance(outcome, str):
                return outcome  # login/logout response or 401
            user = outcome
        elif self.security is not None:
            user = _one(params, "proxy") or user
        try:
            self.authorizer.check(user, endpoint)
        except AuthorizationError as exc:
            return 403, "text/plain", str(exc)
        # usage accounting (UserMetrics.java): analytic traffic counts as
        # queries; /login /logout are tracked at their auth handlers
        if endpoint in urlmod.ENDPOINTS or endpoint == "sql":
            self.usage.queried(user, client_ip)
        try:
            return self._route(method, endpoint, path, query, params, body, user)
        except (ValueError, KeyError, dialect.UnsupportedSqlError) as exc:
            return 400, "text/plain", f"{type(exc).__name__}: {exc}"

    # ------------------------------------------------------- authentication
    @staticmethod
    def _cookie_token(headers: dict) -> str | None:
        """Extract nna-jwt-token from a Cookie header (the reference's
        cookie name, SecurityContext.java:210)."""
        for part in (headers.get("cookie") or "").split(";"):
            name, _, value = part.strip().partition("=")
            if name == "nna-jwt-token" and value:
                return value
        return None

    def _authenticate(self, endpoint, params, body, headers):
        """Returns the authenticated username, or a full response tuple
        for /login, /logout and authentication failures (401)."""
        token = self._cookie_token(headers)
        auth_header = headers.get("authorization")
        if endpoint == "login":
            form = parse_qs(body, keep_blank_values=True)
            username = _one(params, "username") or _one(form, "username")
            password = _one(params, "password") or _one(form, "password")
            try:
                issued = self.security.login(username, password)
            except AuthenticationError as exc:
                return 401, "text/plain", str(exc)
            self.usage.logged_in(username, headers.get("client_ip") or "unknown")
            return (
                200,
                "application/json",
                json.dumps({"user": username, "token": issued}),
                {"Set-Cookie": f"nna-jwt-token={issued}"},
            )
        if endpoint == "logout":
            bearer = (auth_header or "")
            if bearer.startswith("Bearer "):
                token = bearer[len("Bearer "):].strip()
            try:
                whom = self.security.resolve(None, token)
            except AuthenticationError:
                whom = "unknown"
            if self.security.logout(token):
                self.usage.logged_out(whom, headers.get("client_ip") or "unknown")
                return (
                    200,
                    "text/plain",
                    "You have been logged out.",
                    {"Set-Cookie": "nna-jwt-token=; Max-Age=0"},
                )
            return 400, "text/plain", "No login session."
        try:
            return self.security.resolve(auth_header, token)
        except AuthenticationError as exc:
            return 401, "text/plain", str(exc)

    def _route(self, method, endpoint, path, query, params, body, user):
        if endpoint in _DISCOVERY:
            return 200, "application/json", json.dumps(_DISCOVERY[endpoint]())
        if endpoint == "credentials":
            return 200, "application/json", json.dumps(self.authorizer.access_levels(user))
        if endpoint in ("info", "loadingStatus"):
            return 200, "application/json", json.dumps(self.engine.info())
        if endpoint == "metrics":
            payload = dict(self.engine.metrics())
            payload["users"] = self.usage.format_for_json()
            return 200, "application/json", json.dumps(payload)
        if endpoint == "dump":
            inode_path = _one(params, "path")
            if not inode_path:
                raise ValueError("/dump requires ?path=")
            return 200, "application/json", json.dumps(self.engine.dump_inode(inode_path), default=str)
        if endpoint == "contentSummary":
            inode_path = _one(params, "path")
            if not inode_path:
                raise ValueError("/contentSummary requires ?path=")
            rows = self.engine.content_summary(inode_path).collect()
            payload = rows[0].asDict() if rows else {}
            return 200, "application/json", json.dumps(payload, default=str)
        if endpoint == "users":
            return 200, "application/json", json.dumps(suggestions.users(self.engine.inodes))
        if endpoint in ("fileAge", "fileTypes", "quotas", "directories", "top", "bottom"):
            return self._suggestion(endpoint, params)
        if endpoint == "queryGuard":
            active = self.guard.active_queries() if self.guard else {}
            return 200, "application/json", json.dumps(active)
        if endpoint == "refresh":
            if self.snapshot is None:
                raise ValueError("no refreshable snapshot configured")
            self.snapshot.refresh()
            self.engine.inodes = self.snapshot.df
            return 200, "application/json", json.dumps({"version": self.snapshot.version})
        if endpoint == "sql":
            statement = _one(params, "sqlStatement") or body
            if not statement:
                raise ValueError("/sql requires a sqlStatement parameter or body")
            # request-scoped SqlSession: the reference builds a fresh
            # SqlParser per /sql request (WebServerMain.java), so SET
            # knobs apply only to later statements in the SAME request
            # ("SET ...; SELECT ...") — a server-global session would
            # let one client silently change every other client's
            # parentDirDepth/timeRange
            result = dialect.execute_statements(statement, self.engine)
            if isinstance(result, list):
                return 200, "application/json", json.dumps(result)
            return 200, "text/plain", render.to_csv(result, header=True)
        if endpoint in ("submitOperation", "listOperations", "abortOperation"):
            return self._operations(endpoint, params)
        if endpoint in ("setCachedQuery", "removeCachedQuery", "getCachedQuery", "cachedMaps"):
            return self._cached(endpoint, params)
        if endpoint == "suggestions":
            # the reference's one-shot suggestions JSON: every file + dir
            # scalar from the battery, one shared scan each
            now = self.now_ms or _wall_ms()
            merged = {}
            for name, live in (
                ("fileScalars", lambda: suggestions.file_scalars(self.engine.inodes, now)),
                ("dirScalars", lambda: suggestions.dir_scalars(self.engine.inodes, now)),
            ):
                df = self._sweep_cache(name, now_ms=now)
                if df is None:
                    df = live()
                merged.update(df.collect()[0].asDict())
            return 200, "application/json", json.dumps(merged, default=str)
        if endpoint == "history":
            if not self.suggestions_dir:
                raise ValueError("no suggestions history directory configured")
            spark = self.engine.inodes.sparkSession
            hist = spark.read.parquet(f"{self.suggestions_dir}/history")
            return 200, "application/json", hist.toPandas().to_json(orient="records")
        if endpoint == "saveNamespace":
            if not self.save_dir:
                raise ValueError("no saveNamespace directory configured")
            from nnanalytics_spark.sources.layout import write_inode_table

            write_inode_table(self.engine.inodes, self.save_dir)
            return 200, "text/plain", "Saving namespace."
        if endpoint == "token":
            return 200, "application/json", json.dumps(
                {"user": user, "accessLevels": self.authorizer.access_levels(user)}
            )
        if endpoint in ("threads", "system", "config", "log", "drop", "truncate"):
            return self._admin_tail(endpoint, params)
        if endpoint in urlmod.ENDPOINTS:
            return self._analytic(endpoint, path, query, params)
        return 404, "text/plain", f"unknown endpoint: /{endpoint}"

    def _admin_tail(self, endpoint, params):
        """Ops-surface tail (Constants.java:298-362 endpoint enum;
        handlers NamenodeAnalyticsMethods.java /threads /system /config
        /log /drop /truncate). Spark-native analogs: the thread dump adds
        the Spark scheduler's view (active jobs/stages), /system reports
        host + session resources, /config serves the live Spark conf,
        /drop and /truncate manage the engine's registered views and the
        sweep-history archive (the embedded-DB tables of the reference).
        All six sit in the ADMIN class of the authz matrix except
        /config (cache-reader, like the reference)."""
        spark = self.engine.inodes.sparkSession
        if endpoint == "threads":
            tracker = spark.sparkContext.statusTracker()
            return 200, "application/json", json.dumps(
                {
                    "threads": [
                        {"name": t.name, "daemon": t.daemon, "alive": t.is_alive()}
                        for t in threading.enumerate()
                    ],
                    "activeJobs": list(tracker.getActiveJobsIds()),
                    "activeStages": list(tracker.getActiveStageIds()),
                }
            )
        if endpoint == "system":
            import os

            vm = {}
            try:
                with open("/proc/meminfo") as fh:
                    for line in fh:
                        k, _, rest = line.partition(":")
                        if k in ("MemTotal", "MemAvailable"):
                            vm[k] = rest.strip()
            except OSError:
                pass
            return 200, "application/json", json.dumps(
                {
                    "cpuCount": os.cpu_count(),
                    "loadAvg": list(os.getloadavg()),
                    "memory": vm,
                    "defaultParallelism": spark.sparkContext.defaultParallelism,
                    "sparkVersion": spark.version,
                }
            )
        if endpoint == "config":
            key = _one(params, "key")
            if key:
                value = spark.conf.get(key, None)
                if value is None:
                    raise KeyError(f"no such config key: {key}")
                return 200, "text/plain", value
            conf = dict(spark.sparkContext.getConf().getAll())
            return 200, "application/json", json.dumps(conf, sort_keys=True)
        if endpoint == "log":
            if not self.log_file:
                raise ValueError("no log file configured")
            limit = int(_one(params, "charsLimit") or 4000)
            try:
                with open(self.log_file, encoding="utf-8", errors="replace") as fh:
                    fh.seek(0, 2)
                    size = fh.tell()
                    fh.seek(max(size - limit, 0))
                    return 200, "text/plain", fh.read()
            except OSError as exc:
                raise ValueError(f"cannot read log file: {exc}") from exc
        if endpoint == "drop":
            name = _one(params, "table")
            if not name:
                raise ValueError("/drop requires ?table=")
            if name in self.cached_queries.names():
                self.cached_queries.unregister(name)
                return 200, "text/plain", f"Dropped cached query {name}."
            if spark.catalog.dropTempView(name):
                return 200, "text/plain", f"Dropped view {name}."
            raise KeyError(f"no cached query or view named {name!r}")
        # truncate: rewrite the sweep-history archive keeping `limit` days
        if not self.suggestions_dir:
            raise ValueError("no suggestions history directory configured")
        limit_days = int(_one(params, "limit") or 0)
        if limit_days <= 0:
            raise ValueError("/truncate requires ?limit=<days> > 0")
        now = self.now_ms or _wall_ms()
        cutoff = now - limit_days * 86_400_000
        hist_dir = f"{self.suggestions_dir}/history"
        import os
        import shutil

        if not os.path.isdir(hist_dir):
            raise ValueError("no sweep history to truncate")
        kept = spark.read.parquet(hist_dir).filter(F.col("sweepTs") >= cutoff)
        kept_pdf = kept.toPandas()  # history is sweep-cadence tiny
        # write-then-swap: the replacement lands in a sibling temp dir and
        # only replaces the archive after the write SUCCEEDS — a failure
        # mid-rewrite (disk full, kill) must never lose the only copy
        tmp_dir = f"{hist_dir}.__truncating__"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        spark.createDataFrame(kept_pdf, kept.schema).write.mode("overwrite").parquet(tmp_dir)
        old_dir = f"{hist_dir}.__old__"
        shutil.rmtree(old_dir, ignore_errors=True)
        os.rename(hist_dir, old_dir)
        os.rename(tmp_dir, hist_dir)
        shutil.rmtree(old_dir)
        return 200, "text/plain", f"Truncated history to {limit_days} days ({len(kept_pdf)} rows kept)."

    def _operations(self, endpoint, params):
        """/submitOperation + /listOperations + /abortOperation
        (NamenodeAnalyticsMethods.java:2065-2434): `operation` is
        kind[:argument] ("delete", "setReplication:2"); `sleep` is
        accepted for parity and ignored — pacing here is batch draws by
        the executor, not a per-inode thread sleep."""
        from nnanalytics_spark.inode.operations import Operation

        if endpoint == "listOperations":
            return 200, "application/json", json.dumps(self.operations.list_operations())
        if endpoint == "abortOperation":
            op_id = _one(params, "id")
            if op_id is None:
                raise ValueError("/abortOperation requires ?id=")
            self.operations.abort(int(op_id))
            return 200, "text/plain", f"Aborted operation {op_id}."
        op_str = _one(params, "operation")
        if not op_str:
            raise ValueError("No operation defined. Please check /operations.")
        kind, _, arg = op_str.partition(":")
        op = Operation(kind, int(arg) if arg else None)
        query = urlmod._build_query(params, self.now_ms)
        op_id = self.operations.submit(self.engine, query, op)
        return 200, "text/plain", str(op_id)

    def _cached(self, endpoint, params):
        """Custom cached-query surface (SuggestionsEngine.java:743-767):
        register a Query under a name, re-runnable on demand and by the
        sweep."""
        if endpoint == "cachedMaps":
            return 200, "application/json", json.dumps(self.cached_queries.names())
        name = _one(params, "queryName")
        if not name:
            raise ValueError(f"/{endpoint} requires ?queryName=")
        if endpoint == "setCachedQuery":
            query = urlmod._build_query(params, self.now_ms)
            shape = "histogram" if _one(params, "type") else "sum"
            self.cached_queries.register(name, query, shape)
            return 200, "text/plain", f"{name} set for analysis."
        if endpoint == "removeCachedQuery":
            self.cached_queries.unregister(name)
            return 200, "text/plain", f"{name} removed from analysis."
        # getCachedQuery: run it now
        if name not in self.cached_queries.names():
            raise KeyError(f"no cached query named {name!r}")
        df = self.cached_queries.refresh(self.engine)[name]
        rows = df.collect()
        if len(rows) == 1 and len(rows[0]) == 1:
            return 200, "text/plain", str(rows[0][0])
        return 200, "application/json", render.to_json(df)

    def _maybe_email(self, endpoint, params, rows) -> None:
        """Email-sink side channel (MailOutput.java): when the request
        carries emailTo + emailConditions, check the (already-collected,
        driver-sized) result against the conditions and send the report
        through the configured transport. A failed condition means "no
        email" — the HTTP response is unaffected either way, matching the
        reference's alerting contract where the query result is returned
        regardless and the mail leg is best-effort."""
        email_to = _one(params, "emailTo")
        conditions = _one(params, "emailConditions")
        if not email_to or not conditions or self.mail_transport is None:
            return
        from nnanalytics_spark.inode import mail

        try:
            if len(rows) == 1 and len(rows[0]) == 1:
                mail.check_scalar(conditions, int(rows[0][0]))
                hist = {"value": int(rows[0][0])}
                highlight: set[str] = set()
            else:
                hist = {str(r[0]): int(r[-1]) for r in rows}
                highlight = mail.check_histogram(conditions, hist)
            mail.write(
                subject=f"NNAnalytics - {endpoint}",
                histogram=hist,
                highlight_keys=highlight,
                email_to=email_to.split(","),
                email_from=_one(params, "emailFrom") or "nna@localhost",
                email_cc=(_one(params, "emailCC") or "").split(",")
                if _one(params, "emailCC")
                else None,
                transport=self.mail_transport,
            )
        except mail.EmailConditionError:
            pass
        except (TypeError, ValueError):
            # non-numeric result shapes can't be condition-checked
            pass

    def _analytic(self, endpoint, path, query, params):
        out_fmt = _one(params, "histogramOutput") or "json"
        if out_fmt not in _HISTOGRAM_OUTPUTS:
            raise ValueError(f"histogramOutput must be one of {_HISTOGRAM_OUTPUTS}")
        df = urlmod.run_url(self.engine, f"/{endpoint}?{query}", now_ms=self.now_ms)
        if endpoint in ("filter", "divide"):
            if df.columns == ["path"]:
                # path dump: one path per line, text/plain — STREAMED.
                # The reference writes path dumps row-at-a-time through
                # the servlet writer (AbstractQueryEngine.java:757-783,
                # write + flush per inode) precisely so an unlimited
                # dump never buffers namespace-sized output; collect()
                # here was a driver OOM at scale (VERDICT r6 #2).
                # toLocalIterator pulls one partition at a time; the
                # handler writes chunked HTTP. max_dump_rows (ctor, None
                # = unlimited) is a plan-level LIMIT safety cap on top.
                return 200, "text/plain", _PathStream(df, self.max_dump_rows)
            rows = df.collect()
            self._maybe_email(endpoint, params, rows)
            if len(rows) == 1 and len(rows[0]) == 1:
                # scalar sum/ratio: the reference writes the number as the
                # whole body (NamenodeAnalyticsMethods.java:1402-1513)
                return 200, "text/plain", str(rows[0][0])
            # find results / multi-sum: CSV lines
            return 200, "text/plain", "\n".join(
                ",".join(str(v) for v in r) for r in rows
            ) + "\n"
        if _one(params, "emailTo"):
            # tiny aggregated result; the extra collect only happens when
            # the request actually asks for the email leg
            self._maybe_email(endpoint, params, df.collect())
        if out_fmt == "csv":
            return 200, "text/plain", render.to_csv(df)
        if out_fmt == "chart":
            return 200, "application/json", render.to_chart_js_json(df, title=endpoint)
        if endpoint == "histogram2":
            return 200, "application/json", render.two_level_to_json(df)
        return 200, "application/json", render.to_json(df)

    #: cache validity horizon — the reference's SuggestionsEngine
    #: recomputes on a 15-minute cadence, so anything older is stale
    SWEEP_TTL_MS = 15 * 60 * 1000

    def _sweep_cache(self, name, now_ms=None):
        """Read a sweep-cached report (run_sweep's parquet) when a
        suggestions_dir is configured and holds a FRESH one — the
        reference serves these endpoints from its 15-minute
        SuggestionsEngine cache; recomputing the full battery per
        dashboard poll would pay a complete table scan per request.

        Freshness: time-relative reports (fileAge, the per-age scalar
        buckets) were computed against the sweep-time ``now``, so a
        request whose effective ``now`` has drifted past the TTL gets
        ``None`` (→ live recomputation) instead of silently-stale
        buckets. Sweeps written before the sweepMeta marker existed are
        treated as stale for the same reason."""
        import os

        if not self.suggestions_dir:
            return None
        path = f"{self.suggestions_dir}/{name}"
        if not os.path.isdir(path):
            return None
        if now_ms is not None:
            sweep_ts = self._sweep_ts()
            if sweep_ts is None or abs(now_ms - sweep_ts) > self.SWEEP_TTL_MS:
                return None
        return self.engine.inodes.sparkSession.read.parquet(path)

    def _sweep_ts(self):
        """Sweep-time ``now`` recorded by run_sweep, or None."""
        import os

        path = f"{self.suggestions_dir}/sweepMeta"
        if not os.path.isdir(path):
            return None
        rows = self.engine.inodes.sparkSession.read.parquet(path).collect()
        return rows[0]["sweepTs"] if rows else None

    def _suggestion(self, endpoint, params):
        now = self.now_ms
        if now is None:
            import time

            now = int(time.time() * 1000)
        inodes = self.engine.inodes
        if endpoint == "fileAge":
            df = self._sweep_cache("fileAge", now_ms=now)
            if df is None:
                df = suggestions.file_age_histogram(inodes, now)
            return 200, "application/json", render.to_json(df)
        if endpoint == "fileTypes":
            df = self._sweep_cache("fileTypeReport")
            if df is None:
                df = suggestions.file_type_report(inodes)
            return 200, "application/json", render.two_level_to_json(df)
        if endpoint == "quotas":
            df = self._sweep_cache("quotaReport")
            if df is None:
                df = suggestions.quota_report(inodes)
            return 200, "application/json", df.toPandas().to_json(orient="records")
        if endpoint == "directories":
            depth = int(_one(params, "depth") or 3)
            limit = int(_one(params, "limit") or 1000)
            df = suggestions.top_directories(inodes, depth=depth, k=limit)
            return 200, "application/json", render.to_json(df)
        # /top | /bottom rankings over the per-user report (sweep-cached
        # when available — the ranking itself is a tiny sort over it)
        metric = _one(params, "metric") or "numFiles"
        limit = int(_one(params, "limit") or 10)
        per_user = self._sweep_cache("perUser", now_ms=now)
        if per_user is None:
            per_user = suggestions.per_user_report(inodes, now)
        df = suggestions.issue_ranking(per_user, metric, k=limit, top=endpoint == "top")
        return 200, "application/json", render.to_json(df)


def _one(params: dict[str, list[str]], name: str) -> str | None:
    vals = params.get(name)
    return vals[-1] if vals else None


#: rows per emitted chunk in a streamed path dump — small enough that a
#: chunk is KBs, large enough that per-chunk HTTP framing is noise
_DUMP_BATCH_ROWS = 8192


class _PathStream:
    """Iterable of text chunks for a path dump: pull rows through
    toLocalIterator (one partition resident at a time — driver memory
    bounded by a partition, not the result) and join every
    _DUMP_BATCH_ROWS paths into one chunk. Body is byte-identical to
    the old '\\n'.join(paths) + '\\n' (empty dump → a single newline).

    ``max_rows`` (None = unlimited, matching the reference's unbounded
    servlet stream) is the safety cap: the plan fetches ONE row past it
    so a capped dump is distinguishable from a complete one —
    ``truncated`` flips True the moment the extra row appears, the
    handler emits the X-NNA-Truncated chunked trailer, and a warning
    lands in the server log (ADVICE r7: a silent cap with a clean
    terminator was unreadable to backfill tooling)."""

    def __init__(self, df, max_rows: int | None) -> None:
        self._df = df if max_rows is None else df.limit(max_rows + 1)
        self._max = max_rows
        self.truncated = False

    def __iter__(self):
        emitted = False
        n = 0
        buf: list[str] = []
        for row in self._df.toLocalIterator(prefetchPartitions=True):
            n += 1
            if self._max is not None and n > self._max:
                self.truncated = True
                import logging

                logging.getLogger(__name__).warning(
                    "path dump truncated at max_dump_rows=%d", self._max
                )
                break
            buf.append(str(row[0]))
            if len(buf) >= _DUMP_BATCH_ROWS:
                yield "\n".join(buf) + "\n"
                emitted = True
                buf = []
        if buf or not emitted:
            yield "\n".join(buf) + "\n"


def _wall_ms() -> int:
    import time

    return int(time.time() * 1000)


def _SUPPORTED_OPS():
    from nnanalytics_spark.inode.operations import SUPPORTED

    return SUPPORTED


def _make_handler(server: AnalyticsWebServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _serve(self, method: str) -> None:
            parts = urlsplit(self.path)
            length = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(length).decode("utf-8") if length else ""
            user = self.headers.get("X-NNA-User", "anonymous")
            req_headers = {
                "authorization": self.headers.get("Authorization"),
                "cookie": self.headers.get("Cookie"),
                "client_ip": self.client_address[0],
            }
            extra: dict = {}
            try:
                result = server.handle(
                    method, parts.path, parts.query, body, user, req_headers
                )
                status, ctype, payload = result[:3]
                if len(result) > 3:
                    extra = result[3]
            except Exception as exc:  # engine crash → 500, never a hung socket
                status, ctype, payload = 500, "text/plain", f"{type(exc).__name__}: {exc}"
            if not isinstance(payload, str):
                # generator payload (path dump): chunked transfer, body
                # written incrementally — peak memory is one chunk (plus
                # the gzip window when the client accepts it), never the
                # whole dump
                self._stream(status, ctype, payload)
                return
            data = payload.encode("utf-8")
            # gzip large OK bodies when the client advertises support —
            # the reference streams /dump and /filter path lists through
            # StreamingGzipOutputStream.java for exactly this case (path
            # dumps compress ~10x); small/error bodies aren't worth the
            # deflate round-trip
            accepts_gzip = "gzip" in (self.headers.get("Accept-Encoding") or "")
            if accepts_gzip and status == 200 and len(data) >= 1024:
                import gzip as _gzip

                data = _gzip.compress(data, compresslevel=6)
                extra = {**extra, "Content-Encoding": "gzip"}
            self.send_response(status)
            self.send_header("Content-Type", f"{ctype}; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            for name, value in extra.items():
                self.send_header(name, value)
            self.end_headers()
            self.wfile.write(data)

        def _stream(self, status: int, ctype: str, chunks) -> None:
            """Chunked-transfer write of a text-chunk iterable, with
            streaming gzip when the client accepts it (the reference's
            StreamingGzipOutputStream leg — path dumps compress ~10x).
            zlib.compressobj(wbits=31) emits a gzip-framed stream one
            deflate block at a time; empty compressor outputs are
            skipped because a zero-length HTTP chunk would terminate
            the body early.

            Failure semantics (ADVICE r7): the FIRST chunk is pulled
            BEFORE the status line, so a Spark execution error that
            surfaces when the lazy dump actually runs still maps to a
            full 500 response. A failure after bytes have been sent
            cannot be un-sent — the connection is aborted WITHOUT the
            terminal 0-chunk, so chunked-aware clients see truncation
            instead of a clean EOF. A dump capped by max_dump_rows
            finishes cleanly but carries the ``X-NNA-Truncated: true``
            chunked trailer (declared up front via the Trailer
            header)."""
            import zlib

            it = iter(chunks)
            try:
                first = next(it)
            except StopIteration:
                first = None
            except Exception as exc:
                # execution failed before any byte went out → real 500
                data = f"{type(exc).__name__}: {exc}".encode("utf-8")
                self.send_response(500)
                self.send_header("Content-Type", "text/plain; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return

            accepts_gzip = "gzip" in (self.headers.get("Accept-Encoding") or "")
            comp = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS) if accepts_gzip else None
            self.send_response(status)
            self.send_header("Content-Type", f"{ctype}; charset=utf-8")
            if comp is not None:
                self.send_header("Content-Encoding", "gzip")
            self.send_header("Transfer-Encoding", "chunked")
            self.send_header("Trailer", "X-NNA-Truncated")
            self.end_headers()

            def _write(piece: bytes) -> None:
                if piece:
                    self.wfile.write(f"{len(piece):x}\r\n".encode("ascii"))
                    self.wfile.write(piece)
                    self.wfile.write(b"\r\n")

            try:
                if first is not None:
                    _write(
                        comp.compress(first.encode("utf-8"))
                        if comp is not None
                        else first.encode("utf-8")
                    )
                    self.wfile.flush()
                for chunk in it:
                    data = chunk.encode("utf-8")
                    _write(comp.compress(data) if comp is not None else data)
                    self.wfile.flush()
            except BrokenPipeError:
                return  # client went away mid-dump; nothing to unwind
            except Exception:
                # mid-stream execution failure: abort the connection
                # WITHOUT the terminal 0-chunk so the client detects a
                # truncated body rather than mistaking it for success
                self.close_connection = True
                return
            if comp is not None:
                try:
                    _write(comp.flush())
                except BrokenPipeError:
                    return
            trailer = (
                b"X-NNA-Truncated: true\r\n"
                if getattr(chunks, "truncated", False)
                else b""
            )
            try:
                self.wfile.write(b"0\r\n" + trailer + b"\r\n")
            except BrokenPipeError:
                pass

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            self._serve("GET")

        def do_POST(self) -> None:  # noqa: N802
            self._serve("POST")

        def log_message(self, *args) -> None:  # quiet test output
            pass

    return Handler
