"""Per-user usage metrics — the analog of the reference's
UserMetrics/UsageMetrics (analytics/UserMetrics.java:26-110): every
login, logout, and query is counted per (user, client IP) and surfaced
through /metrics, which is how operators of the reference audit who is
actually hitting the analytics cluster.

Driver-side state: these are O(users × ips) counters for a human-facing
admin endpoint — nothing here touches Spark. Thread-safe because the web
server handles requests on a thread pool.
"""

from __future__ import annotations

import threading
from collections import defaultdict


class UsageTracker:
    _KINDS = ("queryCount", "loginCount", "logoutCount")

    def __init__(self) -> None:
        self._lock = threading.Lock()
        # user -> kind -> ip -> count
        self._counts: dict[str, dict[str, dict[str, int]]] = defaultdict(
            lambda: {k: defaultdict(int) for k in self._KINDS}
        )

    def _bump(self, user: str, kind: str, ip: str) -> None:
        with self._lock:
            self._counts[user or "anonymous"][kind][ip or "unknown"] += 1

    def queried(self, user: str, ip: str) -> None:
        self._bump(user, "queryCount", ip)

    def logged_in(self, user: str, ip: str) -> None:
        self._bump(user, "loginCount", ip)

    def logged_out(self, user: str, ip: str) -> None:
        self._bump(user, "logoutCount", ip)

    def format_for_json(self) -> list[dict]:
        """The reference's formatForJson shape (UserMetrics.java:65-110):
        per user, the totals plus a per-IP breakdown list."""
        with self._lock:
            out = []
            for user in sorted(self._counts):
                kinds = self._counts[user]
                ips: dict[str, dict[str, int]] = defaultdict(dict)
                for kind in self._KINDS:
                    for ip, n in kinds[kind].items():
                        ips[ip][kind] = n
                out.append(
                    {
                        "userName": user,
                        "totalQueryCount": sum(kinds["queryCount"].values()),
                        "totalLoginCount": sum(kinds["loginCount"].values()),
                        "totalLogoutCount": sum(kinds["logoutCount"].values()),
                        "ips": [{ip: ips[ip]} for ip in sorted(ips)],
                    }
                )
            return out
