"""Endpoint authorization matrix — port of the reference's role-based
endpoint gating (Constants.java:240-362 endpoint enum + the five access
sets; enforcement order SecurityContext.java:416-465).

Semantics preserved exactly:
- endpoint classes are checked in precedence order
  unsecured → admin → writer → reader → cache-reader; the FIRST class
  containing the endpoint decides, so an endpoint never falls through to
  a weaker class;
- each class has its own user allowlist (a user may hold several);
- an endpoint in no class is always denied;
- authorization disabled → everything allowed (reference's
  `authorizationEnabled` switch).
"""

from __future__ import annotations

from collections.abc import Iterable

UNSECURED = frozenset(
    "login logout endpoints credentials sets filters filterOps histograms "
    "histogramOutputs sums transforms operations finds".split()
)
ADMIN = frozenset(
    "saveNamespace fetchNamespace reloadNamespace log loadingStatus system "
    "threads refresh drop truncate addDirectory removeDirectory metrics "
    "setCachedQuery removeCachedQuery queryGuard".split()
)
WRITER = frozenset("listOperations submitOperation abortOperation".split())
READER = frozenset(
    "contentSummary filter histogram histogram2 histogram3 divide top bottom "
    "dump sql".split()
)
CACHE_READER = frozenset(
    "suggestions history token directories users quotas fileAge info config "
    "getCachedQuery cachedMaps fileTypes".split()
)

ALL_ENDPOINTS = UNSECURED | ADMIN | WRITER | READER | CACHE_READER


class AuthorizationError(Exception):
    """User is not authorized for the endpoint (reference 403)."""


class Authorizer:
    """Per-class user allowlists, checked in the reference's precedence
    order. Sits in front of INodeEngine / suggestions / operations calls
    the way SecurityContext fronts the HTTP handlers."""

    def __init__(
        self,
        admin_users: Iterable[str] = (),
        write_users: Iterable[str] = (),
        read_users: Iterable[str] = (),
        cache_reader_users: Iterable[str] = (),
        enabled: bool = True,
    ) -> None:
        self.admin = frozenset(admin_users)
        self.writers = frozenset(write_users)
        self.readers = frozenset(read_users)
        self.cache_readers = frozenset(cache_reader_users)
        self.enabled = enabled

    def check(self, user: str, endpoint: str) -> None:
        """Raise AuthorizationError unless `user` may call `endpoint`."""
        if not self.enabled or endpoint in UNSECURED:
            return
        for eps, allowed in (
            (ADMIN, self.admin),
            (WRITER, self.writers),
            (READER, self.readers),
            (CACHE_READER, self.cache_readers),
        ):
            if endpoint in eps:
                if user in allowed:
                    return
                raise AuthorizationError(
                    f"User: {user}, is not authorized for endpoint: {endpoint}"
                )
        raise AuthorizationError(
            f"User: {user}, is not authorized for endpoint: {endpoint}"
        )

    def access_levels(self, user: str) -> list[str]:
        """The reference's getAccessLevels: every class whose allowlist
        holds the user."""
        levels = []
        for name, allowed in (
            ("ADMIN", self.admin),
            ("WRITER", self.writers),
            ("READER", self.readers),
            ("CACHE", self.cache_readers),
        ):
            if user in allowed:
                levels.append(name)
        return levels
