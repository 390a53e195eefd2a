"""Role-matrix authorization tests (Constants.java access sets +
SecurityContext.java precedence semantics)."""

from __future__ import annotations

import pytest

from nnanalytics_spark.core import authz


def make():
    return authz.Authorizer(
        admin_users=["root"],
        write_users=["op", "root"],
        read_users=["analyst", "root"],
        cache_reader_users=["dash"],
    )


def test_unsecured_endpoints_open_to_anyone():
    a = make()
    for ep in ("login", "endpoints", "sets", "filters", "sums"):
        a.check("nobody", ep)


def test_class_allowlists_gate_their_endpoints():
    a = make()
    a.check("analyst", "histogram")
    a.check("op", "submitOperation")
    a.check("root", "saveNamespace")
    a.check("dash", "suggestions")
    with pytest.raises(authz.AuthorizationError):
        a.check("analyst", "submitOperation")
    with pytest.raises(authz.AuthorizationError):
        a.check("dash", "histogram")
    with pytest.raises(authz.AuthorizationError):
        a.check("op", "saveNamespace")


def test_precedence_no_fallthrough_and_unknown_denied():
    a = make()
    # admin-class endpoint never falls through to reader rights
    with pytest.raises(authz.AuthorizationError):
        a.check("analyst", "metrics")
    with pytest.raises(authz.AuthorizationError):
        a.check("root", "not_an_endpoint")
    a.enabled = False
    a.check("nobody", "saveNamespace")  # disabled switch opens everything


def test_access_levels_and_matrix_completeness():
    a = make()
    assert a.access_levels("root") == ["ADMIN", "WRITER", "READER"]
    assert a.access_levels("dash") == ["CACHE"]
    # the five sets are disjoint and cover the reference's gated endpoints
    sets = [authz.UNSECURED, authz.ADMIN, authz.WRITER, authz.READER, authz.CACHE_READER]
    assert sum(len(s) for s in sets) == len(authz.ALL_ENDPOINTS) == 54
