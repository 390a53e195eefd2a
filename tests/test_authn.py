"""Authentication-layer tests — the login/token/LDAP suite shaped like
the reference's TestLdapAuth + TestAuthorizationBase: unit coverage of
the password/JWT/DN-template pieces, then a live server exercising
/login → Bearer → /logout with the reference's status codes
(SecurityContext.java:120-380 semantics)."""

from __future__ import annotations

import http.client
import json

import pytest

from nnanalytics_spark.core.authn import (
    AuthenticationError,
    BadCredentialsError,
    FilePasswordSet,
    JwtManager,
    LdapBindAuthenticator,
    LocalPasswordSet,
    SecurityManager,
    hash_password,
    verify_password,
)
from nnanalytics_spark.core.authz import Authorizer
from nnanalytics_spark.web.server import AnalyticsWebServer


# ------------------------------------------------------------ passwords

def test_password_hash_roundtrip_and_salt():
    enc1 = hash_password("s3cret")
    enc2 = hash_password("s3cret")
    assert enc1 != enc2  # fresh salt each time
    assert verify_password("s3cret", enc1) and verify_password("s3cret", enc2)
    assert not verify_password("wrong", enc1)
    assert not verify_password("s3cret", "garbage")


def test_local_password_set():
    local = LocalPasswordSet.from_plain({"hdfs": "hdfs", "admin": "pw"})
    assert local.allows("hdfs") and not local.allows("ghost")
    assert local.authenticate("hdfs", "hdfs")
    assert not local.authenticate("hdfs", "nope")
    assert not local.authenticate("ghost", "hdfs")


def test_file_password_set_hot_reload(tmp_path):
    """The keytab/security-config reload analog: edits to the password
    file take effect without a restart."""
    import os

    path = tmp_path / "users.pwd"
    path.write_text(f"alice:{hash_password('one')}\n# comment\n")
    fps = FilePasswordSet(str(path))
    assert fps.authenticate("alice", "one")
    assert not fps.allows("bob")

    path.write_text(f"alice:{hash_password('two')}\nbob:{hash_password('b')}\n")
    os.utime(path, (1e9, 2e9))  # force a distinct mtime
    assert not fps.authenticate("alice", "one")
    assert fps.authenticate("alice", "two")
    assert fps.allows("bob") and fps.authenticate("bob", "b")


# ------------------------------------------------------------ LDAP bind

def test_ldap_dn_templates_first_success_wins():
    tried = []

    def bind(dn, password):
        tried.append(dn)
        return dn == "uid=carol,ou=people,dc=x" and password == "pw"

    ldap = LdapBindAuthenticator(
        ["uid=%u,ou=service,dc=x", "uid=%u,ou=people,dc=x"], bind
    )
    assert ldap.authenticate("carol", "pw")
    assert tried == ["uid=carol,ou=service,dc=x", "uid=carol,ou=people,dc=x"]
    assert not ldap.authenticate("carol", "bad")


def test_ldap_rejects_empty_password_without_binding():
    """Empty password must fail closed — a simple bind with an empty
    password is an ANONYMOUS bind that would otherwise 'succeed'."""
    calls = []
    ldap = LdapBindAuthenticator(["uid=%u,dc=x"], lambda dn, pw: calls.append(dn) or True)
    assert not ldap.authenticate("dave", "")
    assert calls == []


def test_ldap_rethrows_last_bind_error():
    def bind(dn, password):
        raise ConnectionError(f"no route to {dn}")

    ldap = LdapBindAuthenticator(["uid=%u,dc=a", "uid=%u,dc=b"], bind)
    with pytest.raises(AuthenticationError, match="dc=b"):
        ldap.authenticate("erin", "pw")


# ------------------------------------------------------------ JWT

def test_jwt_roundtrip_expiry_tamper_revoke():
    clock = [1_000_000]
    jwt = JwtManager("topsecret", ttl_ms=60_000, now_ms=lambda: clock[0])
    token = jwt.generate("frank")
    assert jwt.verify(token) == "frank"

    clock[0] += 59_000
    assert jwt.verify(token) == "frank"
    clock[0] += 2_000
    with pytest.raises(AuthenticationError, match="expired"):
        jwt.verify(token)

    clock[0] = 1_000_000
    header, payload, sig = jwt.generate("frank").split(".")
    forged_payload = payload[:-2] + ("AA" if payload[-2:] != "AA" else "BB")
    with pytest.raises(AuthenticationError, match="signature"):
        jwt.verify(f"{header}.{forged_payload}.{sig}")
    with pytest.raises(AuthenticationError, match="Malformed"):
        jwt.verify("notatoken")

    fresh = jwt.generate("frank")
    jwt.revoke(fresh)
    with pytest.raises(AuthenticationError, match="revoked"):
        jwt.verify(fresh)


# ------------------------------------------------------------ manager

def _manager(**kw):
    return SecurityManager(
        local=LocalPasswordSet.from_plain({"hdfs": "hdfs"}),
        jwt=JwtManager("k", ttl_ms=3_600_000),
        **kw,
    )


def test_login_precedence_local_failure_does_not_fall_through():
    """A user in the LOCAL set with a wrong password raises
    BadCredentials and never reaches LDAP (SecurityContext.java:225-243)."""
    ldap_calls = []
    mgr = _manager(
        ldap=LdapBindAuthenticator(["uid=%u,dc=x"], lambda dn, pw: ldap_calls.append(dn) or True)
    )
    with pytest.raises(BadCredentialsError):
        mgr.login("hdfs", "wrong")
    assert ldap_calls == []
    # unknown-local user DOES fall through to LDAP
    assert mgr.jwt.verify(mgr.login("ldapuser", "pw")) == "ldapuser"
    assert ldap_calls == ["uid=ldapuser,dc=x"]


def test_login_requires_both_credentials():
    mgr = _manager()
    for u, p in ((None, "x"), ("u", None), ("", "x"), ("u", "")):
        with pytest.raises(AuthenticationError, match="Bad username / password"):
            mgr.login(u, p)


def test_resolve_basic_bearer_cookie():
    import base64

    mgr = _manager()
    basic = "Basic " + base64.b64encode(b"hdfs:hdfs").decode()
    assert mgr.resolve(basic, None) == "hdfs"
    with pytest.raises(AuthenticationError):
        mgr.resolve("Basic " + base64.b64encode(b"hdfs:no").decode(), None)

    token = mgr.login("hdfs", "hdfs")
    assert mgr.resolve(f"Bearer {token}", None) == "hdfs"
    assert mgr.resolve(None, token) == "hdfs"
    with pytest.raises(AuthenticationError):
        mgr.resolve(None, None)

    assert mgr.logout(token) is True
    with pytest.raises(AuthenticationError, match="revoked"):
        mgr.resolve(None, token)
    assert mgr.logout(token) is False  # already dead → "No login session"


# ------------------------------------------------------------ live server

@pytest.fixture(scope="module")
def auth_server(engine):
    security = SecurityManager(
        local=LocalPasswordSet.from_plain({"hdfs": "hdfs", "reader": "r"}),
        jwt=JwtManager("server-secret", ttl_ms=3_600_000),
    )
    srv = AnalyticsWebServer(
        engine,
        authorizer=Authorizer(
            admin_users=["hdfs"], write_users=["hdfs"], read_users=["hdfs", "reader"],
            cache_reader_users=["hdfs", "reader"],
        ),
        security=security,
    )
    port = srv.start()
    yield ("127.0.0.1", port)
    srv.stop()


def _req(addr, path, method="GET", headers=None, body=None):
    conn = http.client.HTTPConnection(*addr, timeout=120)
    conn.request(method, path, body=body, headers=headers or {})
    resp = conn.getresponse()
    out = (resp.status, resp.read().decode(), dict(resp.getheaders()))
    conn.close()
    return out


def test_server_login_issues_token_and_cookie(auth_server):
    status, body, headers = _req(
        auth_server, "/login", method="POST", body="username=hdfs&password=hdfs",
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    assert status == 200
    token = json.loads(body)["token"]
    assert headers["Set-Cookie"] == f"nna-jwt-token={token}"

    # Bearer works; the X-NNA-User stand-in is IGNORED when auth is on
    status, body, _ = _req(
        auth_server, "/filter?set=files&filters=fileSize:eq:0&sum=count",
        headers={"Authorization": f"Bearer {token}", "X-NNA-User": "admin"},
    )
    assert status == 200 and body.strip().isdigit()

    # cookie transport works too
    status, _, _ = _req(
        auth_server, "/credentials", headers={"Cookie": f"nna-jwt-token={token}"}
    )
    assert status == 200


def test_server_rejects_bad_login_and_anonymous(auth_server):
    status, body, _ = _req(
        auth_server, "/login", method="POST", body="username=hdfs&password=wrong"
    )
    assert status == 401 and "Invalid credentials" in body
    status, body, _ = _req(auth_server, "/login", method="POST", body="username=hdfs")
    assert status == 401 and "Bad username / password" in body
    # no credentials at all → 401, not the X-NNA-User fallback
    status, _, _ = _req(auth_server, "/info", headers={"X-NNA-User": "hdfs"})
    assert status == 401


def test_server_authz_still_applies_after_authn(auth_server):
    status, body, _ = _req(auth_server, "/login", method="POST",
                           body="username=reader&password=r")
    token = json.loads(body)["token"]
    # reader can read…
    status, _, _ = _req(
        auth_server, "/histogram?set=files&type=user&sum=count",
        headers={"Authorization": f"Bearer {token}"},
    )
    assert status == 200
    # …but is 403 on the admin surface even though authenticated
    status, _, _ = _req(
        auth_server, "/threads", headers={"Authorization": f"Bearer {token}"}
    )
    assert status == 403


def test_server_logout_revokes(auth_server):
    _, body, _ = _req(auth_server, "/login", method="POST",
                      body="username=hdfs&password=hdfs")
    token = json.loads(body)["token"]
    status, body, headers = _req(
        auth_server, "/logout", headers={"Authorization": f"Bearer {token}"}
    )
    assert status == 200 and "logged out" in body
    assert headers["Set-Cookie"].startswith("nna-jwt-token=;")
    status, _, _ = _req(
        auth_server, "/info", headers={"Authorization": f"Bearer {token}"}
    )
    assert status == 401
    # logging out again → 400 "No login session."
    status, body, _ = _req(
        auth_server, "/logout", headers={"Authorization": f"Bearer {token}"}
    )
    assert status == 400 and "No login session" in body


def test_server_basic_auth_per_request(auth_server):
    import base64

    basic = "Basic " + base64.b64encode(b"reader:r").decode()
    status, _, _ = _req(auth_server, "/credentials", headers={"Authorization": basic})
    assert status == 200
    bad = "Basic " + base64.b64encode(b"reader:bad").decode()
    status, _, _ = _req(auth_server, "/credentials", headers={"Authorization": bad})
    assert status == 401


def test_server_proxy_param_when_auth_disabled(engine):
    """Auth disabled (no local/ldap) → the reference honors ?proxy= as
    the effective identity (SecurityContext.java:152-157)."""
    srv = AnalyticsWebServer(
        engine,
        authorizer=Authorizer(read_users=["alice"]),
        security=SecurityManager(),  # nothing configured → disabled
    )
    port = srv.start()
    try:
        addr = ("127.0.0.1", port)
        status, _, _ = _req(addr, "/filter?set=files&sum=count&proxy=alice")
        assert status == 200
        status, _, _ = _req(addr, "/filter?set=files&sum=count&proxy=mallory")
        assert status == 403
    finally:
        srv.stop()
