"""Pluggable authentication — the reference's login stack re-expressed
with stdlib crypto (reference: `security/SecurityContext.java:120-380`,
which wires pac4j JWT + ldaptive LDAP + a local user:password set).

Ported semantics, in the reference's exact precedence
(SecurityContext.java:146-187 `login`, 296-380 `handleAuthentication`):

- authentication disabled → the ``proxy`` request parameter may set the
  effective identity (SecurityContext.java:152-157, 320-326);
- login requires BOTH username and password, else "Bad username /
  password provided." (SecurityContext.java:170-174);
- LOCAL authentication is tried first; a user present in the local set
  with a wrong password raises BadCredentials and does NOT fall through
  to LDAP (SecurityContext.java:225-243 `localLogin`);
- LDAP bind is attempted against every configured base-DN template with
  ``%u`` replaced by the username; the first successful bind wins and
  the last bind failure is rethrown when all fail
  (SecurityContext.java:189-222 `ldapLogin`);
- success issues a signed token the client presents on later requests
  (reference sets the ``nna-jwt-token`` cookie; we accept the cookie,
  an ``Authorization: Bearer`` header, or HTTP Basic per
  SecurityContext.java:329-347);
- logout invalidates the presented token (SecurityContext.java:259-285)
  — stateless JWTs need a revocation set for that, kept in-memory here
  (the reference's session invalidation is equally per-process).

Password hashes are salted PBKDF2-HMAC-SHA256 compared constant-time;
tokens are HS256 JWTs built from stdlib hmac/base64 (same shape pac4j
produces, no external dependency). The LDAP connector takes an
injectable ``bind_fn(dn, password) -> bool`` so the DN-template logic
is testable in-process; production plugs a real binder (e.g. ldap3's
``Connection(server, user=dn, password=pw).bind``) behind the same
callable.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import time
from collections.abc import Callable, Iterable


class AuthenticationError(Exception):
    """Authentication required / failed (reference 401)."""


class BadCredentialsError(AuthenticationError):
    """Known local user, wrong password (reference BadCredentialsException)."""


# ------------------------------------------------------------ passwords

_ALGO = "pbkdf2_sha256"
_ITERS = 210_000


def hash_password(password: str, *, salt: bytes | None = None, iters: int = _ITERS) -> str:
    """Encode a password as ``pbkdf2_sha256$iters$salt_hex$hash_hex``."""
    salt = os.urandom(16) if salt is None else salt
    digest = hashlib.pbkdf2_hmac("sha256", password.encode(), salt, iters)
    return f"{_ALGO}${iters}${salt.hex()}${digest.hex()}"


def verify_password(password: str, encoded: str) -> bool:
    """Constant-time verify against hash_password output."""
    try:
        algo, iters, salt_hex, hash_hex = encoded.split("$")
        if algo != _ALGO:
            return False
        digest = hashlib.pbkdf2_hmac(
            "sha256", password.encode(), bytes.fromhex(salt_hex), int(iters)
        )
        return hmac.compare_digest(digest.hex(), hash_hex)
    except (ValueError, AttributeError):
        return False


class LocalPasswordSet:
    """The reference's localOnlyUsers (`UserPasswordSet`): a closed set of
    user → password-hash entries. `allows` gates whether local auth even
    applies to a user; wrong password for an allowed user is a hard
    failure, not a fall-through (SecurityContext.java:225-243)."""

    def __init__(self, encoded: dict[str, str] | None = None) -> None:
        self._users = dict(encoded or {})

    @classmethod
    def from_plain(cls, plain: dict[str, str]) -> LocalPasswordSet:
        return cls({u: hash_password(p) for u, p in plain.items()})

    def allows(self, user: str) -> bool:
        return user in self._users

    def authenticate(self, user: str, password: str) -> bool:
        encoded = self._users.get(user)
        return bool(encoded) and verify_password(password, encoded)


class FilePasswordSet(LocalPasswordSet):
    """LocalPasswordSet backed by a ``user:encoded`` file, hot-reloaded
    when the file's mtime changes — the analog of the reference's
    scheduled security-config/keytab reload (NNA reloads auth material
    without a restart; here every `allows`/`authenticate` call is
    guaranteed fresh-on-change)."""

    def __init__(self, path: str) -> None:
        super().__init__()
        self._path = path
        self._mtime = -1.0
        self._refresh()

    def _refresh(self) -> None:
        try:
            mtime = os.stat(self._path).st_mtime
        except OSError:
            self._users = {}
            self._mtime = -1.0
            return
        if mtime == self._mtime:
            return
        users: dict[str, str] = {}
        with open(self._path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line and not line.startswith("#") and ":" in line:
                    user, encoded = line.split(":", 1)
                    users[user] = encoded
        self._users = users
        self._mtime = mtime

    def allows(self, user: str) -> bool:
        self._refresh()
        return super().allows(user)

    def authenticate(self, user: str, password: str) -> bool:
        self._refresh()
        return super().authenticate(user, password)


# ------------------------------------------------------------ LDAP bind

class LdapBindAuthenticator:
    """DN-template bind authentication (SecurityContext.java:189-222):
    each base-DN template has ``%u`` replaced by the username and a bind
    is attempted; first success authenticates. An empty password is
    rejected up front — an LDAP unauthenticated bind would otherwise
    "succeed" anonymously (the classic simple-bind pitfall; the
    reference's login path already enforces non-empty at line 170).

    ``bind_fn(dn, password)`` returns truthy on successful bind, falsy
    or raises on failure; when every template raises, the LAST exception
    is rethrown (matching the reference's authFailedEx handling)."""

    def __init__(
        self,
        dn_templates: Iterable[str],
        bind_fn: Callable[[str, str], bool],
    ) -> None:
        self.dn_templates = list(dn_templates)
        self.bind_fn = bind_fn

    def authenticate(self, user: str, password: str) -> bool:
        if not password:
            return False
        last_error: Exception | None = None
        for template in self.dn_templates:
            dn = template.replace("%u", user)
            try:
                if self.bind_fn(dn, password):
                    return True
            except Exception as exc:  # noqa: BLE001 — try remaining DNs
                last_error = exc
                continue
        if last_error is not None:
            raise AuthenticationError(str(last_error)) from last_error
        return False


# ------------------------------------------------------------ JWT (HS256)

def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _b64url_decode(part: str) -> bytes:
    return base64.urlsafe_b64decode(part + "=" * (-len(part) % 4))


class JwtManager:
    """HS256 JWT issue/verify + in-memory revocation (the pac4j
    JwtGenerator/JwtAuthenticator pair of SecurityContext.java:60-62,
    plus logout's session invalidation as a revocation set)."""

    def __init__(
        self,
        secret: str,
        ttl_ms: int = 24 * 3_600_000,
        now_ms: Callable[[], int] | None = None,
    ) -> None:
        self._key = secret.encode()
        self.ttl_ms = ttl_ms
        self._now_ms = now_ms or (lambda: int(time.time() * 1000))
        self._revoked: set[str] = set()

    def _sign(self, signing_input: bytes) -> str:
        return _b64url(hmac.new(self._key, signing_input, hashlib.sha256).digest())

    def generate(self, user: str) -> str:
        header = _b64url(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
        now = self._now_ms()
        payload = _b64url(
            json.dumps({"sub": user, "iat": now // 1000, "exp": (now + self.ttl_ms) // 1000}).encode()
        )
        signing_input = f"{header}.{payload}".encode()
        return f"{header}.{payload}.{self._sign(signing_input)}"

    def verify(self, token: str) -> str:
        """Return the subject or raise AuthenticationError (bad shape,
        bad signature, expired, or revoked)."""
        if token in self._revoked:
            raise AuthenticationError("Token revoked.")
        try:
            header, payload, sig = token.split(".")
        except ValueError:
            raise AuthenticationError("Malformed token.") from None
        expected = self._sign(f"{header}.{payload}".encode())
        if not hmac.compare_digest(sig, expected):
            raise AuthenticationError("Bad token signature.")
        claims = json.loads(_b64url_decode(payload))
        if claims.get("exp", 0) * 1000 <= self._now_ms():
            raise AuthenticationError("Token expired.")
        sub = claims.get("sub")
        if not sub:
            raise AuthenticationError("Token missing subject.")
        return sub

    def revoke(self, token: str) -> None:
        """Add to the revocation set, pruning entries whose exp has
        passed — expired tokens fail verify() on their own, so retaining
        them only leaks memory on a long-lived server. Bounds the set to
        tokens revoked within the TTL window."""
        self._revoked.add(token)
        now_s = self._now_ms() // 1000
        dead = []
        for t in self._revoked:
            try:
                exp = json.loads(_b64url_decode(t.split(".")[1])).get("exp", 0)
            except Exception:
                dead.append(t)  # unparseable entries can never verify
                continue
            if exp <= now_s:
                dead.append(t)
        self._revoked.difference_update(dead)


# ------------------------------------------------------------ the context

class SecurityManager:
    """SecurityContext analog: local set → LDAP → token issuance, with
    the reference's precedence and failure modes. All parts optional —
    with neither local nor LDAP configured, authentication is DISABLED
    and identity falls back to the caller's proxy/header mechanism
    (SecurityContext.java:125 isAuthenticationEnabled)."""

    def __init__(
        self,
        local: LocalPasswordSet | None = None,
        ldap: LdapBindAuthenticator | None = None,
        jwt: JwtManager | None = None,
    ) -> None:
        self.local = local
        self.ldap = ldap
        self.jwt = jwt or JwtManager(secret=_b64url(os.urandom(32)))

    @property
    def authentication_enabled(self) -> bool:
        return self.local is not None or self.ldap is not None

    def login(self, username: str | None, password: str | None) -> str:
        """Authenticate and return a fresh token. Raises
        AuthenticationError / BadCredentialsError per the reference."""
        if not username or not password:
            raise AuthenticationError("Bad username / password provided.")
        if self.local is not None and self.local.allows(username):
            if self.local.authenticate(username, password):
                return self.jwt.generate(username)
            raise BadCredentialsError(f"Invalid credentials for: {username}")
        if self.ldap is not None and self.ldap.authenticate(username, password):
            return self.jwt.generate(username)
        raise AuthenticationError("Authentication required.")

    def logout(self, token: str | None) -> bool:
        """Revoke the presented token; False when there was no session
        (reference returns 400 "No login session.")."""
        if not token:
            return False
        try:
            self.jwt.verify(token)
        except AuthenticationError:
            return False
        self.jwt.revoke(token)
        return True

    def resolve(
        self,
        authorization: str | None = None,
        cookie_token: str | None = None,
    ) -> str:
        """Identify an already-authenticated request: HTTP Basic
        (re-authenticated per request, SecurityContext.java:329-347) or
        a JWT from the Bearer header / nna-jwt-token cookie. Raises
        AuthenticationError when nothing valid is presented."""
        if authorization and authorization.startswith("Basic "):
            try:
                decoded = base64.b64decode(
                    authorization[len("Basic "):].strip(), validate=True
                ).decode()
            except Exception as exc:  # malformed base64 / non-UTF-8 blob:
                # must surface as 401, not a 500 from the request handler
                raise AuthenticationError("Malformed Basic credentials.") from exc
            username, _, password = decoded.partition(":")
            self.login(username, password)  # raises on failure
            return username
        token = None
        if authorization and authorization.startswith("Bearer "):
            token = authorization[len("Bearer "):].strip()
        elif cookie_token:
            token = cookie_token
        if token:
            return self.jwt.verify(token)
        raise AuthenticationError("Authentication required.")
