"""Login / JWT / API-key authentication for the HTTP front.

Mirrors the reference server's auth surface (mods/server/http.go:269,
307-309,380-456 and svrauth.go) with the Python stdlib only:

* **POST /web/api/login** {loginName, password} issues an HS256-signed
  access + refresh JWT pair (handleLogin, http.go:663); the refresh
  token is cached server-side by its ``jti`` (svrauth.go JwtCache).
  ``sys as other_user`` proxy logins parse per svrauth.go
  ParseProxyLoginName:18-36.
* **POST /web/api/relogin** re-issues the pair when the presented
  refresh token verifies AND matches the cached copy — token rotation
  (handleReLogin, http.go:745-815); an EXPIRED access token is allowed
  through the middleware only for this path (http.go:421).
* **POST /web/api/logout** drops the cached refresh token
  (handleLogout, http.go:820).
* **/web/api/** routes demand ``Authorization: Bearer <access>``
  (handleJwtToken, http.go:393-445).
* **Client API keys** (/web/api/keys, http_facility.go:466-649): a
  generated key is delivered once as ``<id>:b:<sig>`` and thereafter
  validated server-side (ValidateClientToken, server.go:2665); /db and
  /lakes routes accept it as Bearer or ``?token=`` (handleAuthToken,
  http.go:458-497).  The reference signs with the client's X.509
  ECDSA key; the stdlib carries no ECDSA, so the signature here is an
  HMAC over (id, validity window) with the server secret — the same
  id:method:sig wire shape and the same validity semantics, different
  primitive (documented, not hidden).

Tokens are REAL compact JWTs (base64url header.payload.signature,
HS256), so standard client libraries decode them.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import re
import secrets
import threading
import time
import uuid

__all__ = ["Authenticator", "AuthError", "parse_proxy_login"]

_PROXY_RE = re.compile(r"^(\w+)(?:\s+as\s+(\w+))?$", re.IGNORECASE)
_KEY_ID_RE = re.compile(r"^[a-z][a-z0-9_.@-]+$")


class AuthError(Exception):
    """Verification failure; ``.reason`` is the client-facing message."""

    def __init__(self, reason: str, expired: bool = False):
        super().__init__(reason)
        self.reason = reason
        self.expired = expired


def parse_proxy_login(login_name: str) -> tuple[str, str, bool]:
    """'sys as other' -> ('other', 'sys', True); plain names pass
    through (svrauth.go ParseProxyLoginName)."""
    m = _PROXY_RE.match(login_name.strip().lower())
    if m and m.group(2):
        return m.group(2), m.group(1), True
    return login_name.strip().lower(), "", False


def _b64(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).rstrip(b"=").decode()


def _unb64(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


class Authenticator:
    """User-password auth + JWT issue/verify + client API keys.

    ``users`` maps login name -> password; the default account is the
    engine's stock ``sys``/``manager`` pair.  All state is in-memory
    (the reference keeps users in its system tables and certs on disk;
    persistence is the deployment's concern, the protocol is ours)."""

    def __init__(self, users: dict[str, str] | None = None,
                 secret: bytes | None = None,
                 access_ttl_s: float = 6 * 3600.0,
                 refresh_ttl_s: float = 24 * 3600.0):
        self.users = {k.lower(): v for k, v in
                      (users or {"sys": "manager"}).items()}
        self.secret = secret or secrets.token_bytes(32)
        self.access_ttl_s = access_ttl_s
        self.refresh_ttl_s = refresh_ttl_s
        self._refresh: dict[str, tuple[str, float]] = {}  # jti -> (token, exp)
        self._keys: dict[str, dict] = {}        # key id -> record
        self._lock = threading.Lock()

    # ---------------------------------------------------------------- users

    def check_password(self, login_name: str, password: str) -> bool:
        user, _proxy, _ = parse_proxy_login(login_name)
        want = self.users.get(user)
        return want is not None and hmac.compare_digest(want, password)

    def set_password(self, login_name: str, new: str) -> None:
        """Unconditional reset for an already-authenticated subject
        (the /web/api/chpasswd route carries no old password — the JWT
        claim is the proof, http.go:606-640)."""
        user, _proxy, _ = parse_proxy_login(login_name)
        with self._lock:
            self.users[user] = new

    def change_password(self, login_name: str, old: str, new: str) -> bool:
        user, _proxy, _ = parse_proxy_login(login_name)
        with self._lock:
            if self.users.get(user) is None or \
                    not hmac.compare_digest(self.users[user], old):
                return False
            self.users[user] = new
            return True

    # ----------------------------------------------------------------- jwt

    def _sign(self, payload: dict) -> str:
        head = _b64(json.dumps({"alg": "HS256", "typ": "JWT"},
                               separators=(",", ":")).encode())
        body = _b64(json.dumps(payload, separators=(",", ":")).encode())
        sig = hmac.new(self.secret, f"{head}.{body}".encode(),
                       hashlib.sha256).digest()
        return f"{head}.{body}.{_b64(sig)}"

    def _decode(self, token: str, allow_expired: bool = False) -> dict:
        try:
            head, body, sig = token.split(".")
        except ValueError:
            raise AuthError("malformed token")
        want = hmac.new(self.secret, f"{head}.{body}".encode(),
                        hashlib.sha256).digest()
        if not hmac.compare_digest(want, _unb64(sig)):
            raise AuthError("invalid token signature")
        claims = json.loads(_unb64(body))
        if claims.get("exp", 0) < time.time():
            if not allow_expired:
                raise AuthError("token is expired", expired=True)
            claims["_expired"] = True
        return claims

    def issue_tokens(self, subject: str) -> tuple[str, str]:
        """(access, refresh); the refresh token is cached by jti so
        relogin can demand an exact match (rotation)."""
        now = time.time()
        access = self._sign({"sub": subject, "typ": "access",
                             "iat": int(now), "jti": uuid.uuid4().hex,
                             "exp": int(now + self.access_ttl_s)})
        jti = uuid.uuid4().hex
        exp = int(now + self.refresh_ttl_s)
        refresh = self._sign({"sub": subject, "typ": "refresh",
                              "iat": int(now), "jti": jti,
                              "exp": exp})
        with self._lock:
            # the cache is bounded by construction: expired entries are
            # swept on every issue, so repeated logins without logout
            # (the common API-client pattern) cannot grow it unboundedly
            cut = time.time()
            for k in [k for k, (_t, e) in self._refresh.items()
                      if e < cut]:
                del self._refresh[k]
            self._refresh[jti] = (refresh, exp)
        return access, refresh

    def login(self, login_name: str, password: str) -> tuple[str, str]:
        if not self.check_password(login_name, password):
            raise AuthError("user not found or wrong password")
        user, _proxy, _ = parse_proxy_login(login_name)
        return self.issue_tokens(user)

    def verify_access(self, token: str,
                      allow_expired: bool = False) -> dict:
        claims = self._decode(token, allow_expired=allow_expired)
        if claims.get("typ") != "access":
            raise AuthError("not an access token")
        return claims

    def relogin(self, refresh_token: str) -> tuple[str, str]:
        claims = self._decode(refresh_token)
        if claims.get("typ") != "refresh":
            raise AuthError("not verified refresh token")
        jti = claims.get("jti", "")
        with self._lock:
            rec = self._refresh.get(jti)
            if rec is None:
                raise AuthError("refresh token not found")
            if rec[0] != refresh_token:
                raise AuthError("invalid refresh token")
            # rotation: the old refresh token dies with this exchange
            del self._refresh[jti]
        return self.issue_tokens(claims["sub"])

    def logout(self, refresh_token: str) -> None:
        try:
            claims = self._decode(refresh_token, allow_expired=True)
        except AuthError:
            return
        with self._lock:
            self._refresh.pop(claims.get("jti", ""), None)

    # ------------------------------------------------------------ api keys

    def _key_sig(self, key_id: str, nb: int, na: int) -> str:
        return hmac.new(self.secret, f"{key_id}:{nb}:{na}".encode(),
                        hashlib.sha256).hexdigest()

    def gen_key(self, key_id: str, not_before: int = 0,
                not_after: int = 0) -> dict:
        """Create a client key; the token is returned ONCE (the server
        stores only the validity record it re-derives the sig from)."""
        key_id = key_id.lower()
        if not _KEY_ID_RE.match(key_id):
            raise AuthError(
                "id contains invalid letter, use only alphnum and _.@-")
        nb = int(not_before) or int(time.time())
        na = int(not_after)
        if na <= nb:
            na = int(time.time() + 10 * 365 * 24 * 3600)   # 10 years
        with self._lock:
            if key_id in self._keys:
                raise AuthError(f"'{key_id}' is duplicate id.")
            self._keys[key_id] = {"id": key_id, "notBefore": nb,
                                  "notAfter": na}
        return {"id": key_id, "notBefore": nb, "notAfter": na,
                "token": f"{key_id}:b:{self._key_sig(key_id, nb, na)}"}

    def list_keys(self) -> list[dict]:
        with self._lock:
            return [dict(v, idx=i) for i, v in
                    enumerate(self._keys.values())]

    def del_key(self, key_id: str) -> bool:
        with self._lock:
            return self._keys.pop(key_id.lower(), None) is not None

    def validate_client_token(self, token: str) -> bool:
        parts = token.split(":", 2)
        if len(parts) != 3 or parts[1] != "b":
            return False
        with self._lock:
            rec = self._keys.get(parts[0])
        if rec is None:
            return False
        now = time.time()
        if not (rec["notBefore"] <= now <= rec["notAfter"]):
            return False
        want = self._key_sig(rec["id"], rec["notBefore"], rec["notAfter"])
        return hmac.compare_digest(want, parts[2])
