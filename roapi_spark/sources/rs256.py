"""Pure-stdlib RS256 (RSASSA-PKCS1-v1_5 with SHA-256) JWT signing for the
Google service-account OAuth2 flow.

The reference mints service-account tokens through yup-oauth2
(columnq/src/table/google_spreadsheets.rs:94-149,
ServiceAccountAuthenticator + the jwt-bearer grant). This container has no
crypto library, but RSA signing is just modular exponentiation and
PKCS#1 v1.5 padding is fixed bytes — both expressible with ints and
hashlib — so the flow needs no dependency:

- PEM -> DER (base64), minimal DER walker for PKCS#8 / PKCS#1 private keys
- EMSA-PKCS1-v1_5 encoding with the SHA-256 DigestInfo prefix
- signature = EM^d mod n
- JWT assembly (base64url header.claims.signature) and the
  urn:ietf:params:oauth:grant-type:jwt-bearer exchange against token_uri

Verification in tests is the real public-key operation (sig^e mod n must
reproduce EM exactly), not a mock.
"""

from __future__ import annotations

import base64
import hashlib
import json
import time
import urllib.parse
import urllib.request

GOOGLE_TOKEN_URI = "https://oauth2.googleapis.com/token"
SHEETS_SCOPE = "https://www.googleapis.com/auth/spreadsheets.readonly"

# DigestInfo prefix for SHA-256 (RFC 8017 §9.2 notes)
_SHA256_PREFIX = bytes.fromhex("3031300d060960864801650304020105000420")


class KeyError_(ValueError):
    """Malformed PEM/DER private key."""


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _der_node(buf: bytes, off: int) -> tuple[int, bytes, int]:
    """One TLV: returns (tag, content, offset-after)."""
    if off + 2 > len(buf):
        raise KeyError_("truncated DER")
    tag, length = buf[off], buf[off + 1]
    off += 2
    if length & 0x80:
        nb = length & 0x7F
        length = int.from_bytes(buf[off : off + nb], "big")
        off += nb
    if off + length > len(buf):
        raise KeyError_("truncated DER content")
    return tag, buf[off : off + length], off + length


def _der_children(content: bytes) -> list[tuple[int, bytes]]:
    out, off = [], 0
    while off < len(content):
        tag, body, off = _der_node(content, off)
        out.append((tag, body))
    return out


def rsa_key_from_pem(pem: str) -> tuple[int, int, int]:
    """Parse an (unencrypted) PKCS#8 ``PRIVATE KEY`` or PKCS#1
    ``RSA PRIVATE KEY`` PEM into (n, e, d)."""
    lines = [ln.strip() for ln in pem.strip().splitlines()]
    if not lines or "-----BEGIN" not in lines[0]:
        raise KeyError_("not a PEM private key")
    kind = lines[0]
    der = base64.b64decode("".join(ln for ln in lines if "-----" not in ln))
    tag, content, _ = _der_node(der, 0)
    if tag != 0x30:
        raise KeyError_("expected top-level SEQUENCE")
    if "RSA PRIVATE KEY" not in kind:  # PKCS#8: unwrap the OCTET STRING
        children = _der_children(content)
        octets = [body for t, body in children if t == 0x04]
        if not octets:
            raise KeyError_("PKCS#8 without private-key OCTET STRING")
        tag, content, _ = _der_node(octets[0], 0)
        if tag != 0x30:
            raise KeyError_("expected RSAPrivateKey SEQUENCE")
    ints = [
        int.from_bytes(body, "big") for t, body in _der_children(content) if t == 0x02
    ]
    if len(ints) < 4:
        raise KeyError_("RSAPrivateKey needs version, n, e, d")
    _version, n, e, d = ints[:4]
    return n, e, d


def emsa_pkcs1_v15_sha256(message: bytes, k: int) -> bytes:
    """EM = 0x00 0x01 PS 0x00 DigestInfo, |EM| = k (RFC 8017 §9.2)."""
    digest_info = _SHA256_PREFIX + hashlib.sha256(message).digest()
    ps_len = k - len(digest_info) - 3
    if ps_len < 8:
        raise KeyError_("modulus too small for SHA-256 PKCS#1 v1.5")
    return b"\x00\x01" + b"\xff" * ps_len + b"\x00" + digest_info


def sign_rs256(message: bytes, n: int, d: int) -> bytes:
    k = (n.bit_length() + 7) // 8
    em = int.from_bytes(emsa_pkcs1_v15_sha256(message, k), "big")
    return pow(em, d, n).to_bytes(k, "big")


def mint_jwt(
    key: dict, scope: str = SHEETS_SCOPE, now: int | None = None, lifetime: int = 3600
) -> str:
    """Service-account JWT assertion: RS256 over header.claims."""
    n, _e, d = rsa_key_from_pem(key["private_key"])
    iat = int(time.time()) if now is None else now
    header = {"alg": "RS256", "typ": "JWT"}
    if key.get("private_key_id"):
        header["kid"] = key["private_key_id"]
    claims = {
        "iss": key["client_email"],
        "scope": scope,
        "aud": key.get("token_uri", GOOGLE_TOKEN_URI),
        "iat": iat,
        "exp": iat + lifetime,
    }
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64url(json.dumps(claims, separators=(",", ":")).encode())
    )
    return signing_input + "." + _b64url(sign_rs256(signing_input.encode(), n, d))


def fetch_access_token(
    key: dict, scope: str = SHEETS_SCOPE, token_uri: str | None = None
) -> str:
    """jwt-bearer grant: POST the signed assertion, return access_token."""
    uri = token_uri or key.get("token_uri", GOOGLE_TOKEN_URI)
    body = urllib.parse.urlencode(
        {
            "grant_type": "urn:ietf:params:oauth:grant-type:jwt-bearer",
            "assertion": mint_jwt(key, scope=scope),
        }
    ).encode()
    req = urllib.request.Request(
        uri,
        data=body,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        payload = json.loads(resp.read())
    tok = payload.get("access_token")
    if not tok:
        raise KeyError_(f"token endpoint returned no access_token: {payload}")
    return tok
