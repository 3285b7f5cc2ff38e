"""Utility helpers mirroring internal/util/util.go: env-var expansion
(shared with plans.config) and credential masking for logs."""

from __future__ import annotations

import re

__all__ = ["mask_credentials", "mask_sensitive_fields", "SENSITIVE_KEY_RE"]

# key-name patterns considered sensitive (util.go:108-156)
SENSITIVE_KEY_RE = re.compile(
    r"password|secret|token|key|auth|credential|pass|pwd", re.IGNORECASE)

_URI_CRED_RE = re.compile(r"(//[^/@:]+):[^@/]+@")
_KV_CRED_RE = re.compile(
    r"\b(password|pwd|secret|token)(\s*=\s*)([^\s;&]+)", re.IGNORECASE)


def mask_credentials(uri: str) -> str:
    """Mask the password in connection URIs (postgres://u:pw@h/db →
    postgres://u:****@h/db) and in key=value conn strings
    (util.go:69-106)."""
    masked = _URI_CRED_RE.sub(r"\1:****@", uri)
    return _KV_CRED_RE.sub(r"\1\2****", masked)


def mask_sensitive_fields(record: dict) -> dict:
    """Mask values of sensitive-looking keys before logging a record
    (util.go:108-156)."""
    return {k: ("****" if SENSITIVE_KEY_RE.search(k) and v is not None else v)
            for k, v in record.items()}
