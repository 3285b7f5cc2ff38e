"""Utility helpers mirroring internal/util/util.go: env-var expansion
(shared with plans.config) and credential masking for logs."""

from __future__ import annotations

import re

__all__ = ["mask_credentials", "mask_sensitive_fields", "SENSITIVE_KEY_RE",
           "require_local_store"]

_URI_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def require_local_store(path: str, what: str = "incremental store") -> str:
    """The raw-parquet incremental stores (minhash/simhash/embedding
    signatures, CDC versions, batch markers) read their part-file lists
    with local ``glob`` and write markers with local ``open`` — on an
    object-store URI (s3a://, hdfs://) those calls silently see an EMPTY
    store, so dedup misses the whole prior corpus and the
    effectively-once replay guard never engages. Fail loudly instead.
    ``file://`` URIs are rejected too (glob does not strip the scheme);
    pass the plain path. A production deployment would use a table
    format with real snapshot isolation (Iceberg/Delta) for these
    stores, at which point this guard moves into the table client."""
    if _URI_SCHEME_RE.match(path):
        raise NotImplementedError(
            f"{what} at {path!r}: raw-parquet stores are local-filesystem"
            "-only (glob/open based); use a local path, or back the store "
            "with a snapshot-isolated table format for object storage")
    return path

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
