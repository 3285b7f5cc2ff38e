"""WARC (Web ARChive, ISO 28500) record extraction — the container
format of Common Crawl and every serious web-crawl corpus, and
therefore the FIRST pass of an LLM crawl-ingestion pipeline: split
each archive blob into its records (warcinfo / request / response /
conversion …), surface the WARC headers that drive routing
(type, target URI, declared length), and hand the payload block to the
downstream extractors (html_to_text, language ID, quality scoring).

Parsing is pure struct/text per the public spec: a version line
(``WARC/1.0`` | ``1.1``), CRLF-terminated ``Name: value`` headers
(case-insensitive names, RFC-5322-style folded continuation lines)
until an empty line, then exactly ``Content-Length`` payload octets,
then a CRLF CRLF separator. Length-driven framing means payloads
containing ``WARC/`` or bare CRLFs can never confuse the walk, and any
declared length that would escape the buffer ends the walk — corrupt
input degrades to a record prefix, never loops, raises, or over-reads.

Scale shape: one Arrow ``mapInPandas`` over (id, payload) — map-side,
no shuffle, scales with executors; with payloads in their own parquet
column the scan prunes everything else. One input archive fans out to
one output row per record (explode-shaped, still map-side).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["WARC_SCHEMA", "warc_records", "warc_records_gz",
           "two_record_archive"]

WARC_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("rec_index", T.IntegerType(), False),
    T.StructField("warc_version", T.StringType(), True),
    T.StructField("warc_type", T.StringType(), True),
    T.StructField("target_uri", T.StringType(), True),
    T.StructField("content_length", T.LongType(), True),
    T.StructField("block", T.BinaryType(), True),
])


def _warc_records(b: bytes):
    """All well-formed leading records of one WARC blob as
    (index, version, type, uri, declared-length, block) tuples. Stops
    (returning what it has) at the first malformed version line,
    unterminated header, missing/invalid Content-Length, or a length
    that escapes the buffer."""
    out = []
    pos = 0
    while True:
        while b[pos:pos + 2] == b"\r\n":        # inter-record separators
            pos += 2
        if b[pos:pos + 5] != b"WARC/":
            break
        eol = b.find(b"\r\n", pos)
        if eol < 0:
            break
        version = b[pos + 5:eol].decode("latin1", "replace")
        pos = eol + 2
        hdrs: dict[str, str] = {}
        last_key = None
        ok = False
        while True:
            eol = b.find(b"\r\n", pos)
            if eol < 0:
                break
            line = b[pos:eol]
            pos = eol + 2
            if line == b"":
                ok = True
                break
            if line[:1] in (b" ", b"\t") and last_key is not None:
                # folded continuation line: append to the previous value
                hdrs[last_key] += " " + line.strip().decode("latin1",
                                                            "replace")
                continue
            key, sep, val = line.partition(b":")
            if not sep:
                continue                          # tolerate a junk line
            last_key = key.strip().lower().decode("latin1", "replace")
            hdrs[last_key] = val.strip().decode("latin1", "replace")
        if not ok:
            break
        # strict ASCII-digit parse: Python's int() accepts '+12', '1_2',
        # and Unicode digits, any of which would mis-FRAME the record
        # (wrong block offset for every record after it) instead of
        # ending the walk as the corrupt-input contract promises
        clen_s = hdrs.get("content-length", "")
        if not clen_s or not all("0" <= ch <= "9" for ch in clen_s):
            break
        clen = int(clen_s)
        if clen < 0 or pos + clen > len(b):
            break
        out.append((len(out), version, hdrs.get("warc-type"),
                    hdrs.get("warc-target-uri"), clen, b[pos:pos + clen]))
        pos += clen
    return out


def warc_records(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Explode WARC archive blobs into one row per record:
    (media_id, rec_index, warc_version, warc_type, target_uri,
    content_length, block). Null/corrupt payloads yield their parseable
    prefix (possibly zero rows) — triage filters on record count."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    recs = _warc_records(bytes(payload))
                except Exception:
                    recs = []
                out.extend((media_id, *r) for r in recs)
            yield pd.DataFrame(out, columns=[f.name for f in
                                             WARC_SCHEMA.fields])

    return df.select("media_id", payload_col).mapInPandas(run, WARC_SCHEMA)


def _gzip_members(b: bytes):
    """Split a concatenation of gzip members (the Common Crawl layout:
    one member per WARC record) and decompress each with stdlib zlib.
    Returns the list of decompressed members for the well-formed
    prefix; garbage after the last complete member ends the walk."""
    import zlib

    out = []
    pos = 0
    while pos + 2 <= len(b) and b[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)          # gzip wrapper
        try:
            data = d.decompress(b[pos:])
        except zlib.error:
            break
        if not d.eof:
            break                                  # truncated member
        out.append(data)
        consumed = len(b) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return out


def warc_records_gz(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """warc_records over member-gzipped archives (the on-disk Common
    Crawl format: each WARC record is its own gzip member, so ranges
    can be fetched and decompressed independently). Each member is
    inflated with stdlib zlib and its records parsed; rec_index numbers
    records across the whole archive in member order. Same map-side
    Arrow shape as warc_records — decompression is per-row CPU that
    scales with executors, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    members = _gzip_members(bytes(payload))
                except Exception:
                    members = []
                idx = 0
                for m in members:
                    try:
                        recs = _warc_records(m)
                    except Exception:
                        recs = []
                    for _, version, rtype, uri, clen, block in recs:
                        out.append((media_id, idx, version, rtype, uri,
                                    clen, block))
                        idx += 1
            yield pd.DataFrame(out, columns=[f.name for f in
                                             WARC_SCHEMA.fields])

    return df.select("media_id", payload_col).mapInPandas(run, WARC_SCHEMA)


def two_record_archive(uri: Column, body: Column) -> Column:
    """Synthesize a two-record WARC archive (a constant warcinfo record
    + a response record with ``uri`` and ``body``) as a binary Column —
    Content-Length computed in-plan as octet_length, so the whole
    archive is one pure-Column concat. Shared by the oracle-checked
    catalog rows (llm_warc_extract, llm_crawl_ingest) and the crawl
    example so the framing template exists exactly once and cannot
    drift between the proved DAG and the demo."""
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: warcinfo\r\n"
              "Content-Length: 12\r\n\r\nsoftware: x\n\r\n\r\n"),
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        uri,
        F.lit("\r\nContent-Length: "),
        F.octet_length(body).cast("string"),
        F.lit("\r\n\r\n"), body, F.lit("\r\n\r\n")).cast("binary")
