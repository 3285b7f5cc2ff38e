"""Property-based check of the WARC record walker (llm/warc.py
_warc_records) against independently constructed archives: random
record chains (any type/URI, payload bytes that include CRLFs and
embedded 'WARC/' strings, folded continuation headers, junk header
lines, varying header order) must split into exactly the records the
generator wrote, byte-for-byte. Corruption (truncation, bad or missing
Content-Length, garbage tails) must end the walk at the last
well-formed record — never loop, raise, or over-read."""

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_tool_spark.llm.warc import _warc_records


def record(rtype: str, uri: str | None, block: bytes,
           fold_uri: bool = False, junk_line: bool = False) -> bytes:
    lines = [b"WARC/1.0", b"WARC-Type: " + rtype.encode()]
    if uri is not None:
        if fold_uri and " " not in uri and len(uri) > 4:
            # RFC-5322-style folding: value continues on an indented line
            lines.append(b"WARC-Target-URI: " + uri[:4].encode())
            lines.append(b"  " + uri[4:].encode())
        else:
            lines.append(b"WARC-Target-URI: " + uri.encode())
    if junk_line:
        lines.append(b"this line has no colon and must be tolerated")
    lines.append(b"Content-Length: " + str(len(block)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + block + b"\r\n\r\n"


_block = st.binary(max_size=40).map(
    lambda b: b + b"\r\n\r\nWARC/1.0 fake")  # framing must ignore payload


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["response", "request",
                                           "warcinfo", "conversion"]),
                          st.one_of(st.none(),
                                    st.text(alphabet="abcxyz:/.-",
                                            min_size=1, max_size=30)),
                          _block,
                          st.booleans(), st.booleans()),
                min_size=0, max_size=6))
def test_walker_matches_generator(recs):
    b = b"".join(record(t, u, blk, fold, junk)
                 for t, u, blk, fold, junk in recs)
    got = _warc_records(b)
    assert len(got) == len(recs)
    for i, ((t, u, blk, fold, junk), g) in enumerate(zip(recs, got)):
        idx, version, rtype, uri, clen, block = g
        exp_uri = None if u is None else (u[:4] + " " + u[4:]
                                          if fold and " " not in u
                                          and len(u) > 4 else u)
        assert (idx, version, rtype, uri, clen, block) == \
            (i, "1.0", t, exp_uri, len(blk), blk)


@settings(max_examples=80, deadline=None)
@given(blk=st.binary(max_size=30), cut=st.integers(0, 200))
def test_truncation_keeps_whole_prefix(blk, cut):
    full = record("response", "a/b", blk) + record("request", None, b"xy")
    got = _warc_records(full[:cut])
    # only COMPLETE records may appear, in order, byte-exact
    assert len(got) <= 2
    if got:
        assert got[0][5] == blk
    if len(got) == 2:
        assert got[1][5] == b"xy"


def test_bad_length_and_garbage_stop_the_walk():
    ok = record("response", "u", b"payload")
    assert len(_warc_records(ok + b"WARC/1.0\r\nContent-Length: oops"
                             b"\r\n\r\nx")) == 1
    assert len(_warc_records(ok + b"WARC/1.0\r\nWARC-Type: request"
                             b"\r\n\r\nno length")) == 1
    # declared length escapes the buffer -> that record is dropped
    assert len(_warc_records(ok + b"WARC/1.0\r\nContent-Length: 9999"
                             b"\r\n\r\nshort")) == 1
    assert _warc_records(b"HTTP/1.1 200 OK\r\n\r\n") == []
    assert _warc_records(b"") == []


def test_header_names_case_insensitive():
    b = (b"WARC/1.1\r\nwarc-type: RESPONSE\r\ncontent-length: 2\r\n"
         b"WARC-TARGET-URI: U\r\n\r\nhi\r\n\r\n")
    got = _warc_records(b)
    assert got == [(0, "1.1", "RESPONSE", "U", 2, b"hi")]


def _gz(data: bytes) -> bytes:
    import gzip
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(data)
    return buf.getvalue()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(max_size=60), min_size=0, max_size=5))
def test_gzip_member_split_roundtrip(members):
    from etl_tool_spark.llm.warc import _gzip_members

    blob = b"".join(_gz(m) for m in members)
    assert _gzip_members(blob) == members


def test_gzip_member_corruption_keeps_prefix():
    from etl_tool_spark.llm.warc import _gzip_members

    good = _gz(b"alpha") + _gz(b"beta")
    assert _gzip_members(good + b"\x1f\x8bgarbage") == [b"alpha", b"beta"]
    assert _gzip_members(good + _gz(b"tail")[:8]) == [b"alpha", b"beta"]
    assert _gzip_members(b"not gzip at all") == []


def test_warc_records_gz_matches_plain(spark):
    """Member-gzipped parsing ≡ plain parsing of the concatenated
    records, driven through the Spark mapInPandas path end-to-end."""
    from pyspark.sql import functions as F

    from etl_tool_spark.llm.warc import warc_records, warc_records_gz

    recs = [record("response", f"u/{i}", f"body {i}".encode())
            for i in range(3)]
    plain = b"".join(recs)
    gz = b"".join(_gz(r) for r in recs)
    df = spark.createDataFrame([(1, plain), (2, gz)],
                               "media_id long, payload binary")
    got_plain = (warc_records(df.filter(F.col("media_id") == 1))
                 .orderBy("rec_index").collect())
    got_gz = (warc_records_gz(df.filter(F.col("media_id") == 2))
              .orderBy("rec_index").collect())
    assert len(got_plain) == len(got_gz) == 3
    for a, b in zip(got_plain, got_gz):
        assert (a["rec_index"], a["warc_type"], a["target_uri"],
                a["content_length"], bytes(a["block"])) == \
               (b["rec_index"], b["warc_type"], b["target_uri"],
                b["content_length"], bytes(b["block"]))


def test_content_length_must_be_ascii_digits():
    # int()-leniency guard: '+12', '1_2' and non-ASCII numerals must END
    # the walk (mis-framing corrupts every later record), not parse
    for bad in [b"+12", b"1_2", b"\xef\xbc\x91\xef\xbc\x92"]:  # ＋fullwidth
        blob = (b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: "
                + bad + b"\r\n\r\n" + b"x" * 20)
        assert _warc_records(blob) == []
