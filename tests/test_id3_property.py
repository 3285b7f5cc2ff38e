"""Property-based check of the ID3v2 tag walker (llm/multimodal.py
_id3v2_tags) against independently constructed tags: random v2.3/v2.4
tags (syncsafe tag sizes, per-version frame-size encodings, latin1/
utf-8/utf-16 text encodings, unknown frames interleaved, trailing
padding, optional extended header) must yield the exact version,
first-seen title/artist/album, and frame count the generator encoded.
Corruption (truncation, arbitrary bytes, non-ID3 payloads) must return
None or partial data — never raise."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_tool_spark.llm.multimodal import _id3v2_tags


def syncsafe(n: int) -> bytes:
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])


def frame(major: int, fid: bytes, body: bytes) -> bytes:
    size = (syncsafe(len(body)) if major == 4
            else struct.pack(">I", len(body)))
    return fid + size + b"\x00\x00" + body


def text_body(enc: int, s: str) -> bytes:
    codec = {0: "latin1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}[enc]
    return bytes([enc]) + s.encode(codec)


texts = st.text(alphabet="abcXYZ 09-", min_size=0, max_size=12)


@settings(max_examples=150, deadline=None)
@given(major=st.sampled_from([3, 4]),
       title=st.one_of(st.none(), texts),
       artist=st.one_of(st.none(), texts),
       album=st.one_of(st.none(), texts),
       enc=st.sampled_from([0, 1, 2, 3]),
       junk_frames=st.integers(0, 3),
       padding=st.integers(0, 16),
       ext_header=st.booleans())
def test_walker_matches_constructed_tag(major, title, artist, album, enc,
                                        junk_frames, padding, ext_header):
    body = b""
    n = 0
    if ext_header:
        # v2.4: syncsafe size INCLUDING itself; v2.3: size excluding
        body_ext = (syncsafe(6) + b"\x01\x00" if major == 4
                    else struct.pack(">I", 6) + b"\x00\x00" + bytes(4))
        # note: prepended to the frame area, not counted as a frame
    else:
        body_ext = b""
    for _ in range(junk_frames):
        body += frame(major, b"TXXX", text_body(0, "k\x00v"))
        n += 1
    for fid, s in ((b"TIT2", title), (b"TPE1", artist), (b"TALB", album)):
        if s is not None:
            body += frame(major, fid, text_body(enc, s))
            n += 1
    tag_size = len(body_ext) + len(body) + padding
    flags = 0x40 if ext_header else 0
    blob = (b"ID3" + bytes([major, 0, flags]) + syncsafe(tag_size)
            + body_ext + body + bytes(padding) + b"\xff\xfbtrailing audio")
    got = _id3v2_tags(blob)
    want = (f"2.{major}.0", title, artist, album, n)
    assert got == want


@settings(max_examples=100, deadline=None)
@given(data=st.binary(max_size=64), cut=st.integers(0, 80))
def test_corrupt_input_never_raises(data, cut):
    _id3v2_tags(data)
    valid = (b"ID3\x03\x00\x00" + syncsafe(25)
             + frame(3, b"TIT2", text_body(0, "hello world!")))
    _id3v2_tags(valid[:cut])
    assert _id3v2_tags(b"no tag here") is None
    # size field claiming more than the buffer holds
    assert _id3v2_tags(b"ID3\x04\x00\x00" + syncsafe(10_000)
                       + b"TIT2") is not None  # header valid, 0 frames
