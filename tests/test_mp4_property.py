"""Property-based check of the ISO-BMFF box walker (llm/multimodal.py
_mp4_info) against an independently constructed box tree: random
well-formed containers (v0/v1 movie headers, any track mix, unknown
boxes interleaved at every level, 64-bit largesize headers, traks with
missing hdlr/stsd) must yield the exact brand, timescale, duration,
track count, and first video/audio sample-entry fourccs the generator
encoded. The builder restates the public ISO/IEC 14496-12 layout with
its own struct packing, so a transcription error in either side
surfaces as a disagreement. Corruption cases (truncation, lying box
sizes) must degrade, never loop or raise."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_tool_spark.llm.multimodal import _mp4_info


def box(fourcc: bytes, payload: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return (struct.pack(">I", 1) + fourcc
                + struct.pack(">Q", 16 + len(payload)) + payload)
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def junk_box(seed: int) -> bytes:
    # an unknown box type the walker must step over, not parse
    return box(b"free", bytes((seed * 7 + i) % 251 for i in range(seed % 9)))


def mvhd(version: int, timescale: int, dur: int) -> bytes:
    if version == 1:
        body = (bytes([1]) + bytes(3) + bytes(16)
                + struct.pack(">I", timescale) + struct.pack(">Q", dur)
                + bytes(80))
    else:
        body = (bytes(4) + bytes(8)
                + struct.pack(">I", timescale) + struct.pack(">I", dur)
                + bytes(80))
    return box(b"mvhd", body)


def trak(handler: bytes | None, codec: bytes | None, seed: int) -> bytes:
    inner = box(b"tkhd", bytes(84))
    mdia = b""
    if handler is not None:
        mdia += box(b"hdlr", bytes(8) + handler + bytes(12) + b"\x00")
    if codec is not None:
        stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1)
                   + box(codec, bytes(seed % 5)))
        mdia += box(b"minf", junk_box(seed) + box(b"stbl", stsd))
    return box(b"trak", inner + junk_box(seed + 1) + box(b"mdia", mdia))


tracks = st.lists(
    st.tuples(st.sampled_from([b"vide", b"soun", b"text", None]),
              st.sampled_from([b"avc1", b"hev1", b"mp4a", b"opus", None]),
              st.integers(0, 20)),
    min_size=0, max_size=4)


@settings(max_examples=200, deadline=None)
@given(brand=st.sampled_from([b"isom", b"mp42", b"qt  ", None]),
       version=st.sampled_from([0, 1]),
       timescale=st.integers(1, 1_000_000),
       dur=st.integers(0, 2**40),
       tks=tracks,
       large_moov=st.booleans(),
       seed=st.integers(0, 100))
def test_walker_matches_constructed_tree(brand, version, timescale, dur,
                                         tks, large_moov, seed):
    if version == 0:
        dur %= 2**32
    blob = b""
    if brand is not None:
        blob += box(b"ftyp", brand + struct.pack(">I", 0) + b"iso2mp41")
    blob += junk_box(seed)
    moov = junk_box(seed + 2) + mvhd(version, timescale, dur)
    want_v = want_a = None
    for handler, codec, s in tks:
        moov += trak(handler, codec, s)
        got_codec = codec.decode("latin1") if codec is not None else None
        if handler == b"vide" and want_v is None:
            want_v = got_codec
        elif handler == b"soun" and want_a is None:
            want_a = got_codec
    blob += box(b"moov", moov, largesize=large_moov)
    blob += junk_box(seed + 3)

    got = _mp4_info(blob)
    want_brand = brand.decode("latin1").strip() if brand else None
    assert got == (want_brand, timescale, round(dur / timescale, 3),
                   len(tks), want_v, want_a)


@settings(max_examples=100, deadline=None)
@given(data=st.binary(max_size=64), cut=st.integers(0, 200))
def test_corrupt_input_never_raises(data, cut):
    """Arbitrary bytes, truncated valid files, and lying box sizes must
    return None or partial metadata — never raise, never hang."""
    _mp4_info(data)
    valid = (box(b"ftyp", b"isom" + bytes(4))
             + box(b"moov", mvhd(0, 1000, 5000) + trak(b"vide", b"avc1", 3)))
    _mp4_info(valid[:cut])
    # a box claiming to be bigger than the buffer
    lying = struct.pack(">I", 10_000) + b"moov" + data
    assert _mp4_info(lying) is None
