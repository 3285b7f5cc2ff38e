"""Property-based check of the FLAC metadata walker (llm/multimodal.py
_flac_info) against an independently constructed metadata chain: random
well-formed streams (any rate/channels/bit depth/total-samples, extra
padding/application/vorbis-comment blocks before and after STREAMINFO,
unknown block types) must yield exactly the fields the generator
encoded. The builder restates the public FLAC layout (xiph.org /
RFC 9639) with its own bit packing, so a transcription error in either
side surfaces as a disagreement. Corruption cases (truncation, lying
block lengths, missing magic, missing STREAMINFO) must degrade to
None/partial, never loop or raise."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_tool_spark.llm.multimodal import _flac_info


def streaminfo(sr: int, ch: int, bps: int, tot: int) -> bytes:
    packed = (sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | tot
    return (struct.pack(">HH", 4096, 4096) + bytes(3) + bytes(3)
            + struct.pack(">Q", packed) + bytes(16))


def block(btype: int, payload: bytes, last: bool) -> bytes:
    return (bytes([(0x80 if last else 0) | btype])
            + len(payload).to_bytes(3, "big") + payload)


def junk(seed: int) -> bytes:
    # padding / application / an unknown reserved type — must be stepped
    # over by length, its bytes never interpreted
    body = bytes((seed * 13 + i) % 251 for i in range(seed % 17))
    return block([1, 2, 4, 5, 6, 99][seed % 6], body, last=False)


@settings(max_examples=120, deadline=None)
@given(sr=st.integers(1, 2 ** 20 - 1), ch=st.integers(1, 8),
       bps=st.integers(4, 32), tot=st.integers(0, 2 ** 36 - 1),
       pre=st.integers(0, 3), post=st.integers(0, 3),
       seed=st.integers(0, 10 ** 6))
def test_walker_matches_generator(sr, ch, bps, tot, pre, post, seed):
    blocks = [junk(seed + i) for i in range(pre)]
    blocks.append(block(0, streaminfo(sr, ch, bps, tot), last=post == 0))
    blocks += [junk(seed * 3 + i) for i in range(post)]
    if post:
        # re-flag the true last block
        blocks[-1] = bytes([blocks[-1][0] | 0x80]) + blocks[-1][1:]
    b = b"fLaC" + b"".join(blocks)
    got = _flac_info(b)
    exp_dur = round(tot / sr, 3) if tot else None
    assert got == (sr, ch, bps, tot, exp_dur, pre + 1 + post)


@settings(max_examples=60, deadline=None)
@given(tot=st.integers(1, 2 ** 36 - 1), cut=st.integers(0, 41))
def test_truncation_never_raises(tot, cut):
    # full stream is 4 magic + 4 header + 34 payload = 42 bytes; every
    # strict prefix must parse to None without raising
    b = (b"fLaC" + block(0, streaminfo(44100, 2, 16, tot), last=True))[:cut]
    got = _flac_info(b)
    assert got is None


@settings(max_examples=60, deadline=None)
@given(lie=st.integers(40, 2 ** 24 - 1), seed=st.integers(0, 10 ** 6))
def test_lying_length_ends_walk(lie, seed):
    # first block claims more bytes than exist: the walk must stop
    # without over-reading; STREAMINFO is never reached → None
    b = (b"fLaC" + bytes([0x04]) + lie.to_bytes(3, "big")
         + bytes(seed % 30))
    assert _flac_info(b) is None


def test_missing_magic_and_zero_total():
    assert _flac_info(b"NOPE" + block(0, streaminfo(8000, 1, 8, 5), True)) \
        is None
    assert _flac_info(b"fLa") is None
    # total == 0 means 'unknown' per spec: fields parse, duration None
    got = _flac_info(b"fLaC" + block(0, streaminfo(48000, 2, 24, 0), True))
    assert got == (48000, 2, 24, 0, None, 1)


def test_first_streaminfo_wins():
    # a second (spec-illegal) STREAMINFO must not overwrite the first
    b = (b"fLaC" + block(0, streaminfo(44100, 2, 16, 441), False)
         + block(0, streaminfo(8000, 1, 8, 80), True))
    assert _flac_info(b) == (44100, 2, 16, 441, round(441 / 44100, 3), 2)
