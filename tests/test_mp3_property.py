"""Property-based check of the MPEG audio frame-header walker
(llm/multimodal.py _mp3_info) against an independent reference model of
the public ISO/IEC 11172-3 / 13818-3 header layout: random well-formed
frame sequences (any version/layer/sample-rate, per-frame bitrate and
padding) must yield exact frame counts, accumulated duration, first-
frame metadata and the VBR flag — with leading non-sync garbage
resynced past, trailing garbage ignored, and ID3v2 tags skipped by
their syncsafe size. The test rebuilds headers and expected values from
its own copy of the spec tables, so a transcription error in either
side surfaces as a disagreement."""

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_tool_spark.llm.multimodal import _mp3_info

# independent copies of the public spec tables (deliberately restated,
# not imported, so the test cross-checks the implementation's tables)
BITRATES = {
    ("1", 1): [32, 64, 96, 128, 160, 192, 224, 256,
               288, 320, 352, 384, 416, 448],
    ("1", 2): [32, 48, 56, 64, 80, 96, 112, 128,
               160, 192, 224, 256, 320, 384],
    ("1", 3): [32, 40, 48, 56, 64, 80, 96, 112,
               128, 160, 192, 224, 256, 320],
    ("2", 1): [32, 48, 56, 64, 80, 96, 112, 128,
               144, 160, 176, 192, 224, 256],
    ("2", 2): [8, 16, 24, 32, 40, 48, 56, 64,
               80, 96, 112, 128, 144, 160],
}
BITRATES[("2", 3)] = BITRATES[("2", 2)]
SAMPLERATES = {"1": (44100, 48000, 32000),
               "2": (22050, 24000, 16000),
               "2.5": (11025, 12000, 8000)}
VER_BITS = {"1": 3, "2": 2, "2.5": 0}
LAYER_BITS = {1: 3, 2: 2, 3: 1}


def build_frame(version, layer, br_idx, sr_idx, pad, mono):
    br = BITRATES[("1" if version == "1" else "2", layer)][br_idx - 1]
    sr = SAMPLERATES[version][sr_idx]
    if layer == 1:
        spf = 384
        flen = (12 * br * 1000 // sr + pad) * 4
    else:
        spf = 1152 if (layer == 2 or version == "1") else 576
        flen = (144 if (layer == 2 or version == "1") else 72) \
            * br * 1000 // sr + pad
    b1 = 0xE0 | (VER_BITS[version] << 3) | (LAYER_BITS[layer] << 1) | 1
    b2 = (br_idx << 4) | (sr_idx << 2) | (pad << 1)
    b3 = (3 << 6) if mono else 0
    hdr = bytes([0xFF, b1, b2, b3])
    return hdr + bytes(max(flen, 4) - 4), br, sr, spf


streams = st.tuples(
    st.sampled_from(["1", "2", "2.5"]),
    st.sampled_from([1, 2, 3]),
    st.integers(0, 2),                                   # sample-rate idx
    st.booleans(),                                       # mono?
    st.lists(st.tuples(st.integers(1, 14),               # bitrate idx
                       st.integers(0, 1)),               # padding bit
             min_size=1, max_size=8),
    st.integers(0, 6),                                   # leading junk len
    st.booleans(),                                       # ID3v2 tag?
    st.booleans(),                                       # trailing junk?
)


@settings(max_examples=200, deadline=None)
@given(streams)
def test_mp3_walker_matches_reference_model(s):
    version, layer, sr_idx, mono, frames, junk_n, id3, trail = s
    payload = b""
    if id3:
        tag_body = 17
        payload += (b"ID3" + bytes([4, 0, 0])
                    + bytes([0, 0, tag_body >> 7, tag_body & 0x7F])
                    + bytes(tag_body))
    # leading junk must not contain a sync byte; zeros are safe
    payload += bytes(junk_n)
    exp_dur = 0.0
    exp_rates = set()
    first = None
    for br_idx, pad in frames:
        blob, br, sr, spf = build_frame(version, layer, br_idx, sr_idx,
                                        pad, mono)
        payload += blob
        exp_dur += spf / sr
        exp_rates.add(br)
        if first is None:
            first = (version, layer, br, sr, 1 if mono else 2)
    if trail:
        payload += b"\x01\x02\x03"                       # non-sync tail
    got = _mp3_info(payload)
    assert got == (*first, len(frames), round(exp_dur, 3),
                   len(exp_rates) > 1)


def test_mp3_walker_rejects_junk_only():
    assert _mp3_info(b"") is None
    assert _mp3_info(bytes(64)) is None
    assert _mp3_info(b"ID3" + bytes([4, 0, 0, 0, 0, 0, 0])) is None
    # sync pattern with forbidden bitrate index (0xF) is not a frame
    assert _mp3_info(bytes([0xFF, 0xFB, 0xF0, 0x00]) + bytes(40)) is None
