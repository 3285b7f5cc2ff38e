"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed with Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch iteration, partition sizing) is
real and tested. Decode is REAL where the container allows it —
WAV/PCM via the stdlib wave module and uncompressed BMP via
struct+numpy (decode_wav_features / decode_bmp_features extract actual
signal/pixel features) — and STUBBED for compressed codecs
(JPEG/PNG/video need PIL/av, absent here): those stubs either raise
NotImplementedError (strict mode) or produce a deterministic fake so
pipelines exercise the full dataflow.

Scale notes: binary payloads dominate row size, so these operators
repartition by bytes not rows (``target_partition_mb``) before the UDF,
keeping Arrow batches bounded; metadata-only operations never touch the
binary column (column pruning drops it at the scan)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "attach_media_metadata", "decode_image_features",
           "sample_video_frames", "decode_wav_features",
           "decode_bmp_features"]

# canonical multimodal column bundle
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime_type", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("sha256", T.StringType(), True),
])

# features are double, not float: the stub derives them from digest bytes
# and float32 truncation would shift 6-dp rounding vs any double-computing
# oracle (0.31372549… float32-rounds up, double rounds down)
IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_index", T.IntegerType(), False),
    T.StructField("frame_sha256", T.StringType(), True),
])


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Pure-Column metadata: byte length + sha256 — no UDF, no decode."""
    return (df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long"))
              .withColumn("sha256", F.sha2(F.col(payload_col), 256)))


def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          strict: bool = False, feature_dim: int = 8) -> DataFrame:
    """Image decode + feature extraction via mapInPandas. STUB decode:
    deterministic pseudo-features from the payload's sha256 (or
    NotImplementedError in strict mode). The Arrow batch shape, output
    schema and partition-level parallelism are the real contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401
            have_pil = True
        except ImportError:
            have_pil = False
        for pdf in batches:
            if strict and not have_pil:
                raise NotImplementedError(
                    "image decode requires PIL — not available in this environment")
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None:
                    out.append((media_id, None, None, None))
                    continue
                digest = hashlib.sha256(bytes(payload)).digest()
                # deterministic fake: dims + features from digest bytes
                width = 1 + digest[0]
                height = 1 + digest[1]
                feat = [digest[2 + j] / 255.0 for j in range(feature_dim)]
                out.append((media_id, width, height, feat))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "feature"])

    return df.select("media_id", payload_col).mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def sample_video_frames(df: DataFrame, payload_col: str = "payload",
                        every_n: int = 10, max_frames: int = 3,
                        strict: bool = False) -> DataFrame:
    """Frame sampling via mapInPandas. STUB: fabricates ``max_frames``
    deterministic frame digests per payload (real impl would demux with
    av/ffmpeg). One output row per sampled frame — the fan-out shape the
    downstream pipeline must handle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "video demux requires av/ffmpeg — not available in this environment")
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None:
                    continue
                base = hashlib.sha256(bytes(payload)).hexdigest()
                for i in range(max_frames):
                    frame_digest = hashlib.sha256(f"{base}|{i * every_n}".encode()).hexdigest()
                    out.append((media_id, i * every_n, frame_digest))
            yield pd.DataFrame(out, columns=["media_id", "frame_index", "frame_sha256"])

    return df.select("media_id", payload_col).mapInPandas(run, FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
    T.StructField("rms", T.DoubleType(), True),
])

BMP_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("bits_per_pixel", T.IntegerType(), True),
    T.StructField("mean_pixel", T.DoubleType(), True),
])


def decode_wav_features(df: DataFrame,
                        payload_col: str = "payload") -> DataFrame:
    """REAL audio decode — WAV/PCM parses with the stdlib ``wave``
    module, so unlike the compressed-codec stubs this extracts actual
    signal features in this container: sample rate, channel count,
    frame count, duration, and RMS energy (the standard
    silence/clipping quality signal for audio corpus filtering).
    Malformed payloads yield null features rather than failing the
    batch. Same Arrow ``mapInPandas`` shape as the image path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                row = (media_id, None, None, None, None, None)
                if payload is not None:
                    try:
                        with wave.open(io.BytesIO(bytes(payload))) as w:
                            sr = w.getframerate()
                            nc = w.getnchannels()
                            nf = w.getnframes()
                            sw = w.getsampwidth()
                            raw = w.readframes(nf)
                        dtype = {1: np.uint8, 2: np.int16,
                                 4: np.int32}[sw]
                        x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
                        if sw == 1:          # 8-bit WAV is unsigned
                            x = x - 128.0
                        scale = float(2 ** (8 * sw - 1))
                        rms = (float(np.sqrt(np.mean((x / scale) ** 2)))
                               if x.size else 0.0)
                        row = (media_id, sr, nc, nf,
                               round(nf / sr, 6), round(rms, 6))
                    except Exception:
                        pass
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in
                                             AUDIO_FEATURE_SCHEMA.fields])

    return df.select("media_id", payload_col).mapInPandas(
        run, AUDIO_FEATURE_SCHEMA)


def decode_bmp_features(df: DataFrame,
                        payload_col: str = "payload") -> DataFrame:
    """REAL image decode for uncompressed 24-bit BMP (struct + numpy —
    no codec library needed): dimensions, bit depth, and mean pixel
    intensity. Non-BMP or compressed payloads yield null features —
    route JPEG/PNG through decode_image_features' stub until a codec
    library is present."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                row = (media_id, None, None, None, None)
                if payload is not None:
                    try:
                        b = bytes(payload)
                        if b[:2] == b"BM":
                            off, = struct.unpack_from("<I", b, 10)
                            w, h = struct.unpack_from("<ii", b, 18)
                            bpp, = struct.unpack_from("<H", b, 28)
                            comp, = struct.unpack_from("<I", b, 30)
                            mean = None
                            if bpp == 24 and comp == 0:
                                stride = (w * 3 + 3) & ~3
                                px = np.frombuffer(
                                    b, dtype=np.uint8, count=stride * abs(h),
                                    offset=off).reshape(abs(h), stride)
                                mean = round(float(
                                    px[:, :w * 3].astype(np.float64).mean()),
                                    6)
                            row = (media_id, w, abs(h), bpp, mean)
                    except Exception:
                        pass
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in
                                             BMP_FEATURE_SCHEMA.fields])

    return df.select("media_id", payload_col).mapInPandas(
        run, BMP_FEATURE_SCHEMA)
