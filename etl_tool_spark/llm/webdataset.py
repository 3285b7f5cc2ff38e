"""WebDataset-style tar shards: the de-facto sharded container for
large-scale (multimodal) training corpora — a directory of ``.tar``
files whose members are named ``<key>.<ext>``, consecutive same-key
members forming one sample (public format: webdataset/webdataset docs;
the reference engine has no shard container at all — this is part of
the beyond-reference training-data surface, like llm/multimodal.py).

Spark-first shape:

* **Read** — ``spark.read.format("binaryFile")`` lists and loads the
  shard files in parallel (one task per shard — shards are sized to
  fit an executor by construction, the format's own contract), and a
  ``mapInPandas`` pass walks each tar with stdlib ``tarfile``,
  emitting one row per member. No Python driver loop, no temp
  extraction: bytes go straight from the tar buffer into Arrow
  batches. Member rows carry (shard, key, ext, payload); sample
  assembly is a normal groupBy on (key) downstream, which Catalyst
  plans like any aggregation.
* **Write** — the cleaned corpus repartitions by key hash into
  ``n_shards`` partitions and each partition serializes ONE tar via
  ``mapInPandas`` (deterministic: members sorted by key, zeroed
  mtimes/uids, fixed shard naming by partition id). The returned
  frame is the shard MANIFEST (path, samples, members, bytes) — an
  action on it performs the write, mirroring how Spark's own
  FileFormatWriter reports per-task commit stats.

At 100 TB: reading scales with shard count (binaryFile splits the
listing across the cluster; each shard is one task's working set);
writing is one shuffle on the key hash and then embarrassingly
parallel serialization. Nothing touches the driver but the manifest.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_webdataset", "write_webdataset", "sample_assemble"]

_MEMBER_SCHEMA = T.StructType([
    T.StructField("shard", T.StringType()),
    T.StructField("key", T.StringType()),
    T.StructField("ext", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])


def _split_member_name(name: str) -> tuple[str, str]:
    """WebDataset naming: the extension is everything after the FIRST
    dot of the basename (so ``a/b/0001.seg.json`` → key ``a/b/0001``,
    ext ``seg.json``) — the format's own rule, which keeps multi-suffix
    members of one sample under one key."""
    d, base = os.path.split(name)
    stem, _, ext = base.partition(".")
    return (os.path.join(d, stem) if d else stem), ext


def read_webdataset(spark: SparkSession, path: str,
                    extensions: list[str] | None = None) -> DataFrame:
    """One row per tar member across every ``*.tar`` under ``path``:
    (shard, key, ext, payload). ``extensions`` filters members early —
    inside the tar walk, before bytes enter Arrow — so e.g. a
    metadata-only pass over image shards never ships image bytes."""
    want = set(extensions) if extensions is not None else None
    raw = (spark.read.format("binaryFile")
                .option("pathGlobFilter", "*.tar").load(path)
                .select("path", "content"))

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(shard_path)
                with tarfile.open(fileobj=io.BytesIO(bytes(content)),
                                  mode="r") as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        key, ext = _split_member_name(m.name)
                        if want is not None and ext not in want:
                            continue
                        f = tf.extractfile(m)
                        out.append((shard, key, ext,
                                    f.read() if f is not None else b""))
            yield pd.DataFrame(out, columns=["shard", "key", "ext",
                                             "payload"])

    return raw.mapInPandas(walk, schema=_MEMBER_SCHEMA)


def sample_assemble(members: DataFrame,
                    extensions: list[str]) -> DataFrame:
    """Pivot member rows into one row per sample: (key, <ext> binary
    ...) for the requested extensions — the WebDataset sample view.
    One aggregation on key (any-value per ext is exact: a key carries
    at most one member per ext)."""
    aggs = [F.max(F.when(F.col("ext") == e, F.col("payload")))
             .alias(e.replace(".", "_")) for e in extensions]
    return members.groupBy("key").agg(*aggs)


def write_webdataset(df: DataFrame, out_dir: str, n_shards: int,
                     key_col: str = "key",
                     prefix: str = "shard") -> DataFrame:
    """Pack a frame into ``n_shards`` deterministic tar shards under
    ``out_dir``; returns the manifest frame (shard, samples, members,
    bytes) — **lazy**: an action on the manifest performs the write.

    Every column except ``key_col`` must be BINARY and becomes the
    member ``<key>.<column>`` (name your columns ``txt``/``json``/
    ``jpg``...). Determinism contract: samples route to shards by a
    deterministic hash partitioning of the key, members are sorted by
    key within a shard, and tar metadata (mtime/uid/gid) is zeroed —
    the same frame and ``n_shards`` always byte-reproduce the same
    shards, so re-runs are idempotent overwrites rather than
    appends."""
    exts = [f.name for f in df.schema if f.name != key_col]
    bad = [f.name for f in df.schema
           if f.name != key_col and not isinstance(f.dataType, T.BinaryType)]
    if not exts or bad:
        raise ValueError(
            f"write_webdataset: every non-key column must be binary "
            f"(member payloads); got non-binary {bad}, members {exts}")
    manifest_schema = T.StructType([
        T.StructField("shard", T.StringType()),
        T.StructField("samples", T.LongType()),
        T.StructField("members", T.LongType()),
        T.StructField("bytes", T.LongType()),
    ])
    os.makedirs(out_dir, exist_ok=True)
    width = max(5, len(str(max(n_shards - 1, 0))))

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"{prefix}-{pid:0{width}d}.tar")
        rows = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                rows.append(row)
        if not rows:
            yield pd.DataFrame([], columns=["shard", "samples", "members",
                                            "bytes"])
            return
        rows.sort(key=lambda r: str(getattr(r, key_col)))
        members = 0
        with tarfile.open(path, "w") as tf:
            for row in rows:
                key = str(getattr(row, key_col))
                for ext in exts:
                    payload = getattr(row, ext)
                    if payload is None:
                        continue
                    b = bytes(payload)
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(b)
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(b))
                    members += 1
        yield pd.DataFrame(
            [(os.path.basename(path), len(rows), members,
              os.path.getsize(path))],
            columns=["shard", "samples", "members", "bytes"])

    routed = df.repartition(n_shards, F.col(key_col).cast("string"))
    return routed.mapInPandas(pack, schema=manifest_schema)
