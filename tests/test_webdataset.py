"""WebDataset tar shards (llm/webdataset.py): byte-exact round-trip,
deterministic shard bytes, early extension filtering, sample assembly,
and the binary-members contract."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from etl_tool_spark.llm import webdataset as W


def _mk(spark, n=40):
    rows = [(str(i), f"text body {i}".encode(),
             b'{"meta":%d}' % i if i % 3 else None) for i in range(n)]
    return spark.createDataFrame(
        rows, "key string, txt binary, json binary")


def test_roundtrip_byte_exact(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = _mk(spark)
    manifest = W.write_webdataset(df, out, n_shards=3).collect()
    assert sum(m["samples"] for m in manifest) == 40
    # None payloads are skipped members, not empty members
    assert sum(m["members"] for m in manifest) \
        == 40 + sum(1 for i in range(40) if i % 3)
    back = W.read_webdataset(spark, out)
    got = {(r["key"], r["ext"]): bytes(r["payload"])
           for r in back.collect()}
    for r in df.collect():
        assert got[(r["key"], "txt")] == bytes(r["txt"])
        if r["json"] is not None:
            assert got[(r["key"], "json")] == bytes(r["json"])
        else:
            assert (r["key"], "json") not in got


def test_deterministic_shard_bytes(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = _mk(spark)
    W.write_webdataset(df.repartition(7), a, n_shards=2).count()
    W.write_webdataset(df.repartition(3), b, n_shards=2).count()
    fa = sorted(glob.glob(os.path.join(a, "*.tar")))
    fb = sorted(glob.glob(os.path.join(b, "*.tar")))
    assert fa and [os.path.basename(f) for f in fa] \
        == [os.path.basename(f) for f in fb]
    for x, y in zip(fa, fb):
        with open(x, "rb") as f1, open(y, "rb") as f2:
            assert f1.read() == f2.read(), os.path.basename(x)


def test_extension_filter_and_assembly(spark, tmp_path):
    out = str(tmp_path / "shards")
    W.write_webdataset(_mk(spark), out, n_shards=2).count()
    only_txt = W.read_webdataset(spark, out, extensions=["txt"])
    assert only_txt.select("ext").distinct().collect()[0]["ext"] == "txt"
    samples = W.sample_assemble(W.read_webdataset(spark, out),
                                ["txt", "json"])
    assert samples.count() == 40
    row = samples.filter(F.col("key") == "4").collect()[0]
    assert bytes(row["txt"]) == b"text body 4"
    assert bytes(row["json"]) == b'{"meta":4}'
    # a key whose member was never written assembles to NULL, not b""
    assert samples.filter(F.col("key") == "3").collect()[0]["json"] is None
    # multi-dot member names keep the full suffix as the ext
    assert W._split_member_name("d/0001.seg.json") == ("d/0001", "seg.json")


def test_write_rejects_non_binary_members(spark):
    df = spark.createDataFrame([("1", "not-bytes")],
                               "key string, txt string")
    with pytest.raises(ValueError, match="binary"):
        W.write_webdataset(df, "/tmp/unused", n_shards=1)
