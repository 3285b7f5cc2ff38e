"""Sharded layout for the incremental stores' band-key tables.

The minhash (llm/dedup.py) and embedding (llm/similarity.py) incremental
stores keep their LSH band keys in an append-only parquet table that
every micro-batch probes with an equi-join. The round-7 flat layout made
that probe scan AND shuffle the ENTIRE store each batch — per-batch cost
grew with corpus history, the one streaming-ingest scale risk left in
the round-7 audit. The bands table is therefore hive-partitioned by a
hash shard of the band key:

    bands/_shard=K/part-*.parquet,   K = pmod(xxhash64(key cols), SHARDS)

which buys two things per micro-batch:

* **Partition-pruned store reads** — the batch's band keys hash to a
  bounded set of shards (collected driver-side, ≤ SHARDS values); the
  store read filters on ``_shard`` and the file index prunes every
  non-matching shard directory before a byte is read. A small batch
  touches few shards.
* **Shuffle-free probes** — with the store side pruned, the batch side
  (file-backed in every gate path) rides ``gated_broadcast``, so the
  probe join is broadcast-hash against a pruned scan: the store is
  never shuffled, and an oversized backfill batch falls back to
  sort-merge via the row gate rather than an unbounded broadcast.

A (band, bucket) group lives entirely in ONE shard (the shard is a pure
function of the key columns), so bucket-population counts over a pruned
read are exact for every bucket the batch can touch — the hot-bucket
guards need no change.

Shard count defaults to 32 — pruning granularity for the test/bench
corpora without drowning local runs in tiny files — and scales with the
env knob ``SPARK_GRAFT_BAND_SHARDS`` on a real cluster (e.g. 1024 at
100 TB: finer pruning, still trivial listing; re-shard an existing
store by deleting bands/ and letting migration rebuild it from the
signature table).
"""

from __future__ import annotations

import glob
import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["band_shards", "shard_col", "sharded_files", "flat_files",
           "append_bands", "read_pinned", "probe_shards",
           "probe_shards_and_count", "stage_banded", "overlap_writes",
           "shard_array", "fused_probe_observation",
           "prune_to_shards", "ensure_sharded", "compact_dir",
           "compact_store", "partition_column", "finish_pending_compaction"]


def band_shards() -> int:
    """Shard-count knob; read per call so tests can vary it. Invalid
    values fall back to the default rather than wedging ingest."""
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_BAND_SHARDS", "32")))
    except ValueError:
        return 32


def shard_col(*cols: str | Column) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(band_shards())).cast("int")


def sharded_files(bands_dir: str) -> list[str]:
    """Every data file of the sharded layout, sorted for deterministic
    pinning."""
    return sorted(glob.glob(os.path.join(bands_dir, "_shard=*", "*.parquet")))


def flat_files(bands_dir: str) -> list[str]:
    """Part files of the superseded flat layout (pre-shard stores, or a
    bands directory compacted without ``partition_by=['_shard']``)."""
    return sorted(glob.glob(os.path.join(bands_dir, "*.parquet")))


def append_bands(banded: DataFrame, bands_dir: str,
                 key_cols: Sequence[str],
                 probe: bool = False) -> tuple[list[int], int] | None:
    """Append ``banded`` under the sharded layout. The frame is
    hash-repartitioned ON ``_shard`` before the partitioned write —
    without it every input partition opens a writer per shard value it
    holds (measured: 32 tasks × 32 shards = 1,024 files PER batch at
    bench scale, and every later pinned probe re-lists and re-opens all
    of them; llm_incremental_dedup went 2.6× slower the round sharding
    landed, entirely on this). Repartitioned, an append emits at most
    one file per (task, shard) ≈ one per shard, for one extra
    batch-sized shuffle of narrow band rows.

    ``probe=True`` additionally returns (probed shards, band-row count)
    observed during the write — the incremental update-store path's
    probe job, folded into the append it already pays (guide §1.2)."""
    sharded = banded.withColumn("_shard", shard_col(*key_cols))
    resolve = None
    if probe:
        sharded, resolve = _probe_observation(sharded, F.col("_shard"))
    (sharded.repartition(band_shards(), F.col("_shard"))
            .write.mode("append").partitionBy("_shard").parquet(bands_dir))
    return resolve() if resolve else None


def read_pinned(spark: SparkSession, bands_dir: str,
                files: Sequence[str]) -> DataFrame:
    """Explicit-file read PINNED to ``files`` (append-isolation contract
    of the incremental stores) that keeps the ``_shard`` partition
    column — and therefore partition pruning — via ``basePath``."""
    return (spark.read.option("basePath", bands_dir).parquet(*files))


def probe_shards(banded_new: DataFrame,
                 key_cols: Sequence[str]) -> list[int]:
    """The shards a batch's band keys hash into. The collect is bounded
    by band_shards() rows — never batch-sized."""
    return [r["_s"] for r in banded_new
            .select(shard_col(*key_cols).alias("_s")).distinct().collect()]


def probe_shards_and_count(banded_new: DataFrame,
                           key_cols: Sequence[str]) -> tuple[list[int], int]:
    """``probe_shards`` and the batch's band-row count from ONE job.

    The incremental probe paths used to pay two driver round-trips per
    micro-batch over the same staged band frame: the shard-set collect
    and then ``gated_broadcast``'s row-count gate. A per-shard count
    aggregate answers both (collect stays bounded by band_shards()
    rows), halving the pre-join job latency every batch pays
    (optimization guide §1.2: fewer passes)."""
    rows = (banded_new.groupBy(shard_col(*key_cols).alias("_s"))
                      .agg(F.count(F.lit(1)).alias("_n")).collect())
    return [r["_s"] for r in rows], sum(r["_n"] for r in rows)


def _probe_observation(banded: DataFrame, shard: Column):
    """Attach an Observation computing (probed shard set, row count) to
    a band frame about to be WRITTEN: the next step past
    probe_shards_and_count — the probe stops being its own job at all
    and rides the write the batch pays anyway (guide §1.2). Returns
    (observed frame, resolver); call the resolver AFTER the write.
    ``collect_set`` stays bounded by band_shards() values per task."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = banded.observe(
        obs, F.collect_set(shard).alias("_s"),
        F.count(F.lit(1)).alias("_n"))

    def resolve() -> tuple[list[int], int]:
        m = obs.get
        return sorted(m["_s"] or []), int(m["_n"])

    return observed, resolve


def stage_banded(banded: DataFrame, staging_dir: str,
                 key_cols: Sequence[str]) -> tuple[list[int], int]:
    """Overwrite-write a gate batch's band keys to ``staging_dir`` and
    return (probed shards, band-row count) observed DURING that write —
    zero extra jobs where the gate paths previously paid a separate
    probe collect per micro-batch."""
    observed, resolve = _probe_observation(banded, shard_col(*key_cols))
    observed.write.mode("overwrite").parquet(staging_dir)
    return resolve()


def shard_array(keys_arr: Column, with_index: bool = False) -> Column:
    """Per-row shard ids of an ARRAY of band keys — the fused-staging
    twin of ``shard_col``. With ``with_index=True`` each element hashes
    as (array index, element), exactly what ``shard_col("_band",
    "_bucket")`` computes on the posexploded rows (the HOF index
    variable is IntegerType, matching posexplode's position column, so
    xxhash64 sees identical input types — pinned by test)."""
    s = F.lit(band_shards())
    if with_index:
        return F.transform(keys_arr,
                           lambda x, i: F.pmod(F.xxhash64(i, x), s)
                           .cast("int"))
    return F.transform(keys_arr,
                       lambda x: F.pmod(F.xxhash64(x), s).cast("int"))


def _row_shard_mask(shards_arr: Column, k: int) -> Column:
    """bigint bitmask of the row's shard ids within [64k, 64k+64)."""
    lo = 64 * k
    return F.aggregate(
        F.filter(shards_arr, lambda s: (s >= F.lit(lo))
                 & (s < F.lit(lo + 64))),
        F.lit(0).cast("bigint"),
        lambda acc, s: acc.bitwiseOR(
            F.call_function("shiftleft", F.lit(1).cast("bigint"),
                            (s - F.lit(lo)).cast("int"))))


def fused_probe_observation(staged: DataFrame, shards_arr: Column):
    """Shard probe riding a FUSED staging write: ``staged`` is a
    per-document frame carrying its band keys as an array column (the
    gates' one-write staging), ``shards_arr`` the matching per-row
    shard-id array (``shard_array``). Attaches an Observation computing
    (probed shard set, band-row count) as ``bit_or`` bitmask longs —
    ceil(band_shards()/64) fixed-width values per task, never a
    collection that grows with the batch. Returns (observed frame,
    resolver); call the resolver AFTER the write."""
    from pyspark.sql import Observation

    n_masks = (band_shards() + 63) // 64
    obs = Observation()
    observed = staged.observe(
        obs,
        *[F.bit_or(_row_shard_mask(shards_arr, k)).alias(f"_m{k}")
          for k in range(n_masks)],
        F.sum(F.size(shards_arr)).alias("_n"))

    def resolve() -> tuple[list[int], int]:
        m = obs.get
        shards = [64 * k + b for k in range(n_masks) for b in range(64)
                  if ((m[f"_m{k}"] or 0) >> b) & 1]
        return shards, int(m["_n"] or 0)

    return observed, resolve


def _inheritable(spark: SparkSession, fn: Callable) -> Callable:
    """``inheritable_thread_target`` wrapping that tolerates classic
    mode with pinned-thread mode DISABLED (PYSPARK_PIN_THREAD=false):
    pyspark's non-ClientServer branch there returns its argument
    unchanged — i.e. the SparkSession, not a decorator — so blindly
    calling the result would raise TypeError. Thread-local inheritance
    is only meaningful in pinned mode anyway; fall back to the bare
    thunk otherwise."""
    from pyspark import inheritable_thread_target

    w = inheritable_thread_target(spark)
    return w(fn) if callable(w) else fn


def overlap_writes(spark: SparkSession, *thunks: Callable[[], None]) -> None:
    """Run independent store writes concurrently from a small driver
    thread pool (optimization guide §2.6: actions are only sequential
    because driver code calls them sequentially — the next append's
    tasks back-fill executors freed by the current one's tail).

    ONLY for writes whose order is NOT a crash contract: the ingest
    gates' land-before-store ordering must never pass through here,
    but the per-table store appends AFTER a landing (sig/ vs bands/,
    fp/ vs sig/) are independent directories replayed wholesale from
    the batch marker on a crash, so any interleaving is as safe as the
    sequential order (same argument as compact_store's pool). A thunk
    failure propagates after all thunks finish — identical outcome to
    a crash between sequential appends (batch unmarked → replayed)."""
    if len(thunks) == 1:
        thunks[0]()
        return
    from concurrent.futures import ThreadPoolExecutor

    wrapped = [_inheritable(spark, t) for t in thunks]
    with ThreadPoolExecutor(max_workers=min(3, len(wrapped))) as pool:
        futs = [pool.submit(w) for w in wrapped]
        errs = [f.exception() for f in futs]
        for e in errs:
            if e is not None:
                raise e


def prune_to_shards(banded_old: DataFrame, shards: Sequence[int]) -> DataFrame:
    """Filter a ``read_pinned`` store frame to the probed shards (the
    file index prunes non-matching shard directories) and restore the
    logical schema."""
    return (banded_old.filter(F.col("_shard").isin(list(shards)))
                      .drop("_shard"))


def ensure_sharded(spark: SparkSession, bands_dir: str,
                   key_cols: Sequence[str],
                   rebuild: Callable[[], DataFrame]) -> None:
    """Migrate a flat bands table into the sharded layout.

    The rebuild source is the AUTHORITATIVE signature table (via
    ``rebuild()``), never the flat band files themselves — so the
    migration is crash-idempotent: a retry at any interruption point
    either re-stages from the unchanged signatures (flat files still
    present) or resumes promoting a fully-staged copy (flat files gone,
    stage directory present). Flat band files are only removed after
    the staged copy is completely written.
    """
    finish_pending_compaction(bands_dir)
    staged = bands_dir.rstrip("/") + "_reshard"
    flat = flat_files(bands_dir)
    if flat:
        (rebuild().withColumn("_shard", shard_col(*key_cols))
                  .repartition(band_shards(), F.col("_shard"))
                  .write.mode("overwrite").partitionBy("_shard")
                  .parquet(staged))
        for f in flat_files(bands_dir):  # re-glob: idempotent on retry
            os.remove(f)
    elif not os.path.isdir(staged):
        return
    # promote: merge-move each staged shard dir (rename per part file —
    # a shard dir may already exist if an append ran between a crashed
    # promotion and this retry)
    for shard_dir in glob.glob(os.path.join(staged, "_shard=*")):
        dst = os.path.join(bands_dir, os.path.basename(shard_dir))
        os.makedirs(dst, exist_ok=True)
        for part in os.listdir(shard_dir):
            if part.endswith(".parquet"):
                os.rename(os.path.join(shard_dir, part),
                          os.path.join(dst, part))
    shutil.rmtree(staged, ignore_errors=True)


# ---------------------------------------------------------------------------
# Compaction: bounding file counts for long-lived stores
# ---------------------------------------------------------------------------
# One-file-per-shard appends keep a batch cheap, but a store ingesting
# for months still accumulates shards × batches files, and file-index
# listing cost grows with every batch. Compaction rewrites a table's
# current snapshot into one file per shard (sharded) or a handful of
# files (flat) during a maintenance window between batches.
#
# Raw parquet has no transaction log, so crash safety comes from the
# same discipline as ensure_sharded: nothing in the live directory is
# deleted until a complete staged copy exists, and the promotion step
# is driven by a MANIFEST of exactly the files the staged copy
# replaces — so a batch that appends between a crashed promotion and
# its recovery can never lose data (recovery deletes only manifest
# files, every one of which is duplicated in the stage). The stage is
# authoritative the moment its manifest exists; before that it is
# garbage and recovery discards it.

_COMPACT_SUFFIX = "_compact"
_MANIFEST = "_compact_manifest.json"


def _stage_data_files(stage: str) -> list[str]:
    """Data files of a staged compaction, flat or hive-partitioned
    (any single-level partition column — ``_shard=`` band stores,
    ``cell=`` IVF indexes)."""
    return sorted(glob.glob(os.path.join(stage, "*.parquet"))
                  + glob.glob(os.path.join(stage, "*=*", "*.parquet")))


def partition_column(d: str) -> str | None:
    """The hive partition column of a table directory, or None for a
    flat layout — detected from the ``col=value`` directory names."""
    for p in sorted(glob.glob(os.path.join(d, "*=*"))):
        if os.path.isdir(p):
            return os.path.basename(p).split("=", 1)[0]
    return None


def _promote_compaction(d: str, stage: str) -> None:
    """Finish a staged compaction whose manifest exists: remove the
    replaced files (tolerating ones a crashed promotion already
    removed), move the staged files in, drop the stage. Idempotent —
    safe to re-run from any interruption point."""
    import json as _json
    with open(os.path.join(stage, _MANIFEST), encoding="utf-8") as f:
        replaced = _json.load(f)["files"]
    for f in replaced:
        try:
            os.remove(f)
        except FileNotFoundError:
            pass
    for src in _stage_data_files(stage):
        rel = os.path.relpath(src, stage)
        dst = os.path.join(d, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(src, dst)
    shutil.rmtree(stage, ignore_errors=True)


def finish_pending_compaction(d: str) -> None:
    """Recover an interrupted ``compact_dir`` run on ``d``. A stage
    with a manifest is complete and promotes (data files in ``d`` stay
    a superset of one full snapshot throughout); a stage without one
    died mid-write and is discarded. Called from every store-open path
    so readers never see the missing-rows window a crashed promotion
    leaves behind."""
    stage = d.rstrip("/") + _COMPACT_SUFFIX
    if not os.path.isdir(stage):
        return
    if os.path.exists(os.path.join(stage, _MANIFEST)):
        _promote_compaction(d, stage)
    else:
        shutil.rmtree(stage, ignore_errors=True)


def compact_dir(spark: SparkSession, d: str, sharded: bool | None = None,
                target_files: int = 4) -> dict:
    """Compact a store table directory in place; returns
    ``{"before": n_files, "after": n_files}``.

    ``sharded=None`` auto-detects the layout (``_shard=`` partition
    directories → sharded). A sharded table compacts to one file per
    shard; a flat table coalesces to ``target_files``. No-op when the
    table is already at or under the target.

    Concurrency contract: run between batches (a maintenance window).
    Probes pin pre-append file lists, so a probe planned BEFORE the
    compaction must finish before promotion deletes its files — same
    snapshot caveat as the append paths, and the reason a production
    deployment would put these stores on Iceberg/Delta. Crash at any
    point is recovered by the next store open or ``compact_dir`` call
    (see finish_pending_compaction)."""
    finish_pending_compaction(d)
    # any single-level hive layout compacts to one file per partition
    # value: _shard= band stores, cell= IVF indexes. `sharded` keeps
    # its boolean meaning for callers; the column is detected.
    part = partition_column(d)
    if sharded is None:
        sharded = part is not None
    files = (sorted(glob.glob(os.path.join(d, f"{part}=*", "*.parquet")))
             if sharded else flat_files(d))
    n_parts = len({os.path.basename(os.path.dirname(f))
                   for f in files}) if sharded else 0
    target = n_parts if sharded else max(1, target_files)
    if len(files) <= target:
        return {"before": len(files), "after": len(files)}
    stage = d.rstrip("/") + _COMPACT_SUFFIX
    shutil.rmtree(stage, ignore_errors=True)
    if sharded:
        # re-derive the partition column from the directory names
        # (basePath read), and repartition on it — one file per
        # partition value (see append_bands)
        (spark.read.option("basePath", d).parquet(*files)
              .repartition(F.col(part))
              .write.mode("overwrite").partitionBy(part).parquet(stage))
    else:
        (spark.read.parquet(*files).coalesce(target)
              .write.mode("overwrite").parquet(stage))
    import json as _json
    manifest = os.path.join(stage, _MANIFEST)
    with open(manifest + ".tmp", "w", encoding="utf-8") as f:
        _json.dump({"files": files}, f)
    os.rename(manifest + ".tmp", manifest)  # stage becomes authoritative
    _promote_compaction(d, stage)
    after = (sorted(glob.glob(os.path.join(d, f"{part}=*", "*.parquet")))
             if sharded else flat_files(d))
    return {"before": len(files), "after": len(after)}


def compact_store(spark: SparkSession, store_dir: str,
                  target_files: int = 4) -> dict:
    """Compact every table of an incremental store (minhash: sig/ +
    bands/; embedding: vec/ + bands/; clean gate adds fp/; an IVF
    index dir adds cell-partitioned vectors/, which appends grow by
    one file per touched cell per batch; a PQ index dir adds the flat
    codes/ table; a bare exact-dedup store is its own flat table).
    Returns per-table before/after file counts.

    The per-table compactions are INDEPENDENT (distinct directories,
    distinct staged copies, distinct manifests), so they run from a
    small driver thread pool: the next table's rewrite job back-fills
    executors freed by the current one's task tail instead of each job
    paying its straggler latency back to back (optimization guide
    §2.6). Crash safety is unchanged — each table keeps its own staged
    copy + manifest protocol, and a crash mid-pool leaves each table
    either untouched, staged-unmanifested (discarded on recovery), or
    manifested (promoted on recovery), exactly as in the sequential
    order."""
    tables = [(sub, is_sharded)
              for sub, is_sharded in (("sig", False), ("vec", False),
                                      ("fp", False), ("bands", True),
                                      ("vectors", None), ("codes", False))
              if os.path.isdir(os.path.join(store_dir, sub))]
    if not tables:
        if flat_files(store_dir):
            return {".": compact_dir(spark, store_dir, sharded=False,
                                     target_files=target_files)}
        return {}
    if len(tables) == 1:
        sub, is_sharded = tables[0]
        return {sub: compact_dir(spark, os.path.join(store_dir, sub),
                                 sharded=is_sharded,
                                 target_files=target_files)}
    from concurrent.futures import ThreadPoolExecutor

    def _one(sub: str, is_sharded: bool | None) -> dict:
        return compact_dir(spark, os.path.join(store_dir, sub),
                           sharded=is_sharded, target_files=target_files)

    one = _inheritable(spark, _one)

    # 2-3 jobs in flight is plenty (guide §2.6): enough to fill the
    # tail, not so many that tiny rewrite jobs fight for cores
    with ThreadPoolExecutor(max_workers=min(3, len(tables))) as pool:
        futs = [(sub, pool.submit(one, sub, is_sharded))
                for sub, is_sharded in tables]
        return {sub: f.result() for sub, f in futs}
