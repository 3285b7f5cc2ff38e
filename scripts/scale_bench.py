"""Higher-SF scaling datapoint (round-9 verdict item 3): demonstrate
that the gate/store/trigram paths parallelize once data outweighs
commit latency — sf0.1's 0.6 MB documents table made every 8-vs-32-core
ratio ≈ 1 locally (round-8 scaling block), which says nothing about the
plans' parallelism.

Builds a deterministic REPLICATED corpus (default 16× sf0.1) whose
per-replica similarity structure is EXACTLY the original's:

  * documents: replica k prefixes every token with ``r{k}`` — a
    bijection on shingles, so within-replica jaccard equals the
    original corpus's pair structure exactly, while cross-replica
    shingle overlap is ~0 (no quadratic pair blow-up);
  * embeddings: replica k rotates the coordinate order by k — cosine
    within a replica is preserved exactly (dot products are permutation
    invariant), cross-replica cosines decorrelate.

Ids offset by k * 10^9. Everything derives from the frozen test data —
no new randomness, same build every run. The other tables are symlinked
from the source sf dir so every catalog query still resolves.

Usage:
    python scripts/scale_bench.py build  [factor] [out_dir]
    python scripts/scale_bench.py run    <cpus> [out_dir] [reps]

``run`` prints one JSON line {"cpus": N, "queries": {name: [sec, ...]}}.
Run it once per core count in a FRESH process (the session master is
fixed at startup from $SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/tmp/sfscale"
OFFSET = 10 ** 9

QUERIES = ["llm_ingest_gate_fold", "llm_semantic_gate_fold",
           "llm_clean_gate_fold", "llm_incremental_dedup",
           "er_trigram_join", "llm_clean_corpus"]


def build(factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from etl_tool_spark.session import get_spark

    spark = get_spark("scale_build")
    os.makedirs(out_dir, exist_ok=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for k in range(factor):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * OFFSET))
        if k:
            toked = F.split(F.col("text"), r"\s+")
            d = d.withColumn(
                "text",
                F.array_join(
                    F.transform(toked, lambda t: F.concat(F.lit(f"r{k}"), t)),
                    " "))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite") \
       .parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for k in range(factor):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * OFFSET))
        if k:
            rot = k % dim
            e = e.withColumn(
                "embedding",
                F.concat(F.slice("embedding", rot + 1, dim - rot),
                         F.slice("embedding", 1, rot)))
        parts.append(e)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite") \
       .parquet(f"{out_dir}/embeddings.parquet")

    for name in os.listdir(SRC):
        dst = os.path.join(out_dir, name)
        if name.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(SRC, name), dst)
    print(f"built {out_dir} at {factor}x")


def run(cpus: int, out_dir: str, reps: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from etl_tool_spark.catalog import SPARK
    from etl_tool_spark.session import get_spark

    spark = get_spark("scale_bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in QUERIES:  # warm: JIT + page cache (small then full)
        SPARK[name](spark, "/root/testdata/sf0.001").count()
    for name in QUERIES:
        SPARK[name](spark, out_dir).count()
    out: dict[str, list[float]] = {}
    for _ in range(reps):
        for name in QUERIES:
            t0 = time.time()
            SPARK[name](spark, out_dir).count()
            out.setdefault(name, []).append(round(time.time() - t0, 3))
    print(json.dumps({"cpus": cpus, "dir": out_dir, "queries": out}))


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "build":
        factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        out_dir = sys.argv[3] if len(sys.argv) > 3 else DEFAULT_OUT
        build(factor, out_dir)
    elif mode == "run":
        cpus = int(sys.argv[2])
        out_dir = sys.argv[3] if len(sys.argv) > 3 else DEFAULT_OUT
        reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
        run(cpus, out_dir, reps)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
