"""Build and serve a persisted IVF similarity index over the embeddings
table:

  train (deterministic spherical k-means on a fixed sample)
    -> write the index (centroids parquet + vectors partitioned by cell)
    -> serve top-k for a query batch, reading ONLY the probed cells
       (dynamic partition pruning)
    -> report recall against the exact brute-force baseline

Run:
    python examples/ann_index.py [sf_dir] [index_dir]

This is the train-once/serve-many layout a 100 TB vector corpus uses:
training data never scales with the corpus (fixed sample), the index
write is one assignment pass + one partitioned write, and each query
batch touches nprobe/nlist of the data.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_tool_spark import get_spark  # noqa: E402
from etl_tool_spark.llm import similarity as S  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    index_dir = sys.argv[2] if len(sys.argv) > 2 else \
        tempfile.mkdtemp(prefix="ann_") + "/ivf"
    spark = get_spark("ann_index_example")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.filter(F.col("vec_id") < 10)
                  .select(F.col("vec_id").alias("query_id"), "embedding"))

    S.ivf_build_index(emb, index_dir, nlist=32)
    print(f"index written to {index_dir}")

    approx = S.ivf_search(spark, index_dir, queries, k=5, nprobe=16)
    exact = S.brute_force_topk(emb, queries, k=5)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    print(f"served {len(a)} results; recall vs exact: {len(a & e) / len(e):.2f}")


if __name__ == "__main__":
    main()
