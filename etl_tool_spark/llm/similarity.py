"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute_force_topk — exact cosine top-k. The query set is broadcast
    (it's small by construction); the corpus streams map-side through a
    broadcast-nested-loop join + per-query window top-k. Exact baseline
    and the verify stage for approximate paths.
  * lsh_topk — random-hyperplane (sign) LSH: deterministic md5-derived
    hyperplanes, docs+queries bucketed by sign signature; top-k only
    within matching buckets. At 100 TB this turns the scan-per-query into
    an equi-join on the signature prefix.

Dot products use F.zip_with + F.aggregate — JVM-side higher-order
functions over the arrays, summed left-to-right in element order, so
DuckDB's list_dot_product-style oracle reproduces values exactly (same
float→double promotion, same order)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_tool_spark.llm.text import hash64

__all__ = ["dot", "norm", "cosine", "brute_force_topk", "hyperplane_signature",
           "lsh_topk"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k neighbors per query. ``queries`` must be small (it is
    broadcast). Ties broken by corpus id ascending — deterministic.
    Excludes self-matches when ids coincide."""
    from pyspark.sql import Window

    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cvec"))
    sim = F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6)
    scored = (c.crossJoin(F.broadcast(q))
                .filter(F.col(id_col) != F.col(query_id_col))
                .select(query_id_col, id_col, sim.alias("cosine_sim")))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(),
                                                 F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def plane_component(p: int, j: int) -> float:
    """±1 by bit parity of md5(f'{p}|{j}') — the same value hash64 would
    yield in either engine, precomputed driver-side so the plan carries a
    literal array per plane instead of dim×planes CASE expressions."""
    import hashlib

    h = int(hashlib.md5(f"{p}|{j}".encode()).hexdigest()[:15], 16)
    return 1.0 if h & 1 == 1 else -1.0


def hyperplane_signature(vec: Column, dim: int, planes: int = 8) -> Column:
    """Sign signature under ``planes`` deterministic pseudo-random
    hyperplanes (md5-derived — reproducible anywhere)."""
    comps = []
    for p in range(planes):
        plane = F.array(*[F.lit(plane_component(p, j)) for j in range(dim)])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, h: x.cast("double") * h),
            F.lit(0.0), lambda acc, v: acc + v)
        comps.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*comps)


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", dim: int = 64,
             planes: int = 8) -> DataFrame:
    """Approximate top-k: candidates share the full sign signature (an
    equi-join — the 100 TB path), then exact cosine + window top-k on the
    candidate set only. Recall tunes with ``planes`` (fewer planes ⇒
    bigger buckets ⇒ higher recall, more compute)."""
    from pyspark.sql import Window

    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cvec"),
                      hyperplane_signature(F.col(vec_col), dim, planes).alias("_sig"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"),
                       hyperplane_signature(F.col(vec_col), dim, planes).alias("_sig"))
    sim = F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6)
    scored = (c.join(F.broadcast(q), "_sig")
                .filter(F.col(id_col) != F.col(query_id_col))
                .select(query_id_col, id_col, sim.alias("cosine_sim")))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(),
                                                 F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))
