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


def _banded_signatures(vec: Column, dim: int, bands: int, rows: int) -> Column:
    """array of ``bands`` signature strings, band b = the signs under its
    own ``rows`` hyperplanes, prefixed with the band id."""
    out = []
    for b in range(bands):
        # per-band planes get distinct indices so bands are independent
        comps = []
        for r in range(rows):
            p = b * rows + r
            plane = F.array(*[F.lit(plane_component(p, j)) for j in range(dim)])
            proj = F.aggregate(F.zip_with(vec, plane, lambda x, h: x.cast("double") * h),
                               F.lit(0.0), lambda acc, v: acc + v)
            comps.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
        out.append(F.concat(F.lit(f"{b}:"), *comps))
    return F.array(*out)


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", dim: int = 64,
             bands: int = 4, rows_per_band: int = 2) -> DataFrame:
    """Approximate top-k via banded sign-LSH (OR of ANDs, minhash-style):
    a corpus vector is a candidate for a query when ANY band's
    ``rows_per_band``-bit sign signature matches — an equi-join per band,
    never a scan per query. Exact cosine + window top-k then run on the
    deduplicated candidate set only.

    Recall/cost dial: more rows_per_band ⇒ tighter buckets (cheaper,
    lower recall); more bands ⇒ more chances to collide (higher recall,
    more candidates). The single-signature form is bands=1."""
    from pyspark.sql import Window

    sigs = _banded_signatures(F.col(vec_col), dim, bands, rows_per_band)
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cvec"),
                      F.explode(sigs).alias("_sig"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"),
                       F.explode(sigs).alias("_sig"))
    cands = (c.join(F.broadcast(q), "_sig")
              .filter(F.col(id_col) != F.col(query_id_col))
              .select(query_id_col, id_col, "_qvec", "_cvec")
              .dropDuplicates([query_id_col, id_col]))
    sim = F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6)
    scored = cands.select(query_id_col, id_col, sim.alias("cosine_sim"))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(),
                                                 F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))
