"""SemDeDup (llm/similarity.py semdedup) drop-semantics tests.

The catalog row (llm_semdedup) binds the four structural invariants
in-plan; these tests pin the SEMANTICS the invariants can't see — which
rows drop, who the representative is, and the paper's stated recall
trade (cross-cluster near-dups survive) — on crafted vectors whose
cluster assignment and cosines are known by construction.
"""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, LongType, StructField,
                               StructType)

from etl_tool_spark.llm import similarity as S

SCHEMA = StructType([StructField("vec_id", LongType()),
                     StructField("embedding", ArrayType(FloatType()))])


def _frame(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, SCHEMA)


def _result(spark, vecs, **kw):
    kw.setdefault("nlist", 2)
    kw.setdefault("sample_n", 64)
    res = S.semdedup(_frame(spark, vecs), **kw).orderBy("vec_id").collect()
    return {r["vec_id"]: (r["keep"], r["rep"]) for r in res}


def _rot(base_axis, angle, dim=8, axis=1):
    """Unit vector at ``angle`` from basis vector ``base_axis``, rotated
    toward ``axis`` — cosine to the base is exactly cos(angle), and two
    rotations from the same base differ by their angle difference."""
    v = [0.0] * dim
    v[base_axis] = math.cos(angle)
    v[axis] = math.sin(angle)
    return v


E0 = 0
E2 = 2


def test_chain_collapses_to_min_id(spark):
    # 0-1 and 1-2 are within threshold, 0-2 is not: the duplicate
    # relation is a chain, and all three collapse onto min id 0.
    a = _rot(E0, 0.0)
    b = _rot(E0, 0.35)          # cos 0.35 rad ≈ 0.939
    c = _rot(E0, 0.70)          # cos to b ≈ 0.939, cos to a ≈ 0.765
    got = _result(spark, [a, b, c], threshold=0.9, nlist=1)
    assert got == {0: (True, 0), 1: (False, 0), 2: (False, 0)}


def test_orthogonal_vectors_all_survive(spark):
    vecs = [[float(i == j) for i in range(8)] for j in range(6)]
    got = _result(spark, vecs, threshold=0.45, nlist=2)
    assert all(keep and rep == i for i, (keep, rep) in got.items())


def test_exact_duplicates_keep_first(spark):
    v0, v2 = _rot(E0, 0.0), _rot(E2, 0.0)
    got = _result(spark, [v0, v0, v2, v0], threshold=0.99, nlist=1)
    assert got[0] == (True, 0)
    assert got[1] == (False, 0)
    assert got[3] == (False, 0)
    assert got[2] == (True, 2)


def test_cross_cluster_near_dups_survive(spark):
    # Two tight, well-separated families force k-means (k=2) to split
    # them; a near-dup PAIR inside one family is pruned, while the
    # family-to-family pairs are never compared at all (the SemDeDup
    # recall trade: only within-cluster duplicates are found).
    fam_a = [_rot(E0, 0.02 * i) for i in range(4)]
    fam_b = [_rot(E2, 0.02 * i, axis=3) for i in range(4)]
    # sanity: the two families really are orthogonal by construction
    assert sum(x * y for x, y in zip(fam_a[0], fam_b[0])) == 0.0
    got = _result(spark, fam_a + fam_b, threshold=0.99, nlist=2)
    kept = [i for i, (keep, _) in got.items() if keep]
    # each family collapses to exactly one representative
    assert kept == [0, 4]
    assert all(got[i][1] == 0 for i in range(4))
    assert all(got[i][1] == 4 for i in range(4, 8))


def test_threshold_boundary_inclusive(spark):
    # cosine at the threshold counts as a duplicate (>=, the same
    # convention as embedding_dup_pairs); the margin absorbs the
    # float32 storage rounding of the embedding components
    ang = 0.5
    got = _result(spark, [_rot(E0, 0.0), _rot(E0, ang)],
                  threshold=math.cos(ang) - 1e-6, nlist=1)
    assert got[1] == (False, 0)
    # ...and just past the pair's similarity it is NOT a duplicate
    got2 = _result(spark, [_rot(E0, 0.0), _rot(E0, ang)],
                   threshold=math.cos(ang) + 1e-6, nlist=1)
    assert got2[1] == (True, 1)


def test_invariants_on_random_corpus(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(80, 8)).astype("float32")
    df = _frame(spark, vecs.tolist())
    res = S.semdedup(df, threshold=0.45, nlist=4, sample_n=64)
    rows = res.collect()
    assert len(rows) == 80 and len({r["vec_id"] for r in rows}) == 80
    kept = {r["vec_id"] for r in rows if r["keep"]}
    by_id = {r["vec_id"]: r for r in rows}
    x = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = x @ x.T
    for r in rows:
        if not r["keep"]:
            assert r["rep"] in kept
            assert by_id[r["rep"]]["cluster"] == r["cluster"]
            # witness: some same-cluster neighbor over the threshold
            nbrs = [o for o in rows
                    if o["cluster"] == r["cluster"] and o["vec_id"] != r["vec_id"]]
            assert any(sims[r["vec_id"], o["vec_id"]] >= 0.45 - 1e-6
                       for o in nbrs)
        else:
            assert r["rep"] == r["vec_id"]
    # kept separation within clusters
    for r in rows:
        for o in rows:
            if (r["keep"] and o["keep"] and r["cluster"] == o["cluster"]
                    and r["vec_id"] < o["vec_id"]):
                assert sims[r["vec_id"], o["vec_id"]] < 0.45 + 1e-6


def test_deterministic_rerun(spark):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 8)).astype("float32").tolist()
    df = _frame(spark, vecs)
    a = sorted(map(tuple, S.semdedup(df, nlist=3, sample_n=64).collect()))
    b = sorted(map(tuple, S.semdedup(df, nlist=3, sample_n=64).collect()))
    assert a == b
