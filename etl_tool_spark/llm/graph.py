"""Distributed connected components over near-duplicate PAIRS.

Pairwise near-dup output (MinHash LSH / SimHash banding / embedding
LSH — llm/dedup.py, llm/similarity.py) is not yet a dedup policy: if
A~B and B~C but A~C missed the threshold, pairwise drop-higher-id
would keep A and C as "unique" even though they are transitively tied
to the same cluster. The fixpoint here collapses pairs into groups so
a corpus keeps exactly one representative per component (the min id).

Algorithm: min-label propagation. Every vertex starts labeled with its
own id; each round a vertex takes the minimum label among itself and
its neighbors; the fixpoint is reached when no label changes. Rounds
to converge = component diameter. Near-dup components are shallow
star-ish clusters (a template document + its variants), so in practice
this is 2-4 rounds; ``max_iter`` bounds the pathological chain case
and the function raises rather than returning a half-merged labeling.
A logarithmic-round alternative (alternating large-star/small-star,
Kiveris et al., "Connected Components in MapReduce and Beyond") is the
escalation path if a real corpus ever shows deep chains; the plumbing
here (checkpointed per-round frames) is the same.

Scale shape per round: one shuffle join (labels ⋈ edges on vertex) +
one min-aggregation — both partition on the vertex id, so AQE reuses
the layout. ``localCheckpoint`` (eager) truncates lineage per round:
without it the plan doubles each iteration and the job dies on plan
explosion long before data size matters. On a cluster, checkpointing
to HDFS (``checkpoint``) trades recompute-on-executor-loss for
durability; local mode keeps the cheap variant.

Checkpoint lifecycle: every superseded round's blocks (and the edges
frame's, on exit) are unpersisted as soon as the next round is
materialized — a fixpoint that pins every round would grow executor
storage by O(V) per iteration and, worse, per CALL on a long-lived
session. Only the RETURNED labels frame stays pinned (its data IS the
checkpoint); it is released by the context cleaner when the caller
drops the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Raised when max_iter rounds did not reach the labeling fixpoint."""


def _checkpoint_rdd(df: DataFrame):
    """The pinned RDD behind a materialized localCheckpoint frame (its
    analyzed plan is a LogicalRDD wrapping exactly the persisted RDD).
    None when the handle can't be reached — cleanup then falls back to
    the context cleaner, never to an error."""
    try:
        return df._jdf.queryExecution().analyzed().rdd()
    except Exception:  # pragma: no cover - py4j surface drift
        return None


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """(id, label) for every vertex appearing in ``edges``; ``label`` is
    the minimum vertex id of the component. Vertices not in any edge are
    absent (callers left-join and coalesce to the vertex's own id)."""
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    e = e.localCheckpoint(eager=True)  # reused every round
    e_rdd = _checkpoint_rdd(e)

    prev_rdd = None  # the last round's blocks, freed once superseded
    try:
        labels = (e.select(F.col("u").alias("id")).distinct()
                   .withColumn("label", F.col("id")))
        for _ in range(max_iter):
            nbr_min = (e.join(labels.select(F.col("id").alias("v"),
                                            F.col("label").alias("nbr_label")), "v")
                        .groupBy("u").agg(F.min("nbr_label").alias("m")))
            new_labels = (labels.join(nbr_min.select(F.col("u").alias("id"), "m"),
                                      "id", "left")
                                .select("id",
                                        F.least("label", F.coalesce("m", "label"))
                                         .alias("label"),
                                        (F.col("m") < F.col("label")).alias("_chg")))
            # lazy checkpoint: the full-scan convergence count below is the
            # materializing job, so each round costs ONE job (an eager
            # checkpoint + separate probe would double it)
            new_labels = new_labels.localCheckpoint(eager=False)
            changed = new_labels.filter(F.col("_chg")).count()
            # this round is materialized; the one it was built from is dead
            if prev_rdd is not None:
                prev_rdd.unpersist(False)
            prev_rdd = _checkpoint_rdd(new_labels)
            labels = new_labels.drop("_chg")
            if changed == 0:
                prev_rdd = None  # the caller owns the returned checkpoint
                return labels
        raise ConvergenceError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter; raise max_iter or switch "
            "to the large-star/small-star variant)")
    finally:
        # the returned labels frame reads its own checkpoint, not e; on
        # the error paths (ConvergenceError, a failed round) nothing is
        # returned, so the last round's blocks are released too
        if e_rdd is not None:
            e_rdd.unpersist(False)
        if prev_rdd is not None:
            prev_rdd.unpersist(False)
