"""Streaming near-duplicate detection: the incremental minhash pipeline
(llm/dedup.py:incremental_minhash_pairs) driven by Structured Streaming
micro-batches over a persistent signature store.

Each micro-batch of documents is shingle-hashed once, banded against the
signatures of every previously seen document, verified with exact
Jaccard, and appended to the store — so the stream continuously reports
each near-dup pair exactly when its *younger* member arrives, and the
union of all batches' outputs equals the one-shot batch pipeline over
everything ingested (the property tested for the batch API).

Delivery semantics: foreachBatch + checkpoint replays a batch only if
it did not commit. The ingest GATES write an O(1) _applied/<batch_id>
marker after their land + store writes (_batch_marker), so a replay of
a fully-applied batch is a no-op — effectively-once everywhere except a
crash inside the narrow append→marker window, where the land-before-
store order degrades to at-least-once (duplicate landings keyed by
batch_id, never silent loss). The pair-REPORT stream keeps plain
at-least-once; a production deployment lands both writes in a
snapshot-isolated table format — raw parquet keeps this module
dependency-free."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_tool_spark.llm.dedup import (append_signatures,
                                      incremental_exact_dedup,
                                      incremental_minhash_pairs)
from etl_tool_spark.llm.text import fingerprint

__all__ = ["near_dedup_stream", "exact_dedup_stream",
           "clean_ingest_stream", "land_batch",
           "near_dedup_ingest_stream", "land_near_batch",
           "semantic_ingest_stream", "land_semantic_batch",
           "full_clean_ingest_stream", "land_clean_batch",
           "budget_ingest_stream", "land_budget_batch", "crawl_ingest_stream"]


def _batch_marker(store_dir: str, batch_id: int):
    """O(1) idempotency check for a (store, batch) application: returns
    (already_applied, commit_fn). The marker is written AFTER the
    batch's land + store writes succeed, so a replay of a FULLY-applied
    batch is a no-op (no duplicate landing rows, no duplicate store
    signatures) — effectively-once for every crash outside the narrow
    append→marker window, where the documented at-least-once semantics
    (collapse on batch_id) still hold. The check costs one stat call,
    never a scan of the growing store."""
    import os

    from etl_tool_spark.util import require_local_store

    # loud failure on object-store URIs: os.path.exists on "s3a://…" is
    # always False, so the replay guard would silently never engage
    # (every replay re-lands — at-least-once instead of effectively-once)
    require_local_store(store_dir, "streaming gate store")
    marker_dir = os.path.join(store_dir, "_applied")
    marker = os.path.join(marker_dir, str(batch_id))

    def commit() -> None:
        os.makedirs(marker_dir, exist_ok=True)
        with open(marker, "w", encoding="utf-8"):
            pass

    return os.path.exists(marker), commit


def land_batch(batch_df: DataFrame, batch_id: int, store_dir: str,
               out_dir: str, id_col: str = "doc_id",
               text_col: str = "text") -> None:
    """Dedup one batch against the fingerprint store and land the
    survivors — out_dir FIRST, store second. The only intermediate
    state a crash can leave is landed-but-not-remembered, which a
    replay turns into a duplicate landing (at-least-once); the reverse
    order's intermediate state (remembered-but-not-landed) would make
    the replay drop the batch silently. A replay of a fully-applied
    batch is a no-op (_batch_marker)."""
    applied, commit = _batch_marker(store_dir, batch_id)
    if applied:
        return
    fresh = incremental_exact_dedup(batch_df, store_dir,
                                    id_col=id_col, text_col=text_col,
                                    update_store=False)
    (fresh.withColumn("batch_id", F.lit(batch_id))
          .write.mode("append").parquet(out_dir))
    (fresh.select(fingerprint(F.col(text_col)).alias("_fp"))
          .write.mode("append").parquet(store_dir))
    commit()


def near_dedup_stream(docs: DataFrame, store_dir: str, pairs_dir: str,
                      checkpoint: str, id_col: str = "doc_id",
                      text_col: str = "text", **minhash_kwargs):
    """Run a streaming documents frame through incremental near-dedup.

    ``docs`` is a streaming DataFrame with (id_col, text_col). Discovered
    pairs land in ``pairs_dir`` as parquet (a, b, jaccard, batch_id),
    append-only. Runs with the availableNow trigger (drain-current-files;
    swap the trigger for continuous ingest). Returns the finished query."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        pairs = incremental_minhash_pairs(
            batch_df, store_dir, id_col=id_col, text_col=text_col,
            **minhash_kwargs)
        (pairs.withColumn("batch_id", F.lit(batch_id))
              .write.mode("append").parquet(pairs_dir))

    q = (docs.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def exact_dedup_stream(docs: DataFrame, store_dir: str, out_dir: str,
                       checkpoint: str, id_col: str = "doc_id",
                       text_col: str = "text"):
    """Streaming exact dedup-on-ingest: each micro-batch keeps only
    documents whose normalized text was never seen (across ALL prior
    batches, via the persistent fingerprint store) and appends the
    survivors to ``out_dir`` — the always-deduped landing zone. Same
    at-least-once/foreachBatch semantics as near_dedup_stream.

    Write ORDER is the crash-safety contract: survivors land in
    ``out_dir`` BEFORE their fingerprints reach the store (see
    land_batch). A crash in the window between the two writes makes the
    replayed batch re-land the same rows (duplicates, keyed by batch_id
    for consumers to collapse) — at-least-once. The reverse order would
    find every fingerprint already stored on replay and silently drop
    the whole batch: data loss, not duplication."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        land_batch(batch_df, batch_id, store_dir, out_dir,
                   id_col=id_col, text_col=text_col)

    q = (docs.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def clean_ingest_stream(docs: DataFrame, store_dir: str, out_dir: str,
                        checkpoint: str, id_col: str = "doc_id",
                        text_col: str = "text",
                        min_quality: float = 0.5):
    """The streaming twin of llm/pipeline.py:clean_corpus's filter +
    exact-dedup stages: quality and language filters are STATELESS, so
    they run directly on the stream frame (full pushdown into each
    micro-batch's scan); exact dedup-on-ingest then anti-joins the
    persistent fingerprint store, so the landing zone at ``out_dir`` is
    always-filtered, always-deduped — for any batch split of the input,
    the landed set equals the batch pipeline's filter+dedup output over
    everything ingested (asserted in tests).

    Near-dup discovery is deliberately separate (near_dedup_stream over
    the same store directory family): pair discovery is a *report*,
    while this is the ingest gate — production runs them as two readers
    of one stream."""
    from etl_tool_spark.llm.text import language_id, quality_features, tokens

    base = docs.select("*", tokens(F.col(text_col)).alias("_toks"))
    feats = quality_features(F.col(text_col), toks=F.col("_toks"))
    kept = (base.select("*",
                        feats["quality_score"].alias("_q"),
                        language_id(F.col(text_col),
                                    toks=F.col("_toks")).alias("_lang"))
                .filter((F.col("_q") >= min_quality)
                        & (F.col("_lang") != "und"))
                .drop("_toks", "_q", "_lang"))

    # delegate: the dedup-and-land stage (including its land-before-store
    # crash-safety order) is exact_dedup_stream's, defined once
    return exact_dedup_stream(kept, store_dir, out_dir, checkpoint,
                              id_col=id_col, text_col=text_col)


def _gate_survivors(batch_df: DataFrame, pairs: DataFrame,
                    id_col: str) -> DataFrame:
    """Keep-earliest drop policy shared by the minhash and semantic
    ingest gates: given near-dup ``pairs`` (a < b, each touching ≥1
    batch row), drop the batch member of any batch×stored pair (the
    stored side landed first) and the larger id of any in-batch pair.
    Returns the surviving batch rows.

    No broadcast hints here: these frames scale with the micro-batch,
    and an availableNow backfill batch can be arbitrarily large — a
    hinted broadcast bypasses autoBroadcastJoinThreshold and OOMs
    exactly where the batch is biggest. AQE broadcasts small sides from
    runtime stats anyway, which is the right call per batch."""
    ids = batch_df.select(F.col(id_col)).distinct()
    flagged = (pairs
               .join(ids.select(F.col(id_col).alias("a"),
                                F.lit(True).alias("_a_new")),
                     "a", "left")
               .join(ids.select(F.col(id_col).alias("b"),
                                F.lit(True).alias("_b_new")),
                     "b", "left"))
    a_new = F.coalesce(F.col("_a_new"), F.lit(False))
    b_new = F.coalesce(F.col("_b_new"), F.lit(False))
    # pairs always touch >=1 batch doc; a < b by id
    drop = (F.when(a_new & b_new, F.col("b"))       # in-batch: larger id
             .when(a_new & ~b_new, F.col("a"))      # partner stored
             .otherwise(F.col("b")))                # partner stored
    drops = flagged.select(drop.alias(id_col)).distinct()
    return batch_df.join(drops, id_col, "left_anti")


def land_near_batch(batch_df: DataFrame, batch_id: int, store_dir: str,
                    out_dir: str, id_col: str = "doc_id",
                    text_col: str = "text", **minhash_kwargs) -> None:
    """NEAR-dup ingest gate for one batch, keep-earliest policy against
    the LANDED corpus: a batch doc drops if it near-duplicates a stored
    survivor (stored always wins — it landed first) or a smaller-id doc
    of its own batch; survivors land in ``out_dir`` and only THEIR
    signatures enter the store. Gating against landed survivors (not
    everything ever seen) is the principled corpus semantics: a doc that
    resembles only a never-landed duplicate duplicates nothing in the
    corpus. The landed set stays pairwise near-dup-free: both sides of
    any qualifying pair can never land (within a batch the larger id
    drops; across batches the later one drops).

    Same land-before-store crash order as land_batch: a replayed batch
    re-lands (at-least-once, collapse on batch_id), never silently
    drops; a replay of a FULLY-applied batch is a no-op
    (_batch_marker) — without the marker it would also re-append its
    survivors' signatures (same-id pairs are excluded by a < b, so the
    store copy cannot flag its own replay)."""
    import os as _os
    import shutil as _shutil

    applied, commit = _batch_marker(store_dir, batch_id)
    if applied:
        return
    spark = batch_df.sparkSession
    sig_kwargs = {k: v for k, v in minhash_kwargs.items()
                  if k in ("num_hashes", "bands")}
    shingle_n = minhash_kwargs.get("shingle_n", 3)
    num_hashes = minhash_kwargs.get("num_hashes", 16)
    bands = minhash_kwargs.get("bands", 8)
    # FUSED staging — ONE write carries the whole batch derivation:
    # shingle hashes (without staging, the md5 shingle pass re-ran for
    # banding, both verify sides, and the survivor append — measured 4×
    # the necessary hash work per batch) AND the band keys as a per-doc
    # array column (previously a second sequential staging write over a
    # re-read of the hashes). Parquet column pruning serves both
    # consumer families from the same files — (id, _hs) for the verify
    # sides and sig append, (id, _bands) for the probe/candidate
    # join/bands append — and the shard probe rides this write as a
    # bounded bitmask observation (guide §1.2: two staging jobs + their
    # probe became one job). Fixed staging name is safe: foreachBatch
    # batches are sequential, and a crashed batch replays from the
    # marker, overwriting the stage.
    from etl_tool_spark.llm import store as _store
    from etl_tool_spark.llm.dedup import (_band_bucket_array,
                                          minhash_from_hashes_vec,
                                          shingle_hashes)
    staging = _os.path.join(store_dir, "gate-staging")
    fused = (batch_df
             .select(F.col(id_col),
                     shingle_hashes(F.col(text_col), shingle_n).alias("_hs"))
             .withColumn("_sig", minhash_from_hashes_vec(F.col("_hs"),
                                                         num_hashes))
             .withColumn("_bands", _band_bucket_array(F.col("_sig"),
                                                      num_hashes, bands))
             .drop("_sig"))
    observed, resolve = _store.fused_probe_observation(
        fused, _store.shard_array(F.col("_bands"), with_index=True))
    observed.write.mode("overwrite").parquet(staging)
    probe = resolve()
    staged = spark.read.parquet(staging)
    hs = staged.select(id_col, "_hs")
    banded_new = staged.select(
        id_col, F.posexplode("_bands").alias("_band", "_bucket"))
    pairs = incremental_minhash_pairs(
        hs, store_dir, id_col=id_col, update_store=False, prehashed=True,
        banded_frame=banded_new, probe=probe,
        **{k: v for k, v in minhash_kwargs.items() if k != "shingle_n"})
    # lazy checkpoint: the landing write materializes the gate join once
    # and the signature append reads the SAME batch-sized blocks — never
    # a recompute, and never a re-scan of the whole (ever-growing)
    # out_dir just to recover ids this batch computed (round-7 advisor:
    # that read made per-batch gate cost grow with corpus history)
    survivors = _gate_survivors(batch_df, pairs, id_col) \
        .localCheckpoint(eager=False)
    (survivors.withColumn("batch_id", F.lit(batch_id))
              .write.mode("append").parquet(out_dir))
    landed_ids = survivors.select(id_col).distinct()
    # survivors' band keys come from the staged array column (banding
    # ran once, at stage time) — with them supplied, append_signatures
    # writes sig/ and bands/ concurrently instead of re-banding the
    # just-appended signatures and paying the two appends back to back
    append_signatures(hs.join(landed_ids, id_col), store_dir,
                      id_col=id_col, prehashed=True,
                      banded=banded_new.join(landed_ids, id_col),
                      **sig_kwargs)
    commit()
    from etl_tool_spark.llm.graph import _checkpoint_rdd
    surv_rdd = _checkpoint_rdd(survivors)
    if surv_rdd is not None:  # release batch blocks; streams run forever
        surv_rdd.unpersist(False)
    _shutil.rmtree(staging, ignore_errors=True)


def near_dedup_ingest_stream(docs: DataFrame, store_dir: str, out_dir: str,
                             checkpoint: str, id_col: str = "doc_id",
                             text_col: str = "text", **minhash_kwargs):
    """Streaming near-dup dedup-on-ingest: each micro-batch lands only
    documents that near-duplicate neither a previously landed survivor
    nor a smaller-id batch sibling (see land_near_batch). The always-
    near-dup-free landing zone — where near_dedup_stream is the pair
    REPORT over everything ingested, this is the ingest GATE."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        land_near_batch(batch_df, batch_id, store_dir, out_dir,
                        id_col=id_col, text_col=text_col, **minhash_kwargs)

    q = (docs.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def land_semantic_batch(batch_df: DataFrame, batch_id: int, store_dir: str,
                        out_dir: str, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.45, **lsh_kwargs) -> None:
    """SEMANTIC (embedding-cosine) ingest gate for one batch — the
    land_near_batch policy verbatim with sign-LSH cosine pairs instead
    of minhash Jaccard pairs: a batch vector drops if it
    cosine-near-duplicates a landed survivor (stored wins) or a
    smaller-id batch sibling; only survivor vectors + band keys enter
    the store (llm/similarity.py incremental store). Same
    land-before-store crash order and _batch_marker replay no-op as
    land_near_batch."""
    import os as _os
    import shutil as _shutil

    from etl_tool_spark.llm.similarity import (append_embedding_signatures,
                                               incremental_embedding_pairs)

    applied, commit = _batch_marker(store_dir, batch_id)
    if applied:
        return
    spark = batch_df.sparkSession
    # norms + sign projections + band keys stage once in ONE fused
    # write (see incremental_embedding_pairs' staging branch); the
    # survivor append below reuses the staged table, so the batch is
    # projected exactly once per landing
    staging = _os.path.join(store_dir, "gate-staging")
    pairs = incremental_embedding_pairs(
        batch_df, store_dir, threshold=threshold, id_col=id_col,
        vec_col=vec_col, update_store=False, staging_dir=staging,
        **lsh_kwargs)
    # same survivors-checkpoint shape as land_near_batch: ids come from
    # the batch's own materialized frame, not an out_dir re-scan
    survivors = _gate_survivors(batch_df, pairs, id_col) \
        .localCheckpoint(eager=False)
    (survivors.withColumn("batch_id", F.lit(batch_id))
              .write.mode("append").parquet(out_dir))
    landed_ids = survivors.select(id_col).distinct()
    staged = spark.read.parquet(staging)
    append_embedding_signatures(
        staged.select(id_col, vec_col, "_norm").join(landed_ids, id_col),
        store_dir, id_col=id_col, vec_col=vec_col, prenormed=True,
        banded=staged.select(id_col, F.explode("_bkts").alias("_bkt"))
                     .join(landed_ids, id_col),
        **lsh_kwargs)
    commit()
    from etl_tool_spark.llm.graph import _checkpoint_rdd
    surv_rdd = _checkpoint_rdd(survivors)
    if surv_rdd is not None:
        surv_rdd.unpersist(False)
    _shutil.rmtree(staging, ignore_errors=True)


def semantic_ingest_stream(vecs: DataFrame, store_dir: str, out_dir: str,
                           checkpoint: str, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.45, **lsh_kwargs):
    """Streaming semantic dedup-on-ingest: each micro-batch lands only
    vectors whose cosine similarity to every previously landed survivor
    and every smaller-id batch sibling stays below the threshold — the
    embedding twin of near_dedup_ingest_stream, for corpora deduped on
    meaning (paraphrases, re-encodes) rather than surface text."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        land_semantic_batch(batch_df, batch_id, store_dir, out_dir,
                            id_col=id_col, vec_col=vec_col,
                            threshold=threshold, **lsh_kwargs)

    q = (vecs.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def land_clean_batch(batch_df: DataFrame, batch_id: int, store_dir: str,
                     out_dir: str, id_col: str = "doc_id",
                     text_col: str = "text", **minhash_kwargs) -> None:
    """Full cleaning gate for one (already quality/language-filtered)
    batch — the streaming twin of llm/pipeline.py clean_corpus's dedup
    stages over one store family:

      exact:  keep the min-id representative per normalized fingerprint
              (batch-internal) that is not already fingerprint-stored;
      near:   drop representatives near-duplicating a LANDED survivor
              or a smaller-id batch sibling (_gate_survivors policy);
      land:   survivors append to ``out_dir``; only SURVIVOR
              fingerprints + signatures enter the store — both stores
              describe exactly the landed corpus, so a later exact copy
              of a never-landed doc is judged (correctly) against what
              the corpus actually kept.

    Store layout: ``store_dir/fp`` fingerprints, ``store_dir/sig`` +
    ``store_dir/bands`` minhash tables, ``store_dir/_applied`` batch
    markers (land-before-store order; replay of a fully-applied batch
    is a no-op)."""
    import os
    import shutil as _shutil

    applied, commit = _batch_marker(store_dir, batch_id)
    if applied:
        return
    spark = batch_df.sparkSession
    fresh = incremental_exact_dedup(batch_df, os.path.join(store_dir, "fp"),
                                    id_col=id_col, text_col=text_col,
                                    update_store=False)
    # FUSED staging — one write carries the exact-dedup survivors WITH
    # their shingle hashes, fingerprint, AND band-key array: `fresh` is
    # an anti-join plan and the md5 shingle pass is the batch's dominant
    # cost — without staging both re-ran for banding, each verify side,
    # the landing write, and the store appends; the band keys previously
    # cost a SECOND staging write over a re-read of the hashes. Column
    # pruning serves every consumer from the one staged table, and the
    # shard probe rides this write as a bounded bitmask observation
    # (land_near_batch rationale, guide §1.2).
    from etl_tool_spark.llm import store as _store
    from etl_tool_spark.llm.dedup import (_band_bucket_array,
                                          minhash_from_hashes_vec,
                                          shingle_hashes)
    shingle_n = minhash_kwargs.get("shingle_n", 3)
    num_hashes = minhash_kwargs.get("num_hashes", 16)
    bands = minhash_kwargs.get("bands", 8)
    staging = os.path.join(store_dir, "gate-staging")
    fused = (fresh.withColumn("_hs", shingle_hashes(F.col(text_col),
                                                    shingle_n))
                  .withColumn("_fp", fingerprint(F.col(text_col)))
                  .withColumn("_sig", minhash_from_hashes_vec(F.col("_hs"),
                                                              num_hashes))
                  .withColumn("_bands", _band_bucket_array(F.col("_sig"),
                                                           num_hashes,
                                                           bands))
                  .drop("_sig"))
    observed, resolve = _store.fused_probe_observation(
        fused, _store.shard_array(F.col("_bands"), with_index=True))
    observed.write.mode("overwrite").parquet(staging)
    probe = resolve()
    staged = spark.read.parquet(staging)
    hs = staged.select(id_col, "_hs")
    banded_new = staged.select(
        id_col, F.posexplode("_bands").alias("_band", "_bucket"))
    pairs = incremental_minhash_pairs(
        hs, store_dir, id_col=id_col, update_store=False, prehashed=True,
        banded_frame=banded_new, probe=probe,
        **{k: v for k, v in minhash_kwargs.items() if k != "shingle_n"})
    # survivors carry their own staged _hs/_fp/_bands columns, so the
    # store appends read the checkpoint blocks directly — no out_dir
    # re-scan, no join-back through `staged`
    survivors = _gate_survivors(staged, pairs, id_col) \
        .localCheckpoint(eager=False)
    (survivors.drop("_hs", "_fp", "_bands")
              .withColumn("batch_id", F.lit(batch_id))
              .write.mode("append").parquet(out_dir))
    landed_staged = survivors
    sig_kwargs = {k: v for k, v in minhash_kwargs.items()
                  if k in ("num_hashes", "bands")}
    # fp/ appends SEQUENTIALLY FIRST: it is the replay idempotence
    # guard — incremental_exact_dedup anti-joins fp/, so a crash-replay
    # after fp committed re-appends nothing. Overlapping fp with the
    # sig+bands pair (as one round-8 revision did) breaks that: a crash
    # could leave sig/ committed with fp/ absent, the replayed batch
    # would be judged fresh and re-append everything, and the duplicate
    # (id, _hs) rows would permanently inflate _jaccard_verify's
    # intersection counts (jaccard > true value, spurious drops in every
    # later batch). Only the sig/bands pair overlaps (inside
    # append_signatures) — those two are guarded by fp, not by each
    # other.
    (landed_staged.select("_fp").write.mode("append")
                  .parquet(os.path.join(store_dir, "fp")))
    append_signatures(
        landed_staged.select(id_col, "_hs"), store_dir, id_col=id_col,
        prehashed=True,
        banded=landed_staged.select(
            id_col, F.posexplode("_bands").alias("_band", "_bucket")),
        **sig_kwargs)
    commit()
    from etl_tool_spark.llm.graph import _checkpoint_rdd
    surv_rdd = _checkpoint_rdd(survivors)
    if surv_rdd is not None:
        surv_rdd.unpersist(False)
    _shutil.rmtree(staging, ignore_errors=True)


def full_clean_ingest_stream(docs: DataFrame, store_dir: str, out_dir: str,
                             checkpoint: str, id_col: str = "doc_id",
                             text_col: str = "text",
                             min_quality: float = 0.5, **minhash_kwargs):
    """The COMPLETE streaming cleaning pipeline — clean_corpus as an
    ingest gate: stateless quality + language filters run on the stream
    frame (pushed into each micro-batch's scan), then every batch
    passes the exact and near-dup gates against the landed corpus
    (land_clean_batch). The landing zone is always filtered, exactly
    deduped, and pairwise near-dup-free."""
    from etl_tool_spark.llm.text import language_id, quality_features, tokens

    base = docs.select("*", tokens(F.col(text_col)).alias("_toks"))
    feats = quality_features(F.col(text_col), toks=F.col("_toks"))
    kept = (base.select("*",
                        feats["quality_score"].alias("_q"),
                        language_id(F.col(text_col),
                                    toks=F.col("_toks")).alias("_lang"))
                .filter((F.col("_q") >= min_quality)
                        & (F.col("_lang") != "und"))
                .drop("_toks", "_q", "_lang"))

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        land_clean_batch(batch_df, batch_id, store_dir, out_dir,
                         id_col=id_col, text_col=text_col, **minhash_kwargs)

    q = (kept.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def land_budget_batch(batch_df: DataFrame, batch_id: int, store_dir: str,
                      out_dir: str, id_col: str = "doc_id",
                      text_col: str = "text",
                      token_quota: int | None = None,
                      quota_frac: float | None = None) -> None:
    """Token-budget admission gate for one batch: score each document
    (llm/text.py quality features), walk the batch best-quality-first
    and land documents until the batch's token quota is spent — the
    greedy fill of operators/globalorder.py:budget_select, so the
    boundary document that crosses the quota is admitted and everything
    after it is dropped. The throttle for a compute- or
    storage-constrained landing zone that should keep the BEST fraction
    of each ingest cycle, not a random one.

    Exactly one of ``token_quota`` (absolute tokens per batch) or
    ``quota_frac`` (fraction of the batch's own token mass) must be
    given. ``store_dir`` holds only the _applied batch markers —
    replays of a fully-applied batch are no-ops; the admission decision
    itself is a pure function of the batch content, so at-least-once
    replays of an unmarked batch land the same rows (collapse on
    batch_id)."""
    from etl_tool_spark.llm.text import quality_features, token_count, tokens
    from etl_tool_spark.operators.globalorder import budget_select

    if (token_quota is None) == (quota_frac is None):
        raise ValueError("pass exactly one of token_quota / quota_frac")
    applied, commit = _batch_marker(store_dir, batch_id)
    if applied:
        return
    base = batch_df.select("*", tokens(F.col(text_col)).alias("_toks"))
    feats = quality_features(F.col(text_col), toks=F.col("_toks"))
    scored = base.select("*", feats["quality_score"].alias("_q"),
                         token_count(F.col(text_col)).alias("_nt")) \
                 .drop("_toks")
    # the scored frame feeds the quota total, the band summary, and the
    # offset join-back — a lazy checkpoint runs the tokenize+quality
    # pass once instead of once per reference
    scored = scored.localCheckpoint(eager=False)
    if quota_frac is not None:
        total = scored.agg(F.sum("_nt").alias("_total"))
        scored = scored.crossJoin(F.broadcast(total))
        budget = F.col("_total") * quota_frac
    else:
        budget = F.lit(token_quota)
    sel = budget_select(scored, band="_q",
                        intra_order=[F.col(id_col).asc()],
                        weight="_nt", budget=budget, cum_out="_cum")
    (sel.drop("_cum", "_total")
        .withColumnRenamed("_q", "quality_score")
        .withColumnRenamed("_nt", "n_tokens")
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("append").parquet(out_dir))
    commit()


def budget_ingest_stream(docs: DataFrame, store_dir: str, out_dir: str,
                         checkpoint: str, id_col: str = "doc_id",
                         text_col: str = "text",
                         token_quota: int | None = None,
                         quota_frac: float | None = None):
    """Streaming token-budget admission: every micro-batch lands its
    best-quality documents up to the quota (land_budget_batch). Same
    foreachBatch + marker delivery contract as the dedup gates."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        land_budget_batch(batch_df, batch_id, store_dir, out_dir,
                          id_col=id_col, text_col=text_col,
                          token_quota=token_quota, quota_frac=quota_frac)

    q = (docs.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def crawl_ingest_stream(archives: DataFrame, store_dir: str, out_dir: str,
                        checkpoint: str, id_col: str = "media_id",
                        payload_col: str = "payload"):
    """Streaming web-crawl ingestion: each micro-batch of WARC archive
    blobs is split into records (llm/warc.py — map-side explode),
    response blocks stripped back to prose (html_to_text, pure Column),
    language-routed, and passed through the exact dedup-on-ingest gate
    — survivors land in ``out_dir`` with (id, target_uri, lang, text),
    fingerprints in the persistent store, so a page crawled twice in
    ANY later batch never lands twice. Composition of the archive
    walker with land_batch's crash-safety contract: out_dir before
    store, batch markers make replays no-ops, at-least-once in the
    crash window (see land_batch). This is the Common Crawl ingest
    loop as one availableNow stream."""
    from etl_tool_spark.llm.prep import html_to_text
    from etl_tool_spark.llm.text import language_id, tokens
    from etl_tool_spark.llm.warc import warc_records

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        recs = warc_records(
            batch_df.withColumnRenamed(id_col, "media_id"),
            payload_col=payload_col)
        pages = (recs.filter(F.col("warc_type") == "response")
                     .select("media_id", "target_uri",
                             F.col("block").cast("string").alias("_page")))
        ext = pages.select("media_id", "target_uri",
                           html_to_text(F.col("_page")).alias("text"))
        # token array in its own projection (language_id contract: stops
        # CollapseProject re-inlining the split per stopword counter)
        toked = ext.select("*", tokens(F.col("text")).alias("_toks"))
        docs = toked.select("media_id", "target_uri", "text",
                            language_id(F.col("text"), toks=F.col("_toks"))
                             .alias("lang"))
        land_batch(docs, batch_id, store_dir, out_dir,
                   id_col="media_id", text_col="text")

    q = (archives.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
