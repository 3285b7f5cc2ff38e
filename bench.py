"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_tool_spark.catalog import SPARK
from etl_tool_spark.session import get_spark

# Headline set: every operator family, weighted toward the scans/joins/
# windows that dominate at scale.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "join_broadcast_dims",
    "join_semi",
    "window_topn_per_group",
    "window_running_total",
    "agg_rollup",
    "set_ops",
    "events_window_agg",
    "events_sessionize",
    "events_multi_rollup",
    "join_asof",
    "etl_filter_expr",
    "etl_mapping_chain",
    "etl_dedup_min",
    "etl_flatten_explode",
    "llm_exact_dedup",
    "llm_quality_score",
    "llm_minhash_lsh_pairs",
    "llm_simhash_near_pairs",
    "llm_simhash_buckets",
    "llm_embedding_topk",
    "llm_clean_corpus",
    "llm_dedup_groups",
    "llm_embedding_ivf_topk",
    "llm_sequence_pack",
    "llm_contamination",
    "q18_large_orders",
    "q19_disjunctive",
    "llm_repetition_stats",
    "llm_boilerplate_ngrams",
    "llm_unigram_logprob",
    "events_funnel",
    "events_ohlc_bars",
    "events_interpolate",
    "events_twap",
    "er_edit_distance_join",
    "llm_weighted_sample",
    "etl_snapshot_asof",
    # round 3: the remaining TPC-H shapes + warehouse + time-series +
    # skew/sql/linkage queries, so regressions surface where they'd occur
    "q2_min_per_group_join",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_cnt",
    "q17_small_qty_revenue",
    "q20_potential_promotion",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "etl_profile_orders",
    "etl_scd2_intervals",
    "etl_quality_checks",
    "etl_cdc_merge_fold",
    "events_hopping_window",
    "events_islands",
    "events_gap_fill",
    "events_retention_cohorts",
    "events_anomaly_zscore",
    "events_trending",
    "agg_salted_skew",
    "agg_robust_outliers",
    "sql_recursive_hierarchy",
    "sql_lateral_topk",
    "join_range_banded",
    "er_edit_distance_join_d2",
    "llm_incremental_dedup",
    "llm_repeated_spans",
    "llm_semantic_dedup_groups",
    "llm_embedding_dim_stats",
    "llm_temperature_mix",
    "llm_vocab_coverage",
    "llm_epoch_shuffle",
    "llm_ngram_novelty",
    "llm_dedup_cluster_stats",
    "er_trigram_join",
    "agg_histogram_equidepth",
    "events_sliding_distinct",
    "events_funnel_windowed",
    "llm_tokenizer_fertility",
    "llm_token_budget_select",
    "agg_pareto_frontier",
    "llm_minhash_threshold_sweep",
    "graph_pagerank",
    # round 4: lexical retrieval + exact-substring surgery + hybrid fusion
    "llm_bm25_topk",
    "llm_substring_excise",
    "llm_hybrid_rrf",
    "join_interval_overlap",
    "llm_ngram_containment_pairs",
    "llm_source_overlap",
    "llm_paragraph_dedup",
    "llm_dsir_weights",
    "join_salted_skew",
    "llm_hard_negatives",
    "llm_curriculum_phases",
    "llm_paragraph_gate_fold",
    "llm_lsh_planner",
    "agg_sketch_rollup",
    # round 5: corpus-scale hard negatives (IVF-composed) + audio triage
    "llm_ivf_hard_negatives",
    "llm_mp3_metadata",
    "llm_knn_label_consistency",
    "llm_bpe_pair_counts",
    "llm_winnow_contamination",
    # round 6: ISO-BMFF container triage + PQ / IVF-PQ memory-bound ANN
    # + batch lexical retrieval
    "llm_mp4_metadata",
    "llm_pq_topk",
    "llm_ivfpq_topk",
    "llm_bm25_batch_topk",
    "llm_id3v2_tags",
    "llm_unicode_nfc",
    # round 6 (cont.): cluster-pruned semantic dedup + web-crawl text
    # triage (HTML strip, script profiling, LM perplexity terciles)
    "llm_semdedup",
    "llm_html_extract",
    "llm_script_detect",
    "llm_ngram_lm_score",
    "llm_mmr_topk",
    # round 6 (cont.): bounded-shuffle heavy hitters + discriminative
    # quality classifier + FLAC audio triage
    "agg_heavy_hitters",
    "llm_quality_classifier",
    "llm_flac_metadata",
    "llm_warc_extract",
    "llm_crawl_ingest",
    "join_bucketed_colocated",
    "llm_classifier_eval",
    "etl_k_anonymity",
    "events_late_arrival_stats",
    # round 6 (cont.): distributed BPE train/encode, nearest-direction
    # as-of, key-skew profiler
    "llm_bpe_train_merges",
    "llm_bpe_encode",
    "join_asof_nearest",
    "agg_key_skew",
]

# round 7: FULL-catalog coverage (VERDICT r6 #3) — every registered
# catalog query gets a timing history, so a regression anywhere shows
# up in BENCH_r{N} rather than only in a driver replay's wall clock.
# Auto-extension keeps future catalog additions benched by default; the
# curated list above preserves its historical order for diffing.
BENCH_QUERIES += sorted(set(SPARK) - set(BENCH_QUERIES))


def baseline_outliers(timings: dict, already: list, sf: str,
                      base_path: str, ratio: float = 1.8,
                      cap: int = 10) -> list:
    """Queries reading > ``ratio`` x their frozen same-host baseline —
    the mechanical selection for the clean-bracket retry pass (a >1.8x
    reading on an unchanged plan is far more often JVM-state noise,
    sub-second queries especially, than a real regression). Returns []
    on any baseline problem (missing file, cross-sf freeze): retries
    are diagnostics and must never sink the bench."""
    import json as _json
    import os as _os
    try:
        with open(base_path, encoding="utf-8") as f:
            doc = _json.load(f)
        if str(doc.get("sf")) != str(sf):
            return []
        base = doc.get("queries", {})
        return [n for n in timings
                if n not in already and base.get(n, 0) > 0
                and timings[n] / base[n] > ratio][:cap]
    except (OSError, ValueError):
        return []


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("etl_tool_spark_bench")

    # silence the per-execution WindowExec single-partition warning in
    # the bench log ONLY: every unpartitioned window in the catalog is
    # plan-asserted to sit above a band/vocab-summary-sized aggregate
    # (scripts/audit_plans.py unpartitioned_window_violations + the
    # test_plans.py catalog-wide sweep), so here the warning is
    # verified noise that used to swamp the recorded tail
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR)
    except Exception as e:
        print(f"# WindowExec log tuning skipped: {e}", file=sys.stderr)

    # one warm-up action so JVM/codegen startup isn't billed to query 1
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # spin up the per-core Python worker pool before timing: the
    # Arrow-batched pandas-UDF queries otherwise pay worker spawn +
    # numpy/pandas import once per core inside their first timed run —
    # observed as multi-second stalls that min-of-N doesn't always absorb
    from etl_tool_spark.llm.dedup import simhash_from_hashes_vec
    from pyspark.sql import functions as _F

    n_cores = spark.sparkContext.defaultParallelism
    (spark.range(n_cores * 4).repartition(n_cores)
          .select(simhash_from_hashes_vec(_F.array("id"), 1)).count())

    # the multi-stage LLM pipelines carry the most generated code; their
    # first executions land while HotSpot is still interpreting/compiling
    # it, so one extra repeat is needed before the timing stabilizes
    # (measured: run sequences like 15.7s → 6.3s on identical plans)
    heavy = {"llm_minhash_lsh_pairs", "llm_simhash_near_pairs",
             "llm_clean_corpus", "llm_dedup_groups",
             "llm_incremental_dedup", "llm_semantic_dedup_groups",
             "llm_dedup_cluster_stats", "er_edit_distance_join_d2",
             "er_trigram_join", "llm_minhash_threshold_sweep",
             "llm_substring_excise", "graph_pagerank"}

    # compile + JIT every query's generated code on the tiny sf0.001
    # tables first: the plan SHAPE (and therefore the generated source,
    # keyed into Spark's codegen cache) is identical across sf dirs, so
    # each timed run below measures steady-state execution rather than
    # first-run Janino compilation + HotSpot warm-up (measured: the
    # heaviest pipeline's first run drops ~60s → ~7s; sf0.001 passes
    # cost ~0.3s each)
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in BENCH_QUERIES:
            try:
                SPARK[name](spark, warm_dir).count()
            except Exception:
                pass  # warm-up is best-effort; the timed run will report

    def _run_once(name: str) -> tuple[float, int]:
        t0 = time.time()
        rows = SPARK[name](spark, sf_dir).count()  # materialize the result
        return time.time() - t0, rows

    def _median(xs: list[float]) -> float:
        return sorted(xs)[len(xs) // 2]

    # ambient-drift sentinel: a fixed scan-agg query timed at the start,
    # after every SENTINEL_EVERY queries, and at the end of each pass.
    # Round 4's record could not distinguish a real regression from
    # JVM/GC pressure drifting EVERY query +10-20% over a long run, and
    # round 5's start/end-only sentinel could not attribute WHICH
    # queries ran under the 2.1× ambient slowdown it recorded. The
    # interleaved trace gives each (query, pass) the sentinel reading
    # of its segment.
    SENTINEL = "q6_forecast_revenue"
    SENTINEL_EVERY = 10

    def _sentinel() -> float:
        return _median([_run_once(SENTINEL)[0] for _ in range(3)])

    # POSITION-INDEPENDENT ORDER: queries are timed in sorted-name
    # order, NOT registration/rotation order — round 5 showed per-query
    # deltas riding the within-run drift gradient whenever a round's
    # catalog additions reshuffled the run order (round-5 verdict
    # item 4). Sorted order is stable across rounds no matter what the
    # driver rotation or this list's append history does.
    run_order = sorted(BENCH_QUERIES)

    # one UNTIMED full pass at the target sf: first-run Janino
    # compilation, HotSpot JIT, page-cache fill. The multi-stage heavy
    # pipelines get a second warm run (measured: identical plans go
    # 15.7s → 6.3s while HotSpot is still compiling their codegen).
    for name in run_order:
        try:
            _run_once(name)
            if name in heavy:
                _run_once(name)
        except Exception:
            pass  # warm-up is best-effort; the timed pass will report

    # INTERLEAVED WHOLE-CATALOG PASSES (round-7 verdict item 4): the
    # catalog is timed once per pass, and each query's median is taken
    # ACROSS passes. Back-to-back per-query repeats shared whatever
    # contention window the host was in — all three samples rode the
    # same spike and the median kept it (round-7: max_over_best 6.99,
    # 14 queries needed a retry). Samples minutes apart decorrelate
    # from contention, so one loud window costs one sample, which the
    # median discards.
    N_PASSES = 3
    trace: list[float] = []
    pass_times: dict[str, list[float]] = {n: [] for n in run_order}
    pass_seg: dict[str, list[int]] = {n: [] for n in run_order}
    rows_of: dict[str, int] = {}
    for p in range(N_PASSES):
        trace.append(_sentinel())
        for i, name in enumerate(run_order):
            t, rows_of[name] = _run_once(name)
            pass_times[name].append(t)
            pass_seg[name].append(len(trace) - 1)
            if (i + 1) % SENTINEL_EVERY == 0 and i + 1 < len(run_order):
                # segment hygiene: localCheckpoint blocks from completed
                # queries are reclaimed by the ContextCleaner only after
                # their references are GC'd; one advisory GC per segment
                # keeps the storage footprint bounded. HISTORY: the 5s ↔
                # 40-100s run-to-run swings previously blamed on ambient
                # contention were root-caused to a page-fault convoy in
                # the driver JVM (grow-on-demand heap × G1 commit/
                # uncommit × 20+ executor threads); fixed at the engine
                # level (session.py pins Xms = Xmx + AlwaysPreTouch).
                # The drift sentinel trace stays as the independent
                # witness that a run was quiet.
                spark.sparkContext._jvm.System.gc()
                trace.append(_sentinel())
        print(f"# pass {p + 1}/{N_PASSES} done "
              f"({sum(t[-1] for t in pass_times.values()):.1f}s)",
              file=sys.stderr)

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    segment_of: dict[str, int] = {}
    for name in run_order:
        runs = pass_times[name]
        med = _median(runs)
        timings[name] = round(med, 3)
        spreads[name] = [round(t, 3) for t in sorted(runs)]
        # the segment whose pass produced the median — its sentinel
        # reading is the machine context of the RECORDED number
        segment_of[name] = pass_seg[name][runs.index(med)]
        print(f"# {name}: {med:.2f}s median of {sorted(runs)} "
              f"({rows_of[name]} rows)", file=sys.stderr)

    # RETRY PASS: a query whose MEDIAN still came from a contended
    # segment (sentinel ≥ 1.5× the run's best — i.e. at least two of
    # its three interleaved passes were hit) carries machine noise, not
    # plan cost. Re-time it bracketed by fresh sentinel readings and
    # accept the retry median ONLY when both brackets are clean
    # (≤ 1.2× best) — round-7's keep-the-minimum rule gave retried
    # queries best-of-two sampling the rest of the catalog didn't get,
    # biasing them low vs the frozen baseline (round-7 advisor).
    retried: list[str] = []
    try:
        best_so_far = min(trace)
        noisy = sorted(
            (n for n in run_order
             if trace[segment_of[n]] / max(best_so_far, 1e-9) > 1.5),
            key=lambda n: -trace[segment_of[n]])[:25]
        # baseline-outlier retries: give apparent >1.8x regressions a
        # second clean-bracketed sample too, so drift exoneration (or
        # confirmation) is mechanical, not prose. Replacement follows
        # the same clean-bracket rule as contention retries: a genuine
        # regression re-measures slow and the flag stands.
        noisy += baseline_outliers(
            timings, noisy, sf,
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BASELINE_BENCH.json"))
        for name in noisy:
            pre = _sentinel()
            trace.append(pre)
            seg = len(trace) - 1
            runs2 = [_run_once(name)[0] for _ in range(3)]
            post = _sentinel()
            trace.append(post)
            best_now = min(trace)
            if max(pre, post) <= 1.2 * best_now:
                med2 = _median(runs2)
                timings[name] = round(med2, 3)
                spreads[name] = [round(t, 3) for t in sorted(runs2)]
                segment_of[name] = seg
                retried.append(name)
                print(f"# retry {name}: {med2:.2f}s (clean bracket)",
                      file=sys.stderr)
            else:
                print(f"# retry {name}: discarded (bracket "
                      f"{pre:.2f}/{post:.2f}s vs best {best_now:.2f}s)",
                      file=sys.stderr)
    except Exception as e:  # diagnostics must never sink the bench
        print(f"# retry pass aborted: {e}", file=sys.stderr)
    # unconditional: totals must match the per-query map they ride with
    # even if the retry pass died mid-update
    total = sum(timings.values())

    drift_end = _sentinel()
    trace.append(drift_end)
    drift_start = trace[0]
    best = min(trace)
    ambient = {name: round(trace[seg] / max(best, 1e-9), 3)
               for name, seg in segment_of.items()}
    drift = {"sentinel": SENTINEL,
             "every": SENTINEL_EVERY,
             "start_sec": round(drift_start, 3),
             "end_sec": round(drift_end, 3),
             "ratio": round(drift_end / max(drift_start, 1e-9), 3),
             "trace_sec": [round(t, 3) for t in trace],
             "max_over_best": round(max(trace) / max(best, 1e-9), 3),
             "retried": len(retried)}

    # compact plan-quality audit of the headline set, embedded in the
    # benchmark artifact: cartesians are the one never-acceptable shape,
    # exchange count is the shuffle budget (see scripts/audit_plans.py
    # for the full per-query sweep)
    import re

    def _n(p: str, node: str) -> int:
        return len(set(re.findall(rf"\((\d+)\) {node}\b", p)))

    cartesians = exchanges = 0
    for name in BENCH_QUERIES:
        try:
            df = SPARK[name](spark, "/root/testdata/sf0.001"
                             if os.path.isdir("/root/testdata/sf0.001")
                             else sf_dir)
            p = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            cartesians += _n(p, "CartesianProduct")
            exchanges += _n(p, "Exchange")
        except Exception:
            pass

    # approximation-quality floor: recall of the banded/trained ANN paths
    # vs the exact brute-force twin (the catalog entries now return the
    # thresholded contract row, so the raw pair sets are built here)
    recall: dict[str, float] = {}
    try:
        from pyspark.sql import functions as F

        from etl_tool_spark.llm import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = emb.filter(F.col("vec_id") < 10) \
                .select(F.col("vec_id").alias("query_id"), "embedding")

        def _pairs(df) -> set:
            return {(r["query_id"], r["vec_id"])
                    for r in df.select("query_id", "vec_id").collect()}

        exact = _pairs(S.brute_force_topk(emb, qs, k=5))
        approx = {
            "lsh_topk": S.lsh_topk(emb, qs, k=5, dim=64, bands=4,
                                   rows_per_band=2),
            "ivf_topk": S.ivf_topk(emb, qs, k=5, nlist=32, nprobe=16),
        }
        for key, df in approx.items():
            recall[key] = round(len(_pairs(df) & exact)
                                / max(len(exact), 1), 4)
    except Exception as e:  # recall is diagnostics; never sink the bench
        print(f"# recall computation failed: {e}", file=sys.stderr)

    # full per-query timings go to a sidecar file + stderr; the final
    # stdout line must stay COMPACT — round 3's 91-entry "queries" dict
    # outgrew the driver's tail-capture window and the whole line was
    # recorded as unparseable ("parsed": null), losing the round's perf
    # record. Only the slowest 10 ride the machine-readable line.
    # frozen numeric baseline (VERDICT r6 #2): BASELINE_BENCH.json holds
    # the round-6 per-query medians; per-query ratios make regressions
    # mechanical instead of archaeological. Full ratio map rides the
    # detail sidecar; the compact stdout line carries the geomean and
    # the worst offenders only.
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_BENCH.json")
    vs_baseline: dict[str, float] = {}
    vs_summary: dict = {}
    try:
        with open(base_path, encoding="utf-8") as f:
            base_doc = json.load(f)
        base = base_doc.get("queries", {})
        if str(base_doc.get("sf")) != str(sf):
            raise ValueError(
                f"baseline frozen at sf={base_doc.get('sf')}, run is "
                f"sf={sf}; cross-sf ratios are meaningless")
        vs_baseline = {n: round(t / base[n], 3) for n, t in timings.items()
                       if n in base and base[n] > 0}
        if vs_baseline:
            import math
            g = math.exp(sum(math.log(v) for v in vs_baseline.values())
                         / len(vs_baseline))
            worst = dict(sorted(vs_baseline.items(),
                                key=lambda kv: -kv[1])[:5])
            vs_summary = {"geomean": round(g, 3), "n": len(vs_baseline),
                          "worst": worst}
    except (OSError, ValueError) as e:
        print(f"# no baseline ratios: {e}", file=sys.stderr)

    # RE-FREEZE MODE (round-7 verdict item 2): the round-6 baseline was
    # frozen on a different machine state, so four unchanged queries
    # read >2× on today's host and the exoneration lived in prose. With
    # SPARK_GRAFT_FREEZE_BASELINE=1, this run's interleaved-pass medians
    # BECOME the baseline: the superseded file is kept as
    # BASELINE_BENCH_r6.json and the ratios vs the old numbers (the
    # documented drift) ride the new file's provenance block, making
    # any future >2× flag a same-host, same-harness comparison.
    if os.environ.get("SPARK_GRAFT_FREEZE_BASELINE") == "1":
        try:
            backup = os.path.join(os.path.dirname(base_path),
                                  "BASELINE_BENCH_r6.json")
            if os.path.exists(base_path) and not os.path.exists(backup):
                os.rename(base_path, backup)
            with open(base_path, "w", encoding="utf-8") as f:
                json.dump({
                    "frozen_from": "round 8 interleaved-pass bench "
                                   "(3 whole-catalog passes, medians "
                                   "across passes) on the current host",
                    "note": "Per-query median seconds at sf0.1 on "
                            "local[32]. bench.py emits per-query ratios "
                            "vs these; superseded round-6 numbers kept "
                            "in BASELINE_BENCH_r6.json.",
                    "sf": sf,
                    "drift_vs_r6": vs_summary,
                    "queries": timings,
                }, f, indent=1, sort_keys=True)
            print(f"# baseline re-frozen to {base_path}", file=sys.stderr)
        except OSError as e:
            print(f"# baseline re-freeze failed: {e}", file=sys.stderr)

    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_detail.json")
    try:
        with open(detail_path, "w", encoding="utf-8") as f:
            json.dump({"sf": sf, "queries": timings, "runs": spreads,
                       "ambient": ambient, "drift": drift,
                       "retried": retried, "vs_baseline": vs_baseline},
                      f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"# could not write {detail_path}: {e}", file=sys.stderr)

    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({
        "metric": "catalog_total_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries": slowest,
        "drift": drift,
        "vs_baseline": vs_summary,
        "recall_vs_exact": recall,
        "plan_stats": {"queries": len(BENCH_QUERIES),
                       "cartesian_products": cartesians,
                       "total_exchanges": exchanges},
        "detail_file": "bench_detail.json",
    }))


if __name__ == "__main__":
    main()
