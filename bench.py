#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the `noop` sink so the full plan executes
(scan → compute → exchange) without sink I/O distorting the measurement.

`--runs N` (or $SPARK_GRAFT_BENCH_RUNS) executes every query N times in ONE
process and reports per-query WARM MEDIANS — the regression-detection mode:
single-shot wall times on a shared host move ±20-50% between sessions
(BASELINE.md), so only a medians delta is evidence of a real plan change.
The driver contract (single JSON line, same schema) is unchanged; medians
runs add "runs": N.

Warm medians (3 timed reps after one discarded warm-up pass) are the
DEFAULT: both rounds' single-shot artifacts charged fixed Python-worker/
Arrow spin-up to whichever query ran first (llm_dedup_exact read 6-7x its
warm median), making the headline number mostly a startup measurement.
`--runs 1` restores single-shot.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — scan, hash agg, shuffle join,
# broadcast join, as-of join, window, top-k, sort-limit, flagship pipeline,
# streaming twin, dedup (exact/ngram/minhash), sim-search (HOF vs pandas),
# text stats, vectorized UDF.
HEADLINE = [
    "scan_parquet",
    "agg_hash",
    "join_shuffle",
    "join_broadcast",
    "join_asof",
    "win_rank",
    "win_topk_group",
    "sort_limit",
    "flagship_hourly_enriched",
    "stream_tumbling",
    "llm_dedup_exact",
    "llm_dedup_ngram",
    "llm_ngram_jaccard",
    "llm_dedup_near",
    "llm_dedup_simhash_md5",
    "llm_dedup_cluster",
    "llm_sim_search",
    "llm_sim_search_fast",
    "llm_text_stats",
    "llm_sample_hash",
    "llm_quality_filter",
    "llm_dedup_incremental",
    "llm_embed_centroids",
    "llm_pack_sequences",
    "llm_decontaminate",
    "llm_epoch_shuffle",
    "llm_repetition_filter",
    "llm_chunk_documents",
    "llm_tfidf",
    "llm_embed_quantize",
    "llm_sim_search_lsh",
    "llm_sim_search_lsh_checked",
    "llm_sim_search_route",
    "llm_split_train_eval",
    "pipeline_curate_corpus",
    "sink_merge_upsert",
    "stream_static_join",
    "agg_mode",
    "sql_cte_pipeline",
    "udf_pandas",
    "tpch_q1_full",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q18",
    "tpch_q21",
    "subquery_correlated",
    # round-3 additions: time-series rollups, warehouse maintenance,
    # entity resolution, robust stats, per-domain caps, audio modality
    "ts_resample_ohlc",
    "ts_interpolate_multi",
    "ts_vwap",
    "ts_anomaly_mad",
    "table_profile_stats",
    "agg_skew_kurt",
    "sink_scd2",
    "sink_zorder_layout",
    "join_fuzzy_blocked",
    "llm_domain_cap",
    "llm_multimodal_audio",
    # round-3 second wave: event-flow analytics, binned interval join,
    # vocab/temperature curation, k-means assignment
    "ts_sessionize",
    "funnel_conversion",
    "cohort_retention",
    "join_range_binned",
    "llm_vocab_build",
    "llm_sample_temperature",
    "llm_kmeans_assign",
    # round-3 third wave: full TPC-H, rolling stats, layout + export,
    # PQ encode, quality ensemble
    "tpch_q2",
    "tpch_q11",
    "ts_ewma",
    "ts_zscore_rolling",
    "win_rolling_median",
    "win_running_distinct",
    "scan_partition_pruned",
    "sink_training_shards",
    "llm_embed_pq",
    "llm_quality_ensemble",
    # round-4 additions: bounded-state/salted scale twins, viz
    # downsampling, one-scan correlation matrix, CDC apply, semantic
    # dedup, table checksum, drawdown, point-in-time features, PageRank
    "ts_sessionize_fragments",
    "funnel_windowed_salted",
    "ts_downsample_m4",
    "agg_corr_matrix",
    "cdc_apply_changes",
    "llm_semdedup",
    "table_checksum",
    "ts_max_drawdown",
    "llm_training_examples",
    "graph_pagerank",
    "fn_xml",
    # round-4 second wave: graph census, tokenizer training, preference
    # pairs, ACF, SCD2 read side, attribution, snapshot diff, CUSUM,
    # expectations suite, entropy, journey paths, span corruption
    "graph_triangle_count",
    "llm_bpe_merge_step",
    "llm_preference_pairs",
    "ts_autocorr",
    "join_scd2_pointintime",
    "attribution_channels",
    "llm_dataset_diff",
    "ts_cusum_changepoint",
    "validate_expectations",
    "llm_lang_entropy",
    "path_analysis_sessions",
    "llm_span_corruption",
    "join_spatial_grid",
    "win_interval_concurrency",
    "ab_srm_check",
    "ab_ttest_welch",
    "ab_cuped_adjust",
    "graph_khop_reach",
    "ts_forecast_backtest",
    # round-4 third wave: containment dedup, held-out perplexity gate,
    # bigram LM, embedding drift, SFT rendering, weighted median, heavy
    # hitters, seasonal decomposition, IP toolkit, bipartite projection
    "llm_containment",
    "llm_perplexity_filter",
    "llm_bigram_lm",
    "llm_embed_drift",
    "llm_sft_format",
    "agg_weighted_median",
    "agg_heavy_hitters",
    "ts_seasonal_decompose",
    "fn_ip",
    "graph_bipartite_projection",
    "llm_multimodal_phash",
    "llm_kmeans_train",
    "sink_snapshot_publish",
    "sql_parameterized",
    "sql_pipe_syntax",
    "validate_observe_metrics",
    "scan_text",
    "fn_geohash",
    # round-4e: the bloom-gated decontamination path vs llm_decontaminate
    # above, and the RSI window as the ts-indicator representative
    "llm_decontaminate_bloom",
    "ts_rsi",
    # round-4f: one representative per new family — constraint audits,
    # DP release, drift monitors, robust trend/inference, survival/LTV,
    # spectral, inequality, retrieval, segmentation, JSONL export,
    # graph mixing, hard negatives, multiset algebra, skyline
    "validate_referential_integrity",
    "validate_pk_uniqueness",
    "validate_volume_anomaly",
    "validate_psi_drift",
    "llm_dp_noise",
    "llm_ngram_novelty",
    "llm_domain_route",
    "llm_hard_negatives",
    "llm_bm25_rank",
    "ts_theilsen",
    "ts_mann_kendall",
    "ts_periodogram",
    "ts_spectral_entropy",
    "ts_volatility_ohlc",
    "ts_sax_symbolize",
    "ts_hurst_rs",
    "ts_lead_lag_xcorr",
    "ts_rolling_beta",
    "ts_holt_linear",
    "ts_gap_report",
    "ts_runs_test",
    "ts_sma_crossover_backtest",
    "agg_target_encode",
    "join_existence_flag",
    "scan_dpp_join",
    "join_runtime_bloom",
    "llm_tokenizer_fertility",
    "cohort_survival_km",
    "cohort_ltv_curve",
    "ab_ratio_delta_ci",
    "agg_winsorized_mean",
    "agg_theil_index",
    "agg_rfm_segmentation",
    "join_skyline_pareto",
    "set_intersect_all",
    "graph_assortativity",
    "sink_export_jsonl",
    # round-5 additions: scale-safe siblings of the single-partition-sort
    # exact forms (VERDICT r4 item 4) — value-compressed weighted median /
    # winsorized mean, binned two-sample KS
    "agg_weighted_median_hist",
    "agg_winsorized_mean_hist",
    "ab_ks_binned",
    "ab_ks_two_sample",
]

# Driver-facing compact subset: the driver stores only the LAST 2000
# characters of bench stdout and parses the final JSON line out of that
# window, so the per-query map on the LAST line must stay well under 2000
# bytes — the full 159-query map (~4.5 KB) is what made BENCH_r04.json
# unparseable ("parsed": null). One representative per operator family,
# biased to the most expensive / structurally interesting plans; the FULL
# per-query map still prints first and is persisted to
# bench_full_latest.json (committed per round). Exclusion rule documented
# in BASELINE.md §"Bench headline protocol (round 5)".
DRIVER_COMPACT = [
    "scan_parquet", "agg_hash", "join_shuffle", "join_broadcast",
    "join_asof", "win_rank", "win_topk_group", "sort_limit",
    "flagship_hourly_enriched", "stream_tumbling",
    "llm_dedup_exact", "llm_dedup_near", "llm_sim_search",
    "llm_sim_search_fast", "llm_text_stats", "llm_tfidf", "llm_semdedup",
    "llm_bm25_rank", "llm_kmeans_train", "pipeline_curate_corpus",
    "sink_merge_upsert", "sink_scd2", "udf_pandas",
    "tpch_q1_full", "tpch_q3", "tpch_q6", "tpch_q18", "tpch_q21",
    "subquery_correlated",
    "ts_resample_ohlc", "ts_vwap", "ts_autocorr", "ts_seasonal_decompose",
    "ts_max_drawdown", "ts_downsample_m4",
    "agg_corr_matrix", "agg_weighted_median", "agg_weighted_median_hist",
    "agg_winsorized_mean", "agg_winsorized_mean_hist", "agg_heavy_hitters",
    "table_checksum", "table_profile_stats",
    "graph_pagerank", "graph_triangle_count", "graph_bipartite_projection",
    "graph_khop_reach", "graph_assortativity",
    "validate_expectations", "validate_psi_drift",
    "ab_ttest_welch", "ab_ks_two_sample", "ab_ks_binned",
    "join_runtime_bloom", "scan_dpp_join", "join_scd2_pointintime",
    "funnel_windowed_salted", "path_analysis_sessions",
    "cohort_survival_km", "llm_multimodal_phash",
    "llm_decontaminate_bloom", "llm_hard_negatives", "cdc_apply_changes",
]

# Hard byte budget for the final stdout line (driver tail window is 2000).
_COMPACT_BUDGET = 1900

# Queries whose wall time is dominated by Python-worker pool state rather
# than plan cost: the medians round-robin interleaves ~160 other queries
# between this key's reps, so the worker pool it warmed is churned by the
# multimodal/mapInPandas queries before its next rep — charging pool
# restart to a 0.4 s query (BENCH_r05 udf_pandas: 0.723 s vs 0.405 s
# canonical median, the only >1.5x flier; VERDICT r5 item 4). One untimed
# pre-warm execution immediately before each timed rep restores the
# steady-state number a user invoking the operator repeatedly would see.
PYWORKER_PREWARM = {"udf_pandas"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])

    from bitcoin_price_etl_spark.registry import load_all
    from bitcoin_price_etl_spark.session import get_spark

    spark = get_spark("bpe-spark-bench")
    registry = load_all()

    # warm the JVM + parquet footers + codegen'd agg paths once so per-query
    # numbers measure steady-state plans, not first-touch JIT/IO
    for warm in ("scan_parquet", "agg_hash"):
        registry[warm].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_once(key: str) -> float:
        # Drop Python refs to prior queries' DataFrames BEFORE timing so
        # the ContextCleaner can release their localCheckpoint blocks —
        # otherwise a long session accumulates executor-local blocks and
        # late-position queries pay eviction/GC pressure that reads as a
        # plan regression (the round-6 probe-sweep lesson: a 4.6x outlier
        # vanished to 1.1x in a fresh session).
        gc.collect()
        fn = registry[key].fn
        if key in PYWORKER_PREWARM:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    if runs <= 1:
        for key in HEADLINE:
            timings[key] = round(run_once(key), 3)
    else:
        # round-robin over the set (not N back-to-back of one query) so a
        # transient host-load spike degrades one REP of many queries, not
        # every rep of one query; run 0 is the warm-up and is discarded
        samples: dict[str, list[float]] = {k: [] for k in HEADLINE}
        for r in range(runs + 1):
            for key in HEADLINE:
                t = run_once(key)
                if r > 0:
                    samples[key].append(t)
        timings = {k: round(statistics.median(v), 3) for k, v in samples.items()}

    full_total = round(sum(timings.values()), 3)

    # ANN quality gate, machine-checked round-over-round (VERDICT r7
    # item 7): recall@10 of the lsh/ivf paths on BOTH regimes — the
    # shipped isotropic-noise embeddings (adversarial; ~0.3/0.5 is the
    # data's fault, llm_sim_search_recall docstring) and the shared
    # clustered fixture (llm/evalsets.py; floors >= 0.9). Lives in the
    # full record, not the budget-bounded final stdout line.
    recall: dict[str, dict[str, float]] = {}
    route_audit: dict[str, dict] = {}
    try:
        import tempfile

        from bitcoin_price_etl_spark.llm.evalsets import (
            write_clustered_embeddings,
        )
        from bitcoin_price_etl_spark.llm.simsearch import escalate_probe_mass

        clustered_dir = write_clustered_embeddings(
            tempfile.mkdtemp(prefix="graft_bench_recall_")
        )
        # Mid-CH corpora (VERDICT r10 item 4): planted structure INSIDE
        # the router's [2, 20) decision band — sigma=0.6 measures CH~6.9,
        # sigma=0.35 measures CH~17.9 (ROUTE_CALIBRATION_r11.json) — so
        # the exact/escalated/banded thresholds are checked against a
        # measured middle regime every round, not just the two extremes.
        mid_lo_dir = write_clustered_embeddings(
            tempfile.mkdtemp(prefix="graft_bench_midlo_"), sigma=0.6
        )
        mid_hi_dir = write_clustered_embeddings(
            tempfile.mkdtemp(prefix="graft_bench_midhi_"), sigma=0.35
        )
        regimes = (
            ("noise", sf_dir),
            ("clustered", clustered_dir),
            ("mid_ch7", mid_lo_dir),
            ("mid_ch18", mid_hi_dir),
        )
        for regime, rdir in regimes:
            rows = registry["llm_sim_search_recall"].fn(spark, rdir).collect()
            recall[regime] = {
                r["method"]: round(r["recall_at_k"], 4) for r in rows
            }
            # recall-vs-mass: every regime's recall row carries what the
            # escalation path PAID (probed-mass fraction) plus the CH the
            # router measured and the arm it picked — 'escalated bought
            # 0.9' is only meaningful next to 'at 0.62 mass'.
            rr = registry["llm_sim_search_route"].fn(spark, rdir).collect()[0]
            route_audit[regime] = {
                "ch_ratio": rr["ch_ratio"],
                "route": rr["route"],
                "escalate_mass": round(escalate_probe_mass(spark, rdir), 4),
            }
    except Exception as ex:  # noqa: BLE001 — recall must not sink the bench
        recall = {}
        route_audit = {}
        print(f"recall block failed: {type(ex).__name__}: {ex}", file=sys.stderr)
    # Self-describing artifact: which keys' numbers are post-prewarm
    # (ADVICE r6 — comparability with pre-r6 artifacts breaks silently
    # otherwise; BENCH_r05 udf_pandas is pre-prewarm, r6+ is post).
    prewarmed = sorted(PYWORKER_PREWARM & set(timings))
    full = {
        "metric": "headline_full_wall",
        "value": full_total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "prewarmed": prewarmed,
        "recall": recall,
        "route_audit": route_audit,
    }
    if runs > 1:
        full["runs"] = runs

    # Durable full record: the driver only keeps a 2 KB stdout tail, so the
    # complete per-query map lives in a committed file (and on the first
    # stdout line for any full-log capture). Non-default SF/runs passes
    # (iteration fast passes) write a scratch name instead — the canonical
    # sf0.1 medians record must never be clobbered by a fast pass
    # (VERIFY_ROUND.md; it happened in r7 and had to be restored from git).
    here = os.path.dirname(os.path.abspath(__file__))
    canonical = sf == "0.1" and runs >= 3
    record = "bench_full_latest.json" if canonical else f"bench_full_sf{sf}_r{runs}.json"
    with open(os.path.join(here, record), "w") as f:
        json.dump(full, f)
    print(json.dumps(full))

    # Driver-facing FINAL line: compact family-representative subset that
    # always fits the 2000-byte tail window (BENCH_r04 lesson). "value"
    # stays the compact-set total so value == sum(queries) for the parsed
    # artifact; "full_total"/"n_full" carry the whole-headline number.
    compact_keys = [k for k in DRIVER_COMPACT if k in timings]
    # Fallback final line (metric + totals, empty query map): printed if
    # compact_keys starts empty or the trim loop exhausts without fitting
    # the budget — both unreachable today (DRIVER_COMPACT ⊆ HEADLINE is
    # test-enforced) but this keeps the driver contract (a parseable final
    # JSON line under budget) under any future refactor. ADVICE r5.
    fallback = {
        "metric": "headline_total_wall",
        # value == sum(queries) is the artifact invariant; empty map -> 0.0
        # (full_total still carries the whole-headline number)
        "value": 0.0,
        "unit": "sec",
        "queries": {},
        "sf": float(sf),
        "full_total": full_total,
        "n_full": len(timings),
        "prewarmed": prewarmed,
    }
    if runs > 1:
        fallback["runs"] = runs
    line = json.dumps(fallback, separators=(",", ":"))
    while compact_keys:
        out = {
            "metric": "headline_total_wall",
            "value": round(sum(timings[k] for k in compact_keys), 3),
            "unit": "sec",
            "queries": {k: timings[k] for k in compact_keys},
            "sf": float(sf),
            "full_total": full_total,
            "n_full": len(timings),
            "prewarmed": prewarmed,
        }
        if runs > 1:
            out["runs"] = runs
        cand = json.dumps(out, separators=(",", ":"))
        if len(cand) <= _COMPACT_BUDGET:
            line = cand
            break
        compact_keys = compact_keys[:-1]
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
