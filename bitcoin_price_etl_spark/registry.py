"""Query registry — the driver-facing inventory (SURVEY.md §2.2).

Every operator the engine implements registers here with:
- key: the `queries()` name in __spark_entry__.py
- fn(spark, sf_dir) -> DataFrame: the Spark-native implementation
- oracle: equivalent DuckDB SQL over the pre-registered parquet views, or
  None for non-SQL-expressible ops (driver then records rows-only).

Parity discipline (SURVEY.md §5, §7 hard-parts):
- every computed column aliased identically in Spark and oracle SQL;
- no raw timestamp/decimal outputs — format timestamps to strings, cast
  decimals to double at the edge;
- float aggregations go through exprs.decimal-sum so partial-agg order can
  never change the answer (double sums are order-sensitive; decimal sums
  are exact and associative);
- order-sensitive / libm-dependent checked values (partial-agg averages,
  ln-derived scores, saturated-moment ratios) follow the
  quantize-then-double rule — coarse DECIMAL on BOTH sides, then cast back
  to DOUBLE at the edge; never emit DECIMAL or ARRAY columns themselves
  (the driver canonicalizer hashes decimals engine-differently and cannot
  hash list cells — both were round-1 failures). Full rationale:
  exprs.py module docstring.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: QueryFn
    oracle: Optional[str]
    doc: str = ""


def query(key: str, oracle: Optional[str] = None):
    """Decorator: register fn under key with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate query key {key!r}")
        REGISTRY[key] = QuerySpec(key=key, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# Keys with a green row in a driver CORRECTNESS_r{N}.json so far (r01: 46
# full pass + 2 rows-only-by-design sketch aggs — their maximal check).
# The driver's correctness gate records only the FIRST ~50 keys of
# ``queries()`` order per round, so ordered_keys() rotates never-verified
# keys to the front each round; keys listed here keep their hard evidence
# and stay covered by tests/test_oracle_parity.py locally. Extend per
# round with `python -m tools.merge_verified CORRECTNESS_r{N}.json`
# (writes driver_verified.json next to this module; the union below picks
# it up — no source edit needed).
_VERIFIED_R01: frozenset[str] = frozenset(
    {
        "agg_hash", "agg_distinct", "agg_approx_distinct", "agg_rollup_cube",
        "agg_conditional", "agg_stats", "agg_cube", "agg_pivot", "agg_median",
        "agg_grouping_sets", "agg_unpivot", "agg_bool", "agg_hll_sketch",
        "agg_histogram", "agg_minmax_by", "agg_mode", "agg_multi_distinct",
        # join_anti's r01 row is deliberately NOT honored: its unbounded
        # NOT EXISTS was vacuous (0 rows at every SF) and the semantics
        # changed to a date-bounded window — it must re-certify.
        "join_broadcast", "join_shuffle", "join_semi",
        "join_outer", "join_cross_scalar", "join_theta_range", "join_asof",
        "join_outer_full", "join_salted_skew", "project_rename",
        "project_regex", "filter_pred", "flatten_struct", "sort_limit",
        "set_union", "set_intersect", "set_except", "win_rank",
        "win_lag_price_change", "win_moving_avg", "win_topk_group",
        "win_dist", "win_value", "win_range_between", "win_gaps_islands",
        "fn_string", "fn_date", "fn_math", "fn_hash", "fn_json",
    }
)


def _load_verified_extra() -> frozenset[str]:
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "driver_verified.json")
    try:
        with open(path) as f:
            return frozenset(json.load(f))
    except (OSError, ValueError):
        return frozenset()


# Certifications explicitly revoked because the key's SEMANTICS changed
# after the driver row was recorded: green rows in CORRECTNESS files up to
# and including the named round do NOT count for these keys (they must
# re-certify in a later window). Mirrors the manual disavowals the merge
# workflow applied by editing driver_verified.json.
DISAVOWED_THROUGH: dict[str, int] = {
    # r1 row was a vacuous unbounded NOT EXISTS (re-certified r3)
    "join_anti": 1,
    # cosine gate changed 0.5 -> 0.35 after its r2 row (ADVICE r3)
    "llm_dedup_embed": 2,
    # r4 row was rows-only; upgraded to a table-free DuckDB oracle in r5
    # (VERDICT r4 item 8) — must re-certify at hash class
    "pipeline_golden": 4,
    # r7 sf0.1 parity audit: quantize-of-computed-quotient/product forms
    # replaced with exact restatements (values change in the last checked
    # digits) — every pre-r7 green row is for the old form
    "ts_rsi": 6,
    "ts_lead_lag_xcorr": 6,
    "ts_cusum_changepoint": 6,
    # r8 degenerate-corpus probe: the ROWS-framed ECDF cumulative made
    # mid-tie-run counts depend on the engines' arbitrary tie order
    # (divergence + possible D overstatement); restated with RANGE
    # framing (tie-collapsed ECDF) — D changes wherever ties carried the
    # max gap, so the r5 row certifies the old statistic
    "ab_ks_two_sample": 7,
}


def _load_correctness_autofold() -> dict[str, int]:
    """Auto-fold every driver CORRECTNESS_r*.json in the repo root into the
    verified set at import time — same green-row rule as
    tools/merge_verified (full rows+schema+hash pass, or the rows-only
    maximal check). This removes the round-over-round process hazard the
    round-3 VERDICT flagged: even if a round ends without running the
    merge tool, ordered_keys() still rotates fresh keys into the next
    driver window instead of re-certifying the same head. The merge tool
    remains the durable record (driver_verified.json survives CORRECTNESS
    files being pruned); the union below makes them equivalent.

    Returns key -> LATEST certifying round, so the verified tail of
    ordered_keys() can refresh the oldest certifications first (round-6
    VERDICT item 3)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for key, row in rows.items():
            if rnd <= DISAVOWED_THROUGH.get(key, -1):
                continue
            if not isinstance(row, dict):
                continue
            full_pass = (
                row.get("rows_match") and row.get("schema_match")
                and row.get("hash_match") and not row.get("err")
            )
            rows_only = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if full_pass or rows_only:
                rounds[key] = max(rounds.get(key, 0), rnd)
    return rounds


def _build_verified_rounds() -> dict[str, int]:
    rounds = _load_correctness_autofold()
    # driver_verified.json carries no round info: keys only there count as
    # round 0 (oldest) so they refresh first if their CORRECTNESS file is
    # ever pruned.
    for key in _load_verified_extra():
        rounds.setdefault(key, 0)
    for key in _VERIFIED_R01:
        rounds[key] = max(rounds.get(key, 0), 1)
    return rounds


# key -> latest round whose driver CORRECTNESS file certified it (0 = round
# unknown, durable-record only). Membership == "driver-verified".
DRIVER_VERIFIED_ROUND: dict[str, int] = _build_verified_rounds()

DRIVER_VERIFIED: frozenset[str] = frozenset(DRIVER_VERIFIED_ROUND)

# Explicit head of the round's verification window, most-important-first.
# The r1-r7 backlog drain is COMPLETE (all pre-r8 keys driver-certified);
# from r8 on this list only fronts keys that must (re-)certify — new keys
# and disavowed restatements — and the window's remaining ~48 slots fill
# with the oldest-certified tail (ordered_keys() sorts the verified tail
# oldest-cert-first), refreshing r1/r2-era evidence ~50 keys per round.
# Already-verified keys are filtered out by ordered_keys(), so stale
# entries here are harmless.
DRIVER_PRIORITY: tuple[str, ...] = (
    # r8 degenerate-corpus restatement (tie-collapsed ECDF) — re-certify
    # first, alongside the r8-new bounded pair-sample key
    "ab_ks_two_sample", "llm_dedup_near_sample",
    # r7 sf0.1-audit rework: disavowed pre-r7 certs (exact restatements
    # of quantized quotient/product forms) — re-certify first
    "ts_rsi", "ts_cusum_changepoint",
    # ts_* indicator/analysis tail (operators/windows.py)
    "ts_keltner", "ts_ichimoku", "ts_adx", "ts_candle_patterns", "ts_volatility_ohlc",
    "ts_var_es", "ts_periodogram", "ts_spectral_entropy", "ts_hurst_rs",
    "ts_sax_symbolize", "ts_lead_lag_xcorr", "ts_peak_detection",
    "ts_event_study_car", "ts_rolling_beta", "ts_holt_linear",
    "ts_gap_report", "ts_runs_test", "ts_sma_crossover_backtest",
    "ts_downsample_m4", "ts_forecast_backtest", "ts_sessionize_fragments",
    # llm curation/analysis tail (llm/{curation,textstats,simsearch}.py)
    "llm_lang_entropy", "llm_perplexity_filter", "llm_bigram_lm",
    "llm_decontaminate_bloom", "llm_hard_negatives", "llm_training_examples",
    "llm_preference_pairs", "llm_sft_format", "llm_span_corruption",
    "llm_dataset_diff", "llm_dp_noise", "llm_template_mine",
    "llm_ngram_novelty", "llm_multimodal_phash", "llm_embed_drift",
    "llm_embed_whitening", "llm_cluster_eval", "llm_label_outliers",
    "llm_bpe_merge_step", "llm_diversity_index", "llm_domain_route",
    "llm_oov_rate", "llm_judge_agreement", "llm_tokenizer_fertility",
    # eventflow / cohort / path family (operators/eventflow.py)
    "funnel_windowed_salted", "attribution_channels",
    "path_analysis_sessions", "path_markov_transitions",
    "cohort_survival_km", "cohort_ltv_curve",
    # ---- ~50-key window cut lands around here; rest heads the r7 window
    # fn_/sql_ long tail
    "fn_xml", "fn_ip", "fn_geohash", "sql_parameterized", "sql_pipe_syntax",
    # win/agg long tail
    "win_rolling_beta", "win_interval_concurrency", "agg_corr_matrix",
    "table_checksum", "agg_heavy_hitters", "agg_gini", "agg_theil_index",
    "agg_rfm_segmentation", "agg_market_basket", "agg_target_encode",
    # join/scan/sink/cdc/pipeline long tail
    "join_scd2_pointintime", "join_spatial_grid", "join_skyline_pareto",
    "join_existence_flag", "join_runtime_bloom", "set_intersect_all",
    "scan_text", "scan_dpp_join", "sink_salted", "cdc_apply_changes",
    "sink_snapshot_publish", "sink_export_jsonl", "pipeline_feature_store",
)


def ordered_keys(registry: dict[str, "QuerySpec"]) -> list[str]:
    """Registry keys ordered for the driver's bounded correctness window:
    never-verified priority keys first, then other never-verified keys in
    insertion order, then driver-verified keys in insertion order. Keys in
    DRIVER_VERIFIED are excluded from the priority head so the bounded
    ~50-key window rotates fresh keys in every round instead of
    re-certifying the same head forever (round-2 VERDICT bug)."""
    prio = [k for k in DRIVER_PRIORITY if k in registry and k not in DRIVER_VERIFIED]
    seen = set(prio)
    rest = [k for k in registry if k not in seen and k not in DRIVER_VERIFIED]
    # Verified tail: oldest certification first (stable on insertion order),
    # so once the never-verified backlog is smaller than the ~50-key driver
    # window the spare slots continuously refresh the stalest driver
    # evidence (round-6 VERDICT item 3).
    tail = [k for k in registry if k not in seen and k in DRIVER_VERIFIED]
    tail.sort(key=lambda k: DRIVER_VERIFIED_ROUND.get(k, 0))
    return prio + rest + tail


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so decorators run; return the registry."""
    from bitcoin_price_etl_spark.operators import (  # noqa: F401
        aggregates,
        eventflow,
        experiments,
        graph,
        joins,
        projections,
        setops,
        windows,
    )
    from bitcoin_price_etl_spark.functions import scalars  # noqa: F401
    from bitcoin_price_etl_spark.sources import scans, sinks  # noqa: F401
    from bitcoin_price_etl_spark.plans import (  # noqa: F401
        flagship,
        golden,
        sqlapi,
        subqueries,
        tpch,
        validate,
    )
    from bitcoin_price_etl_spark.streaming import twins  # noqa: F401
    from bitcoin_price_etl_spark.llm import (  # noqa: F401
        curation,
        dedup,
        multimodal,
        simsearch,
        textstats,
    )
    from bitcoin_price_etl_spark import udfs  # noqa: F401

    return REGISTRY
