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
}


def _load_correctness_autofold() -> frozenset[str]:
    """Auto-fold every driver CORRECTNESS_r*.json in the repo root into the
    verified set at import time — same green-row rule as
    tools/merge_verified (full rows+schema+hash pass, or the rows-only
    maximal check). This removes the round-over-round process hazard the
    round-3 VERDICT flagged: even if a round ends without running the
    merge tool, ordered_keys() still rotates fresh keys into the next
    driver window instead of re-certifying the same head. The merge tool
    remains the durable record (driver_verified.json survives CORRECTNESS
    files being pruned); the union below makes them equivalent."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    keys: set[str] = set()
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
                keys.add(key)
    return frozenset(keys)


DRIVER_VERIFIED: frozenset[str] = (
    _VERIFIED_R01 | _load_verified_extra() | _load_correctness_autofold()
)

# Explicit head of the round's verification window, most-important-first.
# Round 5 is a DRAIN round (VERDICT r4): the backlog of never-driver-
# verified keys is 125 of 320, the window certifies ~50/round, and
# registry growth is FROZEN except for the four keys VERDICT items 4/8
# require (the hist/binned scale-safe siblings + the golden oracle
# upgrade). Head order = VERDICT item 1's widest-surface-first rotation:
# golden + new siblings (+ their exact forms, certifying side by side),
# the two scale-cliff fixes, the validate_* data-quality family, ab_*
# experiment stats, graph_*, the VERDICT-named LLM tail, then ALL NINE
# rows-only stragglers (item 2 — rows+schema is their maximal check),
# then ts_* indicator representatives. Keys past the ~50 cut and the
# un-listed pending tail rotate into r6 via ordered_keys() insertion
# order. Already-verified keys are filtered out by ordered_keys(), so
# stale entries here are harmless.
DRIVER_PRIORITY: tuple[str, ...] = (
    # reference-fidelity golden pipeline, rows-only -> oracle (item 8)
    "pipeline_golden",
    # scale-safe siblings of the single-partition-sort forms (item 4)
    "agg_weighted_median_hist", "agg_winsorized_mean_hist", "ab_ks_binned",
    # their exact forms certify alongside (perf-weak list, same oracles)
    "agg_weighted_median", "agg_winsorized_mean", "ab_ks_two_sample",
    # the two scale-cliff fixes (items 5, 6; oracles unchanged/lockstep)
    "graph_bipartite_projection", "ts_autocorr",
    # data-quality validate_* family (widest user surface)
    "validate_expectations", "validate_observe_metrics",
    "validate_referential_integrity", "validate_pk_uniqueness",
    "validate_volume_anomaly", "validate_psi_drift", "validate_benford",
    "validate_k_anonymity",
    # experiment stats
    "ab_srm_check", "ab_ttest_welch", "ab_cuped_adjust",
    "ab_ratio_delta_ci", "ab_power_mde",
    # graph suite
    "graph_pagerank", "graph_triangle_count", "graph_khop_reach",
    "graph_assortativity",
    # LLM oracle-bearing tail (VERDICT-named first)
    "llm_semdedup", "llm_bm25_rank", "llm_kmeans_train", "llm_containment",
    # rows-only stragglers (item 2)
    "llm_dedup_simhash", "llm_dedup_minhash_mllib",
    "llm_multimodal_decode", "llm_multimodal_resize",
    "llm_sim_search_lsh", "llm_sim_search_ivf", "llm_sim_search_recall",
    "source_rest_datasource", "sink_compact_small_files",
    # ts indicator suite representatives + analytics tail
    "ts_rsi", "ts_macd", "ts_bollinger", "ts_stochastic", "ts_atr",
    "ts_obv", "ts_max_drawdown", "ts_theilsen", "ts_mann_kendall",
    "ts_seasonal_decompose", "ts_cusum_changepoint",
    "win_rolling_beta", "win_interval_concurrency", "agg_corr_matrix",
    "table_checksum", "agg_heavy_hitters", "agg_gini",
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
    tail = [k for k in registry if k not in seen and k in DRIVER_VERIFIED]
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
