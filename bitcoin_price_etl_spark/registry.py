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
# Round 4: r03 was merged (146 verified), so the window rotates to the
# 59-key never-verified tail — every oracle-bearing key first (hash match
# is the strongest evidence class), then the rows-only keys ordered by
# user surface. llm_dedup_embed was un-verified per ADVICE r3 (its cosine
# gate changed post-certification) and must re-certify. Keys added this
# session land after this head automatically (ordered_keys insertion
# order) and rotate into the r5 window. Already-verified keys are
# filtered out by ordered_keys(), so stale entries here are harmless.
DRIVER_PRIORITY: tuple[str, ...] = (
    # analytics wave (round-3 additions, widest user surface)
    "table_profile_stats", "agg_skew_kurt", "agg_bitmap_distinct",
    "agg_approx_percentile", "agg_linreg", "win_pareto_abc",
    "ts_resample_ohlc", "ts_vwap", "ts_anomaly_mad",
    "ts_interpolate_linear", "funnel_windowed", "join_fuzzy_blocked",
    "join_asof_nearest",
    # sink / physical-layout tier
    "sink_scd2", "sink_zorder_layout", "sink_merge_upsert",
    "join_bucketed_colocated",
    # SQL + scalar stragglers
    "sql_recursive_cte", "fn_url", "fn_try_safe", "fn_variant",
    "fn_encode", "fn_regex", "scan_corrupt_records",
    "stream_stateful_counts", "source_rest_authed",
    # re-certification: semantics changed after its r2 row (ADVICE r3)
    "llm_dedup_embed",
    # LLM-pipeline oracle-bearing tail
    "llm_tfidf", "llm_domain_cap", "llm_quality_ensemble",
    "pipeline_curate_corpus", "llm_mask_tokens", "llm_sample_weighted",
    "llm_split_train_eval", "llm_chunk_documents", "llm_embed_quantize",
    "llm_lang_id", "llm_fingerprint", "llm_token_bpe",
    "llm_repetition_filter", "llm_unigram_logprob", "llm_data_card",
    "llm_contamination_report", "llm_multimodal_frames",
    "llm_multimodal_audio",
    # UDF trio
    "udf_grouped_agg", "udf_mapinarrow", "udf_mapinpandas",
    # rows-only keys: the driver check is rows+schema only — their
    # maximal check; get it on the record (VERDICT r3 item 4)
    "pipeline_golden", "llm_sim_search_fast", "llm_sim_search_lsh",
    "llm_sim_search_ivf", "llm_sim_search_recall", "llm_dedup_simhash",
    "llm_multimodal_decode", "llm_multimodal_resize",
    "source_rest_datasource", "sink_salted", "sink_compact_small_files",
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
