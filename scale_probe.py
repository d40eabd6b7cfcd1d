#!/usr/bin/env python
"""In-memory scale-up probe (BASELINE.md): multiply a table 1x/4x/8x and
measure warm per-query seconds, verifying wall-clock grows sublinearly and
no plan flips or skew cliffs appear.

Scaling discipline per table:
- lineitem/orders: union key-shifted copies (disjoint orderkeys preserve
  join fan-out and group ratios).
- documents: shift doc_ids AND tag each copy's text with a copy token, so
  every copy keeps the original's internal duplicate/near-dup structure
  while no cross-copy duplicates appear — the dedup workload shape is
  preserved, just N times bigger. (Identical-text copies would instead
  grow every posting list N-fold and cap-filter the whole corpus.)

Scratch parquet goes under /tmp/spark_graft_scale_probe; pass --keep to
retain it for inspection.
"""

from __future__ import annotations

import argparse
import gc
import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SCRATCH = Path("/tmp/spark_graft_scale_probe")

DOC_KEYS = [
    "llm_dedup_exact",
    # round-6 deep probe: the full MinHash/LSH near-dup path end-to-end,
    # plus the simhash/MLlib block-bucketed siblings (the fixed-block
    # risk class the semdedup n^2/K catch exposed)
    "llm_dedup_near",
    "llm_dedup_simhash",
    # round-11: the md5 algebra-parity twin of simhash (one token explode
    # + ONE partial-agg groupBy carrying 64 integer sums)
    "llm_dedup_simhash_md5",
    # r11: shard-vs-index incremental-dedup audit — the index groupBy and
    # the hash equi-join both grow with the corpus
    "llm_dedup_incremental_audit",
    "llm_dedup_minhash_mllib",
    "llm_dedup_ngram",
    "llm_dedup_cluster",
    "llm_sample_hash",
    "llm_quality_filter",
    "llm_corpus_mix",
    "llm_pack_sequences",
    "llm_decontaminate",
    "llm_epoch_shuffle",
    "llm_repetition_filter",
    "llm_chunk_documents",
    "llm_tfidf",
    "llm_unigram_logprob",
    "llm_split_train_eval",
    "pipeline_curate_corpus",
    "llm_data_card",
    "llm_domain_cap",
    "llm_multimodal_audio",
    "llm_vocab_build",
    "llm_sample_temperature",
    "llm_quality_ensemble",
    "llm_contamination_report",
    "sink_training_shards",
    "llm_mask_tokens",
    "llm_sample_weighted",
    # round-4b: copy-tagged docs keep the word frame vocabulary-sized
    # while word counts grow mult* -- the pair explosion must stay
    # vocab-bound; preference windows pile mult* docs into each fixed
    # (source, shard) rank window -- the fanout-dial stress
    "llm_bpe_merge_step",
    "llm_preference_pairs",
    # snapshot diff: both derived versions ride the scaled corpus, so
    # the PK full-outer join and its hash compare grow linearly
    "llm_dataset_diff",
    # entropy: the (source, lang) grid is fixed, only partials grow
    "llm_lang_entropy",
    # zero-shuffle token surgery: per-row constant cost
    "llm_span_corruption",
    # round-4c: copy-tagged docs keep pairs copy-local (no cross-copy
    # dupes), so containment candidates grow linearly; the perplexity
    # model vocabulary stays ~fixed while train/eval token mass grows;
    # bigram count space is vocab-bound while pair mass grows; SFT
    # pairing is adjacency-local so examples grow linearly
    "llm_containment",
    "llm_perplexity_filter",
    "llm_bigram_lm",
    "llm_sft_format",
    # copy-tagged docs shift the 48-byte thumbnail window by one token
    # tag, so cross-copy images differ while within-copy prefix dupes
    # survive: candidate mass grows linearly
    "llm_multimodal_phash",
    # one-line-per-doc text export: volume linear, line-splittable read
    "scan_text",
    # round-4e: copy-tagged docs keep eval overlap copy-local, so the
    # bloom stays at its fill rate while corpus probes grow mult x --
    # the constant-broadcast posture the operator exists to prove
    "llm_decontaminate_bloom",
    # the (lang, source) grid is fixed; only map-side partials grow
    "llm_diversity_index",
    # dedup_exact posture: the exchange carries (md5, id, length), not text
    "llm_template_mine",
    # bounded quasi-identifier grid: only map-side partials grow
    "validate_k_anonymity",
    # copy-tagged docs keep first-ownership copy-local: postings and the
    # ownership join grow linearly, min() state stays one long
    "llm_ngram_novelty",
    # slice-grid collapse: the DP release math runs on O(langs x sources)
    # rows no matter the corpus
    "llm_dp_noise",
    # bounded bin grid: only map-side partials grow
    "validate_psi_drift",
    # word explode + broadcast vocab left-join: two linear passes
    "llm_oov_rate",
    # zero-shuffle judged projection to a 5-counter row
    "llm_judge_agreement",
    # zero-shuffle codegen projection: per-row constant cost
    "llm_domain_route",
    # x|query| map-side expand + tiny broadcast df + TakeOrdered top-k
    "llm_bm25_rank",
    # partitioned text write + read-back agg: volume linear, commit O(1)
    "sink_export_jsonl",
    # salted write: volume grows linearly across 16 fixed prefixes; the
    # probe measures write+read-back+count end-to-end
    "sink_salted",
    # regex/split counts ride the scan map-side; the 5-row lang grid
    # absorbs growth through the partial agg
    "llm_tokenizer_fertility",
]

# embeddings-table keys: copies shift vec_id and keep vectors — per-row cost
# ops scale by row count; centroid label groups grow N× (exactly the hot-key
# stress the partial-agg form must absorb); LSH candidate sets grow N×.
EMB_KEYS = [
    "llm_embed_centroids",
    "llm_embed_quantize",
    # round-6 deep probe: the exact brute-force top-k beside its LSH twin,
    # and the label-blocked embedding dedup (fixed-block risk class)
    "llm_sim_search",
    "llm_dedup_embed",
    "llm_sim_search_lsh",
    "llm_kmeans_assign",
    "llm_embed_pq",
    # round-4: cells grow mult× denser (vec_ids shift, vectors repeat),
    # so the within-cell pair probe — the Σ cell² term — is the stress
    "llm_semdedup",
    # round-4c: labels fixed, per-label halves grow mult x -- the
    # conditional-mean partial agg absorbs the hot-label growth
    "llm_embed_drift",
    # labels irrelevant here: mult x vectors per centroid is the hot-
    # cluster stress on the argmin combine and the (cluster, pos) agg
    "llm_kmeans_train",
    # anchors multiply with the shifted vec_ids AND the corpus grows —
    # the probe measures the anchors x corpus broadcast scan shape
    "llm_hard_negatives",
    # the 64-row dimension grid is fixed; both explode passes grow
    # linearly and the moment joins broadcast
    "llm_embed_whitening",
    # broadcast-argmin assignment then the bounded (clusters x labels)
    # contingency grid
    "llm_cluster_eval",
    # posexplode + broadcast centroid grid + WindowGroupLimit top-5
    "llm_label_outliers",
    # round-11 additions (VERDICT r10 item 7): the md5-banded LSH parity
    # twin (bucket joins grow N x candidates), the router's one-pass CH
    # statistic (partial-agg means + within re-scan — both linear), and
    # the DECIMAL-quantized Arrow cosine twin (per-batch matmul)
    "llm_sim_search_lsh_checked",
    "llm_sim_search_route",
    "llm_sim_search_fast_checked",
    # r11: Q=8 multi-query batch — the broadcast attach + WindowGroupLimit
    # per-query top-k; the stress is Q x corpus score rows being pruned
    # map-side before the q_id exchange
    "llm_sim_search_batch",
]


def build_scaled_documents(spark, src_dir: str, mult: int, out_dir: Path) -> None:
    from pyspark.sql import functions as F

    from bitcoin_price_etl_spark.catalog import load

    d = load(spark, src_dir, "documents")
    n = d.count()
    copies = []
    for i in range(mult):
        copies.append(
            d.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                # the tag token joins every shingle window at the text head
                # only; >99% of shingles keep their original hashes, and no
                # shingle collides across copies at the tagged positions
                F.concat(F.lit(f"copytag{i} "), F.col("text")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + F.lit(len(f"copytag{i} "))).alias("n_chars"),
            )
        )
    scaled = copies[0]
    for c in copies[1:]:
        scaled = scaled.unionByName(c)
    out_dir.mkdir(parents=True, exist_ok=True)
    scaled.coalesce(max(1, 4 * mult)).write.mode("overwrite").parquet(
        str(out_dir / "documents.parquet")
    )


def build_scaled_embeddings(spark, src_dir: str, mult: int, out_dir: Path) -> None:
    from pyspark.sql import functions as F

    from bitcoin_price_etl_spark.catalog import load

    e = load(spark, src_dir, "embeddings")
    n = e.count()
    copies = [
        e.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
            "embedding",
            "label",
        )
        for i in range(mult)
    ]
    scaled = copies[0]
    for c in copies[1:]:
        scaled = scaled.unionByName(c)
    out_dir.mkdir(parents=True, exist_ok=True)
    scaled.coalesce(max(1, 4 * mult)).write.mode("overwrite").parquet(
        str(out_dir / "embeddings.parquet")
    )


def build_scaled_fact(spark, src_dir: str, mult: int, out_dir: Path,
                      table: str, pk: str, extra=None) -> None:
    """Generic fact scaling: union pk-shifted copies — disjoint keys
    preserve join fan-out while every group/bar/block gets mult× rows
    (the hot-group stress). `extra` maps column → per-copy shift
    expression for columns that must ALSO stay copy-disjoint (e.g. the
    fuzzy join's blocking key, so candidate pairs grow linearly, not
    quadratically — duplicating identical names mult× would make every
    block a mult×-bigger all-pairs clique, which no real corpus does)."""
    from pyspark.sql import functions as F

    from bitcoin_price_etl_spark.catalog import load

    d = load(spark, src_dir, table)
    n = d.count()
    copies = []
    for i in range(mult):
        c = d.withColumn(pk, F.col(pk) + F.lit(i * n))
        for col, shift in (extra or {}).items():
            c = c.withColumn(col, shift(F.col(col), i))
        copies.append(c)
    scaled = copies[0]
    for c in copies[1:]:
        scaled = scaled.unionByName(c)
    out_dir.mkdir(parents=True, exist_ok=True)
    scaled.coalesce(max(1, 4 * mult)).write.mode("overwrite").parquet(
        str(out_dir / f"{table}.parquet")
    )


# Multi-table TPC-H-tier keys: lineitem AND orders scale together with a
# JOIN-CONSISTENT shift — both shift orderkey by i × (max(o_orderkey)+1),
# the key-space unit of the table that OWNS the key, so every copy's
# lineitems still find exactly their order (per-table row counts would
# desynchronize the keys). o_custkey / l_suppkey / l_partkey stay fixed:
# customers, suppliers and parts each serve mult× more orders — the
# hot-dimension stress a growing fact table actually produces. All other
# tables are copied through unscaled.
TPCH_KEYS = [
    # needs the join-consistent orderkey shift (loads BOTH lineitem and
    # orders) — round-6 deep-probe addition; in TPCH_KEYS, not FACT_KEYS,
    # so `--keys join_shuffle` alone stages both tables correctly
    "join_shuffle",
    "tpch_q1_full",
    "tpch_q3",
    "tpch_q5",
    "tpch_q9",
    "tpch_q18",
    "tpch_q21",
    "tpch_q2",
    "tpch_q11",
    # orderkey-consistent orders+lineitem scaling: the purchase-graph
    # edge list grows mult× with custkeys/suppkeys fixed, so per-node
    # degree — the hot-destination stress on the rank sums — grows mult×
    "graph_pagerank",
    # orderkey-consistent scaling keeps the FK rule honest (every copy's
    # lineitems still find their orders); rule counters grow linearly
    "validate_expectations",
    # copy-local co-purchase graphs would need the partkey shift; BFS
    # instead rides the orderkey-consistent scaling where degree growth
    # (denser adjacency per node) is exactly the frontier-join stress
    "graph_khop_reach",
    # custkey/partkey fixed while orders multiply: each part's DISTINCT
    # customer posting is unchanged, so the distinct + capped self-join
    # must absorb mult× input into a flat pair set — the dedup-shaped
    # stress for the projection
    "graph_bipartite_projection",
    # orderkey-consistent scaling keeps every copy's lineitems resolving
    # their orders: the orphan anti-joins stay empty while the key grids
    # grow mult× — the probe measures the key-only collapse, never rows
    "validate_referential_integrity",
    # round-8: the sql-family headline representative — customer joins a
    # scaled lineitem through two CTE stages; customer stays the fixed
    # hot dimension (VERDICT r7 item 4)
    "sql_cte_pipeline",
]

_TPCH_COPY_TABLES = ("region", "nation", "customer", "supplier", "part")


def build_scaled_tpch(spark, src_dir: str, mult: int, out_dir: Path) -> None:
    from pyspark.sql import functions as F

    from bitcoin_price_etl_spark.catalog import load

    out_dir.mkdir(parents=True, exist_ok=True)
    o = load(spark, src_dir, "orders")
    li = load(spark, src_dir, "lineitem")
    unit = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    for name, df, key in (("orders", o, "o_orderkey"),
                          ("lineitem", li, "l_orderkey")):
        copies = [
            df.withColumn(key, F.col(key) + F.lit(i * unit))
            for i in range(mult)
        ]
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        scaled.coalesce(max(1, 4 * mult)).write.mode("overwrite").parquet(
            str(out_dir / f"{name}.parquet")
        )
    for t in _TPCH_COPY_TABLES:
        dst = out_dir / f"{t}.parquet"
        if not dst.exists():
            shutil.copy(f"{src_dir}/{t}.parquet", dst)


# Registered shift spec shared by the copy-local co-purchase keys: one
# callable OBJECT so the identity-based same-table conflict check (below)
# recognizes the specs as identical (ADVICE r6).
def _shift_partkey_copy_local(col, i):
    return col + 10_000_000 * i


# key → (table, pk, extra-shift) for fact-table keys; every listed key reads
# ONLY this table (plus broadcast-size dims none of these touch).
FACT_KEYS = {
    "ts_resample_ohlc": ("events", "event_id", None),
    "ts_anomaly_mad": ("events", "event_id", None),
    "ts_interpolate_linear": ("events", "event_id", None),
    # round-11 (VERDICT r10 item 7): per-series interpolation — event_id
    # shift keeps (user_id, event_type) series, so every series window
    # gets mult x rows; and the HLL-vs-exact audit aggregate
    "ts_interpolate_multi": ("events", "event_id", None),
    "agg_approx_distinct_checked": ("lineitem", "l_orderkey", None),
    "table_profile_stats": ("lineitem", "l_orderkey", None),
    "agg_skew_kurt": ("lineitem", "l_orderkey", None),
    "agg_bitmap_distinct": ("lineitem", "l_orderkey", None),
    "ts_vwap": ("lineitem", "l_orderkey", None),
    "sink_zorder_layout": ("lineitem", "l_orderkey", None),
    "sink_scd2": ("customer", "c_custkey", None),
    # write volume grows mult x; the commit critical section stays O(1)
    "sink_snapshot_publish": ("customer", "c_custkey", None),
    # round-6 deep-probe additions: the headline family representatives
    # (bench.DRIVER_COMPACT heads) probed at 1x/8x/32x for the
    # would-it-survive-100x record — scan/agg/window ride the scaled
    # fact; the broadcast join scales its probe side while the dims
    # stay fixed (DIM_COPY); the events keys share the event_id shift
    "scan_parquet": ("lineitem", "l_orderkey", None),
    "agg_hash": ("lineitem", "l_orderkey", None),
    "win_rank": ("orders", "o_orderkey", None),
    "join_broadcast": ("customer", "c_custkey", None),
    "join_asof": ("events", "event_id", None),
    "flagship_hourly_enriched": ("events", "event_id", None),
    "stream_tumbling": ("events", "event_id", None),
    # event_id-shifted copies keep user_id/ts, so every user's window and
    # every time bin get mult× rows — exactly the hot-partition stress
    # sessionize/cohort sorts and the binned join's per-bin candidate
    # mass must absorb. NOTE join_range_binned's OUTPUT (pair count) is
    # quadratic in per-bin density by definition; the probe measures the
    # plan staying an equi-join while true-pair volume explodes.
    "ts_sessionize": ("events", "event_id", None),
    "funnel_conversion": ("events", "event_id", None),
    "cohort_retention": ("events", "event_id", None),
    "join_range_binned": ("events", "event_id", None),
    "funnel_windowed": ("events", "event_id", None),
    "join_asof_nearest": ("events", "event_id", None),
    "ts_ewma": ("events", "event_id", None),
    "agg_linreg": ("events", "event_id", None),
    "win_pareto_abc": ("orders", "o_orderkey", None),
    "win_running_distinct": ("events", "event_id", None),
    "scan_partition_pruned": ("events", "event_id", None),
    "win_rolling_median": ("events", "event_id", None),
    "ts_zscore_rolling": ("events", "event_id", None),
    "join_fuzzy_blocked": (
        "part",
        "p_partkey",
        # p_size joins the blocking key: shifting it per copy keeps blocks
        # copy-local so candidates grow linearly with the corpus
        {"p_size": lambda col, i: col + 100 * i},
    ),
    # round-4: the scale twins get the exact hot-key stress they exist
    # for — event_id-shifted copies pile mult× rows onto every user and
    # every time bucket
    "ts_sessionize_fragments": ("events", "event_id", None),
    "funnel_windowed_salted": ("events", "event_id", None),
    "ts_downsample_m4": ("events", "event_id", None),
    "ts_max_drawdown": ("events", "event_id", None),
    "llm_training_examples": ("events", "event_id", None),
    "agg_corr_matrix": ("lineitem", "l_orderkey", None),
    "table_checksum": ("lineitem", "l_orderkey", None),
    "fn_xml": ("lineitem", "l_orderkey", None),
    # orders scale while customer stays fixed: every customer's change
    # list grows mult× — the hot-key stress on the max_by collapse
    "cdc_apply_changes": ("orders", "o_orderkey", None),
    # the hourly pre-aggregate absorbs growth before the lag window
    # (r5 rework: the grid, not the raw events, feeds the window)
    "ts_autocorr": ("events", "event_id", None),
    # the hourly pre-aggregate absorbs the growth before the window
    "ts_cusum_changepoint": ("events", "event_id", None),
    # hot-user stress on the shared user_id window partitioning; the
    # first-K prefix filter bounds per-session state as sessions densify
    "path_analysis_sessions": ("events", "event_id", None),
    # densified timelines merge sessions; the sweep still two-levels
    "win_interval_concurrency": ("events", "event_id", None),
    # fixed space, more points: candidate growth is quadratic in density
    # by definition — the probe checks the grid plan holds, not that
    # output volume stays flat
    "join_spatial_grid": ("customer", "c_custkey", None),
    # every user gets mult x events: the unit aggregate absorbs the
    # growth before any statistic runs
    "ab_ttest_welch": ("events", "event_id", None),
    "ab_cuped_adjust": ("events", "event_id", None),
    "ab_power_mde": ("events", "event_id", None),
    "ab_ks_two_sample": ("events", "event_id", None),
    # the hourly pre-aggregate absorbs growth before the lag window
    "ts_forecast_backtest": ("events", "event_id", None),
    # partkey joins the copy shift so each copy carries its own
    # co-purchase graph: edges and wedges grow linearly, the real shape
    # of corpus growth. (Orderkey-only shifts duplicate every pair
    # mult x, so the support threshold stops sparsifying at mult>=2 and
    # the probe measures a degenerate all-pairs-kept graph instead.)
    "graph_triangle_count": (
        "lineitem",
        "l_orderkey",
        {"l_partkey": _shift_partkey_copy_local},
    ),
    # same copy-local co-purchase scaling as triangle_count: edges and
    # degree moments grow linearly (orderkey-only shifts would duplicate
    # every pair mult x and the support threshold would stop sparsifying)
    "graph_assortativity": (
        "lineitem",
        "l_orderkey",
        {"l_partkey": _shift_partkey_copy_local},
    ),
    # copy-local baskets (partkey shift): rules grow linearly, the
    # support threshold keeps each copy's rule set sparse
    "agg_market_basket": (
        "lineitem",
        "l_orderkey",
        {"l_partkey": _shift_partkey_copy_local},
    ),
    # facts multiply while the versioned dim stays fixed: every version
    # chain is probed by mult x more orders — the residual-scan stress
    "join_scd2_pointintime": ("orders", "o_orderkey", None),
    # event_id-shifted copies pile mult x touches and purchases onto
    # every user: the band-join fan-out and label-agg stress
    "attribution_channels": ("events", "event_id", None),
    # round-4c: 3 fixed groups absorb mult× rows — the documented
    # hostile shape for the cumulative-weight window (one partition
    # sorts each group); measures the honest worst case
    "agg_weighted_median": ("lineitem", "l_orderkey", None),
    # custkey fixed: every customer's order count grows mult× — the
    # frequent set densifies, the map-side combiner absorbs the mass
    "agg_heavy_hitters": ("orders", "o_orderkey", None),
    # the hourly pre-aggregate absorbs growth before window + broadcast
    "ts_seasonal_decompose": ("events", "event_id", None),
    # stateless int projection: per-row constant cost
    "fn_ip": ("orders", "o_orderkey", None),
    # observe counters are O(1) agg buffers riding the scan
    "validate_observe_metrics": ("orders", "o_orderkey", None),
    # bound literals push down like constants at any volume
    "sql_parameterized": ("orders", "o_orderkey", None),
    "sql_pipe_syntax": ("lineitem", "l_orderkey", None),
    # stateless bit arithmetic: per-row constant cost
    "fn_geohash": ("customer", "c_custkey", None),
    # round-4e: every series gets mult× ticks — the O(1)-state window
    # accumulators (gain/loss sums, four beta moments) absorb the growth
    # inside each partition sort
    "ts_rsi": ("events", "event_id", None),
    "win_rolling_beta": ("lineitem", "l_orderkey", None),
    # 5 fixed priority groups absorb mult× orders: the per-group sort is
    # the honest cost (the agg_weighted_median hostile shape)
    "agg_gini": ("orders", "o_orderkey", None),
    # digit space is fixed (9 rows): only map-side partials grow
    "validate_benford": ("orders", "o_orderkey", None),
    # running BIGINT cumsum: one long of window state per series
    "ts_obv": ("events", "event_id", None),
    # the OHLC partial agg absorbs tick growth before the bar windows
    "ts_atr": ("events", "event_id", None),
    "ts_candle_patterns": ("events", "event_id", None),
    "ts_macd": ("events", "event_id", None),
    "ts_stochastic": ("events", "event_id", None),
    "ts_keltner": ("events", "event_id", None),
    "ts_bollinger": ("events", "event_id", None),
    "ts_ichimoku": ("events", "event_id", None),
    # round-4f: mult× points per (type, day) group — the 128-point cap
    # must bound pairwise slopes while input grows; the hourly grid and
    # per-user/daily collapses absorb growth for the other three
    "ts_theilsen": ("events", "event_id", None),
    "ts_periodogram": ("events", "event_id", None),
    "cohort_survival_km": ("events", "event_id", None),
    "validate_volume_anomaly": ("orders", "o_orderkey", None),
    # 3 fixed groups absorb mult× rows through the rank window — the
    # agg_weighted_median hostile shape, plus two decimal sums
    "agg_winsorized_mean": ("lineitem", "l_orderkey", None),
    # round-5 scale twins: the bucket grids are domain-bounded, so the
    # windows see ~1.1k rows per group at ANY mult — the probes must
    # come out flat where the exact forms above grow with the sort
    "agg_weighted_median_hist": ("lineitem", "l_orderkey", None),
    "agg_winsorized_mean_hist": ("lineitem", "l_orderkey", None),
    # per-user collapse then an ~80-bin domain grid: both partial-agg
    # stages absorb mult× events before the single bounded window
    "ab_ks_binned": ("events", "event_id", None),
    # OHLC partial agg absorbs tick growth before the 20-tap frames
    "ts_volatility_ohlc": ("events", "event_id", None),
    # count-paired multiset intersection: (key, count) pairs shuffle,
    # never rows
    "set_intersect_all": ("lineitem", "l_orderkey", None),
    # distinct-price grid collapse + broadcast frontier re-attach
    "join_skyline_pareto": ("part", "p_partkey", None),
    # per-user unit collapse absorbs event growth before the two
    # 6-number moment buffers
    "ab_ratio_delta_ci": ("events", "event_id", None),
    # OHLC collapse then the 128-bar capped sign join — flat like
    # ts_theilsen
    "ts_mann_kendall": ("events", "event_id", None),
    # OHLC collapse; both window passes share one exchange; the PAA
    # grid is series x 8
    "ts_sax_symbolize": ("events", "event_id", None),
    # OHLC collapse; bounded (series x w x block) window frames
    "ts_hurst_rs": ("events", "event_id", None),
    # periodogram grid collapse + (series x 8) spectrum entropy
    "ts_spectral_entropy": ("events", "event_id", None),
    # two hourly grids + x7 shifted-hour equi-joins over grid rows
    "ts_lead_lag_xcorr": ("events", "event_id", None),
    # OHLC collapse; three bounded-frame window passes on one exchange
    "ts_adx": ("events", "event_id", None),
    # user-keyed lag window then the bounded |types|^2 transition grid
    "path_markov_transitions": ("events", "event_id", None),
    # one user exchange reused across window + aggregate + joins
    "pipeline_feature_store": ("events", "event_id", None),
    # OHLC collapse; rank window + broadcast threshold re-join on grids
    "ts_var_es": ("events", "event_id", None),
    # hourly grid collapse; four bounded frames on one exchange
    "ts_peak_detection": ("events", "event_id", None),
    # bar/volume grids; bounded 7-day event window join
    "ts_event_study_car": ("events", "event_id", None),
    # OHLC collapse absorbs tick growth; market agg + broadcast join and
    # the 10-bar frames run on the bounded (series x day) grid
    "ts_rolling_beta": ("events", "event_id", None),
    # OHLC collapse; the Holt fold is per-series map work on a
    # calendar-bounded array
    "ts_holt_linear": ("events", "event_id", None),
    # distinct (series, hour) grid collapse; expected-grid explode and
    # islands window are calendar-bounded
    "ts_gap_report": ("events", "event_id", None),
    # OHLC collapse; sign/lag windows and the moment agg run on the
    # bounded bar grid
    "ts_runs_test": ("events", "event_id", None),
    # OHLC collapse; ONE shared window pass (frame sum + lead) and one
    # grouped agg on the bounded bar grid
    "ts_sma_crossover_backtest": ("events", "event_id", None),
    # one grouped partial-agg + a 1-row global broadcast: the encoder
    # map is |categories| rows at any fact volume
    "agg_target_encode": ("events", "event_id", None),
    # both flag subqueries collapse to key sets and broadcast against
    # the single customer scan; fact growth only grows the collapses
    "join_existence_flag": ("orders", "o_orderkey", None),
    # round-8 (VERDICT r7 item 4): last headline families without a 32x
    # representative. merge-upsert's two derived sides ride one scaled
    # orders scan; the full-outer join shuffles the key once per side
    "sink_merge_upsert": ("orders", "o_orderkey", None),
    # correlated EXISTS collapses to a key-set semi-join; the scaled
    # customer table is both the probe and (collapsed) build side
    "subquery_correlated": ("customer", "c_custkey", None),
    # Arrow-batched pandas_udf projection: per-row constant cost
    "udf_pandas": ("lineitem", "l_orderkey", None),
    # TakeOrderedAndProject: per-partition top-K then a K-row merge
    "sort_limit": ("lineitem", "l_orderkey", None),
    # micro-batch stream side scales; the static customer side stays a
    # broadcast build
    "stream_static_join": ("events", "event_id", None),
    # count-per-value partial agg absorbs the growth before max_by
    "agg_mode": ("lineitem", "l_orderkey", None),
    # partitioned re-stage + runtime-pruned join: write volume grows
    # linearly, the pruned read still opens ~1/7th of day directories
    "scan_dpp_join": ("events", "event_id", None),
    # shuffle join against a fixed filtered dim: with the runtime bloom
    # injected (production thresholds) the shuffle carries only the
    # selectivity fraction of the scaled fact
    "join_runtime_bloom": ("lineitem", "l_orderkey", None),
    # user-keyed firsts + join-back reuse one exchange; the weekly grid
    # absorbs growth before the cumulative window
    "cohort_ltv_curve": ("events", "event_id", None),
    # per-row ln rides the scan map-side; 5 fixed groups absorb growth
    "agg_theil_index": ("orders", "o_orderkey", None),
    # orders collapse to the fixed customer grid before the rank windows
    "agg_rfm_segmentation": ("orders", "o_orderkey", None),
}

# keys that ALSO read an unscaled dimension: copied through verbatim so
# the probe measures fact growth against a fixed dim (the realistic
# shape — dims grow orders of magnitude slower than facts)
DIM_COPY = {
    "join_scd2_pointintime": ("customer",),
    # lineitem scales while the part dim stays fixed
    "join_runtime_bloom": ("part",),
    # orders scale while the customer dim stays fixed — the flags'
    # collapsed key sets grow with the fact, the probe side does not
    "join_existence_flag": ("customer",),
    # events scale while order history stays fixed — the realistic
    # asymmetry (clickstream grows orders of magnitude faster)
    "pipeline_feature_store": ("orders",),
    # customers scale while the nation/region dims stay fixed — the
    # broadcast build side stays broadcast-sized at any fact volume
    "join_broadcast": ("nation", "region"),
    # events scale while the static join side stays a fixed broadcast
    # build (round-8; in a combined run where another key scales
    # customer, stage separately — the copy is skipped if present)
    "stream_static_join": ("customer",),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mults", default="1,4,8")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--keys", default="", help="comma list; default all")
    ap.add_argument(
        "--json-out",
        default="",
        help="write {key: {mult: median_sec}} plus run metadata (cpus, "
        "mults, runs) to this path — the committed core-scaling evidence "
        "format (VERDICT r11 item 4)",
    )
    ap.add_argument(
        "--growth",
        choices=("density", "users"),
        default="density",
        help="density (default): pk-shifted copies pile mult x rows onto "
        "every user/group — the hot-key stress, under which pair-producing "
        "joins emit mult^2 output BY DEFINITION. users: copies also shift "
        "user_id (copy-local populations, constant per-user density) — "
        "the realistic corpus-growth axis, under which the round-6 "
        "counter-probe measured the quadratic-class keys flat "
        "(attribution 0.9x, training_examples 1.0x at 8x).",
    )
    args = ap.parse_args()

    from bitcoin_price_etl_spark.registry import load_all
    from bitcoin_price_etl_spark.session import get_spark

    spark = get_spark("scale-probe")
    reg = load_all()
    mults = [int(m) for m in args.mults.split(",")]

    selected = [k for k in args.keys.split(",") if k] or (DOC_KEYS + EMB_KEYS)
    need_docs = any(k in DOC_KEYS for k in selected)
    need_embs = any(k in EMB_KEYS for k in selected)

    # One staged file per table per run: selected keys that want the SAME
    # table with DIFFERENT scaling specs (pk or extra column shifts)
    # cannot coexist — last-wins would silently probe one of them against
    # the wrong workload shape (e.g. graph_triangle_count's partkey-shift
    # dropped by scan_parquet's plain spec = the degenerate all-pairs
    # graph its FACT_KEYS comment warns about). Detect and refuse.
    by_table: dict[str, tuple] = {}
    spec_keys: dict[str, str] = {}
    for k in selected:
        if k not in FACT_KEYS:
            continue
        table, pk, extra = FACT_KEYS[k]
        # Compare the shift CALLABLES too (by identity), not just column
        # names — two keys wanting the same extra column under different
        # shift rules is exactly the silent-wrong-workload case this check
        # exists for (ADVICE r6). Shared-spec keys must share the callable
        # object; distinct-but-equivalent lambdas conservatively conflict.
        spec = (pk, tuple(sorted((extra or {}).items())))
        if table in by_table:
            prev_spec = (
                by_table[table][1],
                tuple(sorted((by_table[table][2] or {}).items())),
            )
            if spec != prev_spec:
                raise SystemExit(
                    f"conflicting scale specs for table {table!r}: "
                    f"{spec_keys[table]} wants {prev_spec}, {k} wants "
                    f"{spec} — probe these keys in separate runs"
                )
        else:
            by_table[table] = FACT_KEYS[k]
            spec_keys[table] = k
    fact_tables = list(by_table.values())
    if args.growth == "users":
        # the users axis shifts user_id on the EVENTS fact only; keys
        # reading any other table are measured on the density axis no
        # matter what this flag says — refuse rather than mislabel
        non_events = [
            k for k in selected
            if k in FACT_KEYS and FACT_KEYS[k][0] != "events"
        ]
        # DOC/EMB/TPCH keys have no user_id shift either: under this flag
        # they would run with their unchanged density-style staging while
        # the run is LABELED users-axis — refuse rather than mislabel
        # (ADVICE r6).
        non_events += [
            k for k in selected
            if k in DOC_KEYS or k in EMB_KEYS or k in TPCH_KEYS
        ]
        if non_events:
            raise SystemExit(
                "--growth users only applies to events-fact keys; "
                f"these selected keys read other tables: {non_events} — "
                "run them separately on the density axis"
            )
        fact_tables = [
            (
                table,
                pk,
                dict(
                    (extra or {}),
                    user_id=lambda col, i: col + 10_000_000 * i,
                ),
            )
            for table, pk, extra in fact_tables
        ]
    need_tpch = any(k in TPCH_KEYS for k in selected)
    try:
        for mult in mults:
            out = SCRATCH / f"x{mult}"
            if need_docs:
                build_scaled_documents(spark, args.sf_dir, mult, out)
            if need_embs:
                build_scaled_embeddings(spark, args.sf_dir, mult, out)
            for table, pk, extra in fact_tables:
                build_scaled_fact(spark, args.sf_dir, mult, out, table, pk, extra)
            for k in selected:
                for dim in DIM_COPY.get(k, ()):
                    dst = out / f"{dim}.parquet"
                    if not dst.exists():
                        shutil.copy(f"{args.sf_dir}/{dim}.parquet", dst)
            if need_tpch:
                build_scaled_tpch(spark, args.sf_dir, mult, out)
        # warm shared paths once
        warm_key = "llm_dedup_exact" if need_docs else selected[0]
        reg[warm_key].fn(spark, str(SCRATCH / f"x{mults[0]}")).write.format(
            "noop"
        ).mode("overwrite").save()

        # flush=True: piped/tee'd output must appear per-key, not at 8 KB
        # buffer boundaries — unflushed rows read as a hung probe
        print(f"{'query':28s} " + " ".join(f"{m}x".rjust(8) for m in mults),
              flush=True)
        results: dict[str, dict[str, float]] = {}
        for key in selected:
            cells = []
            for mult in mults:
                sf_dir = str(SCRATCH / f"x{mult}")
                ts = []
                for _ in range(args.runs):
                    # release prior frames' localCheckpoint blocks before
                    # timing (round-6 lesson: accumulated executor-local
                    # blocks make late-position keys read as regressions)
                    gc.collect()
                    t0 = time.perf_counter()
                    reg[key].fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    ts.append(time.perf_counter() - t0)
                cells.append(statistics.median(ts))
            results[key] = {
                f"x{m}": round(c, 3) for m, c in zip(mults, cells)
            }
            print(
                f"{key:28s} "
                + " ".join(f"{c:7.2f}s" for c in cells)
                + f"   {cells[-1] / cells[0]:.1f}x at {mults[-1]}x data",
                flush=True,
            )
        if args.json_out:
            import json
            import os

            with open(args.json_out, "w") as f:
                json.dump(
                    {
                        "cpus": int(os.environ.get(
                            "SPARK_GRAFT_CPUS", os.cpu_count() or 4
                        )),
                        "sf_dir": args.sf_dir,
                        "mults": mults,
                        "runs": args.runs,
                        "growth": args.growth,
                        "per_key": results,
                    },
                    f,
                    indent=1,
                )
            print(f"wrote {args.json_out}", flush=True)
    finally:
        if not args.keep:
            shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
