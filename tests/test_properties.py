"""Property-based spot checks (SURVEY.md §5): results must be invariant to
physical layout — partitioning, partition count, insertion order — and
append semantics must be idempotent under re-run composition (R18)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import dsum
from tests.conftest import SF_SMOKE


def _multiset(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


@pytest.mark.parametrize("n_parts", [1, 7, 64])
def test_decimal_sum_partition_invariant(spark, n_parts):
    """The decimal-sum discipline must yield bit-identical doubles no matter
    how rows are distributed (raw double sums would not)."""
    li = load(spark, SF_SMOKE, "lineitem")
    base = _multiset(
        li.groupBy("l_returnflag").agg(dsum("l_extendedprice", "s"))
    )
    repartitioned = _multiset(
        li.repartition(n_parts, "l_orderkey")
        .groupBy("l_returnflag")
        .agg(dsum("l_extendedprice", "s"))
    )
    assert base == repartitioned


def test_window_rank_partition_invariant(spark):
    """Total-order tiebreaks make window ranks layout-independent."""
    from bitcoin_price_etl_spark.registry import load_all

    fn = load_all()["win_rank"].fn
    a = _multiset(fn(spark, SF_SMOKE))
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        b = _multiset(fn(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b


def test_union_append_idempotent_composition(spark):
    """R18 WRITE_APPEND semantics: appending batch A then batch B equals the
    union — and re-running the same append pipeline doubles multiplicities
    exactly (no dedup, no loss)."""
    ev = load(spark, SF_SMOKE, "events").select("event_id", "value")
    once = ev.unionByName(ev)
    assert once.count() == 2 * ev.count()
    assert _multiset(once.groupBy("event_id").count().filter("count <> 2")) == []


def test_salted_prefix_uniformity():
    """The R8 salted write prefix must spread keys across the keyspace: over
    the documents fixture, no single 2-hex-char prefix may take more than 5%
    of rows (16² buckets; a timestamp-ordered key would put 100% in one)."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT substring(md5(text), 1, 2) AS p, COUNT(*) AS n"
        f" FROM read_parquet('{SF_SMOKE}/documents.parquet') GROUP BY p"
    ).fetchall()
    total = sum(n for _, n in rows)
    assert max(n for _, n in rows) / total < 0.05
    assert len(rows) > 100  # spread over most of the 256 buckets


def test_asof_gapfill_matches_window_emulation(spark):
    """The gap-filled broadcast as-of join must agree row-for-row with the
    independent union+window emulation (tag rates and probes into one
    stream, last(rate) ignorenulls over event time) — two structurally
    different plans, one as-of semantics."""
    from bitcoin_price_etl_spark.registry import load_all
    from pyspark.sql import Window

    fast = load_all()["join_asof"].fn(spark, SF_SMOKE)

    ev = load(spark, SF_SMOKE, "events")
    rates = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("ts"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) / COUNT(value)"
            ).alias("rate")
        )
        .select("ts", "rate", F.lit(0).alias("is_probe"), F.lit(None).cast("long").alias("event_id"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "ts", F.lit(None).cast("double").alias("rate"), F.lit(1).alias("is_probe"), "event_id"
    )
    # rates sort before probes at the same instant (a rate effective AT ts
    # applies to probes AT ts — matches the >= band semantics)
    w = (
        Window.orderBy("ts", "is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    emulated = (
        rates.unionByName(clicks)
        .withColumn("asof_rate", F.last("rate", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
            "asof_rate",
        )
    )
    assert _multiset(fast) == _multiset(emulated)


def test_hash_sample_layout_and_rate_properties(spark):
    """The deterministic sampler's two selling points, proven:
    (a) membership is invariant to partition layout (df.sample is NOT —
    its draw is partition-local RNG); (b) the kept fraction lands near the
    threshold's nominal rate (md5 uniformity)."""
    from bitcoin_price_etl_spark.registry import load_all

    fn = load_all()["llm_sample_hash"].fn
    base = _multiset(fn(spark, SF_SMOKE))

    d = load(spark, SF_SMOKE, "documents")
    n_total = d.count()
    for n_parts in (1, 13):
        shuffled = (
            d.repartition(n_parts, "source")
            .sortWithinPartitions("n_chars")
        )
        shuffled.createOrReplaceTempView("documents_shuffled")
        # rebuild the same filter over the re-laid-out frame
        got = _multiset(
            shuffled.filter(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "2a"
            ).select("doc_id", "lang", "source")
        )
        assert got == base

    rate = len(base) / n_total
    nominal = 0x2A / 256  # ≈ 0.164
    assert abs(rate - nominal) < 0.06, (rate, nominal)


def test_stratified_sample_respects_strata_ordering(spark):
    """Thresholds were chosen to rebalance: the kept fraction of 'en'
    (7.8% nominal) must be below 'zh' (75% nominal) — the rebalancing
    actually rebalances."""
    from bitcoin_price_etl_spark.registry import load_all

    kept = load_all()["llm_sample_stratified"].fn(spark, SF_SMOKE)
    d = load(spark, SF_SMOKE, "documents")
    kept_by = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot_by = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    en = kept_by.get("en", 0) / tot_by["en"]
    zh = kept_by.get("zh", 0) / tot_by["zh"]
    assert en < zh, (en, zh)


def test_incremental_dedup_composes_with_exact(spark):
    """Admitting the incremental batch onto the deduped existing corpus
    must reproduce exactly the full-corpus dedup keep-set: the incremental
    operator is the streaming decomposition of the batch one."""
    from bitcoin_price_etl_spark.registry import load_all

    reg = load_all()
    full = reg["llm_dedup_exact"].fn(spark, SF_SMOKE)
    d = load(spark, SF_SMOKE, "documents")
    existing_keep = (
        d.filter(F.col("doc_id") < 250)
        .groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
    )
    incremental = reg["llm_dedup_incremental"].fn(spark, SF_SMOKE)
    composed = sorted(
        [r["doc_id"] for r in existing_keep.select("doc_id").collect()]
        + [r["doc_id"] for r in incremental.select("doc_id").collect()]
    )
    full_ids = sorted(r[0] for r in full.select("keep_doc_id").collect())
    assert composed == full_ids


def test_pack_sequences_density_and_layout(spark):
    """Packing invariants: offsets live in [0, SEQ_LEN); within each shard
    the token stream is contiguous (each doc starts exactly where the
    previous ended); every non-tail pack boundary is crossed, never
    skipped; and the assignment is layout-independent."""
    from collections import defaultdict

    from bitcoin_price_etl_spark.llm.curation import PACK_SEQ_LEN
    from bitcoin_price_etl_spark.registry import load_all

    fn = load_all()["llm_pack_sequences"].fn
    rows = fn(spark, SF_SMOKE).collect()
    by_shard = defaultdict(list)
    for r in rows:
        assert 0 <= r.pack_offset < PACK_SEQ_LEN
        by_shard[r.shard].append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in shard_rows:
            assert r.pack_id == cum // PACK_SEQ_LEN
            assert r.pack_offset == cum % PACK_SEQ_LEN
            cum += r.n_tokens
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        again = fn(spark, SF_SMOKE).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_epoch_shuffle_is_per_epoch_permutation(spark):
    """Each (epoch, shard) ranks 1..n contiguously; each epoch covers every
    document exactly once; and at least two epochs order some shard's
    documents differently (the orders genuinely change between epochs)."""
    from collections import defaultdict

    from bitcoin_price_etl_spark.llm.curation import N_EPOCHS
    from bitcoin_price_etl_spark.registry import load_all

    rows = load_all()["llm_epoch_shuffle"].fn(spark, SF_SMOKE).collect()
    docs = {r.doc_id for r in rows}
    groups = defaultdict(list)
    epoch_docs = defaultdict(list)
    for r in rows:
        groups[(r.epoch, r.shard)].append(r.pos)
        epoch_docs[r.epoch].append(r.doc_id)
    assert set(epoch_docs) == set(range(N_EPOCHS))
    for e in epoch_docs:
        assert sorted(epoch_docs[e]) == sorted(docs)
    for pos_list in groups.values():
        assert sorted(pos_list) == list(range(1, len(pos_list) + 1))
    orderings = {
        e: tuple(
            r.doc_id
            for r in sorted(
                (x for x in rows if x.epoch == e), key=lambda x: (x.shard, x.pos)
            )
        )
        for e in range(N_EPOCHS)
    }
    assert len(set(orderings.values())) > 1


def test_decontaminate_never_flags_eval_or_self(spark):
    """Contamination pairs must be train×eval only: no eval doc on the train
    side, no train doc on the eval side, and symmetric-overlap sanity —
    every flagged pair shares at least the gate's shingle count."""
    from bitcoin_price_etl_spark.llm.dedup import (
        DECONTAM_EVAL_MOD,
        DECONTAM_EVAL_REM,
        DECONTAM_MIN_COMMON,
    )
    from bitcoin_price_etl_spark.registry import load_all

    rows = load_all()["llm_decontaminate"].fn(spark, SF_SMOKE).collect()
    for r in rows:
        assert r.train_doc_id % DECONTAM_EVAL_MOD != DECONTAM_EVAL_REM
        assert r.eval_doc_id % DECONTAM_EVAL_MOD == DECONTAM_EVAL_REM
        assert r.n_common_shingles >= DECONTAM_MIN_COMMON


def test_chunk_windows_tile_documents(spark):
    """Chunk invariants: starts advance by exactly CHUNK_STRIDE; every
    character index of the document is covered by >=1 chunk; consecutive
    chunks overlap by CHUNK_OVERLAP except the tail; per-doc chunk count =
    ceil-ish coverage of length."""
    from bitcoin_price_etl_spark.llm.curation import (
        CHUNK_OVERLAP,
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )
    from bitcoin_price_etl_spark.registry import load_all

    out = load_all()["llm_chunk_documents"].fn(spark, SF_SMOKE)
    docs = load(spark, SF_SMOKE, "documents").select(
        "doc_id", F.length("text").alias("n")
    )
    joined = (
        out.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("start").alias("max_start"),
            F.min("start").alias("min_start"),
            F.max(F.col("start") + F.col("chunk_len") - 1).alias("max_covered"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    assert joined
    for r in joined:
        assert r.min_start == 1
        n = max(r.n, 1)
        # starts are 1, 1+stride, ...: the last start is the largest <= n
        assert r.max_start == 1 + CHUNK_STRIDE * ((n - 1) // CHUNK_STRIDE)
        assert r.n_chunks == (n - 1) // CHUNK_STRIDE + 1
        # full coverage: the last chunk reaches end-of-string
        assert r.max_covered == r.n or (r.n == 0 and r.max_covered == 0)
    # overlap property: with stride < size, consecutive windows share
    # CHUNK_OVERLAP characters by construction
    assert CHUNK_SIZE - CHUNK_STRIDE == CHUNK_OVERLAP


def test_split_deterministic_and_proportioned(spark):
    """Split is a pure function of doc_id (identical across runs) and the
    train fraction lands near 230/256."""
    from bitcoin_price_etl_spark.registry import load_all

    fn = load_all()["llm_split_train_eval"].fn
    a = {(r.doc_id, r.split) for r in fn(spark, SF_SMOKE).collect()}
    b = {(r.doc_id, r.split) for r in fn(spark, SF_SMOKE).collect()}
    assert a == b
    n = len(a)
    train = sum(1 for _, s in a if s == "train")
    assert 0.8 < train / n < 0.97  # 0.898 expected; generous CI at sf0.001


def test_quantize_dequant_error_bounded(spark):
    """int8 quantization round-trip: |x - qval/scale| <= 0.5/scale for every
    element (the defining property of round-to-nearest absmax scaling), and
    qval stays in [-127, 127]."""
    from bitcoin_price_etl_spark.registry import load_all

    out = load_all()["llm_embed_quantize"].fn(spark, SF_SMOKE)
    e = load(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("pos0", "x")
    ).select("vec_id", (F.col("pos0") + 1).cast("long").alias("pos"),
             F.col("x").cast("double").alias("x"))
    joined = out.join(e, ["vec_id", "pos"])
    bad = joined.filter(
        (F.abs("qval") > 127)
        | (
            (F.col("scale") > 0)
            & (F.abs(F.col("x") - F.col("qval") / F.col("scale"))
               > 0.5 / F.col("scale") + 1e-12)
        )
    ).count()
    assert bad == 0


def test_curate_pipeline_composes_stage_semantics(spark):
    """The fused pipeline equals re-running its stages independently:
    survivors are exactly the gated first-of-hash docs, splits match
    llm_split_train_eval, and pack offsets are contiguous within
    (split, shard)."""
    from bitcoin_price_etl_spark.llm.curation import PACK_SEQ_LEN
    from bitcoin_price_etl_spark.registry import load_all

    reg = load_all()
    out = reg["pipeline_curate_corpus"].fn(spark, SF_SMOKE)
    rows = out.collect()
    splits = {
        r.doc_id: r.split
        for r in reg["llm_split_train_eval"].fn(spark, SF_SMOKE).collect()
    }
    for r in rows:
        assert splits[r.doc_id] == r.split
    # offsets: within each (split, shard), sorted by doc_id, each doc's
    # (pack_id, pack_offset) equals running-sum of n_tokens
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[(r.split, r.shard)].append(r)
    for g in groups.values():
        cum = 0
        for r in sorted(g, key=lambda r: r.doc_id):
            assert (r.pack_id, r.pack_offset) == (
                cum // PACK_SEQ_LEN,
                cum % PACK_SEQ_LEN,
            )
            cum += r.n_tokens


def test_lsh_arrow_signatures_match_jvm_twin(spark):
    """The Arrow matmul signature stage must produce exactly the JVM fold
    twin's band values on the whole fixture corpus."""
    import numpy as np

    from bitcoin_price_etl_spark.llm.simsearch import (
        DIM,
        _band_signature_cols,
        _band_signature_sigs,
    )

    rng = np.random.RandomState(42)
    planes = rng.standard_normal((16, DIM))
    e = load(spark, SF_SMOKE, "embeddings")
    jvm = {
        (r.vec_id, r.band0, r.band1, r.band2, r.band3)
        for r in e.select("vec_id", "embedding", *_band_signature_cols(planes))
        .drop("embedding")
        .collect()
    }
    arrow = {
        (r.vec_id, r.band0, r.band1, r.band2, r.band3)
        for r in _band_signature_sigs(e, planes).drop("embedding").collect()
    }
    assert jvm == arrow


def test_sessionize_against_brute_force(spark):
    """ts_sessionize must agree with a driver-side brute-force pass:
    same session count per user, same per-session bounds, and every
    intra-session gap within the 30-min threshold while every
    session-to-session gap exceeds it."""
    from bitcoin_price_etl_spark.operators.eventflow import (
        SESSION_GAP_SECONDS,
        ts_sessionize,
    )

    got = {
        (r.user_id, r.session_seq): (r.session_start, r.session_end, r.n_events)
        for r in ts_sessionize(spark, SF_SMOKE).collect()
    }
    rows = (
        load(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id))
    expected = {}
    for uid, evs in by_user.items():
        evs.sort()
        seq = 0
        start = end = None
        n = 0
        prev = None
        for ts, _eid in evs:
            if prev is None or (ts - prev).total_seconds() > SESSION_GAP_SECONDS:
                if seq:
                    expected[(uid, seq)] = (start, end, n)
                seq += 1
                start, n = ts, 0
            end = ts
            n += 1
            prev = ts
        expected[(uid, seq)] = (start, end, n)
    assert set(got) == set(expected)
    for k, (start, end, n) in expected.items():
        g_start, g_end, g_n = got[k]
        assert g_n == n, (k, got[k], (start, end, n))
        assert g_start == start.strftime("%Y-%m-%d %H:%M:%S")
        assert g_end == end.strftime("%Y-%m-%d %H:%M:%S")


def test_range_binned_join_equals_brute_force(spark):
    """The binned interval join must count exactly the pairs the naive
    O(n²) predicate admits — bin math can neither drop a boundary pair
    nor double-count one (each error's bin is unique)."""
    from bitcoin_price_etl_spark.operators.joins import (
        RANGE_BIN_SECONDS,
        join_range_binned,
    )

    got = {
        r.event_id: r.n_nearby_purchases
        for r in join_range_binned(spark, SF_SMOKE).collect()
    }
    ev = load(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "ts"
    ).collect()
    errors = [(r.event_id, r.ts) for r in ev if r.event_type == "error"]
    purchases = [r.ts for r in ev if r.event_type == "purchase"]
    radius = RANGE_BIN_SECONDS
    for eid, ts in errors:
        n = sum(1 for p in purchases if abs((ts - p).total_seconds()) <= radius)
        assert got[eid] == n, (eid, got[eid], n)
    assert len(got) == len(errors)


def test_weighted_sample_matches_reference_formula(spark):
    """llm_sample_weighted's winners must equal a driver-side replay of
    the Efraimidis–Spirakis draw (same md5 uniform, same weights) — the
    sample is a pure function of keys and weights, never of layout."""
    import hashlib
    import math
    from decimal import Decimal, ROUND_HALF_UP

    from bitcoin_price_etl_spark.llm.curation import (
        WEIGHTED_SAMPLE_K,
        llm_sample_weighted,
    )

    got = [r.doc_id for r in llm_sample_weighted(spark, SF_SMOKE).collect()]
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "n_chars").collect()
    scored = []
    for r in docs:
        u_int = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        pri = -math.log((u_int + 1.0) / 4294967297.0) / r.n_chars
        pri_q = Decimal(repr(pri)).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )
        scored.append((pri_q, r.doc_id))
    expected = [d for _, d in sorted(scored)[:WEIGHTED_SAMPLE_K]]
    assert sorted(got) == sorted(expected)


def test_kmeans_assign_matches_numpy_argmin(spark):
    """llm_kmeans_assign must agree with a numpy float64 argmin over the
    same seed centroids (tie-break on centroid id)."""
    import numpy as np

    from bitcoin_price_etl_spark.llm.simsearch import (
        KMEANS_K,
        llm_kmeans_assign,
    )

    got = {
        r.vec_id: r.cluster_id for r in llm_kmeans_assign(spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    rows.sort(key=lambda r: r.vec_id)
    cents = [(r.vec_id, np.array(r.embedding, dtype=np.float64))
             for r in rows[:KMEANS_K]]
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        best = min(
            (float(((v - c) * (v - c)).sum()), cid) for cid, c in cents
        )[1]
        assert got[r.vec_id] == best, r.vec_id


def test_rolling_median_matches_python_replay(spark):
    """win_rolling_median must equal a driver-side replay: per series,
    sort by (ts, event_id), take the trailing ≤21 values, sort them, and
    pick the lower middle — validating the frame-order assumption the
    windowed list builds on."""
    from bitcoin_price_etl_spark.operators.windows import (
        ROLL_TAPS,
        win_rolling_median,
    )

    got = {
        (r.event_type, r.event_id): r.rolling_median
        for r in win_rolling_median(spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select(
        "event_type", "ts", "event_id", "value"
    ).collect()
    series = {}
    for r in rows:
        series.setdefault(r.event_type, []).append((r.ts, r.event_id, r.value))
    for etype, evs in series.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        for i, (_, eid, _) in enumerate(evs):
            frame = sorted(vals[max(0, i - ROLL_TAPS + 1): i + 1])
            expect = frame[(len(frame) + 1) // 2 - 1]
            assert got[(etype, eid)] == expect, (etype, eid)


def test_ewma_matches_python_replay(spark):
    """ts_ewma must equal a float64 replay of the truncated formula with
    the same 1e-6 decimal quantization at the edge."""
    from decimal import Decimal, ROUND_HALF_UP

    from bitcoin_price_etl_spark.operators.windows import (
        EWMA_DECAY,
        EWMA_HORIZON,
        ts_ewma,
    )

    got = {
        (r.event_type, r.event_id): r.ewma
        for r in ts_ewma(spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select(
        "event_type", "ts", "event_id", "value"
    ).collect()
    series = {}
    for r in rows:
        series.setdefault(r.event_type, []).append((r.ts, r.event_id, r.value))
    for etype, evs in series.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        for i, (_, eid, _) in enumerate(evs):
            frame = vals[max(0, i - EWMA_HORIZON + 1): i + 1]
            n = len(frame)
            num = 0.0
            den = 0.0
            for k, x in enumerate(frame):
                w = EWMA_DECAY ** (n - 1 - k)
                num += x * w
                den += w
            expect = float(
                Decimal(repr(num / den)).quantize(
                    Decimal("1e-6"), rounding=ROUND_HALF_UP
                )
            )
            assert got[(etype, eid)] == expect, (etype, eid)


def test_vocab_build_matches_counter_replay(spark):
    """llm_vocab_build must equal a collections.Counter replay of the
    same tokenization (lower + [^a-z]+ split, min count, top-K ordered
    by count desc then token)."""
    import re
    from collections import Counter

    from bitcoin_price_etl_spark.llm.textstats import (
        VOCAB_MIN_COUNT,
        VOCAB_TOP_K,
        llm_vocab_build,
    )

    got = [
        (r.token, r.n_total, r.n_docs)
        for r in llm_vocab_build(spark, SF_SMOKE).collect()
    ]
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    totals = Counter()
    doc_freq = Counter()
    for r in docs:
        toks = [t for t in re.split(r"[^a-z]+", r.text.lower()) if t]
        totals.update(toks)
        doc_freq.update(set(toks))
    kept = [(t, n) for t, n in totals.items() if n >= VOCAB_MIN_COUNT]
    kept.sort(key=lambda tn: (-tn[1], tn[0]))
    expected = [(t, n, doc_freq[t]) for t, n in kept[:VOCAB_TOP_K]]
    assert got == expected


def test_temperature_sample_matches_replay(spark):
    """llm_sample_temperature membership must equal a Python replay of
    the acceptance thresholds (counts → pow → decimal quantize → integer
    2^-32 quanta) against the md5 draw."""
    import hashlib
    from decimal import Decimal, ROUND_HALF_UP

    from bitcoin_price_etl_spark.llm.curation import (
        _TEMP_T,
        llm_sample_temperature,
    )

    got = {r.doc_id for r in llm_sample_temperature(spark, SF_SMOKE).collect()}
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "source").collect()
    counts = {}
    for r in docs:
        counts[r.source] = counts.get(r.source, 0) + 1
    n = sum(counts.values())
    pw = {
        s: Decimal(repr((c / n) ** _TEMP_T)).quantize(
            Decimal("1e-9"), rounding=ROUND_HALF_UP
        )
        for s, c in counts.items()
    }
    z = sum(pw.values())
    r_ratio = {
        s: (float(pw[s]) / float(z)) / (counts[s] / n) for s in counts
    }
    rmax = max(r_ratio.values())
    thr = {
        s: min(int((r_ratio[s] / rmax) * 4294967296.0), 4294967295)
        for s in counts
    }
    expected = set()
    for r in docs:
        u = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        if u < thr[r.source]:
            expected.add(r.doc_id)
    assert got == expected


def test_triangle_count_matches_brute_force(spark):
    """graph_triangle_count's degree-ordered orientation must produce
    exactly the census a driver-side brute force computes from the same
    support-thresholded edge set — orientation can neither drop a
    triangle (every triangle has exactly one vertex out-joined to the
    other two) nor double-count one."""
    from collections import Counter

    from bitcoin_price_etl_spark.operators.graph import (
        TRI_MIN_SUPPORT,
        graph_triangle_count,
    )

    got = graph_triangle_count(spark, SF_SMOKE).collect()[0]
    li = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, []).append(r.l_partkey)
    supp = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                if ps[i] < ps[j]:
                    supp[(ps[i], ps[j])] += 1
    edges = {e for e, c in supp.items() if c >= TRI_MIN_SUPPORT}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    n_wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    n_tri = sum(
        1
        for (u, v) in edges
        for w in adj[u] & adj[v]
        if v < w  # u < v < w: count each triangle once
    )
    assert got.n_nodes == len(adj)
    assert got.n_edges == len(edges)
    assert got.n_wedges == n_wedges
    assert got.n_triangles == n_tri


def test_attribution_matches_brute_force(spark):
    """attribution_channels must equal a driver-side replay: per
    purchase, collect the user's in-window touches, pick first/last by
    (ts, event_id), and roll up per channel."""
    from bitcoin_price_etl_spark.operators.eventflow import (
        ATTRIB_WINDOW_SECONDS,
        _ATTRIB_CHANNELS,
        attribution_channels,
    )

    got = {
        r.channel: (
            r.total_touches,
            r.touched_conversions,
            r.last_touch_conversions,
            r.first_touch_conversions,
            r.assisted_conversions,
        )
        for r in attribution_channels(spark, SF_SMOKE).collect()
    }
    ev = load(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "ts"
    ).collect()
    touches = {}
    for r in ev:
        if r.event_type in _ATTRIB_CHANNELS:
            touches.setdefault(r.user_id, []).append(
                (r.ts, r.event_id, r.event_type)
            )
    stats = {}  # channel -> [touches, touched, last, first, assisted]
    for r in ev:
        if r.event_type != "purchase":
            continue
        window = [
            t
            for t in touches.get(r.user_id, ())
            if t[0] < r.ts
            and (r.ts - t[0]).total_seconds() <= ATTRIB_WINDOW_SECONDS
        ]
        if not window:
            continue
        window.sort()
        first_ch, last_ch = window[0][2], window[-1][2]
        per_ch = {}
        for _, _, ch in window:
            per_ch[ch] = per_ch.get(ch, 0) + 1
        for ch, n in per_ch.items():
            s = stats.setdefault(ch, [0, 0, 0, 0, 0])
            s[0] += n
            s[1] += 1
            s[2] += ch == last_ch
            s[3] += ch == first_ch
            s[4] += ch != last_ch
    assert got == {ch: tuple(s) for ch, s in stats.items()}


def test_preference_pairs_invariants(spark):
    """Structural invariants of llm_preference_pairs: chosen outranks
    rejected (margin ≥ 0, and doc_id breaks exact ties), no document
    appears in two pairs, and pairing is source-local."""
    from bitcoin_price_etl_spark.llm.curation import llm_preference_pairs

    rows = llm_preference_pairs(spark, SF_SMOKE).collect()
    assert rows, "no pairs at smoke SF"
    seen = set()
    for r in rows:
        assert r.margin == r.chosen_chars - r.rejected_chars
        assert r.margin >= 0
        if r.margin == 0:
            assert r.chosen_doc_id < r.rejected_doc_id
        for d in (r.chosen_doc_id, r.rejected_doc_id):
            assert d not in seen, f"doc {d} in two pairs"
            seen.add(d)


def test_bpe_merge_matches_counter_replay(spark):
    """llm_bpe_merge_step must equal a collections.Counter replay of the
    weighted adjacent-pair count over the same [a-z]+ tokenization."""
    import re
    from collections import Counter

    from bitcoin_price_etl_spark.llm.textstats import (
        BPE_TOP_MERGES,
        llm_bpe_merge_step,
    )

    got = [
        (r.pair, r.freq, r.n_word_forms)
        for r in llm_bpe_merge_step(spark, SF_SMOKE).collect()
    ]
    docs = load(spark, SF_SMOKE, "documents").select("text").collect()
    wc = Counter()
    for r in docs:
        for w in re.findall(r"[a-z]+", r.text.lower()):
            if len(w) >= 2:
                wc[w] += 1
    freq = Counter()
    forms = {}
    for w, c in wc.items():
        for i in range(len(w) - 1):
            p = w[i : i + 2]
            freq[p] += c
            forms.setdefault(p, set()).add(w)
    expected = sorted(
        ((p, c, len(forms[p])) for p, c in freq.items()),
        key=lambda t: (-t[1], t[0]),
    )[:BPE_TOP_MERGES]
    assert got == expected


def test_span_corruption_matches_replay(spark):
    """llm_span_corruption must equal a hashlib replay of the block-grid
    draw: same corrupted blocks, same span lengths, same sentinel
    numbering, and corrupted+target must jointly conserve every token."""
    import hashlib

    from bitcoin_price_etl_spark.llm.curation import (
        SPAN_BLOCK,
        SPAN_RATE_HEX,
        llm_span_corruption,
    )

    def h(doc_id, b):
        return hashlib.md5(f"{doc_id}#{b}".encode()).hexdigest()

    got = {
        r.doc_id: (r.corrupted_text, r.target_text, r.n_spans)
        for r in llm_span_corruption(spark, SF_SMOKE).collect()
    }
    docs = load(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    ).collect()
    assert len(got) == len(docs)
    for r in docs:
        toks = r.text.split(" ")
        nblocks = (len(toks) + SPAN_BLOCK - 1) // SPAN_BLOCK
        out, tgt, sid = [], [], 0
        for b in range(nblocks):
            block = toks[b * SPAN_BLOCK : (b + 1) * SPAN_BLOCK]
            hx = h(r.doc_id, b)
            if hx[:2] < SPAN_RATE_HEX:
                span_len = 1 + int(hx[2], 16) % 3
                out.append(f"<extra_id_{sid}>")
                out.extend(block[span_len:])
                tgt.append(
                    f"<extra_id_{sid}> " + " ".join(block[:span_len])
                )
                sid += 1
            else:
                out.extend(block)
        expected = (" ".join(out), " ".join(tgt), sid)
        assert got[r.doc_id] == expected, (r.doc_id, got[r.doc_id], expected)

def test_weighted_median_matches_python_replay(spark):
    """agg_weighted_median's window formulation must reproduce the
    textbook driver-side replay: sort each group by (price, orderkey,
    linenumber), accumulate weights, return the first price whose
    cumulative weight reaches half the total."""
    from bitcoin_price_etl_spark.operators.aggregates import (
        agg_weighted_median,
    )

    got = {
        r.l_returnflag: (r.weighted_median_price, r.total_weight)
        for r in agg_weighted_median(spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity",
        "l_orderkey", "l_linenumber",
    ).collect()
    groups = {}
    for r in rows:
        groups.setdefault(r.l_returnflag, []).append(
            (float(r.l_extendedprice), float(r.l_quantity),
             r.l_orderkey, r.l_linenumber)
        )
    assert set(got) == set(groups)
    for flag, items in groups.items():
        items.sort(key=lambda t: (t[0], t[2], t[3]))
        total = sum(w for _, w, _, _ in items)
        cw = 0.0
        for price, w, _, _ in items:
            cw += w
            if cw >= total / 2:
                assert got[flag] == (price, total), flag
                break


def test_heavy_hitters_matches_counter_replay(spark):
    """agg_heavy_hitters must equal an exact driver-side Counter over the
    orders table — the phi-frequent set is fully determined by counts."""
    from collections import Counter

    from bitcoin_price_etl_spark.operators.aggregates import (
        HH_MIN_ORDERS,
        agg_heavy_hitters,
    )

    got = {r.o_custkey: r.n_orders
           for r in agg_heavy_hitters(spark, SF_SMOKE).collect()}
    cnt = Counter(
        r.o_custkey
        for r in load(spark, SF_SMOKE, "orders").select("o_custkey").collect()
    )
    want = {k: c for k, c in cnt.items() if c >= HH_MIN_ORDERS}
    assert got == want and len(got) > 0


def test_containment_bounds_and_symmetry(spark):
    """Containment must (a) upper-bound Jaccard on every co-surfaced
    pair, (b) lie in (0, 1], and (c) name the smaller-set doc as the
    contained one."""
    from bitcoin_price_etl_spark.llm.dedup import (
        llm_containment,
        llm_ngram_jaccard,
    )

    cont = {(r.doc_a, r.doc_b): (r.containment, r.contained_doc)
            for r in llm_containment(spark, SF_SMOKE).collect()}
    assert cont, "containment must surface pairs at smoke scale"
    jac = {(r.doc_a, r.doc_b): r.jaccard
           for r in llm_ngram_jaccard(spark, SF_SMOKE).collect()}
    for pair, (c, contained) in cont.items():
        assert 0.0 < c <= 1.0
        assert contained in pair
        if pair in jac:
            assert c >= jac[pair] - 1e-9, (pair, c, jac[pair])


def test_perplexity_filter_scores_train_terms_higher(spark):
    """A doc built of common train-corpus terms must outscore the add-1
    floor: sanity that the model join actually attaches counts (a broken
    join would send every doc to the unseen-term floor and still pass
    row-count checks)."""
    from bitcoin_price_etl_spark.llm.textstats import (
        llm_perplexity_filter,
    )

    rows = llm_perplexity_filter(spark, SF_SMOKE).collect()
    assert rows
    scores = [r.mean_logprob for r in rows]
    # if ALL eval docs sat at the unseen floor, the spread would be 0
    assert max(scores) > min(scores)
    for r in rows:
        assert r.keep == (r.mean_logprob >= -8.0)


def test_sft_format_md5_matches_python_render(spark):
    """The rendered-template md5 must equal a driver-side re-render from
    the raw texts — pins every byte of the template."""
    import hashlib

    from bitcoin_price_etl_spark.llm.curation import (
        SFT_SYSTEM,
        llm_sft_format,
    )

    got = {r.example_id: r for r in llm_sft_format(spark, SF_SMOKE).collect()}
    assert got
    texts = {r.doc_id: r.text
             for r in load(spark, SF_SMOKE, "documents").collect()}
    n_checked = 0
    for ex_id, r in got.items():
        p, resp = texts[r.prompt_doc_id], texts[r.response_doc_id]
        rendered = (
            "<|system|>\n" + SFT_SYSTEM + "\n<|user|>\n" + p
            + "\n<|assistant|>\n" + resp
        )
        assert r.rendered_md5 == hashlib.md5(
            rendered.encode("utf-8")
        ).hexdigest()
        n_checked += 1
    assert n_checked == len(got)


def test_seasonal_decompose_identity(spark):
    """y must equal trend + seasonal + remainder exactly (remainder is
    defined as the difference of already-materialized doubles), and each
    (series, hod)'s seasonal index must be constant."""
    from bitcoin_price_etl_spark.operators.windows import (
        ts_seasonal_decompose,
    )

    rows = ts_seasonal_decompose(spark, SF_SMOKE).collect()
    assert rows
    per_hod = {}
    for r in rows:
        assert r.y == r.trend + r.seasonal + r.remainder or abs(
            r.y - (r.trend + r.seasonal + r.remainder)
        ) < 1e-12
        hod = int(r.hr[11:13])
        per_hod.setdefault((r.event_type, hod), set()).add(r.seasonal)
    assert all(len(v) == 1 for v in per_hod.values())


def test_bipartite_projection_matches_capped_replay(spark):
    """The projection must equal a driver-side replay of its own
    definition: per-part postings truncated to the CAP lowest custkeys,
    pair counts over those postings, min-common gate — and every count
    must lower-bound the TRUE (uncapped) co-purchase count (the cap may
    undercount, never fabricate)."""
    from collections import Counter

    from bitcoin_price_etl_spark.operators.graph import (
        BIPROJ_CAP,
        BIPROJ_MIN_COMMON,
        graph_bipartite_projection,
    )

    got = {(r.cust_a, r.cust_b): r.n_common_parts
           for r in graph_bipartite_projection(spark, SF_SMOKE).collect()}
    assert got
    o = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    bp = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("l_partkey", "o_custkey")
        .distinct()
        .collect()
    )
    by_part, by_cust = {}, {}
    for r in bp:
        by_part.setdefault(r.l_partkey, set()).add(r.o_custkey)
        by_cust.setdefault(r.o_custkey, set()).add(r.l_partkey)
    cnt = Counter()
    for custs in by_part.values():
        capped = sorted(custs)[:BIPROJ_CAP]
        for i in range(len(capped)):
            for j in range(i + 1, len(capped)):
                cnt[(capped[i], capped[j])] += 1
    want = {p: c for p, c in cnt.items() if c >= BIPROJ_MIN_COMMON}
    assert got == want
    for (a, b), c in got.items():
        assert c <= len(by_cust[a] & by_cust[b])


def test_kmeans_train_matches_python_replay(spark):
    """The 3-round scaled-integer Lloyd loop must reproduce a driver-side
    pure-Python replay exactly — integers make 'exactly' meaningful for
    an iterative algorithm (no tolerance anywhere)."""
    from bitcoin_price_etl_spark.llm.simsearch import (
        KMEANS_K,
        KMT_ITERS,
        KMT_SCALE,
        llm_kmeans_train,
    )

    got = {r.cluster_id: (r.n_vectors, r.inertia, r.centroid_l1)
           for r in llm_kmeans_train(spark, SF_SMOKE).collect()}
    rows = load(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    import math

    q = {
        r.vec_id: [
            int(math.floor(float(x) * KMT_SCALE + 0.5)) for x in r.embedding
        ]
        for r in rows
    }
    seeds = sorted(q)[:KMEANS_K]
    cent = {cid: list(q[cid]) for cid in seeds}
    assign = {}
    for t in range(KMT_ITERS):
        assign = {}
        for vid, vec in q.items():
            best = None
            for cid in sorted(cent):
                d2 = sum((a - b) * (a - b) for a, b in zip(vec, cent[cid]))
                if best is None or (d2, cid) < best[:2]:
                    best = (d2, cid)
            assign[vid] = best
        if t == KMT_ITERS - 1:
            break
        sums = {}
        for vid, (d2, cid) in assign.items():
            acc = sums.setdefault(cid, [[0] * len(q[vid]), 0])
            for i, v in enumerate(q[vid]):
                acc[0][i] += v
            acc[1] += 1
        for cid, (svec, n) in sums.items():
            cent[cid] = [int(math.floor(s / n + 0.5)) for s in svec]
    want = {}
    for cid in cent:
        members = [(v, d2) for v, (d2, c) in assign.items() if c == cid]
        if not members:
            continue
        inertia = sum(d2 for _, d2 in members) / (KMT_SCALE * KMT_SCALE)
        want[cid] = (
            len(members),
            inertia,
            sum(abs(x) for x in cent[cid]),
        )
    assert set(got) == set(want)
    for cid in got:
        assert got[cid][0] == want[cid][0], cid
        assert got[cid][2] == want[cid][2], cid
        assert abs(got[cid][1] - want[cid][1]) < 1e-9, cid


@pytest.mark.parametrize("key", [
    "agg_weighted_median",
    "ts_seasonal_decompose",
    "llm_embed_drift",
    "llm_kmeans_train",
    "llm_bigram_lm",
])
def test_round4c_keys_shuffle_partition_invariant(spark, key):
    """The round's determinism disciplines (pinned-order folds, scaled-
    integer arithmetic, total-order tie-breaks) must make results
    bit-identical under a different shuffle partitioning — the property
    raw double partial-aggs do NOT have."""
    from bitcoin_price_etl_spark.registry import load_all

    fn = load_all()[key].fn
    a = _multiset(fn(spark, SF_SMOKE))
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        b = _multiset(fn(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b


def test_geohash_prefix_nesting(spark):
    """The defining geohash property: two points share the 4-char prefix
    IFF they share the top 20 Morton bits (prefix containment == spatial
    ancestor cell), and every char decodes back to its 5-bit group."""
    from bitcoin_price_etl_spark.functions.scalars import (
        GEOHASH_ALPHABET,
        fn_geohash,
    )

    rows = fn_geohash(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # re-derive the base32 string from the integer
        want = "".join(
            GEOHASH_ALPHABET[(r.geohash_int >> (30 - 5 * (j + 1))) & 31]
            for j in range(6)
        )
        assert r.geohash6 == want
        assert r.prefix4 == want[:4]
    by_prefix = {}
    for r in rows:
        by_prefix.setdefault(r.prefix4, set()).add(r.geohash_int >> 10)
    for tops in by_prefix.values():
        assert len(tops) == 1  # same prefix4 <=> same top 20 bits


def test_sink_salted_layout_one_dir_per_hex_prefix(spark):
    """The salted write must land every row under a single-hex-char
    partition directory (the anti-hotspot layout contract), and the
    read-back per-prefix counts must reconcile with the source — the
    file-layout half of sink_salted's check (the row-content half is the
    key's DuckDB oracle since round 4e)."""
    import os

    from bitcoin_price_etl_spark.paths import sink_path
    from bitcoin_price_etl_spark.registry import load_all

    out = load_all()["sink_salted"].fn(spark, SF_SMOKE)
    counts = {r["part_key"]: r["n_rows"] for r in out.collect()}
    root = sink_path("sink_salted/docs").removeprefix("file:")
    dirs = {
        d.split("=", 1)[1]
        for d in os.listdir(root)
        if d.startswith("part_key=")
    }
    assert dirs == set(counts), "one partition dir per observed prefix"
    assert all(len(p) == 1 and p in "0123456789abcdef" for p in dirs)
    n_src = load(spark, SF_SMOKE, "documents").count()
    assert sum(counts.values()) == n_src


@pytest.mark.parametrize("key", [
    "ts_rsi",
    "win_rolling_beta",
    "agg_gini",
    "validate_benford",
    "llm_decontaminate_bloom",
    "ts_obv",
    "llm_diversity_index",
    "ts_atr",
    "ts_candle_patterns",
    "llm_template_mine",
    "ts_macd",
    "ts_stochastic",
    "ts_keltner",
    "ts_bollinger",
    "ts_ichimoku",
    "validate_k_anonymity",
    "llm_ngram_novelty",
    "validate_referential_integrity",
    "llm_dp_noise",
    "validate_volume_anomaly",
    "ts_theilsen",
    "cohort_survival_km",
    "ts_periodogram",
    "agg_winsorized_mean",
    "llm_hard_negatives",
    "join_skyline_pareto",
    "ts_volatility_ohlc",
    "set_intersect_all",
    "ab_ratio_delta_ci",
    "ts_mann_kendall",
    "validate_psi_drift",
    "ts_sax_symbolize",
    "llm_domain_route",
    "ts_hurst_rs",
    "cohort_ltv_curve",
    "agg_theil_index",
    "llm_bm25_rank",
    "agg_rfm_segmentation",
    "sink_export_jsonl",
    "graph_assortativity",
    "ts_spectral_entropy",
    "validate_pk_uniqueness",
    "ts_lead_lag_xcorr",
    "ts_adx",
    "path_markov_transitions",
    "ab_power_mde",
    "agg_market_basket",
    "pipeline_feature_store",
    "ts_var_es",
    "llm_embed_whitening",
    "ts_peak_detection",
    "llm_oov_rate",
    "llm_judge_agreement",
    "ab_ks_two_sample",
    "ts_event_study_car",
    "llm_cluster_eval",
    "llm_label_outliers",
])
def test_round4e_keys_shuffle_partition_invariant(spark, key):
    """Round-4e determinism disciplines (decimal frame moments, per-term
    quantized logs, total-order tie-breaks, integer cumsums, bloom +
    exact-confirm) must make results bit-identical under a different
    shuffle partitioning."""
    from bitcoin_price_etl_spark.registry import load_all

    fn = load_all()[key].fn
    a = _multiset(fn(spark, SF_SMOKE))
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        b = _multiset(fn(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b


def test_minhash_mllib_distances_match_exact_jaccard(spark):
    """The MLlib pathway's reported Jaccard distances must agree with an
    independently computed exact shingle Jaccard on every emitted pair
    (HashingTF index collisions at 2^18 features can only nudge the
    value, bounded here at 0.05), and every pair must clear the 0.6
    distance threshold."""
    from bitcoin_price_etl_spark.registry import load_all

    pairs = load_all()["llm_dedup_minhash_mllib"].fn(spark, SF_SMOKE).collect()
    assert len(pairs) > 0
    d = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    sh = d.select(
        "doc_id",
        F.expr(
            "array_distinct(transform("
            " sequence(1, greatest(size(split(text, ' ')) - 4, 1)),"
            " i -> concat_ws(' ', slice(split(text, ' '), i, 5))))"
        ).alias("s"),
    )
    sets = {r["doc_id"]: set(r["s"]) for r in sh.collect()}
    for p in pairs:
        a, b = sets[p["doc_a"]], sets[p["doc_b"]]
        exact_j = len(a & b) / len(a | b)
        assert p["jaccard_dist"] <= 0.6 + 1e-9
        assert abs((1.0 - p["jaccard_dist"]) - exact_j) < 0.05, (
            p["doc_a"], p["doc_b"], p["jaccard_dist"], exact_j,
        )


def test_ann_recall_floor_vs_exact(spark):
    """Quantitative ANN quality gate (VERDICT r5 item 5): recall@10 of the
    LSH and IVF approximate paths against exact brute-force cosine must
    hold a floor, so an index-parameter regression (band widths, nprobe,
    centroid count) is caught as a FAILURE, not just noticed as a slower
    row in the probe table. Floors sit one k-th (0.1) below the measured
    values on the fixture — lsh 0.3, ivf 0.5 at BOTH sf0.001 and sf0.01
    (gaussian-noise embeddings, the hardest ANN regime; see the
    llm_sim_search_recall docstring for why these absolute numbers are
    the data's fault, not the index's). Runs at SF_CORRECT so the
    SPARK_GRAFT_TEST_SF_DIR=sf0.01 escalation audits the gate at the
    driver's scale, where a banding/nprobe regression could hide."""
    from bitcoin_price_etl_spark.registry import load_all
    from tests.conftest import SF_CORRECT

    rows = load_all()["llm_sim_search_recall"].fn(spark, SF_CORRECT).collect()
    got = {r["method"]: r["recall_at_k"] for r in rows}
    assert set(got) == {"lsh", "lsh_multiprobe", "ivf", "ivf_escalate"}
    assert got["lsh"] >= 0.2, f"lsh recall@10 regressed: {got['lsh']}"
    assert got["ivf"] >= 0.4, f"ivf recall@10 regressed: {got['ivf']}"
    # escalation variants (r9, VERDICT r8 item 7): the recall-repair
    # paths must beat-or-match their fixed-probe bases AND clear 0.7 on
    # the adversarial noise regime — that lift is their reason to exist.
    # The 0.7 bar applies from sf0.01 (driver-gate scale, 500 vectors;
    # measured 0.9/0.9 at sf0.01 AND sf0.1): the 50-vector sf0.001
    # corpus is pure small-sample noise (measured 0.6/0.7), so the tiny
    # fixture only gates the weaker beats-base property.
    big = SF_CORRECT.rstrip("/").endswith(("0.01", "0.1"))
    mp_floor = max(0.7, got["lsh"]) if big else max(0.5, got["lsh"])
    iv_floor = max(0.7, got["ivf"]) if big else max(0.6, got["ivf"])
    assert got["lsh_multiprobe"] >= mp_floor, (
        f"multiprobe lsh no longer lifts noise recall: {got}"
    )
    assert got["ivf_escalate"] >= iv_floor, (
        f"ivf escalation no longer lifts noise recall: {got}"
    )


def test_ann_recall_high_on_clustered_embeddings(spark, tmp_path):
    """The meaningful recall regime (VERDICT r6 item 6): the fixture
    embeddings are isotropic gaussian noise — the hardest possible ANN
    case — so the floors above (0.2/0.4) say little about index quality.
    This test plants 8 well-separated unit centroids + sigma=0.03 noise
    (the shape real embedding corpora actually have) and requires
    recall@10 >= 0.9 from BOTH approximate paths with the production
    banding/nprobe parameters (measured: lsh 1.0, ivf 1.0 — the IVF
    quantizer probes the query's own cell; >=1 of the 4 LSH bands
    collides for a cluster-mate w.p. ~0.98 at this noise level). The
    noise fixture above stays as the adversarial case. The generator is
    shared with bench.py's recall block (llm/evalsets.py) so the gate and
    the round artifact score the same corpus."""
    from bitcoin_price_etl_spark.llm.evalsets import write_clustered_embeddings
    from bitcoin_price_etl_spark.registry import load_all

    write_clustered_embeddings(str(tmp_path))

    rows = load_all()["llm_sim_search_recall"].fn(spark, str(tmp_path)).collect()
    got = {r["method"]: r["recall_at_k"] for r in rows}
    assert got["lsh"] >= 0.9, f"lsh recall@10 on clustered data: {got['lsh']}"
    assert got["ivf"] >= 0.9, f"ivf recall@10 on clustered data: {got['ivf']}"
    # escalation must never LOSE recall vs its base on the easy regime
    assert got["lsh_multiprobe"] >= got["lsh"], f"multiprobe below base: {got}"
    assert got["ivf_escalate"] >= got["ivf"], f"escalate below base: {got}"


def test_semdedup_arrow_assignment_matches_reference(spark, monkeypatch):
    """The Arrow assignment path (_semdedup_assign past SEMDEDUP_DIRECT_K)
    has no oracle at any tested scale — its semantics are pinned here
    against an independent numpy implementation of the same exact rule on
    the smoke fixture (DIRECT_K forced to 0 so K=8 goes through the Arrow
    path): point -> nearest of the K centroids, ties to the smaller cid;
    kept = no lower-id cell-mate with cosine > tau. The Arrow path must
    also agree with the certified fold-form direct path cell-for-cell on
    this fixture (same exact argmin, two float formulations — a
    disagreement means a near-tie flipped and the cutover is not
    semantics-preserving here)."""
    import numpy as np

    from bitcoin_price_etl_spark.llm import simsearch
    from bitcoin_price_etl_spark.registry import load_all

    fn = load_all()["llm_semdedup"].fn
    direct = {(r.vec_id): (r.cell, r.kept) for r in fn(spark, SF_SMOKE).collect()}

    monkeypatch.setattr(simsearch, "SEMDEDUP_DIRECT_K", 0)
    got = {(r.vec_id): (r.cell, r.kept) for r in fn(spark, SF_SMOKE).collect()}
    assert got == direct  # exact argmin, both formulations, no flips

    rows = sorted(
        load(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(map(float, r.embedding)) for r in rows])
    k = max(simsearch.KMEANS_K, len(ids) // simsearch.SEMDEDUP_CELL_TARGET)
    cent_ids, C = ids[:k], X[:k]
    expected_cell = {
        ids[i]: cent_ids[np.argmin(((C - X[i]) ** 2).sum(axis=1))]
        for i in range(len(ids))
    }
    assert {v: c for v, (c, _) in got.items()} == expected_cell

    norms = np.linalg.norm(X, axis=1)
    by_cell: dict[int, list[int]] = {}
    for i in range(len(ids)):
        by_cell.setdefault(expected_cell[ids[i]], []).append(i)
    for cell, idxs in by_cell.items():
        idxs = sorted(idxs, key=lambda i: ids[i])
        for pos, i in enumerate(idxs):
            dup = any(
                float(X[i] @ X[j]) / (norms[i] * norms[j]) > simsearch.SEMDEDUP_TAU
                for j in idxs[:pos]
            )
            assert got[ids[i]][1] == (not dup), (ids[i], cell)


def test_semdedup_kept_gram_blocking_matches_unblocked(spark):
    """_semdedup_kept_cells computes the per-cell gram in 1024-row blocks;
    a cell bigger than one block must produce exactly the flags of the
    unblocked O(n²) reference — the block boundary must not lose or
    duplicate any (j < i) comparison. 2500 rows in one cell = 3 blocks,
    with planted near-duplicate pairs straddling block boundaries."""
    import numpy as np

    from bitcoin_price_etl_spark.llm.simsearch import (
        SEMDEDUP_TAU,
        _semdedup_kept_cells,
    )

    rng = np.random.RandomState(11)
    n = 2500
    X = rng.standard_normal((n, 16))
    # plant duplicates across block boundaries: row 1100 ≈ row 3,
    # row 2300 ≈ row 1050 (same direction ⇒ cosine ≈ 1 > tau)
    X[1100] = X[3] * 1.7
    X[2300] = X[1050] * 0.4
    pdf = spark.createDataFrame(
        [(int(i), 0, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, cell long, embedding array<double>",
    )
    got = {r.vec_id: r.kept for r in _semdedup_kept_cells(pdf).collect()}
    assert len(got) == n

    nrm = np.linalg.norm(X, axis=1)
    G = (X @ X.T) / np.outer(nrm, nrm)
    expected = {
        i: not bool((G[i, :i] > SEMDEDUP_TAU).any()) for i in range(n)
    }
    assert got == expected
    assert got[1100] is False and got[2300] is False  # the planted dups


def test_dedup_embed_gram_path_matches_fold(spark, monkeypatch):
    """llm_dedup_embed's beyond-fixture gram path must emit exactly the
    fold-join path's pair set with cosines equal to float tolerance (the
    two formulations differ only in summation order; on the smoke fixture
    no pair sits within 1e-9 of the threshold)."""
    from bitcoin_price_etl_spark.llm import simsearch
    from bitcoin_price_etl_spark.registry import load_all

    fn = load_all()["llm_dedup_embed"].fn
    fold = {(r.vec_a, r.vec_b): r.cosine for r in fn(spark, SF_SMOKE).collect()}
    assert fold  # vacuous-oracle guard

    monkeypatch.setattr(simsearch, "DEDUP_EMBED_GRAM_MIN_N", 0)
    gram = {(r.vec_a, r.vec_b): r.cosine for r in fn(spark, SF_SMOKE).collect()}
    assert set(gram) == set(fold)
    for k_, v in gram.items():
        assert abs(v - fold[k_]) < 1e-9, (k_, v, fold[k_])


# The midpoint-quantization divergence class (exprs.py rule-11; the r7
# sf0.1 audit's four catches; VERDICT r7 item 3), pinned as an engine
# CONTRACT rather than prose. Mechanism, measured on this JDK/DuckDB:
# - Spark casts double→DECIMAL(p,s) by HALF_UP-rounding the SHORTEST
#   decimal repr (BigDecimal.valueOf → Double.toString), so a double
#   whose shortest repr IS a scale-s midpoint string always rounds UP.
# - DuckDB rounds a d×10^s DOUBLE PRODUCT half-away-from-zero, so FP
#   error in the product decides the side — neither the exact binary
#   value nor the shortest repr.
# Divergence therefore happens exactly when the product error pulls
# DuckDB below a midpoint Spark's repr sits on: ~29% of constructed
# midpoint-repr doubles in the sampled battery. Both engines agree on
# every value ≥1e-4 quanta away from a midpoint — the accepted-risk
# envelope for the rule-2-necessary quantize sites (libm/differing
# operands), where the quantized value is never a constructed midpoint
# and P[within an ulp of one] ~ 1e-10 per value.
_MIDPOINT_DIVERGING = [
    # (double, spark CAST(… AS DECIMAL(18,6)), duckdb same cast)
    (1424.6191765, "1424.619177", "1424.619176"),
    (32.0312445, "32.031245", "32.031244"),
    (9863.0278245, "9863.027825", "9863.027824"),
    (3257.7508005, "3257.750801", "3257.750800"),
    (6873.2311485, "6873.231149", "6873.231148"),
    (603.2917045, "603.291705", "603.291704"),
    (77.2773705, "77.277371", "77.277370"),
    (20.3881625, "20.388163", "20.388162"),
]
_MIDPOINT_AGREEING = [
    (0.7775725, "0.777573"),
    (31.2340535, "31.234054"),
    (1.7095705, "1.709571"),
    (0.2439625, "0.243963"),
    (0.7320525, "0.732053"),
    (348.2913695, "348.291370"),
    (3.8005815, "3.800582"),
    (13.0972515, "13.097252"),
]


def test_midpoint_quantize_divergence_contract(spark):
    """Pin the cross-engine double→decimal cast contract that rule-11
    rests on: (a) Spark's cast equals HALF_UP of the shortest repr —
    the predictive model restatements are designed against; (b) the
    recorded diverging/agreeing midpoint cases reproduce bit-for-bit in
    BOTH engines (a Spark or DuckDB upgrade that moves any of these
    must be caught HERE, not by a parity flake at some SF); (c) doubles
    far from any midpoint never diverge — the accepted-risk envelope
    for the remaining rule-2-necessary quantize sites."""
    import random
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    con = duckdb.connect()

    def duck(v: float) -> str:
        return str(
            con.execute(
                f"SELECT CAST(CAST({v!r} AS DOUBLE) AS DECIMAL(18,6))"
            ).fetchone()[0]
        )

    def spark_cast(vals: list[float]) -> list[str]:
        q = " UNION ALL ".join(
            f"SELECT {i} AS i, CAST(CAST({v!r} AS DOUBLE)"
            " AS DECIMAL(18,6)) AS q"
            for i, v in enumerate(vals)
        )
        got = {r["i"]: str(r["q"]) for r in spark.sql(q).collect()}
        return [got[i] for i in range(len(vals))]

    # (b) recorded battery reproduces in both engines
    div_vals = [v for v, _, _ in _MIDPOINT_DIVERGING]
    agr_vals = [v for v, _ in _MIDPOINT_AGREEING]
    sp = spark_cast(div_vals + agr_vals)
    for (v, want_sp, want_du), got_sp in zip(_MIDPOINT_DIVERGING, sp):
        assert got_sp == want_sp, (v, got_sp, want_sp)
        assert duck(v) == want_du, (v, duck(v), want_du)
        assert want_sp != want_du  # the class is REAL on this pair
    for (v, want), got_sp in zip(_MIDPOINT_AGREEING, sp[len(div_vals):]):
        assert got_sp == want and duck(v) == want, (v, got_sp, duck(v))

    # (a) Spark's cast == HALF_UP(shortest repr) on the whole battery
    for v, got in zip(div_vals + agr_vals, sp):
        model = str(
            Decimal(repr(v)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        assert got == model, (v, got, model)

    # (c) far-from-midpoint values agree (seeded, deterministic sweep)
    rng = random.Random(7)
    far = []
    while len(far) < 150:
        v = rng.uniform(0, 10000) * 10 ** rng.randint(-3, 0)
        if abs((v * 1e6) % 1.0 - 0.5) > 1e-4:
            far.append(v)
    for v, got in zip(far, spark_cast(far)):
        assert got == duck(v), (v, got, duck(v))


def test_sim_search_route_three_regimes(spark, tmp_path):
    """The ANN router (VERDICT r9 item 7) must route each measured regime
    to the path the recall/mass table justifies: isotropic noise (CH ~1,
    banded recall 0.3-0.5 and escalation near-scan-cost) -> 'exact';
    strongly clustered (CH ~2239, banded recall 1.0 at tiny mass) ->
    'banded'; weak-but-real structure (sigma grown until CH lands in
    [2, 20)) -> 'escalated'. Thresholds are constants, so a fixture
    drift that moved a regime across a boundary fails loudly here."""
    from bitcoin_price_etl_spark.llm.evalsets import write_clustered_embeddings
    from bitcoin_price_etl_spark.llm.simsearch import ROUTE_CH_HI, ROUTE_CH_LO
    from bitcoin_price_etl_spark.registry import load_all

    fn = load_all()["llm_sim_search_route"].fn

    noise = fn(spark, SF_SMOKE).collect()[0]
    assert noise["route"] == "exact", noise
    assert noise["ch_ratio"] < ROUTE_CH_LO

    strong = str(tmp_path / "strong")
    write_clustered_embeddings(strong)
    r = fn(spark, strong).collect()[0]
    assert r["route"] == "banded", r
    assert r["ch_ratio"] >= ROUTE_CH_HI

    weak = str(tmp_path / "weak")
    write_clustered_embeddings(weak, sigma=0.53)
    r = fn(spark, weak).collect()[0]
    assert r["route"] == "escalated", r
    assert ROUTE_CH_LO <= r["ch_ratio"] < ROUTE_CH_HI
