"""Corpus-curation operators for training-data pipelines (north star,
BASELINE.json): deterministic sampling, corpus mixing, scrubbing,
normalization, quantile-gated quality filtering, and incremental dedup.

No reference precedent (the reference pipeline is a single-document ETL —
SURVEY.md §2.1); these generalize its hash-key discipline
(dags/bpi_etl/bpi_etl_bigquery.py:16-19, R8) to corpus-scale curation.

Scale notes:
- Sampling is a *stateless per-row hash threshold* — no shuffle, no RNG
  state, reproducible across retries/executors, and re-runnable on a new
  partition layout with identical output (unlike df.sample, whose draw
  depends on partition boundaries). At 100 TB the sample is a pure
  scan-filter: predicate-pushdown-friendly and embarrassingly parallel.
- Corpus mixing aggregates to one row per (lang) — the shuffle carries
  5 partial counts, nothing else.
- Scrub/normalize are narrow projections (whole-stage codegen, no
  exchange at all).
- The quality filter computes per-language quantiles on an aggregate
  (5 rows) and broadcast-joins the thresholds back — the 100 TB table is
  scanned twice but never shuffled on doc keys.
- Incremental dedup anti-joins the new batch against the existing corpus
  on an 8-byte hash prefix: at scale the existing-corpus side is the big
  one, so the join shuffles on the hash — a balanced key (uniform by
  construction) with no skew cliff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.registry import query

# Lexicographic md5-hex thresholds: md5 output is uniform over [0,16^32),
# so `md5(key) < '2a'` keeps exactly the fraction 0x2a/0x100 of keys in
# expectation, deterministically, identically in any engine that prints
# lowercase hex (Spark and DuckDB both do). Two hex chars give 1/256
# granularity — enough for sampling-rate intent, exact in both engines.
_SAMPLE_THRESHOLD = "2a"  # ≈16.4%

# Per-language thresholds for stratified sampling: oversample the tail
# languages, undersample the head (the classic rebalancing move).
_STRATA_THRESHOLDS = {
    "en": "14",  # ≈7.8%
    "es": "40",  # 25%
    "de": "40",  # 25%
    "fr": "80",  # 50%
    "zh": "c0",  # 75%
}

# Target corpus-mix shares by language (sum to 1.0).
_MIX_WEIGHTS = {"en": 0.40, "es": 0.20, "de": 0.15, "fr": 0.15, "zh": 0.10}


def _strata_case_sql() -> str:
    branches = " ".join(
        f"WHEN lang = '{lang}' THEN '{thr}'"
        for lang, thr in _STRATA_THRESHOLDS.items()
    )
    return f"CASE {branches} ELSE '00' END"


@query(
    "llm_sample_hash",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_SAMPLE_THRESHOLD}'
    """,
)
def llm_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sampling by hash threshold.

    `md5(doc_id) < threshold` is the reproducible form of TABLESAMPLE:
    membership depends only on the key, never on partitioning, executor
    count, or retry order — the property a training pipeline needs so a
    re-run (or a different cluster) regenerates the *same* sample.
    df.sample() deliberately not used: its draws are partition-local.
    """
    d = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.filter(bucket < F.lit(_SAMPLE_THRESHOLD)).select(
        "doc_id", "lang", "source"
    )


@query(
    "llm_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < {_strata_case_sql()}
    """,
)
def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language hash thresholds.

    Same hash-threshold mechanism as llm_sample_hash with the acceptance
    bound looked up per stratum — rebalances a skewed language mix in one
    shuffle-free scan (contrast sampleBy, which is again partition-local
    RNG). Thresholds are data-independent so the operator stays a pure
    filter; deriving them from observed counts is llm_corpus_mix's job.
    """
    d = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    thr = F.coalesce(
        F.create_map(
            *[F.lit(x) for kv in _STRATA_THRESHOLDS.items() for x in kv]
        )[F.col("lang")],
        F.lit("00"),
    )
    return d.filter(bucket < thr).select("doc_id", "lang")


def _weight_case_sql() -> str:
    branches = " ".join(
        f"WHEN lang = '{lang}' THEN CAST({w} AS DOUBLE)"
        for lang, w in _MIX_WEIGHTS.items()
    )
    return f"CASE {branches} ELSE CAST(0.0 AS DOUBLE) END"


@query(
    "llm_corpus_mix",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ), total AS (
        SELECT SUM(n_docs) AS n_total FROM counts
    )
    SELECT lang, n_docs,
           {_weight_case_sql()} AS target_share,
           CAST(ceil({_weight_case_sql()} * n_total / n_docs) AS BIGINT)
               AS repeat_factor,
           CAST(n_docs * CAST(ceil({_weight_case_sql()} * n_total / n_docs)
                              AS BIGINT) AS BIGINT) AS planned_docs
    FROM counts, total
    """,
)
def llm_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-weighted corpus mixing plan: per-language repeat factors.

    Given target mix shares, compute how many epochs of each language
    stratum a training run should take so the mixed corpus approaches the
    target proportions — the standard up-sampling recipe for low-resource
    strata. Pure aggregate arithmetic: the 100 TB scan reduces to one
    count per language before any of the mixing math runs.

    Parity: weight literals are CAST AS DOUBLE in the oracle (DuckDB types
    bare `0.4` as DECIMAL(2,1)); ceil() is cast to BIGINT on both sides
    (Spark ceil(double)->BIGINT, DuckDB ceil(double)->DOUBLE); the
    double multiply/divide runs the same IEEE ops on identical operands.
    """
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("n_total"))
    weight = F.coalesce(
        F.create_map(
            *[
                F.lit(x)
                for lang, w in _MIX_WEIGHTS.items()
                for x in (lang, float(w))
            ]
        )[F.col("lang")],
        F.lit(0.0),
    )
    repeat = F.ceil(weight * F.col("n_total") / F.col("n_docs")).cast("long")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_docs",
            weight.alias("target_share"),
            repeat.alias("repeat_factor"),
            (F.col("n_docs") * repeat).cast("long").alias("planned_docs"),
        )
    )


@query(
    "llm_pii_scrub",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
               regexp_replace(text, '[0-9][0-9][0-9]+', '<NUM>', 'g'),
               '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g') AS scrubbed,
           (length(text) <> length(
               regexp_replace(
                   regexp_replace(text, '[0-9][0-9][0-9]+', '<NUM>', 'g'),
                   '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'))) AS was_scrubbed
    FROM documents
    """,
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern scrubbing: long digit runs and email-shaped tokens replaced
    by typed placeholder tags, plus a was-touched flag for audit counts.

    Patterns restricted to the syntax subset where Java regex (Spark) and
    RE2 (DuckDB) agree — character classes, + and explicit repetition; no
    backreferences or lookaround. Spark's regexp_replace is global by
    default; DuckDB needs the explicit 'g' flag. Stateless projection:
    whole-stage codegen, zero exchanges at any scale.
    """
    d = load(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", "[0-9][0-9][0-9]+", "<NUM>"),
        "[a-z0-9._]+@[a-z0-9.]+",
        "<EMAIL>",
    )
    return d.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        (F.length("text") != F.length(scrubbed)).alias("was_scrubbed"),
    )


@query(
    "llm_text_normalize",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               '  +', ' ', 'g')) AS norm_text,
           CAST(length(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               '  +', ' ', 'g'))) AS INT) AS norm_chars
    FROM documents
    """,
)
def llm_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization: lowercase → strip non-alphanumerics →
    collapse runs of spaces → trim. The standard pre-dedup canonical form
    (llm_dedup_exact hashes a lighter variant of this; here the full chain
    is exposed as its own operator so downstream stages can share it).
    Stateless projection — codegen'd, shuffle-free.
    """
    d = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            "  +",
            " ",
        )
    )
    return d.select(
        "doc_id", norm.alias("norm_text"), F.length(norm).alias("norm_chars")
    )


@query(
    "llm_quality_filter",
    oracle="""
    WITH thresholds AS (
        SELECT lang,
               quantile_cont(CAST(len(str_split(text, ' ')) AS DOUBLE), 0.25)
                   AS tok_p25
        FROM documents
        GROUP BY lang
    )
    SELECT d.doc_id, d.lang,
           CAST(len(str_split(d.text, ' ')) AS BIGINT) AS n_tokens
    FROM documents d
    JOIN thresholds t ON d.lang = t.lang
    WHERE CAST(len(str_split(d.text, ' ')) AS DOUBLE) > t.tok_p25
    """,
)
def llm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-gated quality filter: keep documents strictly above their
    language's 25th-percentile token count.

    The thresholds are an exact interpolated quantile per language —
    a 5-row aggregate — broadcast back onto the corpus. At 100 TB this is
    two scans and zero doc-keyed shuffles: the alternative single-pass
    form (percentile over a Window partitioned by lang) shuffles the whole
    table; a 5-row broadcast is strictly better. Both engines interpolate
    quantiles linearly over doubles (Spark percentile ≡ DuckDB
    quantile_cont) and the > comparison runs on the identical double.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("double")
    thresholds = d.groupBy("lang").agg(
        F.expr(
            "percentile(CAST(size(split(text, ' ')) AS DOUBLE), 0.25)"
        ).alias("tok_p25")
    )
    return (
        d.join(F.broadcast(thresholds), "lang")
        .filter(toks > F.col("tok_p25"))
        .select("doc_id", "lang", toks.cast("long").alias("n_tokens"))
    )


@query(
    "llm_dedup_incremental",
    oracle="""
    WITH existing AS (
        SELECT DISTINCT md5(lower(trim(text))) AS h
        FROM documents WHERE doc_id < 250 AND text IS NOT NULL
    ), batch AS (
        SELECT doc_id, md5(lower(trim(text))) AS h
        FROM documents WHERE doc_id >= 250 AND text IS NOT NULL
    ), fresh AS (
        SELECT b.doc_id, b.h FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.h = b.h)
    )
    SELECT doc_id, h AS content_hash FROM fresh f
    WHERE doc_id = (SELECT MIN(f2.doc_id) FROM fresh f2 WHERE f2.h = f.h)
    """,
)
def llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: admit only new-batch documents whose canonical
    content hash is absent from the existing corpus AND first-of-hash
    within the batch (min doc_id wins — deterministic).

    This is the steady-state shape of corpus dedup at scale: the existing
    corpus is a hash index scanned once per ingest; the anti join and the
    within-batch argmin both key on the uniform content hash, so the
    shuffles are balanced by construction. The batch side is typically
    ~1/1000 of the corpus — with a hash-bucketed existing index the anti
    join becomes a co-located probe, no corpus reshuffle (the bucketing
    recipe is tests/test_bucketing.py).
    """
    # NULL text has no content hash: a content-dedup operator must not
    # admit failed fetches (Spark's groupBy would otherwise collapse ALL
    # of them into one NULL-hash group and admit one, where the oracle's
    # correlated MIN drops NULL-hash rows — divergent AND wrong).
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    hashed = d.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash")
    )
    existing = hashed.filter(F.col("doc_id") < 250).select("content_hash").distinct()
    batch = hashed.filter(F.col("doc_id") >= 250)
    fresh = batch.join(existing, "content_hash", "left_anti")
    keep = fresh.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    return keep.select("doc_id", "content_hash")


# Training-sequence packing: concatenate the corpus in a deterministic
# order and chunk it into fixed-length token sequences. SEQ_LEN is the
# model context length; N shards = 16 (one per hex digit of the md5 shard
# key) so the packing window parallelizes.
PACK_SEQ_LEN = 2048


@query(
    "llm_pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, shard, n_tokens,
               CAST(SUM(n_tokens) OVER (
                    PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tokens AS BIGINT) AS cum_before
        FROM t
    )
    SELECT doc_id, shard, n_tokens,
           CAST(cum_before // {PACK_SEQ_LEN} AS BIGINT) AS pack_id,
           CAST(cum_before % {PACK_SEQ_LEN} AS BIGINT) AS pack_offset
    FROM c
    """,
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: concatenate documents in
    deterministic (shard, doc_id) order and chunk the token stream into
    fixed SEQ_LEN sequences; emit each document's pack number and starting
    offset within its pack. Documents straddle pack boundaries — exactly
    how causal-LM pretraining packs corpora (concatenate-then-chunk), so
    every pack except each shard's tail is fully dense.

    No reference precedent (north star, BASELINE.json). Scale design: a
    single global ORDER BY would serialize the window into one partition,
    so the corpus is sharded by the first hex digit of md5(doc_id) — 16
    independent, deterministic, uniformly-sized streams, each packed by a
    running-sum window. At 100 TB: one hash-shuffle on the shard key, one
    in-partition sort, no skew (md5 is uniform); widen the shard key to
    2+ hex chars (256/4096 streams) to match executor count. The
    downstream writer turns (pack_id, pack_offset) into the actual token
    slices — layout metadata, not data movement.
    """
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn(
        "cum_before", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    )
    return c.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.expr(f"CAST(cum_before DIV {PACK_SEQ_LEN} AS BIGINT)").alias("pack_id"),
        F.expr(f"CAST(cum_before % {PACK_SEQ_LEN} AS BIGINT)").alias("pack_offset"),
    )


N_EPOCHS = 3


@query(
    "llm_epoch_shuffle",
    oracle=f"""
    WITH e AS (
        SELECT doc_id,
               CAST(unnest(range({N_EPOCHS})) AS BIGINT) AS epoch
        FROM documents
    ), k AS (
        SELECT doc_id, epoch,
               md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)) AS sort_key
        FROM e
    )
    SELECT doc_id, epoch,
           substring(sort_key, 1, 1) AS shard,
           CAST(row_number() OVER (
                PARTITION BY epoch, substring(sort_key, 1, 1)
                ORDER BY sort_key) AS BIGINT) AS pos
    FROM k
    """,
)
def llm_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-deterministic corpus shuffle: each training epoch gets its own
    reproducible pseudo-random permutation by ranking documents on
    md5(doc_id ':' epoch) — re-runnable on any partition layout, no RNG
    state, different order every epoch (the shuffle-between-epochs that
    pretraining dataloaders need, computed engine-side).

    No reference precedent (north star, BASELINE.json); generalizes the
    reference's deterministic hash-key discipline
    (dags/bpi_etl/bpi_etl_bigquery.py:16-19, R8) from write prefixes to
    epoch ordering. Scale design: ranking globally would range-partition
    and sort the whole corpus per epoch; instead the hash key's first hex
    digit shards each epoch into 16 uniform streams ranked independently —
    one hash-shuffle, in-partition sorts, no global order. Readers consume
    (epoch, shard, pos) streams round-robin, which is exactly how sharded
    dataloaders iterate.
    """
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    e = d.select(
        "doc_id",
        F.explode(F.array([F.lit(i).cast("long") for i in range(N_EPOCHS)])).alias(
            "epoch"
        ),
    )
    k = e.withColumn(
        "sort_key",
        F.md5(
            F.concat_ws(
                ":", F.col("doc_id").cast("string"), F.col("epoch").cast("string")
            )
        ),
    ).withColumn("shard", F.substring("sort_key", 1, 1))
    w = Window.partitionBy("epoch", "shard").orderBy("sort_key")
    return k.select(
        "doc_id",
        "epoch",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


# RAG/context-window chunking: fixed-size character windows with overlap.
CHUNK_SIZE = 200
CHUNK_OVERLAP = 50
CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP


@query(
    "llm_chunk_documents",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, text,
               unnest(range(1, greatest(length(text), 1) + 1, {CHUNK_STRIDE}))
                   AS start
        FROM documents
    )
    SELECT doc_id,
           CAST((start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(start AS BIGINT) AS start,
           md5(substring(text, start, {CHUNK_SIZE})) AS chunk_md5,
           CAST(length(substring(text, start, {CHUNK_SIZE})) AS BIGINT)
               AS chunk_len
    FROM s
    """,
)
def llm_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking: fixed CHUNK_SIZE-character windows advancing by
    CHUNK_STRIDE (so consecutive chunks share CHUNK_OVERLAP characters) —
    the standard splitter feeding embedding/RAG indexes and
    context-window-bounded training examples.

    No reference precedent (north star, BASELINE.json). Pure JVM array
    expressions — sequence → explode → substring — one narrow projection,
    zero shuffles, runs at scan throughput inside whole-stage codegen at
    any corpus size. Chunk text is emitted as md5 + length (the
    differential gate never hashes megabyte strings; downstream writers
    re-slice by (doc_id, start), which is layout metadata, not data
    movement). Both engines slice CHARACTERS with 1-based substring and
    truncate at end-of-string, so hashes agree exactly; empty docs emit
    one empty-window row (greatest(len,1)) rather than disappearing."""
    d = load(spark, sf_dir, "documents")
    starts = F.expr(
        f"sequence(1, greatest(length(text), 1), {CHUNK_STRIDE})"
    )
    s = d.select("doc_id", "text", F.explode(starts).alias("start"))
    chunk = F.substring(F.col("text"), F.col("start"), F.lit(CHUNK_SIZE))
    return s.select(
        "doc_id",
        ((F.col("start") - 1) / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start"),
        F.md5(chunk).alias("chunk_md5"),
        F.length(chunk).cast("long").alias("chunk_len"),
    )


# Deterministic 3-way corpus split: lexicographic md5-hex thresholds (the
# llm_sample_hash trick): 'e6'/0x100 = 90.2% train, up to 'f3' = 5.1% val,
# rest test. Salted with ':split' so membership is independent of every
# other hash-threshold operator.
SPLIT_TRAIN_MAX = "e6"
SPLIT_VAL_MAX = "f3"


@query(
    "llm_split_train_eval",
    oracle=f"""
    WITH k AS (
        SELECT doc_id,
               substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) AS h
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN h < '{SPLIT_TRAIN_MAX}' THEN 'train'
                WHEN h < '{SPLIT_VAL_MAX}' THEN 'val'
                ELSE 'test' END AS split
    FROM k
    """,
)
def llm_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~90/5/5) by salted
    content-key hash — the split that survives reprocessing: membership is
    a pure function of doc_id, so re-runs, backfills, and incremental
    ingests can never leak a val/test document into train (the leakage
    failure mode of random splits re-drawn per run; complements
    llm_decontaminate, which guards against TEXT-level leakage).

    Zero-shuffle scan projection, same scale story as llm_sample_hash;
    downstream writers partition by the split column."""
    d = load(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))), 1, 2
    )
    return d.select(
        "doc_id",
        F.when(h < SPLIT_TRAIN_MAX, "train")
        .when(h < SPLIT_VAL_MAX, "val")
        .otherwise("test")
        .alias("split"),
    )


CURATE_MIN_TOKENS = 5
CURATE_MAX_TOKENS = 4096


@query(
    "pipeline_curate_corpus",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   '  +', ' ', 'g')) AS norm_text
        FROM documents
    ), gated AS (
        SELECT doc_id, norm_text,
               CAST(len(str_split(norm_text, ' ')) AS BIGINT) AS n_tokens
        FROM norm
        WHERE len(str_split(norm_text, ' '))
              BETWEEN {CURATE_MIN_TOKENS} AND {CURATE_MAX_TOKENS}
    ), kept AS (
        SELECT md5(norm_text) AS h,
               MIN(doc_id) AS doc_id,
               MIN(n_tokens) AS n_tokens
        FROM gated GROUP BY md5(norm_text)
    ), tagged AS (
        SELECT doc_id, n_tokens,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2)
                         < '{SPLIT_TRAIN_MAX}' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2)
                         < '{SPLIT_VAL_MAX}' THEN 'val'
                    ELSE 'test' END AS split,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard
        FROM kept
    ), packed AS (
        SELECT doc_id, split, shard, n_tokens,
               CAST(SUM(n_tokens) OVER (
                    PARTITION BY split, shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tokens AS BIGINT) AS cum_before
        FROM tagged
    )
    SELECT doc_id, split, shard, n_tokens,
           CAST(cum_before // {PACK_SEQ_LEN} AS BIGINT) AS pack_id,
           CAST(cum_before % {PACK_SEQ_LEN} AS BIGINT) AS pack_offset
    FROM packed
    """,
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation operators COMPOSED into one declarative plan — the
    proof that a user can run their whole pre-training data pipeline as a
    single Catalyst-optimized query: normalize → token-count gate → exact
    dedup (first-of-hash) → leakage-proof split assignment → per-(split,
    shard) sequence packing. One row per surviving document with its
    training placement.

    Scale shape: the only exchanges are the dedup hash agg (uniform md5
    key) and the (split, shard) window shuffle — everything else fuses
    into the scan projection. Catalyst pipelines the stages; no
    materialization between them (contrast with an Airflow-style
    stage-per-task pipeline writing intermediates — the reference's shape
    — which at 100 TB costs a full write+read per stage).

    Stage-order subtlety (measured, 3× at 8× volume): md5(norm) and
    size(split(norm)) live in ONE projection, where codegen subexpression
    elimination computes the 2-regex normalize chain once — but a
    token-gate filter BEFORE the dedup agg gets predicate-pushed below
    that projection and each pushed conjunct re-inlines the whole chain
    (observed: 3 evaluations/row, 6.5 s vs 2.1 s at 8×·sf0.1). The gate
    therefore runs AFTER the dedup aggregation — provably equivalent
    (every doc in a hash group shares one norm_text, hence one n_tokens:
    groups pass or fail atomically; the oracle keeps the gate-then-dedup
    order as the cross-engine proof of equivalence) — where a predicate
    on an aggregated column cannot be pushed into the chain."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            "  +",
            " ",
        )
    )
    feats = d.select(
        "doc_id",
        F.md5(norm).alias("h"),
        F.size(F.split(norm, " ")).cast("long").alias("n_tokens"),
    )
    kept = (
        feats.groupBy("h")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .filter(
            (F.col("n_tokens") >= CURATE_MIN_TOKENS)
            & (F.col("n_tokens") <= CURATE_MAX_TOKENS)
        )
    )
    sh = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))), 1, 2
    )
    tagged = kept.select(
        "doc_id",
        "n_tokens",
        F.when(sh < SPLIT_TRAIN_MAX, "train")
        .when(sh < SPLIT_VAL_MAX, "val")
        .otherwise("test")
        .alias("split"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("shard"),
    )
    w = (
        Window.partitionBy("split", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = tagged.withColumn(
        "cum_before", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    )
    return packed.select(
        "doc_id",
        "split",
        "shard",
        "n_tokens",
        (F.col("cum_before") / PACK_SEQ_LEN).cast("long").alias("pack_id"),
        (F.col("cum_before") % PACK_SEQ_LEN).cast("long").alias("pack_offset"),
    )


DOMAIN_CAP = 40


@query(
    "llm_domain_cap",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source,
               CAST(len(str_split(text, ' ')) AS INT) AS n_tokens,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY len(str_split(text, ' ')) DESC, doc_id
               ) AS INT) AS rank_in_source
        FROM documents
    )
    SELECT doc_id, source, n_tokens, rank_in_source
    FROM ranked WHERE rank_in_source <= {DOMAIN_CAP}
    """,
)
def llm_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document caps — the RefinedWeb/C4 anti-domination rule:
    no single source may contribute more than DOMAIN_CAP documents, and
    the slots go to the longest documents first (deterministic doc_id
    tie-break). Keeps one crawl domain, one wiki mirror, or one boilerplate
    farm from owning the training mix after dedup (the volume-side
    complement of llm_corpus_mix's proportion targets).

    Scale shape: row_number + rank filter plans as WindowGroupLimit —
    each map task keeps only its local top-CAP per source BEFORE the
    exchange, so the shuffle carries ≤ CAP·sources·partitions rows, not
    the corpus (the win_topk_group property, here on the curation path).
    A skewed source costs its cap, not its row count.
    """
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    w = Window.partitionBy("source").orderBy(
        n_tokens.desc(), F.col("doc_id").asc()
    )
    return (
        d.select(
            "doc_id",
            "source",
            n_tokens.cast("int").alias("n_tokens"),
            F.row_number().over(w).alias("rank_in_source"),
        )
        .filter(F.col("rank_in_source") <= DOMAIN_CAP)
    )


_TEMP_T = 0.7  # temperature < 1 flattens the source distribution


@query(
    "llm_sample_temperature",
    oracle=f"""
    WITH counts AS (
        SELECT source, count(*) AS n_s FROM documents GROUP BY source
    ), tot AS (
        SELECT sum(n_s) AS n FROM counts
    ), weighted AS (
        SELECT source, n_s,
               CAST(pow(CAST(n_s AS DOUBLE) / n, {_TEMP_T}) AS DECIMAL(18,9))
                   AS pw,
               CAST(n_s AS DOUBLE) / n AS w
        FROM counts, tot
    ), z AS (
        SELECT sum(pw) AS zsum FROM weighted
    ), ratios AS (
        SELECT source, n_s, w,
               (CAST(pw AS DOUBLE) / CAST(zsum AS DOUBLE)) / w AS r
        FROM weighted, z
    ), accepts AS (
        SELECT source, n_s,
               LEAST(CAST(floor((r / (SELECT max(r) FROM ratios))
                                * 4294967296.0) AS BIGINT),
                     4294967295) AS thr_int
        FROM ratios
    )
    SELECT d.doc_id, d.source,
           CAST(a.thr_int AS DOUBLE) / 4294967296.0 AS accept_rate
    FROM documents d JOIN accepts a ON d.source = a.source
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
          < lower(lpad(to_hex(a.thr_int), 8, '0'))
    """,
)
def llm_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source resampling (the multilingual-corpus
    rebalancing rule of mBERT/XLM-R/mT5: sample source s with probability
    ∝ (share_s)^T, T<1 boosting the tail). Acceptance rate per source is
    the target share over the natural share, scaled so the most
    over-boosted source keeps everything; membership is the same
    deterministic md5-threshold draw as llm_sample_hash, so the sample is
    reproducible on any cluster layout.

    Scale shape: two tiny aggregates (per-source counts — |sources| rows)
    and ONE broadcast join back onto the corpus; the fact table never
    shuffles. The draw is a pure filter on md5(doc_id).

    Parity: counts and their ratios are exact (integer counts, single
    IEEE divisions); the one libm call (pow) is quantized through
    DECIMAL(18,9) on both sides before the order-insensitive decimal sum;
    the acceptance threshold becomes an INTEGER number of 2^-32 quanta
    compared against the first 8 md5 hex digits as strings — no float
    comparison at the decision edge. The LEAST(…, 2^32-1) cap costs one
    draw in 4·10^9 of acceptance for full-keep sources, identically in
    both engines.
    """
    d = load(spark, sf_dir, "documents")
    # Control-plane frame: |sources| rows. localCheckpoint it so the
    # tot/z/rmax chain of tiny cross-joined aggregates reuses ONE
    # materialized pass over the corpus — without it every crossJoin
    # re-derives counts from lineage and the plan scans documents 8×
    # (observed), which at 100 TB is 6 needless full scans.
    counts = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_s"))
        .localCheckpoint(eager=True)
    )
    tot = counts.agg(F.sum("n_s").alias("n"))
    weighted = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        F.expr(
            f"CAST(pow(CAST(n_s AS DOUBLE) / n, {_TEMP_T}) AS DECIMAL(18,9))"
        ).alias("pw"),
        F.expr("CAST(n_s AS DOUBLE) / n").alias("w"),
    )
    z = weighted.agg(F.sum("pw").alias("zsum"))
    ratios = weighted.crossJoin(F.broadcast(z)).select(
        "source",
        "n_s",
        F.expr("(CAST(pw AS DOUBLE) / CAST(zsum AS DOUBLE)) / w").alias("r"),
    )
    rmax = ratios.agg(F.max("r").alias("rmax"))
    accepts = ratios.crossJoin(F.broadcast(rmax)).select(
        "source",
        F.expr(
            "LEAST(CAST(floor((r / rmax) * 4294967296.0D) AS BIGINT),"
            " 4294967295L)"
        ).alias("thr_int"),
    )
    u_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    thr_hex = F.lower(F.lpad(F.expr("hex(thr_int)"), 8, "0"))
    return (
        d.join(F.broadcast(accepts), "source")
        .filter(u_hex < thr_hex)
        .select(
            "doc_id",
            "source",
            (F.col("thr_int").cast("double") / F.lit(4294967296.0)).alias(
                "accept_rate"
            ),
        )
    )


WEIGHTED_SAMPLE_K = 100


@query(
    "llm_sample_weighted",
    oracle=f"""
    WITH drawn AS (
        SELECT doc_id, source, n_chars,
               CAST(-ln(
                   (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8)) AS BIGINT) + 1.0)
                   / 4294967297.0)
                   / n_chars AS DECIMAL(30,12)) AS priority
        FROM documents
        WHERE n_chars > 0
    )
    SELECT doc_id, source, n_chars,
           CAST(priority AS DOUBLE) AS priority
    FROM drawn
    ORDER BY priority, doc_id
    LIMIT {WEIGHTED_SAMPLE_K}
    """,
)
def llm_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
    each document draws priority −ln(u)/w from the deterministic md5
    uniform u and weight w (n_chars — longer docs proportionally more
    likely); the global k smallest priorities ARE a weighted sample
    without replacement. The quality-weighted corpus subsample every
    data-mixing recipe needs, reproducible on any cluster layout.

    Scale shape: one zero-shuffle projection + TakeOrderedAndProject —
    each partition keeps its local top-k, the driver merges k·partitions
    candidates; no global sort, no shuffle of the corpus.

    Parity: u = (hex64(md5)+1)/2^32+1 is exact integer arithmetic into
    one IEEE division; ln is libm-identical on identical doubles; the
    priority is quantized through DECIMAL(30,12): at priority
    magnitudes ~1e-4, a 1e-18 quantum sat only ~100 ulp wide and the
    engines' double→decimal conversions disagreed near half-quantum
    boundaries (~1% of rows — observed); 1e-12 keeps the boundary
    ~1e8 ulp away while still separating every distinct draw, so the
    RANKING both engines sort on is identical exact values, tie-pinned
    by doc_id.
    """
    # A-Res convention (r8 zerovec probe): a zero-weight item (empty
    # document, n_chars = 0) is NEVER drawn — its priority -ln(u)/0 is
    # +inf by limit and an ANSI crash literally; exclude it from the
    # draw in both engines.
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u_int = F.expr(
        "conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
    ).cast("bigint")
    priority = F.expr(
        "CAST(-ln((conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
        " + 1.0D) / 4294967297.0D) / n_chars AS DECIMAL(30,12))"
    )
    return (
        d.select(
            "doc_id",
            "source",
            "n_chars",
            priority.alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(WEIGHTED_SAMPLE_K)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("priority").cast("double").alias("priority"),
        )
    )


MASK_RATE_HEX = "26"  # first 2 md5 hex chars < 0x26 ≈ 15% of positions


@query(
    "llm_mask_tokens",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, str_split(text, ' ') AS ts FROM documents
    )
    SELECT doc_id,
           array_to_string(
               list_transform(
                   list_zip(ts, range(1, len(ts) + 1)),
                   p -> CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)
                                      || ':' || CAST(p[2] AS VARCHAR)),
                                  1, 2) < '{MASK_RATE_HEX}'
                             THEN '<MASK>' ELSE p[1] END),
               ' ') AS masked_text,
           CAST(len(list_filter(
               range(1, len(ts) + 1),
               i -> substring(md5(CAST(doc_id AS VARCHAR)
                              || ':' || CAST(i AS VARCHAR)), 1, 2)
                    < '{MASK_RATE_HEX}')) AS BIGINT) AS n_masked
    FROM toks
    """,
)
def llm_mask_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked-LM data prep: ~15% of token positions per document become
    <MASK>, chosen by the deterministic md5 draw over (doc_id, position)
    — the BERT-style corruption pass, reproducible on any cluster layout
    and across epochs (the epoch id would simply join the hash input).

    Scale shape: a zero-shuffle projection — the split/transform/rejoin
    runs entirely inside whole-stage codegen over one scan; no token
    ever leaves its row.

    Parity: pure string/array surgery with an identical hash draw; the
    masked text and count are exact in both engines (Spark transform
    exposes the element index directly; DuckDB zips an explicit range —
    both 1-based here).
    """
    d = load(spark, sf_dir, "documents")
    mask_cond = (
        f"substring(md5(CAST(doc_id AS STRING) || ':' || CAST({{i}} AS STRING)),"
        f" 1, 2) < '{MASK_RATE_HEX}'"
    )
    masked = F.expr(
        "array_join(transform(split(text, ' '),"
        " (x, i) -> CASE WHEN "
        + mask_cond.format(i="i + 1")
        + " THEN '<MASK>' ELSE x END), ' ')"
    )
    n_masked = F.expr(
        "CAST(size(filter(sequence(1, size(split(text, ' '))),"
        " i -> " + mask_cond.format(i="i") + ")) AS BIGINT)"
    )
    return d.select(
        "doc_id",
        masked.alias("masked_text"),
        n_masked.alias("n_masked"),
    )


FEATURE_LOOKBACK_SECONDS = 7 * 86400  # point-in-time feature horizon


@query(
    "llm_training_examples",
    oracle=f"""
    WITH labels AS (
        SELECT user_id, event_id AS label_id, ts AS label_ts
        FROM events WHERE event_type = 'purchase'
    ), hist AS (
        SELECT l.label_id, l.user_id, l.label_ts,
               e.event_type, e.value, e.ts, e.event_id
        FROM labels l JOIN events e
          ON e.user_id = l.user_id
         AND e.ts < l.label_ts
         AND e.ts >= l.label_ts - INTERVAL {FEATURE_LOOKBACK_SECONDS} SECOND
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY label_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM hist
    )
    SELECT label_id, user_id,
           strftime(label_ts, '%Y-%m-%d %H:%M:%S') AS label_ts,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_views_7d,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicks_7d,
           CAST(count(*) AS BIGINT) AS n_events_7d,
           MAX(CASE WHEN rn = 1 THEN value END) AS last_value_before
    FROM ranked
    GROUP BY label_id, user_id, label_ts
    """,
)
def llm_training_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct training-example assembly: every purchase is
    a label row, and its features (7-day view/click counts, last observed
    value) are computed ONLY from events strictly before the label
    timestamp — the feature-store discipline that prevents label leakage,
    the #1 silent killer of trained models (a feature computed "as of
    now" instead of "as of label time" trains on the future and dies in
    production).

    Scale shape: one user-keyed equi-join with the lookback band as
    residual (never a cross join; per-label fanout is bounded by one
    user's 7-day activity), then ONE grouped aggregate per label — the
    last-value feature rides max_by with a unique (ts, event_id) pick
    struct, O(1) state, so no per-label window sort exists in the Spark
    plan (the oracle uses the rank formulation — independently shaped).
    At 100 TB both sides are user-partitioned by the join exchange and a
    hot user takes the funnel_windowed_salted treatment.

    Parity: counts are exact integers over exact timestamp comparisons
    (microsecond integers under the hood); the picked feature value is a
    raw input double — no arithmetic, no quantization needed.
    """
    ev = load(spark, sf_dir, "events")
    labels = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("label_id"),
            F.col("ts").alias("label_ts"),
        )
        .alias("l")
    )
    feats = ev.select(
        "user_id", "event_type", "value", "ts", "event_id"
    ).alias("e")
    hist = labels.join(
        feats,
        (F.col("l.user_id") == F.col("e.user_id"))
        & (F.col("e.ts") < F.col("l.label_ts"))
        & (
            F.col("e.ts")
            >= F.col("l.label_ts")
            - F.expr(f"INTERVAL {FEATURE_LOOKBACK_SECONDS} SECOND")
        ),
    ).select(
        "l.label_id",
        F.col("l.user_id").alias("user_id"),
        "l.label_ts",
        "e.event_type",
        "e.value",
        F.col("e.ts").alias("ts"),
        F.col("e.event_id").alias("event_id"),
    )
    pick = F.struct("ts", "event_id")
    return hist.groupBy("label_id", "user_id", "label_ts").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("n_views_7d"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n_clicks_7d"),
        F.count(F.lit(1)).alias("n_events_7d"),
        F.max_by("value", pick).alias("last_value_before"),
    ).select(
        "label_id",
        "user_id",
        F.date_format("label_ts", "yyyy-MM-dd HH:mm:ss").alias("label_ts"),
        "n_views_7d",
        "n_clicks_7d",
        "n_events_7d",
        "last_value_before",
    )


# Preference-pair construction: shard fanout bounds every rank window.
PREF_SHARDS = 8


@query(
    "llm_preference_pairs",
    oracle=f"""
    WITH sharded AS (
        SELECT doc_id, source, n_chars,
               CAST((strpos('0123456789abcdef',
                            substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
                    % {PREF_SHARDS} AS INTEGER) AS shard
        FROM documents
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY source, shard
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM sharded
    ), paired AS (
        SELECT source, shard, CAST((rn - 1) // 2 AS BIGINT) AS pair_id,
               doc_id, n_chars, rn
        FROM ranked
    )
    SELECT source, shard, pair_id,
           MAX(CASE WHEN rn % 2 = 1 THEN doc_id END) AS chosen_doc_id,
           MAX(CASE WHEN rn % 2 = 0 THEN doc_id END) AS rejected_doc_id,
           MAX(CASE WHEN rn % 2 = 1 THEN n_chars END) AS chosen_chars,
           MAX(CASE WHEN rn % 2 = 0 THEN n_chars END) AS rejected_chars,
           MAX(CASE WHEN rn % 2 = 1 THEN n_chars END)
               - MAX(CASE WHEN rn % 2 = 0 THEN n_chars END) AS margin
    FROM paired
    GROUP BY source, shard, pair_id
    HAVING count(*) = 2
    """,
)
def llm_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLHF/DPO preference-pair assembly: within each (source, shard)
    stratum, rank documents by a quality signal and pair adjacent ranks —
    chosen = the higher-scored of each pair, rejected = its neighbor,
    margin = the score gap. Adjacent-rank pairing is the standard
    hard-pair recipe (maximally confusable negatives teach the reward
    model more than random ones); the quality signal here is the n_chars
    column (swap in llm_quality_ensemble's score in production — the
    pairing mechanics are identical).

    Scale shape: the rank window partitions by (source, shard) where
    shard is an md5 draw on doc_id — PREF_SHARDS is the fanout dial that
    bounds every window partition regardless of corpus size (the same
    bounded-window stance as llm_pack_sequences' shards); pairing then
    collapses via ONE grouped aggregate on the same keys (no self-join,
    no second shuffle — the group key extends the window key, so AQE
    reuses the partitioning). Incomplete tail pairs drop via HAVING.

    Parity: ranking is tie-pinned by doc_id, shard is an exact md5-hex
    digit mod, and every output is an integer or string — no floats
    anywhere."""
    d = load(spark, sf_dir, "documents")
    sharded = d.select(
        "doc_id",
        "source",
        "n_chars",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
                16,
                10,
            ).cast("int")
            % PREF_SHARDS
        ).alias("shard"),
    )
    w = Window.partitionBy("source", "shard").orderBy(
        F.desc("n_chars"), "doc_id"
    )
    ranked = sharded.withColumn("rn", F.row_number().over(w))
    paired = ranked.withColumn(
        "pair_id", ((F.col("rn") - 1) / 2).cast("long")
    )
    odd = F.col("rn") % 2 == 1
    return (
        paired.groupBy("source", "shard", "pair_id")
        .agg(
            F.max(F.when(odd, F.col("doc_id"))).alias("chosen_doc_id"),
            F.max(F.when(~odd, F.col("doc_id"))).alias("rejected_doc_id"),
            F.max(F.when(odd, F.col("n_chars"))).alias("chosen_chars"),
            F.max(F.when(~odd, F.col("n_chars"))).alias("rejected_chars"),
            F.count(F.lit(1)).alias("n_in_pair"),
        )
        .filter(F.col("n_in_pair") == 2)
        .select(
            "source",
            "shard",
            "pair_id",
            "chosen_doc_id",
            "rejected_doc_id",
            "chosen_chars",
            "rejected_chars",
            (F.col("chosen_chars") - F.col("rejected_chars")).alias(
                "margin"
            ),
        )
    )


@query(
    "llm_dataset_diff",
    oracle="""
    WITH v1 AS (
        SELECT doc_id, source, n_chars, md5(text) AS h
        FROM documents WHERE doc_id % 10 <> 0
    ), v2 AS (
        SELECT doc_id, source, n_chars,
               md5(CASE WHEN doc_id % 7 = 0
                        THEN text || ' [rev2]' ELSE text END) AS h
        FROM documents WHERE doc_id % 10 <> 5
    ), j AS (
        SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
               coalesce(v1.source, v2.source) AS source,
               coalesce(v2.n_chars, v1.n_chars) AS n_chars,
               CASE WHEN v1.doc_id IS NULL THEN 'added'
                    WHEN v2.doc_id IS NULL THEN 'removed'
                    WHEN v1.h <> v2.h THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    )
    SELECT status, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM j GROUP BY status, source
    """,
)
def llm_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff: compare two corpus snapshots and report
    added / removed / changed / unchanged volumes per source — the audit
    every training-data release needs before retraining ("what actually
    changed since the last snapshot, and where?"). Snapshots are derived
    deterministically from documents (v1 drops doc_id%10==0, v2 drops
    %10==5 and revises the text of %7==0) so all four statuses appear at
    any SF.

    Scale shape: ONE co-partitioned full-outer join on the primary key
    comparing CONTENT HASHES — the text itself never shuffles (md5
    computes map-side in each snapshot's projection; only (doc_id, 16
    bytes, source, n_chars) cross the exchange), then a tiny
    status×source rollup. At 100 TB this is the cheapest possible diff:
    two scans, one key-partitioned exchange each, and partition-level
    stats could skip wholly-identical files before the join.

    Parity: md5 agrees across engines byte-for-byte; statuses are exact
    string picks; all measures are integer counts/sums/extrema."""
    d = load(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", "source", "n_chars", F.md5("text").alias("h")
    ).alias("v1")
    v2 = d.filter(F.col("doc_id") % 10 != 5).select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" [rev2]"))
            ).otherwise(F.col("text"))
        ).alias("h"),
    ).alias("v2")
    j = v1.join(v2, F.col("v1.doc_id") == F.col("v2.doc_id"), "full_outer")
    status = (
        F.when(F.col("v1.doc_id").isNull(), F.lit("added"))
        .when(F.col("v2.doc_id").isNull(), F.lit("removed"))
        .when(F.col("v1.h") != F.col("v2.h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    rows = j.select(
        F.coalesce("v1.doc_id", "v2.doc_id").alias("doc_id"),
        F.coalesce("v1.source", "v2.source").alias("source"),
        F.coalesce("v2.n_chars", "v1.n_chars").alias("n_chars"),
        status.alias("status"),
    )
    return rows.groupBy("status", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


# Span corruption: block-grid span starts keep spans disjoint by
# construction. 8-token blocks, 25% corrupted, span length 1-3 tokens.
SPAN_BLOCK = 8
SPAN_RATE_HEX = "40"  # 0x40/0x100 = 25% of blocks


def _span_corrupt_duck(b: str) -> str:
    return (
        f"substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST({b} AS VARCHAR))"
        f", 1, 2) < '{SPAN_RATE_HEX}'"
    )


def _span_len_duck(b: str) -> str:
    return (
        "1 + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)"
        f" || '#' || CAST({b} AS VARCHAR)), 3, 1)) - 1) % 3"
    )


@query(
    "llm_span_corruption",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        WHERE text IS NOT NULL
    ), s AS (
        SELECT doc_id, toks, len(toks) AS n,
               (len(toks) + {SPAN_BLOCK} - 1) // {SPAN_BLOCK} AS nblocks
        FROM t
    )
    SELECT doc_id,
      coalesce(array_to_string(list_filter(list_transform(range(1, n + 1),
        i -> CASE WHEN {_span_corrupt_duck('(i - 1) // %d' % SPAN_BLOCK)}
             THEN CASE
               WHEN (i - 1) % {SPAN_BLOCK} = 0 THEN '<extra_id_' || CAST(
                 len(list_filter(range(0, (i - 1) // {SPAN_BLOCK}), b ->
                   {_span_corrupt_duck('b')})) AS VARCHAR) || '>'
               WHEN (i - 1) % {SPAN_BLOCK}
                    < {_span_len_duck('(i - 1) // %d' % SPAN_BLOCK)}
                 THEN NULL
               ELSE toks[i] END
             ELSE toks[i] END), x -> x IS NOT NULL), ' '), '')
          AS corrupted_text,
      coalesce(array_to_string(list_filter(list_transform(range(0, nblocks),
        b -> CASE WHEN {_span_corrupt_duck('b')}
             THEN '<extra_id_' || CAST(
                 len(list_filter(range(0, b), bb ->
                   {_span_corrupt_duck('bb')})) AS VARCHAR)
                 || '> ' || array_to_string(
                   toks[b * {SPAN_BLOCK} + 1 :
                        b * {SPAN_BLOCK} + {_span_len_duck('b')}], ' ')
             END), x -> x IS NOT NULL), ' '), '') AS target_text,
      CAST(len(list_filter(range(0, nblocks), b ->
        {_span_corrupt_duck('b')})) AS BIGINT) AS n_spans
    FROM s
    """,
)
def llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/UL2-style span corruption: contiguous 1-3-token spans are
    replaced by numbered sentinels in the input and emitted (sentinel +
    original tokens) as the denoising target — the seq2seq pre-training
    recipe next to llm_mask_tokens' BERT-style single-token masking.
    Span starts live on an {SPAN_BLOCK}-token block grid (the md5 draw
    corrupts 25% of blocks; a second hex digit draws the length), so
    spans are disjoint BY CONSTRUCTION — no rejection sampling, and the
    draw is reproducible on any cluster layout (doc_id + block index is
    the whole seed).

    Scale shape: a zero-shuffle projection — token surgery, sentinel
    numbering (a prefix count over the ≤n/{SPAN_BLOCK} block ids), and
    target assembly all run inside whole-stage codegen over one scan;
    no token ever leaves its row.

    Parity: pure string/array surgery over an identical hash draw;
    Spark's transform exposes 0-based indices while the oracle zips an
    explicit 1-based range — same arithmetic after the shift. NULL text
    (failed fetch) is no training example: excluded on both sides rather
    than aligning the engines' disagreeing NULL renderings (Spark
    propagates NULL through array_join, DuckDB's coalesce prints '')."""
    corrupt = (
        "substring(md5(CAST(doc_id AS STRING) || '#' ||"
        " CAST({b} AS STRING)), 1, 2) < '" + SPAN_RATE_HEX + "'"
    )
    slen = (
        "1 + CAST(conv(substring(md5(CAST(doc_id AS STRING) || '#' ||"
        " CAST({b} AS STRING)), 3, 1), 16, 10) AS INT) % 3"
    )
    bk = f"(i DIV {SPAN_BLOCK})"
    sid = (
        f"size(filter(sequence(0, {bk}),"
        f" b -> b < {bk} AND " + corrupt.format(b="b") + "))"
    )
    masked = F.expr(
        "array_join(filter(transform(split(text, ' '), (x, i) ->"
        " CASE WHEN " + corrupt.format(b=bk) + " THEN CASE"
        f" WHEN i % {SPAN_BLOCK} = 0"
        f" THEN concat('<extra_id_', CAST({sid} AS STRING), '>')"
        f" WHEN i % {SPAN_BLOCK} < " + slen.format(b=bk) + " THEN NULL"
        " ELSE x END ELSE x END), x -> x IS NOT NULL), ' ')"
    )
    target = F.expr(
        "array_join(filter(transform("
        f" sequence(0, (size(split(text, ' ')) + {SPAN_BLOCK} - 1)"
        f" DIV {SPAN_BLOCK} - 1), b ->"
        " CASE WHEN " + corrupt.format(b="b") + " THEN concat("
        " '<extra_id_',"
        " CAST(size(filter(sequence(0, b), bb -> bb < b AND "
        + corrupt.format(b="bb")
        + ")) AS STRING), '> ',"
        f" array_join(slice(split(text, ' '), b * {SPAN_BLOCK} + 1,"
        " " + slen.format(b="b") + "), ' ')) END),"
        " x -> x IS NOT NULL), ' ')"
    )
    n_spans = F.expr(
        f"CAST(size(filter(sequence(0, (size(split(text, ' '))"
        f" + {SPAN_BLOCK} - 1) DIV {SPAN_BLOCK} - 1),"
        " b -> " + corrupt.format(b="b") + ")) AS BIGINT)"
    )
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select(
        "doc_id",
        masked.alias("corrupted_text"),
        target.alias("target_text"),
        n_spans.alias("n_spans"),
    )


# SFT chat-template rendering: instruction/response pairs are adjacent
# doc_ids (2k prompts 2k+1) from the same source — a deterministic
# stand-in for a real (prompt, completion) pairing key.
SFT_SYSTEM = "You are a helpful assistant."


@query(
    "llm_sft_format",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, text, source FROM documents WHERE doc_id % 2 = 0
    ), r AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
    ), paired AS (
        SELECT p.doc_id AS prompt_doc_id, r.doc_id AS response_doc_id,
               p.source,
               '<|system|>' || chr(10) || '{SFT_SYSTEM}' || chr(10) ||
               '<|user|>' || chr(10) || p.text || chr(10) ||
               '<|assistant|>' || chr(10) || r.text AS rendered,
               p.text AS ptext, r.text AS rtext
        FROM p JOIN r ON r.doc_id = p.doc_id + 1
    )
    SELECT CAST(prompt_doc_id // 2 AS BIGINT) AS example_id,
           prompt_doc_id, response_doc_id, source,
           CAST(length(ptext) AS BIGINT) AS n_chars_prompt,
           CAST(length(rtext) AS BIGINT) AS n_chars_response,
           CAST(length(rendered) AS BIGINT) AS n_chars_rendered,
           md5(rendered) AS rendered_md5
    FROM paired
    """,
)
def llm_sft_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT chat-template rendering: pair adjacent documents as
    (instruction, response), render the training string under a fixed
    chat template (system / user / assistant markers), and emit per-
    example audit columns — lengths and the md5 of the EXACT rendered
    bytes. The md5 is the point: template rendering is where SFT corpora
    silently fork (whitespace, marker spelling, separator placement), and
    a content hash both engines must reproduce pins every byte.

    Scale shape: one self-equi-join on the derived pairing key
    (response_id = prompt_id + 1) — both sides are id-partitioned scans
    of the same table and AQE plans a plain shuffle join; rendering and
    hashing are stateless projections inside the join's output stage.
    With a real pairing column the join key changes, the plan does not.

    Parity: pure string concatenation and md5 on identical bytes —
    chr(10) newlines spelled explicitly so no engine-side escape
    processing is involved; integer lengths exact."""
    d = load(spark, sf_dir, "documents")
    p = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("prompt_doc_id"),
        F.col("text").alias("ptext"),
        "source",
    )
    r = d.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("response_doc_id"),
        F.col("text").alias("rtext"),
    )
    nl = "\n"
    rendered = F.concat(
        F.lit("<|system|>" + nl + SFT_SYSTEM + nl + "<|user|>" + nl),
        F.col("ptext"),
        F.lit(nl + "<|assistant|>" + nl),
        F.col("rtext"),
    )
    return (
        p.join(
            r,
            r.response_doc_id == p.prompt_doc_id + 1,
        )
        .withColumn("rendered", rendered)
        .select(
            (F.col("prompt_doc_id") / 2).cast("long").alias("example_id"),
            "prompt_doc_id",
            "response_doc_id",
            "source",
            F.length("ptext").cast("long").alias("n_chars_prompt"),
            F.length("rtext").cast("long").alias("n_chars_response"),
            F.length("rendered").cast("long").alias("n_chars_rendered"),
            F.md5("rendered").alias("rendered_md5"),
        )
    )


_DP_EPSILON_STR = "1.0"  # Laplace scale b = sensitivity/epsilon = 1/1
_DP_POW52 = "4503599627370496.0"  # 2^52: 13 hex digits of md5 as a uniform


@query(
    "llm_dp_noise",
    oracle=f"""
    WITH g AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_true
        FROM documents GROUP BY lang, source
    ),
    u AS (
        SELECT lang, source, n_true,
               CAST(CAST(concat('0x', substr(md5(concat(lang, '|', source)), 1, 13))
                    AS UBIGINT) AS DOUBLE) / {_DP_POW52} AS u01
        FROM g
    )
    SELECT lang, source, n_true,
           CAST(CAST(
               CASE WHEN u01 >= 0.5
                    THEN -(1.0 / {_DP_EPSILON_STR}) * ln(1.0 - 2.0 * (u01 - 0.5))
                    ELSE  (1.0 / {_DP_EPSILON_STR}) * ln(1.0 - 2.0 * (0.5 - u01))
               END AS DECIMAL(18,8)) AS DOUBLE) AS noise,
           CAST(CAST(n_true AS DECIMAL(18,8)) + CAST(
               CASE WHEN u01 >= 0.5
                    THEN -(1.0 / {_DP_EPSILON_STR}) * ln(1.0 - 2.0 * (u01 - 0.5))
                    ELSE  (1.0 / {_DP_EPSILON_STR}) * ln(1.0 - 2.0 * (0.5 - u01))
               END AS DECIMAL(18,8)) AS DOUBLE) AS n_released
    FROM u
    """,
)
def llm_dp_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release over the corpus slice grid:
    per-(lang, source) document counts plus Laplace(1/epsilon) noise via
    the inverse-CDF of a DETERMINISTIC per-group uniform — the
    epsilon-DP histogram mechanism (Dwork et al. 2006) a privacy review
    applies before publishing corpus composition stats externally, the
    release-side complement of validate_k_anonymity's risk screen.
    Seeding the uniform from the group key (not a PRNG) keeps the release
    re-runnable and cross-engine reproducible; production would swap the
    key-hash for a salted secret so the noise is unpredictable to
    adversaries while staying deterministic per release.

    Parity: the uniform is 13 md5 hex digits (52 bits) parsed identically
    in both engines and divided by 2^52 — an exact IEEE quotient of exact
    integers. The Laplace transform's one libm call (ln) quantizes through
    DECIMAL(18,8) (the quantize-then-double rule); the release adds the
    quantized noise to the exact count in decimal space. The branch on
    u >= 0.5 keeps sign() out of the ulp-sensitive path.

    Scale shape: ONE partial-aggregated groupBy collapses the corpus to
    the O(langs x sources) slice grid; everything after operates on grid
    rows. Flat at any corpus size.
    """
    g = load(spark, sf_dir, "documents").groupBy("lang", "source").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_true")
    )
    u = g.withColumn(
        "u01",
        F.expr(
            "CAST(conv(substr(md5(concat(lang, '|', source)), 1, 13), 16, 10)"
            f" AS DOUBLE) / {_DP_POW52}"
        ),
    )
    noise_q = (
        f"""CAST(CASE WHEN u01 >= 0.5
            THEN -(1.0D / {_DP_EPSILON_STR}D) * ln(1.0D - 2.0D * (u01 - 0.5D))
            ELSE  (1.0D / {_DP_EPSILON_STR}D) * ln(1.0D - 2.0D * (0.5D - u01))
            END AS DECIMAL(18,8))"""
    )
    return u.select(
        "lang",
        "source",
        "n_true",
        F.expr(f"CAST({noise_q} AS DOUBLE)").alias("noise"),
        F.expr(
            f"CAST(CAST(n_true AS DECIMAL(18,8)) + {noise_q} AS DOUBLE)"
        ).alias("n_released"),
    )
