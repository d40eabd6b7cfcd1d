"""Deduplication operators for LLM training-data pipelines (north star,
BASELINE.json; no reference precedent — SURVEY.md §2.2 "LLM-data-pipeline").

Three tiers over `documents`:
- exact: normalized-text hash → keep first (cheapest; catches byte dupes)
- n-gram Jaccard candidates: shingle posting lists → equi-join (exact
  overlap counting, oracle-checkable)
- MinHash LSH: banded signatures → candidate pairs (the 100 TB path:
  candidate generation is linear in corpus size, never all-pairs)

Scale notes: all three are shuffle-on-key joins/aggregations with map-side
combine. The all-pairs O(n²) comparison never appears; pair generation is
always through an equi-join on a hash/band key. Hot shingles (stopword-ish
n-grams shared by thousands of docs) would quadratically blow up the
posting-list self-join, so both engines cap posting lists at DF_CAP — the
standard df-cut from the MinHash/LSH literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.session import stage, stage_iter
from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.registry import query

# Posting-list cap: shingles appearing in more docs than this are dropped
# from candidate generation (identically in Spark and oracle SQL).
DF_CAP = 50
SHINGLE_WORDS = 5
MIN_COMMON_SHINGLES = 3

# MinHash parameters: 16 permutations in 4 bands of 4 rows.
MINHASH_PERMS = 16
LSH_BANDS = 4


@query(
    "llm_dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS text_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(lower(trim(text)))
    """,
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text hash: one surviving doc per hash.

    Keep-policy is MIN(doc_id) — deterministic, unlike dropDuplicates.
    At 100 TB: a single hash-shuffle on a 32-char key; the text column
    itself never shuffles.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.lower(F.trim("text"))).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# Incremental-dedup shard split: doc_id % 5 == 0 is the INCOMING shard
# (~20% of the corpus); the rest is the already-indexed historical corpus.
INCR_SHARD_MOD = 5


@query(
    "llm_dedup_incremental_audit",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, md5(lower(trim(text))) AS text_hash,
               doc_id % {INCR_SHARD_MOD} = 0 AS is_new
        FROM documents WHERE text IS NOT NULL
    ),
    hist AS (
        SELECT text_hash, MIN(doc_id) AS hist_doc_id
        FROM fp WHERE NOT is_new GROUP BY text_hash
    ),
    new_rank AS (
        SELECT doc_id, text_hash,
               MIN(doc_id) OVER (PARTITION BY text_hash) AS first_new
        FROM fp WHERE is_new
    )
    SELECT n.doc_id, n.text_hash, h.hist_doc_id,
           CASE WHEN h.hist_doc_id IS NOT NULL THEN 'dup_of_index'
                WHEN n.doc_id > n.first_new THEN 'dup_in_shard'
                ELSE 'keep' END AS verdict
    FROM new_rank n LEFT JOIN hist h USING (text_hash)
    """,
)
def llm_dedup_incremental_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-dedup AUDIT: the per-document verdict/provenance view
    of the shard-vs-index ingest — the triage complement of
    llm_dedup_incremental (curation.py), which emits only the admitted
    survivors. Production pipelines need BOTH surfaces: the admit list
    feeds training, this view answers "why was my document dropped, and
    which historical document did it collide with" (dedup lineage, the
    thing users file tickets about). Each incoming doc gets a three-way
    verdict: 'dup_of_index' (its
    normalized-text hash exists in the historical index, with the
    surviving historical doc_id attached for provenance), 'dup_in_shard'
    (first seen inside this shard by a lower doc_id), or 'keep'.

    Scale shape: the historical side reduces to its (text_hash,
    min_doc_id) index — at 100 TB that index is a standing bucketed
    table, REUSED across ingests rather than recomputed (here it derives
    in-query from the same documents table so the whole pipeline is one
    oracle-checkable plan; the hash-groupBy that builds it is exactly
    llm_dedup_exact's shuffle). The shard-vs-index check is one
    equi-join on the 32-char hash (bucket-pruned when the index is
    bucketed by text_hash), and the within-shard check is a MIN window
    over the same hash key — both shuffles carry (hash, id) pairs,
    never text. NULL text (failed fetch) has no fingerprint and is
    excluded on BOTH sides (the r8 NULL-axis contract:
    llm_dedup_exact's convention).

    Parity: md5 is shared exactly cross-engine (the llm_dedup_near_md5
    discipline); verdicts are pure integer/string CASE logic; the left
    join keeps hist_doc_id NULL for index misses in both engines."""
    d = load(spark, sf_dir, "documents")
    fp = (
        d.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.md5(F.lower(F.trim("text"))).alias("text_hash"),
            (F.col("doc_id") % INCR_SHARD_MOD == 0).alias("is_new"),
        )
    )
    hist = (
        fp.filter(~F.col("is_new"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("hist_doc_id"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("text_hash")
    new_rank = (
        fp.filter(F.col("is_new"))
        .select(
            "doc_id",
            "text_hash",
            F.min("doc_id").over(w).alias("first_new"),
        )
    )
    return (
        new_rank.join(hist, "text_hash", "left")
        .select(
            "doc_id",
            "text_hash",
            "hist_doc_id",
            F.when(F.col("hist_doc_id").isNotNull(), F.lit("dup_of_index"))
            .when(F.col("doc_id") > F.col("first_new"), F.lit("dup_in_shard"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
    )


def _shingles_expr(toks: str = "toks") -> str:
    """SQL expr producing the distinct word-5-gram shingle array from a
    pre-split token array column.

    The token array MUST be materialized as a column first: expressions
    inside a `transform` lambda are re-evaluated per element, so inlining
    split(text) here would tokenize each document O(tokens) times —
    measured 3.3s→0.5s at sf0.1 for shingle generation alone.
    """
    return (
        "array_distinct(transform("
        f"  sequence(1, greatest(size({toks}) - {SHINGLE_WORDS - 1}, 1)),"
        f"  i -> concat_ws(' ', slice({toks}, i, {SHINGLE_WORDS}))))"
    )


def _shingle_hash_df(df: DataFrame) -> DataFrame:
    """(doc_id, h): one row per distinct word-5-gram shingle hash per doc.

    NULL text (a failed fetch) has NO shingle set, hence no rows here —
    without the filter, Spark's concat_ws renders slice(NULL_toks,...)
    as '' (concat_ws never returns NULL), giving every failed fetch the
    SAME phantom shingle and C(n,2) fabricated candidate pairs. DuckDB's
    oracle CTEs already emit nothing for NULL text (list ops propagate
    the NULL list and unnest drops it), so the filter IS the mirror."""
    return df.filter(F.col("text").isNotNull()).withColumn(
        "toks", F.split("text", " ")
    ).select(
        "doc_id",
        F.explode(
            F.expr(f"array_distinct(transform({_shingles_expr()}, s -> xxhash64(s)))")
        ).alias("h"),
    )


def _posting_with_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h, df): the windowed shingle frame — each doc's distinct
    shingle hashes with the shingle's corpus document frequency — MATERIALIZED
    via localCheckpoint before fan-out.

    Every consumer pattern here (posting self-join aliases, full-set sizes,
    edge construction) re-evaluates unshared subtrees in Spark, and the
    shingle explode is the expensive one: tokenize → 5-gram transform →
    array_distinct → explode → window count. Checkpointing the narrow
    (long, long, long) frame once and fanning out from the materialized
    result measured 1.24s → 0.58s for llm_ngram_jaccard at sf0.1, checkpoint
    cost included. At cluster scale the same move is persist(DISK_ONLY) or a
    staging table — one shingle pass per corpus, not one per consumer."""
    sh = _shingle_hash_df(load(spark, sf_dir, "documents"))
    from pyspark.sql import Window

    w = Window.partitionBy("h")
    return sh.withColumn("df", F.count(F.lit(1)).over(w)).transform(stage)


@query(
    "llm_dedup_ngram",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, str_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, greatest(len(t) - {SHINGLE_WORDS - 1}, 1) + 1),
            i -> array_to_string(t[i:i + {SHINGLE_WORDS - 1}], ' ')
        ))) AS shingle
        FROM tok
    ),
    capped AS (
        SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {DF_CAP}
    ),
    posting AS (
        SELECT sh.doc_id, sh.shingle FROM sh JOIN capped USING (shingle)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS common_shingles
    FROM posting a JOIN posting b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {MIN_COMMON_SHINGLES}
    """,
)
def llm_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates by word-5-gram overlap: shingle → posting list →
    self-equi-join → pairs with ≥3 common shingles.

    This is exact n-gram-overlap counting (the verification stage of a
    MinHash pipeline) — candidate generation stays an equi-join on the
    shingle key, so Catalyst plans it as hash shuffles, never a cartesian.

    Plan tuning for scale (each point verified via .explain):
    - shingles are deduped per-doc with array_distinct BEFORE explode, so no
      row-level distinct shuffle exists at all;
    - the join key is xxhash64(shingle) — 8 bytes through the shuffle
      instead of ~40-byte strings (collisions only merge shingles, which
      cannot create false pairs below the 2^-64 birthday bound);
    - the document-frequency cap is a window count over the same hash
      partitioning the self-join needs, and the windowed frame is
      checkpointed once (_posting_with_df) so the self-join's two aliases
      probe the materialized postings instead of re-running the shingle
      explode per side.
    """
    posting = _posting_with_df(spark, sf_dir).filter(F.col("df") <= DF_CAP)
    # r11 (guide §3.1): shuffled-hash hint — the build side is one hash-
    # partition of the DF-capped posting frame (posting length bounded by
    # DF_CAP, partition bytes by AQE), so the per-task build is memory-
    # safe and SMJ's two partition sorts disappear. Measured at sf0.1:
    # 2.46 s -> 1.54 s warm median for the whole key.
    a = posting.alias("a").hint("shuffle_hash")
    b = posting.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common_shingles"))
        .filter(F.col("common_shingles") >= MIN_COMMON_SHINGLES)
    )


@query("llm_dedup_near", oracle=None)
def llm_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidates (rows-only: xxhash64 signatures
    have no DuckDB twin).

    Pipeline: word-5-gram shingles → one xxhash64 per shingle → 16 minhash
    permutations as xxhash64(shingle_hash, perm_salt) (hash-the-hash: string
    hashing happens once, each permutation is a cheap long hash) → 4 bands
    of 4 hashes → band-bucket equi-join → candidate pairs with
    band-collision count. Estimated Jaccard = fraction of matching minhash
    components.

    At 100 TB this is THE near-dup path: cost is O(corpus) for signatures
    plus an equi-join on band keys; banding keeps collision probability
    s-curved around the similarity threshold (s≈(1/b)^(1/r)≈0.7).

    NOTE on output size: the pair LIST itself is quadratic in copy-clique
    size by definition (the 128× probe measured 44.3M pairs on the
    duplicate-heavy fixture). For a human/audit-facing surface that stays
    linear at any scale, use llm_dedup_near_sample — the deterministic
    per-component top-K pair sample (VERDICT r7 item 6).
    """
    sh = _shingle_hash_df(load(spark, sf_dir, "documents"))
    minhash_cols = [
        F.min(F.xxhash64(F.col("h"), F.lit(p))).alias(f"mh{p}")
        for p in range(MINHASH_PERMS)
    ]
    # No checkpoint here, unlike _posting_with_df: the banded self-join's
    # two aliases sit directly over the groupBy("doc_id") exchange, which
    # Spark's ReuseExchange rule already shares — A/B warm medians at sf0.1
    # showed no win from materializing sigs. Checkpointing pays off only
    # when consumers have *different* shapes over the subtree (jaccard's
    # sizes-agg + join), not for a symmetric self-join.
    sigs = sh.groupBy("doc_id").agg(*minhash_cols)

    rows_per_band = MINHASH_PERMS // LSH_BANDS
    band_structs = [
        F.struct(
            F.lit(band).alias("band_id"),
            F.xxhash64(
                *[F.col(f"mh{band * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("band_hash"),
        )
        for band in range(LSH_BANDS)
    ]
    banded = sigs.select(
        "doc_id",
        *[F.col(f"mh{p}") for p in range(MINHASH_PERMS)],
        F.explode(F.array(*band_structs)).alias("b"),
    ).select("doc_id", *[f"mh{p}" for p in range(MINHASH_PERMS)], "b.band_id", "b.band_hash")

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("n_band_collisions"),
            *[
                F.max(
                    (F.col(f"a.mh{p}") == F.col(f"b.mh{p}")).cast("int")
                ).alias(f"eq{p}")
                for p in range(MINHASH_PERMS)
            ],
        )
    )
    est = sum(F.col(f"eq{p}") for p in range(MINHASH_PERMS)) / float(MINHASH_PERMS)
    return pairs.select(
        "doc_a", "doc_b", "n_band_collisions", est.alias("est_jaccard")
    )


_NEAR_MD5_SIG_COLS = ", ".join(
    f"min(md5(concat(CAST({p} AS VARCHAR), ':', shingle))) AS mh{p}"
    for p in range(MINHASH_PERMS)
)
def _near_md5_band_select(band: int) -> str:
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    parts = []
    for r in range(rows_per_band):
        if r:
            parts.append("'|'")
        parts.append(f"mh{band * rows_per_band + r}")
    cols = ", ".join(f"mh{p}" for p in range(MINHASH_PERMS))
    return (
        f"SELECT doc_id, {band} AS band_id, "
        f"md5(concat({', '.join(parts)})) AS band_hash, {cols} FROM sig"
    )


_NEAR_MD5_BANDS = " UNION ALL ".join(
    _near_md5_band_select(band) for band in range(LSH_BANDS)
)
_NEAR_MD5_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, str_split(text, ' ') AS t
        FROM documents WHERE text IS NOT NULL
    ),
    sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, greatest(len(t) - {SHINGLE_WORDS - 1}, 1) + 1),
            i -> array_to_string(t[i:i + {SHINGLE_WORDS - 1}], ' ')
        ))) AS shingle
        FROM tok
    ),
    sig AS (
        SELECT doc_id, {_NEAR_MD5_SIG_COLS}
        FROM sh GROUP BY doc_id
    ),
    banded AS ({_NEAR_MD5_BANDS}),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_band_collisions,
               {" + ".join(f"MAX(CASE WHEN a.mh{p} = b.mh{p} THEN 1 ELSE 0 END)" for p in range(MINHASH_PERMS))} AS n_eq
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_band_collisions,
           CAST(n_eq AS DOUBLE) / {MINHASH_PERMS} AS est_jaccard
    FROM pairs
"""


@query("llm_dedup_near_md5", oracle=_NEAR_MD5_ORACLE)
def llm_dedup_near_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidates with a FULLY ORACLE-CHECKED hash
    primitive (r9, VERDICT r8 item 6): md5 hex strings instead of
    xxhash64 longs. Spark's md5() and DuckDB's md5() emit the identical
    lowercase-hex digest for identical input bytes, minhash component p
    is min() over md5('p:' || shingle) — lexicographic min over ASCII
    hex is byte-ordering-identical in both engines — and the band key is
    md5 over the '|'-joined component hexes. Every intermediate value is
    therefore bit-equal cross-engine and the whole LSH pipeline
    (shingle → signature → banding → bucket self-join → estimator) gets
    a hash-green driver row, not a rows-only one: the verification gap
    that kept llm_dedup_near rows-only is closed by construction here.

    Same pipeline shape as llm_dedup_near (the production path): distinct
    word-5-gram shingles, 16 permutations, 4 bands x 4 rows, band-bucket
    equi-join, est_jaccard = matching components / 16. Exact n/16
    fractions are binary-exact doubles, so no quantization is needed.

    Scale role: PARITY TWIN. md5-over-string costs ~4x xxhash64-over-long
    per permutation (32-hex-char shuffle keys vs 8-byte longs, measured
    at sf0.1); at 100 TB run llm_dedup_near and let this key certify the
    banding logic at audit scale. The two share nothing downstream of the
    shingle step, so a divergence in either implicates the banding
    algebra, not a common helper — which is exactly what an oracle twin
    is for. Structural cross-checks for the xxhash64 path itself live in
    tests/test_dedup_near_structural.py."""
    d = load(spark, sf_dir, "documents")
    sh = (
        d.filter(F.col("text").isNotNull())
        .withColumn("toks", F.split("text", " "))
        .select(
            "doc_id",
            F.explode(F.expr(_shingles_expr())).alias("shingle"),
        )
    )
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{p}:"), F.col("shingle")))
            ).alias(f"mh{p}")
            for p in range(MINHASH_PERMS)
        ]
    )
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    band_structs = [
        F.struct(
            F.lit(band).cast("int").alias("band_id"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh{band * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("band_hash"),
        )
        for band in range(LSH_BANDS)
    ]
    banded = sigs.select(
        "doc_id",
        *[F.col(f"mh{p}") for p in range(MINHASH_PERMS)],
        F.explode(F.array(*band_structs)).alias("b"),
    ).select(
        "doc_id",
        *[f"mh{p}" for p in range(MINHASH_PERMS)],
        "b.band_id",
        "b.band_hash",
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("n_band_collisions"),
            *[
                F.max(
                    (F.col(f"a.mh{p}") == F.col(f"b.mh{p}")).cast("int")
                ).alias(f"eq{p}")
                for p in range(MINHASH_PERMS)
            ],
        )
    )
    est = sum(F.col(f"eq{p}") for p in range(MINHASH_PERMS)) / float(MINHASH_PERMS)
    return pairs.select(
        "doc_a", "doc_b", "n_band_collisions", est.alias("est_jaccard")
    )


@query("llm_dedup_simhash", oracle=None)
def llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (rows-only): 64-bit signature whose bits are the
    sign of per-bit weighted sums over token hashes; near-dups differ in few
    bits (Hamming distance).

    Built entirely from JVM expressions: explode tokens → xxhash64 → for
    each bit, sum(±1) → reassemble the sign bits. Output: doc_id, simhash,
    plus the 4 16-bit Hamming blocks used for banded candidate lookup
    (Manku et al.'s rotation/block trick — equality on any block is the
    candidate filter at scale).
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(64)
        ]
    )
    simhash = sum(
        F.when(F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(64)
    )
    out = bit_sums.select("doc_id", simhash.alias("simhash"))
    return out.select(
        "doc_id",
        "simhash",
        *[
            F.shiftright("simhash", 16 * blk).bitwiseAND(F.lit(0xFFFF)).alias(f"block{blk}")
            for blk in range(4)
        ],
    )


def _simhash_md5_oracle() -> str:
    """DuckDB twin of llm_dedup_simhash_md5: identical md5-nibble bit
    extraction, identical ±1 sums, identical block/hex reassembly."""
    nib_defs = ",\n               ".join(
        f"CASE WHEN ascii(substring(hx, {i + 1}, 1)) >= 97"
        f" THEN ascii(substring(hx, {i + 1}, 1)) - 87"
        f" ELSE ascii(substring(hx, {i + 1}, 1)) - 48 END AS n{i}"
        for i in range(16)
    )
    bit_sums = ",\n               ".join(
        f"SUM(CASE WHEN (n{b // 4} // {2 ** (b % 4)}) % 2 = 1"
        f" THEN 1 ELSE -1 END) AS s{b}"
        for b in range(64)
    )
    blocks = ",\n           ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN s{16 * blk + j} > 0 THEN {2 ** j} ELSE 0 END)"
            for j in range(16)
        )
        + f" AS INTEGER) AS block{blk}"
        for blk in range(4)
    )
    hex_chars = ",\n               ".join(
        "substring('0123456789abcdef', 1 + "
        + " + ".join(
            f"(CASE WHEN s{4 * i + j} > 0 THEN {2 ** j} ELSE 0 END)"
            for j in range(4)
        )
        + ", 1)"
        for i in range(16)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(str_split(text, ' ')) AS tok
        FROM documents WHERE text IS NOT NULL
    ),
    h AS (
        SELECT doc_id, md5(tok) AS hx FROM tok
    ),
    nib AS (
        SELECT doc_id,
               {nib_defs}
        FROM h
    ),
    bits AS (
        SELECT doc_id,
               {bit_sums}
        FROM nib GROUP BY doc_id
    )
    SELECT doc_id,
           concat({hex_chars}) AS simhash_hex,
           {blocks}
    FROM bits
    """


@query("llm_dedup_simhash_md5", oracle=_simhash_md5_oracle())
def llm_dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash with a FULLY ORACLE-CHECKED hash primitive (VERDICT r9
    item 4, the llm_dedup_near_md5 pattern applied to simhash): token
    hashes are md5 hex digests — which Spark and DuckDB compute
    identically — so the whole fingerprint pipeline (token hash → 64
    per-bit ±1 sums → sign bits → 16-bit Hamming blocks + hex signature)
    is hash-green against the DuckDB oracle, closing the verification
    gap that keeps llm_dedup_simhash (xxhash64 longs, no DuckDB twin)
    rows-only.

    Bit b (0..63) of a token's 64-bit space is bit (b % 4) of hex nibble
    (b // 4) of the digest's FIRST 16 hex chars; nibble values come from
    ascii() arithmetic (both engines agree on lowercase-hex md5 output),
    bit extraction is integer div/mod — every intermediate is exact
    integer arithmetic, so no float discipline is needed anywhere.
    Per-bit sums count EVERY token occurrence (not distinct), ties
    (sum = 0) resolve to bit 0, and the signature is emitted both as the
    4 16-bit blocks (Manku et al.'s banded candidate-lookup keys, as in
    llm_dedup_simhash) and as a 16-hex-char string whose char i is
    nibble i — positionally aligned with the md5 nibbles it derives
    from.

    Scale role: PARITY TWIN of llm_dedup_simhash (same shape: one token
    explode, one partial-agg groupBy carrying 64 int sums; md5-over-
    string costs ~4x xxhash64's long path). The two share no hash code,
    so a divergence implicates the simhash algebra itself — exactly what
    the twin certifies. At 100 TB run llm_dedup_simhash; this key keeps
    its logic oracle-checked at audit scale."""
    d = load(spark, sf_dir, "documents")
    toks = (
        d.filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .select("doc_id", F.md5("tok").alias("hx"))
    )
    # r11: the 16 hex nibbles parse as TWO 32-bit conv() integers per
    # token instead of 16 ascii(substring(...)) probes — hex char i is
    # nibble (h_hi >> 4*(7-i)) & 15 for i < 8 and the h_lo mirror past
    # that, so bit b = bit (b % 4) of nibble (b // 4) becomes one
    # shift-and-mask on a long. Verified cell-identical to the ascii
    # arithmetic on the full sf0.1 token stream (exceptAll both ways =
    # 0); the oracle keeps its independent ascii formulation — the two
    # engines still share ONLY the md5 hex text. Nibble stage warm-best
    # at sf0.1: 1.66 s → 0.92 s (guide §1/§2.3: cheaper per-row work
    # before the exchange).
    par = toks.select(
        "doc_id",
        F.expr("cast(conv(substring(hx, 1, 8), 16, 10) as bigint)").alias(
            "h_hi"
        ),
        F.expr("cast(conv(substring(hx, 9, 8), 16, 10) as bigint)").alias(
            "h_lo"
        ),
    )

    def _bit(b: int) -> str:
        i, j = b // 4, b % 4
        src = "h_hi" if i < 8 else "h_lo"
        shift = 4 * ((7 - i) if i < 8 else (15 - i)) + j
        return f"(({src} >> {shift}) & 1)"

    bits = par.groupBy("doc_id").agg(
        *[
            F.expr(
                f"SUM(CASE WHEN {_bit(b)} = 1 THEN 1 ELSE -1 END)"
            ).alias(f"s{b}")
            for b in range(64)
        ]
    )
    blocks = [
        sum(
            F.when(F.col(f"s{16 * blk + j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
            for j in range(16)
        )
        .cast("int")
        .alias(f"block{blk}")
        for blk in range(4)
    ]
    hex_chars = [
        F.substring(
            F.lit("0123456789abcdef"),
            F.lit(1)
            + sum(
                F.when(F.col(f"s{4 * i + j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
                for j in range(4)
            ),
            F.lit(1),
        )
        for i in range(16)
    ]
    return bits.select(
        "doc_id",
        F.concat(*hex_chars).alias("simhash_hex"),
        *blocks,
    )


JACCARD_THRESHOLD = 0.5


@query(
    "llm_ngram_jaccard",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, str_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, greatest(len(t) - {SHINGLE_WORDS - 1}, 1) + 1),
            i -> array_to_string(t[i:i + {SHINGLE_WORDS - 1}], ' ')
        ))) AS shingle
        FROM tok
    ),
    sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ),
    capped AS (
        SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {DF_CAP}
    ),
    posting AS (
        SELECT sh.doc_id, sh.shingle FROM sh JOIN capped USING (shingle)
    ),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM posting a JOIN posting b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(c.n_common AS DOUBLE)
               / (sa.n_sh + sb.n_sh - c.n_common) AS jaccard
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE CAST(c.n_common AS DOUBLE)
              / (sa.n_sh + sb.n_sh - c.n_common) >= {JACCARD_THRESHOLD}
    """,
)
def llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity on blocked candidate pairs:
    |A∩B| / (|A|+|B|−|A∩B|) over word-5-gram shingle sets, keeping pairs at
    or above 0.5 — the verification stage that turns llm_dedup_ngram's
    candidates into a similarity-scored dedup decision.

    Set sizes |A|,|B| come from the FULL per-doc shingle sets; the
    intersection count comes from df-capped postings (identically in both
    engines), so a hot shingle can under-count the intersection but never
    fabricate a pair. The sizes table is doc-level (tiny vs postings) and
    joins by doc_id after pair aggregation — the pair stream shrinks to
    ≥1-common pairs before any size data attaches. Sizes, and both sides
    of the pair self-join, all fan out from one checkpointed shingle frame
    (_posting_with_df) — one shingle pass, three consumers."""
    withdf = _posting_with_df(spark, sf_dir)
    sizes = withdf.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    posting = withdf.filter(F.col("df") <= DF_CAP)
    # r11: shuffled-hash hint, same rationale as llm_dedup_ngram's
    # posting self-join (measured 2.52 s -> 1.34 s for the whole key)
    a = posting.alias("a").hint("shuffle_hash")
    b = posting.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


_NGRAM_PAIRS_SQL = f"""
    WITH tok AS (
        SELECT doc_id, str_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, greatest(len(t) - {SHINGLE_WORDS - 1}, 1) + 1),
            i -> array_to_string(t[i:i + {SHINGLE_WORDS - 1}], ' ')
        ))) AS shingle
        FROM tok
    ),
    capped AS (
        SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {DF_CAP}
    ),
    posting AS (
        SELECT sh.doc_id, sh.shingle FROM sh JOIN capped USING (shingle)
    ),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS common_shingles
        FROM posting a JOIN posting b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(*) >= {MIN_COMMON_SHINGLES}
    )
"""


@query(
    "llm_dedup_cluster",
    oracle=_NGRAM_PAIRS_SQL.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + """,
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM cand
        UNION
        SELECT doc_b, doc_a FROM cand
    ),
    r(x, y) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT r.x, e.b FROM r JOIN edges e ON r.y = e.a
    )
    SELECT x AS doc_id, MIN(y) AS component_id FROM r GROUP BY x
    """,
)
def llm_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup candidate graph — the step
    that turns pairwise matches into dedup DECISIONS (one keeper per
    cluster = min doc_id): iterative min-label propagation, each round a
    join + aggregate, looped driver-side until a convergence count hits 0.

    This is the engine's iterative-algorithm pattern: per-round plans stay
    declarative (join on the edge key, min-aggregate per vertex), lineage
    is cut with localCheckpoint each round so the plan doesn't grow, and
    round count is bounded by cluster diameter (near-dup clusters are
    shallow — ≤ a handful of hops). The oracle is an independent
    formulation: DuckDB recursive-CTE transitive closure → min reachable
    node, so Spark's loop is cross-checked against real graph semantics.
    At 100 TB this is the large-star/small-star regime: each round
    shuffles (vertex, label) pairs only, never documents.
    """
    cand = _ngram_cand_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return _min_label_components(cand)


def _ngram_cand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, common_shingles): the df-capped shingle-overlap
    candidate pairs (llm_dedup_ngram's surface), STAGED — shared by the
    clustering loop (which reads both edge directions) and the bounded
    pair-sample audit; a union of two branches each containing the
    shingle self-join would evaluate candidate generation twice (Spark
    does not share subtrees across union branches) — measured 2.1s → 1.1s
    for edge construction at sf0.1."""
    posting = _posting_with_df(spark, sf_dir).filter(F.col("df") <= DF_CAP)
    # r11: shuffled-hash hint, same rationale as llm_dedup_ngram
    a = posting.alias("a").hint("shuffle_hash")
    b = posting.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common_shingles"))
        .filter(F.col("common_shingles") >= MIN_COMMON_SHINGLES)
        .transform(stage)
    )


def _min_label_components(cand: DataFrame) -> DataFrame:
    """(doc_id, component_id) by iterative min-label propagation over the
    (doc_a, doc_b) pair frame — llm_dedup_cluster's loop, factored so the
    pair sample can label without a second candidate-generation pass."""
    edges = cand.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(cand.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))

    # Fused round 0: every vertex appears as src (edges are bidirectional),
    # so min(self, min(neighbor)) initializes labels in one aggregation
    # over the tiny edge list instead of a distinct + a full join round.
    labels = (
        edges.groupBy(F.col("src").alias("doc_id"))
        .agg(F.min("dst").alias("nbr0"))
        .select("doc_id", F.least("doc_id", "nbr0").alias("component_id"))
    )
    for _ in range(20):  # cap ≫ any real near-dup cluster diameter
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("component_id").alias("nbr_min"))
        )
        new_comp = F.least("component_id", F.coalesce("nbr_min", "component_id"))
        # convergence flag rides the checkpointed frame: counting it scans
        # the materialized labels, no extra join against the old labels
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                new_comp.alias("component_id"),
                (new_comp < F.col("component_id")).alias("chg"),
            )
            .transform(stage_iter)
        )
        changed = new_labels.filter("chg").count()
        labels = new_labels.select("doc_id", "component_id")
        if changed == 0:
            break
    return labels


# Bounded pair-sample size: pairs kept per near-dup component in the
# audit sample (identically in Spark and oracle).
NEAR_SAMPLE_K = 5


@query(
    "llm_dedup_near_sample",
    oracle=_NGRAM_PAIRS_SQL.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + f""",
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM cand
        UNION
        SELECT doc_b, doc_a FROM cand
    ),
    r(x, y) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT r.x, e.b FROM r JOIN edges e ON r.y = e.a
    ),
    comp AS (
        SELECT x AS doc_id, MIN(y) AS component_id FROM r GROUP BY x
    ),
    ranked AS (
        SELECT c.component_id, p.doc_a, p.doc_b, p.common_shingles,
               row_number() OVER (
                   PARTITION BY c.component_id
                   ORDER BY p.common_shingles DESC, p.doc_a, p.doc_b
               ) AS rk
        FROM cand p JOIN comp c ON c.doc_id = p.doc_a
    )
    SELECT component_id, doc_a, doc_b, common_shingles,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {NEAR_SAMPLE_K}
    """,
)
def llm_dedup_near_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded near-dup AUDIT sample: the K strongest candidate
    pairs per near-dup component, ranked by exact shingle overlap with a
    deterministic (doc_a, doc_b) tie-break — what a curation reviewer
    actually eyeballs per cluster (VERDICT r7 item 6).

    Why this key exists: the raw pair LIST (llm_dedup_near /
    llm_dedup_ngram) is output-bound quadratic on duplicate-heavy
    corpora — the 128× probe measured 44.3M pairs because a copy-clique
    of c documents owns c(c−1)/2 pairs by definition. This sibling caps
    the audited surface at NEAR_SAMPLE_K × n_components rows (linear in
    corpus size), so the human/audit-facing output is itself 100 TB-safe
    while the full pair stream stays available for machine consumers.

    Scale shape: one candidate-generation pass shared with the
    clustering loop (_ngram_cand_pairs, staged), the label-propagation
    labels attach by an equi-join on doc_a (doc_a and doc_b share a
    component by construction), and the rank ≤ K filter compiles to
    Spark's WindowGroupLimit pushdown — each shuffle partition keeps
    only its top K rows per component BEFORE the final sort, so no
    component's full pair list ever materializes in one place.

    Parity: every checked column is integer (ids, exact overlap counts,
    rank); the rank's ordering key (common_shingles DESC, doc_a, doc_b)
    is total, so both engines rank identically with no float anywhere.
    """
    cand = _ngram_cand_pairs(spark, sf_dir)
    labels = _min_label_components(cand.select("doc_a", "doc_b"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("component_id")
        .orderBy(F.desc("common_shingles"), "doc_a", "doc_b")
    )
    return (
        cand.join(labels.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= NEAR_SAMPLE_K)
        .select("component_id", "doc_a", "doc_b", "common_shingles", "rk")
    )


@query(
    "llm_dedup_keep",
    oracle=_NGRAM_PAIRS_SQL.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + """,
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM cand
        UNION
        SELECT doc_b, doc_a FROM cand
    ),
    r(x, y) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT r.x, e.b FROM r JOIN edges e ON r.y = e.a
    ),
    comp AS (
        SELECT x AS doc_id, MIN(y) AS component_id FROM r GROUP BY x
    ),
    exact_keep AS (
        SELECT MIN(doc_id) AS doc_id
        FROM documents
        GROUP BY md5(lower(trim(text)))
    )
    SELECT e.doc_id
    FROM exact_keep e
    LEFT JOIN comp c ON c.doc_id = e.doc_id
    WHERE c.doc_id IS NULL OR c.component_id = e.doc_id
    """,
)
def llm_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup DECISION: the corpus a user actually trains on.
    A document survives iff it is (a) the min-id representative of its
    exact-hash group AND (b) not a non-representative member of a near-dup
    component — exact dedup and connected-components clustering composed
    into one keep-list.

    Built by composing the registered stages (llm_dedup_exact keepers ⟕
    llm_dedup_cluster components); both stages keep their own scale
    properties (hash shuffle; iterative label propagation), and the final
    filter is a broadcast-size join against the component map."""
    exact = llm_dedup_exact(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    comp = llm_dedup_cluster(spark, sf_dir)
    return (
        exact.join(comp, "doc_id", "left")
        .filter(F.col("component_id").isNull() | (F.col("component_id") == F.col("doc_id")))
        .select("doc_id")
    )


# Decontamination: documents whose doc_id ends the range are the stand-in
# "benchmark/eval" set; the rest are the training corpus.
DECONTAM_EVAL_MOD = 10
DECONTAM_EVAL_REM = 7
DECONTAM_MIN_COMMON = 3


@query(
    "llm_decontaminate",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(str_split(text, ' ')) - {SHINGLE_WORDS - 1}, 1) + 1),
                   i -> array_to_string(list_slice(str_split(text, ' '), i, i + {SHINGLE_WORDS - 1}), ' ')
               ))) AS s
        FROM documents
    ),
    eval_sh AS (
        SELECT DISTINCT doc_id AS eval_doc_id, s FROM sh
        WHERE doc_id % {DECONTAM_EVAL_MOD} = {DECONTAM_EVAL_REM}
    ),
    train_sh AS (
        SELECT doc_id AS train_doc_id, s FROM sh
        WHERE doc_id % {DECONTAM_EVAL_MOD} != {DECONTAM_EVAL_REM}
    )
    SELECT train_doc_id, eval_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_common_shingles
    FROM train_sh t JOIN eval_sh e USING (s)
    GROUP BY train_doc_id, eval_doc_id
    HAVING COUNT(*) >= {DECONTAM_MIN_COMMON}
    """,
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: training documents sharing ≥K word-5-gram
    shingles with any benchmark document, with the overlap count — the
    flag-before-training gate that keeps eval data out of the corpus.

    No reference precedent (north star, BASELINE.json). Distinct from
    near-dup detection in its asymmetry, which is the whole scale story:
    the benchmark set is tiny (thousands of docs) next to a 100 TB corpus,
    so its distinct shingle set broadcasts and the corpus side is a pure
    scan → explode → broadcast-hash probe — the training corpus is never
    shuffled on shingles. Only matching (train, eval) pairs reach the
    aggregation, so the one real shuffle carries hits, not the corpus.
    Shingles travel as xxhash64 longs (same discipline as llm_dedup_ngram:
    a 2^-64 collision can only merge shingles, never fabricate ≥K overlap
    on its own). No DF cap here — contamination must count hot shingles
    too; the broadcast bounds the blow-up to eval-side matches.
    """
    sh = _shingle_hash_df(load(spark, sf_dir, "documents"))
    is_eval = (F.col("doc_id") % DECONTAM_EVAL_MOD) == DECONTAM_EVAL_REM
    eval_sh = (
        sh.filter(is_eval)
        .select(F.col("doc_id").alias("eval_doc_id"), "h")
        .distinct()
    )
    train_sh = sh.filter(~is_eval).select(F.col("doc_id").alias("train_doc_id"), "h")
    return (
        train_sh.join(F.broadcast(eval_sh), "h")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_common_shingles"))
        .filter(F.col("n_common_shingles") >= DECONTAM_MIN_COMMON)
    )


@query(
    "llm_contamination_report",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(str_split(text, ' ')) - {SHINGLE_WORDS - 1}, 1) + 1),
                   i -> array_to_string(list_slice(str_split(text, ' '), i, i + {SHINGLE_WORDS - 1}), ' ')
               ))) AS s
        FROM documents
    ),
    eval_sh AS (
        SELECT DISTINCT doc_id AS eval_doc_id, s FROM sh
        WHERE doc_id % {DECONTAM_EVAL_MOD} = {DECONTAM_EVAL_REM}
    ),
    train_sh AS (
        SELECT doc_id AS train_doc_id, s FROM sh
        WHERE doc_id % {DECONTAM_EVAL_MOD} != {DECONTAM_EVAL_REM}
    ),
    pairs AS (
        SELECT train_doc_id, eval_doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_common_shingles
        FROM train_sh t JOIN eval_sh e USING (s)
        GROUP BY train_doc_id, eval_doc_id
        HAVING COUNT(*) >= {DECONTAM_MIN_COMMON}
    )
    SELECT eval_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_contaminating_train_docs,
           MAX(n_common_shingles) AS max_overlap,
           CAST(SUM(n_common_shingles) AS BIGINT) AS total_overlap
    FROM pairs
    GROUP BY eval_doc_id
    """,
)
def llm_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-benchmark-document contamination report: for every eval doc,
    how many training documents leak ≥K of its shingles, the worst
    overlap, and the total — the audit artifact a data card cites when
    declaring an eval set clean (the aggregate view of
    llm_decontaminate's pair-level flags).

    Scale shape: the pair frame is llm_decontaminate's (broadcast
    eval-postings probe — the corpus never shuffles its shingles); this
    adds one eval-keyed aggregate over the ALREADY-small flagged-pair
    set. Integer counts only.
    """
    pairs = llm_decontaminate(spark, sf_dir)
    return pairs.groupBy("eval_doc_id").agg(
        F.count(F.lit(1)).alias("n_contaminating_train_docs"),
        F.max("n_common_shingles").alias("max_overlap"),
        F.sum("n_common_shingles").cast("long").alias("total_overlap"),
    )


# Containment gate: |A∩B| / min(|A|,|B|) — the asymmetric overlap that
# Jaccard misses. A 50-shingle doc pasted into a 5000-shingle doc has
# Jaccard ≈ 0.01 (invisible to llm_ngram_jaccard) but containment 1.0.
CONTAINMENT_THRESHOLD = 0.7


@query(
    "llm_containment",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, str_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, greatest(len(t) - {SHINGLE_WORDS - 1}, 1) + 1),
            i -> array_to_string(t[i:i + {SHINGLE_WORDS - 1}], ' ')
        ))) AS shingle
        FROM tok
    ),
    sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ),
    capped AS (
        SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {DF_CAP}
    ),
    posting AS (
        SELECT sh.doc_id, sh.shingle FROM sh JOIN capped USING (shingle)
    ),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM posting a JOIN posting b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(contained AS BIGINT) AS contained_doc, containment
    FROM (
        SELECT c.doc_a, c.doc_b,
               CASE WHEN sa.n_sh <= sb.n_sh THEN c.doc_a
                    ELSE c.doc_b END AS contained,
               CAST(CAST(CAST(c.n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh)
                    AS DECIMAL(10,6)) AS DOUBLE) AS containment
        FROM common c
        JOIN sizes sa ON sa.doc_id = c.doc_a
        JOIN sizes sb ON sb.doc_id = c.doc_b
    ) WHERE containment >= {CONTAINMENT_THRESHOLD}
    """,
)
def llm_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-containment dedup (the Lee et al. dedup gap Jaccard
    can't see): containment(A,B) = |A∩B| / min(|A|,|B|) over word-5-gram
    shingle sets — flags a short document (near-)embedded inside a long
    one, where symmetric Jaccard stays tiny because the union is dominated
    by the long doc. Emits the pair, WHICH doc is the contained one (the
    smaller shingle set — the dedup-keep candidate to drop), and the
    ratio.

    Scale shape: identical candidate machinery to llm_ngram_jaccard —
    one checkpointed shingle pass (_posting_with_df) feeding sizes and
    both self-join sides; candidate generation is the df-capped posting
    equi-join (Σ cap² per shingle, never corpus²); the doc-level sizes
    frame attaches AFTER pair aggregation shrinks the stream. Same
    under-count-never-fabricate property: a hot shingle over the DF cap
    can only lower containment. At 100 TB this is the llm_dedup_ngram
    plan plus two tiny doc-keyed joins.

    Parity: min-size denominator is exact integer arithmetic in both
    engines; the ratio quantizes through DECIMAL(10,6) then casts back to
    double (division is IEEE-identical on identical integer operands, the
    quantize guards the hash edge per exprs.py)."""
    withdf = _posting_with_df(spark, sf_dir)
    sizes = withdf.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    posting = withdf.filter(F.col("df") <= DF_CAP)
    # r11: shuffled-hash hint, same rationale as llm_dedup_ngram's
    # posting self-join (measured 2.52 s -> 1.34 s for the whole key)
    a = posting.alias("a").hint("shuffle_hash")
    b = posting.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    cont = F.col("n_common").cast("double") / F.least("na", "nb")
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.when(F.col("na") <= F.col("nb"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("contained_doc"),
            cont.cast("decimal(10,6)").cast("double").alias("containment"),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )


# Register-blocked Bloom filter geometry for llm_decontaminate_bloom:
# 4096 64-bit words = 256 Kbit. Each shingle hash selects ONE word
# (pmod(h, words)) and sets TWO bits inside it from independent hash
# bit-ranges — the cache-line-blocked Bloom design (one memory touch per
# probe). At ~2k eval shingles the fill is ~1 bit/word -> FPR well under
# 1%; for a real benchmark suite scale BLOOM_WORDS up linearly.
BLOOM_WORDS = 4096
_BLOOM_MASK = (
    "(shiftleft(CAST(1 AS BIGINT), CAST(pmod(shiftright(h, 12), 64) AS INT))"
    " | shiftleft(CAST(1 AS BIGINT), CAST(pmod(shiftright(h, 24), 64) AS INT)))"
)


@query(
    "llm_decontaminate_bloom",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(str_split(text, ' ')) - {SHINGLE_WORDS - 1}, 1) + 1),
                   i -> array_to_string(list_slice(str_split(text, ' '), i, i + {SHINGLE_WORDS - 1}), ' ')
               ))) AS s
        FROM documents
    ),
    eval_sh AS (
        SELECT DISTINCT doc_id AS eval_doc_id, s FROM sh
        WHERE doc_id % {DECONTAM_EVAL_MOD} = {DECONTAM_EVAL_REM}
    ),
    train_sh AS (
        SELECT doc_id AS train_doc_id, s FROM sh
        WHERE doc_id % {DECONTAM_EVAL_MOD} != {DECONTAM_EVAL_REM}
    ),
    pairs AS (
        SELECT train_doc_id, eval_doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_common_shingles
        FROM train_sh t JOIN eval_sh e USING (s)
        GROUP BY train_doc_id, eval_doc_id
        HAVING COUNT(*) >= {DECONTAM_MIN_COMMON}
    )
    SELECT train_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_eval_docs,
           MAX(n_common_shingles) AS max_overlap,
           CAST(SUM(n_common_shingles) AS BIGINT) AS total_overlap
    FROM pairs
    GROUP BY train_doc_id
    """,
)
def llm_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-gated decontamination drop list: the per-TRAIN-doc roll-up of
    eval overlap (llm_decontaminate is pair-level, llm_contamination_report
    is eval-level; this is the list a curation job actually subtracts),
    computed through a register-blocked Bloom pre-filter built from pure
    JVM expressions.

    The engine-side Bloom: eval shingle hashes fold into BLOOM_WORDS
    64-bit words via groupBy(pmod(h, words)).agg(bit_or(mask)) — a
    partial-aggregated exchange of at most `words` rows. Corpus shingles
    then probe it with ONE broadcast equi-join on the word index plus a
    bitwise containment filter ((mask & word) = mask), and only the
    surviving sliver reaches the exact-confirm join against the broadcast
    eval postings. Blooms have no false negatives, so the exact-confirm
    output is IDENTICAL with or without the gate — which is why the
    oracle is pure exact SQL and the hash check certifies end-to-end.
    (Spark's own bloom_filter_agg is not in the public function registry;
    this builds the same artifact from public shiftleft/pmod/bit_or.)

    Scale shape vs llm_decontaminate: same asymmetric posture (the corpus
    never shuffles its shingles), but the broadcast the corpus probes
    FIRST is now O(BLOOM_WORDS) — constant — instead of the full eval
    posting list, and the posting-list join only sees bloom survivors.
    At 100 TB with a large benchmark suite that is the difference between
    broadcasting gigabytes of postings to every task and broadcasting a
    32 KB bitmap; the exact join stays, but on ~FPR x corpus instead of
    corpus. Cited pattern: Spark's own runtime-filter bloom pushdown
    (InjectRuntimeFilter), re-expressed declaratively.
    """
    sh = _shingle_hash_df(load(spark, sf_dir, "documents"))
    is_eval = (F.col("doc_id") % DECONTAM_EVAL_MOD) == DECONTAM_EVAL_REM
    eval_sh = (
        sh.filter(is_eval)
        .select(F.col("doc_id").alias("eval_doc_id"), "h")
        .distinct()
        .transform(stage)
    )
    bloom = (
        eval_sh.select(
            F.expr(f"pmod(h, {BLOOM_WORDS})").alias("word_idx"),
            F.expr(_BLOOM_MASK).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("bloom_word"))
    )
    train_sh = sh.filter(~is_eval).select(
        F.col("doc_id").alias("train_doc_id"), "h"
    )
    candidates = (
        train_sh.withColumn("word_idx", F.expr(f"pmod(h, {BLOOM_WORDS})"))
        .withColumn("mask", F.expr(_BLOOM_MASK))
        .join(F.broadcast(bloom), "word_idx")
        .filter(F.expr("(mask & bloom_word) = mask"))
        .select("train_doc_id", "h")
    )
    return (
        candidates.join(F.broadcast(eval_sh), "h")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_common_shingles"))
        .filter(F.col("n_common_shingles") >= DECONTAM_MIN_COMMON)
        .groupBy("train_doc_id")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_eval_docs"),
            F.max("n_common_shingles").alias("max_overlap"),
            F.expr("CAST(SUM(n_common_shingles) AS BIGINT)").alias(
                "total_overlap"
            ),
        )
    )


@query(
    "llm_template_mine",
    oracle="""
    WITH tpl AS (
        SELECT doc_id,
               array_to_string(list_slice(str_split(
                   regexp_replace(lower(text), '[0-9]+', '#', 'g'),
                   ' '), 1, 10), ' ') AS template
        FROM documents
    )
    SELECT md5(template) AS template_md5,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(length(template)) AS BIGINT) AS template_chars
    FROM tpl
    GROUP BY md5(template)
    HAVING COUNT(*) >= 2
    """,
)
def llm_template_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-template mining: mask digit runs to '#', lowercase, take the
    first 10 tokens, and group — documents sharing a generated header or
    boilerplate opening (differing only in numbers or body) collapse onto
    one template. The standard boilerplate detector of web-corpus
    curation (shared page headers/footers/banners), one masking step
    beyond llm_dedup_exact's byte-dup hash: a header family is invisible
    to exact dedup and too uniform for MinHash to rank highly.

    Parity: the digit-mask regex ('[0-9]+' -> '#') behaves identically in
    Java regex and RE2 (DuckDB needs the explicit 'g' flag Spark applies
    by default — a one-flag dialect trap); the 10-token slice and md5 are
    bit-identical; everything checked is integer. The full-document
    template variant was VACUOUS on this corpus (zero >=2 groups at every
    SF — near-dups here differ in words, not digits), caught by the
    sf0.01 driver-contract differential; the head-prefix form mines 21-23
    real groups at sf0.001/sf0.01.

    Scale shape: identical posture to llm_dedup_exact — the ONE exchange
    carries (md5, doc_id, length) triples, never the text; masking and
    slicing are map-side projections. Flat at corpus scale; a
    mega-template costs one hot reducer key absorbed by partial agg.
    """
    d = load(spark, sf_dir, "documents")
    masked = "regexp_replace(lower(text), '[0-9]+', '#')"
    tpl_expr = f"array_join(slice(split({masked}, ' '), 1, 10), ' ')"
    tpl = d.select(
        "doc_id",
        F.expr(f"md5({tpl_expr})").alias("template_md5"),
        F.expr(f"CAST(length({tpl_expr}) AS BIGINT)").alias(
            "template_chars"
        ),
    )
    return (
        tpl.groupBy("template_md5")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(MIN(doc_id) AS BIGINT)").alias("min_doc_id"),
            F.max("template_chars").alias("template_chars"),
        )
        .filter(F.col("n_docs") >= 2)
        .select("template_md5", "n_docs", "min_doc_id", "template_chars")
    )


@query(
    "llm_ngram_novelty",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(str_split(text, ' ')) - {SHINGLE_WORDS - 1}, 1) + 1),
                   i -> array_to_string(list_slice(str_split(text, ' '), i, i + {SHINGLE_WORDS - 1}), ' ')
               ))) AS s
        FROM documents
    ),
    firsts AS (
        SELECT doc_id, s,
               MIN(doc_id) OVER (PARTITION BY s) AS first_doc
        FROM sh
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS novelty_ratio
    FROM firsts
    GROUP BY doc_id
    """,
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-novelty score per document: the fraction of its word-5-gram
    shingles that IT introduced to the corpus (no earlier doc_id carries
    them) — the incremental-information metric a curation loop uses to
    rank candidate batches ("does this crawl add anything?"), the
    temporal complement of dedup (dedup asks "seen before?", novelty
    asks "how much of this is first-seen?").

    Scale shape: one partial-aggregated groupBy over shingle hashes
    computes each shingle's minimum doc_id, then one equi-join back on
    the hash attributes first-ownership to postings — the llm_dedup_ngram
    shuffle topology WITHOUT the posting cap (min() keeps hot-shingle
    reducer state at one long, and the join back is 1:n on the already
    co-partitioned key, which AQE reuses). The oracle takes the
    independently-shaped window-over-postings form.

    Parity: counts are exact integers; the ratio is ONE division of
    identical exact operands (correctly-rounded IEEE — no quantize
    needed, the ts_bollinger rule). Shingles travel as xxhash64 longs
    (the llm_dedup_ngram collision argument: a 2^-64 collision can only
    merge shingles, identically in the count and the oracle-side string
    form at these corpus sizes).
    """
    sh = _shingle_hash_df(load(spark, sf_dir, "documents"))
    firsts = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_shingles"),
            F.expr(
                "CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (
                F.col("n_novel").cast("double") / F.col("n_shingles")
            ).alias("novelty_ratio"),
        )
    )


@query("llm_dedup_minhash_mllib", oracle=None)
def llm_dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates via Spark MLlib's estimator
    surface (pyspark.ml): HashingTF renders each document's word-shingle
    set as a sparse binary vector, MinHashLSH (seed pinned) fits hash
    tables, and approxSimilarityJoin emits candidate pairs under a
    Jaccard-distance threshold — the SAME near-dup shape as
    llm_dedup_near, expressed through the ML Pipeline API a user
    migrating MLlib code brings with them (the registry's one
    Transformer/Estimator pathway; everything else is DataFrame-native
    by design — this key certifies the engine hosts that surface too).

    Rows-only by design: MLlib's minhash permutations are internal to
    the model (seeded, deterministic ACROSS RUNS, but not reproducible
    in DuckDB SQL), and LSH recall below 1.0 makes candidate sets
    non-derivable by an independent oracle. The EXACT-dup subset is
    still cross-checked structurally: pairs at distance 0.0 must be
    text-identical (asserted in tests/test_properties.py). The custom
    engine-native twin llm_dedup_near carries the hash-green oracle.

    Scale shape: identical to every banded-LSH path here — candidate
    generation is a hash-bucket equi-join (approxSimilarityJoin lowers
    to explode-on-hash + join), linear in corpus, never all-pairs;
    distance re-scoring touches candidates only.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH, RegexTokenizer

    # NULL text (failed fetch) has no shingle set and can never be a
    # near-dup candidate; RegexTokenizer NPEs on nulls, so exclude them
    # at the scan — the same convention as every shingle-family key.
    # The coalesce is load-bearing even though the filter makes it a
    # semantic no-op: Catalyst collapses the downstream size(shingles)>0
    # filter into this one, and codegen's common-subexpression
    # elimination then hoists the tokenizer UDF ABOVE the isnotnull
    # conjunct — the hoisted call must be null-safe.
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text"))
    )
    toks = RegexTokenizer(
        inputCol="text", outputCol="words", pattern=" "
    ).transform(d)
    shingled = toks.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, greatest(size(words) - 4, 1)),"
            " i -> concat_ws(' ', slice(words, i, 5)))"
        ).alias("shingles"),
    )
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18,
        binary=True,
    ).transform(shingled)
    tf = tf.filter(F.expr("size(shingles) > 0"))
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=4, seed=42
    ).fit(tf)
    pairs = model.approxSimilarityJoin(
        tf, tf, threshold=0.6, distCol="jaccard_dist"
    )
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.expr("CAST(jaccard_dist AS DOUBLE)").alias("jaccard_dist"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
