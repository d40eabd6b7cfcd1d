"""Text analysis for training-data pipelines (north star, BASELINE.json):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All JVM built-ins — no Python in the hot path.

Scale notes: every operator here is a narrow projection or a single
hash-aggregation; token explosion (`llm_text_stats`) uses map-side partial
aggregation so the shuffle carries (lang, source) partials, not tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.session import stage
from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import DEC
from bitcoin_price_etl_spark.registry import query

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Real pipelines use character n-gram profiles (e.g. CLD-style);
# the mechanism — score per language, argmax — is identical.
_LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "und", "die"),
    "fr": ("le", "la", "et"),
}

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")


def _tok_count_sql(col: str = "text") -> str:
    return f"len(str_split({col}, ' '))"


@query(
    "llm_text_stats",
    oracle=f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST({_tok_count_sql()} AS BIGINT)) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MAX(CAST({_tok_count_sql()} AS BIGINT)) AS max_tokens
    FROM documents
    GROUP BY lang, source
    """,
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + per-(lang, source) corpus statistics.

    Token counts are integers — exact under any aggregation order, no
    decimal discipline needed.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.max(toks).alias("max_tokens"),
    )


@query(
    "llm_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST({_tok_count_sql()} AS BIGINT) AS n_tokens,
           CAST(len(list_filter(str_split(text, ' '),
                    x -> x IN {_STOPWORDS!r})) AS DOUBLE)
               / {_tok_count_sql()} AS stopword_ratio,
           CAST(n_chars AS DOUBLE) / {_tok_count_sql()} AS avg_token_len,
           CASE WHEN {_tok_count_sql()} BETWEEN 20 AND 80
                 AND CAST(len(list_filter(str_split(text, ' '),
                          x -> x IN {_STOPWORDS!r})) AS DOUBLE)
                     / {_tok_count_sql()} BETWEEN 0.05 AND 0.6
                THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS quality_pass
    FROM documents
    """,
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: token count, stopword ratio, mean token
    length, and a pass/fail gate — the C4/Gopher-style length+stopword
    filters expressed as pure column algebra."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    stop_arr = ", ".join(f"'{s}'" for s in _STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split(text, ' '), x -> x IN ({stop_arr})))"
    )
    stopword_ratio = n_stop.cast("double") / n_tokens
    avg_token_len = F.col("n_chars").cast("double") / n_tokens
    quality = F.when(
        n_tokens.between(20, 80) & stopword_ratio.between(0.05, 0.6), 1.0
    ).otherwise(0.0)
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        stopword_ratio.alias("stopword_ratio"),
        avg_token_len.alias("avg_token_len"),
        quality.alias("quality_pass"),
    )


@query(
    "llm_lang_id",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter(str_split(text, ' '), x -> x IN ('the','and','of'))) AS s_en,
               len(list_filter(str_split(text, ' '), x -> x IN ('el','la','de'))) AS s_es,
               len(list_filter(str_split(text, ' '), x -> x IN ('der','und','die'))) AS s_de,
               len(list_filter(str_split(text, ' '), x -> x IN ('le','la','et'))) AS s_fr
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 THEN 'und'
                WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS predicted_lang
    FROM scored
    """,
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID: per-language stopword hit counts →
    deterministic argmax (ties broken by fixed language priority en>es>de>fr,
    'und' when no marker hits)."""
    d = load(spark, sf_dir, "documents")
    scores = {}
    for lang, markers in _LANG_MARKERS.items():
        arr = ", ".join(f"'{m}'" for m in markers)
        scores[lang] = F.expr(f"size(filter(split(text, ' '), x -> x IN ({arr})))")
    no_hit = (
        (scores["en"] == 0) & (scores["es"] == 0) & (scores["de"] == 0) & (scores["fr"] == 0)
    )
    predicted = (
        F.when(no_hit, "und")
        .when(
            (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"]),
            "en",
        )
        .when((scores["es"] >= scores["de"]) & (scores["es"] >= scores["fr"]), "es")
        .when(scores["de"] >= scores["fr"], "de")
        .otherwise("fr")
    )
    return d.select("doc_id", "lang", predicted.alias("predicted_lang"))


@query(
    "llm_fingerprint",
    oracle="""
    WITH tok AS (
        SELECT doc_id, str_split(text, ' ') AS t FROM documents
        WHERE text IS NOT NULL
    ),
    sh AS (
        SELECT doc_id, unnest(list_transform(
            range(1, greatest(len(t) - 2, 1) + 1),
            i -> array_to_string(t[i:i + 2], ' ')
        )) AS shingle
        FROM tok
    )
    SELECT doc_id,
           MIN(md5(shingle)) AS fingerprint,
           COUNT(DISTINCT shingle) AS n_shingles
    FROM sh
    GROUP BY doc_id
    """,
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: minimum md5 over word-3-gram shingles — the
    winnowing/min-hash fingerprint selection rule (one representative hash
    per document, stable under reordering of equal content).

    NULL text has no fingerprint row (the shingle-family convention):
    without the filter Spark's concat_ws renders the NULL token array as
    one phantom '' shingle while DuckDB's unnest emits a NULL one — both
    fabrications, removed identically on both sides."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .withColumn("toks", F.split("text", " "))
    )
    # tokens materialized as a column: split() inlined in the lambda would
    # re-tokenize per element (see dedup._shingles_expr)
    shingles = F.expr(
        "transform(sequence(1, greatest(size(toks) - 2, 1)),"
        " i -> concat_ws(' ', slice(toks, i, 3)))"
    )
    sh = d.select("doc_id", F.explode(shingles).alias("shingle"))
    return sh.groupBy("doc_id").agg(
        F.min(F.md5("shingle")).alias("fingerprint"),
        F.countDistinct("shingle").alias("n_shingles"),
    )


# GPT-2-ish pretokenizer shape: word runs OR single non-word-non-space marks.
# Deliberately restricted to constructs Java regex and RE2 interpret
# identically (\w = [0-9A-Za-z_] in both without unicode flags).
BPE_PATTERN = r"\w+|[^\w\s]"


@query(
    "llm_token_bpe",
    oracle=f"""
    SELECT doc_id,
           len(str_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '{BPE_PATTERN.replace(chr(92), chr(92))}')) AS bpe_tokens,
           len(regexp_extract_all(text, '[^\\w\\s]')) AS punct_marks
    FROM documents
    """,
)
def llm_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting beyond whitespace: a BPE-style pretokenizer regex
    (word runs + individual punctuation marks — the GPT-2 pretokenize
    shape) next to the whitespace count, per document.

    The whitespace count UNDERcounts cost for punctuation-heavy text; the
    regex count is the budget-accurate one for training-data sizing. Both
    are single-pass JVM regex ops — no UDF, no shuffle (doc-level map)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)))
        .cast("long")
        .alias("bpe_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[^\w\s]"), F.lit(0)))
        .cast("long")
        .alias("punct_marks"),
    )


REP_NGRAM = 2
REP_DUP_FRAC_GATE = 0.2


@query(
    "llm_repetition_filter",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        WHERE text IS NOT NULL
    ), g AS (
        SELECT doc_id,
               list_transform(
                   range(1, greatest(len(toks) - {REP_NGRAM - 1}, 1) + 1),
                   i -> array_to_string(list_slice(toks, i, i + {REP_NGRAM - 1}), ' ')
               ) AS grams
        FROM t
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_bigrams,
           CAST(len(grams) - len(list_distinct(grams)) AS BIGINT) AS n_dup_bigrams,
           CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
               / CAST(len(grams) AS DOUBLE) AS dup_bigram_frac,
           (CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
               / CAST(len(grams) AS DOUBLE)) > {REP_DUP_FRAC_GATE} AS flagged
    FROM g
    """,
)
def llm_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition gate: the fraction of word bigrams that are
    duplicates of an earlier bigram in the same document — the
    duplicate-n-gram-fraction quality signal from the Gopher data-quality
    recipe (Rae et al. 2021, §A1.1); highly repetitive docs (boilerplate,
    keyword stuffing, generation loops) get flagged.

    No reference precedent (north star, BASELINE.json). Unlike the corpus
    dedup family this is doc-LOCAL: the whole computation is array
    expressions inside one projection — no explode, no shuffle, no UDF —
    so at 100 TB it runs at parquet scan throughput inside whole-stage
    codegen, exactly like llm_quality_score. Division parity: both
    engines divide the same exact integers as IEEE doubles.

    NULL text is excluded on both sides: there is no content to gate,
    and the engines' fabrications disagree (Spark's concat_ws makes one
    '' bigram → frac 0; DuckDB's list_distinct strips the NULL gram →
    frac 1 and a spurious flag).
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    grams = (
        f"transform(sequence(1, greatest(size(toks) - {REP_NGRAM - 1}, 1)),"
        f" i -> concat_ws(' ', slice(toks, i, {REP_NGRAM})))"
    )
    g = d.withColumn("toks", F.split("text", " ")).withColumn(
        "grams", F.expr(grams)
    )
    n = F.size("grams").cast("long")
    ndup = (F.size("grams") - F.size(F.array_distinct("grams"))).cast("long")
    frac = ndup.cast("double") / n.cast("double")
    return g.select(
        "doc_id",
        n.alias("n_bigrams"),
        ndup.alias("n_dup_bigrams"),
        frac.alias("dup_bigram_frac"),
        (frac > REP_DUP_FRAC_GATE).alias("flagged"),
    )


TFIDF_TOP_K = 3


@query(
    "llm_tfidf",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM tok GROUP BY doc_id, term
    ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), n AS (
        SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(CAST(tf.tf AS DOUBLE)
                    * (ln((CAST(n.n_docs AS DOUBLE) + 1.0)
                           / (CAST(df.df AS DOUBLE) + 1.0)) + 1.0)
                    AS DECIMAL(18,6)) AS qtfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    ), ranked AS (
        SELECT doc_id, term, tf, df, qtfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY qtfidf DESC, term ASC) AS rn
        FROM scored
    )
    SELECT doc_id, term, tf, df, CAST(qtfidf AS DOUBLE) AS tfidf
    FROM ranked WHERE rn <= {TFIDF_TOP_K}
    """,
)
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} characteristic terms per document by smoothed TF-IDF
    (tf · (ln((N+1)/(df+1)) + 1) — the sklearn smoothing) — the classic
    keyword/topic signal curation pipelines use for corpus slicing and
    per-domain reporting.

    Scale shape: tokenize-explode is a narrow map; tf and df are two
    partial-aggregated hash aggs; the tf⋈df equi-join shuffles on the
    uniform term key (AQE broadcasts df when the vocabulary is small —
    at web scale it stays a balanced shuffle join, never a skew cliff
    because df is one row per distinct term); N attaches as a 1-row
    broadcast. The per-doc top-k window runs over ≤ |doc vocabulary|
    rows after WindowGroupLimit pushdown.

    Parity: ln() may differ between libm builds in the last ulp, so the
    ranking value is quantized to DECIMAL(18,6) BEFORE the window sorts
    on it — both engines rank identical decimals (ties pinned by term) —
    and cast back to double at the edge per registry discipline."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
        ).alias("term"),
    )
    # tf feeds BOTH the document-frequency aggregate and the scoring
    # join: checkpoint so tokenization (the regexp explode over all text)
    # runs once instead of twice (r5 plan audit); at warehouse scale the
    # same frame persists to disk
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(stage)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.col("n_docs").cast("double") + F.lit(1.0))
                        / (F.col("df").cast("double") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
            )
            .cast("decimal(18,6)")
            .alias("qtfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("qtfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP_K)
        .select(
            "doc_id", "term", "tf", "df", F.col("qtfidf").cast("double").alias("tfidf")
        )
    )


@query(
    "llm_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents
    ), cnt AS (
        SELECT term, COUNT(*) AS c FROM tok GROUP BY term
    ), tot AS (
        SELECT COUNT(*) AS n FROM tok
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(CAST(SUM(ln(CAST(cnt.c AS DOUBLE))) / COUNT(*)
                     - (SELECT ln(CAST(n AS DOUBLE)) FROM tot)
                     AS DECIMAL(18,4)) AS DOUBLE) AS unigram_logprob
    FROM tok t JOIN cnt ON t.term = cnt.term
    GROUP BY t.doc_id
    """,
)
def llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram language-model scoring: mean per-token
    log-probability under the corpus's OWN unigram distribution —
    low-scoring documents are token-frequency outliers (gibberish, rare-
    symbol soup), the classic perplexity-proxy quality gate.

    Two-pass model-build-then-score, all engine-side: pass 1 aggregates
    the term histogram (the 'model' — one row per distinct term); pass 2
    re-joins tokens to their counts on the uniform term key and folds
    ln(count) per document, subtracting ln(total) once (avg ln(c/N) =
    avg ln(c) − ln N — halves the ln calls and avoids tiny quotients).
    At 100 TB both passes shuffle only (term, count) pairs; AQE broadcasts
    the histogram when the vocabulary is small.

    Parity: ln() is libm-dependent and the per-doc sum is
    partial-aggregated, so the final score is quantized through
    DECIMAL(18,4) then cast back to double (exprs.py quantize-then-double
    discipline; noise floor ~1e-11, quantum 1e-4)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
        ).alias("term"),
    )
    # cnt (vocab-sized) feeds the scoring join, and the corpus total
    # folds out of it algebraically (n = SUM(c), same exact integer) —
    # checkpoint cnt so tokenization runs twice (count build + scoring)
    # instead of three times (r5 plan audit)
    cnt = (
        tok.groupBy("term").agg(F.count(F.lit(1)).alias("c")).transform(stage)
    )
    tot = cnt.agg(F.sum("c").alias("n"))
    per = tok.join(cnt, "term").crossJoin(F.broadcast(tot))
    return (
        per.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(F.log(F.col("c").cast("double"))) / F.count(F.lit(1))
                - F.first(F.log(F.col("n").cast("double")))
            )
            .cast("decimal(18,4)")
            .cast("double")
            .alias("unigram_logprob"),
        )
    )


@query(
    "llm_data_card",
    oracle="""
    WITH t AS (
        SELECT source, lang,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
    ), tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS corpus_tokens FROM t
    )
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(CAST(CAST(SUM(n_tokens) AS DOUBLE)
                     / (SELECT CAST(corpus_tokens AS DOUBLE) FROM tot)
                     AS DECIMAL(18,8)) AS DOUBLE) AS token_share
    FROM t
    GROUP BY source, lang
    """,
)
def llm_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data card: per-(source, lang) provenance report — doc counts,
    token totals/extremes, character volume, and each slice's share of the
    corpus token budget. This is the governance artifact every training-
    data release ships (datasheets/data cards) and the input to mixture
    reweighting (llm_corpus_mix consumes exactly these shares).

    One partial-aggregated hash agg over (source, lang) — the shuffle
    carries a handful of longs per map partition per slice — plus a 1-row
    broadcast of the corpus total. Integer arithmetic end-to-end except
    token_share, which divides two exact longs-as-doubles and is quantized
    per the edge discipline."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
    tot = t.agg(F.sum("n_tokens").cast("long").alias("corpus_tokens"))
    return (
        t.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            "n_docs",
            "sum_tokens",
            "min_tokens",
            "max_tokens",
            "sum_chars",
            (
                F.col("sum_tokens").cast("double")
                / F.col("corpus_tokens").cast("double")
            )
            .cast("decimal(18,8)")
            .cast("double")
            .alias("token_share"),
        )
    )


VOCAB_MIN_COUNT = 5
VOCAB_TOP_K = 200


@query(
    "llm_vocab_build",
    oracle=f"""
    WITH toks AS (
        SELECT d.doc_id, t.token
        FROM documents d,
             unnest(string_split_regex(lower(d.text), '[^a-z]+'))
                 AS t(token)
        WHERE t.token <> ''
    ), counted AS (
        SELECT token,
               count(*) AS n_total,
               count(DISTINCT doc_id) AS n_docs
        FROM toks GROUP BY token
        HAVING count(*) >= {VOCAB_MIN_COUNT}
    )
    SELECT token, n_total, n_docs
    FROM counted
    ORDER BY n_total DESC, token
    LIMIT {VOCAB_TOP_K}
    """,
)
def llm_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary candidate build: corpus-wide token frequencies
    with a min-count floor, top-K by frequency — the first pass of any
    BPE/WordPiece vocab trainer (count the base units before merging).

    Scale shape: the classic word-count — explode shuffles (token,
    doc_id) pairs once, partial aggregation combines map-side so the
    exchange carries one row per distinct token per partition, not one
    per occurrence. The distinct doc-count uses Spark's two-level
    distinct expand on the SAME token partitioning (no second exchange);
    top-K is TakeOrderedAndProject — no global sort at any corpus size.

    Parity: pure integer counts over an identical tokenization
    ([^a-z]+ split of lower(); both regex engines agree on this ASCII
    class); ordering tie-pinned by token string.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("token"),
    ).filter(F.col("token") != "")
    counted = (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_total") >= VOCAB_MIN_COUNT)
    )
    return counted.orderBy(F.desc("n_total"), "token").limit(VOCAB_TOP_K)


@query(
    "llm_quality_ensemble",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id,
               len(str_split(text, ' ')) AS n_tok,
               len(list_distinct(str_split(text, ' '))) AS n_uniq,
               len(list_filter(str_split(text, ' '),
                   x -> x IN {_STOPWORDS!r})) AS n_stop,
               n_chars
        FROM documents
    ), gates AS (
        SELECT doc_id,
               CASE WHEN n_tok BETWEEN 20 AND 80 THEN 1 ELSE 0 END
                   AS g_length,
               CASE WHEN n_stop * 20 >= n_tok AND n_stop * 5 <= n_tok * 3
                    THEN 1 ELSE 0 END AS g_stopword,
               CASE WHEN n_chars * 1 >= n_tok * 3
                     AND n_chars * 1 <= n_tok * 12 THEN 1 ELSE 0 END
                   AS g_tokenlen,
               CASE WHEN n_uniq * 2 >= n_tok THEN 1 ELSE 0 END AS g_diversity
        FROM feat
    )
    SELECT doc_id, g_length, g_stopword, g_tokenlen, g_diversity,
           CAST(0.4 * g_length + 0.2 * g_stopword + 0.2 * g_tokenlen
                + 0.2 * g_diversity AS DOUBLE) AS ensemble_score,
           CASE WHEN 0.4 * g_length + 0.2 * g_stopword + 0.2 * g_tokenlen
                     + 0.2 * g_diversity >= 0.8
                THEN 1 ELSE 0 END AS keep
    FROM gates
    """,
)
def llm_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-rule quality gate (the Gopher/FineWeb ensemble pattern):
    length band, stopword-ratio band, mean-token-length band, and
    lexical-diversity gates combined into a weighted score with a keep
    threshold.

    Every gate is an INTEGER cross-multiplication comparison (n_stop/n_tok
    ≥ 0.05 becomes n_stop·20 ≥ n_tok), so no gate can flap on a float
    boundary in either engine; the ensemble score is a weighted sum of
    0/1 ints — a handful of exact IEEE products. Zero-shuffle projection
    over one scan (the rule set widens at no extra pass: at 100 TB this
    is the shape that matters — N rules must not mean N scans).
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    stop_arr = ", ".join(f"'{s}'" for s in _STOPWORDS)
    n_stop = F.expr(f"size(filter(split(text, ' '), x -> x IN ({stop_arr})))")
    g_length = F.when(n_tok.between(20, 80), 1).otherwise(0)
    g_stopword = F.when(
        (n_stop * 20 >= n_tok) & (n_stop * 5 <= n_tok * 3), 1
    ).otherwise(0)
    g_tokenlen = F.when(
        (F.col("n_chars") >= n_tok * 3) & (F.col("n_chars") <= n_tok * 12), 1
    ).otherwise(0)
    g_diversity = F.when(n_uniq * 2 >= n_tok, 1).otherwise(0)
    gated = d.select(
        "doc_id",
        g_length.alias("g_length"),
        g_stopword.alias("g_stopword"),
        g_tokenlen.alias("g_tokenlen"),
        g_diversity.alias("g_diversity"),
    )
    # SQL-text literals on purpose: both engines then parse 0.4/0.2 as
    # DECIMALs and sum exactly (0.6, not 0.6000000000000001) before the
    # single cast to double — Python float literals would push Spark into
    # IEEE addition while DuckDB stays decimal, a guaranteed mismatch.
    score_sql = (
        "0.4 * g_length + 0.2 * g_stopword + 0.2 * g_tokenlen"
        " + 0.2 * g_diversity"
    )
    return gated.select(
        "*",
        F.expr(f"CAST({score_sql} AS DOUBLE)").alias("ensemble_score"),
        F.expr(f"CASE WHEN {score_sql} >= 0.8 THEN 1 ELSE 0 END").alias(
            "keep"
        ),
    )


# One BPE trainer iteration surfaces the top merge candidates; real
# trainers run this to ~50k merges with the word-count frame cached.
BPE_TOP_MERGES = 50


@query(
    "llm_bpe_merge_step",
    oracle=f"""
    WITH words AS (
        SELECT t.w FROM documents d,
             unnest(regexp_extract_all(lower(d.text), '[a-z]+')) AS t(w)
    ), wc AS (
        SELECT w, count(*) AS c FROM words WHERE length(w) >= 2 GROUP BY w
    ), pairs AS (
        SELECT substr(w, i, 2) AS pair, w, c
        FROM wc, unnest(generate_series(1, length(w) - 1)) AS t(i)
    )
    SELECT pair, CAST(sum(c) AS BIGINT) AS freq,
           CAST(count(DISTINCT w) AS BIGINT) AS n_word_forms
    FROM pairs GROUP BY pair
    ORDER BY freq DESC, pair LIMIT {BPE_TOP_MERGES}
    """,
)
def llm_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-trainer merge iteration: corpus-weighted adjacent
    symbol-pair frequencies, top candidates by frequency — the step a
    tokenizer trainer repeats (count pairs, merge the winner, recount)
    to learn its merge table. Complements llm_vocab_build (base-unit
    counts) and llm_token_bpe (applying a learned tokenizer).

    Scale shape: THE trick that makes BPE training feasible at corpus
    scale — aggregate the corpus to the word-count frame FIRST (one
    word-keyed shuffle with map-side partial aggregation; the frame is
    vocabulary-sized, ~10^5-10^6 rows no matter how many PB of text),
    then explode pairs over the tiny frame only, weighted by word count.
    The pair explosion never touches the corpus; successive trainer
    iterations re-scan only the cached word frame. Top-K is
    TakeOrderedAndProject — no global sort.

    Parity: identical [a-z]+ tokenization (ASCII class, both regex
    engines agree), exact integer weighted counts, ordering tie-pinned
    by pair string."""
    d = load(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit("[a-z]+"), 0
            )
        ).alias("w")
    ).filter(F.length("w") >= 2)
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    pairs = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1),"
                   " i -> substring(w, i, 2))")
        ).alias("pair"),
        "w",
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("c").alias("freq"),
            F.countDistinct("w").alias("n_word_forms"),
        )
        .orderBy(F.desc("freq"), "pair")
        .limit(BPE_TOP_MERGES)
    )


@query(
    "llm_lang_entropy",
    oracle="""
    WITH c AS (
        SELECT source, lang, COUNT(*) AS cnt
        FROM documents GROUP BY source, lang
    ), g AS (
        SELECT source, SUM(cnt) AS n, COUNT(*) AS n_langs,
               SUM(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS s
        FROM c GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           CAST(n_langs AS BIGINT) AS n_langs,
           CAST(CAST(ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE)
                     AS DECIMAL(14,8)) AS DOUBLE) AS lang_entropy_nats,
           CAST(CAST(CASE WHEN n_langs > 1
                          THEN (ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE))
                               / ln(CAST(n_langs AS DOUBLE))
                          ELSE 0.0 END
                     AS DECIMAL(14,8)) AS DOUBLE) AS lang_entropy_norm
    FROM g
    """,
)
def llm_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-diversity audit per source: Shannon entropy (nats) and
    normalized entropy of each source's language distribution — the
    corpus-composition diagnostic next to llm_data_card's volume counts
    (a source whose entropy collapses release-over-release is silently
    becoming monolingual; normalized entropy compares sources with
    different language counts on one [0,1] scale).

    Scale shape: two stacked partial aggregates — (source, lang) counts,
    then per-source entropy from those ≤|langs| rows; the corpus
    shuffles once on (source, lang) partials and the entropy math runs
    on a frame the size of the source×lang grid. H = ln(n) − Σc·ln(c)/n
    avoids forming tiny p quotients per term.

    Parity: counts are exact; ln() is libm-dependent so both entropy
    outputs quantize through DECIMAL(14,8) then back to double (the
    llm_unigram_logprob rule; noise ~1e-13 vs quantum 1e-8)."""
    d = load(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    g = c.groupBy("source").agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).alias("n_langs"),
        F.sum(
            F.col("cnt").cast("double") * F.log(F.col("cnt").cast("double"))
        ).alias("s"),
    )
    h = F.log(F.col("n").cast("double")) - F.col("s") / F.col("n").cast(
        "double"
    )
    return g.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("n_langs").cast("long").alias("n_langs"),
        h.cast("decimal(14,8)").cast("double").alias("lang_entropy_nats"),
        F.when(
            F.col("n_langs") > 1,
            h / F.log(F.col("n_langs").cast("double")),
        )
        .otherwise(F.lit(0.0))
        .cast("decimal(14,8)")
        .cast("double")
        .alias("lang_entropy_norm"),
    )


# Cross-split perplexity gate: eval docs are scored under a unigram model
# built ONLY from the train split (doc_id % mod != rem is train), with
# add-1 smoothing so unseen terms score ln(1/(N+V)) instead of -inf.
PPX_EVAL_MOD = 10
PPX_EVAL_REM = 0
PPX_KEEP_MIN_LOGPROB = -8.0


@query(
    "llm_perplexity_filter",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents
    ),
    train AS (
        SELECT term FROM tok WHERE doc_id % {PPX_EVAL_MOD} != {PPX_EVAL_REM}
    ),
    model AS (
        SELECT term, COUNT(*) AS c FROM train GROUP BY term
    ),
    denom AS (
        SELECT (SELECT COUNT(*) FROM train)
             + (SELECT COUNT(*) FROM model) AS nv
    ),
    ev AS (
        SELECT t.doc_id,
               ln((coalesce(m.c, 0) + 1.0) / (SELECT nv FROM denom)) AS lp
        FROM tok t LEFT JOIN model m ON t.term = m.term
        WHERE t.doc_id % {PPX_EVAL_MOD} = {PPX_EVAL_REM}
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(CAST(SUM(lp) / COUNT(*) AS DECIMAL(18,4)) AS DOUBLE)
               AS mean_logprob,
           CAST(SUM(lp) / COUNT(*) AS DECIMAL(18,4))
               >= {PPX_KEEP_MIN_LOGPROB} AS keep
    FROM ev GROUP BY doc_id
    """,
)
def llm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out perplexity quality gate (the CCNet/Gopher filter shape
    done honestly): a unigram model with add-1 smoothing is fit on the
    TRAIN split only (doc_id mod 10 ≠ 0) and scores the EVAL split —
    unlike llm_unigram_logprob (self-scored, a frequency-outlier
    detector), this is out-of-distribution scoring: an eval doc full of
    terms the training corpus never saw sinks toward ln(1/(N+V)) and is
    flagged keep=false. Emits every eval doc with token count, mean
    log-probability, and the keep decision.

    Scale shape: one token explode feeds both splits (Catalyst reuses the
    scan); the model is a (term, count) aggregate — partial-combined
    map-side, vocabulary-sized output that AQE broadcasts into the eval
    probe join, so eval tokens never shuffle. N+V is a 1-row broadcast.
    Swapping the split predicate for a real benchmark table turns this
    into llm_decontaminate's sibling scored gate, same plan.

    Parity: ln on identical doubles plus a partial-agg sum — the mean
    quantizes through DECIMAL(18,4) (quantize-then-double rule); the keep
    flag compares the QUANTIZED value on both sides so the gate cannot
    straddle an ulp."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
        ).alias("term"),
    )
    train = tok.filter(F.col("doc_id") % PPX_EVAL_MOD != PPX_EVAL_REM)
    # the vocab-sized model feeds the smoothing denominator AND the eval
    # join: checkpoint it, and fold the train token count out of the raw
    # stream algebraically (n = SUM(c) over the model — same exact
    # integer), so tokenization runs twice total (model build + eval
    # scoring) instead of four times (r5 plan audit)
    model = (
        train.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(stage)
    )
    nv = model.agg(
        (F.sum("c") + F.count(F.lit(1))).cast("double").alias("nv")
    )
    ev = (
        tok.filter(F.col("doc_id") % PPX_EVAL_MOD == PPX_EVAL_REM)
        .join(model, "term", "left")
        .crossJoin(F.broadcast(nv))
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0)) / F.col("nv")
            ).alias("lp"),
        )
    )
    mean_q = (F.sum("lp") / F.count(F.lit(1))).cast("decimal(18,4)")
    return ev.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        mean_q.cast("double").alias("mean_logprob"),
        (mean_q >= PPX_KEEP_MIN_LOGPROB).alias("keep"),
    )


# Bigram LM head: top-N bigrams by count; add-1-smoothed conditional
# log-probability ln((c2+1)/(c1+V)) under whitespace tokenization (the
# shingle family's tokenizer, multiplicity kept).
BIGRAM_TOP_N = 100


@query(
    "llm_bigram_lm",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, str_split(text, ' ') AS t FROM documents
    ),
    uni AS (
        SELECT unnest(t) AS w FROM tok
    ),
    c1 AS (
        SELECT w, COUNT(*) AS c FROM uni GROUP BY w
    ),
    vocab AS (
        SELECT COUNT(*) AS v FROM c1
    ),
    bg AS (
        SELECT unnest(list_transform(
            range(1, greatest(len(t) - 1, 0) + 1),
            i -> struct_pack(w1 := t[i], w2 := t[i + 1])
        )) AS p
        FROM tok WHERE len(t) >= 2
    ),
    c2 AS (
        SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS c FROM bg GROUP BY 1, 2
    )
    SELECT w1, w2, CAST(c2.c AS BIGINT) AS bigram_count,
           CAST(c1.c AS BIGINT) AS unigram_count,
           CAST(CAST(ln((c2.c + 1.0) / (c1.c + (SELECT v FROM vocab)))
                AS DECIMAL(18,6)) AS DOUBLE) AS cond_logprob
    FROM c2 JOIN c1 ON c2.w1 = c1.w
    ORDER BY bigram_count DESC, w1, w2
    LIMIT {BIGRAM_TOP_N}
    """,
)
def llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model head: the corpus's top-{BIGRAM_TOP_N}
    bigrams with add-1-smoothed conditional log-probability
    ln((c(w1,w2)+1)/(c(w1)+V)) — the model table a Kneser-Ney-style LM
    quality filter or a wordlist-based lang-ID would consume, built with
    the same whitespace tokenizer as the shingle/dedup family (multiplicity
    kept — counts, not sets).

    Scale shape: bigrams are built IN the token array (transform over
    sequence indices — no positional self-join, no window over a
    corpus-length ordering) and explode straight into a bigram count —
    one partial-combined aggregate whose output is vocabulary², heavy-
    tail-truncated to top-N via TakeOrderedAndProject (no global sort
    materializes). The exploded value is ONE concat string per bigram,
    split into (w1, w2) only AFTER aggregation shrinks the stream to the
    distinct-bigram table (the struct-per-position formulation measured
    2-20× slower at 8× data from allocation/GC pressure — two string
    cells plus a struct wrapper per position vs one string; tokens come
    from a space split so the space separator cannot be ambiguous). The
    unigram table attaches by w1 equi-join AFTER both sides aggregated;
    V is a 1-row broadcast. At 100 TB the shuffled payload is
    (token-pair, count) — never document text.

    Parity: integer counts exact; the single ln quantizes through
    DECIMAL(18,6). Ordering is deterministic under the (count desc, w1,
    w2) tie-break; the driver compare is order-insensitive anyway."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(F.split("text", " ").alias("t"))
    uni = tok.select(F.explode("t").alias("w"))
    # c1 (vocab-sized) feeds both the vocab scalar and the smoothing
    # join: checkpoint so the unigram tokenize-aggregate runs once
    # (r5 plan audit: 3 corpus scans -> 2)
    c1 = (
        uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1")).transform(stage)
    )
    vocab = c1.agg(F.count(F.lit(1)).cast("double").alias("v"))
    bg = tok.filter(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> concat(element_at(t, i + 1), ' ',"
                " element_at(t, i + 2)))"
            )
        ).alias("bg")
    )
    c2 = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("bigram_count"))
        .select(
            F.split("bg", " ").getItem(0).alias("w1"),
            F.split("bg", " ").getItem(1).alias("w2"),
            "bigram_count",
        )
    )
    return (
        c2.join(c1.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            "bigram_count",
            F.col("c1").alias("unigram_count"),
            F.log(
                (F.col("bigram_count") + F.lit(1.0))
                / (F.col("c1") + F.col("v"))
            )
            .cast("decimal(18,6)")
            .cast("double")
            .alias("cond_logprob"),
        )
        .orderBy(F.col("bigram_count").desc(), "w1", "w2")
        .limit(BIGRAM_TOP_N)
    )


@query(
    "llm_diversity_index",
    oracle="""
    WITH slice AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY lang, source
    ),
    tot AS (
        SELECT lang, source, n,
               CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS n_lang,
               CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS k
        FROM slice
    ),
    terms AS (
        SELECT lang, n_lang, k,
               CAST(-(CAST(n AS DOUBLE) / n_lang)
                    * ln(CAST(n AS DOUBLE) / n_lang)
                    AS DECIMAL(18,8)) AS h_term,
               CAST((CAST(n AS DOUBLE) / n_lang)
                    * (CAST(n AS DOUBLE) / n_lang)
                    AS DECIMAL(18,8)) AS hhi_term
        FROM tot
    )
    SELECT lang,
           CAST(MAX(n_lang) AS BIGINT) AS n_docs,
           CAST(MAX(k) AS BIGINT) AS n_sources,
           CAST(SUM(h_term) AS DOUBLE) AS entropy_nats,
           CASE WHEN MAX(k) = 1 THEN CAST(1.0 AS DOUBLE)
                ELSE CAST(CAST(
                     CAST(SUM(h_term) AS DOUBLE)
                     / CAST(CAST(ln(CAST(MAX(k) AS DOUBLE))
                                 AS DECIMAL(18,8)) AS DOUBLE)
                     AS DECIMAL(18,6)) AS DOUBLE) END AS entropy_norm,
           CAST(CAST(exp(CAST(SUM(h_term) AS DOUBLE))
                AS DECIMAL(18,6)) AS DOUBLE) AS effective_sources,
           CAST(SUM(hhi_term) AS DOUBLE) AS hhi
    FROM terms GROUP BY lang
    """,
)
def llm_diversity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity report per language: Shannon entropy of the source
    mixture, normalized entropy (vs the uniform log K ceiling), effective
    source count (exp H — the mixture's "perplexity"), and the Herfindahl
    concentration index. These are the data-card diversity lines a corpus
    release quotes (llm_data_card gives the raw shares; this is the
    one-number-per-language summary mixture tuning monitors — a falling
    effective-source count flags creeping single-domain dominance).

    Parity: slice counts are exact longs; each share p = n/N is ONE double
    quotient on identical operands; the libm-carrying terms (-p*ln p, p^2)
    quantize through DECIMAL(18,8) per term BEFORE summing, so the sums
    are exact decimal arithmetic — order-insensitive, immune to partial-agg
    regrouping (the exprs.py quantize-then-double rule applied per-term
    because ln differs in the last ulp between JVM and C libm). ln(K) and
    exp(H) re-quantize at the edge. Single-source languages pin
    entropy_norm to 1.0 (the 0/0 case) identically in both engines.

    Scale shape: groupBy(lang, source) partial-aggregates to the slice
    grid (tiny), a per-lang window over that grid (rows = slices, not
    docs), then a per-lang agg of the grid — after the first exchange
    everything operates on O(langs x sources) rows. The corpus itself is
    touched once, map-side. Flat at any scale.
    """
    d = load(spark, sf_dir, "documents")
    slice_df = d.groupBy("lang", "source").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")
    )
    tot = slice_df.select(
        "lang",
        "n",
        F.expr(
            "CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT)"
        ).alias("n_lang"),
        F.expr(
            "CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT)"
        ).alias("k"),
    )
    terms = tot.select(
        "lang",
        "n_lang",
        "k",
        F.expr(
            """CAST(-(CAST(n AS DOUBLE) / n_lang)
               * ln(CAST(n AS DOUBLE) / n_lang) AS DECIMAL(18,8))"""
        ).alias("h_term"),
        F.expr(
            """CAST((CAST(n AS DOUBLE) / n_lang)
               * (CAST(n AS DOUBLE) / n_lang) AS DECIMAL(18,8))"""
        ).alias("hhi_term"),
    )
    return terms.groupBy("lang").agg(
        F.expr("CAST(MAX(n_lang) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(MAX(k) AS BIGINT)").alias("n_sources"),
        F.expr("CAST(SUM(h_term) AS DOUBLE)").alias("entropy_nats"),
        F.expr(
            """CASE WHEN MAX(k) = 1 THEN CAST(1.0D AS DOUBLE)
               ELSE CAST(CAST(
                    CAST(SUM(h_term) AS DOUBLE)
                    / CAST(CAST(ln(CAST(MAX(k) AS DOUBLE))
                                AS DECIMAL(18,8)) AS DOUBLE)
                    AS DECIMAL(18,6)) AS DOUBLE) END"""
        ).alias("entropy_norm"),
        F.expr(
            """CAST(CAST(exp(CAST(SUM(h_term) AS DOUBLE))
               AS DECIMAL(18,6)) AS DOUBLE)"""
        ).alias("effective_sources"),
        F.expr("CAST(SUM(hhi_term) AS DOUBLE)").alias("hhi"),
    )


_ROUTE_ENG = ("table", "query", "join", "scan", "index", "merge", "filter")
_ROUTE_COM = ("customer", "order", "part", "supplier", "price", "ship")


def _duck_lexicon_count(words: tuple) -> str:
    return (
        "len(list_filter(str_split(text, ' '), w -> w IN ("
        + ", ".join(f"'{w}'" for w in words)
        + ")))"
    )


def _spark_lexicon_count(words: tuple) -> str:
    return (
        "size(filter(split(text, ' '), w -> w IN ("
        + ", ".join(f"'{w}'" for w in words)
        + ")))"
    )


@query(
    "llm_domain_route",
    oracle=f"""
    WITH sig AS (
        SELECT doc_id, lang,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words,
               CAST({_duck_lexicon_count(_ROUTE_ENG)} AS BIGINT) AS n_eng,
               CAST({_duck_lexicon_count(_ROUTE_COM)} AS BIGINT) AS n_com
        FROM documents
    )
    SELECT doc_id, lang, n_words, n_eng, n_com,
           CAST(n_eng AS DOUBLE) / n_words AS eng_density,
           CAST(n_com AS DOUBLE) / n_words AS com_density,
           CASE WHEN n_eng * 20 < n_words AND n_com * 20 < n_words
                     THEN 'general'
                WHEN n_eng >= n_com THEN 'data-eng'
                ELSE 'commerce' END AS domain
    FROM sig
    """,
)
def llm_domain_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based domain router: per-document keyword densities for
    two domain vocabularies (data-engineering vs commerce terms) decide
    which downstream pipeline a crawl document feeds — the cheap
    first-stage router mixed-corpus curation runs before any model-based
    classifier (each domain then gets its own quality gates and
    dedup pool). Documents under 5% density in every lexicon route to
    'general'; ties break deterministically toward the first lexicon.

    Parity: word counts are exact integers from identical
    split-and-filter semantics (exact whole-word equality — no substring
    false hits); densities are single correctly-rounded divisions of
    exact operands; the routing decision compares INTEGERS only
    (n*20 < n_words avoids any float threshold) — bit-identical
    everywhere.

    Scale shape: a zero-shuffle projection riding the corpus scan
    (higher-order array functions stay inside whole-stage codegen —
    no UDF). Flat at any corpus size.
    """
    d = load(spark, sf_dir, "documents")
    sig = d.select(
        "doc_id",
        "lang",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n_words"),
        F.expr(
            f"CAST({_spark_lexicon_count(_ROUTE_ENG)} AS BIGINT)"
        ).alias("n_eng"),
        F.expr(
            f"CAST({_spark_lexicon_count(_ROUTE_COM)} AS BIGINT)"
        ).alias("n_com"),
    )
    return sig.select(
        "doc_id",
        "lang",
        "n_words",
        "n_eng",
        "n_com",
        F.expr("CAST(n_eng AS DOUBLE) / n_words").alias("eng_density"),
        F.expr("CAST(n_com AS DOUBLE) / n_words").alias("com_density"),
        F.expr(
            """CASE WHEN n_eng * 20 < n_words AND n_com * 20 < n_words
                    THEN 'general'
               WHEN n_eng >= n_com THEN 'data-eng'
               ELSE 'commerce' END"""
        ).alias("domain"),
    )


_BM25_QUERY = ("table", "join", "merge")  # the fixed probe query
_BM25_K1, _BM25_B = "1.2", "0.75"
_BM25_TOPK = 20


@query(
    "llm_bm25_rank",
    oracle=f"""
    WITH doclen AS (
        SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS dl,
               text
        FROM documents
    ),
    avgl AS (
        SELECT doc_id, dl, text,
               CAST(SUM(dl) OVER () AS DOUBLE)
                   / (COUNT(*) OVER ()) AS avgdl,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_docs
        FROM doclen
    ),
    tf AS (
        SELECT a.doc_id, a.dl, a.avgdl, a.n_docs, q.term,
               CAST(len(list_filter(str_split(a.text, ' '),
                        w -> w = q.term)) AS BIGINT) AS f
        FROM avgl a CROSS JOIN (
            SELECT unnest([{", ".join(f"'{t}'" for t in _BM25_QUERY)}])
                AS term
        ) q
    ),
    df AS (
        SELECT term, CAST(SUM(CASE WHEN f > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_df
        FROM tf GROUP BY term
    ),
    ratio AS (
        SELECT t.doc_id, t.f, d.n_df, t.n_docs,
               CAST(CAST(t.dl AS DOUBLE) / t.avgdl AS DECIMAL(18,12)) AS r_q
        FROM tf t JOIN df d ON t.term = d.term
    ),
    scored AS (
        SELECT doc_id,
               CAST(
                   CAST(CAST(ln((CAST(n_docs - n_df AS DOUBLE) + 0.5)
                           / (CAST(n_df AS DOUBLE) + 0.5) + 1.0)
                        AS DECIMAL(18,10)) AS DOUBLE)
                   * CAST(CAST(CAST(f * CAST(2.2 AS DECIMAL(2,1)) AS DOUBLE)
                       / CAST(f + CAST(1.2 AS DECIMAL(2,1))
                          * (CAST(0.25 AS DECIMAL(3,2))
                             + CAST(0.75 AS DECIMAL(3,2)) * r_q)
                          AS DOUBLE)
                       AS DECIMAL(18,10)) AS DOUBLE)
                   AS DECIMAL(18,10)) AS term_score
        FROM ratio
    )
    SELECT doc_id, CAST(SUM(term_score) AS DOUBLE) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT {_BM25_TOPK}
    """,
)
def llm_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance ranking of the corpus against a fixed probe query —
    the retrieval scorer (Robertson-Sparck Jones; the Lucene/retrieval-
    pipeline default) behind RAG candidate selection and dedup-aware
    search, completing the text stack: llm_tfidf builds WEIGHTS,
    this RANKS against a query with length normalization and term
    saturation (k1 = 1.2, b = 0.75, the +1 idf smoothing that keeps
    scores positive).

    Parity: term frequencies, document lengths, and document
    frequencies are exact integers from whole-word splits; avgdl is one
    exact-sum division. The idf carries libm ln -> quantized
    DECIMAL(18,10); the saturation factor is a correctly-rounded chain
    of identical operands, quantized to the same scale so the per-term
    product is EXACT decimal x decimal; per-doc sums are exact decimal;
    k1/b literals appear only inside quantized factors (decimal-literal
    trap contained). Top-k orders by (bm25 DESC, doc_id) — total order.

    Scale shape: the x|query| expand rides the corpus scan map-side
    (bounded by query length); df is a tiny per-term aggregate
    broadcast back; the final is TakeOrderedAndProject — no global
    sort. At 100 TB the same plan serves batched query sets by making
    the query a broadcast table (the llm_hard_negatives posture).
    """
    d = load(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id",
        "text",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("dl"),
    )
    # corpus stats via a 1-row broadcast aggregate — never OVER () on the
    # raw corpus (the agg_theil_index single-partition cliff)
    corpus = lens.agg(
        F.expr("CAST(SUM(dl) AS DOUBLE) / COUNT(*)").alias("avgdl"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
    )
    avgl = lens.crossJoin(F.broadcast(corpus))
    tf = avgl.select(
        "doc_id",
        "dl",
        "avgdl",
        "n_docs",
        F.explode(
            F.expr(
                "array(" + ", ".join(f"'{t}'" for t in _BM25_QUERY) + ")"
            )
        ).alias("term"),
        "text",
    ).select(
        "doc_id",
        "dl",
        "avgdl",
        "n_docs",
        "term",
        F.expr(
            "CAST(size(filter(split(text, ' '), w -> w = term)) AS BIGINT)"
        ).alias("f"),
    )
    # tf feeds BOTH the document-frequency aggregate and the scoring
    # join: checkpoint so the per-term text filter-count runs once
    # instead of twice (r5 plan audit)
    tf = tf.transform(stage)
    df = tf.groupBy("term").agg(
        F.expr(
            "CAST(SUM(CASE WHEN f > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_df")
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .select(
            "doc_id",
            "f",
            "n_df",
            "n_docs",
            F.expr(
                "CAST(CAST(dl AS DOUBLE) / avgdl AS DECIMAL(18,12))"
            ).alias("r_q"),
        )
        .select(
            "doc_id",
            F.expr(
                """CAST(
                   CAST(CAST(ln((CAST(n_docs - n_df AS DOUBLE) + 0.5D)
                           / (CAST(n_df AS DOUBLE) + 0.5D) + 1.0D)
                        AS DECIMAL(18,10)) AS DOUBLE)
                   * CAST(CAST(CAST(f * CAST(2.2 AS DECIMAL(2,1)) AS DOUBLE)
                       / CAST(f + CAST(1.2 AS DECIMAL(2,1))
                          * (CAST(0.25 AS DECIMAL(3,2))
                             + CAST(0.75 AS DECIMAL(3,2)) * r_q)
                          AS DOUBLE)
                       AS DECIMAL(18,10)) AS DOUBLE)
                   AS DECIMAL(18,10))"""
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.expr("CAST(SUM(term_score) AS DOUBLE)").alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )


_OOV_VOCAB_K = 20  # vocabulary: top-20 corpus terms by frequency


@query(
    "llm_oov_rate",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, unnest(str_split(text, ' ')) AS w
        FROM documents
    ),
    vocab AS (
        SELECT w FROM (
            SELECT w, COUNT(*) AS c,
                   row_number() OVER (ORDER BY COUNT(*) DESC, w) AS rn
            FROM words GROUP BY w
        ) WHERE rn <= {_OOV_VOCAB_K}
    )
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS oov_rate
    FROM words w LEFT JOIN vocab v ON w.w = v.w
    GROUP BY w.doc_id
    """,
)
def llm_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's top-20
    terms: the tokenizer-coverage audit run before committing a
    vocabulary (llm_vocab_build builds one; this measures what each
    document would LOSE under it — high-OOV docs signal domain shift or
    junk, and the corpus-level OOV curve sizes the vocab). The
    fixed-K vocabulary pick is total-ordered (count DESC, term) so both
    engines choose identical vocabularies even on tied frequencies.

    Parity: token and OOV counts are exact integers from identical
    whole-word splits; the rate is one correctly-rounded division.
    Nothing to quantize.

    Scale shape: one word explode rides the scan; the vocabulary is a
    partial-aggregated top-K (WindowGroupLimit over the term grid)
    BROADCAST back as a left join; the per-doc aggregate re-collapses
    map-side. Two linear passes, no corpus shuffle on text.
    """
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "w",
            F.expr("row_number() OVER (ORDER BY c DESC, w)").alias("rn"),
        )
        .filter(F.col("rn") <= _OOV_VOCAB_K)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    return (
        words.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_tokens"),
            F.expr(
                "CAST(SUM(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_oov"),
            F.expr(
                "CAST(SUM(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)"
                " AS DOUBLE) / COUNT(*)"
            ).alias("oov_rate"),
        )
    )


@query(
    "llm_judge_agreement",
    oracle="""
    WITH judged AS (
        SELECT doc_id,
               len(list_filter(str_split(text, ' '),
                   w -> w IN ('table', 'query', 'join', 'scan', 'index',
                              'merge', 'filter'))) * 20
                   >= len(str_split(text, ' ')) AS judge_a,
               len(list_filter(str_split(text, ' '), w -> w = 'table')) >= 2
                   AS judge_b
        FROM documents
    ),
    cells AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN judge_a AND judge_b THEN 1 ELSE 0 END)
                    AS BIGINT) AS both_pos,
               CAST(SUM(CASE WHEN NOT judge_a AND NOT judge_b THEN 1 ELSE 0
                    END) AS BIGINT) AS both_neg,
               CAST(SUM(CASE WHEN judge_a THEN 1 ELSE 0 END) AS BIGINT)
                   AS a_pos,
               CAST(SUM(CASE WHEN judge_b THEN 1 ELSE 0 END) AS BIGINT)
                   AS b_pos
        FROM judged
    )
    SELECT n, both_pos, both_neg, a_pos, b_pos,
           CAST(both_pos + both_neg AS DOUBLE) / n AS p_observed,
           CAST(a_pos * b_pos + (n - a_pos) * (n - b_pos) AS DOUBLE)
               / CAST(n * n AS DOUBLE) AS p_expected,
           CAST(n * (both_pos + both_neg)
                - (a_pos * b_pos + (n - a_pos) * (n - b_pos)) AS DOUBLE)
               / CAST(n * n
                - (a_pos * b_pos + (n - a_pos) * (n - b_pos)) AS DOUBLE)
               AS cohens_kappa
    FROM cells
    """,
)
def llm_judge_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document judges (the
    domain-density gate vs a keyword-count gate): chance-corrected
    inter-rater agreement — the metric an LLM-judge pipeline reports
    before trusting a cheap heuristic as a proxy for an expensive one
    (raw agreement flatters judges that both just say 'yes'; kappa
    subtracts the chance floor).

    Parity: the contingency cells and both marginals are exact
    integers; kappa's textbook form (po - pe)/(1 - pe) carries a
    product-difference in doubles, so it is restated as
    (n*agree - pe_num) / (n^2 - pe_num) with pe_num = a+b+ marginal
    products — EXACT BIGINT arithmetic end to end, then ONE
    correctly-rounded division. No quantization, no FMA exposure.

    Scale shape: one zero-shuffle judged projection riding the scan,
    collapsed to a single 5-counter row. Flat.
    """
    d = load(spark, sf_dir, "documents")
    judged = d.select(
        F.expr(
            "size(filter(split(text, ' '),"
            " w -> w IN ('table', 'query', 'join', 'scan', 'index',"
            " 'merge', 'filter'))) * 20 >= size(split(text, ' '))"
        ).alias("judge_a"),
        F.expr(
            "size(filter(split(text, ' '), w -> w = 'table')) >= 2"
        ).alias("judge_b"),
    )
    cells = judged.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr(
            "CAST(SUM(CASE WHEN judge_a AND judge_b THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("both_pos"),
        F.expr(
            "CAST(SUM(CASE WHEN NOT judge_a AND NOT judge_b THEN 1 ELSE 0"
            " END) AS BIGINT)"
        ).alias("both_neg"),
        F.expr(
            "CAST(SUM(CASE WHEN judge_a THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("a_pos"),
        F.expr(
            "CAST(SUM(CASE WHEN judge_b THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("b_pos"),
    )
    return cells.select(
        "n",
        "both_pos",
        "both_neg",
        "a_pos",
        "b_pos",
        F.expr("CAST(both_pos + both_neg AS DOUBLE) / n").alias("p_observed"),
        F.expr(
            """CAST(a_pos * b_pos + (n - a_pos) * (n - b_pos) AS DOUBLE)
               / CAST(n * n AS DOUBLE)"""
        ).alias("p_expected"),
        F.expr(
            """CAST(n * (both_pos + both_neg)
               - (a_pos * b_pos + (n - a_pos) * (n - b_pos)) AS DOUBLE)
               / CAST(n * n
               - (a_pos * b_pos + (n - a_pos) * (n - b_pos)) AS DOUBLE)"""
        ).alias("cohens_kappa"),
    )


@query(
    "llm_tokenizer_fertility",
    oracle=f"""
    WITH t AS (
        SELECT lang,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS words,
               CAST(len(regexp_extract_all(text,
                    '{BPE_PATTERN.replace(chr(92), chr(92))}')) AS BIGINT)
                   AS toks
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS total_words,
           CAST(SUM(toks) AS BIGINT) AS total_tokens,
           CAST(SUM(toks) AS DOUBLE) / CAST(SUM(words) AS DOUBLE)
               AS fertility,
           CAST(SUM(toks) AS DOUBLE) / COUNT(*) AS tokens_per_doc
    FROM t GROUP BY lang
    """,
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword-tokens-per-word under the
    BPE-style pretokenizer (llm_token_bpe's certified regex) — THE
    tokenizer-fairness metric (Rust et al. 2021, "How Good is Your
    Tokenizer?"): languages with fertility far above English pay
    proportionally more sequence length (= compute and context budget)
    per word, and a multilingual corpus plan reweights or re-trains the
    tokenizer based on exactly this table.

    No reference precedent (north star, BASELINE.json). Both counts are
    doc-local JVM regex/split ops inside the scan projection; the
    per-lang rollup is ONE partial-agg grouped aggregation on a 5-row
    key grid. Parity: counts are exact BIGINTs; fertility and
    tokens_per_doc each divide identical exact integers as IEEE doubles
    (correctly-rounded, no quantize needed).

    Scale shape: map-side combine collapses each task to ≤|langs| rows
    before the exchange — flat at any corpus size.
    """
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("words"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)))
        .cast("long")
        .alias("toks"),
    )
    return t.groupBy("lang").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(SUM(words) AS BIGINT)").alias("total_words"),
        F.expr("CAST(SUM(toks) AS BIGINT)").alias("total_tokens"),
        F.expr(
            "CAST(SUM(toks) AS DOUBLE) / CAST(SUM(words) AS DOUBLE)"
        ).alias("fertility"),
        F.expr("CAST(SUM(toks) AS DOUBLE) / COUNT(*)").alias(
            "tokens_per_doc"
        ),
    )
