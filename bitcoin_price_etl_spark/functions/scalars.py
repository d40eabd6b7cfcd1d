"""Scalar function families (SURVEY.md §2.2 "Scalar functions").

Each family is exercised as one query over a real table, with reference
citations where precedented:
- fn_string: R8 key-building (dags/bpi_etl/bpi_etl_bigquery.py:21-23), R11
  rename (:216-219), constr 3-char codes (common_module/pydantic_models.py:37)
- fn_date: R4/R15/R16 timestamp parse/format (bpi_etl_bigquery.py:229-234),
  epoch validation (pydantic_models.py:63,67-70), date key (:118)
- fn_math: R13 double arithmetic (bpi_etl_bigquery.py:225)
- fn_hash: R8 md5 prefix (bpi_etl_bigquery.py:16-19)
- fn_json: R3 validated parse, R12 map lookup (bpi_etl_bigquery.py:223)
- fn_map: R12 (the OER `rates` open map, pydantic_models.py:55-58)
- fn_conditional: nullable handling of R17 (bpi_etl_bigquery.py:242)
- fn_array: no precedent — needed for the embeddings table.

All functions are JVM built-ins inside WholeStageCodegen — no Python in the
hot path. Math avoids libm-dependent functions (exp/ln/pow) whose last-ulp
behavior differs between JVM and C engines; +,-,*,/,sqrt,abs,ceil,floor,round
are IEEE-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import DEC
from bitcoin_price_etl_spark.registry import query


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS name_lower,
           upper(c_mktsegment) AS seg_upper,
           substring(c_name, 1, 8) AS name_prefix,
           CAST(length(c_name) AS INT) AS name_len,
           concat_ws('|', c_name, c_mktsegment) AS name_seg,
           split_part(c_name, '#', 2) AS name_num,
           regexp_replace(c_name, '[0-9]+', 'N', 'g') AS name_masked,
           trim('  ' || c_mktsegment || ' ') AS seg_trim
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: lower/upper/substring/length/concat_ws/split_part/
    regexp_replace/trim (R8/R11 precedents)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("int").alias("name_len"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("name_seg"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.regexp_replace("c_name", "[0-9]+", "N").alias("name_masked"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S') AS due_ts,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family: year/month/day, date_trunc, epoch, interval arithmetic,
    date_format (R4/R15/R16)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias(
            "month_start"
        ),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd HH:mm:ss"
        ).alias("due_ts"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross,
           CAST(round(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4)), 2)
                AS DOUBLE) AS net_rounded,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity / 10.0) AS BIGINT) AS qty_decile,
           CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
           sqrt(l_quantity) AS qty_sqrt
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family on doubles (R13 semantics: prices are IEEE doubles,
    deliberately not decimals — SURVEY.md §1.3)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "gross"
        ),
        # round() on raw doubles disagrees between engines on .xx5 decimal
        # representations (Spark rounds the shortest decimal repr HALF_UP,
        # C engines round the scaled double); routing through DECIMAL(38,4)
        # makes ties exact and both engines round half-away-from-zero.
        F.round(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC), 2
        )
        .cast("double")
        .alias("net_rounded"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 10.0).alias("qty_decile"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("price_k"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           substring(md5(text), 1, 6) AS key_prefix
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: md5 / sha2 / 6-char key prefix — the reference's
    anti-hotspot write-key recipe (R8, bpi_etl_bigquery.py:16-19)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.substring(F.md5("text"), 1, 6).alias("key_prefix"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object / typed from_json / validity probe
    (R3 validated parse + R12 keyed lookup)."""
    ev = load(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", schema).getField("k").alias("k_int"),
        F.from_json("props", schema).isNotNull().alias("is_valid"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           CAST(embedding[64] AS DOUBLE) AS last_component,
           CAST(list_max(embedding) AS DOUBLE) AS max_component,
           CAST(list_min(embedding) AS DOUBLE) AS min_component
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embeddings table: size / element_at /
    array_max / array_min (float→double widening is exact)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.element_at("embedding", 64).cast("double").alias("last_component"),
        F.array_max("embedding").cast("double").alias("max_component"),
        F.array_min("embedding").cast("double").alias("min_component"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           event_type AS type_val,
           CAST(user_id AS VARCHAR) AS uid_val,
           2 AS n_keys
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (R12: the OER `rates` open map — pydantic_models.py:55-58):
    build a map column, read it back with element_at, measure cardinality.
    The oracle is the algebraic simplification — the parity check proves the
    map round-trip is lossless."""
    ev = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "uid").alias("uid_val"),
        F.size(m).alias("n_keys"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000.0 THEN 'high'
                WHEN o_totalprice >= 100000.0 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_norm,
           least(o_totalprice, 250000.0) AS capped_price,
           greatest(o_totalprice, 10000.0) AS floored_price
    FROM orders
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: when/otherwise, coalesce+nullif, least/greatest
    (the R17 nullable-handling contract, bpi_etl_bigquery.py:242)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000.0, "high")
        .when(F.col("o_totalprice") >= 100000.0, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_norm"
        ),
        F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("capped_price"),
        F.greatest(F.col("o_totalprice"), F.lit(10000.0)).alias("floored_price"),
    )


@query(
    "fn_explode",
    oracle="""
    WITH tok AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents
                 WHERE doc_id < 50)
    SELECT doc_id,
           unnest(range(0, len(t))) AS pos,
           unnest(t) AS token
    FROM tok
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: one row per array element with its position (the lateral
    table-function form of flattening; the oracle zips two parallel unnests,
    DuckDB's equivalent of WITH ORDINALITY)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    ex = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    # pos → long: DuckDB's range() ordinality is BIGINT
    return ex.select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


@query(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS key_and,
           l_orderkey | 15 AS key_or,
           xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS key_xor,
           CAST(l_linenumber AS BIGINT) << 4 AS ln_shl,
           l_orderkey >> 8 AS key_shr
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts on integer keys — the primitive
    layer under every hash-partitioning and bloom/bitmask trick the engine
    uses (R8's hashed prefixes are the reference precedent for bit-level
    key manipulation).

    All JVM-codegen'd integer ops; the only parity care is width: DuckDB's
    `<<` returns the operand type, so the shift operand is cast to BIGINT
    on both sides."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("key_and"),
        F.col("l_orderkey").bitwiseOR(F.lit(15)).alias("key_or"),
        F.col("l_orderkey")
        .bitwiseXOR(F.col("l_linenumber").cast("long"))
        .alias("key_xor"),
        F.shiftleft(F.col("l_linenumber").cast("long"), 4).alias("ln_shl"),
        F.shiftright(F.col("l_orderkey"), 8).alias("key_shr"),
    )


@query(
    "fn_encode",
    oracle="""
    SELECT n_nationkey,
           to_base64(encode(n_name)) AS name_b64,
           lower(hex(encode(n_name))) AS name_hex,
           decode(from_base64(to_base64(encode(n_name)))) AS roundtrip
    FROM nation
    """,
)
def fn_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encoding family: base64 / hex / round-trip decode — the
    engine's edge representation for opaque payloads (the reference moves
    raw JSON bytes through object storage, bpi_etl_bigquery.py:68-69,80-84;
    multimodal binary columns ride the same conversions).

    Spark's hex() uppercases and DuckDB's lowercases — pinned to lower on
    both sides."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.base64(F.encode("n_name", "UTF-8")).alias("name_b64"),
        F.lower(F.hex(F.encode("n_name", "UTF-8"))).alias("name_hex"),
        F.decode(F.unbase64(F.base64(F.encode("n_name", "UTF-8"))), "UTF-8").alias(
            "roundtrip"
        ),
    )


@query(
    "fn_regex",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)[0-9]+', 1) AS first_alnum_stem,
           len(regexp_extract_all(text, '[a-z]*[0-9]+[a-z]*')) AS n_numeric_tokens,
           regexp_matches(text, '^[a-z]') AS starts_lower,
           regexp_replace(text, '(aa|ee|gg|ll|oo|ss|tt)', '<DBL>', 'g') AS dedoubled
    FROM documents
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Regex family: capture-group extract, extract-all count, anchored
    match test, and a backreference replace.

    Dialect discipline: Java regex (Spark) and RE2 (DuckDB) agree only on
    the backreference-free subset — classes, anchors, groups, alternation.
    A `([a-z])\1` backreference replace LOOKS portable but RE2 silently
    matches nothing where Java substitutes (observed: Spark 'a<DBL>' vs
    DuckDB 'agg'), so doubled letters are spelled as an explicit
    alternation. Everything is a codegen'd projection — zero exchanges.

    Group-index trap (r8 hostile-text probe): Spark's
    regexp_extract_all DEFAULTS to group 1 where DuckDB defaults to 0,
    and Spark validates the index lazily AT FIRST MATCH — so a
    group-free pattern ran green on the digit-free fixture for seven
    rounds and crashed on the first document containing a digit. The
    index is now pinned to 0 explicitly.
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)[0-9]+", 1).alias("first_alnum_stem"),
        F.size(
            F.expr(r"regexp_extract_all(text, '[a-z]*[0-9]+[a-z]*', 0)")
        ).cast(
            "long"
        ).alias("n_numeric_tokens"),
        F.col("text").rlike("^[a-z]").alias("starts_lower"),
        F.regexp_replace("text", "(aa|ee|gg|ll|oo|ss|tt)", "<DBL>").alias(
            "dedoubled"
        ),
    )


@query(
    "fn_higher_order",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.0))
                AS BIGINT) AS n_positive,
           list_reduce(list_transform(embedding,
               x -> CAST(greatest(CAST(x AS DOUBLE), 0.0) AS DOUBLE)),
               (s, x) -> s + x) AS relu_sum,
           CAST(len(list_filter(embedding,
                    x -> abs(CAST(x AS DOUBLE)) <= 10.0)) = len(embedding)
                AS BOOLEAN) AS all_bounded,
           CAST(len(list_filter(embedding, x -> abs(CAST(x AS DOUBLE)) > 3.0)) > 0
                AS BOOLEAN) AS any_outlier
    FROM embeddings
    """,
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda functions over array columns — filter / exists /
    forall / aggregate, the SQL-lambda surface that keeps per-element logic
    JVM-side (codegen'd projection, zero exchanges) instead of falling back
    to a Python UDF.

    relu_sum folds sequentially in index order (the llm_sim_search
    bit-parity pattern); exists/forall are spelled as list_filter
    cardinality tests in DuckDB (its RE has no exists/forall aliases), the
    same relational semantics."""
    e = load(spark, sf_dir, "embeddings")
    x_d = lambda x: x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x_d(x) > 0.0))
        .cast("long")
        .alias("n_positive"),
        F.aggregate(
            F.transform("embedding", lambda x: F.greatest(x_d(x), F.lit(0.0))),
            F.lit(0.0),
            lambda s, x: s + x,
        ).alias("relu_sum"),
        F.forall("embedding", lambda x: F.abs(x_d(x)) <= 10.0).alias("all_bounded"),
        F.exists("embedding", lambda x: F.abs(x_d(x)) > 3.0).alias("any_outlier"),
    )


@query(
    "fn_url",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/'
                   || CAST(doc_id AS VARCHAR) || '?lang=' || lang
                   || '&ref=home' AS url
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM urls
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family: parse_url HOST/PATH/QUERY-key/PROTOCOL over
    synthesized per-document URLs — the crawl-metadata parsing every web
    corpus pipeline runs before domain capping and URL dedup
    (llm_domain_cap's upstream in a real crawl).

    Spark evaluates the dedicated parse_url expression (JVM
    java.net.URI-backed, codegen'd); the oracle re-derives the same
    fields with anchored regexes — an independent formulation, so the
    check also guards parse_url's semantics against the plain-string
    reading. Zero-shuffle projection.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&ref=home"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias(
            "lang_param"
        ),
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "fn_try_safe",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           TRY_CAST(l_returnflag AS BIGINT) AS mode_as_int,
           CAST(floor(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE)) AS BIGINT) AS qty_as_int,
           CASE WHEN (l_quantity - floor(l_quantity)) = 0.0
                THEN CAST(l_extendedprice / nullif(l_quantity, 0.0)
                          AS DOUBLE)
                END AS unit_price,
           coalesce(TRY_CAST(l_returnflag AS BIGINT), -1) AS mode_or_default
    FROM lineitem
    WHERE l_orderkey < 100
    """,
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family: try_cast on never-numeric and
    sometimes-numeric strings, nullif-guarded division, and
    coalesce-defaulting — the ANSI-mode survival kit (under
    spark.sql.ansi.enabled a plain CAST('AIR' AS BIGINT) throws and
    kills the job at row 10^12; the try_ forms degrade to NULL instead,
    which is the only sane semantics for a 100 TB dirty-data scan).

    Parity notes: qty_as_int round-trips the quantity through VARCHAR
    and back via DOUBLE — deliberately NOT try_cast straight to BIGINT,
    where the engines genuinely disagree ('36.0' → NULL in Spark's
    integral-only string cast, 36 in DuckDB's rounding one); the DOUBLE
    hop is the portable semantics, and the explicit floor() pins the
    DOUBLE→BIGINT edge on both engines (Spark's cast truncates toward
    zero, DuckDB's rounds half-to-even — identical only on integral
    fixtures without the floor). The integral guard on unit_price
    keeps the division exact-input only. Zero-shuffle projection.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("try_cast(l_returnflag AS BIGINT)").alias("mode_as_int"),
        F.expr(
            "CAST(floor(try_cast(CAST(l_quantity AS STRING) AS DOUBLE))"
            " AS BIGINT)"
        ).alias("qty_as_int"),
        F.expr(
            """CASE WHEN (l_quantity - floor(l_quantity)) = 0.0D
               THEN CAST(l_extendedprice / nullif(l_quantity, 0.0D)
                         AS DOUBLE) END"""
        ).alias("unit_price"),
        F.expr(
            "coalesce(try_cast(l_returnflag AS BIGINT), -1L)"
        ).alias("mode_or_default"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           'OBJECT<k: BIGINT>' AS vschema
    FROM events
    WHERE event_id < 2000
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of semi-structured payloads: parse_json
    once into the binary variant encoding, then typed variant_get path
    extraction and schema_of_variant introspection — the
    columnar-shredded semi-structured story (a VARIANT column scans and
    extracts ~an order faster than re-parsing JSON text per expression,
    and is the engine's answer to open-schema event payloads at 100 TB).

    The oracle expresses the same extractions over DuckDB's JSON type —
    deliberately a DIFFERENT semi-structured representation proving the
    same values out; schema_of_variant's output is pinned against the
    fixture's known payload shape (a literal in the oracle), so a
    variant-inference regression fails the hash. Zero-shuffle projection.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias(
            "k_int"
        ),
        F.expr("variant_get(parse_json(props), '$.k', 'string')").alias(
            "k_str"
        ),
        F.expr("schema_of_variant(parse_json(props))").alias("vschema"),
    )


@query(
    "fn_xml",
    oracle="""
    WITH built AS (
        SELECT l_orderkey, l_linenumber,
               concat('<item code="', l_returnflag, '"><qty>',
                      CAST(CAST(l_quantity AS DECIMAL(18,1)) AS VARCHAR),
                      '</qty><status>', l_linestatus,
                      '</status></item>') AS xml
        FROM lineitem WHERE l_orderkey < 200
    )
    SELECT l_orderkey, l_linenumber,
           CAST(regexp_extract(xml, '<qty>(.*)</qty>', 1) AS DOUBLE)
               AS qty_parsed,
           regexp_extract(xml, '<status>(.*)</status>', 1) AS status_parsed,
           regexp_extract(xml, 'code="(.*?)"', 1) AS code_attr,
           CAST(length(xml) AS BIGINT) AS xml_len
    FROM built
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (Spark 4 native XML): rows are serialized to
    XML text deterministically, then parsed back with from_xml into a
    typed struct — element values, an attribute (via the _code field
    convention), and the raw length. The engine's answer to feed formats
    that still arrive as XML (finance/market data commonly does); the
    reference's JSON path (R5) with the other markup family.

    The oracle deliberately parses the SAME xml text with regexes —
    proving the from_xml struct extraction against an independent
    mechanism, not XML-vs-XML. Zero-shuffle projection; from_xml is a
    JVM-side expression (no Python round-trip), so the parse stays inside
    whole-stage codegen like any other scalar.

    Parity: the XML text is built from DECIMAL-formatted numerics
    (scale-pinned strings, not double repr) and VARCHAR columns — both
    engines produce byte-identical xml, so parsed values can't diverge.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    xml = F.concat(
        F.lit('<item code="'),
        F.col("l_returnflag"),
        F.lit('"><qty>'),
        F.col("l_quantity").cast("decimal(18,1)").cast("string"),
        F.lit("</qty><status>"),
        F.col("l_linestatus"),
        F.lit("</status></item>"),
    )
    built = li.select("l_orderkey", "l_linenumber", xml.alias("xml"))
    parsed = F.from_xml(
        F.col("xml"), "STRUCT<_code: STRING, qty: DOUBLE, status: STRING>"
    )
    return built.select(
        "l_orderkey",
        "l_linenumber",
        parsed.getField("qty").alias("qty_parsed"),
        parsed.getField("status").alias("status_parsed"),
        parsed.getField("_code").alias("code_attr"),
        F.length("xml").cast("long").alias("xml_len"),
    )


# Knuth multiplicative hash spreads order keys over the full IPv4 space;
# exact BIGINT arithmetic in both engines (max key ~1.5e7 × 2654435761
# ≈ 4e16, far inside int64).
IP_HASH_MULT = 2654435761


@query(
    "fn_ip",
    oracle=f"""
    WITH ips AS (
        SELECT o_orderkey,
               (o_orderkey * {IP_HASH_MULT}) % 4294967296 AS ip_num
        FROM orders
    ),
    oct AS (
        SELECT o_orderkey, ip_num,
               ip_num // 16777216 AS o1,
               (ip_num // 65536) % 256 AS o2,
               (ip_num // 256) % 256 AS o3,
               ip_num % 256 AS o4
        FROM ips
    )
    SELECT o_orderkey, CAST(ip_num AS BIGINT) AS ip_num,
           o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip,
           (o1 = 10) OR (o1 = 172 AND o2 >= 16 AND o2 <= 31)
               OR (o1 = 192 AND o2 = 168) AS is_private,
           o1 || '.' || o2 || '.' || o3 || '.0/24' AS net24,
           ip_num // 65536 = 43520 AS in_cidr_170_0
    FROM oct
    """,
)
def fn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 toolkit over a synthesized address column (Knuth-hash of the
    order key — the fixtures carry no IPs, so the engine derives a
    deterministic one per row): dotted-quad rendering, RFC-1918
    private-range classification, the /24 network prefix (the standard
    coarse geo/abuse aggregation key), and containment in a literal CIDR
    (170.0.0.0/16) — the log-pipeline scalar family (parse, classify,
    bucket) Spark lacks as builtins.

    Scale shape: stateless integer projections — zero exchanges, full
    whole-stage codegen; CIDR containment by arbitrary prefix length is
    the same shift-and-compare on ip_num >> (32-prefix), so a CIDR-table
    join would broadcast the table and run one range predicate per rule.

    Parity: everything is exact int64 div/mod arithmetic and string
    concatenation of exact integers — bit-identical by construction, no
    quantization anywhere."""
    o = load(spark, sf_dir, "orders")
    ip_num = (F.col("o_orderkey") * IP_HASH_MULT) % F.lit(4294967296)
    ips = o.select("o_orderkey", ip_num.alias("ip_num"))
    o1 = (F.col("ip_num") / 16777216).cast("long")
    o2 = ((F.col("ip_num") / 65536) % 256).cast("long")
    o3 = ((F.col("ip_num") / 256) % 256).cast("long")
    o4 = (F.col("ip_num") % 256).cast("long")
    oct_df = ips.select(
        "o_orderkey",
        "ip_num",
        o1.alias("o1"),
        o2.alias("o2"),
        o3.alias("o3"),
        o4.alias("o4"),
    )
    dot = F.lit(".")
    return oct_df.select(
        "o_orderkey",
        F.col("ip_num").cast("long").alias("ip_num"),
        F.concat(
            F.col("o1").cast("string"), dot,
            F.col("o2").cast("string"), dot,
            F.col("o3").cast("string"), dot,
            F.col("o4").cast("string"),
        ).alias("ip"),
        (
            (F.col("o1") == 10)
            | ((F.col("o1") == 172) & F.col("o2").between(16, 31))
            | ((F.col("o1") == 192) & (F.col("o2") == 168))
        ).alias("is_private"),
        F.concat(
            F.col("o1").cast("string"), dot,
            F.col("o2").cast("string"), dot,
            F.col("o3").cast("string"), F.lit(".0/24"),
        ).alias("net24"),
        ((F.col("ip_num") / 65536).cast("long") == 43520).alias(
            "in_cidr_170_0"
        ),
    )


# Geohash-style spatial index key: 15-bit quantized lat/lng cells,
# bit-interleaved into a 30-bit Z-order (Morton) integer and rendered as
# 6 base32 chars — shared prefixes == shared ancestor cells, which is
# what makes the string a geo join/partition key.
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

_GH_INTERLEAVE = (
    """(((lng_q >> 0) & 1) << 1)
        + (((lat_q >> 0) & 1) << 0)
        + (((lng_q >> 1) & 1) << 3)
        + (((lat_q >> 1) & 1) << 2)
        + (((lng_q >> 2) & 1) << 5)
        + (((lat_q >> 2) & 1) << 4)
        + (((lng_q >> 3) & 1) << 7)
        + (((lat_q >> 3) & 1) << 6)
        + (((lng_q >> 4) & 1) << 9)
        + (((lat_q >> 4) & 1) << 8)
        + (((lng_q >> 5) & 1) << 11)
        + (((lat_q >> 5) & 1) << 10)
        + (((lng_q >> 6) & 1) << 13)
        + (((lat_q >> 6) & 1) << 12)
        + (((lng_q >> 7) & 1) << 15)
        + (((lat_q >> 7) & 1) << 14)
        + (((lng_q >> 8) & 1) << 17)
        + (((lat_q >> 8) & 1) << 16)
        + (((lng_q >> 9) & 1) << 19)
        + (((lat_q >> 9) & 1) << 18)
        + (((lng_q >> 10) & 1) << 21)
        + (((lat_q >> 10) & 1) << 20)
        + (((lng_q >> 11) & 1) << 23)
        + (((lat_q >> 11) & 1) << 22)
        + (((lng_q >> 12) & 1) << 25)
        + (((lat_q >> 12) & 1) << 24)
        + (((lng_q >> 13) & 1) << 27)
        + (((lat_q >> 13) & 1) << 26)
        + (((lng_q >> 14) & 1) << 29)
        + (((lat_q >> 14) & 1) << 28)"""
)


@query(
    "fn_geohash",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey * 7919) % 32768 AS lat_q,
               (c_custkey * 104729) % 32768 AS lng_q
        FROM customer
    ),
    z AS (
        SELECT c_custkey, lat_q, lng_q,
               {_GH_INTERLEAVE} AS gh
        FROM pts
    ),
    s AS (
        SELECT c_custkey, lat_q, lng_q, gh,
               substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((gh >> 25) & 31 AS INT) + 1, 1)
           || substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((gh >> 20) & 31 AS INT) + 1, 1)
           || substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((gh >> 15) & 31 AS INT) + 1, 1)
           || substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((gh >> 10) & 31 AS INT) + 1, 1)
           || substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((gh >> 5) & 31 AS INT) + 1, 1)
           || substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((gh >> 0) & 31 AS INT) + 1, 1) AS geohash6
        FROM z
    )
    SELECT c_custkey, CAST(lat_q AS BIGINT) AS lat_q,
           CAST(lng_q AS BIGINT) AS lng_q,
           CAST(gh AS BIGINT) AS geohash_int,
           geohash6,
           substring(geohash6, 1, 4) AS prefix4
    FROM s
    """,
)
def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-style Z-order encoding (the spatial indexing scalar Spark
    lacks as a builtin): quantized lat/lng cells bit-interleave into a
    30-bit Morton integer, rendered as a 6-char base32 geohash whose
    PREFIXES nest — two points share a k-char prefix iff they share the
    depth-k ancestor cell, which is what makes the string a groupBy /
    join / partitionBy key for geographic data (the 4-char prefix column
    is exactly that coarse key). Coordinates synthesize from the
    customer key (the join_spatial_grid stance — the fixtures carry no
    geo columns; a real table drops its lat/lng in after one
    quantization step and the encoding is unchanged).

    Scale shape: stateless int64 shift/mask/add plus a fixed-alphabet
    substring per 5 bits — zero exchanges, whole-stage codegen;
    Z-order interleaving is also the clustering key sink_zorder_layout
    sorts by, so this function IS that sink's layout-key producer for
    spatial columns.

    Parity: exact integer bit arithmetic and literal-table lookups —
    bit-identical by construction, no floats anywhere."""
    c = load(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 7919) % 32768).alias("lat_q"),
        ((F.col("c_custkey") * 104729) % 32768).alias("lng_q"),
    )
    z = pts.withColumn("gh", F.expr(_GH_INTERLEAVE))
    geohash6 = F.concat(
        F.expr("substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((gh >> 25) & 31 AS INT) + 1, 1)"),
        F.expr("substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((gh >> 20) & 31 AS INT) + 1, 1)"),
        F.expr("substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((gh >> 15) & 31 AS INT) + 1, 1)"),
        F.expr("substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((gh >> 10) & 31 AS INT) + 1, 1)"),
        F.expr("substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((gh >> 5) & 31 AS INT) + 1, 1)"),
        F.expr("substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((gh >> 0) & 31 AS INT) + 1, 1)"),
    )
    return z.select(
        "c_custkey",
        F.col("lat_q").cast("long").alias("lat_q"),
        F.col("lng_q").cast("long").alias("lng_q"),
        F.col("gh").cast("long").alias("geohash_int"),
        geohash6.alias("geohash6"),
        F.substring(geohash6, 1, 4).alias("prefix4"),
    )
