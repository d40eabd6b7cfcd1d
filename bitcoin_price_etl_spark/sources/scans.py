"""Source scans (SURVEY.md §2.2 "Scans / sources / sinks").

- scan_parquet: the staged-zone read path (reference
  dags/bpi_etl/bpi_etl_bigquery.py:242,287-289) — filter+projection must
  reach the parquet reader (PushedFilters/ReadSchema asserted in tests).
- scan_json: the raw-zone JSON round-trip (R5, bpi_etl_bigquery.py:68-69,
  187-191) — write JSON lines, re-scan with an explicit schema (schema
  declared, never inferred: the Pydantic-contract stance of R3).
- source_rest: R1/R2 REST ingestion replayed from fixture documents (the
  harness has no network); the documents follow the CoinDesk BPI shape of
  common_module/pydantic_models.py:22-50.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import literal_rows_df
from bitcoin_price_etl_spark.paths import scratch_dir
from bitcoin_price_etl_spark.registry import query


@query(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity >= 30.0 AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with pushed filter + pruned columns.

    At 100 TB this is the difference between reading 4 columns of matching
    row groups and reading everything: the predicate and projection are
    expressed declaratively so Catalyst pushes both into the scan.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 30.0)
        & (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")


@query(
    "scan_json",
    oracle="""
    SELECT event_id, event_type, value FROM events
    """,
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan with explicit schema (R5 round-trip).

    Serializes a projection of `events` to JSON lines, then scans it back
    with a declared StructType (PERMISSIVE mode). The oracle is the original
    projection — parity proves the round-trip is lossless, including double
    formatting.
    """
    ev = load(spark, sf_dir, "events")
    tmp = scratch_dir("scan_json")
    path = os.path.join(tmp, "events_json")
    ev.select(
        F.to_json(F.struct("event_id", "event_type", "value")).alias("value")
    ).write.mode("overwrite").text(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("value", T.DoubleType(), False),
        ]
    )
    return spark.read.schema(schema).json(path).select("event_id", "event_type", "value")


# CoinDesk BPI currentprice document schema, declared (not inferred) — the
# engine twin of the reference's Pydantic contract BPI → BPITime/BPICurrency
# → BPICurrencyRate (common_module/pydantic_models.py:22-50). Extra fields
# (symbol, rate) are retained by the open struct, mirroring extra='allow'
# (pydantic_models.py:18-20).
_BPI_CURRENCY = T.StructType(
    [
        T.StructField("code", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("rate", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("rate_float", T.DoubleType()),
    ]
)
BPI_SCHEMA = T.StructType(
    [
        T.StructField(
            "time",
            T.StructType(
                [
                    T.StructField("updated", T.StringType()),
                    T.StructField("updatedISO", T.StringType()),
                ]
            ),
        ),
        T.StructField("disclaimer", T.StringType()),
        T.StructField("chartName", T.StringType()),
        T.StructField(
            "bpi",
            T.StructType(
                [
                    T.StructField("USD", _BPI_CURRENCY),
                    T.StructField("GBP", _BPI_CURRENCY),
                    T.StructField("EUR", _BPI_CURRENCY),
                ]
            ),
        ),
    ]
)

# Open Exchange Rates historical document (HistoricalXR → CurrencyXR,
# pydantic_models.py:55-65): flat object with an open map `rates`.
OER_SCHEMA = T.StructType(
    [
        T.StructField("disclaimer", T.StringType()),
        T.StructField("license", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("base", T.StringType()),
        T.StructField("rates", T.MapType(T.StringType(), T.DoubleType())),
    ]
)


def synth_bpi_documents(n: int = 24) -> list[str]:
    """Deterministic synthetic BPI snapshots — the REST replay fixture.

    One document per hour, rates following a fixed ramp; shapes match
    FIXTURES.md §B / pydantic_models.py:22-50 including the extra fields.
    """
    docs = []
    for h in range(n):
        usd = 17000.0 + 13.25 * h
        ts = f"2022-12-18 {h:02d}:00:00"
        iso = f"2022-12-18T{h:02d}:00:00+00:00"
        docs.append(
            json.dumps(
                {
                    "time": {"updated": f"Dec 18, 2022 {h:02d}:00:00 UTC", "updatedISO": iso},
                    "disclaimer": "synthetic replay fixture",
                    "chartName": "Bitcoin",
                    "bpi": {
                        "USD": {
                            "code": "USD",
                            "symbol": "&#36;",
                            "rate": f"{usd:,.2f}",
                            "description": "United States Dollar",
                            "rate_float": usd,
                        },
                        "GBP": {
                            "code": "GBP",
                            "symbol": "&pound;",
                            "rate": f"{usd * 0.82:,.2f}",
                            "description": "British Pound Sterling",
                            "rate_float": usd * 0.82,
                        },
                        "EUR": {
                            "code": "EUR",
                            "symbol": "&euro;",
                            "rate": f"{usd * 0.94:,.2f}",
                            "description": "Euro",
                            "rate_float": usd * 0.94,
                        },
                    },
                    "_ts": ts,
                }
            )
        )
    return docs


@query("source_rest", oracle=None)
def source_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REST JSON source (R1/R2), replayed from fixture documents.

    In production the poller runs driver-side (or as a PySpark 4 Python data
    source) and lands each response as one row; here the HTTP responses are
    replayed from deterministic fixtures. Parsed with the declared BPI
    schema, flattened (R9), snake_cased (R11). Rows-only check: the fixture
    corpus has no DuckDB view.
    """
    docs = synth_bpi_documents()
    raw = literal_rows_df(spark, [(d,) for d in docs], "payload string")
    parsed = raw.select(F.from_json("payload", BPI_SCHEMA).alias("doc"))
    return parsed.select(
        F.col("doc.time.updated").alias("time_updated"),
        F.col("doc.chartName").alias("chart_name"),
        F.col("doc.bpi.USD.code").alias("bpi_usd_code"),
        F.col("doc.bpi.USD.rate_float").alias("bpi_usd_rate_float"),
        F.col("doc.bpi.GBP.rate_float").alias("bpi_gbp_rate_float"),
        F.col("doc.bpi.EUR.rate_float").alias("bpi_eur_rate_float"),
    )


@query("source_rest_datasource", oracle=None)
def source_rest_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REST poller as a registered PySpark 4 Python DataSource
    (`spark.read.format("bpi_rest")`) — partitions fan the endpoint polls
    across executors instead of serializing on the driver (the engine form
    of R1/R2; see sources/rest_datasource.py). Rows-only: replay fixtures
    have no DuckDB view."""
    from bitcoin_price_etl_spark.sources.rest_datasource import BpiRestDataSource

    try:
        spark.dataSource.register(BpiRestDataSource)
    except Exception:
        pass  # already registered in this session
    return spark.read.format("bpi_rest").option("snapshots", "24").load()


@query(
    "source_rest_authed",
    oracle="""
    SELECT * FROM (VALUES
        ('2022-12-18', 'EUR', CAST(0.94 AS DOUBLE)),
        ('2022-12-18', 'IDR', CAST(15600.5 AS DOUBLE))
    ) AS t(rate_date, symbol, rate)
    """,
)
def source_rest_authed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authenticated REST source (R2): the OER historical fetch with the
    reference's exact auth shape — app_id from a masked secret pathway +
    server-side `symbols` projection (bpi_etl_bigquery.py:120-128,
    `Variable.get('oer_api_key')`). The engine resolves the credential
    from SPARK_GRAFT_OER_APP_ID (sources/auth.py; fixture key offline),
    sends it only in request params, and logs only the masked view.

    The symbols list is pushdown for REST: the server filters rates
    before responding, so a 1000-endpoint poll ships exactly the columns
    the pipeline joins on. The fixture twin enforces both behaviors
    (401 without a key, projected payload), so this plan provably works
    against the FILTERED response. Oracle: the fixture is deterministic,
    so the expected (rate_date, symbol, rate) rows are stated literally —
    a full hash check, unlike the replay-only BPI source keys.
    """
    from bitcoin_price_etl_spark.sources.auth import (
        fetch_oer_historical,
        rest_auth_from_env,
    )

    auth = rest_auth_from_env(symbols=("IDR", "EUR"))
    doc_json = fetch_oer_historical("2022-12-18", auth)
    raw = literal_rows_df(spark, [(doc_json,)], "payload string")
    doc = raw.select(F.from_json("payload", OER_SCHEMA).alias("d"))
    return doc.select(
        F.date_format(F.timestamp_seconds(F.col("d.timestamp")), "yyyy-MM-dd").alias(
            "rate_date"
        ),
        F.explode(F.col("d.rates")).alias("symbol", "rate"),
    )


@query(
    "scan_csv",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip scan with a declared schema (the third standard batch
    format next to parquet/JSON; the reference's raw zone is format-agnostic
    object storage — bpi_etl_bigquery.py:80-84).

    Schema is declared, never inferred (the R3 contract stance), with
    header=true so the file is self-describing for other readers. Parity
    against the original table proves the text round-trip is lossless for
    ints and strings."""
    n = load(spark, sf_dir, "nation")
    tmp = scratch_dir("scan_csv")
    path = os.path.join(tmp, "nation_csv")
    n.select("n_nationkey", "n_name", "n_regionkey").write.mode("overwrite").option(
        "header", "true"
    ).csv(path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), False),
            T.StructField("n_name", T.StringType(), False),
            T.StructField("n_regionkey", T.IntegerType(), False),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .csv(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@query(
    "scan_orc",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
    """,
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip scan — the second columnar at-rest format next to
    parquet (both ship in Spark; the reference's storage choice weighs
    format trade-offs at slides p.16, parquet vs alternatives).

    Write ORC from the supplier table, read it back, match the original:
    proves type fidelity (int64/int32/double/string) through the ORC
    writer/reader pair. DuckDB cannot read ORC, so the oracle is the source
    table itself — the round-trip must be the identity."""
    s = load(spark, sf_dir, "supplier")
    tmp = scratch_dir("scan_orc")
    path = os.path.join(tmp, "supplier_orc")
    s.write.mode("overwrite").orc(path)
    return spark.read.orc(path).select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )


@query(
    "scan_schema_evolution",
    oracle="""
    WITH v1 AS (
        SELECT l_orderkey, l_quantity, CAST(NULL AS VARCHAR) AS l_returnflag
        FROM lineitem WHERE l_linenumber = 1 AND l_orderkey <= 400
    ), v2 AS (
        SELECT l_orderkey, l_quantity, l_returnflag
        FROM lineitem WHERE l_linenumber = 2 AND l_orderkey <= 400
    )
    SELECT l_orderkey, l_quantity,
           COALESCE(l_returnflag, 'UNKNOWN') AS l_returnflag,
           l_returnflag IS NULL AS from_v1
    FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across file generations: a v1 file written WITHOUT
    a column and a v2 file WITH it, read back as ONE table via parquet
    mergeSchema — the 100 TB reality where years of files drift (the
    reference pins its schema per-write, R17; an engine must also READ
    mixed generations). Missing columns surface as NULL and are healed
    with an explicit default; `from_v1` proves which generation each row
    came from.

    At scale mergeSchema costs one footer read per file at planning time
    (or none with a declared read schema — the production choice once the
    union schema is known); row data is never rewritten."""
    from bitcoin_price_etl_spark.paths import delete_path, sink_path

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    target = sink_path("schema_evolution/lineitem_gen")
    delete_path(spark, target)
    v1 = li.filter(F.col("l_linenumber") == 1).select("l_orderkey", "l_quantity")
    v2 = li.filter(F.col("l_linenumber") == 2).select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    v1.write.parquet(f"{target}/gen=v1")
    v2.write.parquet(f"{target}/gen=v2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{target}/gen=v1", f"{target}/gen=v2"
    )
    return merged.select(
        "l_orderkey",
        "l_quantity",
        F.coalesce("l_returnflag", F.lit("UNKNOWN")).alias("l_returnflag"),
        F.col("l_returnflag").isNull().alias("from_v1"),
    )


@query("source_rest_stream", oracle=None)
def source_rest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REST poller as a STREAMING Python DataSource
    (`spark.readStream.format("bpi_rest")`, PySpark 4
    SimpleDataSourceStreamReader): micro-batches advance a checkpointed
    snapshot-index offset — the reference's @hourly poll loop with
    exactly-once resume instead of Airflow catchup bookkeeping. Runs the
    bounded stream to completion in-process and returns the collected
    table (rows-only: replay fixtures have no DuckDB view; equality with
    the batch DataSource is asserted in tests/test_streaming.py)."""
    from bitcoin_price_etl_spark.sources.rest_datasource import BpiRestDataSource

    try:
        spark.dataSource.register(BpiRestDataSource)
    except Exception:
        pass  # already registered in this session
    stream = spark.readStream.format("bpi_rest").option("snapshots", "24").load()
    name = "bpi_rest_stream_out"
    # Python stream sources don't support Trigger.AvailableNow (Spark falls
    # back to ONE batch); drive repeated micro-batches and block until the
    # offset stops advancing instead
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


_BINARYFILE_N_DOCS = 40  # doc_id < 40 staged as one opaque file each


@query(
    "scan_binaryfile",
    oracle=f"""
    SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.bin' AS fname,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    WHERE doc_id < {_BINARYFILE_N_DOCS}
      AND octet_length(encode(text)) > 0
    """,
)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-payload ingest via Spark's binaryFile source — the scan
    path a multimodal corpus uses for image/audio/video blobs sitting in
    an object store (one file per asset, no decode at scan time; decode
    is llm_multimodal_decode's job downstream).

    The fixture stage writes each document's utf-8 bytes as one .bin file
    (local scratch stands in for the bucket); the engine reads them back
    as (path, length, content) and emits filename, byte length, and
    content digest. The oracle never touches the files — it derives the
    same triple from the documents view, so the check proves the binary
    round-trip is byte-exact.

    SOURCE CONTRACT (r8 zerovec probe): Spark's binaryFile source DROPS
    zero-byte files — its FileIndex never emits them as rows — so a
    0-byte asset (a failed download in a real 100 TB corpus) silently
    disappears at the scan. The oracle mirrors the contract
    (octet_length > 0) and this docstring makes it explicit: a pipeline
    that must ACCOUNT for empty assets needs a listing-side audit (e.g.
    a manifest anti-join), not the binaryFile row stream.

    Scale shape: binaryFile is a FileScan — distributed, splittable by
    file, partition-prunable by path glob (pathGlobFilter pins *.bin
    here). One task per file group; no shuffle at all. At 100 TB the same
    plan reads s3a://bucket/assets/*.bin; only paths.storage_base
    changes.
    """
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _BINARYFILE_N_DOCS)
        .select("doc_id", "text")
        .collect()
    )
    stage = scratch_dir("scan_binaryfile")
    for r in docs:
        if r.text is None:
            # a failed fetch has no blob to stage (r8 nulls probe); the
            # oracle's octet_length(encode(text)) > 0 condition is NULL
            # for these rows, excluding them identically
            continue
        with open(os.path.join(stage, f"doc_{r.doc_id}.bin"), "wb") as f:
            f.write(r.text.encode("utf-8"))
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(stage)
    )
    return raw.select(
        F.regexp_extract(F.col("path"), "[^/]+$", 0).alias("fname"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("digest"),
    )


@query(
    "scan_partition_pruned",
    oracle="""
    SELECT event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           event_id, value
    FROM events
    WHERE strftime(ts, '%Y-%m-%d') = '2024-01-15'
    """,
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style date partitioning + partition-pruned read — THE serving
    layout for a 100 TB event store (one directory per day; a day query
    touches 1/365th of the files, enforced by the planner, not by luck).

    The fixture stage writes events partitioned by event_date; the read
    filters on the partition column and Catalyst turns it into a
    PartitionFilters entry — zero data files outside 2024-01-15 are even
    opened (asserted in tests/test_plans.py). The oracle recomputes the
    same rows from the unpartitioned view, proving the layout round-trip
    loses nothing.

    Parity: partition values are date strings derived with the same
    format in both engines; row payloads are raw source columns.
    """
    from bitcoin_price_etl_spark.paths import delete_path, sink_path

    ev = load(spark, sf_dir, "events")
    target = sink_path("partitioned/events_by_day")
    delete_path(spark, target)
    ev.select(
        "event_id",
        "ts",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
    ).write.partitionBy("event_date").parquet(target)
    back = spark.read.parquet(target).filter(
        F.col("event_date") == "2024-01-15"
    )
    return back.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "event_id",
        "value",
    )


_CORRUPT_EVERY = 7  # every 7th staged line is deliberately malformed


@query(
    "scan_corrupt_records",
    oracle=f"""
    WITH staged AS (
        SELECT doc_id,
               CASE WHEN doc_id % {_CORRUPT_EVERY} = 0 THEN 1 ELSE 0 END
                   AS is_corrupt
        FROM documents WHERE doc_id < 200
    )
    SELECT CAST(SUM(1 - is_corrupt) AS BIGINT) AS n_good,
           CAST(SUM(is_corrupt) AS BIGINT) AS n_corrupt,
           CAST(SUM(CASE WHEN is_corrupt = 0 THEN doc_id END) AS BIGINT)
               AS good_id_sum
    FROM staged
    """,
)
def scan_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode ingest of a partially-corrupt JSONL feed: good
    lines parse into columns, malformed lines land whole in
    _corrupt_record instead of killing the job — the
    bad-row-tolerant ingest posture of validate_quarantine applied one
    layer earlier, at the parser itself (a 100 TB crawl drop ALWAYS
    contains broken lines; a FAILFAST scan dies mid-epoch).

    The fixture stage writes every 7th document's line as malformed JSON
    (truncated brace); the scan declares the schema plus the
    _corrupt_record capture column and the result reports the split and
    an id-checksum of the good rows. The oracle derives the same triple
    from the documents view — any good line lost to the parser, or any
    bad line silently "parsed", flips a count or the checksum.

    Scale shape: a plain distributed FileScan + one aggregate; the
    corrupt capture adds one string column to the reader, no extra pass.
    """
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id")
        .collect()
    )
    stage = scratch_dir("scan_corrupt")
    path = os.path.join(stage, "feed.jsonl")
    with open(path, "w") as f:
        for r in docs:
            if r.doc_id % _CORRUPT_EVERY == 0:
                f.write('{"doc_id": %d, "payload": \n' % r.doc_id)
            else:
                f.write('{"doc_id": %d, "payload": "ok"}\n' % r.doc_id)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(stage)
    )
    good = F.col("_corrupt_record").isNull()
    return raw.agg(
        F.sum(F.when(good, 1).otherwise(0)).cast("long").alias("n_good"),
        F.sum(F.when(good, 0).otherwise(1)).cast("long").alias("n_corrupt"),
        F.sum(F.when(good, F.col("doc_id"))).cast("long").alias(
            "good_id_sum"
        ),
    )


@query(
    "scan_text",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           md5(text) AS line_md5
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text round-trip (spark.read.text — the format every
    raw log / one-JSON-per-line / one-doc-per-line corpus arrives in
    before it earns a schema). Each document exports as one
    tab-prefixed line (doc_id TAB text), reads back as raw `value`
    lines, and re-parses by splitting at the FIRST tab — the minimal
    schema-on-read step. Parity: per-line md5 against the source table
    proves byte-lossless round-trip.

    Framing (r8 hostile-text probe): embedded newlines would split one
    document across two lines — silent data corruption, routine in a
    real crawl corpus — so the line-framing metacharacters are
    percent-escaped on write (% → %25 first, then LF → %0A, CR → %0D;
    Hadoop's LineReader terminates lines on LF, CR, and CRLF) and
    decoded in reverse order on read (%25 strictly LAST, the classic
    percent-decoding order). Six scalar replaces, all JVM-side; text
    tabs need no escaping because the parse splits at the FIRST tab
    only and doc_id digits contain none.

    Scale shape: text files split by line boundary, so the read
    parallelizes like any splittable format; the parse is two zero-copy
    substring projections (no regex, no UDF). At 100 TB this is the
    ingest shape for raw crawl dumps — read.text → parse → write
    parquet once, query columnar forever after."""
    # A NULL text (failed fetch) has no representable line in a
    # line-oriented format — concat_ws would silently DROP the null and
    # emit a tab-less line that mis-parses. Such documents export
    # nothing; the oracle's WHERE text IS NOT NULL mirrors this.
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tmp = scratch_dir("scan_text")
    path = os.path.join(tmp, "documents_txt")
    escaped = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("%"), F.lit("%25")),
            F.lit("\n"),
            F.lit("%0A"),
        ),
        F.lit("\r"),
        F.lit("%0D"),
    )
    d.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), escaped).alias(
            "value"
        )
    ).write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    tab = F.instr("value", "\t")
    raw = F.substring("value", tab + 1, F.lit(2147483647))
    text = F.replace(
        F.replace(
            F.replace(raw, F.lit("%0D"), F.lit("\r")),
            F.lit("%0A"),
            F.lit("\n"),
        ),
        F.lit("%25"),
        F.lit("%"),
    )
    return lines.select(
        F.substring("value", 1, tab - 1).cast("long").alias("doc_id"),
        text.alias("text"),
    ).select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.md5("text").alias("line_md5"),
    )


@query(
    "scan_dpp_join",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS event_date
        FROM events
        WHERE day(ts) % 7 = 1
    )
    SELECT e.event_date, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
    FROM (SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type, value
          FROM events) e
    JOIN dim ON dim.event_date = e.event_date
    GROUP BY e.event_date, e.event_type
    """,
)
def scan_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the date-partitioned fact layout
    (scan_partition_pruned's serving format) joined to a SELECTIVELY
    FILTERED date dimension — Catalyst injects the dim's surviving keys
    into the fact scan's PartitionFilters at RUNTIME (dynamicpruning#N,
    reusing the broadcast), so only the matching day directories are
    even opened. scan_partition_pruned proves STATIC pruning (literal
    predicate); this key proves the join-driven variant — the shape that
    makes star-schema queries touch 1/Nth of a 100 TB fact without any
    literal date in the query text. Plan-asserted in tests/test_plans.py.

    The dim derives deterministically from the source (distinct dates
    with day-of-month % 7 = 1, ~1/7th of the calendar) so the pruning is
    genuinely selective at every SF; the oracle recomputes the same join
    from the unpartitioned view, proving the layout+pruning round-trip
    loses nothing. Payload parity: exact counts and the standard decimal
    sum discipline.
    """
    from bitcoin_price_etl_spark.paths import delete_path, sink_path

    ev = load(spark, sf_dir, "events")
    target = sink_path("partitioned/events_dpp")
    delete_path(spark, target)
    ev.select(
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
    ).write.partitionBy("event_date").parquet(target)
    fact = spark.read.parquet(target)
    dim = (
        ev.filter(F.expr("day(ts) % 7 = 1"))
        .select(F.date_format("ts", "yyyy-MM-dd").alias("event_date"))
        .distinct()
    )
    # partition-column type inference reads event_date back as DATE; the
    # string cast pins it (the sink_training_shards lesson, ADVICE r3)
    fact = fact.withColumn("event_date", F.col("event_date").cast("string"))
    return (
        fact.join(F.broadcast(dim), "event_date")
        .groupBy("event_date", "event_type")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_events"),
            F.expr(
                "CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE)"
            ).alias("sum_value"),
        )
    )
