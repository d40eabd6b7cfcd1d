"""UDF / UDAF / UDTF surface (SURVEY.md §2.2 — closest reference analog is
the Pydantic field validators, row-level Python predicates at
common_module/pydantic_models.py:26-34,67-70).

Hierarchy, fastest first: built-in JVM expression > Arrow pandas UDF >
row-at-a-time Python UDF. The scalar Python UDF exists to prove the surface;
every hot-path operator in this engine uses built-ins or pandas UDFs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.registry import query


@query(
    "udf_scalar",
    oracle="""
    SELECT c_custkey,
           CAST(split_part(c_name, '#', 2) AS BIGINT) AS name_num,
           lower(replace(c_name, '#', '_')) AS name_snake
    FROM customer
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path, kept off hot paths): parse
    the numeric suffix out of 'Customer#000000123' — the kind of per-value
    validation the reference does in Pydantic validators."""

    @udf("long")
    def name_number(name: str) -> int:
        return int(name.split("#")[1])

    @udf("string")
    def snakeify(name: str) -> str:
        return name.replace("#", "_").lower()

    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        name_number("c_name").alias("name_num"),
        snakeify("c_name").alias("name_snake"),
    )


@query(
    "udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF: vectorized net-price. Elementwise
    float64 ops are IEEE-identical to the engines' per-row arithmetic, so
    this is oracle-exact (unlike reductions)."""

    @pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@query(
    "udf_grouped",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-group pandas frame in, one summary row
    out. Uses exact statistics (count/min/max) so the Arrow path is
    oracle-checkable; float means would reintroduce summation-order drift."""

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n_rows": [len(pdf)],
                "min_price": [pdf["l_extendedprice"].min()],
                "max_price": [pdf["l_extendedprice"].max()],
            }
        )

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").applyInPandas(
        summarize,
        "l_returnflag string, n_rows long, min_price double, max_price double",
    )


@query(
    "udtf",
    oracle="""
    SELECT doc_id, unnest(str_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 100
    """,
)
def udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+/4.x table function): one row per token — the
    JSON/exploder-style table function of SURVEY.md §2.2."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string")
    class Tokenize:
        def eval(self, text: str):
            # NULL text (a failed fetch) yields zero rows — the exact
            # semantics of the oracle's unnest(str_split(NULL, ' ')),
            # which unnests NULL to nothing.
            if text is None:
                return
            for tok in text.split(" "):
                yield (tok,)

    spark.udtf.register("tokenize_udtf", Tokenize)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        "SELECT d.doc_id, t.token "
        "FROM udtf_docs_in d, LATERAL tokenize_udtf(d.text) t"
    )


@query("udf_mapinpandas", oracle=None)
def udf_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas iterator UDF: whole-partition Arrow batches, here doing a
    batch-local running computation (cumulative event count per batch) that
    a scalar UDF cannot express. Rows-only: batch boundaries are a physical
    detail."""

    def batch_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["event_id", "value"]].copy()
            out["batch_rows"] = len(pdf)
            yield out

    ev = load(spark, sf_dir, "events").select("event_id", "value")
    return ev.mapInPandas(batch_stats, "event_id long, value double, batch_rows long")


@query(
    "udf_grouped_agg",
    oracle="""
    SELECT user_id,
           MAX(value) - MIN(value) AS value_range,
           COUNT(*) AS n
    FROM events
    GROUP BY user_id
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF: a vectorized aggregate usable in groupBy/agg
    (and over windows). Exact max−min so the Arrow path is oracle-checkable."""

    @pandas_udf("double")
    def value_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # GROUPED_AGG UDFs cannot mix with JVM aggregates in one agg(),
        # so the count is a pandas aggregate too
        return int(len(v))

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        value_range("value").alias("value_range"),
        n_rows("value").alias("n"),
    )


@query(
    "udf_mapinarrow",
    oracle="""
    SELECT event_id, value * 2.0 AS doubled FROM events
    """,
)
def udf_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow iterator UDF: whole-partition Arrow RecordBatches with NO
    pandas conversion — the lowest-overhead Python hook (mapInPandas pays an
    Arrow→pandas→Arrow round-trip per batch on top of this).

    The transform (value × 2) is exact in IEEE doubles, so this Python-side
    path is still oracle-checkable — proving the Arrow transport is
    lossless for int64/float64.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = load(spark, sf_dir, "events").select("event_id", "value")

    def double_value(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [batch.column("event_id"), pc.multiply(batch.column("value"), 2.0)],
                names=["event_id", "doubled"],
            )

    return ev.mapInArrow(double_value, "event_id long, doubled double")
