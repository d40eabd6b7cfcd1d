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
