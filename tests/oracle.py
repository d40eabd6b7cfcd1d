"""Differential oracle harness mirroring the driver's correctness gate:
run the Spark query and its DuckDB oracle SQL on the same parquet tables,
compare row count, column names, and the order-insensitive multiset of
values — exactly (no float tolerance: the engine's decimal-sum discipline
is supposed to make results bit-identical; a looser check would hide
failures the driver will catch)."""

from __future__ import annotations

import math
from typing import Any

import duckdb

from bitcoin_price_etl_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    """Type-tagged normalization: Python's cross-type equality (Decimal(1.0)
    == 1.0, 1 == 1.0, True == 1) would hide type mismatches that the
    driver's schema/value compare can catch — a DuckDB DECIMAL literal
    leaking into a double column slipped through exactly this way once.
    Tagging each cell with its type name makes the local gate at least as
    strict as the driver's."""
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        if v == 0.0:
            return ("float", 0.0)  # collapse -0.0 / +0.0
        return ("float", v)
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_norm_cell(x) for x in v))
    return (type(v).__name__, v)


# The driver canonicalizes BOTH results through pandas before hashing, and
# pandas hashes the same number differently per dtype (int64 241109 vs the
# float64 241109.0 a DuckDB HUGEINT sum becomes) — so matching VALUES with
# mismatched WIDTHS passes a fetchall()-based compare but can fail the
# driver. Map both engines' declared column types to a canonical pandas-
# dtype tag and require exact equality, with zero extra query execution.
_DUCK_DTYPE = {
    "TINYINT": "i8", "SMALLINT": "i16", "INTEGER": "i32", "BIGINT": "i64",
    "HUGEINT": "f64",  # pandas renders hugeint as float64
    "FLOAT": "f32", "DOUBLE": "f64",
    "VARCHAR": "obj", "BOOLEAN": "bool",
    "DATE": "date", "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts",
}
_SPARK_DTYPE = {
    "byte": "i8", "short": "i16", "int": "i32", "bigint": "i64",
    "float": "f32", "double": "f64",
    "string": "obj", "boolean": "bool",
    "date": "date", "timestamp": "ts", "timestamp_ntz": "ts",
}


def _dtype_tags(names: list[str], types: list[str], table: dict) -> dict:
    out = {}
    for n, t in zip(names, types):
        base = t.split("(")[0].strip().upper() if table is _DUCK_DTYPE else t
        out[n] = table.get(base if table is _DUCK_DTYPE else t, f"?{t}")
    return out


def _normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_to_oracle(spark, key: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result for one registry key."""
    from bitcoin_price_etl_spark.registry import load_all

    spec = load_all()[key]
    assert spec.oracle is not None, f"{key} has no oracle"

    sdf = spec.fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    res = con.sql(spec.oracle)
    d_cols = list(res.columns)
    d_types = [str(t) for t in res.types]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{key}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    s_tags = _dtype_tags(s_cols, [f.dataType.simpleString() for f in sdf.schema],
                         _SPARK_DTYPE)
    d_tags = _dtype_tags(d_cols, d_types, _DUCK_DTYPE)
    bad = {c: (s_tags[c], d_tags[c]) for c in s_tags if s_tags[c] != d_tags[c]}
    assert not bad, (
        f"{key}: pandas-dtype mismatch (spark, duck) per column: {bad} — "
        "the driver canonicalizer hashes these differently; cast both sides "
        "to the same width"
    )
    assert len(s_rows) == len(d_rows), (
        f"{key}: row count mismatch spark={len(s_rows)} duck={len(d_rows)}"
    )

    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{key}: value mismatch; first diffs {diffs}")
