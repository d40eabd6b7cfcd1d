"""Differential tests: every oracle-bearing registry key must match DuckDB
bit-for-bit (the driver's CORRECTNESS gate, run locally)."""

from __future__ import annotations

import pytest

from bitcoin_price_etl_spark.registry import load_all
from tests.oracle import compare_to_oracle

ORACLE_KEYS = sorted(k for k, spec in load_all().items() if spec.oracle is not None)
ROWS_ONLY_KEYS = sorted(k for k, spec in load_all().items() if spec.oracle is None)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(spark, sf_dir, key):
    compare_to_oracle(spark, key, sf_dir)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, sf_dir, key):
    """Rows-only keys must at least execute and return a stable schema."""
    spec = load_all()[key]
    df = spec.fn(spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_no_canonicalizer_trap_types(spark, sf_dir, key):
    """No oracle-bearing key may emit ARRAY/MAP/STRUCT/DECIMAL/BINARY/
    VARIANT output columns: the driver canonicalizer cannot hash list
    cells and hashes decimals engine-differently (the r1 agg_listagg and
    r2 llm_embed_normalize failures). Schema-only — no job runs."""
    spec = load_all()[key]
    df = spec.fn(spark, sf_dir)
    bad = {
        f.name: f.dataType.simpleString()
        for f in df.schema
        if f.dataType.simpleString().split("<")[0].split("(")[0]
        in {"array", "map", "struct", "decimal", "binary", "variant"}
    }
    assert not bad, (
        f"{key}: canonicalizer-unsafe output columns {bad} — format to "
        "string / cast to double at the edge (exprs.py rule)"
    )


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001",
                                "/root/testdata/sf0.01"])
def test_no_oracle_is_vacuous(sf):
    """Every oracle must return at least one row at BOTH the smoke scale
    and the driver's sf0.01 gate scale: an empty result passes the hash
    gate while proving nothing (five keys shipped that way before the
    round-3 audit — Q20/Q22/join_anti/subquery_in_agg/llm_dedup_embed
    had predicates the fixtures could never satisfy, and round 4e's
    first llm_template_mine formulation was empty ONLY at sf0.01+ —
    scale-dependent vacuousness the single-SF check missed). DuckDB-only,
    no Spark session, so running both scales is cheap."""
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    empty = []
    for key in ORACLE_KEYS:
        sql = load_all()[key].oracle
        if len(con.sql(sql).fetchall()) == 0:
            empty.append(key)
    assert not empty, f"vacuous oracles (0 rows at {sf}): {empty}"
