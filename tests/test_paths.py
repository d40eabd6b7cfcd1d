"""Storage-path abstraction tests (R6/R7): sinks resolve through the
configured base URI and clean up through the scheme-agnostic Hadoop FS
delete — the only delta between local dev and gs://-s3a:// production is
the SPARK_GRAFT_STORAGE_BASE value."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bitcoin_price_etl_spark.paths import (
    _session_token,
    delete_path,
    sink_path,
    storage_base,
)
from bitcoin_price_etl_spark.registry import load_all
from tests.conftest import SF_SMOKE

TEST_BASE = "file:///tmp/spark_graft_test_base"
TEST_BASE_LOCAL = "/tmp/spark_graft_test_base"


def test_storage_base_env_swap(spark, monkeypatch):
    """Pointing SPARK_GRAFT_STORAGE_BASE at a different URI relocates every
    sink; repeated runs do NOT accumulate appends or scratch dirs."""
    monkeypatch.setenv("SPARK_GRAFT_STORAGE_BASE", TEST_BASE)
    assert storage_base() == TEST_BASE
    # per-process token isolates concurrent sessions sharing one base
    assert sink_path("x/y") == f"{TEST_BASE}/{_session_token()}/x/y"
    assert _session_token() == f"pid{os.getpid()}"

    expected = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .filter(F.col("l_quantity") >= 45.0)
        .count()
    )
    for _ in range(2):  # second run must not see the first run's appends
        out = load_all()["sink_parquet_append"].fn(spark, SF_SMOKE)
        assert out.count() == 2 * expected
    assert os.path.isdir(
        f"{TEST_BASE_LOCAL}/{_session_token()}/sink_append/bpi_xr_hourly_twin"
    )


def test_delete_path_is_scheme_agnostic(spark, monkeypatch):
    """delete_path goes through the JVM Hadoop FileSystem resolved FROM the
    path URI — the same call deletes gs:// or s3a:// targets when those
    connectors are on the classpath."""
    monkeypatch.setenv("SPARK_GRAFT_STORAGE_BASE", TEST_BASE)
    target = sink_path("delete_probe")
    local = f"{TEST_BASE_LOCAL}/{_session_token()}/delete_probe"
    spark.range(10).write.mode("overwrite").parquet(target)
    assert os.path.isdir(local)
    delete_path(spark, target)
    assert not os.path.exists(local)


def test_compaction_preserves_rows_and_reduces_files(spark, monkeypatch):
    """Compaction contract: per-partition row counts unchanged, file count
    strictly reduced (8 fragmented appends -> 1 per partition here)."""
    monkeypatch.setenv("SPARK_GRAFT_STORAGE_BASE", TEST_BASE)
    rows = load_all()["sink_compact_small_files"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.files_after < r.files_before
        assert r.n_rows > 0


def test_package_registered_pickle_by_value():
    """Worker-portability pin (r5): UDFs and the Python DataSource class
    must serialize BY VALUE so Spark python workers never need the repo
    on their own sys.path (a driver launched outside the repo spawns
    workers without it — llm_multimodal_decode/resize and
    source_rest_datasource failed exactly that way). The package
    __init__ registers the root module with pyspark's vendored
    cloudpickle; registration of the root covers every submodule."""
    from pyspark import cloudpickle

    import bitcoin_price_etl_spark as pkg

    assert "bitcoin_price_etl_spark" in set(
        cloudpickle.list_registry_pickle_by_value()
    ), "package must be registered for pickle-by-value (see __init__.py)"
    # and the registration survives a round-trip of a module-level fn:
    # a by-VALUE pickle ships the function's code object, so the blob must
    # carry its raw bytecode and be far larger than a by-reference pickle
    # (~100 B of module+qualname). ADVICE r5: assert the strong property
    # directly, not a size heuristic a fat by-reference blob could pass.
    from bitcoin_price_etl_spark.sources.scans import synth_bpi_documents

    blob = cloudpickle.dumps(synth_bpi_documents)
    co_code = synth_bpi_documents.__code__.co_code
    assert co_code in blob, (
        "by-value pickle must embed the function's code object bytes — "
        "a module-reference pickle was shipped instead"
    )
    assert len(blob) > 1000, f"blob suspiciously small ({len(blob)} B)"
    assert pkg is not None
