"""stage() — the single staging point behind every lineage-cut site.

VERDICT r6 item 8: the localCheckpoint→persist(DISK_ONLY)/checkpoint swap
for cluster deployments must be a config flip (`spark.graft.staging`),
not a ~46-site edit. These tests pin that contract: identical results in
every mode, the documented storage behavior per mode, and zero remaining
direct `.localCheckpoint()` call sites in the engine package.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.session import stage, stage_iter
from tests.conftest import SF_SMOKE

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "bitcoin_price_etl_spark")


@pytest.fixture
def _restore_mode(spark):
    yield
    spark.conf.set("spark.graft.staging", "localCheckpoint")


def _frame(spark):
    return (
        spark.range(200)
        .select(
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 3).alias("v"),
        )
        .groupBy("g")
        .agg(F.sum("v").alias("s"))
    )


def test_stage_modes_agree(spark, _restore_mode):
    expected = sorted(map(tuple, _frame(spark).collect()))
    for mode in ("localCheckpoint", "persist_disk"):
        spark.conf.set("spark.graft.staging", mode)
        got = sorted(map(tuple, _frame(spark).transform(stage).collect()))
        assert got == expected, mode


def test_stage_persist_disk_uses_disk_only(spark, _restore_mode):
    spark.conf.set("spark.graft.staging", "persist_disk")
    out = _frame(spark).transform(stage)
    lvl = out.storageLevel
    assert lvl.useDisk and not lvl.useMemory, lvl
    out.unpersist()


def test_stage_default_is_localcheckpoint(spark):
    # default mode cuts lineage eagerly: the staged plan is a scan of
    # materialized blocks, not the original aggregate
    out = _frame(spark).transform(stage)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan


def test_stage_iter_truncates_lineage_in_every_mode(spark, _restore_mode, tmp_path):
    """Loop-interior staging exists FOR plan-growth control: persist()
    keeps the full logical plan (the analyzed plan would double per
    pagerank/label-prop round), so stage_iter must cut lineage in
    persist_disk mode too (ADVICE r7) — via reliable checkpoint when a
    checkpoint dir is set, localCheckpoint otherwise."""
    expected = sorted(map(tuple, _frame(spark).collect()))
    for mode, ckdir in (
        ("localCheckpoint", None),
        ("persist_disk", None),
        ("persist_disk", str(tmp_path / "ck")),
    ):
        spark.conf.set("spark.graft.staging", mode)
        if ckdir:
            spark.sparkContext.setCheckpointDir(ckdir)
        out = _frame(spark).transform(stage_iter)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, (
            mode,
            ckdir,
            plan,
        )
        assert sorted(map(tuple, out.collect())) == expected, (mode, ckdir)
    import os

    assert os.path.isdir(str(tmp_path / "ck"))  # reliable path actually used


def test_no_direct_localcheckpoint_sites_remain():
    """Every staging site must go through stage() so the swap stays a
    config flip; a new direct .localCheckpoint() call reopens the
    46-site-edit problem."""
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            with open(path) as fh:
                for i, line in enumerate(fh, 1):
                    if ".localCheckpoint()" in line and "session.py" not in path:
                        offenders.append(f"{path}:{i}")
    assert not offenders, offenders


def test_parquet_num_rows_matches_spark_count(spark, tmp_path):
    """catalog.parquet_num_rows feeds llm_semdedup's K and
    llm_dedup_embed's path cutover — a wrong footer count silently
    changes plans. Pin it against Spark's count for both layouts: the
    fixtures' single-file tables and a Spark-written directory of
    parts. Unreadable paths must return None (the Spark-count
    fallback), never raise."""
    from bitcoin_price_etl_spark.catalog import load, parquet_num_rows

    for t in ("embeddings", "documents", "nation"):
        assert parquet_num_rows("/root/testdata/sf0.001", t) == load(
            spark, "/root/testdata/sf0.001", t
        ).count()

    df = spark.range(1234).selectExpr("id AS vec_id")
    df.repartition(7).write.parquet(str(tmp_path / "t.parquet"))
    assert parquet_num_rows(str(tmp_path), "t") == 1234

    assert parquet_num_rows(str(tmp_path), "missing") is None
    (tmp_path / "garbage.parquet").write_bytes(b"not parquet at all")
    assert parquet_num_rows(str(tmp_path), "garbage") is None

    # ADVICE r7: a directory with zero .parquet parts (only _SUCCESS, or
    # a partial write) is "unknown", not "empty" — 0 would make the
    # size-adaptive planners plan against n=0
    empty = tmp_path / "empty.parquet"
    empty.mkdir()
    (empty / "_SUCCESS").write_bytes(b"")
    assert parquet_num_rows(str(tmp_path), "empty") is None


def _stage_consuming_registry_keys():
    """Enumerate every registry key whose code path reaches stage()/
    stage_iter() — AST over the package (direct uses) plus a bounded
    transitive chase through the call graph (helpers like
    dedup._posting_with_df stage on behalf of their callers). VERDICT r7
    item 1: the persist_disk equality proof must cover every stage()
    consumer, not a hand-picked five — and a NEW staging site added
    later is picked up here automatically."""
    import ast
    import functools

    stagers: set[str] = set()
    calls: dict[str, set[str]] = {}
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if not f.endswith(".py"):
                continue
            tree = ast.parse(open(os.path.join(root, f)).read())
            for node in ast.walk(tree):
                if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    continue
                called: set[str] = set()
                uses_stage = False
                for n in ast.walk(node):
                    if isinstance(n, ast.Name) and n.id in ("stage", "stage_iter"):
                        uses_stage = True
                    if isinstance(n, ast.Call):
                        if isinstance(n.func, ast.Name):
                            called.add(n.func.id)
                        elif isinstance(n.func, ast.Attribute):
                            called.add(n.func.attr)
                if uses_stage:
                    stagers.add(node.name)
                calls.setdefault(node.name, set()).update(called)

    @functools.lru_cache(maxsize=None)
    def consumes(fn: str, depth: int = 0) -> bool:
        if fn in stagers:
            return True
        if depth > 4:
            return False
        return any(
            consumes(c, depth + 1) for c in calls.get(fn, ()) if c != fn
        )

    from bitcoin_price_etl_spark.registry import load_all

    reg = load_all()
    return sorted(k for k, spec in reg.items() if consumes(spec.fn.__name__))


def test_stage_consumer_enumeration_is_sane():
    """The AST chase must keep finding the known staged families — an
    enumeration that silently collapses (a rename, an AST shape change)
    would turn the persist_disk sweep into a vacuous loop over nothing."""
    keys = _stage_consuming_registry_keys()
    assert len(keys) >= 30, keys
    for known in (
        "graph_pagerank",
        "graph_khop_reach",
        "llm_dedup_keep",
        "llm_dedup_ngram",
        "graph_assortativity",
        "ts_lead_lag_xcorr",
        "tpch_q2",
    ):
        assert known in keys, (known, keys)
    # llm_semdedup intentionally left the staged set in r11: the Arrow
    # argmin-on-scan + per-cell pair sweep has no intermediate to stage.
    assert "llm_semdedup" not in keys, keys


def test_persist_disk_mode_end_to_end_on_staged_operators(spark, _restore_mode):
    """The 100 TB claim is that flipping spark.graft.staging is the WHOLE
    deployment change — prove it through real operators across EVERY
    stage()/stage_iter() consumer in the registry (VERDICT r7 item 1;
    enumeration above): identical results under persist_disk and the
    default localCheckpoint mode. The recorded registry-wide sf0.01
    evidence is PROBE_r08_persistdisk.json (vanilla probe --staging
    persist_disk, exact-eq vs DuckDB)."""
    from bitcoin_price_etl_spark.registry import load_all

    reg = load_all()
    keys = _stage_consuming_registry_keys()
    baseline = {}
    for k in keys:
        baseline[k] = sorted(map(tuple, reg[k].fn(spark, SF_SMOKE).collect()))
    spark.conf.set("spark.graft.staging", "persist_disk")
    for k in keys:
        got = sorted(map(tuple, reg[k].fn(spark, SF_SMOKE).collect()))
        assert got == baseline[k], f"{k}: persist_disk output differs"
