"""Guard: no Python-RDD literal frames anywhere in the package (VERDICT r9
item 5). spark.createDataFrame(list_of_rows) parallelizes the rows through
a Python RDD — spark.default.parallelism tasks each paying a Python worker
round-trip, measured at 2-12 s for ONE audit row under worker-pool churn
(the validate_observe_metrics root cause, commit 85c290f). Every literal
frame must go through exprs.literal_rows_df (JVM-side inline(array(struct)))
instead. The only allowed createDataFrame call sites are inside
literal_rows_df itself, and they are schema-only (empty rows list) — pure
driver-side schema construction, no rows shipped."""

from __future__ import annotations

import ast
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bitcoin_price_etl_spark",
)


def _call_sites():
    for root, _dirs, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            with open(path) as f:
                tree = ast.parse(f.read(), filename=path)
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "createDataFrame"
                ):
                    yield os.path.relpath(path, PKG), node


def test_only_literal_rows_df_calls_createdataframe():
    offenders = []
    for rel, node in _call_sites():
        if rel != "exprs.py":
            offenders.append((rel, node.lineno))
            continue
        # inside exprs.py the first argument must be a literal empty list
        # (schema-only construction) — any rows-carrying call is a
        # regression even there
        first = node.args[0] if node.args else None
        if not (isinstance(first, ast.List) and not first.elts):
            offenders.append((rel, node.lineno))
    assert not offenders, (
        "Python-RDD literal frames found (use exprs.literal_rows_df): "
        f"{offenders}"
    )
