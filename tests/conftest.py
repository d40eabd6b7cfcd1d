from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
# Local parity suite scale. Default sf0.001 keeps the suite fast for
# iteration, but the DRIVER gate runs sf0.01 and divergence classes exist
# that only materialize there (fixture sort-key ties, oracles vacuous only
# at the larger SF). The recorded round-close gate is therefore NOT this
# suite — it is the full-registry sf0.01 probe (tools/vanilla_probe.py
# --record PROBE_r{N}.json; see VERIFY_ROUND.md), run before every round
# ends. Set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to run this
# suite at the driver's scale (~4 min).
SF_CORRECT = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from bitcoin_price_etl_spark.session import get_spark

    s = get_spark("bpe-spark-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_CORRECT
