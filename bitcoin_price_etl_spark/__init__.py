"""bitcoin_price_etl_spark — PySpark-native analytics engine.

Worker-portability guard: UDF functions and the Python DataSource class
live at module level in this package, so Spark's cloudpickle would
normally serialize them BY REFERENCE (module + qualname) and every
Python worker would need `bitcoin_price_etl_spark` importable on its
own sys.path. That holds when the driver process is launched from the
repo root, but a harness that imports `__spark_entry__` via a
sys.path.insert from another working directory spawns workers WITHOUT
the repo on their path — ModuleNotFoundError inside the worker (caught
in round 5 on llm_multimodal_decode/resize and source_rest_datasource:
the failure is environment-dependent, not code-dependent).

Registering the package for pickle-BY-VALUE makes cloudpickle ship the
function/class bodies themselves; registration of the root package
covers every submodule (cloudpickle walks parent packages). This must
use pyspark's vendored cloudpickle — the same module instance
pyspark.serializers loads — and is a no-op burden on payload size at
our UDF count.
"""

try:  # pragma: no cover - trivially exercised by every UDF test
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception as _ex:  # noqa: BLE001 - guard must never block import
    # Any registration failure (no register_pickle_by_value attr, a
    # vendored-cloudpickle ValueError on exotic import machinery, ...)
    # silently loses the worker-portability guarantee (the round-5
    # ModuleNotFoundError class returns) — downgrade loudly, never block
    # import (ADVICE r5: the loudness is the point, not the narrowing;
    # a narrowed except would turn an unanticipated failure mode into an
    # import crash, the exact outcome this guard exists to prevent).
    import warnings as _warnings

    _warnings.warn(
        "bitcoin_price_etl_spark: pickle-by-value registration unavailable "
        f"({_ex!r}); UDFs will pickle by reference and Python workers must "
        "have the repo on their own sys.path",
        RuntimeWarning,
        stacklevel=2,
    )
