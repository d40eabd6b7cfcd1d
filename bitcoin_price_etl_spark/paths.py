"""Storage-path configuration (R6/R7): where the engine reads staged data
and writes sinks.

The reference pipeline stages to and loads from an object store
(GCS upload/download, reference dags/bpi_etl/bpi_etl_bigquery.py:80-84,
181-185). Spark reaches the same stores through Hadoop FileSystem
connectors, so the ONLY thing that changes between local dev and a
1000-executor cluster is the base URI:

    SPARK_GRAFT_STORAGE_BASE=file:///tmp/spark_graft_scratch   (default)
    SPARK_GRAFT_STORAGE_BASE=gs://bucket/prefix     (gcs-connector on cp)
    SPARK_GRAFT_STORAGE_BASE=s3a://bucket/prefix    (hadoop-aws + creds)
    SPARK_GRAFT_STORAGE_BASE=hdfs://nn:8020/prefix

Every sink/scratch path in the engine resolves through this module; no
operator hard-codes a filesystem. Path manipulation is pure string/URI
work and deletion goes through the JVM Hadoop FileSystem API, so any
configured scheme behaves identically (tests exercise a non-default
`mock:` scheme mapped onto the local FS to prove scheme-agnosticism).

The anti-hotspot salted prefix (R8, bpi_etl_bigquery.py:8-23) composes on
top: `sink_salted` partitions under whatever base is configured.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_BASE = "file:///tmp/spark_graft_scratch"


def _session_token() -> str:
    """Per-process isolation token: two concurrent sessions on one host
    (driver run + bench, parallel pytest workers) must not wipe each
    other's staged data mid-query (round-2 ADVICE — the stable-location
    scheme this refines was single-session only). Resolved at call time,
    always driver-side: executors receive fully-resolved paths, so the
    driver PID is the session identity everywhere."""
    return f"pid{os.getpid()}"


def storage_base() -> str:
    """Base URI for all engine-managed output paths (env-configurable)."""
    return os.environ.get("SPARK_GRAFT_STORAGE_BASE", DEFAULT_BASE).rstrip("/")


def sink_path(name: str) -> str:
    """Stable-within-a-session, per-key output location under the
    configured base.

    Stable names + overwrite/explicit-delete semantics, NOT fresh mkdtemp
    per call: repeated runs in one session reuse one location instead of
    accumulating unbounded /tmp garbage (round-1 ADVICE). The per-process
    token keeps concurrent sessions from clobbering each other."""
    return f"{storage_base()}/{_session_token()}/{name}"


def delete_path(spark: SparkSession, path: str) -> None:
    """Scheme-agnostic recursive delete via the Hadoop FileSystem API —
    works for file:, gs:, s3a:, hdfs: alike (local shutil would not)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def scratch_root() -> str:
    """This session's local scratch root (no wipe — path resolution only)."""
    return os.path.join("/tmp", "spark_graft_local_scratch", _session_token())


def scratch_dir(name: str) -> str:
    """LOCAL scratch directory under this session's root, wiped and
    recreated on each call.

    For driver-local staging only (e.g. copying a single-file fixture into
    a directory for a file-streaming source); engine output goes through
    sink_path/storage_base instead."""
    base = os.path.join(scratch_root(), name)
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    return base
