"""Custom PySpark 4 Python DataSource for the REST JSON poller (R1/R2).

The reference polls two REST APIs driver-side inside Airflow tasks
(dags/bpi_etl/bpi_etl_bigquery.py:62-63,127-128). The engine-native
generalization is a Spark DataSource: `spark.read.format("bpi_rest")`
yields one row per API snapshot, partitioned across executors, so a
thousand-endpoint poll fans out instead of serializing on the driver.

Offline in this harness: the "HTTP responses" are the deterministic replay
fixtures from scans.synth_bpi_documents. The reader structure (partitions →
per-partition fetch → Arrow rows) is the real scale plumbing; swapping the
fixture call for `requests.get` is the only production delta.
"""

from __future__ import annotations

import json

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql import types as T

# Module-level import (NOT deferred inside read()): a runtime
# `from bitcoin_price_etl_spark...` executed on a worker requires the
# package on the worker's sys.path, which fails when the driver process
# was launched outside the repo (round-5 vanilla-session catch). As a
# captured global of a pickle-by-value module (see package __init__),
# the function ships inside the serialized reader instead.
from bitcoin_price_etl_spark.sources.scans import synth_bpi_documents

SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_id", T.IntegerType()),
        T.StructField("time_updated_iso", T.StringType()),
        T.StructField("chart_name", T.StringType()),
        T.StructField("usd_rate", T.DoubleType()),
        T.StructField("gbp_rate", T.DoubleType()),
        T.StructField("eur_rate", T.DoubleType()),
    ]
)


class BpiRestDataSource(DataSource):
    """spark.read.format("bpi_rest").option("snapshots", N)"""

    @classmethod
    def name(cls) -> str:
        return "bpi_rest"

    def schema(self):
        return SNAPSHOT_SCHEMA

    def reader(self, schema):
        return BpiRestReader(int(self.options.get("snapshots", "24")))

    def simpleStreamReader(self, schema):
        return BpiRestStreamReader(int(self.options.get("snapshots", "24")))


class BpiRestReader(DataSourceReader):
    def __init__(self, snapshots: int):
        self.snapshots = snapshots

    def partitions(self):
        # one partition per 8 snapshots: the poll fan-out unit
        return [InputPartition(i) for i in range(0, self.snapshots, 8)]

    def read(self, partition):
        docs = synth_bpi_documents(self.snapshots)
        start = partition.value
        for i in range(start, min(start + 8, self.snapshots)):
            doc = json.loads(docs[i])
            yield (
                i,
                doc["time"]["updatedISO"],
                doc["chartName"],
                doc["bpi"]["USD"]["rate_float"],
                doc["bpi"]["GBP"]["rate_float"],
                doc["bpi"]["EUR"]["rate_float"],
            )


class BpiRestStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the poller (PySpark 4 SimpleDataSourceStreamReader):
    each micro-batch reads the next window of snapshots — the engine form
    of the reference's @hourly poll loop (R19 cadence × R1/R2 fetch), with
    the offset = snapshot index checkpointed by Spark, so restarts resume
    exactly where the last run committed (no re-poll, no gap).

    Offline, snapshots replay deterministically from the fixture generator;
    `readBetweenOffsets` re-derives any committed window for recovery —
    the contract a production poller satisfies by persisting raw responses
    (exactly the reference's raw-zone upload, bpi_etl_bigquery.py:80-84).
    """

    BATCH = 6

    def __init__(self, snapshots: int):
        self.snapshots = snapshots

    def initialOffset(self):
        return {"idx": 0}

    def _rows(self, start: int, end: int):
        docs = synth_bpi_documents(self.snapshots)
        out = []
        for i in range(start, end):
            doc = json.loads(docs[i])
            out.append(
                (
                    i,
                    doc["time"]["updatedISO"],
                    doc["chartName"],
                    doc["bpi"]["USD"]["rate_float"],
                    doc["bpi"]["GBP"]["rate_float"],
                    doc["bpi"]["EUR"]["rate_float"],
                )
            )
        return out

    def read(self, start):
        i = start["idx"]
        end = min(i + self.BATCH, self.snapshots)
        return iter(self._rows(i, end)), {"idx": end}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["idx"], end["idx"]))


@dataclass
class _PushCommit(WriterCommitMessage):
    part_file: str
    n_rows: int


class BpiRestSinkWriter(DataSourceWriter):
    """Write side of the poller surface (PySpark 4 DataSourceWriter): each
    task POSTs its partition's rows to the ingestion endpoint and returns a
    commit message; `commit()` runs driver-side only after EVERY task
    succeeded, publishing the batch manifest — Spark's two-phase commit
    makes the push all-or-nothing per job, with `abort()` cleaning up
    partials (the idempotent-retry story the reference gets from
    WRITE_APPEND + Airflow retries, as engine protocol).

    Offline, the 'endpoint' is newline-JSON part files under the
    configured storage base (the only production delta is swapping the
    file append for `requests.post`); the manifest lists committed parts.

    CONSTRAINT: the offline file emulation writes with local os APIs on
    executors while commit()/abort() run driver-side against the same
    paths — valid only where driver and executors share a filesystem
    (local mode here; NFS/fuse mounts on a cluster). The production form
    has no such constraint: write() POSTs and returns the server-assigned
    batch id, commit() publishes those ids, abort() POSTs deletes — no
    executor-local state. abort() additionally sweeps *.inprogress
    leftovers so a task killed mid-write cannot leak a partial file.
    """

    def __init__(self, base: str):
        self.base = base

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        os.makedirs(self.base, exist_ok=True)
        part = os.path.join(self.base, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part + ".inprogress", "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        os.rename(part + ".inprogress", part)
        return _PushCommit(part_file=part, n_rows=n)

    def commit(self, messages):
        import json as _json
        import os

        manifest = {
            "parts": sorted(m.part_file for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.base, "_MANIFEST.json"), "w") as f:
            f.write(_json.dumps(manifest))

    def abort(self, messages):
        import glob
        import os

        for m in messages:
            if m is not None and os.path.exists(m.part_file):
                os.remove(m.part_file)
        # tasks that died mid-write never produced a commit message; their
        # .inprogress partials are only findable by sweeping the base
        for leftover in glob.glob(os.path.join(self.base, "*.inprogress")):
            os.remove(leftover)


class BpiRestSinkDataSource(DataSource):
    """df.write.format("bpi_rest_sink").option("path", dir).save()"""

    @classmethod
    def name(cls) -> str:
        return "bpi_rest_sink"

    def writer(self, schema, overwrite: bool):
        return BpiRestSinkWriter(self.options["path"])
