"""Multimodal columns (north star, BASELINE.json): image/audio/video as
opaque binary payloads with typed metadata, processed by Arrow-batched
Pandas functions over mapInPandas.

The decode step is STUBBED (the container has no image/audio libraries) —
`decode_image_batch` raises NotImplementedError unless a deterministic fake
decoder is requested — but the Spark-side plumbing is real and tested:
binary column construction, metadata struct, content-hash partitioning (the
reference's R8 salted-key recipe,
dags/bpi_etl/bpi_etl_bigquery.py:8-23), mapInPandas schema/batch shape.

Scale notes: payloads never shuffle — metadata extraction is a narrow map;
the salted partition key spreads writes across the keyspace exactly like the
reference's GCS anti-hotspot prefix.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.registry import query

FEATURE_DIM = 4

DECODED_SCHEMA = (
    "doc_id long, content_hash string, payload_len int, "
    "features array<double>, decode_status string"
)


def decode_image_batch(
    batches: Iterator[pd.DataFrame], *, fake: bool = True
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: binary payload → feature vector.

    Real pipelines decode with PIL/torchvision/ffmpeg here; those libs are
    absent, so `fake=False` raises NotImplementedError and `fake=True`
    produces a deterministic stand-in (first FEATURE_DIM payload bytes,
    scaled) so the batch plumbing — Arrow transfer, schema, partition
    boundaries — is exercised for real.
    """
    import hashlib

    for pdf in batches:
        if not fake:
            raise NotImplementedError(
                "image decode requires PIL/torchvision — not available in this container"
            )
        payloads = pdf["payload"]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "content_hash": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "payload_len": payloads.map(len).astype("int32"),
                "features": payloads.map(
                    lambda b: [float(x) / 255.0 for x in bytes(b)[:FEATURE_DIM]]
                ),
                "decode_status": "fake-decoded",
            }
        )
        yield out


def with_multimodal_columns(df: DataFrame) -> DataFrame:
    """documents → (payload binary, meta struct, salted partition key)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("modality"),
            F.length(payload).alias("n_bytes"),
            F.md5("text").alias("content_md5"),
        ).alias("meta"),
        # R8 salted write prefix: hash-derived, uniform across the keyspace.
        F.substring(F.md5("text"), 1, 2).alias("part_key"),
    )


@query(
    "llm_multimodal_cols",
    oracle="""
    SELECT doc_id,
           md5(text) AS content_hash,
           CAST(strlen(text) AS INT) AS payload_len,
           'text/plain' AS modality,
           substring(md5(text), 1, 2) AS part_key
    FROM documents
    """,
)
def llm_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata struct + content-hash partition key.

    The oracle checks the binary round-trip: md5 over the binary payload
    must equal md5 over the source text, and the byte length must equal the
    octet length — proving the binary column is lossless.
    """
    d = load(spark, sf_dir, "documents")
    mm = with_multimodal_columns(d)
    return mm.select(
        "doc_id",
        F.md5("payload").alias("content_hash"),
        F.col("meta.n_bytes").cast("int").alias("payload_len"),
        F.col("meta.modality").alias("modality"),
        "part_key",
    )


@query("llm_multimodal_decode", oracle=None)
def llm_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode pipeline with the deterministic fake decoder
    (rows-only: array outputs + stub features have no SQL twin). Proves the
    Arrow batch path end-to-end: binary in, typed feature vectors out."""
    d = load(spark, sf_dir, "documents")
    mm = with_multimodal_columns(d).select("doc_id", "payload")
    return mm.mapInPandas(decode_image_batch, DECODED_SCHEMA)


FRAME_CHARS = 16
FRAME_STRIDE = 4


@query(
    "llm_multimodal_frames",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, text, length(text) // {FRAME_CHARS} AS n_frames
        FROM documents
    ),
    idx AS (
        SELECT doc_id, text, n_frames,
               unnest(range(0, n_frames, {FRAME_STRIDE})) AS frame_idx
        FROM f
    )
    SELECT doc_id, frame_idx,
           md5(substring(text, frame_idx * {FRAME_CHARS} + 1, {FRAME_CHARS}))
               AS frame_md5,
           n_frames
    FROM idx
    """,
)
def llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: the video path's 'every k-th frame' selection as a
    mapInPandas iterator — each document's payload is treated as a sequence
    of fixed-size frames and every FRAME_STRIDE-th one is emitted with its
    content hash (one output row per sampled frame, fan-out inside the
    Python worker, no JVM explode).

    Frames are CHARACTER slices (not bytes) so the deterministic twin is
    expressible in SQL for the oracle: Python slicing, DuckDB substring and
    md5-of-UTF8 all agree on character boundaries. A real video pipeline
    swaps the slicer for ffmpeg keyframe extraction; batch shape, schema
    and fan-out semantics are what this proves.
    """
    import hashlib

    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_md5": [], "n_frames": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n_frames = len(text) // FRAME_CHARS
                for i in range(0, n_frames, FRAME_STRIDE):
                    frame = text[i * FRAME_CHARS : (i + 1) * FRAME_CHARS]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_md5"].append(
                        hashlib.md5(frame.encode("utf-8")).hexdigest()
                    )
                    rows["n_frames"].append(n_frames)
            yield pd.DataFrame(rows)

    return d.mapInPandas(
        sample_frames, "doc_id long, frame_idx long, frame_md5 string, n_frames long"
    )


@query("llm_multimodal_resize", oracle=None)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (rows-only): binary payload → fixed-size payload
    (deterministic stand-in: truncate / zero-pad to 64 bytes, real
    pipelines put PIL.Image.resize here — absent in this container, same
    stub policy as decode_image_batch). Emits the resized payload with
    before/after sizes so the test can assert the contract: every output
    payload is exactly the target size and row count is preserved."""
    d = load(spark, sf_dir, "documents")
    mm = with_multimodal_columns(d).select("doc_id", "payload")
    target = 64

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            orig = pdf["payload"].map(len).astype("int64")
            resized = pdf["payload"].map(
                lambda b: bytes(b)[:target].ljust(target, b"\x00")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": orig,
                    "resized": resized,
                    "resized_bytes": resized.map(len).astype("int64"),
                }
            )

    return mm.mapInPandas(
        resize, "doc_id long, orig_bytes long, resized binary, resized_bytes long"
    )
