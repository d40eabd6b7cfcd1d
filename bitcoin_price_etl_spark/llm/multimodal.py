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
