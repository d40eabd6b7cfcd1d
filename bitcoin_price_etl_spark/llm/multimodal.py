"""Multimodal columns (north star, BASELINE.json): image/audio/video as
opaque binary payloads with typed metadata, processed by Arrow-batched
Pandas functions over mapInPandas.

The decode step is REAL for two formats with pure-Python decoders — binary
PPM (P6) and uncompressed 24-bit BMP — so `llm_multimodal_decode` parses
actual image bytes end-to-end with no injected stand-in. Formats that need
external libraries (JPEG/PNG/audio/video: PIL/ffmpeg are absent in this
container) surface as quarantine rows (`decode_status = 'error:...'`), the
same contract a production decoder would use for corrupt payloads.

Scale notes: payloads never shuffle — metadata extraction and decode are
narrow maps; the salted partition key spreads writes across the keyspace
exactly like the reference's GCS anti-hotspot prefix
(dags/bpi_etl/bpi_etl_bigquery.py:8-23).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.session import stage
from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.registry import query

DECODED_SCHEMA = (
    "doc_id long, content_hash string, payload_len int, width int, height int, "
    "features array<double>, decode_status string"
)


def decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    """Strict binary-PPM (P6) parser → (width, height, row-major RGB bytes).

    Implements the Netpbm spec: 'P6', then whitespace-separated width,
    height, maxval (each optionally preceded by '#' comment lines), one
    single whitespace byte, then width*height*3 raw sample bytes
    (maxval ≤ 255 → 1 byte per sample). Raises ValueError on anything
    malformed — truncated header, bad magic, short pixel data."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and data[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("malformed PPM header")
        fields.append(int(data[start:pos]))
    if pos >= len(data) or not data[pos : pos + 1].isspace():
        raise ValueError("missing header terminator")
    pos += 1  # exactly one whitespace byte before raster
    width, height, maxval = fields
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported maxval {maxval}")
    n = width * height * 3
    pixels = data[pos : pos + n]
    if len(pixels) != n:
        raise ValueError("truncated pixel data")
    return width, height, pixels


def decode_bmp24(data: bytes) -> tuple[int, int, bytes]:
    """Uncompressed 24-bit BMP parser → (width, height, row-major RGB bytes).

    Implements the BITMAPFILEHEADER + BITMAPINFOHEADER layout: 'BM' magic,
    pixel-array offset at byte 10; width/height/bpp/compression at 18/22/
    28/30; rows stored bottom-up, each padded to a 4-byte boundary, samples
    in BGR order. Emits top-down RGB. Raises ValueError on non-BI_RGB
    compression, bpp ≠ 24, or short data."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    if len(data) < pix_off + stride * height:
        raise ValueError("truncated pixel data")
    rows = []
    for r in range(height):
        src = r if top_down else height - 1 - r
        row = data[pix_off + src * stride : pix_off + src * stride + row_bytes]
        rgb = bytearray(row_bytes)
        rgb[0::3], rgb[1::3], rgb[2::3] = row[2::3], row[1::3], row[0::3]
        rows.append(bytes(rgb))
    return width, height, b"".join(rows)


_DECODERS = {b"P6": ("ppm", decode_ppm), b"BM": ("bmp", decode_bmp24)}


def decode_image(data: bytes) -> tuple[int, int, list[float], str]:
    """Dispatch on magic bytes → (width, height, features, status).

    Features: [width, height, mean_r, mean_g, mean_b] — the cheap global
    stats a curation pipeline filters on before any model sees the image.
    Unknown/malformed payloads become quarantine rows, not task failures:
    at 100 TB a single corrupt blob must never kill the job."""
    fmt_fn = _DECODERS.get(bytes(data[:2]))
    if fmt_fn is None:
        return 0, 0, [], "error:unknown-format"
    fmt, fn = fmt_fn
    try:
        width, height, rgb = fn(bytes(data))
    except ValueError as e:
        return 0, 0, [], f"error:{fmt}:{e}"
    n = width * height
    means = [
        sum(rgb[c::3]) / n / 255.0 if n else 0.0
        for c in range(3)
    ]
    return width, height, [float(width), float(height), *means], f"{fmt}-decoded"


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: binary payload → parsed dims + feature vector.

    Pure-Python decode per payload inside an Arrow batch — the structure a
    real PIL/ffmpeg decoder drops into unchanged (swap `decode_image`)."""
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        decoded = payloads.map(lambda b: decode_image(bytes(b)))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "content_hash": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
                "payload_len": payloads.map(len).astype("int32"),
                "width": decoded.map(lambda d: d[0]).astype("int32"),
                "height": decoded.map(lambda d: d[1]).astype("int32"),
                "features": decoded.map(lambda d: d[2]),
                "decode_status": decoded.map(lambda d: d[3]),
            }
        )


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


IMG_W = IMG_H = 4


def _bmp24_header(width: int, height: int) -> bytes:
    """Constant BITMAPFILEHEADER+BITMAPINFOHEADER for an unpadded 24-bit
    image (width*3 divisible by 4 here, so stride == row bytes)."""
    stride = (width * 3 + 3) & ~3
    img_size = stride * height
    file_header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return file_header + info_header


def with_image_payloads(df: DataFrame) -> DataFrame:
    """documents → real image binaries, built with JVM expressions only.

    Each document becomes a 4×4 image whose 48 pixel bytes derive from
    md5(text) (deterministic, content-addressed); even doc_ids serialize as
    binary PPM (P6), odd as uncompressed 24-bit BMP. The payloads are REAL
    files — `xxd` or any image viewer parses them — which is what makes the
    decode step downstream a genuine format parser rather than plumbing."""
    pixels = F.unhex(
        F.concat(
            F.md5("text"),
            F.md5(F.concat(F.col("text"), F.lit("a"))),
            F.md5(F.concat(F.col("text"), F.lit("b"))),
        )
    )
    ppm = F.concat(F.lit(f"P6\n{IMG_W} {IMG_H}\n255\n".encode()), pixels)
    bmp = F.concat(F.lit(_bmp24_header(IMG_W, IMG_H)), pixels)
    # NULL text = failed fetch = no image payload to synthesize (md5(NULL)
    # nulls the whole concat) — such documents contribute no row, the
    # scan_binaryfile convention.
    return df.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, ppm).otherwise(bmp).alias("payload"),
    )


def multimodal_decode_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal full-fidelity decode frame (features as array<double>) —
    consumed by tests and downstream feature engineering."""
    d = load(spark, sf_dir, "documents")
    mm = with_image_payloads(d)
    return mm.mapInPandas(decode_image_batch, DECODED_SCHEMA)


@query("llm_multimodal_decode", oracle=None)
def llm_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode pipeline over REAL image bytes: documents become
    4×4 PPM/BMP binaries (JVM-side synthesis) and the Python worker parses
    them with strict pure-Python format decoders — no injected fake
    (rows-only: array features have no SQL twin; dims/status invariants are
    asserted in tests/test_multimodal.py against the raw frame).

    The REGISTRY boundary summarizes the feature vector (count + md5 of
    its canonical string form) instead of emitting a raw array — the
    no-arrays discipline (r2: the driver canonicalizer cannot hash list
    cells); multimodal_decode_raw keeps the full array for callers."""
    raw = multimodal_decode_raw(spark, sf_dir)
    return raw.select(
        "doc_id",
        "content_hash",
        "payload_len",
        "width",
        "height",
        "decode_status",
        F.expr("CAST(size(features) AS BIGINT)").alias("n_features"),
        F.expr(
            "md5(CAST(concat_ws(',',"
            " transform(features, x -> CAST(x AS STRING))) AS BINARY))"
        ).alias("features_md5"),
    )


FRAME_CHARS = 16
FRAME_STRIDE = 4


@query(
    "llm_multimodal_frames",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, text, length(text) // {FRAME_CHARS} AS n_frames
        FROM documents
        WHERE text IS NOT NULL
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

    # NULL text = failed fetch = no frames. Filtered JVM-side so the
    # Python worker never sees a None (the oracle's WHERE mirrors it;
    # unnest(range(0, NULL)) would drop those rows there regardless).
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )

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


RESIZE_W = RESIZE_H = 2


def resize_nearest(rgb: bytes, w: int, h: int, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of row-major RGB bytes — the real
    algorithm (what PIL's Image.NEAREST does), pure Python: output pixel
    (i, j) copies source pixel (floor(i*h/out_h), floor(j*w/out_w))."""
    out = bytearray(out_w * out_h * 3)
    for i in range(out_h):
        si = i * h // out_h
        for j in range(out_w):
            sj = j * w // out_w
            src = (si * w + sj) * 3
            dst = (i * out_w + j) * 3
            out[dst : dst + 3] = rgb[src : src + 3]
    return bytes(out)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Serialize row-major RGB back to binary PPM (P6, maxval 255)."""
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def multimodal_resize_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal full-fidelity resize frame (re-encoded PPM binaries) —
    consumed by tests and downstream export."""
    d = load(spark, sf_dir, "documents")
    mm = with_image_payloads(d)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [],
                "orig_w": [],
                "orig_h": [],
                "resized": [],
                "resized_bytes": [],
                "status": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                fmt_fn = _DECODERS.get(data[:2])
                try:
                    if fmt_fn is None:
                        raise ValueError("unknown-format")
                    w, h, rgb = fmt_fn[1](data)
                    small = resize_nearest(rgb, w, h, RESIZE_W, RESIZE_H)
                    out, status = encode_ppm(RESIZE_W, RESIZE_H, small), "resized"
                except ValueError as e:
                    w = h = 0
                    out, status = b"", f"error:{e}"
                rows["doc_id"].append(doc_id)
                rows["orig_w"].append(w)
                rows["orig_h"].append(h)
                rows["resized"].append(out)
                rows["resized_bytes"].append(len(out))
                rows["status"].append(status)
            yield pd.DataFrame(rows)

    return mm.mapInPandas(
        resize,
        "doc_id long, orig_w int, orig_h int, resized binary, "
        "resized_bytes long, status string",
    )


@query("llm_multimodal_resize", oracle=None)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize over mapInPandas: decode the PPM/BMP payload with
    the format parsers, nearest-neighbor resample to RESIZE_W×RESIZE_H,
    re-encode as PPM (rows-only: binary outputs have no SQL twin; the
    round-trip contract — every output payload decodes to exactly the
    target dims with pixels drawn from the source — is asserted in
    tests/test_multimodal.py against the raw frame). Undecodable payloads
    pass through as quarantine rows, never task failures.

    The REGISTRY boundary replaces the raw re-encoded binary with its md5
    and length (the scan_binaryfile hash-at-the-edge discipline);
    multimodal_resize_raw keeps the payload for callers."""
    raw = multimodal_resize_raw(spark, sf_dir)
    return raw.select(
        "doc_id",
        "orig_w",
        "orig_h",
        "resized_bytes",
        "status",
        F.expr("md5(resized)").alias("resized_md5"),
    )


# ---------------------------------------------------------------------------
# audio: real RIFF/WAV PCM16 payloads + strict pure-Python parser

WAV_N_SAMPLES = 16  # 32 payload bytes = two md5 digests
WAV_RATES = (8000, 12000, 16000)


def _wav_header(sample_rate: int, n_data_bytes: int) -> bytes:
    """Canonical 44-byte RIFF/WAVE header for PCM16 mono: 'RIFF' + riff
    size + 'WAVE', a 16-byte 'fmt ' chunk (audio_format=1 PCM, 1 channel,
    byte_rate = rate*2, block_align=2, bits=16), then the 'data' chunk
    header."""
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + n_data_bytes, b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
        )
        + struct.pack("<4sI", b"data", n_data_bytes)
    )


def decode_wav(data: bytes) -> tuple[int, list[int]]:
    """Strict RIFF/WAV parser → (sample_rate, signed int16 samples).

    Walks the RIFF chunk list (any chunk order, unknown chunks skipped with
    correct word-aligned padding), requires a PCM (format 1) mono 16-bit
    'fmt ' chunk before 'data', and unpacks the data chunk as little-endian
    int16. Raises ValueError on bad magic, truncated chunks, or an
    unsupported encoding — the quarantine contract of decode_image."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 != len(data):
        raise ValueError("RIFF size mismatch")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, rate, _byte_rate, _block, bits = fmt
    if (audio_format, channels, bits) != (1, 1, 16):
        raise ValueError(
            f"unsupported encoding (fmt={audio_format}, ch={channels}, bits={bits})"
        )
    if len(raw) % 2:
        raise ValueError("odd data length for 16-bit samples")
    return rate, list(struct.unpack(f"<{len(raw) // 2}h", raw))


def with_audio_payloads(df: DataFrame) -> DataFrame:
    """documents → real WAV binaries, built with JVM expressions only.

    Each document becomes a PCM16 mono clip of WAV_N_SAMPLES samples whose
    32 sample bytes derive from md5 chains of the text (content-addressed,
    deterministic); the sample rate cycles through WAV_RATES by doc_id so
    the downstream parser must actually read the fmt chunk. The payloads
    are REAL files — `file`/aplay parse them."""
    n_bytes = WAV_N_SAMPLES * 2
    samples = F.unhex(F.concat(F.md5("text"), F.md5(F.concat(F.col("text"), F.lit("a")))))
    hdr = F.col("doc_id") % len(WAV_RATES)
    payload = F.concat(
        F.when(hdr == 0, F.lit(_wav_header(WAV_RATES[0], n_bytes)))
        .when(hdr == 1, F.lit(_wav_header(WAV_RATES[1], n_bytes)))
        .otherwise(F.lit(_wav_header(WAV_RATES[2], n_bytes))),
        samples,
    )
    # NULL text = failed fetch = no clip (md5(NULL) nulls the sample
    # bytes); mirrored by the oracle's WHERE text IS NOT NULL.
    return df.filter(F.col("text").isNotNull()).select(
        "doc_id", payload.alias("payload")
    )


@query(
    "llm_multimodal_audio",
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               md5(text) || md5(text || 'a') AS hex64,
               CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate
        FROM documents
        WHERE text IS NOT NULL
    ),
    s AS (
        SELECT doc_id, sample_rate, i,
               (strpos('0123456789abcdef', substring(hex64, i*4+1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substring(hex64, i*4+2, 1)) - 1) AS lo,
               (strpos('0123456789abcdef', substring(hex64, i*4+3, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substring(hex64, i*4+4, 1)) - 1) AS hi
        FROM h, unnest(range({WAV_N_SAMPLES})) AS t(i)
    ),
    v AS (
        SELECT doc_id, sample_rate,
               CASE WHEN lo + 256 * hi >= 32768
                    THEN lo + 256 * hi - 65536
                    ELSE lo + 256 * hi END AS sample
        FROM s
    )
    SELECT doc_id, sample_rate,
           CAST(COUNT(*) AS INT) AS n_samples,
           CAST(COUNT(*) AS DOUBLE) * 1000.0 / sample_rate AS duration_ms,
           CAST(MAX(ABS(sample)) AS INT) AS peak_abs,
           CAST(SUM(ABS(sample)) AS BIGINT) AS sum_abs,
           'wav-decoded' AS decode_status
    FROM v
    GROUP BY doc_id, sample_rate
    """,
)
def llm_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality pipeline over REAL WAV bytes: JVM-side synthesis of
    PCM16 mono RIFF files (varying sample rates so the header must be
    parsed, not assumed), strict pure-Python RIFF walker in mapInPandas,
    integer sample statistics out. Completes the image (decode/resize) /
    video (frames) / audio modality triple.

    The oracle is a genuine differential: DuckDB reconstructs the int16
    little-endian samples ARITHMETICALLY from the md5 hex (nibble lookup →
    lo + 256·hi, two's complement), never seeing a WAV byte — so a parser
    bug (wrong chunk offset, endianness, sign handling) hash-mismatches.
    All checked stats are integers except duration_ms, which divides the
    same two exact integers in both engines (identical double division).

    Scale shape: payload synthesis and decode are narrow maps — audio
    bytes never shuffle; the final stats frame is one row per clip. A real
    corpus swaps the synthesized column for a binary payload read and this
    plan is unchanged; corrupt files become quarantine rows (decode_status
    'error:...'), never task failures.
    """
    d = load(spark, sf_dir, "documents")
    mm = with_audio_payloads(d)
    return mm.mapInPandas(audio_stats_batch, AUDIO_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, duration_ms double, "
    "peak_abs int, sum_abs long, decode_status string"
)


def audio_stats_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: WAV payload → parsed rate + integer sample stats;
    malformed payloads become quarantine rows."""
    for pdf in batches:
        rows = {k.split()[0]: [] for k in AUDIO_STATS_SCHEMA.split(", ")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            try:
                rate, samples = decode_wav(bytes(payload))
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(samples))
                rows["duration_ms"].append(len(samples) * 1000.0 / rate)
                rows["peak_abs"].append(max((abs(s) for s in samples), default=0))
                rows["sum_abs"].append(sum(abs(s) for s in samples))
                rows["decode_status"].append("wav-decoded")
            except ValueError as e:
                rows["sample_rate"].append(0)
                rows["n_samples"].append(0)
                rows["duration_ms"].append(0.0)
                rows["peak_abs"].append(0)
                rows["sum_abs"].append(0)
                rows["decode_status"].append(f"error:{e}")
            rows["doc_id"].append(doc_id)
        yield pd.DataFrame(rows)


# Perceptual-hash near-dup: 48-bit aHash (one bit per pixel byte vs the
# image's byte mean), 4 × 12-bit LSH bands, exact popcount verify.
PHASH_BITS = 48
PHASH_BANDS = 4
PHASH_BAND_BITS = PHASH_BITS // PHASH_BANDS
PHASH_HAM_MAX = 6
# Hot-bucket cap — the DF_CAP discipline applied to band buckets: a band
# value shared by more than this many images is a low-information band
# (stock header, common opening) and is dropped from candidate
# generation, bounding the self-join at Σ cap² per bucket. Without it,
# corpora with common openings make one bucket quadratic (measured: the
# 8× probe ran past 600 s before the cap; 3 s with it).
PHASH_BUCKET_CAP = 50


def phash_batch(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """mapInPandas body: image payload → 48-bit average-hash.

    Decodes with the same strict pure-Python parsers as
    llm_multimodal_decode, then sets bit i iff pixel byte i exceeds the
    image's mean byte value — the classic aHash, scale-free and cheap.
    Malformed payloads hash to NULL with a quarantine status (never a
    task failure)."""
    for pdf in batches:
        out = {"doc_id": pdf["doc_id"], "phash": [], "decode_status": []}
        for b in pdf["payload"]:
            w, h, _feats, status = decode_image(bytes(b))
            out["decode_status"].append(status)
            if w == 0:
                out["phash"].append(None)
                continue
            fmt_fn = _DECODERS[bytes(b[:2])]
            _, _, rgb = fmt_fn[1](bytes(b))
            mean = sum(rgb) / len(rgb)
            bits = 0
            for i, px in enumerate(rgb[:PHASH_BITS]):
                if px > mean:
                    bits |= 1 << i
            out["phash"].append(bits)
        yield pd.DataFrame(out)


PHASH_SCHEMA = "doc_id long, phash long, decode_status string"


def with_phash_payloads(df: DataFrame) -> DataFrame:
    """documents → content-derived thumbnail images (JVM expressions).

    Pixel bytes are the document's first 48 text bytes (space-padded) —
    a locality-preserving stand-in for a real thumbnail: near-identical
    documents render near-identical pixels, which is exactly the property
    a perceptual hash exploits (with_image_payloads' md5 pixels are
    content-ADDRESSED — avalanche — right for the decode/dedup-exact
    path, useless for NEAR-dup). Same real PPM/BMP containers."""
    pixels = F.encode(
        F.rpad(F.substring("text", 1, IMG_W * IMG_H * 3), IMG_W * IMG_H * 3, " "),
        "UTF-8",
    )
    ppm = F.concat(F.lit(f"P6\n{IMG_W} {IMG_H}\n255\n".encode()), pixels)
    bmp = F.concat(F.lit(_bmp24_header(IMG_W, IMG_H)), pixels)
    # NULL text = failed fetch = no thumbnail; mirrored by the oracle's
    # WHERE text IS NOT NULL (a NULL band value could never equi-join
    # anyway, but the filter keeps the two plans stated identically).
    return df.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, ppm).otherwise(bmp).alias("payload"),
    )


def _phash_oracle() -> str:
    """BYTE-exact DuckDB twin of llm_multimodal_phash (r10 hostile-text
    finding at sf0.1): the decoder consumes the UTF-8 BYTES of the padded
    text prefix, but the original oracle read ord(substring(s,i,1)) —
    Unicode CODE POINTS. The two coincide on ASCII and split on
    multibyte text (CJK/emoji strides): at sf0.1 the hostiletext corpus
    produced 5237 Spark pairs vs 6157 oracle pairs. The oracle now
    extracts true bytes via hex(encode(s)) — byte i is the hex pair at
    (2i-1, 2i), parsed with ascii() arithmetic — so pixels, phashes and
    pair sets are byte-identical by construction on ANY text. The BMP
    branch applies the bottom-up row un-flip + BGR->RGB swap as a byte
    permutation generated from the 4x4x3 geometry (identical to the
    decoder loop), not a hand-written list."""

    def by(p: int) -> str:
        hi, lo = 2 * p - 1, 2 * p
        def hv(pos: int) -> str:
            return (f"(CASE WHEN ascii(substr(hx, {pos}, 1)) >= 65"
                    f" THEN ascii(substr(hx, {pos}, 1)) - 55"
                    f" ELSE ascii(substr(hx, {pos}, 1)) - 48 END)")
        return f"({hv(hi)} * 16 + {hv(lo)})"

    ppm_positions = list(range(1, IMG_W * IMG_H * 3 + 1))
    bmp_positions = [
        (IMG_H - 1 - r) * IMG_W * 3 + c * 3 + (2 - ch) + 1
        for r in range(IMG_H)
        for c in range(IMG_W)
        for ch in range(3)
    ]
    ppm_list = ", ".join(by(p) for p in ppm_positions)
    bmp_list = ", ".join(by(p) for p in bmp_positions)
    return f"""
    WITH padded AS (
        SELECT doc_id,
               hex(encode(rpad(substring(text, 1, 48), 48, ' '))) AS hx
        FROM documents
        WHERE text IS NOT NULL
    ),
    px AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0
                    THEN [{ppm_list}]
                    ELSE [{bmp_list}]
               END AS p
        FROM padded
    ),
    hashed AS (
        SELECT doc_id,
               list_reduce(list_transform(range(1, 49),
                   i -> CASE WHEN p[i] > list_reduce(p, (a, b) -> a + b)
                                        / 48.0
                             THEN CAST(1 AS BIGINT) << (i - 1)
                             ELSE CAST(0 AS BIGINT) END),
                   (a, b) -> a + b) AS phash
        FROM px
    ),
    bands AS (
        SELECT doc_id, phash, b.band_id,
               (phash >> (b.band_id * 12)) & 4095 AS band_val
        FROM hashed, (SELECT unnest(range(4)) AS band_id) b
    ),
    capped AS (
        SELECT * FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY band_id, band_val)
                      AS bsz
            FROM bands
        ) WHERE bsz <= {PHASH_BUCKET_CAP}
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_band_collisions,
               MIN(a.phash) AS ha, MIN(b.phash) AS hb
        FROM capped a JOIN capped b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_band_collisions,
           CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM pairs WHERE bit_count(xor(ha, hb)) <= {PHASH_HAM_MAX}
    """


@query("llm_multimodal_phash", oracle=_phash_oracle())
def llm_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate detection for the image modality — the
    multimodal counterpart of llm_dedup_simhash: a 48-bit average-hash
    per image (Arrow-batched pandas decode, bit i = pixel byte i > image
    mean), banded-LSH candidate generation (4 × 12-bit bands — only
    images agreeing on an ENTIRE band ever meet), and an exact
    Hamming-distance verify via xor+bit_count, keeping pairs ≤
    {PHASH_HAM_MAX} bits apart.

    Scale shape: candidate generation is a band-bucket equi-join —
    identical plan to llm_sim_search_lsh (each image posts 4 (band_id,
    band_value) keys; the self-join meets only within buckets), with
    the dedup family's hot-bucket cap on top: buckets larger than
    PHASH_BUCKET_CAP are dropped (a band value half the corpus shares —
    a stock header — generates no information, only bucket² pairs), so
    candidates are bounded at Σ cap² per bucket like llm_dedup_ngram's
    DF cap, under-count-never-fabricate. The verify is a 64-bit xor per
    candidate pair.
    The Python stage is one Arrow-batched pass emitting 16 bytes per
    image; everything after is JVM-side. A real pHash/dHash (DCT over
    8×8 downsample) drops into phash_batch unchanged — the fixture's
    thumbnails are content-DERIVED (with_phash_payloads), so documents
    sharing their opening bytes render identical pixels and collide at
    distance 0, which the property test pins against a full replay.

    Parity: a FULL differential despite the Python decode stage — the
    oracle reconstructs the decoded pixel BYTES arithmetically from the
    text via hex(encode(s)) (true UTF-8 bytes; the original ord()-of-
    character form read CODE POINTS, which coincide on ASCII and split
    on multibyte text — caught by the r10 hostile-text probe at sf0.1,
    920 missing pairs), including the BMP path's bottom-up row un-flip
    and BGR→RGB swap as a generated byte permutation — so a decoder bug
    (wrong stride, missed flip, channel order) hash-mismatches, the
    llm_multimodal_audio differential stance. The float mean compare
    (int > sum/48.0) is the identical IEEE comparison in both engines;
    everything else is integer."""
    d = load(spark, sf_dir, "documents")
    mm = with_phash_payloads(d)
    hashed = (
        mm.mapInPandas(phash_batch, PHASH_SCHEMA)
        .filter(F.col("phash").isNotNull())
        .transform(stage)
    )
    bands = hashed.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright("phash", i * PHASH_BAND_BITS)
                        .bitwiseAND(F.lit((1 << PHASH_BAND_BITS) - 1))
                        .alias("band_val"),
                    )
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "phash", "band.band_id", "band.band_val")
    from pyspark.sql import Window

    wb = Window.partitionBy("band_id", "band_val")
    bands = bands.withColumn("bsz", F.count(F.lit(1)).over(wb)).filter(
        F.col("bsz") <= PHASH_BUCKET_CAP
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_band_collisions"),
            F.first(F.col("a.phash")).alias("ha"),
            F.first(F.col("b.phash")).alias("hb"),
        )
    )
    return cand.select(
        "doc_a",
        "doc_b",
        "n_band_collisions",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
    ).filter(F.col("hamming") <= PHASH_HAM_MAX)
