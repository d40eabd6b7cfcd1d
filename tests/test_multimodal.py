"""Real-format decode tests: the pure-Python PPM/BMP parsers against
hand-built byte fixtures, and the mapInPandas pipeline end-to-end."""

from __future__ import annotations

import hashlib

import pytest

from bitcoin_price_etl_spark.llm.multimodal import (
    IMG_H,
    IMG_W,
    _bmp24_header,
    decode_bmp24,
    decode_image,
    decode_ppm,
)
from bitcoin_price_etl_spark.registry import load_all
from tests.conftest import SF_SMOKE


def test_ppm_roundtrip_with_comments():
    pixels = bytes(range(2 * 2 * 3))
    data = b"P6\n# a comment\n2 2\n# another\n255\n" + pixels
    w, h, rgb = decode_ppm(data)
    assert (w, h, rgb) == (2, 2, pixels)


@pytest.mark.parametrize(
    "data",
    [
        b"P5\n2 2\n255\n" + b"\x00" * 12,  # wrong magic (PGM)
        b"P6\n2 2\n255\n" + b"\x00" * 11,  # truncated raster
        b"P6\n2 2\n70000\n" + b"\x00" * 12,  # 2-byte maxval unsupported
        b"P6\nx 2\n255\n" + b"\x00" * 12,  # non-numeric width
    ],
)
def test_ppm_rejects_malformed(data):
    with pytest.raises(ValueError):
        decode_ppm(data)


def test_bmp24_roundtrip_with_padding():
    # 2x2: row bytes 6, stride 8 -> 2 pad bytes/row; stored bottom-up, BGR
    top = [(1, 2, 3), (4, 5, 6)]
    bottom = [(7, 8, 9), (10, 11, 12)]
    rows_bottom_up = [bottom, top]
    raster = b"".join(
        b"".join(bytes([b, g, r]) for (r, g, b) in row) + b"\x00\x00"
        for row in rows_bottom_up
    )
    data = _bmp24_header(2, 2) + raster
    w, h, rgb = decode_bmp24(data)
    assert (w, h) == (2, 2)
    assert rgb == bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])


def test_bmp24_rejects_unsupported():
    bad_bpp = bytearray(_bmp24_header(2, 2) + b"\x00" * 16)
    bad_bpp[28] = 32
    with pytest.raises(ValueError):
        decode_bmp24(bytes(bad_bpp))


def test_decode_image_quarantines_unknown():
    w, h, feats, status = decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    assert status == "error:unknown-format" and (w, h, feats) == (0, 0, [])


def test_resize_nearest_exact():
    from bitcoin_price_etl_spark.llm.multimodal import resize_nearest

    # 4x4 image whose pixel (r,c) is (16r+c, 0, 0): nearest 2x2 picks
    # source rows/cols 0 and 2
    rgb = bytes(b for r in range(4) for c in range(4) for b in (16 * r + c, 0, 0))
    out = resize_nearest(rgb, 4, 4, 2, 2)
    assert out == bytes(
        b for (r, c) in ((0, 0), (0, 2), (2, 0), (2, 2)) for b in (16 * r + c, 0, 0)
    )


def test_multimodal_resize_round_trips(spark):
    """Every resized payload is a REAL PPM that decodes to exactly
    RESIZE_W x RESIZE_H, with pixels present in the source image."""
    from bitcoin_price_etl_spark.llm.multimodal import RESIZE_H, RESIZE_W

    from bitcoin_price_etl_spark.llm.multimodal import multimodal_resize_raw
    rows = multimodal_resize_raw(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == docs
    for r in rows[:50]:
        assert r.status == "resized"
        assert (r.orig_w, r.orig_h) == (IMG_W, IMG_H)
        w, h, rgb = decode_ppm(bytes(r.resized))
        assert (w, h) == (RESIZE_W, RESIZE_H)
        assert len(rgb) == RESIZE_W * RESIZE_H * 3


def test_multimodal_decode_end_to_end(spark):
    """Every document decodes through a REAL format parser: even doc_ids as
    PPM, odd as BMP; dims match, channel means match a from-scratch
    recomputation off md5(text)."""
    from bitcoin_price_etl_spark.llm.multimodal import multimodal_decode_raw
    d = multimodal_decode_raw(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(d) == docs
    assert {r.decode_status for r in d} == {"ppm-decoded", "bmp-decoded"}
    for r in d:
        assert (r.width, r.height) == (IMG_W, IMG_H)
        assert r.decode_status == (
            "ppm-decoded" if r.doc_id % 2 == 0 else "bmp-decoded"
        )

    # from-scratch feature check for one row of each format
    texts = {
        row.doc_id: row.text
        for row in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .limit(4)
        .collect()
    }
    checked = 0
    for r in d:
        if r.doc_id not in texts:
            continue
        t = texts[r.doc_id]
        px = b"".join(
            hashlib.md5((t + s).encode()).digest() for s in ("", "a", "b")
        )
        if r.doc_id % 2 == 0:  # PPM: pixel bytes are RGB in md5 order
            rgb = px
        else:  # BMP: bytes were written as bottom-up BGR rows
            stride = IMG_W * 3
            rows = [px[i * stride : (i + 1) * stride] for i in range(IMG_H)]
            rgb = b"".join(
                bytes(ch for trip in zip(row[2::3], row[1::3], row[0::3]) for ch in trip)
                for row in reversed(rows)
            )
        n = IMG_W * IMG_H
        for c in range(3):
            assert r.features[2 + c] == pytest.approx(sum(rgb[c::3]) / n / 255.0)
        checked += 1
    assert checked == 4


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(1, 8),
        h=st.integers(1, 8),
        data=st.data(),
    )
    def test_ppm_encode_decode_roundtrip_random(w, h, data):
        from bitcoin_price_etl_spark.llm.multimodal import encode_ppm

        rgb = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
                )
            )
        )
        assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(1, 8),
        h=st.integers(1, 8),
        data=st.data(),
    )
    def test_bmp_roundtrip_random(w, h, data):
        """Any (w, h) incl. padded strides: rebuild the bottom-up BGR raster
        and assert the decoder restores the exact top-down RGB bytes."""
        rgb = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
                )
            )
        )
        stride = (w * 3 + 3) & ~3
        pad = stride - w * 3
        rows = [rgb[r * w * 3 : (r + 1) * w * 3] for r in range(h)]
        raster = b"".join(
            bytes(ch for trip in zip(row[2::3], row[1::3], row[0::3]) for ch in trip)
            + b"\x00" * pad
            for row in reversed(rows)
        )
        assert decode_bmp24(_bmp24_header(w, h) + raster) == (w, h, rgb)

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(1, 8),
        h=st.integers(1, 8),
        ow=st.integers(1, 4),
        oh=st.integers(1, 4),
        data=st.data(),
    )
    def test_resize_nearest_pixels_come_from_source(w, h, ow, oh, data):
        from bitcoin_price_etl_spark.llm.multimodal import resize_nearest

        rgb = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
                )
            )
        )
        out = resize_nearest(rgb, w, h, ow, oh)
        assert len(out) == ow * oh * 3
        src_pixels = {rgb[i * 3 : (i + 1) * 3] for i in range(w * h)}
        for i in range(ow * oh):
            assert out[i * 3 : (i + 1) * 3] in src_pixels


# ---------------------------------------------------------------------------
# WAV audio


def test_wav_roundtrip():
    from bitcoin_price_etl_spark.llm.multimodal import _wav_header, decode_wav

    import struct as _struct

    samples = [0, 1, -1, 32767, -32768, 1234, -4321, 100]
    raw = _struct.pack(f"<{len(samples)}h", *samples)
    data = _wav_header(12000, len(raw)) + raw
    rate, out = decode_wav(data)
    assert rate == 12000
    assert out == samples


def test_wav_skips_unknown_chunks_and_padding():
    """RIFF walkers must skip foreign chunks (LIST/INFO metadata is common)
    including the odd-size word-alignment pad byte."""
    from bitcoin_price_etl_spark.llm.multimodal import decode_wav

    import struct as _struct

    samples = [5, -6, 7]
    raw = _struct.pack("<3h", *samples)
    fmt = _struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
    junk = _struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # odd size + pad
    datac = _struct.pack("<4sI", b"data", len(raw)) + raw
    body = b"WAVE" + junk + fmt + datac
    data = _struct.pack("<4sI", b"RIFF", len(body)) + body
    rate, out = decode_wav(data)
    assert rate == 8000
    assert out == samples


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: b"RIFX" + d[4:],                     # bad magic
        lambda d: d[:40],                              # truncated
        lambda d: d[:20] + b"\x02" + d[21:],           # stereo
        lambda d: d[:4] + b"\xff\x00\x00\x00" + d[8:], # riff size lies
    ],
)
def test_wav_rejects_malformed(mutate):
    from bitcoin_price_etl_spark.llm.multimodal import _wav_header, decode_wav

    good = _wav_header(8000, 4) + b"\x01\x00\x02\x00"
    with pytest.raises(ValueError):
        decode_wav(mutate(good))


def test_multimodal_audio_quarantines_corrupt(spark):
    """A corrupt payload in the frame becomes a quarantine row, not a task
    failure — and good rows around it still decode."""
    import pandas as pd

    from bitcoin_price_etl_spark.llm.multimodal import (
        AUDIO_STATS_SCHEMA,
        _wav_header,
        audio_stats_batch,
    )

    good = _wav_header(16000, 4) + b"\x01\x00\xff\xff"
    bad = b"RIFFgarbage-not-a-wav"
    src = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [good, bad]})
    )
    rows = {
        r["doc_id"]: r
        for r in src.mapInPandas(audio_stats_batch, AUDIO_STATS_SCHEMA).collect()
    }
    assert rows[1]["decode_status"] == "wav-decoded"
    assert rows[1]["sample_rate"] == 16000
    assert rows[1]["peak_abs"] == 1 and rows[1]["sum_abs"] == 2
    assert rows[2]["decode_status"].startswith("error:")
    assert rows[2]["n_samples"] == 0


def test_phash_exact_dupes_collide_at_zero(spark):
    """Identical texts produce identical content-addressed images, so
    every exact-dup text pair must surface with hamming 0; and every
    reported pair's hamming must match a driver-side aHash replay."""
    from collections import defaultdict

    from bitcoin_price_etl_spark.llm.multimodal import (
        PHASH_BANDS,
        PHASH_BITS,
        PHASH_HAM_MAX,
        decode_bmp24,
        decode_ppm,
        llm_multimodal_phash,
        with_phash_payloads,
    )
    from bitcoin_price_etl_spark.catalog import load
    from tests.conftest import SF_SMOKE

    got = {(r.doc_a, r.doc_b): (r.hamming, r.n_band_collisions)
           for r in llm_multimodal_phash(spark, SF_SMOKE).collect()}
    assert got, "phash must surface pairs at smoke scale"
    # replay: decode every payload, compute aHash
    payloads = with_phash_payloads(
        load(spark, SF_SMOKE, "documents")
    ).collect()
    hashes = {}
    for r in payloads:
        b = bytes(r.payload)
        dec = decode_ppm if b[:2] == b"P6" else decode_bmp24
        _, _, rgb = dec(b)
        mean = sum(rgb) / len(rgb)
        bits = 0
        for i, px in enumerate(rgb[:PHASH_BITS]):
            if px > mean:
                bits |= 1 << i
        hashes[r.doc_id] = bits
    for (da, db), (ham, nb) in got.items():
        true_ham = bin(hashes[da] ^ hashes[db]).count("1")
        assert ham == true_ham <= PHASH_HAM_MAX
        assert 1 <= nb <= PHASH_BANDS
    # identical-hash doc pairs MUST all be present (bands are identical,
    # so LSH recall at distance 0 is exactly 1)
    by_hash = defaultdict(list)
    for d, h in hashes.items():
        by_hash[h].append(d)
    for ids in by_hash.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert got[(ids[i], ids[j])][0] == 0


def test_phash_oracle_is_byte_exact_on_multibyte_text(spark, tmp_path):
    """Regression pin for the r10 hostile-text-at-sf0.1 catch: the phash
    oracle must reconstruct the decoder's UTF-8 BYTES, not Unicode code
    points — the two coincide on ASCII and split on CJK/emoji, so this
    corpus is built to be near-duplicate-dense IN THE MULTIBYTE range
    (shared CJK prefixes differing in one trailing char), where a
    codepoint-reading oracle produces a different pair set. Full
    differential at fixture scale so the class can never regress back to
    needing the sf0.1 probe to notice."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.oracle import compare_to_oracle

    base = [
        "中文字符串一样的前缀内容在这里延续到四十八字符之后 ",
        "emoji 🎉🎊🧪🔬 heavy prefix with astral chars 𝔘𝔫𝔦 ",
        "mixed ASCII then 中文 then more ASCII tail here ",
    ]
    rows = []
    for i in range(24):
        t = base[i % 3] + ("variant" + str(i // 3))
        rows.append((i, t, "xx", "synthetic", len(t)))
    tab = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    for f in os.listdir(SF_SMOKE):
        os.symlink(os.path.join(SF_SMOKE, f), str(tmp_path / f))
    os.unlink(str(tmp_path / "documents.parquet"))
    pq.write_table(tab, str(tmp_path / "documents.parquet"))

    compare_to_oracle(spark, "llm_multimodal_phash", str(tmp_path))
    # and the pair set must be non-trivial — shared multibyte prefixes
    # MUST collide (an accidentally-empty result would make the
    # differential vacuous)
    out = load_all()["llm_multimodal_phash"].fn(spark, str(tmp_path)).collect()
    assert len(out) >= 3, out
