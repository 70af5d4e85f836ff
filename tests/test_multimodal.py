"""Multimodal plumbing tests: binary payload schema, the real PPM decode
path (mapInPandas), determinism, and decoded-pixel value parity against a
Python-side oracle."""

from __future__ import annotations

import pytest

from dbms_query_optimizer_spark.operators.multimodal import (
    FEATURE_BINS,
    decode_image,
    image_dims,
    make_ppm,
    multimodal_table,
    pixel_histogram,
    q_multimodal_features,
)


def test_schema_and_payload(spark, sf_dir):
    df = multimodal_table(spark, sf_dir)
    types = dict(df.dtypes)
    assert types["payload"] == "binary"
    assert types["meta"].startswith("struct<format:string,n_bytes:int")
    row = df.filter("doc_id = 0").collect()[0]
    assert isinstance(row["payload"], bytearray | bytes)
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_ppm_roundtrip():
    for doc_id in (0, 1, 7, 123):
        w, h, pixels = decode_image(make_ppm(doc_id))
        assert (w, h) == image_dims(doc_id)
        assert len(pixels) == w * h * 3


def test_decoder_handles_comments_and_whitespace():
    img = b"P6\n# a comment\n 4\t3 # trailing\n255\n" + bytes(range(36))
    w, h, pixels = decode_image(img)
    assert (w, h, pixels) == (4, 3, bytes(range(36)))


@pytest.mark.parametrize(
    "bad",
    [
        b"\x89PNG...",                              # wrong magic
        b"P6\n4 3\n65535\n" + bytes(72),            # 16-bit maxval
        b"P6\n4 3\n255\n" + bytes(10),              # truncated pixels
        b"P6\nx 3\n255\n" + bytes(36),              # malformed header
    ],
)
def test_decode_rejects_corrupt(bad):
    with pytest.raises(ValueError):
        decode_image(bad)


def test_features_match_python_decode_oracle(spark, sf_dir):
    rows = {
        r["doc_id"]: r
        for r in q_multimodal_features(spark, sf_dir).filter("doc_id < 5").collect()
    }
    assert len(rows) == 5
    for doc_id, r in rows.items():
        payload = make_ppm(doc_id)
        w, h, pixels = decode_image(payload)
        expect = pixel_histogram(pixels)
        assert (r["width"], r["height"], r["n_bytes"]) == (w, h, len(payload))
        assert [r[f"f{i}"] for i in range(FEATURE_BINS)] == expect


def test_features_deterministic_and_complete(spark, sf_dir):
    df = q_multimodal_features(spark, sf_dir)
    rows1 = {r["doc_id"]: tuple(r) for r in df.collect()}
    rows2 = {r["doc_id"]: tuple(r) for r in q_multimodal_features(spark, sf_dir).collect()}
    assert rows1 == rows2  # deterministic across runs
    n_docs = multimodal_table(spark, sf_dir).count()
    assert len(rows1) == n_docs
    # histogram bins sum to the decoded pixel count (w*h*3), not payload size
    for doc_id, row in list(rows1.items())[:10]:
        w, h = image_dims(doc_id)
        assert sum(row[4 : 4 + FEATURE_BINS]) == w * h * 3


def test_resize_matches_python_oracle(spark, sf_dir):
    """Thumbnails recomputed independently: decode + the same integer
    nearest-neighbor mapping must reproduce digest and channel sums; every
    document yields exactly one fixed-shape thumbnail."""
    import hashlib

    from dbms_query_optimizer_spark.operators.multimodal import (
        THUMB_H,
        THUMB_W,
        q_multimodal_resize,
        resize_nearest,
    )

    rows = {r["doc_id"]: r for r in q_multimodal_resize(spark, sf_dir).collect()}
    n_docs = multimodal_table(spark, sf_dir).count()
    assert len(rows) == n_docs

    for doc_id in list(rows)[:8]:
        r = rows[doc_id]
        w, h, pixels = decode_image(make_ppm(doc_id))
        t = resize_nearest(w, h, pixels, THUMB_W, THUMB_H)
        assert (r["src_w"], r["src_h"]) == (w, h)
        assert (r["out_w"], r["out_h"]) == (THUMB_W, THUMB_H)
        # digest contract: md5 over the LOWERCASE-HEX text of the
        # thumbnail bytes (DuckDB md5 takes VARCHAR only; hex is the
        # exact order-preserving byte view both engines agree on)
        assert (
            r["thumb_digest"]
            == hashlib.md5(t.tobytes().hex().encode()).hexdigest()
        )
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (
            int(t[:, :, 0].sum()),
            int(t[:, :, 1].sum()),
            int(t[:, :, 2].sum()),
        )


# ------------------------------------------------------------- audio plane


def test_wav_roundtrip_against_numpy():
    """decode_wav must agree with an INDEPENDENT numpy reconstruction of
    the PCM frames (struct-free path: frombuffer over the data chunk
    located by the canonical layout we generated)."""
    import numpy as np

    from dbms_query_optimizer_spark.operators.multimodal import (
        WAV_RATE,
        decode_wav,
        make_wav,
        wav_n_samples,
    )

    for doc_id in (0, 1, 7, 42):
        payload = make_wav(doc_id)
        rate, ch, xs = decode_wav(payload)
        assert (rate, ch) == (WAV_RATE, 1)
        assert len(xs) == wav_n_samples(doc_id)
        # independent parse: find the data chunk by scanning for the tag
        i = payload.rindex(b"data")
        n = int.from_bytes(payload[i + 4 : i + 8], "little")
        ref = np.frombuffer(payload[i + 8 : i + 8 + n], dtype="<i2")
        assert xs == ref.tolist()


def test_wav_decoder_walks_extra_chunks_and_rejects_corrupt():
    import pytest

    from dbms_query_optimizer_spark.operators.multimodal import decode_wav, make_wav

    payload = make_wav(3)
    assert b"LIST" in payload  # the generator plants a non-data chunk
    decode_wav(payload)  # chunk walker handles it
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + payload[4:])  # wrong magic
    with pytest.raises(ValueError):
        decode_wav(payload[:-10])  # truncated data chunk


def test_audio_features_match_python_oracle(spark, sf_dir):
    import math

    from dbms_query_optimizer_spark.operators.multimodal import (
        WAV_WINDOW,
        decode_wav,
        make_wav,
        q_multimodal_audio_features,
    )

    rows = {
        r["doc_id"]: r
        for r in q_multimodal_audio_features(spark, sf_dir).collect()
    }
    n_docs = multimodal_table(spark, sf_dir).count()
    assert len(rows) == n_docs

    for doc_id in list(rows)[:8]:
        r = rows[doc_id]
        rate, _, xs = decode_wav(make_wav(doc_id))
        n = len(xs)
        assert r["n_samples"] == n
        assert r["duration_ms"] == round(n * 1000.0 / rate, 3)
        assert r["rms"] == round(math.sqrt(sum(x * x for x in xs) / n), 4)
        assert r["peak"] == max(abs(x) for x in xs)
        assert r["n_windows"] == -(-n // WAV_WINDOW)


def test_image_dhash_dedup_matches_python_oracle(spark, sf_dir):
    """Independent single-threaded recompute of the perceptual-hash
    dedup summary, plus the two semantic guarantees: every planted
    near-duplicate (brightness-lifted re-shoot) collides with its
    source, and unrelated LCG-noise images do not collide."""
    from collections import Counter

    from dbms_query_optimizer_spark.operators.multimodal import (
        NEARDUP_MOD,
        dhash64,
        make_ppm_neardup,
        q_multimodal_image_dhash_dedup,
    )

    doc_ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    hashes = {d: dhash64(make_ppm_neardup(d)) for d in doc_ids}
    counts = Counter(hashes.values())
    planted = [d for d in doc_ids if d % NEARDUP_MOD == 3 and d >= 3]

    # planted pairs collide (gradient hash is brightness-invariant)...
    for d in planted:
        assert hashes[d] == hashes[d - 3], d
    # ...and nothing else does: every group is exactly {src, re-shoot}
    expected_groups = len(doc_ids) - len(planted)
    assert len(counts) == expected_groups
    assert max(counts.values()) == 2

    row = q_multimodal_image_dhash_dedup(spark, sf_dir).collect()[0]
    assert row.n_images == len(doc_ids)
    assert row.n_groups == expected_groups
    assert row.n_duplicates == len(planted)
    assert row.largest_group == 2
    assert row.n_planted == len(planted)
