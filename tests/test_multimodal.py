"""Multimodal binary-column plumbing: schema contracts, deterministic
generation, decode/featurize/frame-sample batch shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.multimodal import (
    FRAME_BYTES,
    byte_histogram,
    decode_media,
    frame_sample,
    media_fingerprint,
    synth_media,
    _fake_decode,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, 30).cache()


def test_synth_media_deterministic(spark, media):
    a = sorted(media_fingerprint(media).collect(), key=lambda r: r.media_id)
    b = sorted(
        media_fingerprint(synth_media(spark, 30)).collect(), key=lambda r: r.media_id
    )
    assert [r.sha256 for r in a] == [r.sha256 for r in b]


def test_decode_matches_meta(media):
    meta = {r.media_id: r.meta for r in media.select("media_id", "meta").collect()}
    for r in decode_media(media).collect():
        assert (r.width, r.height) == (meta[r.media_id].width, meta[r.media_id].height)
        assert 0.0 <= r.mean_byte <= 255.0
        assert r.decoder in ("pillow", "synth-fake")


def test_decode_rejects_unknown_format():
    with pytest.raises(NotImplementedError):
        _fake_decode(b"JPEGnotreally" + b"\x00" * 32)


def test_byte_histogram_shape(media):
    rows = byte_histogram(media, bins=16).collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.hist) == 16
        assert sum(r.hist) > 0


def test_frame_sample_only_video_and_stride(media):
    metas = {r.media_id: r.meta for r in media.select("media_id", "meta").collect()}
    kinds = {r.media_id: r.kind for r in media.select("media_id", "kind").collect()}
    out = frame_sample(media, every=2).collect()
    assert out, "expected video rows"
    by_id: dict[int, list[int]] = {}
    for r in out:
        assert kinds[r.media_id] == "video"
        assert len(r.frame) == FRAME_BYTES
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    for mid, idxs in by_id.items():
        assert sorted(idxs) == list(range(0, metas[mid].n_frames, 2))


def test_audio_energy_matches_python_replica(media):
    from vectordb_similarity_search_spark.operators.multimodal import (
        audio_energy,
    )

    blobs = {
        r["media_id"]: bytes(r["data"])
        for r in media.filter(F.col("kind") == "audio").collect()
    }
    got = {
        (r["media_id"], r["window_idx"]): (
            r["n_samples"],
            r["peak"],
            round(r["rms"], 9),
        )
        for r in audio_energy(
            media.filter(F.col("kind") == "audio"), window=10
        ).collect()
    }
    expect = {}
    for mid, blob in blobs.items():
        samples = [b - 128 for b in blob[16:]]
        for wi in range(0, len(samples), 10):
            chunk = samples[wi : wi + 10]
            ssq = sum(s * s for s in chunk)
            expect[(mid, wi // 10)] = (
                len(chunk),
                max(abs(s) for s in chunk),
                round((ssq / len(chunk)) ** 0.5, 9),
            )
    assert got == expect
    # the synth audio payload is 64 bytes: a 10-sample window leaves a
    # 4-sample remainder window — assert the ragged tail is emitted
    assert any(n == 4 for n, _, _ in got.values())


def test_audio_energy_validation(media):
    from vectordb_similarity_search_spark.operators.multimodal import (
        audio_energy,
    )

    with pytest.raises(ValueError):
        audio_energy(media, window=0)
