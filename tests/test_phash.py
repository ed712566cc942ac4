"""Perceptual-hash media near-dup (operators/multimodal.phash_*):
hash determinism, brightness-shift robustness, pigeonhole recall, and
the injected re-encode round-trip behind m_phash_neardup."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from vectordb_similarity_search_spark.operators.multimodal import (
    FRAME_BYTES,
    perturb_media,
    phash_bits,
    phash_neardup_pairs,
    synth_media,
)


def _pairs(df):
    return sorted((r.id_a, r.id_b, r.hamming) for r in df.collect())


def test_phash_is_deterministic_and_balanced(spark):
    base = synth_media(spark, n=12, seed=42)
    h1 = {r.media_id: r.bits for r in phash_bits(base).collect()}
    h2 = {r.media_id: r.bits for r in phash_bits(base).collect()}
    assert h1 == h2
    for bits in h1.values():
        assert len(bits) == 64
        # median threshold splits the 8x8 grid about evenly (exact 32/32
        # only without ties; seeded uint8 grids stay close)
        assert 24 <= sum(bits) <= 40


def test_uniform_brightness_shift_preserves_hash(spark):
    # median thresholding is invariant to adding a constant to every
    # pixel (as long as nothing clips) — build frames in [20, 235] so a
    # +10 shift never clips (a random synth frame almost surely has a
    # byte > 245, so this needs controlled payloads)
    meta = {"width": 8, "height": 8, "n_frames": 1, "format": "synth"}
    header = b"SYNTH" + (8).to_bytes(2, "big") * 2 + (1).to_bytes(2, "big")
    header += b"\x00" * 5

    def blob(seed, shift):
        frame = np.random.default_rng(seed).integers(
            20, 236, size=FRAME_BYTES, dtype=np.uint8
        )
        return header + (frame + shift).astype(np.uint8).tobytes()

    rows, shifted_rows = [], []
    for mid in range(6):
        rows.append((mid, "image", blob(100 + mid, 0), meta))
        shifted_rows.append((mid, "image", blob(100 + mid, 10), meta))
    schema = synth_media(spark, n=1).schema
    orig = {
        r.media_id: r.bits
        for r in phash_bits(spark.createDataFrame(rows, schema)).collect()
    }
    got = {
        r.media_id: r.bits
        for r in phash_bits(
            spark.createDataFrame(shifted_rows, schema)
        ).collect()
    }
    assert got == orig


def test_injected_reencodes_found_exactly(spark):
    base = synth_media(spark, n=48, seed=42)
    dups = perturb_media(base.filter(F.col("media_id") < 12), id_offset=1000)
    got = _pairs(
        phash_neardup_pairs(base.unionByName(dups), n_blocks=4, max_hamming=3)
    )
    # no false positives: every pair links an original to its re-encode
    assert all(b == a + 1000 for a, b, _ in got), got
    found = {a for a, _, _ in got}
    missing = set(range(12)) - found
    # exactly one injected re-encode drifts past hamming 3 at this seed —
    # verify the miss is a true threshold exceedance, not a recall bug
    assert len(missing) == 1, got
    bits = {
        r.media_id: r.bits
        for r in phash_bits(base.unionByName(dups))
        .filter(F.col("media_id").isin([m for m in missing] +
                                       [m + 1000 for m in missing]))
        .collect()
    }
    (m,) = missing
    ham = sum(x != y for x, y in zip(bits[m], bits[m + 1000]))
    assert ham > 3, (m, ham)


def test_pigeonhole_recall_within_block_bound(spark):
    # any pair with hamming < n_blocks MUST be found (exact recall):
    # compare against brute-force over all hash pairs
    base = synth_media(spark, n=48, seed=42)
    dups = perturb_media(base.filter(F.col("media_id") < 12), id_offset=1000)
    corpus = base.unionByName(dups)
    bits = {r.media_id: r.bits for r in phash_bits(corpus).collect()}
    ids = sorted(bits)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if sum(x != y for x, y in zip(bits[a], bits[b])) <= 3
    }
    got = {(a, b) for a, b, _ in _pairs(
        phash_neardup_pairs(corpus, n_blocks=4, max_hamming=3)
    )}
    assert got == brute
