#!/usr/bin/env python
"""Regenerate the GENERATOR-TRUTH media fixtures under tests/fixtures/.

These back the DuckDB SQL twins of the media catalog queries
(m_audio_energy, m_wav_loudness, m_frame_sample, m_scene_detect) with
ground truth that is INDEPENDENT of the engine's decode/slice/detect
code paths: this script replays the corpus generators' seeded RNG
streams directly (numpy only — deliberately importing NOTHING from
vectordb_similarity_search_spark) and writes the raw samples / frame
digests / frame deltas the containers were built from. The Spark side
must then encode -> (distribute) -> decode -> window/aggregate its way
back to these numbers; an encoder or decoder bug breaks the round trip
and fails the driver hash-compare, which an engine-generated
expected-parquet pin could never catch (round-8 VERDICT #3).

The RNG schedules below mirror operators/multimodal.py's generators
(synth_media seed 42, synth_real_media seed 7 slot map mid%5,
synth_scene_media seed 7) — a change there requires rerunning this
script, exactly like gen_expected_fixtures.py:

    python scripts/gen_media_ground_truth.py
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tests", "fixtures")

FRAME_BYTES = 64


def gen_pcm() -> pd.DataFrame:
    """(corpus, media_id, sample_idx, amp) for the two audio corpora:
    synth_media's unsigned-byte payloads centered at 128 (corpus
    'synth', n=120, kind=audio at mid%3==1) and synth_real_media's
    PCM-16 WAV samples scaled >>8 (corpus 'real', n=60, slot mid%5==2,
    id offset 100000)."""
    rows = {"corpus": [], "media_id": [], "sample_idx": [], "amp": []}

    def emit(corpus: str, mid: int, amps: np.ndarray) -> None:
        rows["corpus"].extend([corpus] * len(amps))
        rows["media_id"].extend([mid] * len(amps))
        rows["sample_idx"].extend(range(len(amps)))
        rows["amp"].extend(int(a) for a in amps)

    for mid in range(120):  # synth_media(seed=42)
        if mid % 3 != 1:  # not audio
            continue
        rng = np.random.default_rng(42 + mid)
        rng.integers(8, 65)  # w (drawn, unused here)
        rng.integers(8, 65)  # h
        payload = rng.integers(0, 256, size=FRAME_BYTES, dtype=np.uint8)
        emit("synth", mid, payload.astype(np.int64) - 128)

    for mid in range(60):  # synth_real_media(seed=7), slot map mid % 5
        if mid % 5 != 2:  # not WAV
            continue
        rng = np.random.default_rng(7 + mid)
        n_samp = int(rng.integers(256, 2049))
        samples = rng.integers(
            -(1 << 14), 1 << 14, size=n_samp, dtype=np.int64
        ).astype(np.int16)
        emit("real", 100_000 + mid, samples.astype(np.int64) >> 8)
    return pd.DataFrame(rows)


def gen_frames() -> pd.DataFrame:
    """(media_id, frame_idx, n_bytes, crc) for EVERY frame of
    synth_media's videos (mid%3==2): the m_frame_sample twin applies the
    every-2nd sampling IN SQL over this table."""
    rows = {"media_id": [], "frame_idx": [], "n_bytes": [], "crc": []}
    for mid in range(120):
        if mid % 3 != 2:
            continue
        rng = np.random.default_rng(42 + mid)
        rng.integers(8, 65)  # w
        rng.integers(8, 65)  # h
        frames = int(rng.integers(4, 17))
        payload = rng.integers(
            0, 256, size=frames * FRAME_BYTES, dtype=np.uint8
        ).tobytes()
        for i in range(frames):
            chunk = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
            rows["media_id"].append(mid)
            rows["frame_idx"].append(i)
            rows["n_bytes"].append(len(chunk))
            rows["crc"].append(zlib.crc32(chunk))
    return pd.DataFrame(rows)


def gen_scene_deltas() -> pd.DataFrame:
    """(media_id, n_frames, frame_idx, delta) — consecutive-frame
    absolute byte-delta sums of synth_scene_media(n=48, seed=7); the cut
    decision (1000*delta >= threshold*FRAME_BYTES) lives in the SQL
    twin."""
    rows = {"media_id": [], "n_frames": [], "frame_idx": [], "delta": []}
    for mid in range(48):
        rng = np.random.default_rng(7 + mid)
        n_scenes = int(rng.integers(2, 6))
        frames = []
        for _ in range(n_scenes):
            base = rng.integers(0, 256, size=FRAME_BYTES, dtype=np.int64)
            length = int(rng.integers(2, 7))
            for _f in range(length):
                noise = rng.integers(-2, 3, size=FRAME_BYTES)
                frames.append(np.clip(base + noise, 0, 255).astype(np.uint8))
        arr = np.stack(frames).astype(np.int64)
        deltas = np.abs(arr[1:] - arr[:-1]).sum(axis=1)
        for i, d in enumerate(deltas, start=1):
            rows["media_id"].append(mid)
            rows["n_frames"].append(len(frames))
            rows["frame_idx"].append(i)
            rows["delta"].append(int(d))
    return pd.DataFrame(rows)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, df in (
        ("media_pcm_truth", gen_pcm()),
        ("media_frames_truth", gen_frames()),
        ("media_scene_truth", gen_scene_deltas()),
    ):
        path = os.path.join(OUT, f"{name}.parquet")
        df.to_parquet(path, index=False)
        print(f"{name}: {len(df)} rows -> {path}")


if __name__ == "__main__":
    main()
