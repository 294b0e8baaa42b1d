"""Audio landmark fingerprints: decode_raw_pcm16 + audio_landmarks +
audio_near_duplicates."""

import numpy as np
import pytest

from openeo_processes_dask_spark.training.multimodal import (
    audio_landmarks,
    audio_near_duplicates,
    decode_raw_pcm16,
    synthetic_raw_audio_table,
)


def test_decode_raw_pcm16_roundtrip():
    pcm = np.array([0, 16384, -16384, 32767, -32768], dtype="<i2")
    y = decode_raw_pcm16(pcm.tobytes())
    assert y == pytest.approx(
        [0.0, 0.5, -0.5, 32767 / 32768, -1.0]
    )
    with pytest.raises(ValueError):
        decode_raw_pcm16(pcm.tobytes()[:-1])


def test_landmarks_volume_invariant(spark):
    # a pure two-tone signal keeps its peak bins under 2x volume cut
    t = np.arange(2048, dtype="float64")
    y = 0.8 * np.sin(2 * np.pi * 10 * t / 256.0) + 0.5 * np.sin(
        2 * np.pi * 31 * t / 256.0
    )
    loud = np.clip(y * 32767, -32768, 32767).astype("<i2").tobytes()
    quiet = np.clip(y * 16000, -32768, 32767).astype("<i2").tobytes()
    df = spark.createDataFrame(
        [(1, bytearray(loud)), (2, bytearray(quiet))],
        "doc_id bigint, payload binary",
    )
    marks = {}
    for r in audio_landmarks(df).collect():
        marks.setdefault(r["id"], set()).add(r["landmark"])
    assert marks[1] == marks[2]


def test_audio_near_duplicates_family_structure(spark):
    ids = spark.range(0, 33).withColumnRenamed("id", "doc_id")
    tbl = synthetic_raw_audio_table(ids, n_families=11)
    lm = audio_landmarks(tbl)
    pairs = {
        (r["id1"], r["id2"])
        for r in audio_near_duplicates(lm, min_shared=8).collect()
    }
    assert pairs, "families must produce matches"
    # same family iff same id mod 11 — matches must respect families
    for a, b in pairs:
        assert a % 11 == b % 11, (a, b)
    # every family of 3 (i, i+11, i+22) should fully match
    assert (0, 11) in pairs and (0, 22) in pairs and (11, 22) in pairs
