"""Perceptual image dedup: decode_raw_rgb + image_dhash +
banded_hamming_pairs."""

import numpy as np
import pytest

from openeo_processes_dask_spark.training.dedup import banded_hamming_pairs
from openeo_processes_dask_spark.training.multimodal import (
    _dhash64,
    decode_raw_rgb,
    image_dhash,
    synthetic_raw_image_table,
)


def test_decode_raw_rgb_roundtrip_and_size_check():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(3, 2, 3)
    back = decode_raw_rgb(img.tobytes(), width=2, height=3)
    assert (back == img).all()
    with pytest.raises(ValueError):
        decode_raw_rgb(img.tobytes()[:-1], width=2, height=3)


def test_dhash_invariant_to_brightness_sensitive_to_structure():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
    # uniform brightness shift preserves every gradient sign
    brighter = np.clip(img.astype(int) + 40, 0, 255).astype(np.uint8)
    assert _dhash64(img) == _dhash64(brighter)
    # structural change (transpose) produces a different hash
    assert _dhash64(img) != _dhash64(img.transpose(1, 0, 2))


def test_image_dhash_matches_local(spark):
    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    tbl = synthetic_raw_image_table(ids)
    got = {r["id"]: r["dhash"] for r in image_dhash(tbl).collect()}
    local = {
        r["doc_id"]: _dhash64(
            decode_raw_rgb(bytes(r["payload"]), r["width"], r["height"])
        )
        for r in tbl.collect()
    }
    assert got == local


def test_banded_hamming_pairs_exact_recall(spark):
    ids = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    sigs = image_dhash(synthetic_raw_image_table(ids))
    got = {
        (r["id1"], r["id2"], r["hamming"])
        for r in banded_hamming_pairs(
            sigs, max_hamming=4, bands=8, sig_col="dhash"
        ).collect()
    }
    # brute force over the same signatures
    rows = {r["id"]: r["dhash"] for r in sigs.collect()}
    exp = set()
    for i in rows:
        for j in rows:
            if i < j:
                d = bin((rows[i] ^ rows[j]) & ((1 << 64) - 1)).count("1")
                if d <= 4:
                    exp.add((i, j, d))
    assert got == exp
    assert exp, "fixture must actually contain near-dup pairs"


def test_banded_hamming_rejects_insufficient_bands(spark):
    sigs = spark.createDataFrame([(1, 5), (2, 7)], ["id", "sig"])
    with pytest.raises(ValueError):
        banded_hamming_pairs(sigs, max_hamming=8, bands=8)


def test_video_frame_hashes_and_near_dups(spark):
    from openeo_processes_dask_spark.training.dedup import shared_key_pairs
    from openeo_processes_dask_spark.training.multimodal import (
        synthetic_raw_video_table,
        video_frame_hashes,
    )

    ids = spark.range(0, 21).withColumnRenamed("id", "doc_id")
    fh = video_frame_hashes(synthetic_raw_video_table(ids))
    rows = fh.collect()
    # 21 videos x 6 frames
    assert len(rows) == 21 * 6
    pairs = {
        (r["id1"], r["id2"])
        for r in shared_key_pairs(
            fh, min_shared=4, key_col="dhash"
        ).collect()
    }
    assert pairs, "families must match"
    for a, b in pairs:
        assert a % 7 == b % 7, (a, b)
    # a full family triple (0, 7, 14)
    assert (0, 7) in pairs and (0, 14) in pairs and (7, 14) in pairs


def test_video_frame_hashes_rejects_ragged_payload(spark):
    import pytest

    from openeo_processes_dask_spark.training.multimodal import (
        video_frame_hashes,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"\x00" * 100), 4, 4)],
        "doc_id bigint, payload binary, width int, height int",
    )
    with pytest.raises(Exception):
        video_frame_hashes(df).collect()


def test_shared_key_pairs_max_key_freq_guard(spark):
    from openeo_processes_dask_spark.training.dedup import shared_key_pairs

    rows = (
        [(i, 999) for i in range(10)]        # degenerate key on everyone
        + [(1, 7), (2, 7), (1, 8), (2, 8)]   # real overlap between 1 and 2
    )
    df = spark.createDataFrame(rows, ["id", "key"])
    exact = {
        (r["id1"], r["id2"]): r["n_shared"]
        for r in shared_key_pairs(df, min_shared=1).collect()
    }
    # the shared degenerate key links ALL pairs
    assert len(exact) == 45 and exact[(1, 2)] == 3
    capped = {
        (r["id1"], r["id2"]): r["n_shared"]
        for r in shared_key_pairs(
            df, min_shared=1, max_key_freq=5
        ).collect()
    }
    # guard drops key 999: only the real pair survives
    assert capped == {(1, 2): 2}


def test_scene_changes_known_cuts(spark):
    from openeo_processes_dask_spark.training.multimodal import scene_changes

    # hand-built hash sequences: id 1 has a big jump at frame 2, id 2 is
    # static; frame 0 rows never appear
    fh = spark.createDataFrame(
        [
            (1, 0, 0b1111), (1, 1, 0b1110), (1, 2, 0b1111111111110000),
            (2, 0, 5), (2, 1, 5),
        ],
        "id bigint, frame_idx int, dhash bigint",
    ).repartition(3)
    got = {
        (r["id"], r["frame_idx"]): (r["hamming"], r["is_cut"])
        for r in scene_changes(fh, threshold=3).collect()
    }
    assert got == {
        (1, 1): (1, False),      # one bit flipped
        (1, 2): (15, True),      # 0xFFF0 ^ 0x000E = 0xFFFE -> 15 bits
        (2, 1): (0, False),
    }


def test_scene_changes_validates(spark):
    import pytest

    from openeo_processes_dask_spark.training.multimodal import scene_changes

    fh = spark.createDataFrame([(1, 0, 5)], "id bigint, frame_idx int, dhash bigint")
    with pytest.raises(ValueError):
        scene_changes(fh, threshold=-1)
