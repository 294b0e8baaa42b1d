"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic pseudo-decode (seeded from the
byte content) exercises the real Spark plumbing — schema, batching,
partition behavior — end to end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, "
    "mean_intensity double, feature array<float>"
)


def _fake_decode(payload: bytes, meta_w: int, meta_h: int) -> np.ndarray:
    """Deterministic fake decoder: bytes -> (h, w, 3) uint8 array seeded by
    the content digest. Replace with PIL/cv2 in a real deployment."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(meta_h, meta_w, 3), dtype=np.uint8)


def decode_image(payload: bytes, width: int, height: int, fake: bool = False):
    if not fake:
        raise NotImplementedError(
            "Real image decoding needs PIL/opencv (not in this container); "
            "pass fake=True for the deterministic stub."
        )
    return _fake_decode(payload, width, height)


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    feature_dim: int = 8,
    fake: bool = True,
) -> DataFrame:
    """Decode + feature-extract over binary image columns.

    mapInPandas streams Arrow batches through Python — one pass, no shuffle;
    at 100 TB this runs as wide as the scan. Batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch (keep decoded images per
    batch under executor memory).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                img = decode_image(
                    bytes(row[payload_col]), int(row[width_col]),
                    int(row[height_col]), fake=fake,
                )
                pooled = img.astype("float64").mean(axis=2)
                # fixed-dim feature: mean over feature_dim contiguous chunks
                feat = np.array(
                    [c.mean() for c in np.array_split(pooled.ravel(), feature_dim)],
                    dtype="float32",
                )
                out.append(
                    {
                        "doc_id": row[id_col],
                        "width": int(row[width_col]),
                        "height": int(row[height_col]),
                        "channels": 3,
                        "mean_intensity": float(img.mean()),
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=IMAGE_SCHEMA)


def synthetic_image_table(spark, n: int = 32, width: int = 16, height: int = 12):
    """Deterministic binary-column fixture (no image libs needed)."""
    rows = [
        (i, hashlib.sha256(f"img-{i}".encode()).digest() * 4, width, height)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, payload binary, width int, height int"
    )


RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, payload binary"
)


def resize_images(
    df: DataFrame,
    target_width: int,
    target_height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    fake: bool = True,
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode (raw RGB bytes).
    The resize itself is REAL (pure integer-index NumPy, no image lib);
    only the byte->array decode is the documented stub. Same mapInPandas
    shape as image_features: one pass, no shuffle, batch-bounded memory."""
    tw, th = int(target_width), int(target_height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                img = decode_image(
                    bytes(row[payload_col]), int(row[width_col]),
                    int(row[height_col]), fake=fake,
                )
                h, w = img.shape[:2]
                yi = (np.arange(th) * h) // th
                xi = (np.arange(tw) * w) // tw
                resized = img[yi][:, xi]
                out.append(
                    {
                        "doc_id": row[id_col],
                        "width": tw,
                        "height": th,
                        "channels": resized.shape[2],
                        "payload": resized.tobytes(),
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, width int, height int, "
    "mean_intensity double"
)


def _fake_decode_video(
    payload: bytes, n_frames: int, width: int, height: int
) -> np.ndarray:
    """bytes -> (t, h, w, 3) uint8, seeded by content digest + frame index
    (so every frame is distinct but reproducible)."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(
        0, 256, size=(n_frames, height, width, 3), dtype=np.uint8
    )


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Frame sampling over binary video columns: decode (stubbed), take
    every ``every_n``-th frame, emit ONE ROW PER SAMPLED FRAME — the
    mapInPandas iterator shape for 1->N row expansion (no explode of a
    materialized frame array, so peak memory is one video, not one row
    per frame buffered)."""
    if not fake:
        raise NotImplementedError(
            "Real video decoding needs ffmpeg/av (not in this container)"
        )
    k = int(every_n)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                vid = _fake_decode_video(
                    bytes(row[payload_col]), int(row["n_frames"]),
                    int(row["width"]), int(row["height"]),
                )
                for idx in range(0, vid.shape[0], k):
                    out.append(
                        {
                            "doc_id": row[id_col],
                            "frame_idx": idx,
                            "width": vid.shape[2],
                            "height": vid.shape[1],
                            "mean_intensity": float(vid[idx].mean()),
                        }
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples int, rms double, "
    "zero_crossing_rate double, spectral_centroid double"
)


def _fake_decode_audio(payload: bytes, n_samples: int) -> np.ndarray:
    """bytes -> float32 waveform in [-1, 1], content-seeded."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return (rng.random(n_samples, dtype=np.float64) * 2 - 1).astype("float32")


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Audio feature extraction over binary columns: RMS, zero-crossing
    rate, and FFT spectral centroid — all REAL NumPy signal math; only the
    byte->waveform decode is the documented stub."""
    if not fake:
        raise NotImplementedError(
            "Real audio decoding needs soundfile/librosa (not in this "
            "container)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                sr = int(row["sample_rate"])
                y = _fake_decode_audio(
                    bytes(row[payload_col]), int(row["n_samples"])
                ).astype("float64")
                rms = float(np.sqrt(np.mean(y**2))) if len(y) else 0.0
                zcr = (
                    float(np.mean(np.abs(np.diff(np.signbit(y)))))
                    if len(y) > 1
                    else 0.0
                )
                spec = np.abs(np.fft.rfft(y))
                freqs = np.fft.rfftfreq(len(y), d=1.0 / sr)
                centroid = (
                    float((freqs * spec).sum() / spec.sum())
                    if spec.sum() > 0
                    else 0.0
                )
                out.append(
                    {
                        "doc_id": row[id_col],
                        "sample_rate": sr,
                        "n_samples": int(row["n_samples"]),
                        "rms": rms,
                        "zero_crossing_rate": zcr,
                        "spectral_centroid": centroid,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=AUDIO_SCHEMA)


def synthetic_video_table(
    spark, n: int = 8, n_frames: int = 30, width: int = 8, height: int = 6
):
    rows = [
        (
            i,
            hashlib.sha256(f"vid-{i}".encode()).digest() * 2,
            n_frames,
            width,
            height,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "doc_id bigint, payload binary, n_frames int, width int, height int",
    )


def synthetic_audio_table(
    spark, n: int = 8, sample_rate: int = 8000, n_samples: int = 4000
):
    rows = [
        (
            i,
            hashlib.sha256(f"aud-{i}".encode()).digest() * 2,
            sample_rate,
            n_samples,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, payload binary, sample_rate int, n_samples int"
    )


def binary_duplicates(
    df, id_col: str = "doc_id", payload_col: str = "payload"
):
    """Exact dedup over opaque binary payloads (image/audio/video bytes) —
    the first pass of every multimodal ingest, run BEFORE any decode:
    identical files dedup without a codec ever opening them.

    Plan: md5 of the payload column (Spark's md5 accepts binary natively,
    JVM-side) → one digest-keyed hash aggregate. Column pruning means the
    scan reads ONLY the payload + id columns, and the shuffle carries
    16-byte digests — payload bytes never leave their executor. Returns
    (fingerprint, keep_id, n_copies) like text exact_duplicates."""
    from pyspark.sql import functions as F

    return (
        df.select(F.col(id_col), F.md5(F.col(payload_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def decode_raw_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """REAL decode for raw interleaved RGB payloads (h*w*3 uint8 bytes) —
    no codec library needed, so unlike :func:`decode_image` this lane is
    fully functional in any container. Raises on size mismatch rather
    than guessing a stride."""
    expect = width * height * 3
    if len(payload) != expect:
        raise ValueError(
            f"raw RGB payload is {len(payload)} bytes, expected "
            f"{expect} for {width}x{height}x3"
        )
    return np.frombuffer(payload, dtype=np.uint8).reshape(height, width, 3)


def _dhash64(img: np.ndarray) -> int:
    """64-bit difference hash: grayscale, 9x8 NN downsample, horizontal
    gradient sign, packed row-major (bit 63 = top-left comparison) into a
    SIGNED int64 (two's complement — matches Spark/DuckDB BIGINT)."""
    gray = img.astype("float64").mean(axis=2)
    h, w = gray.shape
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(9) * w) // 9
    g = gray[np.ix_(rows, cols)]
    bits = (g[:, 1:] > g[:, :-1]).ravel()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """(id, dhash) over raw-RGB binary images — the perceptual signature
    whose Hamming distance survives re-encoding/minor edits, feeding
    :func:`...dedup.banded_hamming_pairs` for near-duplicate IMAGE dedup
    (binary_duplicates only catches byte-exact copies).

    Plan: mapInPandas, one pass, payload never shuffles — only the
    (id, 64-bit hash) relation leaves the scan, exactly like the text
    digest lanes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                img = decode_raw_rgb(
                    bytes(row[payload_col]), int(row[width_col]),
                    int(row[height_col]),
                )
                out.append(
                    {"id": row[id_col], "dhash": _dhash64(img)}
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema="id bigint, dhash bigint")


def synthetic_raw_image_table(
    ids: DataFrame,
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 16,
    n_families: int = 17,
    noise_pixels_mod: int = 2,
) -> DataFrame:
    """Deterministic raw-RGB fixture with NEAR-duplicate structure: each
    id renders its family's base image (seeded by id % n_families) with
    id % noise_pixels_mod pixels perturbed (seeded by id) — family
    members are perceptual near-dups, cross-family images are unrelated.
    Generated distributively (mapInPandas over the id relation), and
    replayable in NumPy by the gate's oracle builder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                i = int(row[id_col])
                base = np.random.default_rng(i % n_families).integers(
                    0, 256, size=(height, width, 3), dtype=np.uint8
                )
                n_noise = i % noise_pixels_mod
                if n_noise:
                    rng = np.random.default_rng(1_000_003 + i)
                    for _ in range(n_noise):
                        r = int(rng.integers(0, height))
                        c = int(rng.integers(0, width))
                        base = base.copy()
                        base[r, c, :] = 255 - base[r, c, :]
                out.append(
                    {
                        "doc_id": i,
                        "payload": base.tobytes(),
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(out)

    return ids.select(F.col(id_col)).mapInPandas(
        run, schema="doc_id bigint, payload binary, width int, height int"
    )


def decode_raw_pcm16(payload: bytes) -> np.ndarray:
    """REAL decode for raw little-endian PCM16 mono payloads — like
    :func:`decode_raw_rgb`, fully functional with no codec library.
    Returns float64 waveform in [-1, 1)."""
    if len(payload) % 2:
        raise ValueError(
            f"PCM16 payload length must be even, got {len(payload)}"
        )
    return np.frombuffer(payload, dtype="<i2").astype("float64") / 32768.0


def audio_landmarks(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame: int = 256,
    hop: int = 128,
) -> DataFrame:
    """Shazam-style spectral landmark fingerprints over raw PCM16 audio:
    frame the waveform, take each frame's dominant FFT bin (DC excluded,
    first-index tie rule), and hash CONSECUTIVE peak-bin pairs —
    landmarks survive volume changes and clipping at the edges, unlike
    a waveform digest. Emits distinct (id, landmark) rows.

    Plan: mapInPandas over the payload scan (audio bytes never shuffle);
    the landmark relation — a few ints per second of audio — is what
    joins downstream, the same digest-only discipline as every dedup
    lane."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                y = decode_raw_pcm16(bytes(row[payload_col]))
                peaks = []
                for s in range(0, len(y) - frame + 1, hop):
                    spec = np.abs(np.fft.rfft(y[s : s + frame]))
                    peaks.append(int(np.argmax(spec[1:])) + 1)
                marks = {
                    int(a * 100_000 + b)
                    for a, b in zip(peaks, peaks[1:])
                }
                for m in sorted(marks):
                    out.append({"id": row[id_col], "landmark": m})
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema="id bigint, landmark bigint")


def audio_near_duplicates(
    landmarks: DataFrame, min_shared: int = 8
) -> DataFrame:
    """(id1, id2, n_shared) for audio pairs sharing >= ``min_shared``
    landmarks — the generic set-overlap join
    (:func:`...dedup.shared_key_pairs`): equi-join on the landmark key,
    never all-pairs; bucket sizes are bounded by landmark selectivity
    exactly like shingle joins (frequency-cap upstream if a landmark
    degenerates)."""
    from openeo_processes_dask_spark.training.dedup import shared_key_pairs

    return shared_key_pairs(landmarks, min_shared, key_col="landmark")


def synthetic_raw_audio_table(
    ids: DataFrame,
    id_col: str = "doc_id",
    n_samples: int = 2048,
    n_families: int = 11,
) -> DataFrame:
    """Deterministic raw-PCM16 fixture with near-dup structure: each id
    renders its family's MELODY (a family-seeded sequence of 256-sample
    notes — time-varying, so consecutive-peak landmarks are plentiful)
    plus a small id-seeded noise floor — family members share spectral
    landmarks, cross-family audio does not. NumPy-replayable by the
    oracle builder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                i = int(row[id_col])
                fam = np.random.default_rng(900 + i % n_families)
                notes = fam.integers(5, 100, size=n_samples // 256)
                t = np.arange(n_samples, dtype="float64")
                freq = np.repeat(notes, 256)[: len(t)].astype("float64")
                y = 0.7 * np.sin(2 * np.pi * freq * t / 256.0)
                noise = np.random.default_rng(7_000_000 + i)
                y += 0.02 * (noise.random(n_samples) * 2 - 1)
                pcm = np.clip(y * 32767.0, -32768, 32767).astype("<i2")
                out.append({"doc_id": i, "payload": pcm.tobytes()})
            yield pd.DataFrame(out)

    return ids.select(F.col(id_col)).mapInPandas(
        run, schema="doc_id bigint, payload binary"
    )


def video_frame_hashes(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """(id, frame_idx, dhash) over raw-RGB VIDEO payloads (frames
    concatenated: n_frames * h * w * 3 bytes — the codec-free raw lane,
    like decode_raw_rgb). Each frame gets the same 64-bit dHash as the
    image lane; downstream,
    :func:`...dedup.shared_key_pairs` over the distinct (id, dhash)
    relation finds videos sharing enough frames — re-encoded or
    trimmed copies match on their surviving frames even when byte
    digests differ. One mapInPandas pass; payloads never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                w, h = int(row[width_col]), int(row[height_col])
                payload = bytes(row[payload_col])
                fsize = w * h * 3
                if fsize == 0 or len(payload) % fsize:
                    raise ValueError(
                        f"video payload of {len(payload)} bytes is not a "
                        f"multiple of the {fsize}-byte {w}x{h}x3 frame"
                    )
                for j in range(len(payload) // fsize):
                    img = np.frombuffer(
                        payload[j * fsize : (j + 1) * fsize], dtype=np.uint8
                    ).reshape(h, w, 3)
                    out.append(
                        {
                            "id": row[id_col],
                            "frame_idx": j,
                            "dhash": _dhash64(img),
                        }
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema="id bigint, frame_idx int, dhash bigint"
    )


def synthetic_raw_video_table(
    ids: DataFrame,
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 16,
    n_frames: int = 6,
    n_families: int = 7,
) -> DataFrame:
    """Raw-RGB video fixture with near-dup structure: family-seeded
    frame sequence, one id-seeded noisy pixel on every third frame —
    family members share most frame hashes. NumPy-replayable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                i = int(row[id_col])
                frames = []
                for j in range(n_frames):
                    img = np.random.default_rng(
                        5000 + (i % n_families) * 1000 + j
                    ).integers(0, 256, size=(height, width, 3), dtype=np.uint8)
                    if (i + j) % 3 == 0:
                        rng = np.random.default_rng(9_000_000 + i * 100 + j)
                        r = int(rng.integers(0, height))
                        c = int(rng.integers(0, width))
                        img = img.copy()
                        img[r, c, :] = 255 - img[r, c, :]
                    frames.append(img.tobytes())
                out.append(
                    {
                        "doc_id": i,
                        "payload": b"".join(frames),
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(out)

    return ids.select(F.col(id_col)).mapInPandas(
        run, schema="doc_id bigint, payload binary, width int, height int"
    )


def scene_changes(
    frame_hashes: DataFrame,
    threshold: int = 16,
    id_col: str = "id",
) -> DataFrame:
    """Shot/scene-boundary detection over per-frame dHashes (what
    :func:`video_frame_hashes` emits): a frame whose 64-bit dHash is
    more than ``threshold`` Hamming bits from its predecessor starts a
    new shot — the standard cheap cut detector, and the frame-sampling
    prior for "one keyframe per shot" training-data extraction.

    Returns one row per frame TRANSITION: ``(id, frame_idx, hamming,
    is_cut)`` with frame_idx the later frame; frame 0 has no
    predecessor and is omitted. Pure JVM (lag window + xor + bit_count)
    — the Python-side work ended at hashing.

    Plan at 100 TB: ONE window per video id over the tiny (id,
    frame_idx, dhash) relation — payloads were already reduced to 8-byte
    hashes upstream and never shuffle here.
    """
    if threshold < 0:
        raise ValueError(f"threshold must be >= 0, got {threshold}")
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("frame_idx")
    # materialize the lag ONCE: re-stating the window expression after
    # the filter would re-evaluate it over the filtered relation and
    # NULL out every post-cut first frame
    ham = F.bit_count(F.col("dhash").bitwiseXOR(F.col("__prev"))).cast("int")
    return (
        frame_hashes.withColumn("__prev", F.lag("dhash").over(w))
        .where(F.col("__prev").isNotNull())
        .select(
            F.col(id_col),
            "frame_idx",
            ham.alias("hamming"),
            (ham > threshold).alias("is_cut"),
        )
    )
