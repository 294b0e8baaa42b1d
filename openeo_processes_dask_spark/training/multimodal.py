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
