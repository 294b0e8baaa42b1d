"""Distributed time-series subsequence search (PAPERS.md: REPOSE ICDE'21,
Odyssey VLDB'23, EDBT'19 streaming TS similarity — the family's core query
re-expressed Spark-first).

Query: given a literal pattern of length m, find the top-k windows of any
(series key) whose z-normalized values are closest (Euclidean) to the
z-normalized pattern — the "find occurrences of this shape anywhere in
100 TB of telemetry" primitive.

Plan shape (the part that matters at scale):
- ONE pass builds every length-m window per series with a window-function
  ``collect_list`` over ``ROWS BETWEEN CURRENT ROW AND m-1 FOLLOWING`` —
  no self-join, no explode-by-offset: the shuffle is one exchange keyed
  by series id (the same partitioning every per-series op reuses).
- z-normalization and the distance are fold expressions over the
  length-m arrays — whole-stage codegen, no UDF.
- top-k is a global ``ORDER BY ... LIMIT k`` — Spark's
  TakeOrderedAndProject: each task forwards only its local top-k, the
  driver merges k·partitions rows, never the window population.
- Ordering is made engine-deterministic by ranking on the 6-decimal
  distance with (key, t) tiebreaks — last-ulp sqrt noise cannot reorder.

Degenerate windows (constant values, sd = 0) z-normalize to the zero
vector, matching the convention DuckDB's oracle reproduces.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _znorm_lit(values: Sequence[float]) -> list[float]:
    n = len(values)
    mu = sum(values) / n
    var = sum((v - mu) ** 2 for v in values) / n
    sd = math.sqrt(var)
    if sd == 0.0:
        return [0.0] * n
    return [(v - mu) / sd for v in values]


def subsequence_topk(
    df: DataFrame,
    pattern: Sequence[float],
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
    k: int = 10,
    tiebreak_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Top-``k`` windows across all series by z-normalized Euclidean
    distance to ``pattern``. Returns (key_cols..., t, dist) where t is the
    window's start time. ``tiebreak_cols`` (default: key_cols + time_col)
    must make the window ordering unique — duplicate timestamps within a
    series need an extra column (e.g. an event id)."""
    m = len(pattern)
    if m < 2:
        raise ValueError("subsequence_topk: pattern needs >= 2 points")
    q = _znorm_lit([float(v) for v in pattern])
    q_arr = F.array(*[F.lit(v) for v in q])
    tb = list(tiebreak_cols or [*key_cols, time_col])

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.col(c) for c in tb if c not in key_cols])
        .rowsBetween(Window.currentRow, m - 1)
    )
    windows = df.select(
        *key_cols,
        F.col(time_col).alias("t"),
        F.collect_list(F.col(value_col).cast("double")).over(w).alias("win"),
    ).where(F.size("win") == m)

    mu = F.aggregate(
        F.col("win"), F.lit(0.0), lambda a, x: a + x
    ) / F.lit(float(m))
    var = F.aggregate(
        F.col("win"),
        F.lit(0.0),
        lambda a, x: a + (x - F.col("__mu__")) * (x - F.col("__mu__")),
    ) / F.lit(float(m))
    scored = (
        windows.withColumn("__mu__", mu)
        .withColumn("__sd__", F.sqrt(var))
        .withColumn(
            "__zn__",
            F.when(
                F.col("__sd__") == 0.0,
                F.transform(F.col("win"), lambda x: F.lit(0.0)),
            ).otherwise(
                F.transform(
                    F.col("win"),
                    lambda x: (x - F.col("__mu__")) / F.col("__sd__"),
                )
            ),
        )
        .withColumn(
            "dist",
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.zip_with(
                            F.col("__zn__"), q_arr, lambda a, b: (a - b) * (a - b)
                        ),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                ),
                6,
            ),
        )
    )
    return (
        scored.select(*key_cols, "t", "dist")
        .orderBy("dist", *[F.col(c) for c in tb])
        .limit(int(k))
    )
