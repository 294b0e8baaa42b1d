"""Rolling-window anomaly detection over ordered event/metric tables.

A curation pipeline watches its own telemetry — ingestion rates,
per-source quality means, dedup ratios — and a rolling z-score against
the trailing window is the standard first-line drift/outlier detector.
No reference counterpart (the reference is a raster operator library).

Plan shape: ONE window specification (partition by the series key, order
by time) carries mean, stddev, and count — Spark evaluates all three in
a single pass over one exchange; no self-join, no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    partition_cols: list[str] | None = None,
    window: int = 20,
    out_col: str = "zscore",
) -> DataFrame:
    """z-score of each value against its TRAILING ``window`` rows
    (current row excluded — the score tests the new point against
    history, so the point cannot mask itself). Rows with fewer than 2
    history rows, or zero history variance, get NULL (not 0 — "cannot
    score" and "perfectly normal" must stay distinguishable).

    ``order_cols`` must be a total order per partition (pass a
    tie-breaker column — timestamps collide in real telemetry);
    deterministic output requires it."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    keys = partition_cols or []
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col).cast("double")
    mean = F.avg(v).over(w)
    sd = F.stddev_samp(v).over(w)
    n = F.count(v).over(w)
    z = F.when(
        (n >= 2) & sd.isNotNull() & (sd > 0), (v - mean) / sd
    )
    return df.withColumn(out_col, z)


def anomalies(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    partition_cols: list[str] | None = None,
    window: int = 20,
    threshold: float = 3.0,
) -> DataFrame:
    """Rows whose |rolling z-score| exceeds ``threshold`` — the alert
    set. Same single-window plan as :func:`rolling_zscore`."""
    scored = rolling_zscore(
        df, value_col, order_cols, partition_cols, window
    )
    return scored.where(F.abs(F.col("zscore")) > threshold)
