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


def ema(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    partition_cols: list[str] | None = None,
    alpha_num: int = 2,
    alpha_den: int = 10,
    out_col: str = "ema_micro",
) -> DataFrame:
    """Exponential moving average per key — the standard trend-smoother
    next to :func:`rolling_zscore`'s spike detector.

    The recurrence is computed in integer micro-units with a RATIONAL
    smoothing factor alpha = alpha_num/alpha_den::

        ema_1 = x_1
        ema_t = (alpha_num*x_t + (alpha_den-alpha_num)*ema_{t-1})
                  div alpha_den          -- x = round(value * 1e6), int64

    so the output is bit-identical under any partitioning and exactly
    replayable by a recursive-CTE oracle — float ``ewm`` accumulators
    would drift by summation order. Values must be non-negative (floor
    vs truncate division diverges below zero across engines; enforced).

    Returns one row per input row: ``partition_cols + order_cols +
    (value_col, out_col)`` with ``out_col`` the EMA in micro-units.

    Plan at 100 TB: an EMA is inherently a sequential scan per key, so
    the shape is ONE hash aggregate collecting each key's series
    (sort_array + collect_list), ONE codegen'd `aggregate` fold over the
    sorted array (no Python anywhere), and a posexplode back to rows — the
    same per-key-series-fits-an-executor contract as sessionization and
    subsequence search. ``order_cols`` must totally order each key's
    rows (append a unique tie-breaker) or results are nondeterministic.
    """
    if not 0 < alpha_num <= alpha_den:
        raise ValueError(
            f"need 0 < alpha_num <= alpha_den, got {alpha_num}/{alpha_den}"
        )
    keys = partition_cols or []
    vm_raw = F.round(
        F.col(value_col).cast("double") * F.lit(1_000_000.0)
    ).cast("long")
    # in-pass guard (no extra scan): a negative value kills the job with
    # a named error instead of silently diverging between div semantics
    vm = F.when(
        vm_raw < 0,
        F.raise_error(F.lit("ema requires non-negative values")).cast("long"),
    ).otherwise(vm_raw)
    packed = F.struct(
        *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
        vm.alias("vm"),
        F.col(value_col).cast("double").alias("v"),
    )
    series = (
        df.select(*keys, packed.alias("p"))
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list("p")).alias("xs"))
    )
    rest = alpha_den - alpha_num
    folded = series.withColumn(
        "emas",
        F.expr(
            f"""aggregate(
                 xs,
                 struct(cast(array() as array<bigint>) as a,
                        cast(0 as bigint) as prev,
                        true as first),
                 (acc, x) -> struct(
                   concat(acc.a, array(
                     CASE WHEN acc.first THEN x.vm
                          ELSE ({alpha_num} * x.vm + {rest} * acc.prev)
                                 div {alpha_den} END)),
                   CASE WHEN acc.first THEN x.vm
                        ELSE ({alpha_num} * x.vm + {rest} * acc.prev)
                               div {alpha_den} END,
                   false),
                 acc -> acc.a)"""
        ),
    )
    out = folded.select(
        *keys, F.posexplode(F.arrays_zip("xs", "emas")).alias("i", "z")
    )
    return out.select(
        *keys,
        *[
            F.col(f"z.xs.o{i}").alias(c) for i, c in enumerate(order_cols)
        ],
        F.col("z.xs.v").alias(value_col),
        F.col("z.emas").alias(out_col),
    )


def autocorr_lag1(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key lag-1 autocorrelation — the drift/seasonality screen next
    to :func:`rolling_zscore` (white noise ~0, trending series ~1,
    alternating load ~-1).

    Determinism: values snap to integer micro-units and ALL five moments
    (sums of x, y, x^2, y^2, x*y over the (x_t, x_{t-1}) pairs) are
    EXACT decimal(38,0) sums — order-independent, so the only float math
    is the final Pearson combination of six exact scalars, identical in
    any engine. Returns ``partition_cols + (n_pairs, corr)`` with corr
    rounded to 6 decimals, NULL when fewer than 2 pairs or zero
    variance.

    Plan at 100 TB: one lag window per key (single sort within the
    key's partition), one hash aggregate — no self-join, no collect.
    """
    keys = partition_cols or []
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    xm = (
        F.round(F.col(value_col).cast("double") * F.lit(1_000_000.0))
        .cast("decimal(18,0)")
    )
    paired = (
        df.withColumn("__x", xm)
        .withColumn("__y", F.lag("__x").over(w))
        .where(F.col("__y").isNotNull())
    )
    agg = paired.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when(
        (F.col("n_pairs") >= 2) & (vx > 0) & (vy > 0),
        F.round((n * sxy - sx * sy) / F.sqrt(vx * vy), 6),
    )
    return agg.select(*keys, "n_pairs", corr.alias("corr"))
