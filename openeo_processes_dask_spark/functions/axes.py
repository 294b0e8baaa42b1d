"""Bounded axis-geometry probes shared by resample and the storage sinks.

The long-format cube keeps no eager ``coords``; any operator that needs
an axis's (origin, step) must learn it from the data. The naive way —
collect every distinct label to the driver — is the clearest 100×-scale
driver OOM in the codebase's history (a continental-resolution raster
axis has 1e6+ labels; see the reference's own scalability failure note,
``docs/scalability/aggregate-large-spatial-extents.md``). This module is
the one place that inference lives, and it is bounded by construction:
a REGULAR axis costs two 1-row aggregates and zero label transfer at
ANY resolution.
"""

from __future__ import annotations

from pyspark.sql import functions as F

#: ceiling on any driver-side label collect a caller may fall back to
#: for an IRREGULAR axis — a regular axis NEVER collects labels
AXIS_COLLECT_CAP = 100_000


def probe_regular_axis(df, col):
    """``(origin, step, n, regular)`` of a numeric axis WITHOUT
    collecting its labels.

    Two metadata-free aggregates: min/max/countDistinct proposes the
    regular-grid step ``(max - min) / (n - 1)``; a second aggregate
    verifies every label sits on that lattice (max distance to the
    nearest grid point, in step units). When it does (``regular=True``),
    the index ``round((label - origin) / step)`` is collision-free by
    pigeonhole: the lattice has exactly ``n`` points in ``[min, max]``
    and all ``n`` distinct labels land within tolerance (< 0.5 step) of
    one, so each point receives exactly one label.

    The tolerance scales with axis length (ADVICE r8): ``(val - lo) /
    step`` reaches magnitude ``n``, so plain float64 rounding noise on a
    truly regular axis grows like ``n * eps`` — a fixed 1e-6 would
    misclassify a 1e8-label regular axis as irregular.

    NULL labels are ignored (they cannot carry grid geometry; callers
    that derive an index column map them to NULL, matching the previous
    behavior of every call site).
    """
    head = df.agg(
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
        F.countDistinct(col).alias("n"),
    ).collect()[0]
    n = int(head["n"])
    if n == 0:
        return 0.0, 1.0, 0, True
    lo = head["lo"]
    if n == 1:
        return lo, 1.0, 1, True
    step = (head["hi"] - lo) / (n - 1)
    k = (F.col(col) - F.lit(lo)) / F.lit(step)
    off = df.agg(F.max(F.abs(k - F.round(k, 0))).alias("m")).collect()[0]["m"]
    tol = max(1e-6, float(n) * 1e-11)
    if off is not None and off <= tol:
        return lo, step, n, True
    return lo, step, n, False


def collect_irregular_axis(df, col, n: int, what: str = "Axis"):
    """Driver-side fallback for an IRREGULAR axis: sorted distinct
    labels + minimum positive spacing — capped at
    :data:`AXIS_COLLECT_CAP` labels, beyond which
    :class:`~openeo_processes_dask_spark.exceptions.IrregularAxisTooLarge`
    asks for an explicit target grid instead of silently OOMing the
    driver. ``n`` is the distinct count the caller already probed."""
    if n > AXIS_COLLECT_CAP:
        from openeo_processes_dask_spark.exceptions import (
            IrregularAxisTooLarge,
        )

        raise IrregularAxisTooLarge(
            f"{what} '{col}' is irregular (labels do not sit on a uniform "
            f"grid) and has {n} distinct labels — more than the "
            f"{AXIS_COLLECT_CAP} the driver-side fallback allows. "
            f"Provide an explicit target grid (resolution/projection) "
            f"instead of inferring one from the axis."
        )
    vals = sorted(
        r[0] for r in df.select(col).distinct().collect() if r[0] is not None
    )
    diffs = [b - a for a, b in zip(vals, vals[1:])]
    step = min((d for d in diffs if d > 0), default=1.0)
    return vals, step
