"""Scalable interval (range) join: match point events to arbitrary
[start, end] intervals WITHOUT an equi-key.

Spark's planner turns a bare ``ts BETWEEN start AND end`` join into a
BroadcastNestedLoopJoin (O(events x intervals) comparisons) — fine for a
hundred intervals, fatal for a million. The classic fix (used by every
distributed temporal-join engine) is bucketization: quantize time into
fixed-width buckets, explode each interval onto every bucket it covers,
and equi-join on the bucket id with the BETWEEN as a residual filter.
Each event carries exactly ONE bucket, so a qualifying (event, interval)
pair meets in exactly one bucket — no post-join dedup is needed.

Shuffle analysis at 100 TB: the join is a plain hash equi-join on an
integer bucket key — shuffles (event_bucket) and (interval_bucket x
covered buckets) rows, never the cross product. Bucket width trades
replication of long intervals against bucket skew; pick it near the
median interval length. No reference counterpart (the reference's only
temporal join is resample_cube_temporal's as-of nearest-label match,
cubes/resample.py) — this is the general range-predicate form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    extra_on: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each event row to every interval row with
    ``start <= ts <= end`` (inclusive both ends).

    Returns the intervals columns + events columns (name collisions on
    the join keys are the caller's to manage). ``extra_on`` adds an
    optional residual predicate (e.g. same user). ``how='left_interval'``
    keeps unmatched intervals with NULL event columns (implemented as a
    second anti-join pass so the bucketized inner join stays a pure
    equi-join).
    """
    if how not in ("inner", "left_interval"):
        raise ValueError(f"interval_join: unsupported how={how!r}")
    b = F.lit(bucket_seconds)
    ev = events.withColumn(
        "__b", (F.unix_timestamp(F.col(ts_col)) / b).cast("bigint")
    )
    s_b = (F.unix_timestamp(F.col(start_col)) / b).cast("bigint")
    e_b = (F.unix_timestamp(F.col(end_col)) / b).cast("bigint")
    iv = intervals.withColumn(
        "__b", F.explode(F.sequence(s_b, e_b))
    )
    cond = (
        (ev["__b"] == iv["__b"])
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col))
    )
    if extra_on is not None:
        cond = cond & extra_on
    joined = iv.join(ev, cond, "inner").drop("__b")
    if how == "inner":
        return joined
    matched = joined.select(*intervals.columns).distinct().alias("__m")
    iv_all = intervals.alias("__iv")
    # null-safe anti-join: an interval carrying a NULL in any payload
    # column must still count as matched (bare column equality would
    # emit it again as unmatched)
    anti_cond = None
    for c in intervals.columns:
        term = F.col(f"__iv.{c}").eqNullSafe(F.col(f"__m.{c}"))
        anti_cond = term if anti_cond is None else (anti_cond & term)
    missing = iv_all.join(matched, anti_cond, "left_anti").select(
        *[F.col(f"__iv.{c}") for c in intervals.columns]
    )
    for c in events.columns:
        if c not in missing.columns:
            missing = missing.withColumn(
                c, F.lit(None).cast(dict(ev.dtypes)[c])
            )
    return joined.unionByName(missing.select(*joined.columns))
