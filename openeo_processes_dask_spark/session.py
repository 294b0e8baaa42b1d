"""Session factory with the confs this engine is designed against.

These are the knobs SURVEY.md §7 and the 100 TB design rules assume; tests
and bench use the same set so local behavior predicts cluster behavior.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession


def make_session(
    master: str = "local[*]",
    app_name: str = "openeo-processes-spark",
    shuffle_partitions: Optional[int] = None,
    driver_memory: Optional[str] = None,
) -> SparkSession:
    """SparkSession tuned for this engine:

    - AQE on, with partition coalescing and skew-join splitting: cube dims
      are often skewed (one hot band / one dense day) and AQE's runtime
      re-planning is the first line of defense before manual salting.
    - ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster
      set it near 2-3× total executor cores (AQE coalesces the excess).
    - ``maxPartitionBytes`` at the 128 MB default: with the long-format
      (5-column) cube a scan partition holds ~5M cells — well inside
      executor memory even with per-cell expression state.
    - Arrow enabled for every pandas-UDF boundary; timezone pinned UTC so
      calendar bucketing is reproducible.
    """
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if driver_memory:
        b = b.config("spark.driver.memory", driver_memory)
    return b.getOrCreate()


def repartition_spatial(cube, num_partitions: Optional[int] = None):
    """Range-partition a cube by (x, y) — the long-format analogue of the
    reference's dask spatial chunks (SURVEY.md §1.5). Co-locates spatial
    neighborhoods so mask_polygon / apply_kernel tiles / aggregate_spatial
    touch few partitions, and makes subsequent bbox filters align with
    partition boundaries."""
    x_dim, y_dim = cube.meta.x_dim, cube.meta.y_dim
    if x_dim is None or y_dim is None:
        raise ValueError("repartition_spatial needs spatial dims")
    if num_partitions:
        df = cube.df.repartitionByRange(num_partitions, x_dim, y_dim)
    else:
        df = cube.df.repartitionByRange(x_dim, y_dim)
    return cube.with_df(df)


def repartition_temporal(cube, num_partitions: Optional[int] = None):
    """Pre-shape for window ops ALONG time (cumulatives, interpolation):
    range-partition by the non-temporal dims — the window partition keys —
    so each per-pixel time series lands in one partition and the window
    exchange becomes a no-op reuse."""
    tdims = cube.meta.temporal_dims
    if not tdims:
        raise ValueError("repartition_temporal needs a temporal dim")
    if num_partitions:
        df = cube.df.repartitionByRange(num_partitions, *cube.other_dims(*tdims))
    else:
        df = cube.df.repartitionByRange(*cube.other_dims(*tdims))
    return cube.with_df(df)


def salted_reduce(cube, reducer: str, dimension: str, n_salts: int = 16):
    """Skew-resistant two-stage reduce: groupBy(keep + salt) partial
    aggregate, then combine per keep-group.

    Spark's hash aggregate already partial-aggregates map-side, so for
    algebraic reducers over *evenly loaded* keys the plain
    ``reduce_dimension`` is optimal. Reach for this when one group
    dominates (a hot band, one dense day covering half of 100 TB): the
    salt spreads the hot group's final-stage state across ``n_salts``
    reducers, at the cost of one extra (tiny: |groups|·n_salts rows)
    shuffle. Only DECOMPOSABLE reducers are legal — median/quantiles have
    no exact partial form and raise.

    The salt is ``rand()``-assigned; any assignment yields the same result
    because stage two is an exact combine (variance via the (n, Σx, Σx²)
    moments form).
    """
    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.cube import DataCube

    dim = cube.assert_dim(dimension)
    keep = cube.other_dims(dim)
    v = F.col(cube.value_col)
    out_name = cube.value_col

    partials: list
    if reducer in ("sum", "min", "max"):
        partials = [getattr(F, reducer)(v).alias("p0")]
        final = getattr(F, reducer)("p0")
    elif reducer == "count":
        partials = [F.count(v).alias("p0")]
        final = F.sum("p0")
    elif reducer == "mean":
        partials = [F.sum(v).alias("p0"), F.count(v).alias("p1")]
        final = F.sum("p0") / F.sum("p1")
    elif reducer in ("variance", "sd"):
        partials = [
            F.count(v).alias("p0"),
            F.sum(v).alias("p1"),
            F.sum(v * v).alias("p2"),
        ]
        n, s, s2 = F.sum("p0"), F.sum("p1"), F.sum("p2")
        # try_divide: a group with exactly one valid value must yield NULL
        # like var_samp, not raise DIVIDE_BY_ZERO under ANSI mode (ADVICE
        # r01; same pattern as windows.py rolling variance).
        final = F.try_divide(s2 - F.try_divide(s * s, n), n - F.lit(1))
        if reducer == "sd":
            final = F.sqrt(final)
    elif reducer == "any":
        partials = [F.bool_or(v.cast("boolean")).alias("p0")]
        final = F.bool_or("p0")
    elif reducer == "all":
        partials = [F.bool_and(v.cast("boolean")).alias("p0")]
        final = F.bool_and("p0")
    else:
        raise ValueError(
            f"Reducer {reducer!r} has no exact partial form — use "
            "reduce_dimension (median/quantiles must see whole groups)"
        )

    salt = F.floor(F.rand(seed=42) * n_salts).alias("__salt__")
    stage1 = cube.df.groupBy(*keep, salt).agg(*partials)
    stage2 = stage1.groupBy(*keep).agg(final.alias(out_name))
    roles = {d: cube.meta.role_of(d) for d in keep}
    return DataCube(
        stage2, dims=keep, value_col=out_name, roles=roles,
        crs=cube.meta.crs, attrs=cube.meta.attrs,
    )


def skew_split_join(
    left,
    right,
    key: str,
    hot_keys: list | None = None,
    hot_threshold: int | None = None,
    how: str = "inner",
):
    """Skew-resistant equi-join: split ``left`` on its HOT keys (given
    explicitly, or discovered by one count aggregate against
    ``hot_threshold``), join the hot slice against the matching sliver of
    ``right`` with an explicit broadcast, shuffle-join the cold
    remainder normally, and union. Result set is identical to the plain
    join (gate-checked); only the physical strategy changes.

    Why not just AQE: adaptive skew-join splits oversized SHUFFLE
    partitions, which helps when both sides shuffle, but a key carrying
    half the table still funnels through one reducer lineage and the
    right side still shuffles in full. Pinning the hot keys to a
    broadcast join removes the hot key's shuffle entirely on both sides
    — the classic split the brief calls "salting for skew"'s join-side
    twin.

    ``hot_keys`` discovery is ONE aggregate over the key column
    (key-cardinality-sized, then filtered to the few hot ones — driver
    traffic is the hot-key list only). Supported ``how``: inner and
    left joins (semantics preserved per-slice because slices partition
    the LEFT rows by key).
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"unsupported how={how!r} for skew_split_join")
    if (hot_keys is None) == (hot_threshold is None):
        raise ValueError("pass exactly one of hot_keys / hot_threshold")
    if hot_keys is None:
        hot_keys = [
            r[key]
            for r in left.groupBy(key)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") >= hot_threshold)
            .select(key)
            .collect()
        ]
    if not hot_keys:
        return left.join(right, key, how)
    hot_left = left.where(F.col(key).isin(hot_keys))
    # NULL keys must stay in the cold slice (a bare ~isin is NULL for
    # them, silently dropping left-join rows)
    cold_left = left.where(
        F.col(key).isNull() | ~F.col(key).isin(hot_keys)
    )
    hot_right = right.where(F.col(key).isin(hot_keys))
    hot = hot_left.join(F.broadcast(hot_right), key, how)
    cold = cold_left.join(right, key, how)
    return hot.unionByName(cold)
