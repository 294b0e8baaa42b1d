"""Resampling (reference: cubes/resample.py — SURVEY.md §2.10).

Key insight for the Spark mapping: nearest-neighbor alignment is a
label-space problem — build the (source label → target label) mapping
from the two distinct label sets, then apply it to the data with ONE
broadcast join. No as-of window over the full data, no per-row search.
The mapping itself is the bucketed merge of functions/asof.py (O(m + n),
no label×label crossJoin), so even event-grade axes with millions of
distinct timestamps stay linear.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.cube import DataCube
from openeo_processes_dask_spark.functions.reducers import resolve_reducer
from openeo_processes_dask_spark.operators.filters import _single_temporal_dim


@process
def resample_cube_temporal(
    data: DataCube,
    target: DataCube,
    dimension: Optional[str] = None,
    valid_within: Optional[int] = None,
) -> DataCube:
    """Nearest-timestamp alignment of ``data`` onto ``target``'s time labels
    (reference: cubes/resample.py:183-222) — the as-of join.

    Label-space plan: the bucketed nearest-label merge
    (:func:`functions.asof.nearest_label_map` — O(m + n), no label×label
    crossJoin/BNLJ, so event-grade axes with 10⁶+ distinct timestamps
    stay linear) picks the best source per target label; the tiny
    mapping is then broadcast-joined back onto the data and relabeled.
    ``valid_within`` days drops mappings that are too far (their target
    labels then simply produce no rows, the long-format encoding of the
    reference's NaN slices).
    """
    from openeo_processes_dask_spark.functions.asof import nearest_label_map

    dim = _single_temporal_dim(data, dimension)
    tdim = _single_temporal_dim(target, dimension if dimension in target.meta.dims else None)

    # cast: parquet micros columns load as TIMESTAMP_NTZ and unix_micros
    # only takes TIMESTAMP (session tz is pinned to UTC, so the cast is a
    # no-op on the value)
    tgt_labels = target.df.select(
        F.col(tdim).alias("__l__"),
        F.unix_micros(F.col(tdim).cast("timestamp")).alias("__lv__"),
    ).distinct()
    src_labels = data.df.select(
        F.col(dim).alias("__r__"),
        F.unix_micros(F.col(dim).cast("timestamp")).alias("__rv__"),
    ).distinct()
    best = nearest_label_map(tgt_labels, src_labels)
    if valid_within is not None:
        best = best.where(
            F.col("__dist__") <= int(valid_within) * 86_400_000_000
        )
    best = best.select(
        F.col("__l__").alias("__tgt__"), F.col("__r__").alias("__src__")
    )
    mapped = data.df.join(
        F.broadcast(best), data.df[dim] == F.col("__src__"), "inner"
    )
    out = (
        mapped.withColumn(dim, F.col("__tgt__"))
        .drop("__src__", "__tgt__")
        .select(*data.meta.dims, data.value_col)
    )
    return data.with_df(out)


def _grid_snap(col, origin: float, step: float):
    """Nearest grid-center coordinate: origin + (round((v-origin)/step))*step."""
    return (
        F.round((col - F.lit(origin)) / F.lit(step)) * F.lit(step) + F.lit(origin)
    )


@process
def resample_spatial(
    data: DataCube,
    resolution: float = 0.0,
    projection=None,
    method: str = "mean",
    align: str = "upper-left",
) -> DataCube:
    """Regrid to a target resolution (reference: cubes/resample.py:39-113).

    Long-format regridding = snap (x, y) to the target grid + one hash
    aggregate per method — a single shuffle, no warping machinery.
    CRS warps for the EPSG:4326<->3857<->UTM pairs run as pure JVM
    expressions (functions/crs.py) composed in front of the snap, so the
    whole warp + regrid is one codegen'd stage + one shuffle; any other
    CRS pair goes through the runtime-detected pyproj lane (Arrow-batched
    pandas UDF) when the library is deployed, and raises the documented
    NotImplementedError otherwise. ``method='near'`` picks the
    value whose source pixel is closest to the grid center (min_by
    distance); aggregating methods reduce all source pixels in the target
    cell.
    """
    if not resolution and projection is None:
        return data
    x_dim, y_dim = data.meta.x_dim, data.meta.y_dim
    if x_dim is None or y_dim is None:
        raise ValueError("resample_spatial needs spatial dims")
    if projection is not None:
        from openeo_processes_dask_spark.functions import crs as _crs

        src = data.meta.crs or "EPSG:4326"
        nx, ny = _crs.transform_xy_cols(
            F.col(x_dim), F.col(y_dim), src, projection
        )
        data = DataCube(
            data.df.withColumn(x_dim, nx).withColumn(y_dim, ny),
            dims=data.meta.dims,
            value_col=data.value_col,
            roles=dict(data.meta.roles),
            crs=_crs.normalize_crs(projection),
            attrs=data.meta.attrs,
        )
        if not resolution:
            return data
    if method == "bilinear" or method in _CONV_KERNELS:
        return _resample_convolved(data, float(resolution), method)
    keep = data.other_dims(x_dim, y_dim)
    step = float(resolution)
    new_x = _grid_snap(F.col(x_dim), 0.0, step).alias(x_dim)
    new_y = _grid_snap(F.col(y_dim), 0.0, step).alias(y_dim)
    if method == "near":
        dist = F.pow(F.col(x_dim) - _grid_snap(F.col(x_dim), 0.0, step), 2) + F.pow(
            F.col(y_dim) - _grid_snap(F.col(y_dim), 0.0, step), 2
        )
        df = (
            data.df.withColumn("__dist__", dist)
            .groupBy(*keep, new_x, new_y)
            .agg(
                F.min_by(
                    data.value_col, F.struct("__dist__", x_dim, y_dim)
                ).alias(data.value_col)
            )
        )
    elif method == "mode":
        # most frequent value per target cell, deterministic tie-break on
        # the smallest value (Spark's F.mode picks arbitrarily on ties)
        v = data.value_col
        counts = data.df.groupBy(*keep, new_x, new_y, v).agg(
            F.count(F.lit(1)).alias("__n__")
        )
        df = counts.groupBy(*keep, x_dim, y_dim).agg(
            F.max_by(v, F.struct(F.col("__n__"), -F.col(v))).alias(v)
        )
    elif method == "rms":
        v = F.col(data.value_col)
        df = data.df.groupBy(*keep, new_x, new_y).agg(
            F.sqrt(F.avg(v * v)).alias(data.value_col)
        )
    else:
        # reference resample_methods_list (cubes/resample.py:23-36) plus the
        # engine's aggregate extras; unknown names raise like the reference
        alias = {"q1": "quantiles", "q3": "quantiles", "med": "median",
                 "average": "mean"}
        try:
            builder = resolve_reducer(alias.get(method, method))
        except KeyError:
            raise ValueError(
                f'Selected resampling method "{method}" is not available! '
                "Please select one of [near, bilinear, cubic, cubicspline, "
                "lanczos, gauss, average, mode, max, min, med, q1, q3, sum, rms, "
                "mean, or any registered reducer]"
            )
        kwargs = {}
        if method == "q1":
            kwargs["probabilities"] = [0.25]
        elif method == "q3":
            kwargs["probabilities"] = [0.75]
        value = builder(F.col(data.value_col), **kwargs).alias(data.value_col)
        df = data.df.groupBy(*keep, new_x, new_y).agg(value)
    return data.with_df(df.select(*data.meta.dims, data.value_col))


@process
def resample_cube_spatial(
    data: DataCube, target: DataCube, method: str = "near"
) -> DataCube:
    """Regrid ``data`` onto ``target``'s exact (x, y) labels
    (reference: cubes/resample.py:116-180). Per-axis nearest mapping built
    in label space via the bucketed nearest-label merge
    (:func:`functions.asof.nearest_label_map` — O(m + n) per axis, no
    label×label crossJoin/BNLJ), broadcast-joined, then reduced per
    target cell for aggregate methods."""
    from openeo_processes_dask_spark.functions.asof import nearest_label_map

    x_dim, y_dim = data.meta.x_dim, data.meta.y_dim
    tx, ty = target.meta.x_dim, target.meta.y_dim
    if None in (x_dim, y_dim, tx, ty):
        raise ValueError("both cubes need spatial dims")

    def _labels(df, col, l_name, v_name):
        return df.select(
            F.col(col).alias(l_name), F.col(col).alias(v_name)
        ).distinct()

    def axis_map(src_df, src_col, tgt_df, tgt_col):
        # each SOURCE label -> nearest target label (aggregate methods)
        m = nearest_label_map(
            _labels(src_df, src_col, "__l__", "__lv__"),
            _labels(tgt_df, tgt_col, "__r__", "__rv__"),
        )
        return m.select(
            F.col("__l__").alias("__s__"), F.col("__r__").alias("__t__")
        )

    if method == "near":
        # Nearest regridding maps TARGET→nearest-SOURCE per axis (one source
        # per target label — deterministic tie-break, every target
        # label covered, matching the reference's nearest reindex;
        # source→target + F.first would both drop uncovered targets and
        # collapse colliding sources nondeterministically). A source label
        # nearest to several targets fans out (upsampling), so no final
        # aggregate is needed at all.
        def near_map(tgt_df, tgt_col, src_df, src_col):
            m = nearest_label_map(
                _labels(tgt_df, tgt_col, "__l__", "__lv__"),
                _labels(src_df, src_col, "__r__", "__rv__"),
            )
            return m.select(
                F.col("__l__").alias("__t__"), F.col("__r__").alias("__s__")
            )

        xmap = near_map(target.df, tx, data.df, x_dim)
        ymap = near_map(target.df, ty, data.df, y_dim)
        df = (
            data.df.join(F.broadcast(xmap), data.df[x_dim] == xmap["__s__"])
            .withColumn(x_dim, xmap["__t__"])
            .drop("__s__", "__t__")
        )
        df = (
            df.join(F.broadcast(ymap), df[y_dim] == ymap["__s__"])
            .withColumn(y_dim, ymap["__t__"])
            .drop("__s__", "__t__")
        )
        return data.with_df(df.select(*data.meta.dims, data.value_col))

    xmap = axis_map(data.df, x_dim, target.df, tx)
    ymap = axis_map(data.df, y_dim, target.df, ty)
    df = (
        data.df.join(F.broadcast(xmap), data.df[x_dim] == xmap["__s__"])
        .withColumn(x_dim, xmap["__t__"])
        .drop("__s__", "__t__")
    )
    df = (
        df.join(F.broadcast(ymap), df[y_dim] == ymap["__s__"])
        .withColumn(y_dim, ymap["__t__"])
        .drop("__s__", "__t__")
    )
    keep = data.other_dims(x_dim, y_dim)
    builder = resolve_reducer({"med": "median"}.get(method, method))
    value = builder(F.col(data.value_col)).alias(data.value_col)
    out = df.groupBy(*keep, x_dim, y_dim).agg(value)
    return data.with_df(out.select(*data.meta.dims, data.value_col))


def _axis_geometry(df, col):
    """(origin, step, count) of an axis WITHOUT collecting its labels
    (VERDICT r7 #1: the previous distinct-collect was the clearest
    driver OOM at continental resolution, 1e6+ labels per axis).

    Delegates to the shared bounded probe
    (:func:`openeo_processes_dask_spark.functions.axes.probe_regular_axis`
    — two 1-row aggregates, zero label transfer for any REGULAR axis,
    which is every raster the resamplers produce or consume). Only an
    IRREGULAR axis (gaps or uneven spacing, where the true minimum
    spacing cannot be derived from (min, max, n)) falls back to the old
    distinct-collect, capped at
    :data:`~openeo_processes_dask_spark.functions.axes.AXIS_COLLECT_CAP`
    labels — beyond it :class:`IrregularAxisTooLarge` asks for an
    explicit target grid instead of silently OOMing the driver."""
    from openeo_processes_dask_spark.functions.axes import (
        collect_irregular_axis,
        probe_regular_axis,
    )

    lo, step, n, regular = probe_regular_axis(df, col)
    if regular:
        return lo, step, n
    vals, step = collect_irregular_axis(df, col, n)
    return vals[0], step, n


def _catmull_rom_weight(d):
    """Keys cubic-convolution kernel (a = -0.5), d = |tap - frac| ∈ [0, 2]."""
    w1 = (F.lit(1.5) * d - F.lit(2.5)) * d * d + F.lit(1.0)
    w2 = ((F.lit(-0.5) * d + F.lit(2.5)) * d - F.lit(4.0)) * d + F.lit(2.0)
    return F.when(d <= 1.0, w1).otherwise(
        F.when(d < 2.0, w2).otherwise(F.lit(0.0))
    )


def _bspline_weight(d):
    """Cubic B-spline smoothing kernel ('cubicspline' in odc/GDAL)."""
    w1 = F.lit(2.0 / 3.0) - d * d + d * d * d * F.lit(0.5)
    p = F.lit(2.0) - d
    w2 = p * p * p / F.lit(6.0)
    return F.when(d <= 1.0, w1).otherwise(
        F.when(d < 2.0, w2).otherwise(F.lit(0.0))
    )


_PI = 3.141592653589793


def _lanczos_weight(d):
    """Lanczos a=3 windowed sinc (odc/GDAL 'lanczos')."""
    main = (
        F.lit(3.0) * F.sin(F.lit(_PI) * d) * F.sin(F.lit(_PI) * d / F.lit(3.0))
    ) / (F.lit(_PI * _PI) * d * d)
    return F.when(d == 0.0, F.lit(1.0)).otherwise(
        F.when(d < 3.0, main).otherwise(F.lit(0.0))
    )


def _gauss_weight(d):
    """Gaussian smoothing kernel (odc/GDAL 'gauss'): σ = 1 source cell,
    truncated at |d| ≥ 3. The normalization constant cancels in the
    weighted mean's renormalization, so only exp(-d²/2) matters."""
    return F.when(d < 3.0, F.exp(-d * d / F.lit(2.0))).otherwise(F.lit(0.0))


# kernel -> (tap offsets, weight builder over d = |tap - frac|)
_CONV_KERNELS = {
    "cubic": ((-1, 0, 1, 2), _catmull_rom_weight),
    "cubicspline": ((-1, 0, 1, 2), _bspline_weight),
    "lanczos": ((-2, -1, 0, 1, 2, 3), _lanczos_weight),
    "gauss": ((-2, -1, 0, 1, 2, 3), _gauss_weight),
}


def _resample_convolved(
    data: DataCube, resolution: float, kernel: str
) -> DataCube:
    """Bilinear / bicubic warp in long format (reference: cubes/resample.py:
    23-36 lists both among odc.reproject's methods).

    SURVEY.md §7 ranks neighborhood-dependent resampling among the hard
    parts because a dense-array engine needs tiled halo exchange. The
    relational formulation needs none: build a SEPARABLE mapping — one
    per-axis tap table (target coord -> tap source coord + 1-D weight),
    cross the axes (2-D weight = product), equi-join onto the cube on
    (x, y), and take the weighted mean per target cell and slice. One join
    + one shuffle, any cube size; missing neighbors (sparse cubes, edges)
    renormalize by the sum of present weights. The mapping is generated
    DISTRIBUTIVELY (spark.range per axis + tap explode): at a 100k×100k
    target grid a driver-side loop would be 10^10 iterations on one core.
    Bilinear = taps (0, 1) with linear weights; cubic/cubicspline = taps
    (-1..2) with Catmull-Rom / B-spline kernels; lanczos = taps (-2..3)
    with the a=3 windowed sinc — all with edge-clamped indices (negative
    lobes renormalize when every tap is present). Assumes a regular source
    grid (same assumption the reference's raster warp makes)."""
    x_dim, y_dim = data.meta.x_dim, data.meta.y_dim
    keep = data.other_dims(x_dim, y_dim)
    v = data.value_col
    spark = data.df.sparkSession

    ox, dx, nx = _axis_geometry(data.df, x_dim)
    oy, dy, ny = _axis_geometry(data.df, y_dim)
    max_x, max_y = ox + (nx - 1) * dx, oy + (ny - 1) * dy

    # targets at ox + k*res (multiplied, never accumulated — float
    # accumulation would drift off the oracle's k*res arithmetic)
    kx = int((max_x - ox) / resolution + 1e-9) + 1
    ky = int((max_y - oy) / resolution + 1e-9) + 1

    def axis_map(origin, step, n, count, t_col, s_col, w_col):
        g = (F.col(t_col) - F.lit(origin)) / F.lit(step)
        i0 = (
            F.least(F.floor(g), F.lit(n - 2)) if n > 1 else F.lit(0)
        ).cast("long")
        base = (
            spark.range(count)
            .select(
                (
                    F.lit(origin) + F.col("id").cast("double") * F.lit(resolution)
                ).alias(t_col)
            )
            .withColumn("__i0__", i0)
            .withColumn("__f__", g - F.col("__i0__").cast("double"))
        )
        f = F.col("__f__")
        taps = []
        if kernel == "bilinear":
            tap_ws = [(0, F.lit(1.0) - f), (1, f)]
        else:
            offsets, weight_fn = _CONV_KERNELS[kernel]
            tap_ws = [
                (di, weight_fn(F.abs(F.lit(float(di)) - f)))
                for di in offsets
            ]
        for di, w in tap_ws:
            idx = F.col("__i0__") + F.lit(di)
            if kernel != "bilinear":  # clamped-edge extension
                idx = F.greatest(F.lit(0), F.least(idx, F.lit(n - 1)))
            taps.append(F.struct(idx.alias("i"), w.alias("w")))
        return (
            base.select(t_col, F.explode(F.array(*taps)).alias("c"))
            .where(F.col("c.w") != 0)
            .select(
                t_col,
                (
                    F.lit(origin) + F.col("c.i").cast("double") * F.lit(step)
                ).alias(s_col),
                F.col("c.w").alias(w_col),
            )
        )

    xmap = axis_map(ox, dx, nx, kx, "tx", "sx", "wxv")
    ymap = axis_map(oy, dy, ny, ky, "ty", "sy", "wyv")
    mapping = xmap.crossJoin(ymap).select(
        "tx", "ty", "sx", "sy", (F.col("wxv") * F.col("wyv")).alias("w")
    )
    # No forced broadcast: AQE broadcasts the mapping when its runtime size
    # is small (the common case); a 100k×100k grid's 4·10^10-row mapping
    # instead takes the shuffled equi-join path rather than OOMing.
    joined = data.df.join(
        mapping,
        (F.col(x_dim) == F.col("sx")) & (F.col(y_dim) == F.col("sy")),
    )
    out = (
        joined.groupBy(*keep, "tx", "ty")
        .agg(
            (
                F.sum(F.col("w") * F.col(v))
                / F.sum(F.when(F.col(v).isNotNull(), F.col("w")))
            ).alias(v)
        )
        .withColumnRenamed("tx", x_dim)
        .withColumnRenamed("ty", y_dim)
        .select(*data.meta.dims, v)
    )
    return data.with_df(out)
