"""Neighborhood operators: 2-D convolution and rolling reduce
(reference: cubes/apply.py:131-182, apply_neighborhood_intertwin.py —
SURVEY.md §2.5).

``apply_kernel`` needs dense 2-D blocks — the one place the long format
pivots: groupBy(t, band) → Arrow batch → pandas pivot → NumPy
shift-and-add convolution → melt. Each group is one (t, band) slice, so
parallelism = |t|×|band| and executor memory holds one x×y grid at a time.
(At 100 TB with huge single slices you'd tile x/y with halos — the groupBy
key becomes (t, band, tile) and each tile carries a k-wide halo; noted in
the docstring as the scale path, not needed at these fixture sizes.)

No scipy in this container: the convolution is a pure-NumPy shift-and-add
over kernel taps — exact same result as scipy.ndimage.convolve for the
supported border modes.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.cube import DataCube
from openeo_processes_dask_spark.functions.reducers import resolve_reducer

_PAD_MODES = {
    "replicate": "edge",
    "reflect": "reflect",
    "reflect_pixel": "symmetric",
    "wrap": "wrap",
}


def convolve2d(grid: np.ndarray, kernel: np.ndarray, border="0") -> np.ndarray:
    """scipy-free 2-D convolution: pad, then sum shifted views × kernel
    taps (O(k²) vectorized adds — fast for the small kernels OpenEO uses).
    ``border``: replicate | reflect | reflect_pixel | wrap | numeric
    constant (reference border-mode table, cubes/apply.py:140-154)."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    if str(border) in _PAD_MODES:
        padded = np.pad(grid, ((ph, ph), (pw, pw)), mode=_PAD_MODES[str(border)])
    else:
        padded = np.pad(
            grid,
            ((ph, ph), (pw, pw)),
            mode="constant",
            constant_values=float(border),
        )
    out = np.zeros_like(grid, dtype="float64")
    h, w = grid.shape
    # convolution flips the kernel (matches scipy.ndimage.convolve)
    kf = kernel[::-1, ::-1]
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * padded[i : i + h, j : j + w]
    return out


@process
def apply_kernel(
    data: DataCube,
    kernel: Sequence[Sequence[float]],
    factor: float = 1.0,
    border="0",
    replace_invalid: float = 0.0,
    tile_size: int = 0,
) -> DataCube:
    """2-D spatial convolution per (t, band) slice
    (reference: cubes/apply.py:131-182). NaN cells are replaced by
    ``replace_invalid`` before convolving (reference :160-162).

    ``tile_size`` > 0 activates the scale path: each slice is cut into
    tile_size×tile_size POSITION tiles with a kernel-radius halo — rows near
    a tile boundary are duplicated into the neighbor tile (the classic halo
    exchange, expressed as an explode over tile assignments), so each
    pandas group holds one bounded tile instead of the whole slice. With
    tile_size=0 one group = one (t, band) slice — fine when slices fit an
    executor, which is the fixture regime.

    Position vs value: tiling must split on *grid positions* (label ranks),
    not raw coordinates — float coords have irregular spacing. Ranks come
    from the distinct label sets (metadata-sized) broadcast back.
    """
    x_dim, y_dim = data.meta.x_dim, data.meta.y_dim
    if x_dim is None or y_dim is None:
        raise ValueError("apply_kernel needs spatial dims")
    keep = data.other_dims(x_dim, y_dim)
    karr = np.asarray(kernel, dtype="float64")
    v = data.value_col
    df = data.df
    schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}"
        for c in [*keep, x_dim, y_dim, v]
    )
    fac, rinv, bord = float(factor), float(replace_invalid), border

    def conv_block(pdf: pd.DataFrame) -> pd.DataFrame:
        grid = pdf.pivot_table(
            index=y_dim, columns=x_dim, values=v, aggfunc="first", dropna=False
        )
        arr = grid.to_numpy(dtype="float64")
        arr = np.where(np.isnan(arr), rinv, arr)
        conv = convolve2d(arr, karr, border=bord) * fac
        out = pd.DataFrame(
            {
                y_dim: np.repeat(grid.index.values, len(grid.columns)),
                x_dim: np.tile(grid.columns.values, len(grid.index)),
                v: conv.ravel(),
            }
        )
        for k in keep:
            out.insert(0, k, pdf[k].iloc[0])
        return out[[*keep, x_dim, y_dim, v]]

    if not tile_size:
        if keep:
            out_df = df.groupBy(*keep).applyInPandas(conv_block, schema=schema)
        else:
            out_df = df.groupBy(F.lit(1).alias("__g__")).applyInPandas(
                conv_block, schema=schema
            )
        return data.with_df(out_df.select(*data.meta.dims, v))

    # ---- tiled + halo path ------------------------------------------
    halo_y = karr.shape[0] // 2
    halo_x = karr.shape[1] // 2
    # label -> rank maps (metadata-sized, broadcast)
    from pyspark.sql import Window

    def rank_map(dim):
        w = Window.orderBy(dim)
        return (
            df.select(dim)
            .distinct()
            .withColumn(f"__{dim}_rank__", F.row_number().over(w) - 1)
        )

    ranked = (
        df.join(F.broadcast(rank_map(x_dim)), on=x_dim)
        .join(F.broadcast(rank_map(y_dim)), on=y_dim)
    )
    rx, ry = F.col(f"__{x_dim}_rank__"), F.col(f"__{y_dim}_rank__")
    t = int(tile_size)
    # home tile + halo duplicates: a row belongs to every tile whose
    # halo-extended range covers its rank
    tx_home, ty_home = (rx / t).cast("int"), (ry / t).cast("int")
    tx_lo = ((rx - halo_x) / t).cast("int")
    tx_hi = ((rx + halo_x) / t).cast("int")
    ty_lo = ((ry - halo_y) / t).cast("int")
    ty_hi = ((ry + halo_y) / t).cast("int")
    assigned = ranked.withColumn(
        "__tile__",
        F.explode(
            F.array_distinct(
                F.flatten(
                    F.transform(
                        F.sequence(tx_lo, tx_hi),
                        lambda tx: F.transform(
                            F.sequence(ty_lo, ty_hi),
                            lambda ty: F.struct(tx.alias("tx"), ty.alias("ty")),
                        ),
                    )
                )
            )
        ),
    ).withColumn("__home__", (F.col("__tile__.tx") == tx_home) & (F.col("__tile__.ty") == ty_home))

    halo_schema = schema + ", `__home__` boolean"

    def conv_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        out = conv_block(pdf.drop(columns=["__home__"]))
        home = pdf[[x_dim, y_dim, "__home__"]].drop_duplicates()
        out = out.merge(home, on=[x_dim, y_dim], how="left")
        return out[[*keep, x_dim, y_dim, v, "__home__"]]

    group_cols = [*keep, "__tile__"]
    out_df = (
        assigned.select(*group_cols, x_dim, y_dim, v, "__home__")
        .groupBy(*group_cols)
        .applyInPandas(conv_tile, schema=halo_schema)
        .where(F.col("__home__"))
        .drop("__home__")
    )
    return data.with_df(out_df.select(*data.meta.dims, v))


@process
def apply_neighborhood(
    data: DataCube,
    reducer,
    dimension: str | None = None,
    size=3,
    overlap=None,
    context=None,
    **reducer_kwargs,
) -> DataCube:
    """Centered rolling reduce over a neighborhood (the reference's
    rolling→construct→reduce, apply_neighborhood_intertwin.py:8-37).

    Two call forms:
    - ``dimension=..., size=int`` — 1-D positional window: a JVM window
      frame ``rowsBetween(-size//2, size//2)``, no pandas, works on any
      orderable dim (timestamps included).
    - ``size={'x': 3, 'y': 3, ...}`` — the reference's multi-dim form:
      each cell fans out to its size_x × size_y × … neighbor positions via
      one offset explode, then a single hash aggregate reduces every
      neighborhood (edge cells see fewer contributors — xarray's
      NaN-padded rolling windows under NaN-skipping reducers). Requires
      regular numeric axes (labels probed for step, like the resamplers);
      output restricted to existing labels per shifted dim.

    ``overlap`` (strided tiling for chunk-UDFs) is not a rolling aggregate;
    use apply_kernel's tiled halo path or run_udf for that — raising keeps
    the semantics honest rather than silently striding."""
    from pyspark.sql import Window

    if overlap:
        raise NotImplementedError(
            "apply_neighborhood(overlap=...) strides tiles for chunk UDFs; "
            "use apply_kernel(tiled=True) / run_udf for halo-tiled UDFs"
        )
    if isinstance(size, dict):
        sizes = {data.assert_dim(k): int(v) for k, v in size.items()}
        if len(sizes) > 1:
            return _apply_neighborhood_nd(data, reducer, sizes, **reducer_kwargs)
        ((dimension, size),) = sizes.items()
    if dimension is None:
        raise ValueError("apply_neighborhood needs dimension= or a size dict")

    dim = data.assert_dim(dimension)
    keep = data.other_dims(dim)
    half = int(size) // 2
    w = (
        (Window.partitionBy(*keep) if keep else Window.partitionBy(F.lit(1)))
        .orderBy(dim)
        .rowsBetween(-half, half)
    )
    builder = resolve_reducer(reducer)
    value = builder(F.col(data.value_col), **reducer_kwargs).over(w)
    return data.with_df(data.df.withColumn(data.value_col, value))


_SEPARABLE_ND = {"sum", "min", "max", "count", "mean"}


def _apply_neighborhood_separable(
    data: DataCube, reducer: str, sizes: dict
) -> DataCube:
    """Separable n-D rolling reduce: one label-range window pass per dim.

    sum/min/max compose directly; count becomes 0/1 indicators summed
    through every pass; mean rides a (sum, count) accumulator pair and
    divides at the end (try_divide: empty neighborhoods → NULL, matching
    avg). Each pass is ``rangeBetween(-h·step, h·step)`` ordered by the
    dim's numeric label and partitioned by every other dim — n window
    exchanges total, zero row duplication (vs the holistic plan's
    size_x·size_y·… explode). Ordering is by the integer label index
    ``round((d − origin)/step)`` so the frame bounds are exact ints —
    no float range-comparison fuzz."""
    from pyspark.sql import Window

    from openeo_processes_dask_spark.operators.resample import _axis_geometry

    v = data.value_col
    df = data.df
    if reducer == "mean":
        df = df.withColumn("__s__", F.col(v).cast("double")).withColumn(
            "__n__", F.col(v).isNotNull().cast("long")
        )
        accs = {"__s__": F.sum, "__n__": F.sum}
    elif reducer == "count":
        df = df.withColumn("__n__", F.col(v).isNotNull().cast("long"))
        accs = {"__n__": F.sum}
    else:
        df = df.withColumn("__s__", F.col(v))
        accs = {"__s__": {"sum": F.sum, "min": F.min, "max": F.max}[reducer]}

    for d in sizes:
        origin, step, _ = _axis_geometry(df, d)
        idx = F.round((F.col(d) - F.lit(float(origin))) / F.lit(float(step))).cast(
            "long"
        )
        half = sizes[d] // 2
        others = [c for c in data.meta.dims if c != d]
        w = (
            (Window.partitionBy(*others) if others else Window.partitionBy(F.lit(1)))
            .orderBy(idx)
            .rangeBetween(-half, half)
        )
        df = df.select(
            *data.meta.dims,
            *[fn(F.col(c)).over(w).alias(c) for c, fn in accs.items()],
        )

    if reducer == "mean":
        out = F.try_divide(F.col("__s__"), F.col("__n__"))
    elif reducer == "count":
        out = F.col("__n__")
    else:
        out = F.col("__s__")
    return data.with_df(df.select(*data.meta.dims, out.alias(v)))


def _apply_neighborhood_nd(
    data: DataCube, reducer, sizes: dict, **reducer_kwargs
) -> DataCube:
    """Multi-dim rolling reduce in long format. Two plans by reducer class:

    SEPARABLE reducers (sum/min/max/count, and mean via sum&count) run as
    one label-RANGE window pass per dim — `rangeBetween(-h·step, h·step)`
    ordered by the dim — so an n-D neighborhood costs n window exchanges
    and zero data fan-out. At 100 TB this is the plan that matters: the
    window exchanges repartition by the untouched dims, no row is ever
    duplicated.

    HOLISTIC reducers (median/quantiles/sd/…) can't decompose: each cell
    explodes to the product of per-dim offsets (label-space arithmetic:
    offset × probed axis step) and a single groupBy reduces every
    neighborhood — one explode (size_x·size_y·… fan-out) + one shuffle,
    no halo exchange, no pandas. Both plans share label semantics
    (regular numeric axes); outputs differ only for sparse cubes, where
    the fan-out may emit label-present combos whose center cell is
    missing."""
    import itertools

    from openeo_processes_dask_spark.operators.resample import _axis_geometry

    if isinstance(reducer, str) and reducer in _SEPARABLE_ND and not reducer_kwargs:
        return _apply_neighborhood_separable(data, reducer, sizes)

    v = data.value_col
    nd_dims = list(sizes)
    steps = {}
    for d in nd_dims:
        _, step, _ = _axis_geometry(data.df, d)
        steps[d] = step
    offsets = [
        [o * steps[d] for o in range(-(sizes[d] // 2), sizes[d] // 2 + 1)]
        for d in nd_dims
    ]
    combos = list(itertools.product(*offsets))
    structs = [
        F.struct(
            *[F.lit(float(c[i])).alias(f"o_{d}") for i, d in enumerate(nd_dims)]
        )
        for c in combos
    ]
    shifted = data.df.select(
        *[c for c in data.meta.dims if c not in nd_dims],
        *nd_dims,
        v,
        F.explode(F.array(*structs)).alias("__o__"),
    ).select(
        *[
            (F.col(d) + F.col(f"__o__.o_{d}")).alias(d)
            if d in sizes
            else F.col(d)
            for d in data.meta.dims
        ],
        v,
    )
    builder = resolve_reducer(reducer)
    agg = shifted.groupBy(*data.meta.dims).agg(
        builder(F.col(v), **reducer_kwargs).alias(v)
    )
    # targets outside the original axes (shifted past the edge) drop via a
    # label-space broadcast semi-join per shifted dim
    for d in nd_dims:
        agg = agg.join(F.broadcast(data.df.select(d).distinct()), d, "left_semi")
    return data.with_df(agg.select(*data.meta.dims, v))
