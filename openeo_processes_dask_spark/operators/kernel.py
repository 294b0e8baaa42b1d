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
    if any(dim % 2 == 0 for dim in karr.shape):
        from openeo_processes_dask_spark.exceptions import KernelDimensionsUneven

        raise KernelDimensionsUneven(
            "Each dimension of the kernel must have an uneven number of elements."
        )
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
    assume_dense: bool | None = None,
    **reducer_kwargs,
) -> DataCube:
    """Strided neighborhood reduce (the reference's rolling→construct→
    reduce with ``stride``, apply_neighborhood_intertwin.py:8-43).

    Two call forms:
    - ``dimension=..., size=int`` — 1-D positional window extension: a JVM
      window frame ``rowsBetween(-size//2, size//2)``, no pandas, works on
      any orderable dim (timestamps included), dense (stride 1).
    - ``size={'x': …}, overlap={'x': …}`` — the reference's multi-dim
      form, faithfully strided: the effective window is
      ``w = size + 2·overlap`` and outputs sit every
      ``stride = max(size + overlap, 1)`` positions along each dim
      (reference update_size_and_stride_with_overlap,
      apply_neighborhood_intertwin.py:40-43; verified against
      test_apply_neighborhood_intertwin.py expectations). ``overlap``
      omitted ⇒ stride = size: non-overlapping tiling. Dense rolling is
      the reference's own ``size≤0 + overlap`` spelling (stride clamps
      to 1). Window alignment is xarray ``center=True``: position i
      covers indices ``[i − w//2, i + w − 1 − w//2]`` (left-heavy for
      even w); edge windows see fewer contributors (NaN-padded rolling
      under NaN-skipping reducers). Requires regular numeric axes
      (labels probed for step, like the resamplers)."""
    from pyspark.sql import Window

    if isinstance(size, dict):
        sizes = {data.assert_dim(k): int(v) for k, v in size.items()}
        overlaps = {
            data.assert_dim(k): int(v) for k, v in (overlap or {}).items()
        }
        return _apply_neighborhood_nd(
            data, reducer, sizes, overlaps, assume_dense=assume_dense,
            **reducer_kwargs,
        )
    if overlap:
        raise ValueError(
            "apply_neighborhood: overlap requires the dict size form "
            "(size={'dim': n}, overlap={'dim': h})"
        )
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
    data: DataCube, reducer: str, geom: dict
) -> DataCube:
    """Separable dense (stride-1) n-D rolling reduce: one integer-range
    window pass per dim.

    sum/min/max compose directly; count becomes 0/1 indicators summed
    through every pass; mean rides a (sum, count) accumulator pair and
    divides at the end (try_divide: empty neighborhoods → NULL, matching
    avg). Each pass is ``rangeBetween(-(w//2), w−1−w//2)`` (xarray
    center=True alignment) ordered by the dim's integer label index and
    partitioned by every other dim — n window exchanges total, zero row
    duplication (vs the holistic plan's w_x·w_y·… explode). At 100 TB
    this is the plan that matters: no row is ever duplicated."""
    from pyspark.sql import Window

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

    for d, (origin, step, _n, wsize, _stride) in geom.items():
        idx = F.round((F.col(d) - F.lit(origin)) / F.lit(step)).cast("long")
        others = [c for c in data.meta.dims if c != d]
        w = (
            (Window.partitionBy(*others) if others else Window.partitionBy(F.lit(1)))
            .orderBy(idx)
            .rangeBetween(-(wsize // 2), wsize - 1 - wsize // 2)
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
    data: DataCube,
    reducer,
    sizes: dict,
    overlaps: dict,
    assume_dense: bool | None = None,
    **reducer_kwargs,
) -> DataCube:
    """Strided multi-dim neighborhood reduce in long format, index space.

    Per dim: effective window ``w = size + 2·overlap``, output centers
    every ``stride = max(size + overlap, 1)`` index positions (reference
    apply_neighborhood_intertwin.py:40-43), window at center i covering
    indices ``[i − w//2, i + w − 1 − w//2]``. Two plans by shape:

    SEPARABLE reducers (sum/min/max/count, mean via sum&count) at
    stride 1 route to one window pass per dim — zero fan-out
    (_apply_neighborhood_separable).

    Otherwise: each cell computes, per dim, the arithmetic sequence of
    stride-multiple centers whose window covers it (≤ ⌈w/stride⌉ values
    — exactly 1 for non-overlapping tiling) and explodes it; a single
    groupBy on the center indices reduces every neighborhood. No halo
    exchange, no pandas, fan-out ∏⌈w_d/stride_d⌉ (vs the dense plan's
    ∏w_d). Requires regular numeric axes; sparse cubes reduce over the
    cells that exist (NaN-padded rolling under NaN-skipping reducers)."""
    from openeo_processes_dask_spark.operators.resample import _axis_geometry

    v = data.value_col
    nd_dims = list(sizes)
    geom = {}
    for d in nd_dims:
        origin, step, n = _axis_geometry(data.df, d)
        ov = overlaps.get(d, 0)
        w = sizes[d] + 2 * ov
        if w < 1:
            raise ValueError(
                f"apply_neighborhood: effective window size + 2*overlap = {w} "
                f"< 1 along {d}"
            )
        stride = max(sizes[d] + ov, 1)
        geom[d] = (float(origin), float(step), int(n), w, stride)

    if (
        isinstance(reducer, str)
        and reducer in _SEPARABLE_ND
        and not reducer_kwargs
        and all(g[4] == 1 for g in geom.values())
    ):
        # density gate: the separable two-pass is exact ONLY on a dense
        # grid — with holes, a neighbor's contribution rides a partial
        # row at (center_dim_d, neighbor_other_dims), and if THAT cell is
        # a hole the contribution is silently lost (caught by the
        # sf0.001 registry sweep: sparse fixture -> undercounted means).
        # assume_dense=True skips the probe (the caller KNOWS the cube is
        # dense — e.g. a freshly materialized raster — and a pre-scan at
        # 100 TB is not free); False forces the exact plan; None (default)
        # decides with one aggregate.
        dense = assume_dense
        if dense is None:
            probe = data.df.agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.countDistinct(c).alias(f"d_{i}")
                    for i, c in enumerate(data.meta.dims)
                ],
            ).first()
            expected = 1
            for i in range(len(data.meta.dims)):
                expected *= probe[f"d_{i}"]
            dense = probe["n"] == expected
        if dense:
            return _apply_neighborhood_separable(data, reducer, geom)

    keep = [c for c in data.meta.dims if c not in sizes]
    df = data.df.select(*keep, *nd_dims, v)
    for d in nd_dims:
        origin, step, n, w, stride = geom[d]
        j = F.round((F.col(d) - F.lit(origin)) / F.lit(step)).cast("long")
        lo = F.greatest(j - F.lit(w - 1 - w // 2), F.lit(0))
        hi = F.least(j + F.lit(w // 2), F.lit(n - 1))
        first = (-F.floor(-lo / F.lit(stride)) * stride).cast("long")
        last = (F.floor(hi / F.lit(stride)) * stride).cast("long")
        cand = F.when(
            first <= last, F.sequence(first, last, F.lit(stride).cast("long"))
        ).otherwise(F.array().cast("array<long>"))
        df = df.withColumn(f"__c_{d}", F.explode(cand))

    builder = resolve_reducer(reducer)
    agg = df.groupBy(*keep, *[f"__c_{d}" for d in nd_dims]).agg(
        builder(F.col(v), **reducer_kwargs).alias(v)
    )
    if all(g[4] == 1 for g in geom.values()):
        # dense-rolling semantics (stride 1): one output row per PRESENT
        # input cell — without this, a hole adjacent to data would gain a
        # phantom center (its neighborhood is non-empty even though the
        # cell itself does not exist). Strided tiling (stride > 1) keeps
        # every tile reachable from data, as its gates' oracles encode.
        present = data.df.select(
            *keep,
            *[
                F.round(
                    (F.col(d) - F.lit(geom[d][0])) / F.lit(geom[d][1])
                ).cast("long").alias(f"__c_{d}")
                for d in nd_dims
            ],
        ).distinct()
        agg = agg.join(
            present, on=[*keep, *[f"__c_{d}" for d in nd_dims]], how="left_semi"
        )
    out = agg.select(
        *[
            (F.lit(geom[d][0]) + F.col(f"__c_{d}") * F.lit(geom[d][1]))
            .cast(data.df.schema[d].dataType)
            .alias(d)
            if d in sizes
            else F.col(d)
            for d in data.meta.dims
        ],
        v,
    )
    return data.with_df(out)
